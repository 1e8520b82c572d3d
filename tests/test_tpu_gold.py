"""Real-device (TPU) gold regression lane.

The reference runs the same decks against the same golds on every available
backend (`compute_devices = 'cpu cuda mps'`,
reference test/tests/cahnhilliard/tests:10).  This is the marlin_tpu analog:
a curated subset of the f64 gold suite executed on the session's REAL device
(the axon/TPU backend) at its native float32, compared against the shipped
f64 golds at f32 tolerances.

Run with:

    MARLIN_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

(the conftest skips every CPU-lane test under that env var, and skips these
without it).  Each case runs in-process; the axon backend poisons a process
on some failures, so run this lane in its own pytest invocation.
"""

import os

import pytest

from .gold import REF, csv_diff, h5_diff, h5_diff_early_frames, run_ref_deck

pytestmark = pytest.mark.tpu

# f32 tolerances: ICs are bit-identical (torch CPU RNG), so the divergence
# from the f64 golds is pure f32 roundoff growth over the deck's steps.
# abs tolerances are per-deck, sized ~100x the measured drift so the lane
# catches real regressions (wrong physics lands orders of magnitude out).

H5_CASES = [
    # FFT mechanics: Newton + matrix-free CG (Green projection)
    ("test/tests/mechanics/mech.i", [],
     "test/tests/mechanics/gold/mech.h5", "mech.h5", 1e-3),
    # LBM: BGK channel (2D + 3D) and a mixed-BC D3Q19 case
    ("test/tests/lbm/channel2D.i", [],
     "test/tests/lbm/gold/channel2D.h5", "channel2D.h5", 1e-3),
    ("test/tests/lbm/channel3D.i", [],
     "test/tests/lbm/gold/channel3D.h5", "channel3D.h5", 1e-3),
    ("test/tests/lbm/mixed_bcs_d3q19.i", [],
     "test/tests/lbm/gold/mixed_bcs_d3q19.h5", "mixed_bcs_d3q19.h5", 1e-3),
    # the FUSED Pallas kernels on the actual chip (the CPU suite runs them
    # in interpret mode, which never sees Mosaic's tiling/VMEM rules —
    # r04 caught a real 2-D tiling gap this way): 3-D blocked BGK and the
    # 2-D single-block Smagorinsky + projection + Zou-He + zero-gradient
    # chain
    ("test/tests/lbm/channel3D.i", ["Problem/lbm_backend=PALLAS"],
     "test/tests/lbm/gold/channel3D.h5", "channel3D.h5", 1e-3),
    ("test/tests/lbm/obstacle.i", ["Problem/lbm_backend=PALLAS"],
     "test/tests/lbm/gold/obstacle.h5", "obstacle.h5", 1e-3),
]


@pytest.mark.parametrize(
    "deck,cli,gold,out,tol", H5_CASES,
    ids=[os.path.basename(c[0]) for c in H5_CASES])
def test_tpu_h5_gold(deck, cli, gold, out, tol):
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck(deck, cli, tmpdir="/tmp/marlin_tpu_gold_dev")
    # rel_tol scales per-dataset: derivative fields (mu & co.) drift in
    # proportion to their own range over the deck's f32 steps
    h5_diff(gold, f"{tmp}/{out}", abs_tol=tol, rel_tol=5e-3)


def test_tpu_kks_libtorch_gold():
    """TorchScript Gibbs surrogate lifted on-device + jax.grad jacobian.
    The TPU VPU's transcendental approximations (exp/log inside the
    analytic Gibbs graph) differ from libm at a few ulp-of-f32 per
    evaluation; the surrogate jacobian and the 11-frame trajectory amplify
    that to ~2% of range on the state fields and ~12% on the jacobian
    fields (mu, dG_dh) — measured identical with HIGHEST matmul precision,
    so it is the transcendental floor, not MXU rounding (the same deck on
    CPU f32 stays at 1.6e-3).  Bounds: 3% of range for state fields, 15%
    for jacobian fields."""
    gold = "test/tests/kks/gold/KKS_libtorch.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck("test/tests/kks/KKS_libtorch.i", [],
                          tmpdir="/tmp/marlin_tpu_gold_dev")
    h5_diff(gold, f"{tmp}/KKS_libtorch.h5", abs_tol=1e-3, rel_tol=0.03,
            overrides={"mu": (1e-3, 0.15), "dG_dh": (1e-3, 0.15)})


def test_tpu_rotating_grain_secant_gold():
    """Iterative secant solve with damping/rollback.  Two f32 realities on
    any device: (a) the measured f32 secant noise floor on this deck is
    R/R0 ~ 2e-5, so the deck's 1e-9 tolerances must loosen to 1e-4 (else
    the residual plateaus and adaptive dt collapses to dtmin); (b) the
    rotating-grain interface position amplifies the looser-converged solve
    from frame 2 on.  Early frames compare tightly; later frames assert
    finite + in the gold's range."""
    gold = "test/tests/tensor_compute/gold/rotating_grain_secant.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck(
        "test/tests/tensor_compute/rotating_grain_secant.i",
        ["TensorSolver/relative_tolerance=1e-4",
         "TensorSolver/absolute_tolerance=1e-4"],
        tmpdir="/tmp/marlin_tpu_gold_dev")
    h5_diff_early_frames(gold, f"{tmp}/rotating_grain_secant.h5",
                         max_frame=1, abs_tol=1e-3, rel_tol=5e-3)


def test_tpu_cahnhilliard_gold():
    """The headline CH deck (RNG IC parity + ABM substeps + FFT
    conventions).  With the IC drawn from the dtype-independent f64 torch
    stream (computes/core.py RandomTensor), the f32 device trajectory
    tracks the f64 gold at f32 eps over ALL frames (measured ~1.5e-6 at
    frame 7), so every frame compares strictly."""
    gold = "test/tests/cahnhilliard/gold/cahnhilliard.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck("test/tests/cahnhilliard/cahnhilliard.i",
                          ["TensorOutputs/active=xdmf"],
                          tmpdir="/tmp/marlin_tpu_gold_dev")
    h5_diff(gold, f"{tmp}/cahnhilliard.h5", abs_tol=1e-4, rel_tol=1e-3)


CSV_CASES = [
    # ABM solver orders: diagonal (per-variable) and coupled (dense k-point).
    # ss=10 cs=2 order=2 — the highest-order corrector combo the reference
    # ships golds for (test/tests/solvers/tests `corrector_steps_2_order_2`;
    # r03 review: the previous 10_1_2 combo has NO gold, so pytest silently
    # skipped and the lane never exercised the ABM solver on the device).
    #
    # Device-noise floor, TWO measured datapoints on the v5e (2026-08-21,
    # /tmp/noise_meas.py protocol — worst-column max relative deviation vs
    # the f64 gold):
    #   diagonal 10_0_1 (AB1, predictor only):   2.87e-4 (u_max)
    #   diagonal 10_2_2 (AB2 + 2 AM correctors): 5.10e-4 (v_min)
    # vs 2.1e-5 for the same 10_2_2 deck at f32 on CPU.  The corrector
    # barely amplifies it (1.8x for 3 extra sweeps), so the floor is the
    # device FFT transform noise (docs/tpu_numerics.md §what-drifts), not
    # solver-order error growth.  Tolerances: ~3x each measurement.
    ("test/tests/solvers/diagonal.i", ["ss=10", "cs=0", "order=1"],
     "test/tests/solvers/gold/diagonal_10_0_1.csv", "diagonal_10_0_1.csv",
     1e-3),
    ("test/tests/solvers/diagonal.i", ["ss=10", "cs=2", "order=2"],
     "test/tests/solvers/gold/diagonal_10_2_2.csv", "diagonal_10_2_2.csv",
     1.5e-3),
    ("test/tests/solvers/coupled.i", ["ss=10", "cs=2", "order=2"],
     "test/tests/solvers/gold/coupled_10_2_2.csv", "coupled_10_2_2.csv",
     1.5e-3),
    # postprocessor reductions on device
    ("test/tests/postprocessors/postprocessors.i",
     ["Outputs/file_base=average", "Postprocessors/active=avg_c"],
     "test/tests/postprocessors/gold/average.csv", "average.csv", 1.5e-3),
]


@pytest.mark.parametrize(
    "deck,cli,gold,out,tol", CSV_CASES,
    ids=[os.path.basename(c[2]) for c in CSV_CASES])
def test_tpu_csv_gold(deck, cli, gold, out, tol):
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck(deck, cli, tmpdir="/tmp/marlin_tpu_gold_dev")
    csv_diff(gold, f"{tmp}/{out}", rel_tol=tol, abs_tol=1e-6)


def test_tpu_backend_is_real_device():
    """The lane must actually be on the accelerator, not a CPU fallback."""
    import jax

    assert jax.default_backend() != "cpu", (
        "MARLIN_TPU_TESTS=1 lane is running on CPU — the TPU backend did "
        "not initialize")
