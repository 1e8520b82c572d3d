"""Coverage for reference decks with no test spec / no shipped golds
(VERDICT r01 gap list): test/tests/problem/fftproblem.i,
test/tests/tensor_ics/sineic.i, benchmarks 1b / 1a_secant / 1a_solver,
Ostwald 2a_secant / 2a_broyden / simple.  Where the deck's values are
analytically known (sineic) the test checks exact values; the benchmark
decks run shrunk smoke horizons asserting physical sanity."""

import math
import os

import numpy as np
import pytest

from .gold import REF, run_ref_deck


def _finite(values):
    return all(math.isfinite(v) for v in values.values())


def test_fftproblem():
    """[Mesh] UniformTensorMesh drives the domain (reference
    test/tests/problem/fftproblem.i, src/mesh/UniformTensorMesh.C:19-70)."""
    tr, _ = run_ref_deck("test/tests/problem/fftproblem.i")
    assert tr.step_count == 4
    assert tr.problem.domain.shape == (50, 50)


def test_sineic(tmp_path):
    """ParsedTensor IC sampled exactly + projected to an exodus nodal var
    (reference test/tests/tensor_ics/sineic.i)."""
    from marlin_tpu.exodus import read_exodus

    tr, tmp = run_ref_deck("test/tests/tensor_ics/sineic.i", tmpdir=str(tmp_path))
    assert tr.step_count == 2
    dom = tr.problem.domain
    eta = np.asarray(tr.state["buffers"]["eta"])
    x = np.asarray(dom._np_axes[0])[:, None]
    y = np.asarray(dom._np_axes[1])[None, :]
    np.testing.assert_allclose(eta, np.sin(x) + np.sin(y), atol=1e-12)

    e = read_exodus(os.path.join(tmp, "sineic_out.e"))
    assert e["nodal"]["eta"].shape == (3, 51 * 51)
    # projected nodal values wrap periodically from the buffer
    np.testing.assert_allclose(
        e["nodal"]["eta"][-1].reshape(51, 51, order="F")[:50, :50], eta, atol=1e-12
    )


SMOKES = [
    # (deck, extra cli args)
    ("benchmarks/01_spinodal_decomposition/1b.i", []),
    ("benchmarks/01_spinodal_decomposition/1a_secant.i", []),
    ("benchmarks/01_spinodal_decomposition/1a_solver.i", []),
    ("benchmarks/02_oswald_ripening/2a_secant.i", []),
    ("benchmarks/02_oswald_ripening/2a_broyden.i", []),
    ("benchmarks/02_oswald_ripening/simple.i", []),
]


@pytest.mark.parametrize("deck,cli", SMOKES, ids=[d.split("/")[-1] for d, _ in SMOKES])
def test_benchmark_smoke(deck, cli):
    """Shrunk smoke runs of the remaining PFHub benchmark decks: build,
    3 steps, finite postprocessors, c stays within the physical window."""
    if not os.path.exists(os.path.join(REF, deck)):
        pytest.skip("deck not shipped")
    args = [
        "Executioner/num_steps=3",
        "Domain/nx=64", "Domain/ny=64",
        "Problem/spectral_solve_substeps=10",
    ]
    # decks with an explicit [TensorSolver] take substeps there
    import re

    text = open(os.path.join(REF, deck)).read()
    if "[TensorSolver]" in text and re.search(r"^\s*substeps\s*=", text, re.M):
        args.append("TensorSolver/substeps=10")
    tr, _ = run_ref_deck(deck, args + cli)
    assert tr.step_count >= 1
    assert _finite(tr.pp_values)
    if "c" in tr.state["buffers"]:
        c = np.asarray(tr.state["buffers"]["c"])
        assert np.isfinite(c).all()
        assert -0.5 < c.min() and c.max() < 1.5


COUPLED_PF_MECH = [
    ("test/tests/tensor_compute/coupled_pf_mech.i", []),
    ("test/tests/tensor_compute/coupled_pf_mech_secant.i", []),
]


@pytest.mark.parametrize(
    "deck,cli", COUPLED_PF_MECH,
    ids=[d.split("/")[-1] for d, _ in COUPLED_PF_MECH])
def test_coupled_pf_mech_smoke(deck, cli):
    """Cahn-Hilliard coupled to the monolithic FFTQuasistaticElasticity /
    FFTElasticChemicalPotential solve (reference
    test/tests/tensor_compute/coupled_pf_mech*.i — no upstream test spec or
    gold exists; shrunk 16^3 smoke, 2 steps, physical sanity).  The secant
    variant needs double precision — in single, the secant residual hits an
    f32 cancellation floor (|R|/|R0| ~ 3e-3) above the deck's 1e-6
    tolerances and the solve (correctly) reports non-convergence; the same
    math floors the reference's f32 GPU runs."""
    if not os.path.exists(os.path.join(REF, deck)):
        pytest.skip("deck not shipped")
    tr, _ = run_ref_deck(deck, [
        "Executioner/num_steps=2",
        "Domain/nx=16", "Domain/ny=16", "Domain/nz=16",
    ] + cli)
    assert tr.step_count == 2
    assert _finite(tr.pp_values)
    c = np.asarray(tr.state["buffers"]["c"])
    assert np.isfinite(c).all()
    assert -0.5 < c.min() and c.max() < 1.5
    # the eigenstrain-driven displacements must be small but nonzero
    dx = np.asarray(tr.state["buffers"]["disp_x"])
    assert np.isfinite(dx).all() and 0 < np.abs(dx).max() < 0.1


@pytest.mark.parametrize("deck", [
    "test/tests/tensor_compute/parallel_roundtrip.i",
    "test/tests/tensor_compute/parallel_roundtrip_3d.i",
], ids=["parallel_roundtrip", "parallel_roundtrip_3d"])
def test_parallel_roundtrip_decks(deck):
    """FFT roundtrip error decks under FFT_SLAB (reference
    test/tests/tensor_compute/parallel_roundtrip*.i, incl. the
    device_names/device_weights knobs which are accepted and ignored on a
    homogeneous TPU mesh).  The decks compute max/L2 roundtrip error
    postprocessors; both must sit at double-precision round-off."""
    if not os.path.exists(os.path.join(REF, deck)):
        pytest.skip("deck not shipped")
    tr, _ = run_ref_deck(deck, ["Executioner/num_steps=1",
                                "Domain/floating_precision=DOUBLE"])
    assert tr.step_count == 1
    assert tr.pp_values["max_error"] < 1e-12
    assert tr.pp_values["l2_error"] < 1e-10
