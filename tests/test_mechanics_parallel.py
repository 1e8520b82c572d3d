"""Distributed FFT micromechanics on the virtual CPU mesh — a capability
BEYOND the reference: its mechanics specs are pinned to one rank
(reference test/tests/mechanics/tests `max_parallel = 1`), while here the
deGeus Newton+CG solve (computes/mechanics.py) runs under FFT_SLAB /
FFT_PENCIL decomposition unchanged — the Green projection rides the
distributed dom.fft, the CG dot products become global reductions under
GSPMD, and the k=0 pin is a global scatter.

Parity is asserted in-memory against a serial run of the same deck (which
test_mechanics_gold.py pins to the reference gold at 1e-13); the decks'
XDMF outputs use NODE/OVERSIZED_NODAL modes that the parallel writer
rejects by design, so the sharded runs step the problem directly.

Tolerances: the decks converge to nl_rel_tol=2e-4 / l_tol=1e-5, so two
decompositions may legitimately stop the Newton/CG loops at different
(converged) iterates; field parity at 1e-4 absorbs that stopping noise.
Tolerances BELOW the semi-definite operator's floor instead exercise the
CG breakdown guard (computes/mechanics.py conjugate_gradient): without
it the sharded-FFT reduction ordering pumps null-space roundoff until
|F| ~ 2e6 (measured); with it the solve stays bounded and reports
non-convergence through the Newton pseudo-buffer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlin_tpu import hit, parallel
from marlin_tpu.domain import ParallelMode
from marlin_tpu.problem import TensorProblem

from .gold import REF

DT = 0.02  # the decks' Executioner dt


def _run_steps(deck_rel, cli=(), mode=None, devices=0, mesh_shape=None,
               num_steps=3, init_from=None):
    mesh = None
    args = list(cli)
    if mode is not None:
        mesh = parallel.make_mesh(
            mode, jax.devices()[:devices], shape=mesh_shape
        )
        args.append(f"Domain/parallel_mode={mode.name}")
    problem = TensorProblem(
        hit.load(os.path.join(REF, deck_rel), args), mesh=mesh
    )
    if init_from is not None:
        # transplant another run's ICs (sharded onto this problem's mesh):
        # seeded RandomTensor ICs tile each rank's identical local block BY
        # DESIGN (reference RandomTensor.C:42-53 semantics), so a sharded
        # draw is legitimately a different field than the serial draw
        state = parallel.shard_state(problem.domain, init_from)
    else:
        state = problem.init_state()
    t = 0.0
    for i in range(num_steps):
        state = problem.step(state, t, DT, DT, i == 0)
        t += DT
    return problem, state


def _assert_field_parity(sstate, pstate, fields, atol):
    for f in fields:
        a = np.asarray(sstate["buffers"][f])
        b = np.asarray(pstate["buffers"][f])
        d = float(np.abs(a - b).max())
        assert d < atol, f"decomposition visible in '{f}': {d:.3e}"


ANALYTIC = ["TensorComputes/Solve/root/mech/analytic_tangent=true"]


@pytest.mark.parametrize(
    "deck,mode,devices,shape,cli",
    [
        ("test/tests/mechanics/mech.i", ParallelMode.FFT_SLAB, 4, None, []),
        ("test/tests/mechanics/mech3d.i", ParallelMode.FFT_SLAB, 4, None,
         []),
        ("test/tests/mechanics/mech3d.i", ParallelMode.FFT_PENCIL, 4,
         (2, 2), []),
        # the analytic K4:dF contraction (the 128³-enabling path) is
        # elementwise in the components, so decomposition must be
        # invisible for it too
        ("test/tests/mechanics/mech3d.i", ParallelMode.FFT_SLAB, 4, None,
         ANALYTIC),
    ],
    ids=["mech2d_slab4", "mech3d_slab4", "mech3d_pencil2x2",
         "mech3d_slab4_analytic"],
)
def test_mechanics_sharded_matches_serial(deck, mode, devices, shape, cli):
    _, sstate = _run_steps(deck, cli=cli)
    _, pstate = _run_steps(deck, cli=cli, mode=mode, devices=devices,
                           mesh_shape=shape)
    _assert_field_parity(sstate, pstate, ["F", "stress"], atol=1e-4)


def test_mechanics_sharded_cg_breakdown_guard():
    """Tolerances below the semi-definite operator's floor: without the
    CG breakdown guard the sharded solve explodes (measured |F| ~ 2e6 at
    4 slab ranks); with it the fields stay bounded and non-convergence is
    reported through the Newton pseudo-buffer instead of garbage output."""
    tight = [
        "TensorComputes/Solve/root/mech/nl_rel_tol=1e-7",
        "TensorComputes/Solve/root/mech/nl_abs_tol=1e-9",
        "TensorComputes/Solve/root/mech/l_tol=1e-8",
        "TensorComputes/Solve/root/mech/l_max_its=200",
        "TensorComputes/Solve/root/mech/nl_max_its=50",
    ]
    _, pstate = _run_steps(
        "test/tests/mechanics/mech3d.i", cli=tight,
        mode=ParallelMode.FFT_SLAB, devices=4, num_steps=1,
    )
    F = np.asarray(pstate["buffers"]["F"])
    assert np.isfinite(F).all()
    assert np.abs(F).max() < 2.0, (
        f"CG breakdown guard failed: |F|max = {np.abs(F).max():.3e}"
    )


def test_quasistatic_coupled_sharded_matches_serial():
    """The monolithic small-strain chain (FFTElasticChemicalPotential +
    FFTQuasistaticElasticity, reference
    test/tests/tensor_compute/coupled_pf_mech.i) under FFT_SLAB: a direct
    reciprocal-space solve (no iterative stopping noise), so the
    decomposition must be invisible at near-roundoff tolerance.  The
    acoustic-tensor k=0 pins (`.at[(0,)*dim].set`) become global scatters
    under GSPMD."""
    deck = "test/tests/tensor_compute/coupled_pf_mech.i"
    cli = ["Domain/nx=32", "Domain/ny=32", "Domain/nz=32"]
    sproblem = TensorProblem(
        hit.load(os.path.join(REF, deck), cli)
    )
    sinit = sproblem.init_state()
    sstate = dict(sinit)
    t = 0.0
    for i in range(2):
        sstate = sproblem.step(sstate, t, DT, DT, i == 0)
        t += DT
    _, pstate = _run_steps(deck, cli=cli, mode=ParallelMode.FFT_SLAB,
                           devices=4, num_steps=2, init_from=sinit)
    _assert_field_parity(sstate, pstate, ["c"], atol=1e-10)


def test_mechanics_sharded_newton_flag_rides_state():
    """The Newton-convergence pseudo-buffer must survive sharding: an
    unconvergeable configuration reports done=False through the sharded
    state exactly as the serial path does."""
    hard = [
        "TensorComputes/Solve/root/mech/nl_rel_tol=1e-14",
        "TensorComputes/Solve/root/mech/nl_abs_tol=1e-16",
        "TensorComputes/Solve/root/mech/nl_max_its=2",
    ]
    problem, pstate = _run_steps(
        "test/tests/mechanics/mech.i", cli=hard,
        mode=ParallelMode.FFT_SLAB, devices=4, num_steps=1,
    )
    keys = [k for k in pstate["buffers"] if k.startswith("__converged_")]
    assert keys, "converged pseudo-buffer missing from sharded state"
    assert not bool(jnp.all(pstate["buffers"][keys[0]]))


def test_fracture_multiphysics_sharded_pcg_matches_serial():
    """The AT2 fracture showcase (FFTMechanics with (1-d)^2-degraded
    moduli, contrast ~1/keta = 1000 once the notch develops) under
    FFT_SLAB@4: plain CG stalls in this regime (sharded-FFT reduction
    ordering amplifies roundoff until the Newton budget exhausts —
    raising nl_max_its to 300 does NOT recover it, measured r05), and
    the REFERENCE_MEDIUM preconditioner recovers serial-grade
    convergence: max_d matches the serial run at 1e-8-class agreement
    on the full 6-step deck (recorded r05); this leaner config asserts
    field parity."""
    import jax
    import numpy as np

    from marlin_tpu import hit, parallel
    from marlin_tpu.domain import ParallelMode
    from marlin_tpu.executioner import run_deck

    root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deck = os.path.join(root_dir, "examples/phase_field_fracture/fracture.i")
    dd = os.path.dirname(deck)
    over = ["Executioner/num_steps=2", "Domain/nx=48", "Domain/ny=48",
            "Domain/floating_precision=DOUBLE",
            "TensorComputes/Solve/mech/preconditioner=REFERENCE_MEDIUM"]
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        ser = run_deck(hit.load(deck, over), output_dir=tmp + "/s",
                       deck_dir=dd)
        mesh = parallel.make_mesh(ParallelMode.FFT_SLAB,
                                  devices=jax.devices()[:4])
        par = run_deck(hit.load(deck, over + [
            "Domain/parallel_mode=FFT_SLAB"]), output_dir=tmp + "/p",
            mesh=mesh, deck_dir=dd)
    for k in ("d", "H"):
        a = np.asarray(ser.state["buffers"][k])
        b = np.asarray(par.state["buffers"][k])
        np.testing.assert_allclose(b, a, atol=5e-7, err_msg=k)
