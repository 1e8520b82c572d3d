"""Sharded coupled-solver parity + the XLA:CPU fft-thunk layout
regression (parallel._row_major).

The coupled ABM corrector (solvers/abm_coupled.py) chains
solve -> stack/slice -> ifft -> compute-group fft -> solve inside one
jitted program; on a sharded mesh XLA's layout assignment used to feed
the fft custom call a column-major buffer, which the CPU thunk runtime
hard-rejects (RET_CHECK fft_thunk.cc:167) instead of copying.  The
uneven-grid (GSPMD) slab path pins both fft operand and result to a
freshly-linearized row-major layout (parallel._row_major); these decks
(150² at 4 ranks — uneven) are the regression."""

import os

import jax
import numpy as np
import pytest

from marlin_tpu import hit, parallel
from marlin_tpu.domain import ParallelMode
from marlin_tpu.problem import TensorProblem

from .gold import REF


def _steps(deck_rel, cli, mesh=None, n=3):
    args = list(cli) + (
        ["Domain/parallel_mode=FFT_SLAB"] if mesh is not None else []
    )
    p = TensorProblem(hit.load(os.path.join(REF, deck_rel), args), mesh=mesh)
    s = p.init_state()
    t = 0.0
    for i in range(n):
        s = p.step(s, t, 0.1, 0.1, i == 0)
        t += 0.1
    return s


def test_neml2_implicit_update_sharded(tmp_path):
    """NEML2 ImplicitUpdate's per-point Newton (smallsolve.small_solve)
    over a SHARDED field: the unrolled solve is pure elementwise ops, so
    the jitted forward must match serial bit-for-bit on the slab mesh."""
    import jax.numpy as jnp

    from marlin_tpu.computes.neml2 import load_neml2_model
    from marlin_tpu.domain import Domain

    (tmp_path / "model.i").write_text(
        """
[Models]
  [rate]
    type = ScalarLinearCombination
    from_var = 'state/s'
    to_var = 'state/s_rate'
    coefficients = '-2.0'
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/s'
  []
  [system]
    type = ComposedModel
    models = 'rate integ'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    s_old = jnp.asarray(np.random.RandomState(3).rand(32, 32))
    env = {
        "old_state/s": s_old,
        "forces/t": jnp.asarray(0.5),
        "old_forces/t": jnp.asarray(0.0),
    }
    serial = np.asarray(jax.jit(lambda e: m.forward(e)["state/s"])(env))
    # exact backward-Euler closed form
    np.testing.assert_allclose(serial, np.asarray(s_old) / 2.0, atol=1e-12)

    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:4])
    dom = Domain(dim=2, n=[32, 32], maxs=[1.0, 1.0],
                 parallel_mode=ParallelMode.FFT_SLAB, mesh=mesh)
    env_sh = dict(env)
    env_sh["old_state/s"] = jax.device_put(
        s_old, jax.sharding.NamedSharding(mesh, parallel.real_spec(dom, 2))
    )
    sharded = np.asarray(jax.jit(lambda e: m.forward(e)["state/s"])(env_sh))
    np.testing.assert_array_equal(serial, sharded)


@pytest.mark.parametrize("deck", ["test/tests/solvers/coupled.i",
                                  "test/tests/solvers/nl_coupled.i"])
@pytest.mark.parametrize("cfg", [["ss=10", "cs=1", "order=2"],
                                 ["ss=4", "cs=2", "order=3"]])
def test_coupled_solver_sharded_matches_serial(deck, cfg):
    ss = _steps(deck, cfg)
    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:4])
    sp = _steps(deck, cfg, mesh=mesh)
    for k in ("u", "v"):
        a, b = np.asarray(ss["buffers"][k]), np.asarray(sp["buffers"][k])
        assert np.isfinite(b).all(), f"{k} not finite sharded"
        d = float(np.abs(a - b).max())
        assert d < 1e-11, f"decomposition visible in '{k}': {d:.3e}"
