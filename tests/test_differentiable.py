"""End-to-end differentiability — a capability the reference architecture
cannot offer: because one timestep (including all substeps) is a pure jitted
function of the state pytree, `jax.grad` flows through the entire solve.
Adjoint sensitivities of any output functional w.r.t. the initial condition
come for free (PDE-constrained optimization / inverse problems)."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem


def _free_energy(problem, c):
    dom = problem.domain
    r = dom.fft(c)
    grad_sq = None
    for d in range(dom.dim):
        gr = dom.ifft(r * dom.reciprocal_axis(d) * 1j)
        grad_sq = gr * gr if grad_sq is None else grad_sq + gr * gr
    Fd = 5.0 * (c - 0.3) ** 2 * (0.7 - c) ** 2 + grad_sq
    return jnp.sum(Fd) / Fd.size * dom.volume_global


def test_grad_through_full_timestep():
    """d F(c_after_step) / d c0 computed by reverse-mode AD through the
    semi-implicit spectral solve (20 substeps), validated against a
    central finite difference along a random direction."""
    problem, state = g._build(nx=32, ny=32, substeps=20)

    def loss(c0):
        st = {**state, "buffers": {**state["buffers"], "c": c0}}
        out = problem._step_impl(st, 0.0, 0.5, 0.5, jnp.asarray(True))
        return _free_energy(problem, out["buffers"]["c"])

    c0 = state["buffers"]["c"]
    val, grad = jax.jit(jax.value_and_grad(loss))(c0)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.max(jnp.abs(grad))) > 0

    # finite-difference check along a random direction
    v = jax.random.normal(jax.random.PRNGKey(0), c0.shape, c0.dtype)
    v = v / jnp.linalg.norm(v)
    eps = 1e-5
    fd = (loss(c0 + eps * v) - loss(c0 - eps * v)) / (2 * eps)
    ad = jnp.vdot(grad, v)
    np.testing.assert_allclose(float(ad), float(fd), rtol=1e-5)


def test_grad_wrt_mobility_field():
    """Sensitivity w.r.t. a PARAMETER buffer (the spectral mobility factor
    Mbar) — the adjoint path for coefficient inverse problems."""
    problem, state = g._build(nx=32, ny=32, substeps=10)

    def loss(mbar):
        st = {**state, "buffers": {**state["buffers"], "Mbar": mbar}}
        out = problem._step_impl(st, 0.0, 0.5, 0.5, jnp.asarray(True))
        return _free_energy(problem, out["buffers"]["c"])

    mbar = state["buffers"]["Mbar"]
    grad = jax.jit(jax.grad(loss))(mbar)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.max(jnp.abs(grad))) > 0
