"""conjugate_gradient unit parity (reference unit/src/ConjugateGradientTest.C:
solve2d / solve4d — exact SPD systems converge in n iterations to machine
residual)."""

import jax
import jax.numpy as jnp
import numpy as np

from marlin_tpu.computes.mechanics import conjugate_gradient

jax.config.update("jax_enable_x64", True)


def _solve(A_np, b_np, tol=1e-12, maxiter=50):
    A = jnp.asarray(A_np, dtype=jnp.float64)
    b = jnp.asarray(b_np, dtype=jnp.float64)
    x, it, norm = conjugate_gradient(
        lambda v: A @ v, b, jnp.zeros_like(b), tol, maxiter)
    return np.asarray(x), int(it), float(norm), A_np, b_np


def test_cg_solve2d():
    x, it, norm, A, b = _solve([[4.0, 1.0], [1.0, 3.0]], [1.0, 2.0])
    assert it == 2
    assert norm < 1e-9
    np.testing.assert_allclose(np.asarray(A) @ x, b, atol=1e-9)


def test_cg_solve4d():
    x, it, norm, A, b = _solve(
        [[4.0, 1.0, 2.0, 3.0],
         [1.0, 5.0, 1.0, 2.0],
         [2.0, 1.0, 6.0, 1.0],
         [3.0, 2.0, 1.0, 7.0]],
        [1.0, 2.0, 3.0, 4.0])
    assert it == 4
    assert norm < 1e-6
    np.testing.assert_allclose(np.asarray(A) @ x, b, atol=1e-6)


def test_cg_zero_rhs_exits_immediately():
    x, it, norm, _, _ = _solve(np.eye(3), np.zeros(3))
    assert it == 0
    np.testing.assert_array_equal(x, np.zeros(3))


def test_spectral_gradient_unit_parity():
    """Mirror of reference unit/src/TensorBufferTest.C Gradient: spectral
    d/dx, d/dy of sin(2x)sin(3y) on the asymmetric 20x100 domain
    [-pi,pi]x[-pi,3pi] match the analytic derivatives to 1e-12."""
    from marlin_tpu.domain import Domain, Precision

    dom = Domain(2, (20, 100), mins=(-np.pi, -np.pi),
                 maxs=(np.pi, 3 * np.pi),
                 floating_precision=Precision.DOUBLE)
    x = np.asarray(dom.axis(0))
    y = np.asarray(dom.axis(1))
    a = jnp.asarray(np.sin(2.0 * x) * np.sin(3.0 * y))
    dadx = 2.0 * np.cos(2.0 * x) * np.sin(3.0 * y)
    dady = np.sin(2.0 * x) * 3.0 * np.cos(3.0 * y)

    abar = dom.fft(a)
    gx = np.asarray(dom.ifft(abar * dom.reciprocal_axis(0) * 1j))
    gy = np.asarray(dom.ifft(abar * dom.reciprocal_axis(1) * 1j))
    np.testing.assert_allclose(gx, dadx, atol=1e-12)
    np.testing.assert_allclose(gy, dady, atol=1e-12)


def test_preconditioned_cg_small_spd():
    """PCG on a small SPD system: matches the direct solve; with the exact
    inverse as preconditioner it converges in one iteration; with a
    Jacobi preconditioner it needs no more iterations than plain CG."""
    from marlin_tpu.computes.mechanics import (
        conjugate_gradient, preconditioned_conjugate_gradient)

    rng = np.random.RandomState(7)
    n = 24
    Q = rng.randn(n, n)
    # ill-conditioned SPD matrix (condition ~1e4)
    M = Q @ np.diag(np.logspace(0, 4, n)) @ Q.T
    M = 0.5 * (M + M.T)
    Mj = jnp.asarray(M)
    b = jnp.asarray(rng.randn(n))
    x_direct = np.linalg.solve(M, np.asarray(b))

    A = lambda v: Mj @ v
    x0 = jnp.zeros(n)
    x_cg, k_cg, _ = conjugate_gradient(A, b, x0, 1e-10, 500)
    np.testing.assert_allclose(np.asarray(x_cg), x_direct, rtol=1e-5,
                               atol=1e-7)

    Minv_exact = jnp.asarray(np.linalg.inv(M))
    x_p, k_p, _ = preconditioned_conjugate_gradient(
        A, lambda r: Minv_exact @ r, b, x0, 1e-10, 500)
    np.testing.assert_allclose(np.asarray(x_p), x_direct, rtol=1e-5,
                               atol=1e-7)
    assert int(k_p) <= 2  # exact preconditioner: one productive step

    d = jnp.asarray(1.0 / np.diag(M))
    x_j, k_j, _ = preconditioned_conjugate_gradient(
        A, lambda r: d * r, b, x0, 1e-10, 500)
    np.testing.assert_allclose(np.asarray(x_j), x_direct, rtol=1e-5,
                               atol=1e-7)
    # Jacobi on a dense random SPD system is not guaranteed to beat
    # plain CG — only correctness is asserted here; the exact-inverse
    # case above demonstrates the iteration-count mechanism


def test_fftmechanics_reference_medium_preconditioner(tmp_path):
    """FFTMechanics with preconditioner = REFERENCE_MEDIUM converges to
    the same solution as the reference-exact unpreconditioned path on the
    two-phase mech deck (tightened tolerances isolate solver-path
    differences from stopping noise)."""
    import os

    from .gold import REF, run_ref_deck

    deck = "test/tests/mechanics/mech.i"
    if not os.path.exists(os.path.join(REF, deck)):
        import pytest

        pytest.skip("deck not shipped")
    tight = ["Executioner/num_steps=3",
             "TensorComputes/Solve/root/mech/l_tol=1e-8",
             "TensorComputes/Solve/root/mech/nl_rel_tol=1e-8",
             "TensorComputes/Solve/root/mech/nl_abs_tol=1e-10"]
    tr0, _ = run_ref_deck(deck, tight, tmpdir=str(tmp_path / "a"))
    tr1, _ = run_ref_deck(
        deck,
        tight + ["TensorComputes/Solve/root/mech/preconditioner"
                 "=REFERENCE_MEDIUM"],
        tmpdir=str(tmp_path / "b"))
    F0 = np.asarray(tr0.state["buffers"]["F"])
    F1 = np.asarray(tr1.state["buffers"]["F"])
    np.testing.assert_allclose(F1, F0, atol=2e-6)
    s0 = np.asarray(tr0.state["buffers"]["stress"])
    s1 = np.asarray(tr1.state["buffers"]["stress"])
    np.testing.assert_allclose(s1, s0, atol=2e-5)
