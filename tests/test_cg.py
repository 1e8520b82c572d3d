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
