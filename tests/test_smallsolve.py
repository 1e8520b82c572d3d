"""smallsolve.small_solve — the unrolled batched dense solve that replaces
`jnp.linalg.solve` in the coupled ABM corrector and NEML2 ImplicitUpdate
(the batched-LU custom call trips XLA's CPU fft thunk layout check inside
sharded programs and the GSPMD partitioner bug class documented in
computes/mechanics.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlin_tpu.smallsolve import small_solve


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_matches_lapack_random(n, dtype):
    rng = np.random.RandomState(n)
    A = rng.randn(40, n, n).astype(np.float64)
    b = rng.randn(40, n).astype(np.float64)
    if np.issubdtype(dtype, np.complexfloating):
        A = A + 1j * rng.randn(40, n, n)
        b = b + 1j * rng.randn(40, n)
    x = np.asarray(small_solve(jnp.asarray(A), jnp.asarray(b)))
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=1e-11, atol=1e-11)


def test_pivoting_handles_zero_diagonal():
    # leading minors singular: elimination without pivoting would divide
    # by zero; partial pivoting must recover the exact solution
    A = np.array([[0.0, 1.0, 0.0],
                  [1.0, 0.0, 0.0],
                  [0.0, 0.0, 1.0]])
    b = np.array([2.0, 3.0, 4.0])
    x = np.asarray(small_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, [3.0, 2.0, 4.0], atol=1e-14)


def test_batch_points_pivot_independently():
    # one batch point needs a swap, the other does not
    A = np.stack([
        np.array([[0.0, 1.0], [1.0, 0.0]]),
        np.array([[2.0, 0.0], [0.0, 2.0]]),
    ])
    b = np.array([[1.0, 2.0], [2.0, 4.0]])
    x = np.asarray(small_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, [[2.0, 1.0], [1.0, 2.0]], atol=1e-14)


def test_jit_and_grid_batch():
    rng = np.random.RandomState(7)
    A = rng.randn(6, 5, 3, 3) + np.eye(3) * 4.0
    b = rng.randn(6, 5, 3)
    f = jax.jit(small_solve)
    x = np.asarray(f(jnp.asarray(A), jnp.asarray(b)))
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=1e-12, atol=1e-12)


def test_rejects_large_n():
    A = jnp.eye(16)
    b = jnp.ones(16)
    with pytest.raises(ValueError, match="small_solve"):
        small_solve(A, b)
