"""Batched dense solves for SMALL trailing (n, n) systems, unrolled into
plain elementwise ops.

Why not `jnp.linalg.solve`: the batched LU lowers to a custom call whose
output layout (a) trips XLA's CPU fft thunk when the result feeds an FFT
inside a sharded program (`LayoutUtil::IsMonotonicWithDim0Major`
RET_CHECK, observed on the 4-rank slab mesh with the coupled ABM
corrector) and (b) participates in the same GSPMD partitioner bug class
that miscompiled the scatter-pinned acoustic solve in
computes/mechanics.py (det==0 rows at each shard's local origin).  An
unrolled Gauss-Jordan is pure `mul/add/where` — partitioner-trivial,
layout-trivial, and faster than LU dispatch for the n <= 8 systems the
framework actually solves (coupled spectral correctors: n = #variables;
NEML2 ImplicitUpdate Newton: n = #unknown components).

Pivoting: full partial pivoting via compare-swap chains of
`jnp.where` — each batch point picks its own pivot, so singular-leading-
minor systems (zero diagonal entries) solve exactly like LAPACK would.
Singular systems produce inf/NaN, matching `jnp.linalg.solve`.
"""

import jax.numpy as jnp

__all__ = ["small_solve"]

_MAX_UNROLL = 12


def small_solve(A, b):
    """Solve A x = b for trailing square systems, batched over leading axes.

    A: (..., n, n), b: (..., n) -> x: (..., n).  Unrolled at trace time;
    n must be a static dimension <= 12 (larger systems should use
    jnp.linalg.solve — the unrolled program grows O(n^3)).
    """
    n = A.shape[-1]
    if A.shape[-2] != n or b.shape[-1] != n:
        raise ValueError(f"shape mismatch: A {A.shape}, b {b.shape}")
    if n > _MAX_UNROLL:
        raise ValueError(
            f"small_solve unrolls the elimination; n = {n} > {_MAX_UNROLL} "
            "would bloat the program — use jnp.linalg.solve"
        )
    dtype = jnp.result_type(A.dtype, b.dtype)
    # augmented rows, each (..., n+1)
    rows = [
        jnp.concatenate(
            [A[..., i, :].astype(dtype), b[..., i : i + 1].astype(dtype)],
            axis=-1,
        )
        for i in range(n)
    ]
    for k in range(n):
        # partial pivot: compare-swap the largest |column-k| entry of rows
        # k..n-1 into position k (any resulting permutation of the losers
        # is fine — elimination order below is permutation-invariant)
        piv = rows[k]
        for r in range(k + 1, n):
            better = jnp.abs(rows[r][..., k]) > jnp.abs(piv[..., k])
            better = better[..., None]
            piv, rows[r] = (
                jnp.where(better, rows[r], piv),
                jnp.where(better, piv, rows[r]),
            )
        piv = piv / piv[..., k : k + 1]
        rows[k] = piv
        for r in range(n):
            if r != k:
                rows[r] = rows[r] - rows[r][..., k : k + 1] * piv
    return jnp.stack([rows[i][..., n] for i in range(n)], axis=-1)
