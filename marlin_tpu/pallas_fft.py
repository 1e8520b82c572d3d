"""Pallas TPU FFT kernels — the unordered (permuted-spectrum) fast path.

Motivation (measured, see PERF.md): XLA's TPU FFT moves data at ~½ of the
practical HBM rate and a 512-point axis transform costs 38-47 ms at 512³;
these kernels do the same transform in 12-14 ms by factoring N = 128·R
(R ≤ 8; radices 2/4 hand-scheduled, the rest as unrolled constant-folded
combinations) into one MXU matmul against a 128-point DFT matrix plus
radix-R butterflies, entirely in VMEM — one HBM read and one write per
axis, no transposes.  N = 64 runs as a single half-tile DFT matmul.

The trick that eliminates all data movement beyond the minimum: the
forward kernel emits the spectrum in PERMUTED (t-major) order
    k' = t·128 + s   where the true index is  k = t + R·s ,
and the inverse kernel CONSUMES that order while emitting natural-order
real space.  Between them everything is pointwise, so the solver runs with
k-space operator arrays generated in the same permuted order
(`permuted_freqs`) and never materializes the permutation — the classic
unordered-FFT convention (cf. FFTW's halfcomplex / unordered transforms).

Numerics: matmuls run at `Precision.HIGHEST` (f32); roundtrip error vs
jnp.fft is ~1e-7 at N=512.  Complex data travels as separate f32 re/im
planes (Mosaic has no complex dtype).

Used by Domain when `fft_backend = PALLAS` (opt-in; TPU grids with every
FFT extent in {64} ∪ {128·R, R ≤ 8}); tests run the same kernels in
interpret mode on CPU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 128  # DFT matmul size (one MXU tile)
MAX_R = 8  # largest radix: N up to 128*8 = 1024
HIGHEST = jax.lax.Precision.HIGHEST


#: largest extent handled as one direct DFT matmul (w tables are 2·n²·4 B
#: of VMEM; 400 — the reference's Swift-Hohenberg grid — costs 2.6 MB)
DIRECT_MAX = 400


@functools.lru_cache(maxsize=None)
def base(n: int) -> int:
    """The DFT-matmul size b for extent n = b·r.

    Multiples of 128 factor as b = 128 (one MXU tile) with radix r ≤ 8 —
    the fast path for the big power-of-two grids.  Every other extent in
    [8, DIRECT_MAX] runs as a SINGLE direct DFT matmul (r = 1, b = n):
    Mosaic cannot reshape the lane axis into non-128 chunks
    ("infer-vector-layout: unsupported shape cast" for 200 → 2×100), and
    at these sizes the O(n) direct matmul is MXU-trivial anyway.  Covers
    the reference's own deck extents (200, 400, 192, 32, …); a full-dim
    minor/second-minor block satisfies the Mosaic tiling rules at any
    size ≥ the 8-sublane tile (validated on the v5e down to 32, the
    deGeus RVE extent).  Returns 0 when unsupported."""
    if n % P == 0 and 1 <= n // P <= MAX_R:
        return P
    if 8 <= n <= DIRECT_MAX:
        return n
    return 0


def supported(n: int) -> bool:
    return base(n) > 0


SUPPORTED_RULE = (f"a multiple of 128 up to 1024, or any extent in "
                  f"[8, {DIRECT_MAX}] (direct DFT matmul)")


def grid_unsupported_reason(shape) -> Optional[str]:
    """Build-time feasibility check for `fftn_unordered` on a full grid.

    Per-extent `supported()` is necessary but not sufficient: each kernel
    launch must also be tileable under the Mosaic block rules — the lanes
    kernel batches prod(shape[:-1]) rows, and every mid-axis sublane
    kernel sees a transverse extent of prod(shape[d+1:]), which for a 3-D
    direct-DFT grid like 200³ is 40000 (neither a 128-multiple nor small
    enough to take as one whole VMEM block).  This mirrors the
    `_pick_tb`/`_pick_tl` trace-time checks on plain ints so Domain can
    reject such grids at build time with a named error instead of failing
    mid-run.  Returns None when the grid works, else the reason."""
    shape = tuple(int(s) for s in shape)
    for n in shape:
        if not supported(n):
            return f"extent {n} does not factor as {SUPPORTED_RULE}"
    try:
        _pick_tb(int(np.prod(shape[:-1], dtype=int)), shape[-1])
        for d in range(len(shape) - 1):
            _pick_tl(int(np.prod(shape[d + 1:], dtype=int)), shape[d])
    except ValueError as e:
        return str(e)
    return None


def slab_grid_unsupported_reason(shape, p: int) -> Optional[str]:
    """Build-time feasibility check for the 3-D FFT_SLAB Pallas path at
    ``p`` ranks (parallel.fft_slab_pallas): the z (lanes) and x (mid)
    kernels see the Y-sharded local block (nx, ny/p, nz), the y (mid)
    kernel the X-sharded block (nx/p, ny, nz).  Mirrors `_pick_tb`/
    `_pick_tl` on plain ints so Domain can reject at build time with a
    named error instead of failing inside the jitted shard_map trace."""
    nx, ny, nz = (int(s) for s in shape)
    for n in (nx, ny, nz):
        if not supported(n):
            return f"extent {n} does not factor as {SUPPORTED_RULE}"
    if ny % p or nx % p:
        return (f"FFT_SLAB PALLAS needs nx and ny divisible by the mesh "
                f"size {p} (got {nx}x{ny})")
    try:
        _pick_tb(nx * (ny // p), nz)          # z kernel, real block
        _pick_tl((ny // p) * nz, nx)          # x kernel, real block
        _pick_tl(nz, ny)                      # y kernel, reciprocal block
    except ValueError as e:
        return str(e)
    return None


def true_k_order(n: int) -> np.ndarray:
    """true_k[k'] — the natural frequency index stored at permuted slot k'."""
    b = base(n)
    r = n // b
    kp = np.arange(n)
    return (kp // b) + r * (kp % b)


def permuted_freqs(n: int, d: float) -> np.ndarray:
    """np.fft.fftfreq(n, d) reordered to the kernel's k' storage order."""
    return np.fft.fftfreq(n, d=d)[true_k_order(n)]


@functools.lru_cache(maxsize=None)
def _tables(n: int, inverse: bool):
    b = base(n)
    r = n // b
    s = 2j if inverse else -2j
    w = np.exp(s * np.pi * np.outer(np.arange(b), np.arange(b)) / b)
    tw = np.exp(s * np.pi * np.outer(np.arange(r), np.arange(b)) / n)
    return (
        w.real.astype(np.float32), w.imag.astype(np.float32),
        tw.real.astype(np.float32), tw.imag.astype(np.float32),
    )


def _axpy(acc, x, c):
    """acc + c*x with exact constant folding (c is a Python float)."""
    if abs(c) < 1e-15:
        return acc
    term = x if c == 1.0 else (-x if c == -1.0 else x * c)
    return term if acc is None else acc + term


def _radix_generic(parts_r, parts_i, r, inverse):
    """DFT_r across the r block-parts: A[t] = Σ_q x[q]·W_r^{±qt}.  The W_r
    entries are compile-time scalars, so each output is an unrolled linear
    combination of the parts with 0/±1 coefficients folded away."""
    sign = 1.0 if inverse else -1.0
    out_r, out_i = [], []
    for t in range(r):
        ar = ai = None
        for q in range(r):
            ang = sign * 2.0 * math.pi * ((q * t) % r) / r
            c, s = round(math.cos(ang), 15), round(math.sin(ang), 15)
            ar = _axpy(_axpy(ar, parts_r[q], c), parts_i[q], -s)
            ai = _axpy(_axpy(ai, parts_i[q], c), parts_r[q], s)
        out_r.append(ar)
        out_i.append(ai if ai is not None else jnp.zeros_like(ar))
    return out_r, out_i


def _radix_fwd(parts_r, parts_i, r):
    """DFT_r butterflies: A[t] = Σ_q x[q]·W_r^{qt} (hand-scheduled for the
    ±1/±i radices 2 and 4; generic unrolled combination otherwise)."""
    if r == 1:
        return parts_r, parts_i
    if r == 2:
        (a_r, b_r), (a_i, b_i) = parts_r, parts_i
        return [a_r + b_r, a_r - b_r], [a_i + b_i, a_i - b_i]
    if r == 4:
        a_r, b_r, c_r, d_r = parts_r
        a_i, b_i, c_i, d_i = parts_i
        apc_r, apc_i = a_r + c_r, a_i + c_i
        amc_r, amc_i = a_r - c_r, a_i - c_i
        bpd_r, bpd_i = b_r + d_r, b_i + d_i
        bmd_r, bmd_i = b_r - d_r, b_i - d_i
        return (
            [apc_r + bpd_r, amc_r + bmd_i, apc_r - bpd_r, amc_r - bmd_i],
            [apc_i + bpd_i, amc_i - bmd_r, apc_i - bpd_i, amc_i + bmd_r],
        )
    if r <= MAX_R:
        return _radix_generic(parts_r, parts_i, r, inverse=False)
    raise ValueError(f"radix {r}")


def _radix_inv(parts_r, parts_i, r):
    """Inverse butterflies: x[u] = Σ_t A[t]·W_r^{-ut} (conjugated table)."""
    if r == 1:
        return parts_r, parts_i
    if r == 2:
        (a_r, b_r), (a_i, b_i) = parts_r, parts_i
        return [a_r + b_r, a_r - b_r], [a_i + b_i, a_i - b_i]
    if r == 4:
        a_r, b_r, c_r, d_r = parts_r
        a_i, b_i, c_i, d_i = parts_i
        apc_r, apc_i = a_r + c_r, a_i + c_i
        amc_r, amc_i = a_r - c_r, a_i - c_i
        bpd_r, bpd_i = b_r + d_r, b_i + d_i
        bmd_r, bmd_i = b_r - d_r, b_i - d_i
        # W_4^{-ut}: conjugate of the forward table
        return (
            [apc_r + bpd_r, amc_r - bmd_i, apc_r - bpd_r, amc_r + bmd_i],
            [apc_i + bpd_i, amc_i + bmd_r, apc_i - bpd_i, amc_i - bmd_r],
        )
    if r <= MAX_R:
        return _radix_generic(parts_r, parts_i, r, inverse=True)
    raise ValueError(f"radix {r}")


# ---------------------------------------------------------------------------
# kernel bodies.  Layout contract:
#   lanes kernels:    block (TB, n)    — transform runs along the LANE axis
#   sublane kernels:  block (n, TL)    — transform runs along the SUBLANE axis
# Forward: natural-order input, permuted (t-major) output.
# Inverse: permuted input, natural-order output (scaled by 1/n).
# ---------------------------------------------------------------------------


def _fwd_lanes_kernel(n, tb, real_input, pre=None):
    """pre: optional elementwise jnp function applied to the (real) input
    block before the transform — fuses a pointwise producer (e.g. µ = f'(c)
    in a Cahn-Hilliard substep) into the first-axis kernel's HBM read."""
    b = base(n)
    r = n // b

    def kernel(*refs):
        if real_input:
            (xr_ref, wr_ref, wi_ref, twr_ref, twi_ref, or_ref, oi_ref) = refs
        else:
            (xr_ref, xi_ref, wr_ref, wi_ref, twr_ref, twi_ref, or_ref, oi_ref) = refs
        # input x[bk, n], n_index = p + b q  →  (TB, r, b): q major, p lanes
        xin = xr_ref[:]
        if pre is not None:
            xin = pre(xin)
        xr = xin.reshape(tb, r, b)
        parts_r = [xr[:, q, :] for q in range(r)]
        if real_input:
            parts_i = [jnp.zeros_like(parts_r[0]) for _ in range(r)]
        else:
            xi = xi_ref[:].reshape(tb, r, b)
            parts_i = [xi[:, q, :] for q in range(r)]
        ar, ai = _radix_fwd(parts_r, parts_i, r)
        twr, twi = twr_ref[:], twi_ref[:]
        wr, wi = wr_ref[:], wi_ref[:]
        br = jnp.stack(ar, axis=1) * twr - jnp.stack(ai, axis=1) * twi
        bi = jnp.stack(ar, axis=1) * twi + jnp.stack(ai, axis=1) * twr
        b2r = br.reshape(tb * r, b)
        b2i = bi.reshape(tb * r, b)
        mm = lambda x, w: jnp.dot(x, w, precision=HIGHEST, preferred_element_type=jnp.float32)
        cr = mm(b2r, wr) - mm(b2i, wi)
        ci = mm(b2r, wi) + mm(b2i, wr)
        or_ref[:] = cr.reshape(tb, n)   # k' = t·b + s
        oi_ref[:] = ci.reshape(tb, n)

    return kernel


def _inv_lanes_kernel(n, tb, real_output):
    b = base(n)
    r = n // b
    scale = 1.0 / n

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, twr_ref, twi_ref, *outs):
        # permuted input X'[bk, k'], k' = t·b + s → (TB, r, b): t major, s lanes
        xr = xr_ref[:].reshape(tb, r, b)
        xi = xi_ref[:].reshape(tb, r, b)
        wr, wi = wr_ref[:], wi_ref[:]  # inverse DFT_b table W_b^{+ms}
        mm = lambda x, w: jnp.dot(x, w, precision=HIGHEST, preferred_element_type=jnp.float32)
        # A[t, m] = Σ_s X'[t,s] W_b^{+m s}  (contract lanes)
        b2r = xr.reshape(tb * r, b)
        b2i = xi.reshape(tb * r, b)
        ar = (mm(b2r, wr) - mm(b2i, wi)).reshape(tb, r, b)
        ai = (mm(b2r, wi) + mm(b2i, wr)).reshape(tb, r, b)
        # twiddle W_n^{+m t}
        twr, twi = twr_ref[:], twi_ref[:]
        cr = ar * twr - ai * twi
        ci = ar * twi + ai * twr
        parts_r = [cr[:, t, :] for t in range(r)]
        parts_i = [ci[:, t, :] for t in range(r)]
        urs, uis = _radix_inv(parts_r, parts_i, r)
        # x[m + P u] → stack over u (major) is ALREADY natural order
        outr = jnp.stack(urs, axis=1).reshape(tb, n) * scale
        if real_output:
            outs[0][:] = outr
        else:
            outs[0][:] = outr
            outs[1][:] = jnp.stack(uis, axis=1).reshape(tb, n) * scale

    return kernel


def _fwd_sublanes_transform(xr, xi, wr, wi, twr, twi, n, tl):
    """The forward transform along the sublane axis of an (n, tl) block —
    shared by _fwd_sublanes_kernel and the fused k-space-update kernel
    (pallas_spectral._fwd_x_update_kernel).  xi=None for real input;
    returns planar (re, im)."""
    b = base(n)
    r = n // b
    xr = xr.reshape(r, b, tl)
    parts_r = [xr[q] for q in range(r)]
    if xi is None:
        parts_i = [jnp.zeros_like(parts_r[0]) for _ in range(r)]
    else:
        xi = xi.reshape(r, b, tl)
        parts_i = [xi[q] for q in range(r)]
    ar, ai = _radix_fwd(parts_r, parts_i, r)
    mml = lambda w, x: jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())), precision=HIGHEST,
        preferred_element_type=jnp.float32)
    outs_r, outs_i = [], []
    wrT, wiT = wr.T, wi.T
    for t in range(r):
        tr = twr[t, :].reshape(b, 1)
        ti = twi[t, :].reshape(b, 1)
        br = ar[t] * tr - ai[t] * ti
        bi = ar[t] * ti + ai[t] * tr
        outs_r.append(mml(wrT, br) - mml(wiT, bi))
        outs_i.append(mml(wrT, bi) + mml(wiT, br))
    return jnp.concatenate(outs_r, axis=0), jnp.concatenate(outs_i, axis=0)


def _fwd_sublanes_kernel(n, tl, real_input):
    def kernel(*refs):
        if real_input:
            (xr_ref, wr_ref, wi_ref, twr_ref, twi_ref, or_ref, oi_ref) = refs
            xi = None
        else:
            (xr_ref, xi_ref, wr_ref, wi_ref, twr_ref, twi_ref, or_ref, oi_ref) = refs
            xi = xi_ref[:]
        or_ref[:], oi_ref[:] = _fwd_sublanes_transform(
            xr_ref[:], xi, wr_ref[:], wi_ref[:], twr_ref[:], twi_ref[:], n, tl
        )

    return kernel


def _inv_sublanes_kernel(n, tl, real_output):
    b = base(n)
    r = n // b
    scale = 1.0 / n

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, twr_ref, twi_ref, *outs):
        xr = xr_ref[:].reshape(r, b, tl)
        xi = xi_ref[:].reshape(r, b, tl)
        wr, wi = wr_ref[:], wi_ref[:]
        twr, twi = twr_ref[:], twi_ref[:]
        mml = lambda w, x: jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())), precision=HIGHEST,
            preferred_element_type=jnp.float32)
        # A[t][m, l] = Σ_s W_b^{+s m}ᵀ X'[t][s, l]
        wrT, wiT = wr.T, wi.T
        cr_parts, ci_parts = [], []
        for t in range(r):
            arr = mml(wrT, xr[t]) - mml(wiT, xi[t])
            aii = mml(wrT, xi[t]) + mml(wiT, xr[t])
            tr = twr[t, :].reshape(b, 1)
            ti = twi[t, :].reshape(b, 1)
            cr_parts.append(arr * tr - aii * ti)
            ci_parts.append(arr * ti + aii * tr)
        urs, uis = _radix_inv(cr_parts, ci_parts, r)
        outr = jnp.concatenate(urs, axis=0) * scale
        if real_output:
            outs[0][:] = outr
        else:
            outs[0][:] = outr
            outs[1][:] = jnp.concatenate(uis, axis=0) * scale

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers (per-axis)
# ---------------------------------------------------------------------------

_INTERPRET = False  # force-flag (tests); CPU backends auto-interpret


def _interpret() -> bool:
    """Mosaic kernels only compile on TPU; on CPU (tests, CLI runs with
    fft_backend = PALLAS) fall back to interpret mode automatically."""
    return _INTERPRET or jax.default_backend() != "tpu"


def _consts(n, inverse):
    return tuple(jnp.asarray(a) for a in _tables(n, inverse))


def _call_lanes(kernel, n, tb, n_in, n_out, args, B):
    b = base(n)
    r = n // b
    bs = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    fw = lambda shp: pl.BlockSpec(shp, lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [bs] * n_in + [fw((b, b)), fw((b, b)), fw((r, b)), fw((r, b))]
    out_shape = tuple(jax.ShapeDtypeStruct((B, n), jnp.float32) for _ in range(n_out))
    out_specs = tuple(bs for _ in range(n_out))
    if n_out == 1:
        out_shape, out_specs = out_shape[0], out_specs[0]
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=(B // tb,),
        in_specs=in_specs, out_specs=out_specs, interpret=_interpret(),
    )(*args)


def _pick_tb(B, n):
    # keep in+out+intermediates ≈ 12·tb·n·4B under ~8MB (half the default
    # 16MB scoped-VMEM budget, leaving room for double buffering)
    tb = 256
    while tb > 1 and (B % tb or 12 * tb * n * 4 > 8 * 2 ** 20):
        tb //= 2
    while B % tb:
        tb //= 2
    tb = max(tb, 1)
    if tb % 8 and tb != B:
        # Mosaic: the second-minor block dim must be a multiple of 8 or
        # the full dimension — take the whole batch as one block if it fits
        if 12 * B * n * 4 <= 8 * 2 ** 20:
            return B
        raise ValueError(
            f"pallas fft: batch extent {B} is not tileable on TPU; "
            "use the DEFAULT fft backend for this grid"
        )
    return tb


def fft_lanes(xr, xi, n, pre=None):
    """Forward along the last axis of (B, n). xi=None for real input.
    Returns permuted-order (re, im).  `pre`: optional elementwise function
    fused into the kernel's input read (real input only)."""
    B = xr.shape[0]
    tb = _pick_tb(B, n)
    if pre is not None and xi is not None:
        raise ValueError("pre-op fusion requires real input")
    k = _fwd_lanes_kernel(n, tb, xi is None, pre=pre)
    args = ([xr] if xi is None else [xr, xi]) + list(_consts(n, False))
    return _call_lanes(k, n, tb, 1 if xi is None else 2, 2, args, B)


def ifft_lanes(xr, xi, n, real_output=True):
    """Inverse along the last axis of (B, n), permuted input."""
    B = xr.shape[0]
    tb = _pick_tb(B, n)
    k = _inv_lanes_kernel(n, tb, real_output)
    args = [xr, xi] + list(_consts(n, True))
    return _call_lanes(k, n, tb, 2, 1 if real_output else 2, args, B)


def _call_sublanes(kernel, n, tl, n_in, n_out, args, L):
    b = base(n)
    r = n // b
    bs = pl.BlockSpec((n, tl), lambda j: (0, j), memory_space=pltpu.VMEM)
    fw = lambda shp: pl.BlockSpec(shp, lambda j: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [bs] * n_in + [fw((b, b)), fw((b, b)), fw((r, b)), fw((r, b))]
    out_shape = tuple(jax.ShapeDtypeStruct((n, L), jnp.float32) for _ in range(n_out))
    out_specs = tuple(bs for _ in range(n_out))
    if n_out == 1:
        out_shape, out_specs = out_shape[0], out_specs[0]
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=(L // tl,),
        in_specs=in_specs, out_specs=out_specs, interpret=_interpret(),
    )(*args)


def _pick_tl(L, n):
    """Transverse lane-tile for (n, tl) sublane blocks.  Mosaic requires
    the minor-most block dim to be a multiple of 128 OR equal to the full
    dimension, so: 128 when it divides L (always for power-of-two grids),
    else the whole L as one lane-block when it fits the VMEM budget
    (covers the reference's 200/400-class extents, where L = 200·…)."""
    if L % 128 == 0:
        return 128
    if 12 * n * L * 4 <= 8 * 2 ** 20:
        return L
    raise ValueError(
        f"pallas fft: transverse extent {L} is not tileable on TPU "
        f"(needs a multiple of 128, or small enough to fit VMEM whole); "
        "use the DEFAULT fft backend for this grid"
    )


def fft_sublanes(xr, xi, n):
    """Forward along axis 0 of (n, L). xi=None for real input."""
    L = xr.shape[1]
    tl = _pick_tl(L, n)
    k = _fwd_sublanes_kernel(n, tl, xi is None)
    args = ([xr] if xi is None else [xr, xi]) + list(_consts(n, False))
    return _call_sublanes(k, n, tl, 1 if xi is None else 2, 2, args, L)


def ifft_sublanes(xr, xi, n, real_output=False):
    L = xr.shape[1]
    tl = _pick_tl(L, n)
    k = _inv_sublanes_kernel(n, tl, real_output)
    args = [xr, xi] + list(_consts(n, True))
    return _call_sublanes(k, n, tl, 2, 1 if real_output else 2, args, L)


# ---------------------------------------------------------------------------
# N-dimensional unordered transforms (full complex spectrum, permuted order
# along every transformed axis)
# ---------------------------------------------------------------------------


def _fwd_mid_axis(rr, ri, d):
    """Forward transform along a non-last axis d of planar (re, im) arrays:
    sublane kernel on the (n_d, suffix) view, vmapped over the prefix."""
    shape = rr.shape
    n_d = shape[d]
    pre_n = int(np.prod(shape[:d], dtype=int)) if d > 0 else 1
    suf = int(np.prod(shape[d + 1:], dtype=int))
    rr2 = rr.reshape(pre_n, n_d, suf)
    ri2 = ri.reshape(pre_n, n_d, suf) if ri is not None else None
    if pre_n == 1:
        orr, ori = fft_sublanes(rr2[0], None if ri2 is None else ri2[0], n_d)
    elif ri2 is None:
        orr, ori = jax.vmap(lambda a: fft_sublanes(a, None, n_d))(rr2)
    else:
        orr, ori = jax.vmap(lambda a, b: fft_sublanes(a, b, n_d))(rr2, ri2)
    return orr.reshape(shape), ori.reshape(shape)


def _inv_mid_axis(rr, ri, d):
    shape = rr.shape
    n_d = shape[d]
    pre_n = int(np.prod(shape[:d], dtype=int)) if d > 0 else 1
    suf = int(np.prod(shape[d + 1:], dtype=int))
    rr2 = rr.reshape(pre_n, n_d, suf)
    ri2 = ri.reshape(pre_n, n_d, suf)
    if pre_n == 1:
        orr, ori = ifft_sublanes(rr2[0], ri2[0], n_d, real_output=False)
    else:
        orr, ori = jax.vmap(
            lambda a, b: ifft_sublanes(a, b, n_d, real_output=False)
        )(rr2, ri2)
    return orr.reshape(shape), ori.reshape(shape)


def fwd_axes_planar(x, axes, pre=None, imag=None):
    """Forward unordered transform along `axes` of a planar array pair.
    `x` real (imag=None) or the real plane of a planar pair.  Axes are
    processed descending; the last array axis (lanes kernel) must be in
    `axes` whenever the input is real and pre is set.  Returns planar
    (re, im) f32.  Used standalone by the distributed slab path, which
    transforms the local axes, all_to_alls, then the remaining axis."""
    shape = x.shape
    dim = len(shape)
    for d in axes:
        if not supported(shape[d]):
            raise ValueError(f"pallas fft: unsupported extent {shape[d]}")
    if pre is not None and (dim - 1) not in axes:
        raise ValueError("pre-op fusion requires the last axis in `axes`")
    if pre is not None and imag is not None:
        # the fused pointwise producer is only defined for a real input
        # plane — silently dropping it would return fft(x) where the
        # caller asked for fft(pre(x))
        raise ValueError("pre-op fusion requires a real input (imag=None)")
    rr = x.astype(jnp.float32)
    ri = imag.astype(jnp.float32) if imag is not None else None
    for d in sorted(axes, reverse=True):
        if d == dim - 1:
            n = shape[-1]
            xr2 = rr.reshape(-1, n)
            xi2 = ri.reshape(-1, n) if ri is not None else None
            orr, ori = fft_lanes(xr2, xi2, n, pre=pre if ri is None else None)
            rr, ri = orr.reshape(shape), ori.reshape(shape)
        else:
            if ri is None:
                ri = jnp.zeros_like(rr)
            rr, ri = _fwd_mid_axis(rr, ri, d)
    if ri is None:
        ri = jnp.zeros_like(rr)
    return rr, ri


def inv_axes_planar(rr, ri, axes, real_output=False, shape=None):
    """Inverse unordered transform along `axes` (ascending).  With
    `real_output`, the last array axis must be in `axes` and the real
    result is returned alone; otherwise planar (re, im)."""
    shape = rr.shape if shape is None else shape
    dim = len(shape)
    if real_output and (dim - 1) not in axes:
        # falling through would return a planar tuple where the caller
        # expects one real array — fail here, not far downstream
        raise ValueError("real_output requires the last axis in `axes`")
    for d in sorted(axes):
        n_d = shape[d]
        if d == dim - 1:
            out = ifft_lanes(
                rr.reshape(-1, n_d), ri.reshape(-1, n_d), n_d,
                real_output=real_output,
            )
            if real_output:
                return out.reshape(shape)
            rr, ri = (o.reshape(shape) for o in out)
        else:
            rr, ri = _inv_mid_axis(rr, ri, d)
    return rr, ri


def fftn_unordered_planar(x: jnp.ndarray, pre=None, skip_axis0=False):
    """Forward n-D FFT of a REAL array; returns planar (re, im) f32 arrays
    with every axis in permuted (t-major) order.  `pre` fuses an elementwise
    function into the first-axis kernel's read; `skip_axis0` leaves axis 0
    untransformed (a caller fusing its own final-axis kernel)."""
    dim = x.ndim
    axes = tuple(range(1 if skip_axis0 else 0, dim))
    return fwd_axes_planar(x, axes, pre=pre)


def fftn_unordered(x: jnp.ndarray) -> jnp.ndarray:
    """Forward n-D FFT of a REAL array; returns complex64/128 with every
    axis in permuted (t-major) order.  All axis extents must be supported."""
    rr, ri = fftn_unordered_planar(x)
    return rr + 1j * ri


def ifftn_unordered_planar(rr: jnp.ndarray, ri: jnp.ndarray, shape):
    """Inverse of fftn_unordered_planar; returns the REAL array (imaginary
    part of the final axis inverse is discarded, as in irfftn)."""
    return inv_axes_planar(rr, ri, tuple(range(len(shape))),
                           real_output=True, shape=shape)


def ifftn_unordered(u: jnp.ndarray, shape) -> jnp.ndarray:
    """Inverse of fftn_unordered; returns the REAL array."""
    rr = jnp.real(u).astype(jnp.float32)
    ri = jnp.imag(u).astype(jnp.float32)
    return ifftn_unordered_planar(rr, ri, shape)
