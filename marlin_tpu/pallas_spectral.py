"""Fused semi-implicit spectral substep (Cahn-Hilliard class) — the
whole ABM predictor substep as five Pallas passes over HBM.

The jnp substep with `carry_reciprocal` + `fft_backend = PALLAS` already
runs 2 FFT-equivalent transforms, but still materializes every pointwise
stage between them: µ = f'(c), N̄ = M̄·µ̄, the semi-implicit update
ū = (ū + dt·Σβ N̄)/(1 − dt·L̄), and the N̄ history push — ~10 GB of
pointwise HBM traffic per 512³ substep on top of the ~12 GB the six
axis transforms move.  This module removes ALL of it (SURVEY §7.7, the
"fused semi-implicit k-space update" candidate):

  1. µ = f'(c) evaluates INSIDE the first forward-axis kernel's read
     (pallas_fft.fft_lanes `pre=`): µ never exists in HBM.
  2. The LAST forward axis (x, sublanes) transforms µ̄ and applies the
     whole k-space update in its epilogue: M̄ = −k²·mobility and
     L̄ = k⁴·κ are rebuilt in-registers from two tiny 1-D permuted-|k|²
     tables (never materialized — the same rule domain.k_square follows),
     the AB order-β weights arrive as SMEM scalars, and the kernel emits
     the updated ū and the new N̄ (next substep's history) directly.
  3. The inverse transform consumes ū and emits c.

ū and N̄ stay as planar f32 (re, im) pairs across the substep loop —
complex<->planar conversion happens once per MOOSE step.  The LAST
substep of each step runs the regular jnp chain, leaving every deck
buffer (mu, mubar, N̄, ū complex, c) and the old-state ring exactly as
the unfused solver does.

Enabled per-deck with `[TensorSolver] fused_spectral = true` (requires
`carry_reciprocal = true` and `[Domain] fft_backend = PALLAS`); the
chain is pattern-matched (pointwise µ(u...), N̄ = M̄·µ̄ with M̄ from
ReciprocalLaplacianFactor OR N̄ = µ̄ directly, L̄ from
ReciprocalLaplacianFactor / ReciprocalLaplacianSquareFactor /
SwiftHohenbergLinear — i.e. the Cahn-Hilliard, Allen-Cahn-coupled
(benchmark 2a) and Swift-Hohenberg families — predictor/corrector orders
≤ 2; one variable or N coupled variables, serial or 3-D FFT_SLAB mesh)
and anything else raises a named error.  The Adams-Moulton
corrector reuses the SAME update kernel per corrector step: ū base =
the pre-predictor ū, α-weights in the SMEM scalars, N_n frozen.  Numerics: identical formula to AdamsBashforthMoulton
.substep at f32; parity tested in interpret mode (tests/test_pallas_spectral.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_fft as pf


class SpectralChainError(Exception):
    """The deck's solve chain does not match the fused-substep pattern."""


@dataclass
class SpectralPlan:
    mu_fn: Callable  # pointwise µ = f'(u)
    mobility: Optional[float]  # M̄ = -k² · mobility; None → N̄ = µ̄ directly
    # L̄ recomputed in-registers: ("lapsq", κ) → k⁴·κ
    # (ReciprocalLaplacianSquareFactor) or ("sh", r, α) → r − α²(1−k²)²
    # (SwiftHohenbergLinear)
    lin: tuple
    buffer: str  # u
    reciprocal: str  # ū
    nonlinear: str  # N̄
    linear: str  # L̄ buffer name (recomputed lazily in-kernel)
    mu: str  # µ buffer name
    mubar: str  # µ̄ buffer name
    shape: tuple
    kx2: np.ndarray  # (nx, 1) permuted kx², f32
    kyz2: np.ndarray  # (1, ny·nz) permuted ky²+kz² flattened, f32


@dataclass
class SpectralPlanMulti:
    """N-variable fused plan (the 2a/Ostwald shape: N coupled fields on one
    grid, per-variable M̄/L̄).  M̄ and L̄ generalize to polynomials in k²
    rebuilt in-registers:

        M̄_i = m0 + m1·k²               (ForwardFFT→N̄ directly: m=(1,0);
                                         ReciprocalLaplacianFactor f: (0,−f))
        L̄_i = la0 + la1·k² + la2·k⁴    (ReciprocalLaplacianFactor f:
                                         (0,−f,0); SquareFactor f: (0,0,f);
                                         SwiftHohenberg r,α:
                                         (r−α², 2α², −α²))

    µ_1..µ_N are pointwise functions of ALL N fields, so they evaluate as
    one XLA pointwise stage on the stacked fields (XLA fuses the N parsed
    expressions); the batched planar kernels then run vmapped over the
    leading field axis."""

    mu_stack: Callable  # (N,)+shape real stack -> (N,)+shape µ stack
    coef: np.ndarray  # (N, 5) f32 rows [m0, m1, la0, la1, la2]
    buffers: list
    reciprocals: list
    nonlinears: list
    mus: list
    mubars: list
    shape: tuple
    kx2: np.ndarray
    kyz2: np.ndarray


def _reject(msg):
    raise SpectralChainError(
        f"fused_spectral = true: {msg} (drop the flag for the general path)"
    )


# ---------------------------------------------------------------------------
# the final-forward-axis + k-space-update kernel
# ---------------------------------------------------------------------------


def _fwd_x_update_kernel(n, tl, mobility, lin):
    """Forward sublane transform of (µ̄r, µ̄i) along axis 0 fused with the
    ABM predictor update.  Emits (ūr, ūi, N̄r, N̄i)."""

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, twr_ref, twi_ref,
               cr_ref, ci_ref, onr_ref, oni_ref, kx2_ref, kyz2_ref, scal_ref,
               ur_ref, ui_ref, nr_ref, ni_ref):
        # µ̄ with the x axis transformed (the shared sublane transform)
        mr, mi = pf._fwd_sublanes_transform(
            xr_ref[:], xi_ref[:], wr_ref[:], wi_ref[:], twr_ref[:],
            twi_ref[:], n, tl,
        )

        # -- fused ABM predictor update (solvers/abm.py substep) ----------
        sub_dt = scal_ref[0, 0]
        b0 = scal_ref[0, 1]
        b1 = scal_ref[0, 2]
        k2 = kx2_ref[:] + kyz2_ref[:]  # (n,1) + (1,tl) → (n,tl)
        if lin[0] == "lapsq":
            Lb = (k2 * k2) * lin[1]  # ReciprocalLaplacianSquareFactor
        else:  # "sh": r − α²(1−k²)² (SwiftHohenbergLinear)
            om = 1.0 - k2
            Lb = lin[1] - (lin[2] * lin[2]) * (om * om)
        if mobility is None:  # N̄ = µ̄ (Swift-Hohenberg class)
            nr, ni = mr, mi
        else:
            Mb = -k2 * mobility  # ReciprocalLaplacianFactor
            nr = Mb * mr
            ni = Mb * mi
        acc_r = b0 * nr + b1 * onr_ref[:]
        acc_i = b0 * ni + b1 * oni_ref[:]
        den = 1.0 / (1.0 - sub_dt * Lb)
        ur_ref[:] = (cr_ref[:] + sub_dt * acc_r) * den
        ui_ref[:] = (ci_ref[:] + sub_dt * acc_i) * den
        nr_ref[:] = nr
        ni_ref[:] = ni

    return kernel


def _call_update(mr, mi, cr, ci, onr, oni, kx2, kyz2, scal, plan):
    n, L = mr.shape
    tl = pf._pick_tl(L, n)
    b = pf.base(n)
    r = n // b
    bs = pl.BlockSpec((n, tl), lambda j: (0, j), memory_space=pltpu.VMEM)
    fw = lambda shp: pl.BlockSpec(shp, lambda j: (0, 0), memory_space=pltpu.VMEM)
    in_specs = (
        [bs, bs]
        + [fw((b, b)), fw((b, b)), fw((r, b)), fw((r, b))]
        + [bs, bs, bs, bs]
        + [fw((n, 1)), pl.BlockSpec((1, tl), lambda j: (0, j),
                                    memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, 4), lambda j: (0, 0), memory_space=pltpu.SMEM)]
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((n, L), jnp.float32) for _ in range(4)
    )
    kern = _fwd_x_update_kernel(n, tl, plan.mobility, plan.lin)
    consts = pf._consts(n, False)
    # the fused kernel holds ~2-3x the live footprint _pick_tl's 8 MB
    # heuristic assumes (10 block-sized I/O refs + DFT tables + update
    # temporaries) — raise the scoped-VMEM limit past the 16 MB default
    # like the LBM kernel so whole-L direct-DFT blocks (e.g. 400²) don't
    # die in a raw Mosaic VMEM error after passing every build-time check
    import os

    vmem_mb = int(os.environ.get("MARLIN_TPU_SPECTRAL_VMEM_MB", "64"))
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2 ** 20)
        if not pf._interpret() else None
    )
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(L // tl,),
        in_specs=in_specs,
        out_specs=tuple(bs for _ in range(4)),
        interpret=pf._interpret(),
        compiler_params=params,
    )(mr, mi, *consts, cr, ci, onr, oni, kx2, kyz2, scal)


def _fwd_x_update_kernel_poly(n, tl):
    """Multi-variable variant of _fwd_x_update_kernel: M̄/L̄ arrive as
    per-variable polynomial-in-k² coefficients in the SMEM scalar row
    [sub_dt, b0, b1, m0, m1, la0, la1, la2] instead of static plan values,
    so ONE kernel serves every variable under a leading vmap axis."""

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, twr_ref, twi_ref,
               cr_ref, ci_ref, onr_ref, oni_ref, kx2_ref, kyz2_ref, scal_ref,
               ur_ref, ui_ref, nr_ref, ni_ref):
        mr, mi = pf._fwd_sublanes_transform(
            xr_ref[:], xi_ref[:], wr_ref[:], wi_ref[:], twr_ref[:],
            twi_ref[:], n, tl,
        )
        sub_dt = scal_ref[0, 0]
        b0 = scal_ref[0, 1]
        b1 = scal_ref[0, 2]
        m0 = scal_ref[0, 3]
        m1 = scal_ref[0, 4]
        la0 = scal_ref[0, 5]
        la1 = scal_ref[0, 6]
        la2 = scal_ref[0, 7]
        k2 = kx2_ref[:] + kyz2_ref[:]
        Lb = la0 + la1 * k2 + la2 * (k2 * k2)
        Mb = m0 + m1 * k2
        nr = Mb * mr
        ni = Mb * mi
        acc_r = b0 * nr + b1 * onr_ref[:]
        acc_i = b0 * ni + b1 * oni_ref[:]
        den = 1.0 / (1.0 - sub_dt * Lb)
        ur_ref[:] = (cr_ref[:] + sub_dt * acc_r) * den
        ui_ref[:] = (ci_ref[:] + sub_dt * acc_i) * den
        nr_ref[:] = nr
        ni_ref[:] = ni

    return kernel


def _call_update_poly(mr, mi, cr, ci, onr, oni, kx2, kyz2, scal8):
    """pallas_call wrapper for the per-variable polynomial update; scal8 is
    the (1, 8) SMEM row for THIS variable."""
    n, L = mr.shape
    tl = pf._pick_tl(L, n)
    b = pf.base(n)
    r = n // b
    bs = pl.BlockSpec((n, tl), lambda j: (0, j), memory_space=pltpu.VMEM)
    fw = lambda shp: pl.BlockSpec(shp, lambda j: (0, 0), memory_space=pltpu.VMEM)
    in_specs = (
        [bs, bs]
        + [fw((b, b)), fw((b, b)), fw((r, b)), fw((r, b))]
        + [bs, bs, bs, bs]
        + [fw((n, 1)), pl.BlockSpec((1, tl), lambda j: (0, j),
                                    memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, 8), lambda j: (0, 0), memory_space=pltpu.SMEM)]
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((n, L), jnp.float32) for _ in range(4)
    )
    consts = pf._consts(n, False)
    import os

    vmem_mb = int(os.environ.get("MARLIN_TPU_SPECTRAL_VMEM_MB", "64"))
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2 ** 20)
        if not pf._interpret() else None
    )
    return pl.pallas_call(
        _fwd_x_update_kernel_poly(n, tl),
        out_shape=out_shape,
        grid=(L // tl,),
        in_specs=in_specs,
        out_specs=tuple(bs for _ in range(4)),
        interpret=pf._interpret(),
        compiler_params=params,
    )(mr, mi, *consts, cr, ci, onr, oni, kx2, kyz2, scal8)


def ch_substep_multi(u, cr, ci, onr, oni, scal, plan: SpectralPlanMulti):
    """One fused predictor substep over the N-variable stack.

    u: (N,)+shape real stack; (cr, ci)/(onr, oni): (N, nx, L) planar ū and
    old-N̄ stacks; scal: the solver's (1, 4) f32 row [sub_dt, β0, β1, 0]
    (shared across variables — per-variable M̄/L̄ coefficients come from
    plan.coef).  Returns (u', ur, ui, nr, ni) stacks."""
    shape = plan.shape
    nx = shape[0]
    L = int(np.prod(shape[1:], dtype=int))
    N = len(plan.buffers)
    mus = plan.mu_stack(u)
    rr, ri = jax.vmap(
        lambda m: pf.fftn_unordered_planar(m, skip_axis0=True))(mus)
    scal8 = jnp.concatenate(
        [jnp.broadcast_to(scal[:, :3], (N, 3)),
         jnp.asarray(plan.coef, jnp.float32)], axis=1)[:, None, :]
    kx2 = jnp.asarray(plan.kx2)
    kyz2 = jnp.asarray(plan.kyz2)
    ur, ui, nr, ni = jax.vmap(
        lambda a, b, c2, d, e, f, s8: _call_update_poly(
            a.reshape(nx, L), b.reshape(nx, L), c2, d, e, f, kx2, kyz2, s8)
    )(rr, ri, cr, ci, onr, oni, scal8)
    u_new = jax.vmap(
        lambda a, b: pf.ifftn_unordered_planar(
            a.reshape(shape), b.reshape(shape), shape))(ur, ui)
    return u_new, ur, ui, nr, ni


def ch_substep_sharded(c, cr, ci, onr, oni, scal, plan: SpectralPlan,
                       ky2, kxz2_loc):
    """One fused predictor substep on a SLAB SHARD (inside shard_map over
    the 'sp' mesh axis) — VERDICT r01 item 2.

    c: LOCAL Y-sharded real block (nx, ny/p, nz); cr/ci/onr/oni: LOCAL
    X-sharded planar spectrum blocks (nx/p, ny, nz).  The z (lanes, µ
    fused) and x (sublanes) kernels run on the local block, one planar
    all_to_all transposes to the X-sharded layout, and the y kernel applies
    the k-space update in its epilogue — the same five-pass structure as
    the serial substep, with the transpose riding ICI.

    ky2: (ny, 1) permuted ky² table (the update kernel's transform-axis k²
    operand); kxz2_loc: (nx/p, 1, nz) per-local-x-row kx²+kz² tables."""
    a2a = lambda a, s, t: jax.lax.all_to_all(
        a, "sp", split_axis=s, concat_axis=t, tiled=True)
    rr, ri = pf.fwd_axes_planar(c, (0, 2), pre=plan.mu_fn)
    rr, ri = a2a(rr, 0, 1), a2a(ri, 0, 1)
    ur, ui, nr2, ni2 = jax.vmap(
        lambda mr, mi, a, b, c2, d, kk: _call_update(
            mr, mi, a, b, c2, d, ky2, kk, scal, plan)
    )(rr, ri, cr, ci, onr, oni, kxz2_loc)
    br, bi = pf.inv_axes_planar(ur, ui, (1,))
    br, bi = a2a(br, 1, 0), a2a(bi, 1, 0)
    c_new = pf.inv_axes_planar(br, bi, (0, 2), real_output=True)
    return c_new, ur, ui, nr2, ni2


def ch_substep_sharded_multi(u, cr, ci, onr, oni, scal,
                             plan: SpectralPlanMulti, ky2, kxz2_loc):
    """N-variable fused substep on a SLAB SHARD (inside shard_map over the
    'sp' axis): the single-variable sharded structure with every stage
    vmapped over the leading field axis and per-variable M̄/L̄ polynomial
    rows.  u: (N, nx, ny/p, nz) local real stack; cr/ci/onr/oni:
    (N, nx/p, ny, nz) local planar spectrum stacks."""
    N = len(plan.buffers)
    a2a = lambda a, s, t: jax.lax.all_to_all(
        a, "sp", split_axis=s, concat_axis=t, tiled=True)
    mus = plan.mu_stack(u)
    rr, ri = jax.vmap(lambda m: pf.fwd_axes_planar(m, (0, 2)))(mus)
    # planar transpose axes shift by one for the leading field axis
    rr, ri = a2a(rr, 1, 2), a2a(ri, 1, 2)
    scal8 = jnp.concatenate(
        [jnp.broadcast_to(scal[:, :3], (N, 3)),
         jnp.asarray(plan.coef, jnp.float32)], axis=1)[:, None, :]
    ur, ui, nr2, ni2 = jax.vmap(
        lambda RR, RI, A, B, C2, D, s8: jax.vmap(
            lambda mr, mi, a, b, c2, d, kk: _call_update_poly(
                mr, mi, a, b, c2, d, ky2, kk, s8)
        )(RR, RI, A, B, C2, D, kxz2_loc)
    )(rr, ri, cr, ci, onr, oni, scal8)
    br, bi = jax.vmap(lambda a, b: pf.inv_axes_planar(a, b, (1,)))(ur, ui)
    br, bi = a2a(br, 2, 1), a2a(bi, 2, 1)
    u_new = jax.vmap(
        lambda a, b: pf.inv_axes_planar(a, b, (0, 2), real_output=True)
    )(br, bi)
    return u_new, ur, ui, nr2, ni2


def ch_substep(c, cr, ci, onr, oni, scal, plan: SpectralPlan):
    """One fused predictor substep.

    c: (nx,ny,nz) real field; (cr, ci): planar ū; (onr, oni): planar old
    N̄ (flattened (nx, ny·nz)); scal: (1,4) f32 [sub_dt, β0, β1, 0].
    Returns (c', ur, ui, nr, ni)."""
    shape = plan.shape
    nx = shape[0]
    L = int(np.prod(shape[1:], dtype=int))
    # forward: µ fused into the lanes kernel; axes nz, ny; skip axis 0
    rr, ri = pf.fftn_unordered_planar(c, pre=plan.mu_fn, skip_axis0=True)
    ur, ui, nr, ni = _call_update(
        rr.reshape(nx, L), ri.reshape(nx, L), cr, ci, onr, oni,
        jnp.asarray(plan.kx2), jnp.asarray(plan.kyz2), scal, plan,
    )
    c_new = pf.ifftn_unordered_planar(
        ur.reshape(shape), ui.reshape(shape), shape
    )
    return c_new, ur, ui, nr, ni


# ---------------------------------------------------------------------------
# deck-chain pattern matching
# ---------------------------------------------------------------------------


def _flatten(group):
    from .computes.base import ComputeGroup

    out = []
    for m in group.members:
        if isinstance(m, ComputeGroup):
            out += _flatten(m)
        else:
            out.append(m)
    return out


def _check_preconditions(solver):
    dom = solver.domain
    if getattr(dom.fft_backend, "name", str(dom.fft_backend)) != "PALLAS":
        _reject("requires [Domain] fft_backend = PALLAS")
    if dom.dim < 2:
        _reject("only 2-D/3-D domains are supported")
    if not solver.carry_reciprocal:
        _reject("requires carry_reciprocal = true")
    if solver.predictor_order > 1:  # 0-indexed; orders 1-2
        _reject("predictor orders above 2 are not fusable (history depth 1)")
    if solver.corrector_steps and solver.corrector_order > 1:
        _reject("corrector orders above 2 are not fusable (history depth 1)")
    if solver.forwarded_buffers:
        _reject("buffer forwarding is not supported")
    if getattr(solver, "predictors", []):
        _reject("predictors are not supported")


def _find_ic(problem, name, classes, what):
    for m in _flatten(problem.ic_computes):
        if getattr(m, "out", None) == name:
            if not isinstance(m, classes):
                _reject(f"{what} must be produced by one of "
                        f"{[c.__name__ for c in classes]}")
            return m
    _reject(f"no Initialize compute produces {what} '{name}'")


def _k2_tables(dom):
    kx2 = (dom._np_raxes[0] ** 2).reshape(-1, 1).astype(np.float32)
    trailing = dom._np_raxes[1] ** 2
    for d in range(2, dom.dim):
        trailing = trailing[..., None] + dom._np_raxes[d] ** 2
    return kx2, trailing.reshape(1, -1).astype(np.float32)


def _verify_product(nl, mbar_name, mubar_name):
    """The N̄ ParsedCompute must be exactly the product M̄·µ̄."""
    rng = np.random.RandomState(0)
    a = rng.randn(4).astype(np.float64)
    b = rng.randn(4) + 1j * rng.randn(4)
    got = np.asarray(nl.expr({mbar_name: a, mubar_name: b}))
    if not np.allclose(got, a * b, rtol=1e-5, atol=1e-6):
        _reject("N̄ expression is not the product M̄·µ̄")


def match_chain(solver) -> SpectralPlan:
    """Validate the solver's chain against the fused pattern; raises
    SpectralChainError naming the unsupported feature.  Multi-variable
    chains dispatch to match_chain_multi."""
    from .computes.core import (ForwardFFT, ParsedCompute,
                                ReciprocalLaplacianFactor,
                                ReciprocalLaplacianSquareFactor)

    problem = solver.problem
    dom = solver.domain
    _check_preconditions(solver)
    if len(solver.variables) != 1:
        return match_chain_multi(solver)
    v = solver.variables[0]
    if v.linear_reciprocal is None:
        _reject("a linear_reciprocal buffer is required")

    flatten = _flatten
    members = flatten(solver.compute)
    mu = fftc = nl = None
    for m in members:
        if isinstance(m, ForwardFFT) and fftc is None:
            fftc = m
        elif isinstance(m, ParsedCompute) and m.inputs == [v.buffer] and mu is None:
            mu = m
        elif isinstance(m, ParsedCompute) and nl is None:
            nl = m
        else:
            _reject(f"solve compute '{m.name}' ({type(m).__name__}) is not fusable")
    from .computes.core import SwiftHohenbergLinear

    for what, c in (("pointwise µ(u) ParsedCompute", mu),
                    ("ForwardFFT", fftc)):
        if c is None:
            _reject(f"the chain requires a {what}")
    if mu.extra_symbols or mu.expand != "NONE" or mu.is_integer:
        _reject("µ must be a pure pointwise function of the variable")
    if fftc.input != mu.out:
        _reject("the ForwardFFT must transform µ")

    # find the Initialize producers of M̄ and L̄
    def find_ic(name, classes, what):
        return _find_ic(problem, name, classes, what)

    if nl is None:
        # Swift-Hohenberg class: N̄ IS the transform of the pointwise
        # nonlinearity — no mobility factor
        if fftc.out != v.nonlinear_reciprocal:
            _reject("without an N̄ ParsedCompute, the ForwardFFT must "
                    "produce nonlinear_reciprocal directly")
        mobility = None
    else:
        if nl.out != v.nonlinear_reciprocal:
            _reject("the second ParsedCompute must produce nonlinear_reciprocal")
        mbar_in = [b for b in nl.inputs if b != fftc.out]
        if set(nl.inputs) != {fftc.out} | set(mbar_in) or len(mbar_in) != 1:
            _reject("N̄ must be a function of µ̄ and one k-space factor buffer")
        mbar = find_ic(mbar_in[0], (ReciprocalLaplacianFactor,), "M̄")
        # verify N̄ = M̄·µ̄ functionally (product is the only accepted form)
        _verify_product(nl, mbar_in[0], fftc.out)
        mobility = float(mbar.factor)

    lbar = find_ic(
        v.linear_reciprocal,
        (ReciprocalLaplacianFactor, ReciprocalLaplacianSquareFactor,
         SwiftHohenbergLinear), "L̄",
    )
    if isinstance(lbar, ReciprocalLaplacianFactor):
        # single-variable Allen-Cahn class (L̄ = -k²·factor): the dedicated
        # single-variable kernel only encodes lapsq/sh forms, but the
        # N-variable polynomial-coefficient plan handles every L̄ polynomial
        # in k² and works at N = 1 — route through it (r03 advisor finding:
        # this chain was documented as supported but rejected here)
        return match_chain_multi(solver)
    if isinstance(lbar, ReciprocalLaplacianSquareFactor):
        lin = ("lapsq", float(lbar.factor))
    else:
        lin = ("sh", float(lbar.r), float(lbar.alpha))

    mu_fn = lambda arr: mu.expr({v.buffer: arr})

    shape = tuple(dom.shape)
    kx2, kyz2 = _k2_tables(dom)
    return SpectralPlan(
        mu_fn=mu_fn,
        mobility=mobility,
        lin=lin,
        buffer=v.buffer,
        reciprocal=v.reciprocal_buffer,
        nonlinear=v.nonlinear_reciprocal,
        linear=v.linear_reciprocal,
        mu=mu.out,
        mubar=fftc.out,
        shape=shape,
        kx2=kx2,
        kyz2=kyz2,
    )


def match_chain_multi(solver) -> SpectralPlanMulti:
    """N-variable fused pattern (benchmark 2a / Ostwald shape).

    Per variable v the chain must provide:
      - µ_v: a ParsedCompute whose inputs are a subset of the N integrated
        variable buffers (the coupled chemical potentials are pointwise in
        ALL fields);
      - µ̄_v = ForwardFFT(µ_v);
      - N̄_v: either the ForwardFFT output directly (M̄ = 1) or a
        ParsedCompute N̄ = M̄·µ̄ with M̄ from ReciprocalLaplacianFactor;
      - L̄_v from ReciprocalLaplacianFactor / ReciprocalLaplacianSquareFactor
        / SwiftHohenbergLinear (all are polynomials in k², rebuilt
        in-registers).

    Reference semantics: AdamsBashforthMoulton.C:60-187 looping over
    multiple variables.  Anything else raises SpectralChainError."""
    from .computes.core import (ForwardFFT, ParsedCompute,
                                ReciprocalLaplacianFactor,
                                ReciprocalLaplacianSquareFactor,
                                SwiftHohenbergLinear)

    problem = solver.problem
    dom = solver.domain
    varnames = [v.buffer for v in solver.variables]
    members = _flatten(solver.compute)
    by_out = {}
    for m in members:
        out = getattr(m, "out", None)
        if out is None:
            _reject(f"solve compute '{m.name}' has no output buffer")
        if out in by_out:
            _reject(f"solve computes '{by_out[out].name}' and '{m.name}' "
                    f"both write buffer '{out}'")
        by_out[out] = m

    used = set()
    coef = np.zeros((len(varnames), 5), np.float32)
    mus, mubars = [], []

    for i, v in enumerate(solver.variables):
        if v.linear_reciprocal is None:
            _reject(f"variable '{v.buffer}' has no linear_reciprocal")
        nl_prod = by_out.get(v.nonlinear_reciprocal)
        if nl_prod is None:
            _reject(f"no solve compute produces nonlinear_reciprocal "
                    f"'{v.nonlinear_reciprocal}'")
        if isinstance(nl_prod, ForwardFFT):
            fftc, m0, m1 = nl_prod, 1.0, 0.0
        elif isinstance(nl_prod, ParsedCompute):
            ff = [n for n in nl_prod.inputs
                  if isinstance(by_out.get(n), ForwardFFT)]
            rest = [n for n in nl_prod.inputs if n not in ff]
            if len(ff) != 1 or len(rest) != 1:
                _reject(f"N̄ '{nl_prod.name}' must combine one ForwardFFT "
                        "output with one k-space factor buffer")
            fftc = by_out[ff[0]]
            mbar = _find_ic(problem, rest[0], (ReciprocalLaplacianFactor,),
                            f"M̄ for '{v.buffer}'")
            _verify_product(nl_prod, rest[0], ff[0])
            m0, m1 = 0.0, -float(mbar.factor)  # -k² · factor
            used.add(id(nl_prod))
        else:
            _reject(f"nonlinear_reciprocal producer '{nl_prod.name}' "
                    f"({type(nl_prod).__name__}) is not fusable")
        used.add(id(fftc))

        mu = by_out.get(fftc.input)
        if not isinstance(mu, ParsedCompute):
            _reject(f"µ for '{v.buffer}' must be a ParsedCompute "
                    f"(ForwardFFT input '{fftc.input}')")
        if mu.extra_symbols or mu.expand != "NONE" or mu.is_integer:
            _reject(f"µ '{mu.name}' must be a pure pointwise expression")
        if not set(mu.inputs) <= set(varnames):
            _reject(f"µ '{mu.name}' reads non-variable buffers "
                    f"{sorted(set(mu.inputs) - set(varnames))}")
        used.add(id(mu))
        mus.append(mu)
        mubars.append(fftc.out)

        lbar = _find_ic(
            problem, v.linear_reciprocal,
            (ReciprocalLaplacianFactor, ReciprocalLaplacianSquareFactor,
             SwiftHohenbergLinear), f"L̄ for '{v.buffer}'")
        if isinstance(lbar, ReciprocalLaplacianSquareFactor):
            la = (0.0, 0.0, float(lbar.factor))  # k⁴ · factor
        elif isinstance(lbar, ReciprocalLaplacianFactor):
            la = (0.0, -float(lbar.factor), 0.0)  # -k² · factor
        else:  # r − α²(1−k²)² expanded in k²
            r, a = float(lbar.r), float(lbar.alpha)
            la = (r - a * a, 2.0 * a * a, -a * a)
        coef[i] = [m0, m1, *la]

    extra = [m for m in members if id(m) not in used]
    if extra:
        _reject("solve computes "
                f"{[m.name for m in extra]} are not part of the N-variable "
                "µ/FFT/N̄ pattern")

    exprs = [(mu.expr, list(mu.inputs)) for mu in mus]

    def mu_stack(u):
        env = {name: u[i] for i, name in enumerate(varnames)}
        return jnp.stack([expr({n: env[n] for n in inputs})
                          for expr, inputs in exprs])

    kx2, kyz2 = _k2_tables(dom)
    return SpectralPlanMulti(
        mu_stack=mu_stack,
        coef=coef,
        buffers=varnames,
        reciprocals=[v.reciprocal_buffer for v in solver.variables],
        nonlinears=[v.nonlinear_reciprocal for v in solver.variables],
        mus=[m.out for m in mus],
        mubars=mubars,
        shape=tuple(dom.shape),
        kx2=kx2,
        kyz2=kyz2,
    )
