"""Fused LBM substep — one Pallas pass over HBM per lattice update.

The jnp LBM substep (problem._lbm_step_impl, mirroring reference
LatticeBoltzmannProblem::execute :103-131) materializes every stage:
stream (roll gather), face bounce-back, density, velocity, equilibrium,
BGK collision — ≥460 B of HBM traffic per cell per substep (measured,
PERF.md).  The only data that must actually cross a substep boundary is
the post-collision distribution (fpc) plus the speed field (whose final
value feeds the residual of the trailing jnp substep).  This kernel
therefore performs the WHOLE substep as a single fused pass:

    read  fpc_old (pull-stream with halo)
    write fpc_new, speed_new

i.e. ~(2q + 1) * itemsize bytes/cell — the memory-bandwidth floor for an
AB-pattern LBM update.  The distribution is held q-MAJOR (q, nx, ny, nz)
inside the substep loop so each direction is a well-tiled (block, ny, nz)
plane on the VPU (the reference's trailing q axis wastes 109/128 lanes);
the layout transpose happens once per outer MOOSE step, amortized over
`substeps` lattice updates.

Streaming is the classic "pull" scheme: f_q(x) = fpc_old(x - e_q).  The
x-shift crosses block boundaries, provided by two single-plane halo
inputs with periodic index maps; y/z shifts are in-VMEM rolls.  Face
bounce-back (reference LBMBounceBack.C) is applied with static face
masks before the moments, exactly like the deck's Boundary chain.

Only the final substep of each MOOSE step runs through the regular jnp
chain, so every deck buffer (f, density, velocity, feq, speed) and the
old-state ring leave the step bit-consistent with the unfused path.

Enabled per-deck with `[Problem] lbm_backend = PALLAS`.  The fused
pattern covers (r04): stream -> bounce-back (faces + binary-media
obstacles) -> Zou-He fixed-order and zero-gradient faces -> moments ->
equilibrium -> BGK/MRT collision; collisionless chains (mixed_bcs_*);
and thermal double-distribution decks (Rayleigh-Benard/Pebbles: fluid f
+ passive-scalar g, Boussinesq buoyancy via LBMComputeForces, Guo
forcing via LBMApplyForces, residual on T).  Anything else raises a
named FusedChainError; the default JNP path is the fully general one.
CPU tests run the kernel in interpret mode.

2-D decks run SINGLE-BLOCK (B = nx): their (q, B, ny) blocks would
violate Mosaic's last-two-dims tiling rule for any B < nx.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CS2 = 1.0 / 3.0
CS4 = CS2 * CS2

_INTERPRET = False  # force-flag (tests); CPU backends auto-interpret


def _interpret() -> bool:
    """Mosaic kernels only compile on TPU; on CPU (tests, CLI runs with
    lbm_backend = PALLAS) fall back to interpret mode automatically."""
    return _INTERPRET or jax.default_backend() != "tpu"


class FusedChainError(Exception):
    """The deck's LBM chain does not match the fused-kernel pattern."""


@dataclass(frozen=True)
class PostBC:
    """One post-stream boundary condition, compiled to a static update plan
    at match time (kind 'zh': Zou-He fixed-order, reference
    LBMFixedFirstOrderBC.C / LBMFixedZerothOrderBC.C; kind 'zg':
    microscopic zero-gradient, reference LBMMicroscopicZeroGradientBC.C).

    Zou-He reduces to ONE uniform affine form for both orders, both sides,
    and both the D2Q9 and generic branches:

        facesum = sum(f[sum1]) + 2 * sum(f[sum2])      (known dirs at face)
        m       = a * facesum + b                      (momentum scalar)
        f[d]    = f[src] + cm * m + tc * (f[tp] - f[tm])   per unknown dir

    where for first-order (velocity v): m = v * rho = v * facesum / (1 -/+ v)
    -> a = v / (1 -/+ v), b = 0; and for zeroth-order (density r):
    m = r * u = +/-(r - facesum) -> a = -/+1, b = +/-r.  The D2Q9 branch
    adds the transverse correction rows (tc != 0); the generic branch keeps
    the reference's quirky negative-index neutral set in `sum1` verbatim.
    Reads within one BC see the PRE-BC distribution (the reference
    accumulates writes into `u` while reading `f`); writes become visible
    to LATER BCs — the kernel snapshots the planes per BC to match."""

    kind: str  # "zh" | "zg"
    axis: int
    side: int
    a: float = 0.0
    b: float = 0.0
    sum1: Tuple[int, ...] = ()
    sum2: Tuple[int, ...] = ()
    # per-unknown update rows: (dir, src, cm, tc, tp, tm)
    rows: Tuple[Tuple[int, int, float, float, int, int], ...] = ()
    # perturb = true (D2Q9 left-face velocity inlet, reference
    # LBMFixedFirstOrderBC::_ux_profile): the prescribed velocity becomes
    # the row profile v(y) = value·(1 + 1e-6·sin(2πy/ny)), so the momentum
    # scalar m = v/(1−v)·facesum is a plane instead of a·facesum + b
    perturb_value: float = 0.0


@dataclass(frozen=True)
class ForceSpec:
    """Force-field chain of the thermal two-lattice decks (reference
    LBMComputeForces.C + LBMApplyForces.C): a gravity/buoyancy field
    F_d = g·ρ (gravity) + g·ρ₀·(T − T₀) (Boussinesq buoyancy) enters the
    velocity as u += F/(2ρ) and the fluid collision as the Guo source
    (1 − 1/(2τ))·w_i·ρ·(e_i·F)/c_s²."""

    gravity: bool
    buoyancy: bool
    g: float
    rho0: float
    T0: float
    direction: int
    apply_tau: float  # LBMApplyForces tau0 (source prefactor)


@dataclass(frozen=True)
class FusedLBMConfig:
    q: int
    e: Tuple[Tuple[int, int, int], ...]
    w: Tuple[float, ...]
    op: Tuple[int, ...]
    nx: int
    ny: int
    nz: int
    block: int
    tau: float
    body_force: Tuple[float, float, float]
    # (axis, side, replaced_dirs) per bounce-back face, in deck order;
    # axis == -1 marks the obstacle ("wall") bounce-back slot
    faces: Tuple[Tuple[int, int, Tuple[int, ...]], ...]
    # binary media: solid masking + optional obstacle bounce-back
    has_media: bool = False
    # x-sharded execution (REAL_SPACE mesh): nx is the LOCAL extent,
    # x-halo planes arrive from ppermute neighbors, and x-face masks use
    # the global coordinate (shard offset via an SMEM scalar)
    sharded: bool = False
    nx_global: int = 0
    # 2-D mesh (p1 × p2): y is sharded too — ny is the LOCAL extent, the
    # wrap rows come from per-substep ppermute'd y-halo row arrays (with
    # their own x-halo corners so diagonal pulls are exact), and y-face
    # masks use the global coordinate.  z (the lane axis) stays local.
    shard_y: bool = False
    ny_global: int = 0
    # 2-D decks (D2Q9): blocks are (q, B, ny) with lanes on y — the
    # deck-level trailing nz = 1 axis is squeezed around the kernel
    two_d: bool = False
    # MRT collision: fpc = feq + fneq - MSM·fneq with the static q×q
    # matrix MSM = M⁻¹·S'·M (S' = stencil S with the kinematic-viscosity
    # diagonal set to 1/τ); None = BGK
    msm: Optional[Tuple[Tuple[float, ...], ...]] = None
    # post-stream BCs (Zou-He fixed-order / zero-gradient faces) applied in
    # deck order over the materialized streamed planes
    post_bcs: Tuple[PostBC, ...] = ()
    # False: collisionless chain (reference mixed_bcs_* decks — LBMStream
    # with f_old = f, moments only): the carried state is the post-BC
    # streamed distribution itself
    collide: bool = True
    # moments pass needed (collision and/or a speed compute present)
    need_moments: bool = True
    # coupled second lattice (thermal double-distribution decks, reference
    # examples/lbm/Rayleigh-Benard + Pebbles): lattice 2 carries the
    # passive scalar (temperature) advected at the fluid velocity; its
    # zeroth moment T feeds the buoyancy force on lattice 1
    two_lattice: bool = False
    tau2: float = 1.0
    msm2: Optional[Tuple[Tuple[float, ...], ...]] = None
    faces2: Tuple[Tuple[int, int, Tuple[int, ...]], ...] = ()
    post_bcs2: Tuple[PostBC, ...] = ()
    force: Optional[ForceSpec] = None
    # what the carried scalar output holds: "umag" (velocity magnitude),
    # "t" (lattice-2 zeroth moment — the thermal decks' residual field),
    # or "none"
    speed_kind: str = "umag"
    # Hermite second-order regularization of fneq before collision
    # (reference LBMCollisionDynamics::_hermite_regularization; the
    # `projection = true` deck knob), per lattice
    proj: bool = False
    proj2: bool = False
    # Smagorinsky turbulent collision on the fluid lattice: (C_s, τ₀) —
    # per-cell τ from the non-equilibrium momentum flux and the GLOBAL
    # mean density (reference computeRelaxationParameter).  Only 2-D
    # single-block serial decks fuse it: there the whole grid is the
    # block, so the global mean is an in-VMEM reduction
    smag: Optional[Tuple[float, float]] = None


@dataclass(frozen=True)
class FusedLBMPlan:
    config: FusedLBMConfig
    fpc: str  # post-collision distribution (the carried state)
    speed: Optional[str]  # carried scalar buffer (residual input)
    media: Optional[str] = None  # binary-media buffer name
    fpc2: Optional[str] = None  # second lattice's carried distribution


def _roll(a, s, axis):
    """Periodic roll by s in {-1, 0, 1} via static slices (Mosaic-safe)."""
    if s == 0:
        return a
    n = a.shape[axis]
    lo = jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)
    hi = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
    first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
    rest = jax.lax.slice_in_dim(a, 1, n, axis=axis)
    if s > 0:  # f_new[i] = f_old[i-1]
        return jnp.concatenate([hi, lo], axis=axis)
    return jnp.concatenate([rest, first], axis=axis)


def _make_kernel(cfg: FusedLBMConfig):
    B, q, ny, nz = cfg.block, cfg.q, cfg.ny, cfg.nz
    inv_tau = 1.0 / cfg.tau
    inv_tau2 = 1.0 / cfg.tau2
    bfx, bfy, bfz = cfg.body_force

    n_blocks = cfg.nx // B

    # 2-D decks run SINGLE-BLOCK (B = nx, enforced by _pick_block): their
    # (q, B, ny) blocks and (q, 1, ny) halo planes would violate Mosaic's
    # last-two-dims tiling rule for any B < nx, so the x wrap is an
    # in-block roll and only the sharded exchange planes (whole small
    # arrays — tiling-legal) come from outside
    single = cfg.two_d

    def kernel(*refs):
        refs = list(refs)

        def take_lattice():
            """One lattice's input-ref family: blocked center, fixed wrap
            plane, right halo, sharded exchange planes, y-halo rows."""
            d = {"center": refs.pop(0)}
            if not single:
                d["wrap"], d["right"] = refs.pop(0), refs.pop(0)
            else:
                d["wrap"] = d["right"] = None
            if cfg.sharded:
                d["ext"] = (refs.pop(0), refs.pop(0))
            else:
                d["ext"] = (None, None)
            if cfg.shard_y:
                d["yset"] = tuple(refs[:10])
                del refs[:10]
            else:
                d["yset"] = None
            return d

        lat1 = take_lattice()
        lat2 = take_lattice() if cfg.two_lattice else None
        if cfg.has_media:
            m_center = refs.pop(0)
            if not single:
                m_left, m_right = refs.pop(0), refs.pop(0)
            else:
                m_left = m_right = None
            if cfg.sharded:
                m_ext_l, m_ext_r = refs[:2]
                del refs[:2]
            else:
                m_ext_l = m_ext_r = None
            if cfg.shard_y:
                m_yset = tuple(refs[:10])
                del refs[:10]
            else:
                m_yset = None
        else:
            m_center = m_left = m_right = None
            m_ext_l = m_ext_r = None
            m_yset = None
        if cfg.sharded:
            off_ref = refs.pop(0)
        fpc_out = refs.pop(0)
        gpc_out = refs.pop(0) if cfg.two_lattice else None
        speed_out = refs.pop(0)
        carry1 = refs.pop(0) if not single else None
        carry2 = refs.pop(0) if (cfg.two_lattice and not single) else None
        lat1["carry"] = carry1
        if lat2 is not None:
            lat2["carry"] = carry2
        i = pl.program_id(0)
        xg0 = i * B  # LOCAL x index of the block's first plane
        if cfg.sharded:
            xg0_global = xg0 + off_ref[0, 0]
        else:
            xg0_global = xg0
        yoff = off_ref[0, 1] if cfg.shard_y else 0

        def xshift(ref_c, ref_l, ref_r, ext_lo, ext_hi, qi, ex,
                   wrap=None, carry=None):
            """The x part of the pull shift on a blocked (q, B, w[, nz])
            ref family (w = ny for the field, 1 for y-halo rows); sharded
            mode substitutes the neighbor-exchanged planes at the shard's
            boundary blocks.  ref_l is None for a MAIN field: its left
            halo is the previous block's last plane, carried in VMEM
            scratch (the grid is sequential), so only the wrap/ext plane
            at i == 0 ever comes from outside — that plane's BlockSpec
            index is FIXED, so its DMA is elided after the first block."""
            sel = (lambda r, s: r[s]) if qi is None else (lambda r, s: r[qi, s])
            if single:
                # single-block (2-D): the whole x extent is in VMEM — the
                # periodic wrap is an in-block slice, with the sharded
                # exchange plane substituted at the shard boundary
                if ex == 1:
                    plane = (sel(ext_lo, slice(None)) if cfg.sharded
                             else sel(ref_c, slice(B - 1, B)))
                    return jnp.concatenate(
                        [plane, sel(ref_c, slice(0, B - 1))], axis=0)
                if ex == -1:
                    plane = (sel(ext_hi, slice(None)) if cfg.sharded
                             else sel(ref_c, slice(0, 1)))
                    return jnp.concatenate(
                        [sel(ref_c, slice(1, B)), plane], axis=0)
                return sel(ref_c, slice(None))
            if ex == 1:
                if ref_l is None:
                    w_plane = sel(ext_lo, slice(None)) if cfg.sharded \
                        else sel(wrap, slice(None))
                    plane = jnp.where(i == 0, w_plane, sel(carry, slice(None)))
                else:
                    plane = sel(ref_l, slice(None))
                    if cfg.sharded:
                        plane = jnp.where(i == 0, sel(ext_lo, slice(None)),
                                          plane)
                if B > 1:
                    return jnp.concatenate(
                        [plane, sel(ref_c, slice(0, B - 1))], axis=0)
                return plane
            if ex == -1:
                plane = sel(ref_r, slice(None))
                if cfg.sharded:
                    plane = jnp.where(i == n_blocks - 1,
                                      sel(ext_hi, slice(None)), plane)
                if B > 1:
                    return jnp.concatenate(
                        [sel(ref_c, slice(1, B)), plane], axis=0)
                return plane
            return sel(ref_c, slice(None))

        def window(ref_c, ref_l, ref_r, ext_lo, ext_hi, ys, qi, ex, ey, ez,
                   wrap=None, carry=None):
            """(B,ny[,nz]) view shifted by -e (pull): value at x is the
            source field at x - e, periodic.  qi=None for media refs.
            `ys`: the 10-ref y-halo family when y is sharded — the halo
            row gets the SAME x shift (its own corner planes included), so
            diagonal pulls across shard corners are exact."""
            a = xshift(ref_c, ref_l, ref_r, ext_lo, ext_hi, qi, ex,
                       wrap=wrap, carry=carry)
            if ey and cfg.shard_y:
                (lo_c, lo_l, lo_r, lo_el, lo_er,
                 hi_c, hi_l, hi_r, hi_el, hi_er) = ys
                if ey == 1:
                    plane = xshift(lo_c, lo_l, lo_r, lo_el, lo_er, qi, ex)
                    a = jnp.concatenate(
                        [plane, jax.lax.slice_in_dim(a, 0, ny - 1, axis=1)],
                        axis=1)
                else:
                    plane = xshift(hi_c, hi_l, hi_r, hi_el, hi_er, qi, ex)
                    a = jnp.concatenate(
                        [jax.lax.slice_in_dim(a, 1, ny, axis=1), plane],
                        axis=1)
            else:
                a = _roll(a, ey, 1)
            if not cfg.two_d:
                a = _roll(a, ez, 2)
            return a

        # static face masks (x faces depend on the block index; x/y faces
        # use global coordinates when the axis is sharded)
        nx_face = cfg.nx_global if cfg.sharded else cfg.nx
        ny_face = cfg.ny_global if cfg.shard_y else ny
        pshape = (B, ny) if cfg.two_d else (B, ny, nz)
        masks = {}
        face_keys = (
            [(axis, side) for axis, side, _d in cfg.faces]
            + [(axis, side) for axis, side, _d in cfg.faces2]
            + [(bc.axis, bc.side) for bc in cfg.post_bcs]
            + [(bc.axis, bc.side) for bc in cfg.post_bcs2]
        )
        for axis, side in face_keys:
            key = (axis, side)
            if axis < 0 or key in masks:
                continue
            io = jax.lax.broadcasted_iota(jnp.int32, pshape, axis)
            if axis == 0:
                io = io + xg0_global
            elif axis == 1 and cfg.shard_y:
                io = io + yoff
            n_ax = (nx_face, ny_face, nz)[axis]
            masks[key] = io == (0 if side == 0 else n_ax - 1)

        if cfg.has_media:
            solid = m_center[...] == 0
            # bounce-back applies at FLUID cells only; the jnp chain's wall
            # mask (lbm_bc.py wall_boundary) defines fluid as media >= 1, so
            # negative media ids are neither solid-filled nor bounced
            fluid = m_center[...] >= 1

        def streamed(qi, L, faces):
            """Pull-streamed direction qi of lattice L with face + obstacle
            bounce-back and solid masking applied (reference
            LBMStream.C:51-80 + LBMBounceBack.C +
            LatticeBoltzmannProblem::maskedFillSolids)."""
            ex, ey, ez = cfg.e[qi]
            a = window(L["center"], None, L["right"], L["ext"][0],
                       L["ext"][1], L["yset"], qi, ex, ey, ez,
                       wrap=L["wrap"], carry=L["carry"])
            for axis, side, dirs in faces:
                if axis < 0:
                    # obstacle bounce-back: fluid cells whose upstream
                    # neighbor along e is solid (reference wallBoundary3D /
                    # the static per-direction mask in lbm_bc.py)
                    if qi != 0:
                        m_up = window(m_center, m_left, m_right, m_ext_l,
                                      m_ext_r, m_yset, None, ex, ey, ez)
                        a = jnp.where((m_up == 0) & fluid,
                                      L["center"][cfg.op[qi]], a)
                elif qi in dirs:
                    # face bounce-back: replaced dirs at a face read the
                    # OPPOSITE direction of the unstreamed old distribution
                    # at the same node
                    a = jnp.where(masks[(axis, side)],
                                  L["center"][cfg.op[qi]], a)
            if cfg.has_media:
                a = jnp.where(solid, jnp.zeros((), a.dtype), a)
            return a

        def apply_post(fs, bcs):
            """Apply the post-stream BC sequence in deck order over the
            materialized planes; per-BC snapshots so reads see the pre-BC
            distribution (the reference accumulates writes into u while
            reading f)."""
            for bc in bcs:
                mask = masks[(bc.axis, bc.side)]
                prev = list(fs)

                def put(d, val):
                    if cfg.has_media:
                        # the jnp chain re-zeros solids after every BC
                        val = jnp.where(solid, jnp.zeros((), val.dtype), val)
                    fs[d] = jnp.where(mask, val, fs[d])

                if bc.kind == "zg":
                    # copy the adjacent inner layer onto the face layer
                    # (reference LBMMicroscopicZeroGradientBC.C); the roll
                    # direction points AWAY from the face so the masked
                    # rows read their inner neighbor
                    shift = 1 if bc.side == 1 else -1
                    for qi in range(q):
                        put(qi, _roll(prev[qi], shift, bc.axis))
                else:
                    fsum = None
                    for d in bc.sum1:
                        fsum = prev[d] if fsum is None else fsum + prev[d]
                    for d in bc.sum2:
                        fsum = fsum + 2.0 * prev[d]
                    if bc.perturb_value:
                        # D2Q9 left-face sine inlet profile (reference
                        # LBMFixedFirstOrderBC::_ux_profile): v(y) varies by
                        # row, so the momentum scalar is a plane
                        v0 = bc.perturb_value
                        yio = jax.lax.broadcasted_iota(
                            jnp.int32, pshape, 1).astype(fsum.dtype)
                        if cfg.shard_y:
                            yio = yio + yoff
                        vprof = v0 + 1.0e-6 * v0 * jnp.sin(
                            yio / ny_face * 2.0 * math.pi)
                        m = vprof / (1.0 - vprof) * fsum
                    else:
                        m = bc.a * fsum + bc.b
                    for d, src, cm, tc, tp, tm in bc.rows:
                        val = prev[src] + cm * m
                        if tc:
                            val = val + tc * (prev[tp] - prev[tm])
                        put(d, val)
            return fs

        # post-stream BCs, collisionless chains, and the two-lattice path
        # need every direction's streamed plane at once — materialize them
        # (same VMEM class as the MRT path); otherwise keep the
        # recompute-per-direction path (one live temp)
        materialize = bool(cfg.post_bcs) or not cfg.collide or cfg.two_lattice
        if materialize:
            fs = apply_post([streamed(qi, lat1, cfg.faces)
                             for qi in range(q)], cfg.post_bcs)
            get = lambda qi: fs[qi]
        else:
            get = lambda qi: streamed(qi, lat1, cfg.faces)
        if cfg.two_lattice:
            gs = apply_post([streamed(qi, lat2, cfg.faces2)
                             for qi in range(q)], cfg.post_bcs2)

        if not cfg.need_moments:
            # collisionless chain without a speed compute (reference
            # mixed_bcs_* decks): the kernel is stream + BC only
            speed_out[...] = jnp.zeros(pshape, speed_out.dtype)
            for qi in range(q):
                fpc_out[qi] = get(qi)
            if not single:
                carry1[...] = lat1["center"][:, B - 1:B]
            return

        # pass 1: moments (reference LBMComputeDensity/LBMComputeVelocity)
        rho = None
        mx = my = mz = None
        for qi in range(q):
            a = get(qi)
            rho = a if rho is None else rho + a
            ex, ey, ez = cfg.e[qi]
            if ex:
                t = a if ex > 0 else -a
                mx = t if mx is None else mx + t
            if ey:
                t = a if ey > 0 else -a
                my = t if my is None else my + t
            if ez and not cfg.two_d:
                # 2-D domains force uz = 0 even for stencils with ez
                # components (jnp chain: LBMComputeVelocity emits dim comps)
                t = a if ez > 0 else -a
                mz = t if mz is None else mz + t
        if cfg.has_media:
            # solids carry rho = 0 (all f masked); make the division safe
            # and zero the velocity exactly as the jnp masked_fill chain
            inv_rho = jnp.where(solid, jnp.zeros((), rho.dtype), 1.0 / rho)
        else:
            inv_rho = 1.0 / rho

        # thermal lattice zeroth moment + force field (reference
        # LBMComputeDensity on g + LBMComputeForces.C)
        T = None
        Fx = Fy = Fz = None
        if cfg.two_lattice:
            for qi in range(q):
                T = gs[qi] if T is None else T + gs[qi]
        if cfg.force is not None:
            Fd = jnp.zeros(pshape, rho.dtype)
            if cfg.force.gravity:
                Fd = Fd + cfg.force.g * rho
            if cfg.force.buoyancy:
                Fd = Fd + cfg.force.g * cfg.force.rho0 * (T - cfg.force.T0)
            if cfg.has_media:
                # jnp chain: LBMComputeForces output is masked at solids
                Fd = jnp.where(solid, jnp.zeros((), Fd.dtype), Fd)
            zero = jnp.zeros(pshape, rho.dtype)
            comps = [zero, zero] if cfg.two_d else [zero, zero, zero]
            comps[cfg.force.direction] = Fd
            Fx, Fy = comps[0], comps[1]
            Fz = comps[2] if not cfg.two_d else None

        ux = mx * inv_rho + bfx * (0.5 * inv_rho)
        uy = my * inv_rho + bfy * (0.5 * inv_rho)
        if Fx is not None:
            ux = ux + Fx * (0.5 * inv_rho)
            uy = uy + Fy * (0.5 * inv_rho)
        if mz is None:  # 2-D (no ez components)
            uz = None
            usqr = ux * ux + uy * uy
        else:
            uz = mz * inv_rho + bfz * (0.5 * inv_rho)
            if Fz is not None:
                uz = uz + Fz * (0.5 * inv_rho)
            usqr = ux * ux + uy * uy + uz * uz

        # carried scalar (reference LBMComputeVelocityMagnitude, or the
        # thermal decks' residual field T).  The residual itself is NOT
        # computed here: only the LAST substep's residual survives the
        # loop, and that one comes from the trailing jnp substep.
        if cfg.speed_kind == "umag":
            speed_out[...] = jnp.sqrt(usqr)
        elif cfg.speed_kind == "t":
            speed_out[...] = T
        else:
            speed_out[...] = jnp.zeros(pshape, speed_out.dtype)

        def equilibrium(qi, dens):
            """feq for direction qi from the pass-1 moments (reference
            LBMEquilibrium.C:42-66); `dens` is rho for the fluid lattice
            and T for the thermal lattice (same velocity)."""
            ex, ey, ez = cfg.e[qi]
            edotu = 0.0
            if ex:
                edotu = ux if ex > 0 else -ux
            if ey:
                t = uy if ey > 0 else -uy
                edotu = t if isinstance(edotu, float) else edotu + t
            if ez and uz is not None:
                t = uz if ez > 0 else -uz
                edotu = t if isinstance(edotu, float) else edotu + t
            if isinstance(edotu, float):
                return cfg.w[qi] * dens * (1.0 - 0.5 * usqr / CS2)
            return (
                cfg.w[qi]
                * dens
                * (1.0 + edotu / CS2 + 0.5 * edotu * edotu / CS4
                   - 0.5 * usqr / CS2)
            )

        def guo_source(qi):
            """Guo forcing source on the fluid collision (reference
            LBMApplyForces.C): (1 − 1/(2τ))·w_i·ρ·(e_i·F)/c_s²."""
            ex, ey, ez = cfg.e[qi]
            edotF = None
            if ex:
                edotF = Fx if ex > 0 else -Fx
            if ey:
                t = Fy if ey > 0 else -Fy
                edotF = t if edotF is None else edotF + t
            if ez and Fz is not None:
                t = Fz if ez > 0 else -Fz
                edotF = t if edotF is None else edotF + t
            if edotF is None:
                return None
            pref = (1.0 - 0.5 / cfg.force.apply_tau) * cfg.w[qi] / CS2
            return pref * rho * edotF

        def hermite(fneqs):
            """Second-order Hermite regularization of the non-equilibrium
            planes (reference LBMCollisionDynamics::_hermite_regularization,
            the `projection = true` knob): project fneq onto the e⊗e
            Hermite space.  Static q×9 coefficient tables; zero entries
            skipped at trace time."""
            e = np.array(cfg.e, dtype=np.float64).T  # (3, q)
            ccr = np.einsum("ai,bi->iab", e, e).reshape(q, 9)
            H2 = (np.einsum("ai,bi->iab", e, e) / CS2
                  - np.eye(3)[None, :, :]).reshape(q, 9)
            cc = []
            for j in range(9):
                acc = None
                for qi in range(q):
                    cji = float(ccr[qi, j])
                    if cji == 0.0:
                        continue
                    t = fneqs[qi] * cji
                    acc = t if acc is None else acc + t
                cc.append(acc)
            out = []
            for qi in range(q):
                acc = None
                for j in range(9):
                    hij = float(H2[qi, j])
                    if hij == 0.0 or cc[j] is None:
                        continue
                    t = cc[j] * hij
                    acc = t if acc is None else acc + t
                pref = float(cfg.w[qi]) * (1.0 / (2.0 * CS2))
                out.append(pref * acc if acc is not None
                           else jnp.zeros(pshape, fneqs[qi].dtype))
            return out

        def smag_inv_tau(fneqs, dens):
            """Per-cell 1/τ from the non-equilibrium momentum flux and the
            GLOBAL mean density (reference computeRelaxationParameter;
            2-D single-block serial only — the block IS the grid, so the
            mean is an in-VMEM reduction)."""
            C_s, tau0 = cfg.smag
            e = np.array(cfg.e, dtype=np.float64).T
            zs, on = np.zeros(q), np.ones(q)
            ex2 = np.stack([e[0], zs, zs])
            ey2 = np.stack([zs, e[1], zs])
            ez2 = np.stack([on, zs, e[2]])  # deck nz == 1 (2-D)
            Q2 = None
            for k in range(3):
                for a_ in range(3):
                    for b_ in range(3):
                        comp = None
                        for qi in range(q):
                            c = float(ez2[k, qi] * ex2[a_, qi] * ey2[b_, qi])
                            if c == 0.0:
                                continue
                            t = fneqs[qi] * c
                            comp = t if comp is None else comp + t
                        if comp is not None:
                            t = comp * comp
                            Q2 = t if Q2 is None else Q2 + t
            mean_density = jnp.mean(dens)
            Q_mean = jnp.sqrt(Q2) / (mean_density * CS2)
            t_sgs = math.sqrt(C_s) * 1.0 / math.sqrt(CS2)
            eta = tau0 / t_sgs
            S = (-eta + jnp.sqrt(eta * eta + 4.0 * Q_mean)) / (2.0 * t_sgs)
            return 1.0 / (tau0 + C_s * S / CS2)

        def collide(out_ref, planes_get, dens, msm, itau, source, proj,
                    smag):
            """pass 2: equilibrium + collision (reference LBMBGKCollision /
            LBMMRTCollision / LBMSmagorinskyCollision), plus the optional
            Hermite projection and Guo source."""
            if msm is None and not proj and not smag:
                # BGK: planes_get() recomputed per direction on the
                # BB-only path keeps VMEM at one live (B,ny,nz) temp
                for qi in range(q):
                    a = planes_get(qi)
                    feq = equilibrium(qi, dens)
                    fneq = a - feq
                    u = feq + fneq - fneq * itau
                    if source is not None:
                        s = source(qi)
                        if s is not None:
                            u = u + s
                    if cfg.has_media:
                        u = jnp.where(solid, jnp.zeros((), u.dtype), u)
                    out_ref[qi] = u
                return
            # MRT / projected / Smagorinsky: every direction's fneq at
            # once — cache the q non-equilibrium planes in VMEM
            # (q·B·ny·nz·4 B, well under the raised 64 MB limit)
            fneqs = [planes_get(qi) - equilibrium(qi, dens)
                     for qi in range(q)]
            if proj:
                fneqs = hermite(fneqs)
            if smag:
                itau = smag_inv_tau(fneqs, dens)
            for qi in range(q):
                if msm is None:
                    u = equilibrium(qi, dens) + fneqs[qi] - fneqs[qi] * itau
                else:
                    relax = None
                    for qj in range(q):
                        cji = msm[qi][qj]
                        if cji == 0.0:
                            continue
                        t = fneqs[qj] * cji
                        relax = t if relax is None else relax + t
                    u = equilibrium(qi, dens) + fneqs[qi] - relax
                if source is not None:
                    s = source(qi)
                    if s is not None:
                        u = u + s
                if cfg.has_media:
                    u = jnp.where(solid, jnp.zeros((), u.dtype), u)
                out_ref[qi] = u

        if not cfg.collide:
            # collisionless chain WITH a speed compute: carry the post-BC
            # streamed distribution unchanged
            for qi in range(q):
                fpc_out[qi] = get(qi)
        else:
            source = (guo_source if cfg.force is not None
                      and cfg.force.apply_tau else None)
            collide(fpc_out, get, rho, cfg.msm, inv_tau, source,
                    cfg.proj, cfg.smag is not None)
            if cfg.two_lattice:
                collide(gpc_out, lambda qi: gs[qi], T, cfg.msm2, inv_tau2,
                        None, cfg.proj2, False)

        # stash this block's LAST input plane — the next (sequential) grid
        # step reads it as its left halo instead of re-fetching from HBM
        # (single-block mode has no next step and no carry scratch)
        if not single:
            carry1[...] = lat1["center"][:, B - 1:B]
            if cfg.two_lattice:
                carry2[...] = lat2["center"][:, B - 1:B]

    return kernel


def _pick_block(nx: int, ny: int, nz: int, q: int, itemsize: int,
                two_d: bool = False) -> int:
    """Largest x-block whose double-buffered pipeline footprint fits a
    conservative VMEM budget (same ~16 MB assumption as pallas_fft).
    MARLIN_TPU_LBM_BLOCK overrides (tuning knob).

    2-D decks are SINGLE-BLOCK (B = nx): their blocks are (q, B, ny), and
    Mosaic requires the last two block dims to be 8/128-divisible or equal
    to the array dims — a B < nx block (and its (q, 1, ny) halo planes)
    violates that on real hardware (caught by the r04 Rayleigh-Benard
    bench; the interpret-mode CPU tests never see the constraint)."""
    import os

    # the kernel raises the scoped-VMEM limit to MARLIN_TPU_LBM_VMEM_MB
    # (default 64 MB; v5e has 128 MB) — size blocks against the SAME
    # budget so the two knobs compose; blocks larger than 4 measured
    # SLOWER at 128^3 (B=8: 1507 vs B=4's 1805 MLUPS, with a 10-minute
    # Mosaic compile), so prefer 4
    budget = int(os.environ.get("MARLIN_TPU_LBM_VMEM_MB", "64")) * 2 ** 20

    def fits(b):
        # in: q*(b+2)+b cells; out: (q+1)*b cells; x2 for double buffering
        cells = (q * (b + 2) + b + (q + 1) * b) * ny * nz
        return cells * itemsize * 2 <= budget

    if two_d:
        if not fits(nx):
            raise FusedChainError(
                f"lbm_backend = PALLAS: the 2-D grid {nx}x{ny} exceeds the "
                f"single-block VMEM budget (use the default JNP backend)"
            )
        return nx

    forced = os.environ.get("MARLIN_TPU_LBM_BLOCK")
    if forced:
        b = int(forced)
        if nx % b:
            raise ValueError(f"MARLIN_TPU_LBM_BLOCK={b} does not divide nx={nx}")
        if not fits(b):
            # a forced oversized block would otherwise surface as a raw
            # Mosaic VMEM compile failure instead of the named error
            raise FusedChainError(
                f"MARLIN_TPU_LBM_BLOCK={b} exceeds the "
                f"MARLIN_TPU_LBM_VMEM_MB={budget // 2 ** 20} budget at "
                f"transverse extents {ny}x{nz}"
            )
        return b
    for b in (4, 2, 1):
        if nx % b:
            continue
        if fits(b):
            return b
    raise FusedChainError(
        f"lbm_backend = PALLAS: transverse extents {ny}x{nz} exceed the "
        f"VMEM budget even at x-block 1 (use the default JNP backend)"
    )


def fused_substep(fpc_qm, media, cfg: FusedLBMConfig, ext=None, gpc_qm=None):
    """One lattice update.  fpc_qm: (q, nx, ny, nz) post-collision
    distribution from the previous substep; media: (nx, ny, nz) binary
    media cast to the field dtype, or None; gpc_qm: the second
    (thermal) lattice's carried distribution on two-lattice decks.
    `ext` (sharded mode): dict with the ppermute'd neighbor halos — 'x'
    (fpc_left, fpc_right), 'gx' (lattice-2 planes), 'mx' (media x
    planes), 'offs' (1,2) [xoff, yoff] SMEM scalars, and on 2-D meshes
    'y'/'gy'/'my': (lo_rows, lo_cl, lo_cr, hi_rows, hi_cl, hi_cr) y-halo
    row arrays with their x corner planes.  Returns (fpc_new_qm,
    speed_new) or (fpc_new_qm, gpc_new_qm, speed_new).  Residual/history
    semantics live in the caller: only the trailing jnp substep's
    residual survives, so none is computed here."""
    q, nx, ny, nz, B = cfg.q, cfg.nx, cfg.ny, cfg.nz, cfg.block
    dt = fpc_qm.dtype
    grid = (nx // B,)

    # trailing spatial dims: (ny,) for 2-D blocks, (ny, nz) for 3-D
    tail = (ny,) if cfg.two_d else (ny, nz)
    zeros = (0,) * len(tail)

    def bs(lead, index_map, tl=tail):
        return pl.BlockSpec(lead + tl, index_map, memory_space=pltpu.VMEM)

    blk = bs((q, B), lambda i: (0, i) + zeros)
    # FIXED index: the wrap plane is only read by block 0; the constant
    # index map lets the pipeline elide its DMA on every later block (the
    # left halo for blocks > 0 comes from the VMEM carry scratch instead)
    halo_l = bs((q, 1), lambda i: (0, nx - 1) + zeros)
    halo_r = bs((q, 1), lambda i: (0, ((i + 1) * B) % nx) + zeros)
    sp_blk = bs((B,), lambda i: (i,) + zeros)
    m_halo_l = bs((1,), lambda i: ((i * B - 1) % nx,) + zeros)
    m_halo_r = bs((1,), lambda i: (((i + 1) * B) % nx,) + zeros)

    plane = bs((q, 1), lambda i: (0, 0) + zeros)
    m_plane = bs((1,), lambda i: (0,) + zeros)

    # y-halo row arrays (q, nx, 1, nz) reuse the center/left/right blocking
    # pattern along x, with (1, nz) tails, plus fixed corner planes
    ytail = (1, nz)
    y_blk = bs((q, B), lambda i: (0, i, 0, 0), tl=ytail)
    y_l = bs((q, 1), lambda i: (0, (i * B - 1) % nx, 0, 0), tl=ytail)
    y_r = bs((q, 1), lambda i: (0, ((i + 1) * B) % nx, 0, 0), tl=ytail)
    y_corner = bs((q, 1), lambda i: (0, 0, 0, 0), tl=ytail)
    my_blk = bs((B,), lambda i: (i, 0, 0), tl=ytail)
    my_l = bs((1,), lambda i: ((i * B - 1) % nx, 0, 0), tl=ytail)
    my_r = bs((1,), lambda i: (((i + 1) * B) % nx, 0, 0), tl=ytail)
    my_corner = bs((1,), lambda i: (0, 0, 0), tl=ytail)

    def y_group(arrs, c, l, r, corner):
        lo, lo_cl, lo_cr, hi, hi_cl, hi_cr = arrs
        return (
            [c, l, r, corner, corner, c, l, r, corner, corner],
            [lo, lo, lo, lo_cl, lo_cr, hi, hi, hi, hi_cl, hi_cr],
        )

    # 2-D single-block mode (see _make_kernel): no wrap/right halo refs —
    # their (q, 1, ny) blocks would violate Mosaic tiling; the sharded
    # exchange planes are whole small arrays and stay
    single = cfg.two_d

    def lattice_group(arr, xkey, ykey):
        specs = [blk] if single else [blk, halo_l, halo_r]
        vals = [arr] if single else [arr, arr, arr]
        if cfg.sharded:
            specs += [plane, plane]
            vals += list(ext[xkey])
        if cfg.shard_y:
            s, a = y_group(ext[ykey], y_blk, y_l, y_r, y_corner)
            specs += s
            vals += a
        return specs, vals

    in_specs, args = lattice_group(fpc_qm, "x", "y")
    if cfg.two_lattice:
        s, a = lattice_group(gpc_qm, "gx", "gy")
        in_specs += s
        args += a
    if cfg.has_media:
        if single:
            in_specs += [sp_blk]
            args += [media]
        else:
            in_specs += [sp_blk, m_halo_l, m_halo_r]
            args += [media, media, media]
        if cfg.sharded:
            in_specs += [m_plane, m_plane]
            args += list(ext["mx"])
        if cfg.shard_y:
            s, a = y_group(ext["my"], my_blk, my_l, my_r, my_corner)
            in_specs += s
            args += a
    if cfg.sharded:
        in_specs.append(
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(ext["offs"])

    import os

    # raise the scoped-VMEM limit from the 16 MB default; v5e has 128 MB
    # and the B=4 pipeline needs ~24 MB at 128-extent grids
    vmem_mb = int(os.environ.get("MARLIN_TPU_LBM_VMEM_MB", "64"))
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2 ** 20)
        if not _interpret() else None
    )
    out_shape = [jax.ShapeDtypeStruct((q, nx) + tail, dt)]
    out_specs = [blk]
    if cfg.two_lattice:
        out_shape.append(jax.ShapeDtypeStruct((q, nx) + tail, dt))
        out_specs.append(blk)
    out_shape.append(jax.ShapeDtypeStruct((nx,) + tail, dt))
    out_specs.append(sp_blk)
    scratch = []
    if not single:
        scratch.append(pltpu.VMEM((q, 1) + tail, dt))
        if cfg.two_lattice:
            scratch.append(pltpu.VMEM((q, 1) + tail, dt))
    return pl.pallas_call(
        _make_kernel(cfg),
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=_interpret(),
    )(*args)


def _ring(axis_size):
    to_right = [(s, (s + 1) % axis_size) for s in range(axis_size)]
    to_left = [(s, (s - 1) % axis_size) for s in range(axis_size)]
    return to_right, to_left


def _exchange_xy(arr, x_axis, cfg, x_ring, y_ring, x_dim, y_dim):
    """Neighbor exchange for one field: x boundary planes over the p1 ring
    and (2-D meshes) y boundary row arrays over the p2 ring, including the
    x corners of those rows (halo-of-halo, so diagonal pulls are exact)."""
    tr_x, tl_x = x_ring
    lo_x = jax.lax.ppermute(
        jax.lax.slice_in_dim(arr, arr.shape[x_dim] - 1, arr.shape[x_dim],
                             axis=x_dim), x_axis[0], tr_x)
    hi_x = jax.lax.ppermute(
        jax.lax.slice_in_dim(arr, 0, 1, axis=x_dim), x_axis[0], tl_x)
    out = {"x": (lo_x, hi_x)}
    if cfg.shard_y:
        tr_y, tl_y = y_ring
        ysl = lambda a, j0, j1: jax.lax.slice_in_dim(a, j0, j1, axis=y_dim)
        ny = arr.shape[y_dim]
        lo = jax.lax.ppermute(ysl(arr, ny - 1, ny), x_axis[1], tr_y)
        hi = jax.lax.ppermute(ysl(arr, 0, 1), x_axis[1], tl_y)
        # corners: the y rows of the already-exchanged x planes
        lo_cl = jax.lax.ppermute(ysl(lo_x, ny - 1, ny), x_axis[1], tr_y)
        lo_cr = jax.lax.ppermute(ysl(hi_x, ny - 1, ny), x_axis[1], tr_y)
        hi_cl = jax.lax.ppermute(ysl(lo_x, 0, 1), x_axis[1], tl_y)
        hi_cr = jax.lax.ppermute(ysl(hi_x, 0, 1), x_axis[1], tl_y)
        out["y"] = (lo, lo_cl, lo_cr, hi, hi_cl, hi_cr)
    return out


def exchange_media_halo(media, cfg: FusedLBMConfig, axis_names, axis_sizes):
    """One-time neighbor exchange of the (loop-invariant) media boundary
    planes/rows — hoisted out of the substep loop by the caller."""
    if not cfg.has_media:
        return None
    x_ring = _ring(axis_sizes[0])
    y_ring = _ring(axis_sizes[1]) if cfg.shard_y else None
    return _exchange_xy(media, axis_names, cfg, x_ring, y_ring, 0, 1)


def fused_substep_sharded(fpc_qm, media, media_ext, cfg: FusedLBMConfig,
                          axis_names, axis_sizes, gpc_qm=None):
    """One lattice update on a sharded distribution (inside shard_map over
    a 1-D x mesh or a 2-D x×y mesh): exchange the fpc boundary planes with
    each neighbor over ICI (lax.ppermute) — plus y-halo rows and their x
    corners on 2-D meshes, plus the second lattice's planes on thermal
    decks — and run the local fused kernel with the received data
    substituted at the shard boundaries.
    `media_ext`: the hoisted exchange_media_halo result."""
    x_ring = _ring(axis_sizes[0])
    y_ring = _ring(axis_sizes[1]) if cfg.shard_y else None
    f_ext = _exchange_xy(fpc_qm, axis_names, cfg, x_ring, y_ring, 1, 2)
    xoff = jax.lax.axis_index(axis_names[0]) * cfg.nx
    yoff = (jax.lax.axis_index(axis_names[1]) * cfg.ny if cfg.shard_y
            else jnp.zeros((), jnp.int32))
    ext = {
        "x": f_ext["x"],
        "offs": jnp.stack(
            [xoff.astype(jnp.int32), yoff.astype(jnp.int32)]).reshape(1, 2),
    }
    if cfg.shard_y:
        ext["y"] = f_ext["y"]
    if cfg.two_lattice:
        g_ext = _exchange_xy(gpc_qm, axis_names, cfg, x_ring, y_ring, 1, 2)
        ext["gx"] = g_ext["x"]
        if cfg.shard_y:
            ext["gy"] = g_ext["y"]
    if cfg.has_media:
        ext["mx"] = media_ext["x"]
        if cfg.shard_y:
            ext["my"] = media_ext["y"]
    return fused_substep(fpc_qm, media, cfg, ext=ext, gpc_qm=gpc_qm)


# ---------------------------------------------------------------------------
# deck-chain pattern matching
# ---------------------------------------------------------------------------

_FACE_AXIS_SIDE = {
    "left": (0, 0), "right": (0, 1),
    "bottom": (1, 0), "top": (1, 1),
    "front": (2, 0), "back": (2, 1),
}


def _reject(msg):
    raise FusedChainError(f"lbm_backend = PALLAS: {msg} (use the default JNP backend)")


def _zouhe_spec(st, axis, side, value, first_order) -> PostBC:
    """Compile one Zou-He fixed-order face to the uniform PostBC affine form
    (see PostBC).  Reproduces reference LBMFixedFirstOrderBC.C /
    LBMFixedZerothOrderBC.C exactly: the D2Q9 branch's transverse
    correction rows AND the generic branch's negative-index neutral-set
    quirk (`f[..., -neutral_x]`) both fall out of the same coefficients."""
    q = int(st.q)
    if axis == 0:
        low_set = st.left
        e_t = st.ey
        neutral = st.neutral_x if q == 9 else (-st.neutral_x) % q
    else:
        low_set = st.bottom
        e_t = st.ex
        neutral = st.neutral_y
    high_set = st.op[low_set]
    unknown = low_set if side == 0 else high_set
    sum2 = high_set if side == 0 else low_set
    sgn = 1.0 if side == 0 else -1.0
    if first_order:
        a, b = value / (1.0 - sgn * value), 0.0
    else:
        a, b = -sgn, sgn * value
    if q == 9:
        # tangential pair: the +/- transverse axis-aligned directions
        e_n = st.ex if axis == 0 else st.ey
        tp = int(np.where((e_n == 0) & (e_t == 1) & (st.ez == 0))[0][0])
        tm = int(st.op[tp])
    else:
        tp = tm = 0
    rows = []
    for d in unknown:
        d = int(d)
        cm = sgn * 2.0 * float(st.weights[d]) / CS2
        tc = -0.5 * float(e_t[d]) if q == 9 else 0.0
        rows.append((d, int(st.op[d]), cm, tc, tp, tm))
    return PostBC(
        kind="zh", axis=axis, side=side, a=float(a), b=float(b),
        sum1=tuple(int(i) for i in neutral),
        sum2=tuple(int(i) for i in sum2),
        rows=tuple(rows),
    )


def match_chain(problem) -> FusedLBMPlan:
    """Validate the deck's LBM chain against the fused pattern and build the
    kernel plan.  Raises FusedChainError naming the unsupported feature."""
    from .computes import lbm as L
    from .computes import lbm_bc as LB
    from .solvers.lbm_stream import LBMStream

    dom = problem.domain
    if dom.dim not in (2, 3):
        _reject("only 2-D/3-D decks are supported")
    two_d = dom.dim == 2
    if np.dtype(dom.dtype).itemsize == 8 and jax.default_backend() == "tpu":
        # mirror the fft PALLAS backend's guard: Mosaic has no f64 vectors
        # (CPU runs stay allowed — they auto-interpret for parity testing)
        _reject("float64 buffers cannot run on the TPU Mosaic compiler; "
                "use floating_precision = SINGLE")
    mode_name = getattr(dom.parallel_mode, "name", str(dom.parallel_mode))
    sharded = False
    p1 = p2 = 1
    if mode_name == "REAL_SPACE":
        mesh = dom.mesh
        if mesh is None or len(mesh.axis_names) not in (1, 2):
            _reject("REAL_SPACE requires a 1-D (x) or 2-D (x×y) mesh")
        sharded = True
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        p1 = int(sizes.get("p1", 1))
        p2 = int(sizes.get("p2", 1))
        if dom.shape[0] % p1:
            _reject(
                f"nx = {dom.shape[0]} must divide evenly over the "
                f"{p1}-device mesh axis"
            )
        if p2 > 1:
            if two_d:
                # y is the lane axis of 2-D blocks — shard x only
                _reject("2-D decks support 1-D (x-sharded) meshes only")
            if dom.shape[1] % p2:
                _reject(
                    f"ny = {dom.shape[1]} must divide evenly over the "
                    f"{p2}-device mesh axis"
                )
    elif mode_name != "NONE":
        _reject("only serial or REAL_SPACE (1-D/2-D mesh) domains are supported")
    has_media = problem.lbm_solid_mask() is not None

    solver = problem.solver
    if not isinstance(solver, LBMStream):
        _reject("the solver must be LBMStream")
    if len(solver.buffers_) not in (1, 2):
        _reject("at most two streamed buffers are supported")
    two_lattice = len(solver.buffers_) == 2
    f_name, fpc_name = solver.buffers_[0], solver.f_old[0]
    g_name = solver.buffers_[1] if two_lattice else None
    gpc_name = solver.f_old[1] if two_lattice else None
    pc_of = {f_name: fpc_name}
    if two_lattice:
        if g_name in pc_of:
            _reject("the two streamed buffers must be distinct")
        pc_of[g_name] = gpc_name

    st = problem.lbm_stencil()
    faces_by = {name: [] for name in pc_of}
    post_by = {name: [] for name in pc_of}
    for bc in problem.bc_computes:
        lat = bc.out
        if lat not in pc_of:
            _reject(f"boundary compute '{bc.name}' writes '{lat}', which is "
                    f"not a streamed buffer")
        if isinstance(bc, (LB.LBMFixedFirstOrderBC, LB.LBMFixedZerothOrderBC)):
            # Zou-He fixed-order faces (reference LBMFixedFirstOrderBC.C /
            # LBMFixedZerothOrderBC.C) — compiled to PostBC update plans
            if bc.f != lat:
                _reject(
                    f"fixed-order BC '{bc.name}' must read and write the "
                    f"same streamed buffer"
                )
            first = isinstance(bc, LB.LBMFixedFirstOrderBC)
            if bc.boundary not in ("left", "right", "bottom", "top"):
                _reject(
                    f"fixed-order BC boundary '{bc.boundary}' is not fusable"
                )
            axis, side = _FACE_AXIS_SIDE[bc.boundary]
            if axis == 1 and int(st.q) != 9:
                # parity: the jnp chain raises for q != 9 on these faces
                _reject("bottom/top fixed-order BCs exist for D2Q9 only")
            spec = _zouhe_spec(st, axis, side, float(bc.value), first)
            if first and bc.perturb and int(st.q) == 9 \
                    and bc.boundary == "left":
                # the sine inlet profile (reference _ux_profile) exists
                # only in the D2Q9 left-face branch; everywhere else the
                # jnp chain silently ignores perturb — parity kept
                spec = PostBC(**{**spec.__dict__,
                                 "perturb_value": float(bc.value)})
            post_by[lat].append(spec)
            continue
        if isinstance(bc, LB.LBMMicroscopicZeroGradientBC):
            if bc.boundary not in _FACE_AXIS_SIDE:
                _reject(
                    f"zero-gradient boundary '{bc.boundary}' is not a domain "
                    f"face"
                )
            if two_d and bc.boundary in ("front", "back"):
                _reject("front/back faces do not exist in 2-D")
            axis, side = _FACE_AXIS_SIDE[bc.boundary]
            post_by[lat].append(PostBC(kind="zg", axis=axis, side=side))
            continue
        if not isinstance(bc, LB.LBMBounceBack):
            _reject(f"boundary compute '{bc.name}' ({type(bc).__name__}) "
                    f"is not fusable")
        if post_by[lat]:
            # bounce-back runs inside the streaming stage; a deck listing
            # it AFTER a Zou-He/zero-gradient face on the SAME lattice
            # would reorder the face writes
            _reject(
                f"bounce-back '{bc.name}' listed after a Zou-He/zero-"
                f"gradient BC is not fusable"
            )
        if bc.f_old != pc_of[lat]:
            _reject(f"bounce-back '{bc.name}' must act on the streamed pair")
        if bc.boundary == "wall":
            if not has_media:
                _reject("wall bounce-back requires binary media")
            faces_by[lat].append((-1, 0, ()))  # keep the deck's BC ordering
            continue
        if bc.boundary not in _FACE_AXIS_SIDE:
            _reject(f"bounce-back boundary '{bc.boundary}' is not a domain face")
        if two_d and bc.boundary in ("front", "back"):
            _reject("front/back faces do not exist in 2-D")
        if (bc.xsel, bc.ysel, bc.zsel) != (slice(None),) * 3:
            _reject("exclude_corners_* options are not supported")
        axis, side = _FACE_AXIS_SIDE[bc.boundary]
        incoming = {"left": st.left, "bottom": st.bottom,
                    "front": getattr(st, "front", None)}
        if side == 0:
            dirs = incoming[bc.boundary]
        else:
            low = {"right": "left", "top": "bottom", "back": "front"}[bc.boundary]
            dirs = st.op[incoming[low]]
        faces_by[lat].append((axis, side, tuple(int(d) for d in dirs)))
    faces = faces_by[f_name]
    post_bcs = post_by[f_name]
    faces2 = faces_by[g_name] if two_lattice else []
    post_bcs2 = post_by[g_name] if two_lattice else []

    # classify the Solve chain (two passes: collect by type, then wire by
    # the buffer dataflow — deck order places moments before equilibria,
    # but classification should not depend on it)
    by_type = {"density": [], "velocity": [], "equilibrium": [],
               "collision": [], "speed": [], "residual": [],
               "forces": [], "apply": []}
    for c in problem.solve_computes:
        if isinstance(c, L.LBMComputeDensity):
            by_type["density"].append(c)
        elif isinstance(c, L.LBMComputeVelocity):
            by_type["velocity"].append(c)
        elif isinstance(c, L.LBMEquilibrium):
            by_type["equilibrium"].append(c)
        elif type(c) in (L.LBMBGKCollision, L.LBMMRTCollision,
                         L.LBMSmagorinskyCollision):
            by_type["collision"].append(c)
        elif isinstance(c, L.LBMComputeVelocityMagnitude):
            by_type["speed"].append(c)
        elif isinstance(c, L.LBMComputeResidual):
            by_type["residual"].append(c)
        elif isinstance(c, L.LBMComputeForces):
            by_type["forces"].append(c)
        elif isinstance(c, L.LBMApplyForces):
            by_type["apply"].append(c)
        else:
            _reject(f"solve compute '{c.name}' ({type(c).__name__}) is not fusable")
    for key in by_type:
        limit = 2 if key in ("density", "equilibrium", "collision") else 1
        if len(by_type[key]) > limit:
            _reject(f"more than {limit} {key} compute(s) in the chain")

    def pick(key, pred):
        for c in by_type[key]:
            if pred(c):
                return c
        return None

    density = pick("density", lambda c: c.f == f_name)
    t_density = pick("density", lambda c: c.f == g_name) if two_lattice else None
    velocity = by_type["velocity"][0] if by_type["velocity"] else None
    speed = by_type["speed"][0] if by_type["speed"] else None
    residual = by_type["residual"][0] if by_type["residual"] else None
    forces = by_type["forces"][0] if by_type["forces"] else None
    apply_f = by_type["apply"][0] if by_type["apply"] else None

    for what, c in (("LBMComputeDensity", density),
                    ("LBMComputeVelocity", velocity)):
        if c is None:
            _reject(f"the chain requires a {what} compute")
    if two_lattice and t_density is None:
        _reject("two-lattice chains require a density (zeroth-moment) "
                "compute on the second streamed buffer")

    equilibrium = pick("equilibrium", lambda c: c.rho == density.out)
    collision = pick("collision", lambda c: c.f == f_name)
    equilibrium2 = collision2 = None
    if two_lattice:
        equilibrium2 = pick("equilibrium", lambda c: c.rho == t_density.out)
        collision2 = pick("collision", lambda c: c.f == g_name)

    if density.f != f_name:
        _reject("density must be computed from the streamed distribution")
    if velocity.f != f_name or velocity.rho != density.out:
        _reject("velocity must be computed from the streamed distribution/density")

    # force-field coupling (reference LBMComputeForces.C + LBMApplyForces.C:
    # the thermal decks' buoyancy chain)
    force_spec = None
    if velocity.enable_forces:
        if forces is None:
            _reject("enable_forces requires a LBMComputeForces compute in "
                    "the chain")
        if velocity.forces != forces.out:
            _reject("the velocity's force field must be the "
                    "LBMComputeForces output")
    if forces is not None:
        if not velocity.enable_forces:
            _reject("a LBMComputeForces compute requires "
                    "enable_forces = true on the velocity")
        if forces.enable_buoyancy:
            if not two_lattice:
                _reject("buoyancy forces need the thermal (second) lattice")
            if forces.temperature != t_density.out:
                _reject("the buoyancy temperature must be the second "
                        "lattice's zeroth moment")
        if forces.enable_gravity and forces.rho != density.out:
            _reject("the gravity force must consume the chain's density")
        d = int(forces.gravity_direction)
        if d >= dom.dim:
            _reject(f"gravity_direction {d} does not exist in {dom.dim}-D")
        apply_tau = 0.0
        if apply_f is not None:
            if apply_f.out != fpc_name:
                _reject("LBMApplyForces must write the fluid post-collision "
                        "buffer")
            if apply_f.rho != density.out or apply_f.forces != forces.out:
                _reject("LBMApplyForces must consume the chain's density "
                        "and force field")
            apply_tau = float(apply_f.tau)
        force_spec = ForceSpec(
            gravity=bool(forces.enable_gravity),
            buoyancy=bool(forces.enable_buoyancy),
            g=float(forces.g), rho0=float(forces.rho0),
            T0=float(forces.T0), direction=d, apply_tau=apply_tau,
        )
    elif apply_f is not None:
        _reject("LBMApplyForces requires a LBMComputeForces compute")

    if collision is None:
        # collisionless chain (reference mixed_bcs_* decks): LBMStream with
        # f_old = f — the carried state is the post-BC streamed distribution
        if two_lattice:
            _reject("two-lattice chains require a collision per lattice")
        if equilibrium is not None:
            _reject("an equilibrium compute without a collision would go "
                    "stale across fused substeps")
        if fpc_name != f_name:
            _reject("collisionless chains require f_old = the streamed "
                    "buffer itself")
    else:
        if equilibrium is None:
            _reject("the chain requires a LBMEquilibrium compute")
        if equilibrium.rho != density.out or equilibrium.velocity != velocity.out:
            _reject("equilibrium must consume the chain's density and velocity")
        if collision.f != f_name or collision.feq != equilibrium.out:
            _reject("collision must consume the streamed distribution and equilibrium")
        if collision.out != fpc_name:
            _reject("collision must write the solver's f_old buffer")
    smag = None
    if collision is not None and type(collision) is L.LBMSmagorinskyCollision:
        # the per-cell τ needs the GLOBAL mean density inside the substep
        # — only the 2-D single-block serial kernel has the whole grid in
        # VMEM to reduce over
        if not two_d:
            _reject("Smagorinsky collisions fuse on 2-D decks only (the "
                    "global mean density needs the single-block kernel)")
        if sharded:
            _reject("Smagorinsky collisions do not fuse on sharded "
                    "domains (the mean density is a cross-shard reduction)")
        smag = (float(collision.C_s), float(collision.tau_0))
    if two_lattice:
        if equilibrium2 is None or collision2 is None:
            _reject("the second lattice requires its own equilibrium and "
                    "collision computes")
        if type(collision2) is L.LBMSmagorinskyCollision:
            _reject("Smagorinsky collisions fuse on the fluid lattice only")
        if equilibrium2.velocity != velocity.out:
            _reject("the thermal equilibrium must advect at the fluid "
                    "velocity")
        if collision2.f != g_name or collision2.feq != equilibrium2.out:
            _reject("the thermal collision must consume the second "
                    "lattice's distribution and equilibrium")
        if collision2.out != gpc_name:
            _reject("the thermal collision must write the solver's second "
                    "f_old buffer")

    if speed is not None and speed.velocity != velocity.out:
        _reject("velocity magnitude must consume the chain's velocity")
    # the carried scalar: the residual field (velocity magnitude, or on
    # thermal decks the second lattice's zeroth moment)
    speed_kind = "none"
    speed_buffer = None
    if residual is not None:
        if speed is not None and residual.speed == speed.out:
            speed_kind, speed_buffer = "umag", speed.out
        elif two_lattice and residual.speed == t_density.out:
            speed_kind, speed_buffer = "t", t_density.out
        else:
            _reject("the residual must consume the chain's velocity "
                    "magnitude or the thermal lattice's zeroth moment")
    elif speed is not None:
        speed_kind, speed_buffer = "umag", speed.out

    def msm_of(coll):
        if type(coll) is not L.LBMMRTCollision:
            return None
        # MSM = M⁻¹·S'·M with the kinematic-viscosity diagonal at 1/τ₀
        # (reference LBMMRTCollision / computeLocalRelaxationMatrix)
        S = st.S.copy()
        S[st.id_kinematic_visc, st.id_kinematic_visc] = 1.0 / float(coll.tau_0)
        m = st.M_inv @ S @ st.M
        m[np.abs(m) < 1e-14] = 0.0
        return tuple(tuple(float(x) for x in row) for row in m)

    msm = msm_of(collision)
    msm2 = msm_of(collision2) if two_lattice else None

    bf = velocity.body_force if velocity.add_body_force else [0.0, 0.0, 0.0]
    nx, ny, nz = (list(dom.shape) + [1, 1])[:3]
    nx_local = int(nx) // p1
    ny_local = int(ny) // p2
    dtype = np.dtype(dom.dtype)
    q_eff = int(st.q) * (2 if two_lattice else 1)
    block = _pick_block(nx_local, ny_local, int(nz), q_eff, dtype.itemsize,
                        two_d=two_d)
    for bc in list(post_bcs) + list(post_bcs2):
        if bc.kind == "zg" and bc.axis == 0 and block < 2:
            # the x-face inner-neighbor read is an in-block roll; a 1-plane
            # block has no inner neighbor in VMEM
            _reject("x-face zero-gradient BCs need an x-block >= 2 "
                    "(transverse extents too large for the VMEM budget)")
    cfg = FusedLBMConfig(
        q=int(st.q),
        e=tuple((int(st.ex[i]), int(st.ey[i]), int(st.ez[i])) for i in range(st.q)),
        w=tuple(float(w) for w in st.weights),
        op=tuple(int(o) for o in st.op),
        nx=nx_local, ny=ny_local, nz=int(nz),
        block=block,
        tau=float(collision.tau_0) if collision is not None else 1.0,
        body_force=(float(bf[0]), float(bf[1]), float(bf[2])),
        faces=tuple(faces),
        has_media=has_media,
        sharded=sharded,
        nx_global=int(nx),
        shard_y=p2 > 1,
        ny_global=int(ny),
        two_d=two_d,
        msm=msm,
        post_bcs=tuple(post_bcs),
        collide=collision is not None,
        need_moments=(collision is not None or speed_kind != "none"
                      or two_lattice),
        two_lattice=two_lattice,
        tau2=float(collision2.tau_0) if collision2 is not None else 1.0,
        msm2=msm2,
        faces2=tuple(faces2),
        post_bcs2=tuple(post_bcs2),
        force=force_spec,
        speed_kind=speed_kind,
        proj=bool(collision is not None and collision.projection),
        proj2=bool(collision2 is not None and collision2.projection),
        smag=smag,
    )
    old_keys = set()
    for c in [solver] + list(problem.bc_computes) + list(problem.solve_computes):
        old_keys |= set(getattr(c, "history_requests", dict)())
    allowed = {fpc_name, gpc_name, speed_buffer} - {None}
    if not old_keys <= allowed:
        _reject(f"unsupported old-state history on {sorted(old_keys)}")
    return FusedLBMPlan(
        config=cfg,
        fpc=fpc_name,
        speed=speed_buffer,
        media=problem.lbm_binary_media if has_media else None,
        fpc2=gpc_name,
    )
