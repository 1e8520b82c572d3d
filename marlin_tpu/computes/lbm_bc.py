"""Lattice Boltzmann boundary conditions.

Re-designs of reference src/tensor_computes/LBMBoundaryCondition.C,
LBMBounceBack.C, LBMFixedFirstOrderBC.C, LBMFixedZerothOrderBC.C,
LBMDirichletBC.C, LBMNeumannBC.C, LBMMicroscopicZeroGradientBC.C.

Face conventions (reference include/tensor_computes/LBMBoundaryCondition.h):
left x=0, right x=nx-1, bottom y=0, top y=ny-1, front z=0, back z=nz-1;
`wall` = binary-media obstacle cells; `regional` = region-id cells.

Faithfulness note: the generic (q != 9) fixed-order BCs replicate the
reference's negative-index selection `f[..., -neutral_x]` verbatim
(LBMFixedFirstOrderBC.C leftBoundary) — the gold files encode exactly this
behavior.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import Params
from ..registry import computes
from .base import ComputeError
from .lbm import CS2, LatticeBoltzmannOperator, _equilibrium

BOUNDARIES = ["top", "bottom", "left", "right", "front", "back", "wall", "regional"]


class LBMBoundaryCondition(LatticeBoltzmannOperator):
    is_boundary_condition = True

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.boundary = params.get_enum("boundary", BOUNDARIES, None)
        if self.boundary is None:
            params.error("boundary", "is required")

    def boundary_adjacent_mask(self):
        """Cells adjacent to solid cells, marked via stencil rolls
        (reference LBMBounceBack.C ctor binary-media block)."""
        media = self.problem.lbm_binary_media_np()
        if media is None:
            return None
        st = self.stencil
        marked = media.copy()
        for ic in range(1, st.q):
            shifted = np.roll(media, (st.ex[ic], st.ey[ic], st.ez[ic]), (0, 1, 2))
            adjacent = (shifted == 0) & (media >= 1)
            marked[adjacent] = -1
        return marked

    def apply(self, state, ctx):
        u = state[self.out]
        handler = getattr(self, self.boundary + "_boundary")
        u = handler(u, state, ctx)
        return {self.out: self.masked_fill_solids(u)}

    # default: unimplemented faces raise
    def _unimplemented(self, *_a, **_k):
        raise ComputeError(
            f"{type(self).__name__}: boundary '{self.boundary}' is not implemented."
        )

    top_boundary = _unimplemented
    bottom_boundary = _unimplemented
    left_boundary = _unimplemented
    right_boundary = _unimplemented
    front_boundary = _unimplemented
    back_boundary = _unimplemented
    wall_boundary = _unimplemented
    regional_boundary = _unimplemented


@computes.register("LBMBounceBack")
class LBMBounceBack(LBMBoundaryCondition):
    """Halfway bounce-back (reference LBMBounceBack.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.f_old = params.get_str("f_old", required=True)
        self.xsel = slice(1, -1) if params.get_bool("exclude_corners_x") else slice(None)
        self.ysel = slice(1, -1) if params.get_bool("exclude_corners_y") else slice(None)
        self.zsel = slice(1, -1) if params.get_bool("exclude_corners_z") else slice(None)
        self._wall_mask = None

    def history_requests(self):
        return {self.f_old: 1}

    def _fold(self, ctx):
        return ctx["old"][self.f_old][0]

    def _face(self, u, fold, axis, pos, unknown_dirs, incoming: bool, sels):
        st = self.stencil
        for d in unknown_dirs:
            o = int(st.op[d])
            idx = list(sels)
            idx.insert(axis, pos)
            if incoming:
                # low face: unknown dir d filled from opposite at same node
                u = u.at[tuple(idx + [int(d)])].set(fold[tuple(idx + [o])])
            else:
                # high face: opposite dirs filled from face set
                u = u.at[tuple(idx + [o])].set(fold[tuple(idx + [int(d)])])
        return u

    def left_boundary(self, u, state, ctx):
        return self._face(u, self._fold(ctx), 0, 0, self.stencil.left, True,
                          [self.ysel, self.zsel])

    def right_boundary(self, u, state, ctx):
        return self._face(u, self._fold(ctx), 0, -1, self.stencil.left, False,
                          [self.ysel, self.zsel])

    def bottom_boundary(self, u, state, ctx):
        return self._face(u, self._fold(ctx), 1, 0, self.stencil.bottom, True,
                          [self.xsel, self.zsel])

    def top_boundary(self, u, state, ctx):
        return self._face(u, self._fold(ctx), 1, -1, self.stencil.bottom, False,
                          [self.xsel, self.zsel])

    def front_boundary(self, u, state, ctx):
        return self._face(u, self._fold(ctx), 2, 0, self.stencil.front, True,
                          [self.xsel, self.ysel])

    def back_boundary(self, u, state, ctx):
        return self._face(u, self._fold(ctx), 2, -1, self.stencil.front, False,
                          [self.xsel, self.ysel])

    def wall_boundary(self, u, state, ctx):
        """Obstacle bounce-back (reference wallBoundary3D).  The reference
        captures its boundary mask once at the first substep as
        (adjacent-to-solid) & (u == 0); after the first stream u==0 exactly
        where the upstream cell along that direction is solid, so the
        equivalent static per-direction mask is precomputed here."""
        if self._wall_mask is None:
            media = self.problem.lbm_binary_media_np()
            if media is None:
                raise ComputeError("wall boundary requires binary media")
            st = self.stencil
            # pack the per-direction mask as ONE media-sized uint32
            # bitfield (bit ic set where direction ic bounces; q <= 27).
            # A (nx,ny,nz,q) bool would embed a q-times-larger constant
            # into every traced step — ~319 MB of HLO literal at 256³
            # D3Q19, the same constant-size failure ConstantReciprocal
            # avoids (remote compile rejects huge literals)
            bits = np.zeros(media.shape, dtype=np.uint32)
            fluid = media >= 1
            for ic in range(1, st.q):
                upstream_solid = (
                    np.roll(media, (st.ex[ic], st.ey[ic], st.ez[ic]), (0, 1, 2)) == 0
                )
                bits |= (upstream_solid & fluid).astype(np.uint32) << ic
            self._wall_mask = bits
        fold = self._fold(ctx)
        st = self.stencil
        f_bounce = jnp.concatenate(
            [
                jnp.zeros_like(fold[..., :1]),
                jnp.stack([fold[..., int(st.op[ic])] for ic in range(1, st.q)], -1),
            ],
            axis=-1,
        )
        bits = jnp.asarray(self._wall_mask)[..., None]
        mask = (bits >> jnp.arange(st.q, dtype=jnp.uint32)) & jnp.uint32(1)
        return jnp.where(mask != 0, f_bounce, u)


@computes.register("LBMFixedFirstOrderBC")
class LBMFixedFirstOrderBC(LBMBoundaryCondition):
    """Zou-He velocity boundary (reference LBMFixedFirstOrderBC.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.f = self.input_buffer("f")
        self.value = problem.get_constant(params.get_str("value", required=True))
        self.perturb = params.get_bool("perturb", False)

    def _ux_profile(self, ny, dtype):
        if not self.perturb:
            return jnp.full((ny, 1), self.value, dtype=dtype)
        deltaU = 1.0e-6 * self.value
        y = jnp.arange(ny, dtype=dtype)[:, None]
        return self.value + deltaU * jnp.sin(y / ny * 2.0 * jnp.pi)

    def left_boundary(self, u, state, ctx):
        st = self.stencil
        f = state[self.f]
        if st.q == 9:
            ux = self._ux_profile(f.shape[1], f.dtype)
            density = 1.0 / (1.0 - ux) * (
                f[0, :, :, 0] + f[0, :, :, 2] + f[0, :, :, 4]
                + 2.0 * (f[0, :, :, 3] + f[0, :, :, 6] + f[0, :, :, 7])
            )
            d0 = int(st.left[0])
            u = u.at[0, :, :, d0].set(
                f[0, :, :, int(st.op[d0])] + 2.0 / 3.0 * density * ux
            )
            for i in range(1, len(st.left)):
                d = int(st.left[i])
                u = u.at[0, :, :, d].set(
                    f[0, :, :, int(st.op[d])]
                    - 0.5 * st.ey[d] * (f[0, :, :, 2] - f[0, :, :, 4])
                    + 1.0 / 6.0 * density * ux
                )
            return u
        # generic path (reference leftBoundary else-branch, incl. the
        # negative-index neutral set selection)
        neg_neutral = (-st.neutral_x) % st.q
        density = 1.0 / (1.0 - self.value) * (
            jnp.sum(f[0][:, :, neg_neutral], -1)
            + 2.0 * jnp.sum(f[0][:, :, st.right], -1)
        )
        for i in range(len(st.left)):
            d = int(st.left[i])
            u = u.at[0, :, :, d].set(
                f[0, :, :, int(st.right[i])]
                + 2.0 * st.weights[d] / CS2 * self.value * density
            )
        return u

    def right_boundary(self, u, state, ctx):
        st = self.stencil
        f = state[self.f]
        if st.q == 9:
            density = 1.0 / (1.0 + self.value) * (
                f[-1, :, :, 0] + f[-1, :, :, 2] + f[-1, :, :, 4]
                + 2.0 * (f[-1, :, :, 1] + f[-1, :, :, 5] + f[-1, :, :, 8])
            )
            d0 = int(st.left[0])
            o0 = int(st.op[d0])
            u = u.at[-1, :, :, o0].set(
                f[-1, :, :, d0] - 2.0 / 3.0 * density * self.value
            )
            for i in range(1, len(st.left)):
                d = int(st.left[i])
                o = int(st.op[d])
                u = u.at[-1, :, :, o].set(
                    f[-1, :, :, d]
                    + 0.5 * st.ey[o] * (f[-1, :, :, 4] - f[-1, :, :, 2])
                    - 1.0 / 6.0 * density * self.value
                )
            return u
        neg_neutral = (-st.neutral_x) % st.q
        density = 1.0 / (1.0 + self.value) * (
            jnp.sum(f[-1][:, :, neg_neutral], -1)
            + 2.0 * jnp.sum(f[-1][:, :, st.left], -1)
        )
        for i in range(len(st.right)):
            d = int(st.right[i])
            u = u.at[-1, :, :, d].set(
                f[-1, :, :, int(st.left[i])]
                - 2.0 * st.weights[d] / CS2 * self.value * density
            )
        return u

    def bottom_boundary(self, u, state, ctx):
        st = self.stencil
        f = state[self.f]
        if st.q != 9:
            raise ComputeError("Bottom boundary only implemented for D2Q9.")
        density = 1.0 / (1.0 - self.value) * (
            f[:, 0, :, 0] + f[:, 0, :, 1] + f[:, 0, :, 3]
            + 2.0 * (f[:, 0, :, 4] + f[:, 0, :, 7] + f[:, 0, :, 8])
        )
        d0 = int(st.bottom[0])
        u = u.at[:, 0, :, d0].set(
            f[:, 0, :, int(st.op[d0])] + 2.0 / 3.0 * density * self.value
        )
        for i in range(1, len(st.bottom)):
            d = int(st.bottom[i])
            u = u.at[:, 0, :, d].set(
                f[:, 0, :, int(st.op[d])]
                - 0.5 * st.ex[d] * (f[:, 0, :, 1] - f[:, 0, :, 3])
                + 1.0 / 6.0 * density * self.value
            )
        return u

    def top_boundary(self, u, state, ctx):
        st = self.stencil
        f = state[self.f]
        if st.q != 9:
            raise ComputeError("Top boundary only implemented for D2Q9.")
        density = 1.0 / (1.0 + self.value) * (
            f[:, -1, :, 0] + f[:, -1, :, 1] + f[:, -1, :, 3]
            + 2.0 * (f[:, -1, :, 2] + f[:, -1, :, 5] + f[:, -1, :, 6])
        )
        d0 = int(st.bottom[0])
        o0 = int(st.op[d0])
        u = u.at[:, -1, :, o0].set(
            f[:, -1, :, d0] - 2.0 / 3.0 * density * self.value
        )
        for i in range(1, len(st.bottom)):
            d = int(st.bottom[i])
            o = int(st.op[d])
            u = u.at[:, -1, :, o].set(
                f[:, -1, :, d]
                + 0.5 * st.ex[o] * (f[:, -1, :, 3] - f[:, -1, :, 1])
                - 1.0 / 6.0 * density * self.value
            )
        return u


@computes.register("LBMFixedZerothOrderBC")
class LBMFixedZerothOrderBC(LBMBoundaryCondition):
    """Zou-He density boundary (reference LBMFixedZerothOrderBC.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.f = self.input_buffer("f")
        self.value = problem.get_constant(params.get_str("value", required=True))

    def left_boundary(self, u, state, ctx):
        st = self.stencil
        f = state[self.f]
        if st.q == 9:
            velocity = 1.0 - (
                f[0, :, :, 0] + f[0, :, :, 2] + f[0, :, :, 4]
                + 2.0 * (f[0, :, :, 3] + f[0, :, :, 6] + f[0, :, :, 7])
            ) / self.value
            d0 = int(st.left[0])
            u = u.at[0, :, :, d0].set(
                f[0, :, :, int(st.op[d0])] + 2.0 / 3.0 * self.value * velocity
            )
            for i in range(1, len(st.left)):
                d = int(st.left[i])
                u = u.at[0, :, :, d].set(
                    f[0, :, :, int(st.op[d])]
                    - 0.5 * st.ey[d] * (f[0, :, :, 2] - f[0, :, :, 4])
                    + 1.0 / 6.0 * self.value * velocity
                )
            return u
        neg_neutral = (-st.neutral_x) % st.q
        velocity = 1.0 - (
            jnp.sum(f[0][:, :, neg_neutral], -1)
            + 2.0 * jnp.sum(f[0][:, :, st.right], -1)
        ) / self.value
        for i in range(len(st.left)):
            d = int(st.left[i])
            u = u.at[0, :, :, d].set(
                f[0, :, :, int(st.right[i])]
                + 2.0 * st.weights[d] / CS2 * self.value * velocity
            )
        return u

    def right_boundary(self, u, state, ctx):
        st = self.stencil
        f = state[self.f]
        if st.q == 9:
            velocity = (
                f[-1, :, :, 0] + f[-1, :, :, 2] + f[-1, :, :, 4]
                + 2.0 * (f[-1, :, :, 1] + f[-1, :, :, 5] + f[-1, :, :, 8])
            ) / self.value - 1.0
            d0 = int(st.left[0])
            o0 = int(st.op[d0])
            u = u.at[-1, :, :, o0].set(
                f[-1, :, :, d0] - 2.0 / 3.0 * self.value * velocity
            )
            for i in range(1, len(st.left)):
                d = int(st.left[i])
                o = int(st.op[d])
                u = u.at[-1, :, :, o].set(
                    f[-1, :, :, d]
                    + 0.5 * st.ey[o] * (f[-1, :, :, 4] - f[-1, :, :, 2])
                    - 1.0 / 6.0 * self.value * velocity
                )
            return u
        neg_neutral = (-st.neutral_x) % st.q
        velocity = (
            jnp.sum(f[-1][:, :, neg_neutral], -1)
            + 2.0 * jnp.sum(f[-1][:, :, st.left], -1)
        ) / self.value - 1.0
        for i in range(len(st.right)):
            d = int(st.right[i])
            u = u.at[-1, :, :, d].set(
                f[-1, :, :, int(st.left[i])]
                - 2.0 * st.weights[d] / CS2 * self.value * velocity
            )
        return u

    def bottom_boundary(self, u, state, ctx):
        st = self.stencil
        f = state[self.f]
        if st.q != 9:
            raise ComputeError("Bottom boundary only implemented for D2Q9.")
        velocity = 1.0 - (
            f[:, 0, :, 0] + f[:, 0, :, 1] + f[:, 0, :, 3]
            + 2.0 * (f[:, 0, :, 4] + f[:, 0, :, 7] + f[:, 0, :, 8])
        ) / self.value
        d0 = int(st.bottom[0])
        u = u.at[:, 0, :, d0].set(
            f[:, 0, :, int(st.op[d0])] + 2.0 / 3.0 * self.value * velocity
        )
        for i in range(1, len(st.bottom)):
            d = int(st.bottom[i])
            u = u.at[:, 0, :, d].set(
                f[:, 0, :, int(st.op[d])]
                - 0.5 * st.ex[d] * (f[:, 0, :, 1] - f[:, 0, :, 3])
                + 1.0 / 6.0 * self.value * velocity
            )
        return u

    def top_boundary(self, u, state, ctx):
        st = self.stencil
        f = state[self.f]
        if st.q != 9:
            raise ComputeError("Top boundary only implemented for D2Q9.")
        velocity = (
            f[:, -1, :, 0] + f[:, -1, :, 1] + f[:, -1, :, 3]
            + 2.0 * (f[:, -1, :, 2] + f[:, -1, :, 5] + f[:, -1, :, 6])
        ) / self.value - 1.0
        d0 = int(st.bottom[0])
        o0 = int(st.op[d0])
        u = u.at[:, -1, :, o0].set(
            f[:, -1, :, d0] - 2.0 / 3.0 * self.value * velocity
        )
        for i in range(1, len(st.bottom)):
            d = int(st.bottom[i])
            o = int(st.op[d])
            u = u.at[:, -1, :, o].set(
                f[:, -1, :, d]
                + 0.5 * st.ex[o] * (f[:, -1, :, 3] - f[:, -1, :, 1])
                - 1.0 / 6.0 * self.value * velocity
            )
        return u


class _EquilibriumBC(LBMBoundaryCondition):
    """Shared machinery for Dirichlet/Neumann non-equilibrium extrapolation
    BCs (reference LBMDirichletBC.C / LBMNeumannBC.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.f_old = params.get_str("f_old", required=True)
        self.feq = self.input_buffer("feq")
        self.rho = self.input_buffer("rho")
        self.velocity = self.input_buffer("velocity")
        self.region_id = params.get_int("region_id", None) if params.has("region_id") else None
        self._mask = None

    def history_requests(self):
        return {self.f_old: 1}

    def boundary_feq(self, state):
        raise NotImplementedError

    def _neq(self, state, ctx):
        """feq_boundary + (f_old − feq)."""
        return self.boundary_feq(state) + (
            ctx["old"][self.f_old][0] - state[self.feq]
        )

    def _face_update(self, u, corr, axis, pos, dirs):
        idx = [slice(None)] * 3
        idx[axis] = pos
        if dirs is None:
            return u.at[tuple(idx)].set(corr[tuple(idx)])
        for d in dirs:
            di = int(d)
            u = u.at[tuple(idx + [di])].set(corr[tuple(idx + [di])])
        return u

    def _mask_update(self, u, corr, target, marked=True):
        if self._mask is None:
            if marked:
                mesh = self.boundary_adjacent_mask()
            else:
                mesh = self.problem.lbm_binary_media_np()
            if mesh is None:
                raise ComputeError("wall/regional boundary requires binary media")
            self._mask = mesh == target
        mask = jnp.asarray(self._mask)[..., None]
        return jnp.where(mask, corr, u)


@computes.register("LBMDirichletBC")
class LBMDirichletBC(_EquilibriumBC):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.boundary_value = params.get_float("value", 0.0)

    def boundary_feq(self, state):
        feq = state[self.feq]
        rho_b = jnp.full(feq.shape, self.boundary_value, dtype=feq.dtype)
        # reference computeBoundaryEquilibrium expands rho over q already;
        # _equilibrium broadcasts the trailing q axis the same way
        return _equilibrium(
            self.stencil, rho_b, state[self.velocity], self.domain.dim
        )

    def top_boundary(self, u, state, ctx):
        return self._face_update(u, self._neq(state, ctx), 1, -1, None)

    def bottom_boundary(self, u, state, ctx):
        return self._face_update(u, self._neq(state, ctx), 1, 0, None)

    def left_boundary(self, u, state, ctx):
        return self._face_update(u, self._neq(state, ctx), 0, 0, None)

    def right_boundary(self, u, state, ctx):
        return self._face_update(u, self._neq(state, ctx), 0, -1, None)

    def front_boundary(self, u, state, ctx):
        return self._face_update(u, self._neq(state, ctx), 2, 0, None)

    def back_boundary(self, u, state, ctx):
        return self._face_update(u, self._neq(state, ctx), 2, -1, None)

    def wall_boundary(self, u, state, ctx):
        return self._mask_update(u, self._neq(state, ctx), -1)

    def regional_boundary(self, u, state, ctx):
        return self._mask_update(
            u, self._neq(state, ctx), self.region_id or 0, marked=False
        )


@computes.register("LBMNeumannBC")
class LBMNeumannBC(_EquilibriumBC):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.gradient = params.get_float("gradient", 0.0)

    def boundary_feq(self, state):
        rho = state[self.rho] + self.gradient
        return _equilibrium(
            self.stencil, rho[..., None], state[self.velocity], self.domain.dim
        )

    def top_boundary(self, u, state, ctx):
        st = self.stencil
        return self._face_update(
            u, self._neq(state, ctx), 1, -1, [st.op[d] for d in st.bottom]
        )

    def bottom_boundary(self, u, state, ctx):
        return self._face_update(u, self._neq(state, ctx), 1, 0, self.stencil.bottom)

    def left_boundary(self, u, state, ctx):
        return self._face_update(u, self._neq(state, ctx), 0, 0, self.stencil.left)

    def right_boundary(self, u, state, ctx):
        st = self.stencil
        return self._face_update(
            u, self._neq(state, ctx), 0, -1, [st.op[d] for d in st.left]
        )

    def front_boundary(self, u, state, ctx):
        return self._face_update(u, self._neq(state, ctx), 2, 0, self.stencil.front)

    def back_boundary(self, u, state, ctx):
        st = self.stencil
        return self._face_update(
            u, self._neq(state, ctx), 2, -1, [st.op[d] for d in st.front]
        )

    def wall_boundary(self, u, state, ctx):
        return self._mask_update(u, self._neq(state, ctx), -1)

    def regional_boundary(self, u, state, ctx):
        return self._mask_update(
            u, self._neq(state, ctx), self.region_id or 0, marked=False
        )


@computes.register("LBMMicroscopicZeroGradientBC")
class LBMMicroscopicZeroGradientBC(LBMBoundaryCondition):
    """Copy the adjacent inner layer onto the boundary layer
    (reference LBMMicroscopicZeroGradientBC.C)."""

    def left_boundary(self, u, state, ctx):
        return u.at[0].set(u[1])

    def right_boundary(self, u, state, ctx):
        return u.at[-1].set(u[-2])

    def bottom_boundary(self, u, state, ctx):
        return u.at[:, 0].set(u[:, 1])

    def top_boundary(self, u, state, ctx):
        return u.at[:, -1].set(u[:, -2])

    def front_boundary(self, u, state, ctx):
        return u.at[:, :, 0].set(u[:, :, 1])

    def back_boundary(self, u, state, ctx):
        return u.at[:, :, -1].set(u[:, :, -2])


@computes.register("LBMSpecularReflectionBoundary")
class LBMSpecularReflectionBoundary(LBMBoundaryCondition):
    """Slip/specular reflection (reference LBMSpecularReflectionBoundary.C —
    explicitly 'under development and not tested' upstream; a simplified
    bounce-back/specular mix is provided here)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.f_old = params.get_str("f_old", required=True)
        self.r = params.get_float("r", 0.5)

    def history_requests(self):
        return {self.f_old: 1}

    def _mix(self, u, fold, axis, pos, unknown_dirs, mirror_axis):
        st = self.stencil
        e = [st.ex, st.ey, st.ez]
        for d in unknown_dirs:
            di = int(d)
            o = int(st.op[di])
            # specular partner: same tangential components, flipped normal
            target = None
            for c in range(st.q):
                ok = all(
                    (e[a][c] == (-e[a][di] if a == mirror_axis else e[a][di]))
                    for a in range(3)
                )
                if ok:
                    target = c
                    break
            idx = [slice(None)] * 3
            idx[axis] = pos
            bb = fold[tuple(idx + [o])]
            sp = fold[tuple(idx + [target if target is not None else o])]
            u = u.at[tuple(idx + [di])].set(self.r * bb + (1.0 - self.r) * sp)
        return u

    def _fold(self, ctx):
        return ctx["old"][self.f_old][0]

    def left_boundary(self, u, state, ctx):
        return self._mix(u, self._fold(ctx), 0, 0, self.stencil.left, 0)

    def right_boundary(self, u, state, ctx):
        st = self.stencil
        return self._mix(u, self._fold(ctx), 0, -1, [st.op[d] for d in st.left], 0)

    def bottom_boundary(self, u, state, ctx):
        return self._mix(u, self._fold(ctx), 1, 0, self.stencil.bottom, 1)

    def top_boundary(self, u, state, ctx):
        st = self.stencil
        return self._mix(u, self._fold(ctx), 1, -1, [st.op[d] for d in st.bottom], 1)

    def front_boundary(self, u, state, ctx):
        return self._mix(u, self._fold(ctx), 2, 0, self.stencil.front, 2)

    def back_boundary(self, u, state, ctx):
        st = self.stencil
        return self._mix(u, self._fold(ctx), 2, -1, [st.op[d] for d in st.front], 2)
