"""Lattice Boltzmann computes: equilibrium, collisions, moments, forces, BCs.

Re-designs of reference src/tensor_computes/LBM*.C (see per-class citations).
All LBM buffers carry the reference layout (nx, ny, nz, [q|dim]) with nz=1
in 2D (reference LBMTensorBuffer.C:96-125).  Everything is pure jnp over the
state pytree; the whole substep chain (stream -> BCs -> moments -> collide)
lives in one jit region and XLA fuses the pointwise stages.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params
from ..registry import computes
from .base import ComputeError, TensorCompute

CS = 1.0 / math.sqrt(3.0)  # reference include/problems/LatticeBoltzmannProblem.h:106-109
CS2 = CS * CS
CS4 = CS2 * CS2


class LatticeBoltzmannOperator(TensorCompute):
    """Base: stencil + binary-media access
    (reference src/tensor_computes/LatticeBoltzmannOperator.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.stencil = problem.lbm_stencil()

    @property
    def w(self):
        """Weights broadcast over the trailing q axis."""
        return self.stencil.weights

    def masked_fill_solids(self, t, value=0.0):
        """Zero out solid cells (reference LatticeBoltzmannProblem::
        maskedFillSolids :165-182; only active with binary media)."""
        mask = self.problem.lbm_solid_mask()
        if mask is None:
            return t
        if t.ndim == mask.ndim:
            return jnp.where(mask, value, t)
        return jnp.where(mask[..., None], value, t)


def _ensure3d(a):
    """Reference LBM ops unsqueeze bare-grid (2-D) fields in place
    (`if (_rho.dim() < 3) _rho.unsqueeze_(2)`, LBMEquilibrium.C)."""
    while a.ndim < 3:
        a = a[..., None]
    return a


def _unsqueeze_velocity(velocity, dim):
    ux = velocity[..., 0][..., None]
    uy = velocity[..., 1][..., None]
    if dim == 3:
        uz = velocity[..., 2][..., None]
    else:
        uz = jnp.zeros_like(ux)
    return ux, uy, uz


def _equilibrium(stencil, rho_unsqueezed, velocity, dim):
    """feq = w·rho·(1 + e·u/cs² + (e·u)²/(2cs⁴) − u²/(2cs²))
    (reference LBMEquilibrium.C:42-66)."""
    ux, uy, uz = _unsqueeze_velocity(velocity, dim)
    ex, ey, ez = stencil.ex, stencil.ey, stencil.ez
    edotu = ex * ux + ey * uy + ez * uz
    usqr = ux * ux + uy * uy + uz * uz
    second_order = edotu / CS2 + 0.5 * edotu * edotu / CS4
    third_order = 0.5 * usqr / CS2
    return stencil.weights * rho_unsqueezed * (1.0 + second_order - third_order)


@computes.register("LBMEquilibrium")
class LBMEquilibrium(LatticeBoltzmannOperator):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.rho = self.input_buffer("bulk")
        self.velocity = self.input_buffer("velocity")

    def apply(self, state, ctx):
        rho = _ensure3d(state[self.rho])
        u = _equilibrium(
            self.stencil, rho[..., None], state[self.velocity], self.domain.dim
        )
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMPhaseEquilibrium")
class LBMPhaseEquilibrium(LatticeBoltzmannOperator):
    """Phase-field equilibrium (reference LBMPhaseEquilibrium.C — note the
    reference currently returns only gamma_eq = w·phi; the interface term is
    commented out)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.phi = self.input_buffer("phi")
        self.grad_phi = self.input_buffer("grad_phi")
        self.tau_phi = problem.get_constant(params.get_str("tau_phi", required=True))
        self.D = problem.get_constant(params.get_str("thickness", required=True))

    def apply(self, state, ctx):
        phi = _ensure3d(state[self.phi])
        u = self.w * phi[..., None]
        return {self.out: self.masked_fill_solids(u)}


class _CollisionBase(LatticeBoltzmannOperator):
    """Template base for collisions (reference LBMCollisionDynamics.C:1-319)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.f = self.input_buffer("f")
        self.feq = self.input_buffer("feq")
        self.tau_0 = problem.get_constant(params.get_str("tau0", required=True))
        self.C_s = problem.get_constant(params.get_str("Cs", "0.1"))
        self.delta_x = 1.0
        self.projection = params.get_bool("projection", False)

    def fneq(self, state):
        f, feq = state[self.f], state[self.feq]
        if not self.projection:
            return f - feq
        return self._hermite_regularization(f, feq)

    def _hermite_regularization(self, f, feq):
        """Project fneq onto second-order Hermite space
        (reference :44-92)."""
        st = self.stencil
        fneq = f - feq  # (nx,ny,nz,q)
        dt = np.dtype(self.domain.dtype)  # keep SINGLE decks in f32
        e = np.stack([st.ex, st.ey, st.ez], 0)  # (3, q)
        # ccr[ic] = outer(e_ic, e_ic) flattened (9)
        ccr = np.einsum("ai,bi->iab", e, e).reshape(st.q, 9).astype(dt)
        fneqcc = jnp.einsum("...i,ij->...j", fneq, ccr)  # (nx,ny,nz,9)
        H2 = (
            np.einsum("ai,bi->iab", e, e) / CS2
            - np.eye(3)[None, :, :]
        ).reshape(st.q, 9).astype(dt)
        out = (
            st.weights
            * (1.0 / (2.0 * CS2))
            * jnp.einsum("...j,ij->...i", fneqcc, H2)
        )
        return out

    def _smagorinsky_tau(self, state, fneq):
        """Local relaxation parameter from non-equilibrium momentum flux
        (reference computeRelaxationParameter :95-185)."""
        st = self.stencil
        nz_is_one = state[self.f].shape[2] == 1
        zeros = np.zeros(st.q, dtype=np.int64)
        ones = np.ones(st.q, dtype=np.int64)
        ex2 = np.stack([st.ex, zeros, zeros])
        ey2 = np.stack([zeros, st.ey, zeros])
        ez2 = np.stack([ones, zeros, st.ez]) if nz_is_one \
            else np.stack([zeros, zeros, st.ez])
        # outer_products[i, k, a, b] = ez2[k,i] outer of ex2[a,i], ey2[b,i]
        outer = np.zeros((st.q, 3, 3, 3), dtype=np.dtype(self.domain.dtype))
        for i in range(st.q):
            outer[i] = np.einsum("i,j,k->kij", ex2[:, i], ey2[:, i], ez2[:, i])
        Q = jnp.einsum("nijk,...n->...ijk", outer, fneq)
        mean_density = jnp.mean(jnp.sum(state[self.f], 3))
        Q_mean = jnp.sqrt(jnp.sum(Q * Q, axis=(-3, -2, -1))) / (mean_density * CS2)
        t_sgs = math.sqrt(self.C_s) * self.delta_x / CS
        eta = self.tau_0 / t_sgs
        Q_mean_sqrt = jnp.sqrt(eta * eta + 4.0 * Q_mean)
        S = (-eta + Q_mean_sqrt) / (2.0 * t_sgs)
        tau = self.tau_0 + self.C_s * self.delta_x**2 * S / CS2
        return tau[..., None]


@computes.register("LBMBGKCollision")
class LBMBGKCollision(_CollisionBase):
    def apply(self, state, ctx):
        fneq = self.fneq(state)
        u = state[self.feq] + fneq - fneq / self.tau_0
        u = self.masked_fill_solids(u)
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMMRTCollision")
class LBMMRTCollision(_CollisionBase):
    def apply(self, state, ctx):
        st = self.stencil
        fneq = self.fneq(state)
        S = st.S.copy()
        S[st.id_kinematic_visc, st.id_kinematic_visc] = 1.0 / self.tau_0
        MSM = st.M_inv @ S @ st.M
        f = jnp.einsum("ab,...b->...a", MSM, fneq)
        u = state[self.feq] + fneq - f
        u = self.masked_fill_solids(u)
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMSmagorinskyCollision")
class LBMSmagorinskyCollision(_CollisionBase):
    def apply(self, state, ctx):
        fneq = self.fneq(state)
        tau = self._smagorinsky_tau(state, fneq)
        u = state[self.feq] + fneq - fneq / tau
        u = self.masked_fill_solids(u)
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMSmagorinskyMRTCollision")
class LBMSmagorinskyMRTCollision(_CollisionBase):
    def apply(self, state, ctx):
        st = self.stencil
        fneq = self.fneq(state)
        tau = self._smagorinsky_tau(state, fneq)  # (nx,ny,nz,1)
        m_neq = jnp.einsum("ab,...b->...a", st.M, fneq)
        # per-point relaxation matrix: stencil S with kinematic-visc diagonal
        # entries replaced by 1/tau (reference computeLocalRelaxationMatrix)
        m_relaxed = jnp.einsum("ab,...b->...a", st.S, m_neq)
        inv_tau = 1.0 / tau[..., 0]
        for idx in self.stencil.id_kinematic_visc:
            m_relaxed = m_relaxed.at[..., idx].set(inv_tau * m_neq[..., idx])
        f = jnp.einsum("ab,...b->...a", st.M_inv, m_relaxed)
        u = state[self.feq] + fneq - f
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMComputeDensity")
class LBMComputeDensity(LatticeBoltzmannOperator):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.f = self.input_buffer("f")

    def apply(self, state, ctx):
        u = jnp.sum(state[self.f], 3)
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMComputeVelocity")
class LBMComputeVelocity(LatticeBoltzmannOperator):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.f = self.input_buffer("f")
        self.rho = self.input_buffer("rho")
        self.enable_forces = params.get_bool("enable_forces", False)
        self.add_body_force = params.get_bool("add_body_force", False)
        self.forces = params.get_str("forces", "forces")
        if self.enable_forces and self.forces not in self.inputs:
            self.inputs.append(self.forces)
        self.body_force = [
            self.constant("body_force_x", 0.0),
            self.constant("body_force_y", 0.0),
            self.constant("body_force_z", 0.0),
        ]

    def apply(self, state, ctx):
        dim = self.domain.dim
        st = self.stencil
        f, rho = state[self.f], state[self.rho]
        comps = [jnp.sum(f * st.ex, 3) / rho]
        if dim > 1:
            comps.append(jnp.sum(f * st.ey, 3) / rho)
        if dim > 2:
            comps.append(jnp.sum(f * st.ez, 3) / rho)
        u = jnp.stack(comps, -1)
        if self.enable_forces:
            u = u + state[self.forces] / (2.0 * rho[..., None])
        if self.add_body_force:
            bf = jnp.asarray(self.body_force[:dim], dtype=u.dtype)
            u = u + bf / (2.0 * rho[..., None])
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMComputeVelocityMagnitude")
class LBMComputeVelocityMagnitude(LatticeBoltzmannOperator):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.velocity = self.input_buffer("velocity")

    def apply(self, state, ctx):
        v = state[self.velocity]
        u = jnp.sqrt(jnp.sum(v * v, axis=-1))
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMComputeResidual")
class LBMComputeResidual(LatticeBoltzmannOperator):
    """Convergence residual -> solver state
    (reference LBMComputeResidual.C; feeds the problem's early stop)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.speed = self.input_buffer("speed")
        self.outputs = []  # writes solver residual, not a buffer

    def history_requests(self):
        return {self.speed: 1}

    def apply(self, state, ctx):
        speed = state[self.speed]
        old = ctx.get("old", {}).get(self.speed)
        if old is None:
            return {"__residual__": jnp.ones((), speed.dtype)}
        num = jnp.sum(jnp.abs(speed - old[0]))
        den = jnp.sum(speed)
        residual = jnp.where((den == 0) | (num == 0), 1.0, num / den)
        n_old = ctx.get("n_advances")
        if n_old is not None:
            residual = jnp.where(n_old > 0, residual, 1.0)
        return {"__residual__": residual}


@computes.register("LBMConstantTensor")
class LBMConstantTensor(LatticeBoltzmannOperator):
    """Fill buffer (or its components) with named constants
    (reference LBMConstantTensor.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.values = [
            problem.get_constant(c) for c in params.get_str_vector("constants", required=True)
        ]

    def apply(self, state, ctx):
        u = state[self.out]
        if u.ndim > 3:
            if u.shape[3] != len(self.values):
                raise ComputeError(
                    "The number of constants must match the number of "
                    "components in the buffer."
                )
            vals = jnp.asarray(self.values, dtype=u.dtype)
            return {self.out: jnp.broadcast_to(vals, u.shape)}
        if len(self.values) != 1:
            raise ComputeError("For scalar buffers only one constant can be passed.")
        return {self.out: jnp.full(u.shape, self.values[0], dtype=u.dtype)}


@computes.register("LBMStackTensors")
class LBMStackTensors(LatticeBoltzmannOperator):
    """Stack scalar buffers into a vector buffer (reference LBMStackTensors.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.stack_inputs = self.input_buffers("inputs")
        if len(set(self.stack_inputs)) != len(self.stack_inputs):
            params.error("inputs", "Duplicate buffer name.")

    def apply(self, state, ctx):
        # inputs may be lazily broadcast axis shapes (e.g. ParsedCompute of
        # a single coordinate); align them before stacking
        comps = jnp.broadcast_arrays(*[state[n] for n in self.stack_inputs])
        return {self.out: jnp.stack(comps, -1)}


@computes.register("LBMTensorUnitConverter")
class LBMTensorUnitConverter(LatticeBoltzmannOperator):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.tensor_buffer = self.input_buffer("tensor_buffer")
        self.conversion = problem.get_constant(params.get_str("constant", required=True))

    def apply(self, state, ctx):
        return {self.out: state[self.tensor_buffer] * self.conversion}


@computes.register("LBMComputeForces")
class LBMComputeForces(LatticeBoltzmannOperator):
    """Gravity/buoyancy force field (reference LBMComputeForces.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.rho = params.get_str("rho", "rho")
        self.temperature = params.get_str("temperature", "T")
        self.enable_gravity = params.get_bool("enable_gravity", False)
        self.enable_buoyancy = params.get_bool("enable_buoyancy", False)
        if self.enable_gravity and self.rho not in self.inputs:
            self.inputs.append(self.rho)
        if self.enable_buoyancy:
            for b in (self.rho, self.temperature):
                if b not in self.inputs:
                    self.inputs.append(b)
        self.rho0 = problem.get_constant(params.get_str("rho0", "1.0"))
        self.T0 = problem.get_constant(params.get_str("T0", "1.0"))
        self.g = problem.get_constant(params.get_str("gravity", "0.001"))
        self.gravity_direction = int(params.get_float("gravity_direction", 1))

    def apply(self, state, ctx):
        u = jnp.zeros(state[self.out].shape, dtype=self.domain.dtype)
        d = self.gravity_direction
        if self.enable_gravity:
            u = u.at[..., d].add(self.g * state[self.rho])
        if self.enable_buoyancy:
            u = u.at[..., d].add(
                self.g * self.rho0 * (state[self.temperature] - self.T0)
            )
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMApplyForces")
class LBMApplyForces(LatticeBoltzmannOperator):
    """Guo-style forcing source applied to the distribution
    (reference LBMApplyForces.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        # the reference declares a velocity input but its use is commented
        # out (LBMApplyForces.C); not requesting it avoids forcing an
        # implicit buffer
        self.rho = self.input_buffer("rho")
        self.forces = self.input_buffer("forces")
        self.tau = problem.get_constant(params.get_str("tau0", required=True))
        # accumulates onto its own output buffer (u += source): depends on
        # the collision that produced it
        if self.out not in self.inputs:
            self.inputs.append(self.out)

    def apply(self, state, ctx):
        st = self.stencil
        dim = self.domain.dim
        rho = state[self.rho][..., None]
        F = state[self.forces]
        Fx = F[..., 0][..., None]
        Fy = F[..., 1][..., None]
        Fz = F[..., 2][..., None] if dim == 3 else jnp.zeros_like(Fx)
        source = st.weights * rho * (
            (st.ex * Fx + st.ey * Fy + st.ez * Fz) / CS2
        )
        u = state[self.out] + (1.0 - 1.0 / (2.0 * self.tau)) * source
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMComputeSurfaceForces")
class LBMComputeSurfaceForces(LatticeBoltzmannOperator):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.chemical_potential = self.input_buffer("chemical_potential")
        self.grad_phi = self.input_buffer("grad_phi")

    def apply(self, state, ctx):
        u = state[self.chemical_potential][..., None] * state[self.grad_phi]
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMComputeChemicalPotential")
class LBMComputeChemicalPotential(LatticeBoltzmannOperator):
    """CH chemical potential for two-phase LBM
    (reference LBMComputeChemicalPotential.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.phi = self.input_buffer("phi")
        self.laplacian_phi = self.input_buffer("laplacian_phi")
        self.D = problem.get_constant(params.get_str("thickness", required=True))
        self.sigma = problem.get_constant(params.get_str("sigma", required=True))

    def apply(self, state, ctx):
        phi = state[self.phi]
        part_1 = self.sigma / self.D * phi * (phi - 1.0)
        # (shapes align with the uniform 3-D layout; see _ensure3d)
        part_2 = self.D * self.sigma * state[self.laplacian_phi]
        # the reference unsqueezes part_1 because its phi is still the raw
        # 2-D h5 shape; with the uniform (nx,ny,nz) layout the shapes align
        if part_1.ndim == part_2.ndim:
            return {self.out: part_1 - part_2}
        return {self.out: part_1[..., None] - part_2}


@computes.register("LBMIsotropicGradient")
class LBMIsotropicGradient(LatticeBoltzmannOperator):
    """Isotropic gradient via the 3x3 weight kernel (reference
    LBMIsotropicGradient.C; 2D / non-D3Q19 only).  The torch conv2d over the
    periodically-padded field becomes a sum of jnp.roll terms."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.scalar_field = self.input_buffer("scalar_field")
        st = self.stencil
        if st.q == 19:
            raise ComputeError("Isotropic gradient cannot be computed for D3Q19 stencil")
        if problem.domain.dim == 3:
            raise ComputeError("LBMIsotropicGradient is not implemented for 3D")
        w33 = st.weights[st.reorder_indices].reshape(3, 3)
        ex33 = st.ex[st.reorder_indices].reshape(3, 3)
        ey33 = st.ey[st.reorder_indices].reshape(3, 3)
        self.kernels = [w33 * ex33, w33 * ey33]

    def _correlate(self, field2d, kernel):
        """3x3 cross-correlation over the edge-replicated field (the
        reference's padScalarField duplicates the first/last row and column,
        NOT periodic wrap — LBMIsotropicGradient.C padScalarField)."""
        padded = jnp.pad(field2d, 1, mode="edge")
        out = jnp.zeros_like(field2d)
        n0, n1 = field2d.shape
        for a in range(3):
            for b in range(3):
                if kernel[a, b] == 0.0:
                    continue
                out = out + kernel[a, b] * jax.lax.dynamic_slice(
                    padded, (a, b), (n0, n1)
                )
        return out

    def apply(self, state, ctx):
        field = state[self.scalar_field]
        f2d = field[..., 0] if field.ndim > 2 else field
        comps = [self._correlate(f2d, k)[..., None] for k in self.kernels]
        u = jnp.stack(comps, -1) / CS2
        return {self.out: self.masked_fill_solids(u)}


@computes.register("LBMIsotropicLaplacian")
class LBMIsotropicLaplacian(LBMIsotropicGradient):
    """Isotropic Laplacian (reference LBMIsotropicLaplacian.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        st = self.stencil
        self.lap_kernel = st.weights[st.reorder_indices].reshape(3, 3)

    def apply(self, state, ctx):
        field = state[self.scalar_field]
        f2d = field[..., 0] if field.ndim > 2 else field
        lap1 = 2.0 * self._correlate(f2d, self.lap_kernel)
        lap2 = 2.0 * f2d * float(self.stencil.weights.sum())
        u = ((lap1 - lap2) / CS2)[..., None]
        return {self.out: u}
