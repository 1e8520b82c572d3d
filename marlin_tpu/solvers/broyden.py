"""Good-Broyden solver for coupled variables.

Re-design of reference BroydenSolver (src/tensor_solver/BroydenSolver.C:55-180):
per-grid-point N×N inverse-Jacobian update M += (s − M·y)·sᵀ/(sᵀ·y), carried
persistently across substeps and timesteps (the reference keeps _M as a
member).  Here M lives in state["solver"]["M"] so the whole solve remains a
pure function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Params
from ..registry import solvers
from .base import SplitOperatorBase
from .secant import _norm


@solvers.register("BroydenSolver")
class BroydenSolver(SplitOperatorBase):
    iterative = True

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.max_iterations = params.get_int("max_iterations", 100)
        self.rel_tol = params.get_float("relative_tolerance", 1e-9)
        self.abs_tol = params.get_float("absolute_tolerance", 1e-9)
        # declared-but-unused upstream: the reference reads damping
        # (BroydenSolver.C:24,42) but hard-codes sk*0.5 in the update
        # (:135) — accepted as inert for step-for-step parity
        self.damping = params.get_float("damping", 1.0)
        self.eye_factor = params.get_float("initial_jacobian_guess", 1.0)
        # reference BroydenSolver.C:30 "Show convergence history." — the
        # per-iteration console print becomes an async jax.debug.print tap
        self.verbose = params.get_bool("verbose", False)
        # reference parity: only SecantSolver applies predictors
        # (SecantSolver.C:100); BroydenSolver never calls applyPredictors,
        # so attached [Predictors] blocks are built but inert — same here
        self.predictors = []

    def init_solver_state(self):
        n = len(self.variables)
        shape = self.domain.reciprocal_shape + (n, n)
        M = jnp.broadcast_to(
            jnp.eye(n, dtype=self.domain.cdtype) * self.eye_factor, shape
        )
        return {
            "M": M,
            "iterations": jnp.zeros((), jnp.int32),
            "converged": jnp.ones((), bool),
            "group_evals": jnp.zeros((), jnp.int32),  # see secant.py
        }

    def _stack(self, bufs):
        u = jnp.stack([bufs[v.reciprocal_buffer] for v in self.variables], -1)
        N = jnp.stack([bufs[v.nonlinear_reciprocal] for v in self.variables], -1)
        L = jnp.stack(
            [
                bufs[v.linear_reciprocal]
                if v.linear_reciprocal is not None
                else jnp.zeros_like(bufs[v.reciprocal_buffer])
                for v in self.variables
            ],
            -1,
        )
        return u, N, L

    def substep(self, state, sub_time, sub_dt, dt, dt_old, substep_index, first_step):
        dom = self.domain
        n = len(self.variables)
        state = self._run_group(state, sub_time)
        buffers = dict(state["buffers"])
        M0 = state["solver"]["M"]

        u0, N, L = self._stack(buffers)
        u_old = u0
        R = (N + L * u0) * sub_dt
        R0norm = _norm(R)

        def converged_fn(R):
            Rnorm = _norm(R)
            return (Rnorm < self.abs_tol) | (Rnorm / R0norm < self.rel_tol)

        def cond(carry):
            it, bufs, u, R, M = carry
            return (it < self.max_iterations) & (~converged_fn(R)) & (~jnp.isnan(_norm(R)))

        def body(carry):
            it, bufs, u, R, M = carry
            if self.verbose:  # reference :128 "i |R|=..."
                jax.debug.print("{i} |R|={r}", i=it, r=_norm(R))
            # update step s = -M·R (reference :128-131)
            sk = -jnp.einsum("...ij,...j->...i", M, R)
            u_new = u + sk * 0.5  # reference hard-codes the 0.5 damping (:135)
            bufs = dict(bufs)
            bufs.update(self._ifft_stacked(
                [v.buffer for v in self.variables], u_new))
            st = self._run_group({**state, "buffers": bufs}, sub_time)
            bufs = dict(st["buffers"])
            u2, N2, L2 = self._stack(bufs)
            Rnew = (N2 + L2 * u2) * sub_dt + u_old - u2
            yk = Rnew - R
            denom = jnp.einsum("...i,...i->...", sk, yk)[..., None, None]
            My = jnp.einsum("...ij,...j->...i", M, yk)
            outer = jnp.einsum("...i,...j->...ij", sk - My, sk)
            M = M + jnp.where(jnp.abs(denom) > 1e-12, outer / denom, 0.0)
            return (it + 1, bufs, u2, Rnew, M)

        init = (jnp.zeros((), jnp.int32), buffers, u0, R, M0)
        it, buffers, u, R, M = jax.lax.while_loop(cond, body, init)
        is_conv = converged_fn(R)

        solver_state = dict(state["solver"])
        solver_state["M"] = M
        solver_state["iterations"] = it
        solver_state["converged"] = is_conv
        solver_state["group_evals"] = (
            solver_state.get("group_evals", jnp.zeros((), jnp.int32)) + it
        )
        return {**state, "buffers": buffers, "solver": solver_state}
