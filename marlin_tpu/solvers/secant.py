"""Implicit secant solver.

Re-design of reference SecantSolver (src/tensor_solver/SecantSolver.C:52-204):
per-k-point elementwise secant iteration du = −R·dx/dy with a semi-implicit
bootstrap step (dt_epsilon), damping, NaN abort, and rollback of
non-converged solves.

The reference's host-side ``.item()`` convergence checks (a device sync per
iteration) become a ``lax.while_loop`` with carried residual norms — the
entire nonlinear solve stays on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Params
from ..registry import solvers
from .base import SplitOperatorBase


def _norm(x):
    return jnp.sqrt(jnp.sum(jnp.abs(x) ** 2))


@solvers.register("SecantSolver")
class SecantSolver(SplitOperatorBase):
    iterative = True

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.max_iterations = params.get_int("max_iterations", 30)
        self.rel_tol = params.get_float("relative_tolerance", 1e-9)
        self.abs_tol = params.get_float("absolute_tolerance", 1e-9)
        self.damping = params.get_float("damping", 1.0)
        self.dt_epsilon = params.get_float("dt_epsilon", 1e-4)
        # reference SecantSolver.C:28 "Show convergence history."; the
        # host-console prints become async jax.debug.print taps (no device
        # sync — the solve stays a single on-device while_loop)
        self.verbose = params.get_bool("verbose", False)
        self.predictors = []  # bound by the problem

    def init_solver_state(self):
        return {
            "iterations": jnp.zeros((), jnp.int32),
            "converged": jnp.ones((), bool),
            # accumulated ITERATION-loop group evaluations (the one
            # initial evaluation per substep is counted statically by
            # group_evals_per_step); feeds ComputeGroupExecutionCount
            "group_evals": jnp.zeros((), jnp.int32),
        }

    def substep(self, state, sub_time, sub_dt, dt, dt_old, substep_index, first_step):
        dom = self.domain
        n = len(self.variables)
        state = self._run_group(state, sub_time)
        buffers = dict(state["buffers"])

        u_old, Rprev, uprev, R0norm, boots = [], [], [], [], []
        for v in self.variables:
            u = buffers[v.reciprocal_buffer]
            N = buffers[v.nonlinear_reciprocal]
            if v.linear_reciprocal is not None:
                L = buffers[v.linear_reciprocal]
                Rp = (N + L * u) * sub_dt
            else:
                Rp = N * sub_dt
            Rprev.append(Rp)
            uprev.append(u)
            R0norm.append(_norm(Rp))
            if self.verbose:  # reference :95 "|R0|=..."
                jax.debug.print("|R0|={r}", r=R0norm[-1])
            u_old.append(u)
            # semi-implicit bootstrap (reference :80-88)
            if v.linear_reciprocal is not None:
                bootstrap = (u + self.dt_epsilon * N) / (1.0 - self.dt_epsilon * L)
            else:
                bootstrap = u + self.dt_epsilon * N
            boots.append((v.buffer, bootstrap))
        buffers.update(self._ifft_all(boots))

        # forward predict on solver outputs (reference applyPredictors)
        st = {**state, "buffers": buffers}
        for p in self.predictors:
            st = p.apply(st)
        buffers = dict(st["buffers"])

        def cond(carry):
            it, done, nan_abort, bufs, up, Rp = carry
            return (it < self.max_iterations) & (~done) & (~nan_abort)

        def body(carry):
            it, done, nan_abort, bufs, up, Rp = carry
            st = self._run_group({**state, "buffers": bufs}, sub_time)
            bufs = dict(st["buffers"])
            new_up, new_Rp = list(up), list(Rp)
            all_conv = jnp.asarray(True)
            any_nan = jnp.asarray(False)
            updates = []
            for i, v in enumerate(self.variables):
                u = bufs[v.reciprocal_buffer]
                N = bufs[v.nonlinear_reciprocal]
                if v.linear_reciprocal is not None:
                    L = bufs[v.linear_reciprocal]
                    R = (N + L * u) * sub_dt + u_old[i] - u
                else:
                    R = N * sub_dt + u_old[i] - u
                dx = u - up[i]
                dy = R - Rp[i]
                du = jnp.where(dy != 0, -R * dx / dy, 0.0)
                new_up[i] = u
                new_Rp[i] = R
                updates.append((
                    v.buffer,
                    u + du if self.damping == 1.0 else u + du * self.damping,
                ))
                Rnorm = _norm(R)
                if self.verbose:  # reference :146 "i |du| = ... |R|=..."
                    jax.debug.print(
                        "{i} |du| = {du} |R|={r}",
                        i=it, du=_norm(du), r=Rnorm)
                any_nan = any_nan | jnp.isnan(Rnorm)
                all_conv = all_conv & (
                    (Rnorm < self.abs_tol) | (Rnorm / R0norm[i] < self.rel_tol)
                )
            bufs.update(self._ifft_all(updates))
            return (it + 1, all_conv, any_nan, bufs, tuple(new_up), tuple(new_Rp))

        init = (
            jnp.zeros((), jnp.int32),
            jnp.asarray(False),
            jnp.asarray(False),
            buffers,
            tuple(uprev),
            tuple(Rprev),
        )
        it, converged, nan_abort, buffers, _, _ = jax.lax.while_loop(cond, body, init)

        # rollback on non-convergence (reference :183-193)
        failed = (~converged) | nan_abort
        final = dict(buffers)
        rolled = self._ifft_all(
            [(v.buffer, u_old[i]) for i, v in enumerate(self.variables)])
        for v in self.variables:
            final[v.buffer] = jnp.where(failed, rolled[v.buffer],
                                        buffers[v.buffer])

        solver_state = dict(state.get("solver", {}))
        solver_state["iterations"] = it
        solver_state["converged"] = converged
        solver_state["group_evals"] = (
            solver_state.get("group_evals", jnp.zeros((), jnp.int32)) + it
        )
        return {**state, "buffers": final, "solver": solver_state}
