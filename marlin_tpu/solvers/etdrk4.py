"""4th-order exponential time differencing (ETDRK4) solver.

Re-design of reference ETDRK4Solver (src/tensor_solver/ETDRK4Solver.C:29-122)
with identical stage math and the L→0 limit guards (phi1=dt, phi2=dt²/2,
phi3=dt²/6 where L·dt == 0, reference :84-91).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import Params
from ..registry import solvers
from .base import SplitOperatorBase


@solvers.register("ETDRK4Solver")
class ETDRK4Solver(SplitOperatorBase):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.request_history(1)

    def substep(self, state, sub_time, sub_dt, dt, dt_old, substep_index, first_step):
        dom = self.domain
        state = self._run_group(state, sub_time)
        buffers = dict(state["buffers"])

        def eval_nonlinear(ubar_stage):
            nonlocal buffers
            buffers.update(self._ifft_all(
                [(v.buffer, ub)
                 for v, ub in zip(self.variables, ubar_stage)]))
            st = self._run_group({**state, "buffers": buffers}, sub_time)
            buffers = dict(st["buffers"])
            return [buffers[v.nonlinear_reciprocal] for v in self.variables]

        ubar_n, linear, nonlinear1 = [], [], []
        for v in self.variables:
            ubar_n.append(buffers[v.reciprocal_buffer])
            nonlinear1.append(buffers[v.nonlinear_reciprocal])
            if v.linear_reciprocal is not None:
                linear.append(buffers[v.linear_reciprocal])
            else:
                linear.append(jnp.zeros_like(buffers[v.reciprocal_buffer]))

        expLdt, expHalf, phi1, phi2, phi3 = [], [], [], [], []
        for i, v in enumerate(self.variables):
            Ldt = linear[i] * sub_dt
            eL = jnp.exp(Ldt)
            denom = Ldt * Ldt * Ldt
            p1 = sub_dt * (-4.0 - 3.0 * Ldt + eL * (4.0 - Ldt)) / denom
            p2 = sub_dt * (2.0 + Ldt + eL * (-2.0 + Ldt)) / denom
            p3 = sub_dt * (-4.0 - 3.0 * Ldt - Ldt * Ldt + eL * (4.0 - Ldt)) / denom
            zero = Ldt == 0.0
            p1 = jnp.where(zero, sub_dt, p1)
            p2 = jnp.where(zero, sub_dt * sub_dt / 2.0, p2)
            p3 = jnp.where(zero, sub_dt * sub_dt / 6.0, p3)
            expLdt.append(eL)
            expHalf.append(jnp.exp(Ldt / 2.0))
            phi1.append(p1)
            phi2.append(p2)
            phi3.append(p3)

        ubar_b = [
            expHalf[i] * ubar_n[i] + 0.5 * sub_dt * nonlinear1[i]
            for i in range(len(self.variables))
        ]
        nonlinear2 = eval_nonlinear(ubar_b)
        ubar_c = [
            expHalf[i] * ubar_n[i] + 0.5 * sub_dt * nonlinear2[i]
            for i in range(len(self.variables))
        ]
        nonlinear3 = eval_nonlinear(ubar_c)
        ubar_d = [
            expLdt[i] * ubar_n[i] + sub_dt * nonlinear3[i]
            for i in range(len(self.variables))
        ]
        nonlinear4 = eval_nonlinear(ubar_d)

        buffers.update(self._ifft_all([
            (v.buffer,
             expLdt[i] * ubar_n[i]
             + phi1[i] * nonlinear1[i]
             + 2.0 * phi2[i] * (nonlinear2[i] + nonlinear3[i])
             + phi3[i] * nonlinear4[i])
            for i, v in enumerate(self.variables)
        ]))

        return {**state, "buffers": buffers}
