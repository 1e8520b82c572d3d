"""Adams-Bashforth-Moulton semi-implicit solver.

Re-design of reference AdamsBashforthMoulton
(src/tensor_solver/AdamsBashforthMoulton.C:60-187): AB1-5 predictor with the
semi-implicit update ū = (ū + dt·Σβᵢ N̄ᵢ)/(1 − dt·L̄), optional AM1-5
corrector, order fallback on dt change, per-variable history.

The order selection is data-dependent (history grows over the first steps and
resets on dt change) — here it is a traced index into zero-padded coefficient
tables, so the whole substep stays inside one jit region with no host sync.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import Params
from ..registry import solvers
from .base import SplitOperatorBase

MAX_ORDER = 5

# Adams–Bashforth coefficients, zero-padded (reference :67-74)
BETA = [
    [1.0, 0.0, 0.0, 0.0, 0.0],
    [3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0, 0.0],
    [23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0, 0.0],
    [55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0, 0.0],
    [190.0 / 720.0, -2774.0 / 720.0, 2616.0 / 720.0, -1274.0 / 720.0, 251.0 / 720.0],
]

# Adams–Moulton coefficients, zero-padded (reference :108-115)
ALPHA = [
    [1.0, 0.0, 0.0, 0.0, 0.0],
    [0.5, 0.5, 0.0, 0.0, 0.0],
    [5.0 / 12.0, 8.0 / 12.0, -1.0 / 12.0, 0.0, 0.0],
    [9.0 / 24.0, 19.0 / 24.0, -5.0 / 24.0, 1.0 / 24.0, 0.0],
    [251.0 / 720.0, 646.0 / 720.0, -264.0 / 720.0, 106.0 / 720.0, -19.0 / 720.0],
]


@solvers.register("AdamsBashforthMoulton", "SemiImplicitSolver")
class AdamsBashforthMoulton(SplitOperatorBase):
    supports_carry_reciprocal = True  # substep writes the updated ū back

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        porder = params.get_int("predictor_order", 2)
        corder = params.get_int("corrector_order", 2)
        if not (1 <= porder <= MAX_ORDER) or not (1 <= corder <= MAX_ORDER):
            params.error("predictor_order", f"must be in [1, {MAX_ORDER}]")
        self.predictor_order = porder - 1
        self.corrector_order = corder - 1
        self.corrector_steps = params.get_int("corrector_steps", 0)
        self.request_history(max(self.predictor_order, self.corrector_order))
        self._beta = __import__("numpy").asarray(BETA)
        self._alpha = __import__("numpy").asarray(ALPHA)

    def group_evals_per_step(self):
        return self.substeps * (1 + self.corrector_steps)

    def substep(self, state, sub_time, sub_dt, dt, dt_old, substep_index, first_step):
        state = self._run_group(state, sub_time)
        buffers = dict(state["buffers"])
        dom = self.domain
        dt_changed = dt != dt_old

        def select_order(threshold, fallback, n_old_b, maxo):
            cond = (substep_index < threshold) & dt_changed
            order = jnp.where(cond, fallback, n_old_b)
            return jnp.minimum(order, maxo)

        # -- Adams-Bashforth predictor (reference :77-104) -----------------
        final_ubar = {}
        for v in self.variables:
            n_old_b = self.n_old(state, v.nonlinear_reciprocal)
            order = select_order(self.predictor_order, 0, n_old_b, self.predictor_order)
            beta_row = jnp.asarray(self._beta)[order]
            N = buffers[v.nonlinear_reciprocal]
            old_N = self.old_stack(state, v.nonlinear_reciprocal)
            acc = beta_row[0] * N
            for i in range(min(old_N.shape[0], MAX_ORDER - 1)):
                acc = acc + beta_row[i + 1] * old_N[i]
            ubar = buffers[v.reciprocal_buffer] + sub_dt * acc
            if v.linear_reciprocal is not None:
                ubar = ubar / (1.0 - sub_dt * buffers[v.linear_reciprocal])
            buffers[v.buffer] = dom.ifft(ubar)
            final_ubar[v.buffer] = ubar

        # -- Adams-Moulton corrector (reference :118-186) ------------------
        if self.corrector_steps:
            sub_time_c = sub_time + sub_dt
            ubar_n = {v.buffer: buffers[v.reciprocal_buffer] for v in self.variables}
            N_n = {v.buffer: buffers[v.nonlinear_reciprocal] for v in self.variables}
            for _ in range(self.corrector_steps):
                # the group is re-evaluated even when the corrector order
                # selection yields a no-op (reference :146-150 continues per
                # variable AFTER computeBuffer), which matters for history
                state_c = self._run_group({**state, "buffers": buffers}, sub_time_c)
                buffers = dict(state_c["buffers"])
                if self.corrector_order == 0:
                    continue
                for v in self.variables:
                    n_old_b = self.n_old(state, v.nonlinear_reciprocal)
                    order = select_order(
                        self.corrector_order, 1, n_old_b + 1, self.corrector_order
                    )
                    alpha_row = jnp.asarray(self._alpha)[order]
                    N_pred = buffers[v.nonlinear_reciprocal]
                    old_N = self.old_stack(state, v.nonlinear_reciprocal)
                    acc = alpha_row[0] * N_pred + alpha_row[1] * N_n[v.buffer]
                    for i in range(min(old_N.shape[0], MAX_ORDER - 2)):
                        acc = acc + alpha_row[i + 2] * old_N[i]
                    ubar = ubar_n[v.buffer] + sub_dt * acc
                    if v.linear_reciprocal is not None:
                        ubar = ubar / (1.0 - sub_dt * buffers[v.linear_reciprocal])
                    buffers[v.buffer] = dom.ifft(ubar)
                    final_ubar[v.buffer] = ubar

        if self.carry_reciprocal:
            # the pruned ForwardFFT's role: next substep reads ū directly
            for v in self.variables:
                buffers[v.reciprocal_buffer] = final_ubar[v.buffer]

        return {**state, "buffers": buffers}
