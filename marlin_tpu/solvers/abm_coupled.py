"""Coupled Adams-Bashforth-Moulton solver with dense N×N linear operator.

Re-design of reference AdamsBashforthMoultonCoupled
(src/tensor_solver/AdamsBashforthMoultonCoupled.C): per-k-point batched solve
of (I − dt·L)·ū = rhs with off-diagonal coupling terms, AB predictor + AM
corrector.  The batched `linalg_solve` maps to `jnp.linalg.solve` over the
trailing (N, N) dims — batched tiny solves XLA handles natively.

The L assembly mirrors the reference's stacking order exactly (cols then
rows, both at dim -1), including its effective transpose, so results match
the shipped gold files bit-for-bit on symmetric couplings.

Note: the reference also advances _sub_time inside the substep on top of the
base-class increment (a time-bookkeeping drift, :181); we keep consistent
time and use t+dt for corrector evaluations like the uncoupled ABM.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import Params
from ..registry import solvers
from ..smallsolve import small_solve
from .abm import ALPHA, BETA, MAX_ORDER
from .base import SplitOperatorBase


@solvers.register("AdamsBashforthMoultonCoupled")
class AdamsBashforthMoultonCoupled(SplitOperatorBase):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        porder = params.get_int("predictor_order", 2)
        corder = params.get_int("corrector_order", 2)
        if not (1 <= porder <= MAX_ORDER) or not (1 <= corder <= MAX_ORDER):
            params.error("predictor_order", f"must be in [1, {MAX_ORDER}]")
        self.predictor_order = porder - 1
        self.corrector_order = corder - 1
        self.corrector_steps = params.get_int("corrector_steps", 0)
        self.assume_symmetric = params.get_bool("assume_symmetric", False)
        rows = params.get_int_vector("linear_offdiag_rows")
        cols = params.get_int_vector("linear_offdiag_cols")
        self.offdiag_names = params.get_str_vector("linear_offdiag")
        if len(rows) != len(cols) or len(rows) != len(self.offdiag_names):
            params.error(
                "linear_offdiag",
                "'linear_offdiag_rows', 'linear_offdiag_cols', and "
                "'linear_offdiag' must all have the same length.",
            )
        N = len(self.variables)
        for i, j in zip(rows, cols):
            if i >= N or j >= N:
                params.error("linear_offdiag_rows", "Off-diagonal indices out of range.")
        self.offdiag_indices = list(zip(rows, cols))
        self.request_history(max(self.predictor_order, self.corrector_order))
        self._beta = np.asarray(BETA)
        self._alpha = np.asarray(ALPHA)

    def extra_input_buffers(self):
        return super().extra_input_buffers() + list(self.offdiag_names)

    def _assemble_A(self, buffers, sub_dt, dtype):
        """A = I − dt·L stacked per grid point, reference stacking order
        (cols at -1, then rows at -1)."""
        N = len(self.variables)
        base = buffers[self.variables[0].reciprocal_buffer]
        zeros = jnp.zeros(base.shape, dtype=dtype)
        Lmap = {}
        for i, v in enumerate(self.variables):
            if v.linear_reciprocal is not None:
                Lmap[(i, i)] = buffers[v.linear_reciprocal]
        for (i, j), name in zip(self.offdiag_indices, self.offdiag_names):
            Lmap[(i, j)] = buffers[name]
            if self.assume_symmetric and i != j and (j, i) not in Lmap:
                Lmap[(j, i)] = buffers[name]
        def cast(x):
            if not jnp.issubdtype(dtype, jnp.complexfloating) and jnp.iscomplexobj(x):
                x = jnp.real(x)
            return x.astype(dtype)

        rows = []
        for i in range(N):
            cols = [
                jnp.broadcast_to(cast(Lmap.get((i, j), zeros)), base.shape)
                for j in range(N)
            ]
            rows.append(jnp.stack(cols, axis=-1))
        L = jnp.stack(rows, axis=-1)
        eye = jnp.eye(N, dtype=dtype)
        return eye - sub_dt * L

    def group_evals_per_step(self):
        return self.substeps * (1 + self.corrector_steps)

    def substep(self, state, sub_time, sub_dt, dt, dt_old, substep_index, first_step):
        dom = self.domain
        N = len(self.variables)
        state = self._run_group(state, sub_time)
        buffers = dict(state["buffers"])
        dt_changed = dt != dt_old
        # the reference solves in the dtype of variables[0]'s linear buffer
        # (AdamsBashforthMoultonCoupled.C `base_dtype`), which is REAL for
        # -k²-style operators — the complex rhs's imaginary part is discarded
        # before the solve.  Replicated for gold parity.
        v0 = self.variables[0]
        if v0.linear_reciprocal is not None:
            dtype = buffers[v0.linear_reciprocal].dtype
        else:
            dtype = buffers[v0.reciprocal_buffer].dtype

        def select_order(threshold, fallback, n_old_b, maxo):
            cond = (substep_index < threshold) & dt_changed
            return jnp.minimum(jnp.where(cond, fallback, n_old_b), maxo)

        def cast(x):
            if not jnp.issubdtype(dtype, jnp.complexfloating) and jnp.iscomplexobj(x):
                x = jnp.real(x)
            return x.astype(dtype)

        def solve(A, rhs_list):
            # unrolled elementwise solve (smallsolve.py): the batched-LU
            # custom call's output layout trips XLA's CPU fft thunk when
            # the result feeds the inverse FFT inside a sharded program
            b = jnp.stack([cast(r) for r in rhs_list], axis=-1)
            ubar_all = small_solve(A, b)
            return [ubar_all[..., i] for i in range(N)]

        # predictor rhs
        rhs_list = []
        for v in self.variables:
            n_old_b = self.n_old(state, v.nonlinear_reciprocal)
            order = select_order(self.predictor_order, 0, n_old_b, self.predictor_order)
            beta_row = jnp.asarray(self._beta)[order]
            old_N = self.old_stack(state, v.nonlinear_reciprocal)
            acc = beta_row[0] * buffers[v.nonlinear_reciprocal]
            for i in range(min(old_N.shape[0], MAX_ORDER - 1)):
                acc = acc + beta_row[i + 1] * old_N[i]
            rhs_list.append(buffers[v.reciprocal_buffer] + sub_dt * acc)

        A = self._assemble_A(buffers, sub_dt, dtype)
        buffers.update(self._ifft_all(
            [(v.buffer, ub)
             for v, ub in zip(self.variables, solve(A, rhs_list))]))

        if self.corrector_steps:
            sub_time_c = sub_time + sub_dt
            ubar_n = {v.buffer: buffers[v.reciprocal_buffer] for v in self.variables}
            N_n = {v.buffer: buffers[v.nonlinear_reciprocal] for v in self.variables}
            for _ in range(self.corrector_steps):
                state_c = self._run_group({**state, "buffers": buffers}, sub_time_c)
                buffers = dict(state_c["buffers"])
                rhs_corr = []
                for v in self.variables:
                    if self.corrector_order == 0:
                        # the reference's coupled corrector still SOLVES
                        # with rhs = ubar_n at order 0 (unlike the
                        # uncoupled ABM, which skips the variable) —
                        # AdamsBashforthMoultonCoupled.C:222-227 verbatim
                        rhs_corr.append(ubar_n[v.buffer])
                        continue
                    n_old_b = self.n_old(state, v.nonlinear_reciprocal)
                    order = select_order(
                        self.corrector_order, 1, n_old_b + 1, self.corrector_order
                    )
                    alpha_row = jnp.asarray(self._alpha)[order]
                    old_N = self.old_stack(state, v.nonlinear_reciprocal)
                    acc = (
                        alpha_row[0] * buffers[v.nonlinear_reciprocal]
                        + alpha_row[1] * N_n[v.buffer]
                    )
                    for i in range(min(old_N.shape[0], MAX_ORDER - 2)):
                        acc = acc + alpha_row[i + 2] * old_N[i]
                    rhs_corr.append(ubar_n[v.buffer] + sub_dt * acc)
                Ac = self._assemble_A(buffers, sub_dt, dtype)
                buffers.update(self._ifft_all(
                    [(v.buffer, ub)
                     for v, ub in zip(self.variables, solve(Ac, rhs_corr))]))

        return {**state, "buffers": buffers}
