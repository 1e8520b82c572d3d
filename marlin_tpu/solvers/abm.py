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

import jax
import jax.numpy as jnp
import numpy as np

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
    # NOTE: textbook AB5 leads with 1901/720; 190/720 is the REFERENCE's
    # own table (AdamsBashforthMoulton.C:72) and is kept verbatim for
    # parity (golds cover orders 1-4; order 5 inherits the upstream typo)
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
        self._beta = np.asarray(BETA)
        self._alpha = np.asarray(ALPHA)
        # marlin_tpu extension (perf): run all but the last substep of each
        # step as fused Pallas passes (pallas_spectral.py); requires
        # carry_reciprocal and fft_backend = PALLAS, pattern-matched at
        # first use with a named error otherwise
        self.fused_spectral = params.get_bool("fused_spectral", False)
        self._fused_plan = None
        if self.fused_spectral and not self.carry_reciprocal:
            params.error(
                "fused_spectral", "requires carry_reciprocal = true"
            )
        # NOTE (r03, measured): no carry-precision hardening is needed.
        # The f32 carry trajectory IS the accurate one — 2a at t=133.5
        # gives F = 871.261 (carry-f32) vs 871.268 (f64 truth) vs 918.597
        # (recompute-f32: the per-substep fft(ifft(.)) round-trip injects
        # noise that retards coarsening).  Hermitian re-projection,
        # complex128 carry, and two-float compensated carry were all
        # prototyped and measured trajectory-neutral; see PERF.md.

    def group_evals_per_step(self):
        return self.substeps * (1 + self.corrector_steps)

    def step(self, state, t, dt, dt_old, first_step):
        if not self.fused_spectral or self.substeps <= 1:
            return super().step(state, t, dt, dt_old, first_step)
        return self._fused_step(state, t, dt, dt_old, first_step)

    def _fused_step(self, state, t, dt, dt_old, first_step):
        """Substeps 0..n-2 via pallas_spectral.ch_substep (ū and N̄ carried
        as planar f32 pairs); the final substep runs the regular jnp chain
        so the state pytree matches the unfused path."""
        from .. import pallas_spectral as ps
        from .base import advance_state

        if self._fused_plan is None:
            self._fused_plan = ps.match_chain(self)
        plan = self._fused_plan
        if state["old_dt"].shape[0] > 1 or any(
            s.shape[0] != 1 for s in state["old"].values()
        ):
            raise ps.SpectralChainError(
                "fused_spectral = true supports history depth 1 only"
            )
        # depth-0 (AB1: predictor_order = corrector_order = 1) is fine —
        # beta1 is 0 at order 0, so the history term never contributes.
        # History on the carried pair (N̄ and u itself) is exact: both stay
        # current through the fused loop and the single advance before the
        # trailing jnp substep pushes the same values the unfused per-
        # substep advances would have (e.g. 1a's Terminator change pp needs
        # old[u]).  Other buffers go stale during the fused substeps, so
        # history on them is rejected.
        multi = isinstance(plan, ps.SpectralPlanMulti)
        hist_ok = (set(plan.nonlinears) | set(plan.buffers)) if multi else (
            {plan.nonlinear, plan.buffer})
        if not set(state["old"]) <= hist_ok:
            raise ps.SpectralChainError(
                f"fused_spectral = true supports old-state history on "
                f"{sorted(hist_ok)} only (got {sorted(state['old'])})"
            )

        dom = self.domain
        first_step = jnp.asarray(first_step, bool)
        dt = jnp.asarray(dt)
        sub_dt = (dt / self.substeps).astype(jnp.float32)
        dt_changed = dt != jnp.asarray(dt_old)
        n_adv0 = state["n_advances"]
        nx = plan.shape[0]
        L = 1
        for s in plan.shape[1:]:
            L *= s
        sharded = dom.mesh is not None

        buffers = dict(state["buffers"])
        if multi:
            # stacked (N, ...) carries; stack/unstack happens once per step.
            # Sharded runs keep the 3-D planar layout (the slab kernels and
            # all_to_alls address spatial axes); serial flattens to (nx, L).
            c = jnp.stack([buffers[n].astype(jnp.float32)
                           for n in plan.buffers])
            cbars = [dom.fft(c[i]) for i in range(len(plan.buffers))]
            flat = (lambda a: a) if sharded else (lambda a: a.reshape(nx, L))
            cr = jnp.stack([flat(jnp.real(b).astype(jnp.float32))
                            for b in cbars])
            ci = jnp.stack([flat(jnp.imag(b).astype(jnp.float32))
                            for b in cbars])
            nr = jnp.stack([flat(jnp.real(buffers[n]).astype(jnp.float32))
                            for n in plan.nonlinears])
            ni = jnp.stack([flat(jnp.imag(buffers[n]).astype(jnp.float32))
                            for n in plan.nonlinears])
        else:
            c = buffers[plan.buffer].astype(jnp.float32)
            # carry_reciprocal seed: ū = fft(u) once per step
            cbar = dom.fft(c)
            flat = (lambda a: a) if sharded else (lambda a: a.reshape(nx, L))
            cr = flat(jnp.real(cbar).astype(jnp.float32))
            ci = flat(jnp.imag(cbar).astype(jnp.float32))
            # the history slot equals buffers[N̄] here: the step-level advance
            # just pushed it (and on the first MOOSE step both are zeros while
            # the order selection forces β₁ = 0, so history never enters) —
            # which makes the per-substep history push a pure carry rebinding
            n_cur = buffers[plan.nonlinear]
            nr = flat(jnp.real(n_cur).astype(jnp.float32))
            ni = flat(jnp.imag(n_cur).astype(jnp.float32))
        beta = jnp.asarray(self._beta, jnp.float32)
        alpha = jnp.asarray(self._alpha, jnp.float32)
        zero = jnp.zeros((), jnp.float32)

        def make_body(substep_fn, sub_dt, first_step, dt_changed, n_adv0):
            # all traced scalars arrive as parameters: the sharded path calls
            # this inside shard_map, whose body must not close over tracers
            def body(s, carry):
                c, cr, ci, nr_prev, ni_prev = carry
                # AB order selection (substep(), reference :88-91)
                n_adv = n_adv0 + jnp.where(first_step, 0, s)
                n_old_b = jnp.minimum(n_adv, 1)
                cond = (s < self.predictor_order) & dt_changed
                order = jnp.minimum(
                    jnp.where(cond, 0, n_old_b), self.predictor_order
                )
                b_row = beta[order]
                scal = jnp.stack([sub_dt, b_row[0], b_row[1], zero]).reshape(1, 4)
                # predictor: the kernel's N output is the substep-start group
                # evaluation (N_n in the corrector's terms)
                c2, ur, ui, nr2, ni2 = substep_fn(
                    c, cr, ci, nr_prev, ni_prev, scal
                )
                if self.corrector_steps:
                    # Adams-Moulton corrector (substep(), reference :118-186):
                    # the SAME fused chain with ū base = pre-predictor ū
                    # (cr/ci), b0 → α0 (on the fresh N̄ of the corrected
                    # field) and b1 → α1 (on the frozen N_n)
                    cond_c = (s < self.corrector_order) & dt_changed
                    order_c = jnp.minimum(
                        jnp.where(cond_c, 1, n_old_b + 1), self.corrector_order
                    )
                    a_row = alpha[order_c]
                    scal_c = jnp.stack(
                        [sub_dt, a_row[0], a_row[1], zero]
                    ).reshape(1, 4)
                    nn_r, nn_i = nr2, ni2  # N_n, frozen across corrector steps
                    for _ in range(self.corrector_steps):
                        c3, ur2, ui2, nr3, ni3 = substep_fn(
                            c2, cr, ci, nn_r, nn_i, scal_c
                        )
                        # reference corrector_order == 0 (order-1 deck): the
                        # group still re-evaluates (N̄ updates) but ū/u stay
                        nr2, ni2 = nr3, ni3
                        if self.corrector_order > 0:
                            c2, ur, ui = c3, ur2, ui2
                return (c2, ur, ui, nr2, ni2)

            return body

        if sharded:
            # distributed fused loop: the whole substep sequence runs inside
            # ONE shard_map over the slab mesh; carries stay local planar
            # blocks and each substep does exactly two planar all_to_alls
            import numpy as _np
            from jax.sharding import PartitionSpec as P
            from .. import parallel

            p = dict(zip(dom.mesh.axis_names, dom.mesh.devices.shape))["sp"]
            nxl = nx // p
            ny, nz = plan.shape[1], plan.shape[2]
            kx2g = jnp.asarray(
                (dom._np_raxes[0] ** 2).astype(_np.float32))
            ky2 = jnp.asarray(
                (dom._np_raxes[1] ** 2).reshape(ny, 1).astype(_np.float32))
            kz2 = jnp.asarray(
                (dom._np_raxes[2] ** 2).astype(_np.float32))

            def loop_fn(c, cr, ci, nr, ni, sub_dt_, first_step_, dt_changed_,
                        n_adv0_):
                xoff = jax.lax.axis_index("sp") * nxl
                kxz2_loc = (
                    jax.lax.dynamic_slice(kx2g, (xoff,), (nxl,))[:, None, None]
                    + kz2[None, None, :]
                )
                if multi:
                    substep_fn = (lambda c_, a, b, nr_, ni_, scal:
                                  ps.ch_substep_sharded_multi(
                                      c_, a, b, nr_, ni_, scal, plan,
                                      ky2, kxz2_loc))
                else:
                    substep_fn = (lambda c_, a, b, nr_, ni_, scal:
                                  ps.ch_substep_sharded(
                                      c_, a, b, nr_, ni_, scal, plan,
                                      ky2, kxz2_loc))
                body = make_body(
                    substep_fn, sub_dt_, first_step_, dt_changed_, n_adv0_,
                )
                return jax.lax.fori_loop(
                    0, self.substeps - 1, body, (c, cr, ci, nr, ni)
                )

            rspec = parallel.real_spec(dom, 3)
            cspec = parallel.reciprocal_spec(dom, 3)
            if multi:
                # stacked carries: the spatial sharding shifts one axis right
                rspec = P(None, *rspec)
                cspec = P(None, *cspec)
            # sub_dt/first_step/dt_changed/n_adv0 are traced scalars: pass
            # them as replicated args (shard_map bodies cannot close over
            # tracers)
            c, cr, ci, nr, ni = jax.shard_map(
                loop_fn, mesh=dom.mesh,
                in_specs=(rspec, cspec, cspec, cspec, cspec,
                          P(), P(), P(), P()),
                out_specs=(rspec, cspec, cspec, cspec, cspec),
                # pallas_call outputs carry no varying-mesh-axes metadata
                check_vma=False,
            )(c, cr, ci, nr, ni, sub_dt, first_step, dt_changed, n_adv0)
        elif multi:
            body = make_body(
                lambda c_, a, b, nr_, ni_, scal: ps.ch_substep_multi(
                    c_, a, b, nr_, ni_, scal, plan
                ),
                sub_dt, first_step, dt_changed, n_adv0,
            )
            c, cr, ci, nr, ni = jax.lax.fori_loop(
                0, self.substeps - 1, body, (c, cr, ci, nr, ni)
            )
        else:
            body = make_body(
                lambda c_, a, b, nr_, ni_, scal: ps.ch_substep(
                    c_, a, b, nr_, ni_, scal, plan
                ),
                sub_dt, first_step, dt_changed, n_adv0,
            )
            c, cr, ci, nr, ni = jax.lax.fori_loop(
                0, self.substeps - 1, body, (c, cr, ci, nr, ni)
            )

        shape = plan.shape
        if multi:
            for i, name in enumerate(plan.buffers):
                buffers[name] = c[i].astype(dom.dtype)
                buffers[plan.reciprocals[i]] = (
                    cr[i] + 1j * ci[i]).reshape(shape).astype(dom.cdtype)
                buffers[plan.nonlinears[i]] = (
                    nr[i] + 1j * ni[i]).reshape(shape).astype(dom.cdtype)
        else:
            buffers[plan.buffer] = c.astype(dom.dtype)
            buffers[plan.reciprocal] = (cr + 1j * ci).reshape(shape).astype(dom.cdtype)
            buffers[plan.nonlinear] = (nr + 1j * ni).reshape(shape).astype(dom.cdtype)
        st = {**state, "buffers": buffers}
        # the skipped in-loop advances (s = 1..substeps-2); the final
        # substep's advance below refreshes the depth-1 old/old_dt slots
        skipped = jnp.where(first_step, 0, self.substeps - 2)
        st = {**st, "n_advances": st["n_advances"] + skipped}

        # final substep through the regular jnp chain (base.step body, s = n-1)
        st = jax.lax.cond(
            jnp.logical_not(first_step),
            lambda x: advance_state(x, dt),
            lambda x: x,
            st,
        )
        s_last = self.substeps - 1
        return self.substep(
            st, t + s_last * sub_dt, sub_dt, dt, dt_old, s_last, first_step
        )

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
            final_ubar[v.buffer] = ubar
        buffers.update(self._ifft_all(list(final_ubar.items())))

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
                    final_ubar[v.buffer] = ubar
                # every variable was just rewritten, so final_ubar IS this
                # pass's corrected spectra
                buffers.update(self._ifft_all(list(final_ubar.items())))

        if self.carry_reciprocal:
            # the pruned ForwardFFT's role: next substep reads ū directly
            for v in self.variables:
                buffers[v.reciprocal_buffer] = final_ubar[v.buffer]

        return {**state, "buffers": buffers}
