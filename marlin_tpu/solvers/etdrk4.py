"""4th-order exponential time differencing (ETDRK4) solver.

Re-design of reference ETDRK4Solver (src/tensor_solver/ETDRK4Solver.C:29-122)
with identical stage math and the L→0 limit guards (phi1=dt, phi2=dt²/2,
phi3=dt²/6 where L·dt == 0, reference :84-91).

The reference's phi1 and L→0 limits deviate from Cox & Matthews (2002)
(its f1 numerator drops the Ldt² terms; the true L→0 limit of every f is
dt/6) — harmless for the shipped purely-linear deck, but divergent
(phi1 ~ 1/(L·dt)) for nonlinear decks with long-wavelength modes.
`cox_matthews = true` opts into the corrected coefficients with
cancellation-safe Taylor evaluation near L·dt = 0.
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
        # no old-state reads: the 4 stages live inside one substep
        # (reference getVariables(0), ETDRK4Solver.C:33)
        self.cox_matthews = params.get_bool("cox_matthews", False)

    def group_evals_per_step(self):
        # initial evaluation + 3 stage re-evaluations per substep
        return self.substeps * 4

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
            if self.cox_matthews:
                p1, p2, p3 = _cox_matthews_phis(Ldt, eL, sub_dt)
            else:
                denom = Ldt * Ldt * Ldt
                # REFERENCE-EXACT phi tables (ETDRK4Solver.C:80-92),
                # including two deviations from the Cox-Matthews (2002)
                # f1/f3 and the L->0 limits {dt, dt^2/2, dt^2/6}
                # (Cox-Matthews: dt/6 each).  Kept verbatim for parity —
                # the shipped reference deck (etdrk4_diffusion.i) is purely
                # linear so only exp(Ldt) matters there.
                p1 = sub_dt * (-4.0 - 3.0 * Ldt + eL * (4.0 - Ldt)) / denom
                p2 = sub_dt * (2.0 + Ldt + eL * (-2.0 + Ldt)) / denom
                p3 = sub_dt * (-4.0 - 3.0 * Ldt - Ldt * Ldt
                               + eL * (4.0 - Ldt)) / denom
                zero = Ldt == 0.0
                p1 = jnp.where(zero, sub_dt, p1)
                p2 = jnp.where(zero, sub_dt * sub_dt / 2.0, p2)
                p3 = jnp.where(zero, sub_dt * sub_dt / 6.0, p3)
            expLdt.append(eL)
            expHalf.append(jnp.exp(Ldt / 2.0))
            phi1.append(p1)
            phi2.append(p2)
            phi3.append(p3)

        n = len(self.variables)
        if self.cox_matthews:
            # Cox-Matthews stages weight N by (h/2)·phi1(Lh/2), not the
            # reference's bare h/2 (which is only first-order in Lh and
            # degrades the full scheme to 2nd order), and the c stage
            # builds on a_n with 2N(b) − N(u_n)
            Q = [_phi1_half(linear[i] * sub_dt, sub_dt) for i in range(n)]
            ubar_a = [expHalf[i] * ubar_n[i] + Q[i] * nonlinear1[i]
                      for i in range(n)]
            nonlinear2 = eval_nonlinear(ubar_a)
            ubar_b = [expHalf[i] * ubar_n[i] + Q[i] * nonlinear2[i]
                      for i in range(n)]
            nonlinear3 = eval_nonlinear(ubar_b)
            ubar_c = [expHalf[i] * ubar_a[i]
                      + Q[i] * (2.0 * nonlinear3[i] - nonlinear1[i])
                      for i in range(n)]
            nonlinear4 = eval_nonlinear(ubar_c)
        else:
            ubar_b = [
                expHalf[i] * ubar_n[i] + 0.5 * sub_dt * nonlinear1[i]
                for i in range(n)
            ]
            nonlinear2 = eval_nonlinear(ubar_b)
            ubar_c = [
                expHalf[i] * ubar_n[i] + 0.5 * sub_dt * nonlinear2[i]
                for i in range(n)
            ]
            nonlinear3 = eval_nonlinear(ubar_c)
            ubar_d = [
                expLdt[i] * ubar_n[i] + sub_dt * nonlinear3[i]
                for i in range(n)
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


def _phi1_half(Ldt, sub_dt):
    """(h/2)·phi1(Lh/2) with phi1(w) = (e^w − 1)/w — the Cox-Matthews
    stage weight; series below the cancellation radius."""
    w = Ldt / 2.0
    closed = (jnp.exp(w) - 1.0) / jnp.where(w == 0.0, 1.0, w)
    series = 1.0 + w / 2.0 + w * w / 6.0 + w * w * w / 24.0
    radius = 1e-4 if w.dtype == jnp.float64 else 1e-2
    return 0.5 * sub_dt * jnp.where(jnp.abs(w) < radius, series, closed)


def _cox_matthews_phis(Ldt, eL, sub_dt):
    """Cox & Matthews (2002) eq. 26 f1/f2/f3 with cancellation-safe Taylor
    evaluation where |L·dt| is small (the closed forms lose ~3·log10(1/z)
    digits to cancellation; cf. Kassam & Trefethen 2005)."""
    z = Ldt
    z2, z3, z4 = z * z, z * z * z, z * z * z * z
    denom = jnp.where(z3 == 0.0, 1.0, z3)
    f1 = sub_dt * (-4.0 - z + eL * (4.0 - 3.0 * z + z2)) / denom
    f2 = sub_dt * (2.0 + z + eL * (-2.0 + z)) / denom
    f3 = sub_dt * (-4.0 - 3.0 * z - z2 + eL * (4.0 - z)) / denom
    # Taylor series about z = 0 (through z^4: relative error < 1e-4 at the
    # f32 switch radius 0.35, < 1e-10 at the f64 radius 1e-2; the closed
    # form has comparable round-off error AT the radius and rapidly worse
    # inside it)
    t1 = sub_dt * (1.0 / 6.0 + z / 6.0 + 3.0 * z2 / 40.0
                   + z3 / 45.0 + 5.0 * z4 / 1008.0)
    t2 = sub_dt * (1.0 / 6.0 + z / 12.0 + z2 / 40.0
                   + z3 / 180.0 + z4 / 1008.0)
    t3 = sub_dt * (1.0 / 6.0 - z2 / 120.0 - z3 / 360.0 - z4 / 1680.0)
    radius = 1e-2 if z.dtype == jnp.float64 else 0.35
    small = jnp.abs(z) < radius
    return (jnp.where(small, t1, f1), jnp.where(small, t2, f2),
            jnp.where(small, t3, f3))
