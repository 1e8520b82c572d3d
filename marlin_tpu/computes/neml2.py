"""NEML2-equivalent constitutive-model path.

The reference wraps the NEML2 constitutive-model library: a NEML2 HIT input
file declares [Models], and NEML2TensorCompute maps marlin buffers onto the
model's input/output variables (reference
src/tensor_computes/NEML2TensorCompute.C:1-120, test/tests/neml2/).

marlin_tpu implements the same deck surface with a pure-JAX model registry —
a documented SUBSET of NEML2's model zoo covering the shipped test decks and
the common algebra models.  Each model is a pure function over named
variables (`forces/A`, `state/C`, ...), evaluated on-device inside the
jitted compute graph.  Unknown model types raise a clear error naming the
divergence."""

from __future__ import annotations

import os
from typing import Dict, List

import jax.numpy as jnp

from ..params import Params
from ..registry import computes
from ..smallsolve import small_solve
from .base import ComputeError, TensorCompute


class NEML2Error(Exception):
    pass


class _NEML2Model:
    def __init__(self, name: str, params: Params):
        self.name = name

    def forward(self, env: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError


def _float_or_var(params, key, required=True):
    """Parameters that accept a float literal OR a variable name (e.g. a
    temperature-dependent quantity produced by a sibling model).  Returns
    (var_name_or_None, float_or_None)."""
    raw = params.get_str(key, required=required)
    try:
        return None, float(raw)
    except ValueError:
        return raw, None


def _safe_pow(x, n):
    """x**n for x >= 0 with a FINITE jvp at x = 0 (the pow's derivative
    blows up there for n < 1, and an inf Jacobian column NaNs the whole
    grid inside ImplicitUpdate — r04 advisor finding).  Double-where
    construction: the primal stays exact (0**n = 0) while the pow always
    sees a positive floor, so at x <= floor both maximum() and where()
    route the tangent to the constant side.  Callers feeding signed
    quantities take |x| (and re-apply the sign) or clamp first."""
    x_safe = jnp.maximum(x, 1e-12)
    return jnp.where(x > 0.0, x_safe ** n, 0.0)


class ScalarMultiplication(_NEML2Model):
    """to_var = coefficient * Π from_var (NEML2 ScalarMultiplication;
    `reciprocal` flags invert individual factors)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.from_var = params.get_str_vector("from_var", required=True)
        self.to_var = params.get_str("to_var", required=True)
        self.coefficient = params.get_float("coefficient", 1.0)
        from ..params import _BOOL_FALSE, _BOOL_TRUE

        recip = params.get_str_vector("reciprocal", [])
        for r in recip:
            if r.lower() not in _BOOL_TRUE | _BOOL_FALSE:
                params.error("reciprocal", f"cannot parse '{r}' as a bool")
        self.reciprocal = [r.lower() in _BOOL_TRUE for r in recip] or [
            False
        ] * len(self.from_var)
        if len(self.reciprocal) != len(self.from_var):
            params.error("reciprocal", "one flag per from_var")

    def forward(self, env):
        out = jnp.asarray(self.coefficient)
        for v, rec in zip(self.from_var, self.reciprocal):
            out = out / env[v] if rec else out * env[v]
        return {self.to_var: out}


class ScalarLinearCombination(_NEML2Model):
    """to_var = Σ coefficient_i * from_var_i (NEML2 ScalarLinearCombination)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.from_var = params.get_str_vector("from_var", required=True)
        self.to_var = params.get_str("to_var", required=True)
        self.coefficients = params.get_float_vector(
            "coefficients", [1.0] * len(self.from_var)
        )
        if len(self.coefficients) != len(self.from_var):
            params.error("coefficients", "one coefficient per from_var")

    def forward(self, env):
        out = None
        for c, v in zip(self.coefficients, self.from_var):
            term = c * env[v]
            out = term if out is None else out + term
        return {self.to_var: out}


class ScalarParameterToState(_NEML2Model):
    """to_var = value (NEML2 ScalarParameterToState: constant parameter)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.to_var = params.get_str("to_var", required=True)
        self.value = params.get_float("value", required=True)

    def forward(self, env):
        return {self.to_var: jnp.asarray(self.value)}


class LinearIsotropicElasticity(_NEML2Model):
    """S = 3K·vol(E) + 2G·dev(E) on Mandel-notation SR2 fields (trailing
    axis 6: [xx, yy, zz, √2·yz, √2·xz, √2·xy]) — NEML2's
    LinearIsotropicElasticity (solid_mechanics/elasticity).  `coefficients`
    + `coefficient_types` accept YOUNGS_MODULUS/POISSONS_RATIO or
    BULK_MODULUS/SHEAR_MODULUS pairs; `compliance = true` inverts the map
    (stress -> strain)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.strain = params.get_str("strain", "forces/E")
        self.stress = params.get_str("stress", "state/S")
        self.compliance = params.get_bool("compliance", False)
        coeffs = params.get_float_vector("coefficients", required=True)
        types = params.get_str_vector("coefficient_types", required=True)
        if len(coeffs) != 2 or len(types) != 2:
            params.error("coefficients",
                         "exactly two (value, type) pairs are supported")
        vals = dict(zip([t.upper() for t in types], coeffs))
        if {"YOUNGS_MODULUS", "POISSONS_RATIO"} <= set(vals):
            E, nu = vals["YOUNGS_MODULUS"], vals["POISSONS_RATIO"]
            self.K = E / (3.0 * (1.0 - 2.0 * nu))
            self.G = E / (2.0 * (1.0 + nu))
        elif {"BULK_MODULUS", "SHEAR_MODULUS"} <= set(vals):
            self.K, self.G = vals["BULK_MODULUS"], vals["SHEAR_MODULUS"]
        else:
            params.error(
                "coefficient_types",
                "supported pairs: YOUNGS_MODULUS+POISSONS_RATIO or "
                f"BULK_MODULUS+SHEAR_MODULUS (got {types})")
        self.from_var = [self.stress if self.compliance else self.strain]
        self.to_var = self.strain if self.compliance else self.stress

    def forward(self, env):
        x = env[self.from_var[0]]
        if x.shape[-1] != 6:
            raise NEML2Error(
                f"LinearIsotropicElasticity '{self.name}' expects a Mandel "
                f"SR2 field (trailing axis 6), got shape {x.shape}")
        tr = x[..., 0] + x[..., 1] + x[..., 2]
        vol = (tr / 3.0)[..., None] * jnp.asarray(
            [1.0, 1.0, 1.0, 0.0, 0.0, 0.0], x.dtype)
        dev = x - vol
        if self.compliance:  # strain from stress: E = vol(S)/3K + dev(S)/2G
            out = vol / (3.0 * self.K) + dev / (2.0 * self.G)
        else:
            out = 3.0 * self.K * vol + 2.0 * self.G * dev
        return {self.to_var: out}


class SR2Invariant(_NEML2Model):
    """Scalar invariant of a Mandel SR2 field — NEML2's SR2Invariant.
    VONMISES = sqrt(3/2 · dev(S):dev(S)) (the Mandel 6-vector dot product
    IS the full double contraction), I1 = trace, I2 = ½(tr²−tr(S²)),
    EFFECTIVE_STRAIN = sqrt(2/3 · S:S)."""

    TYPES = ("VONMISES", "I1", "I2", "EFFECTIVE_STRAIN")

    def __init__(self, name, params):
        super().__init__(name, params)
        self.tensor = params.get_str("tensor", "state/S")
        self.to_var = params.get_str("invariant", "state/s")
        self.invariant_type = params.get_str(
            "invariant_type", required=True).upper()
        if self.invariant_type not in self.TYPES:
            params.error("invariant_type",
                         f"supported: {self.TYPES} (got {self.invariant_type})")
        self.from_var = [self.tensor]

    def forward(self, env):
        s = env[self.tensor]
        tr = s[..., 0] + s[..., 1] + s[..., 2]
        if self.invariant_type == "I1":
            out = tr
        elif self.invariant_type == "I2":
            s_contract = jnp.sum(s * s, axis=-1)  # tr(S²) in Mandel
            out = 0.5 * (tr * tr - s_contract)
        elif self.invariant_type == "EFFECTIVE_STRAIN":
            out = jnp.sqrt(2.0 / 3.0 * jnp.sum(s * s, axis=-1))
        else:  # VONMISES
            vol = (tr / 3.0)[..., None] * jnp.asarray(
                [1.0, 1.0, 1.0, 0.0, 0.0, 0.0], s.dtype)
            dev = s - vol
            out = jnp.sqrt(1.5 * jnp.sum(dev * dev, axis=-1))
        return {self.to_var: out}


class ScalarForwardEulerTimeIntegration(_NEML2Model):
    """s = s_old + ṡ·(t − t_old) — NEML2's forward-Euler rate-form
    integration (ForwardEulerTimeIntegration<Scalar>).  Variables follow
    NEML2's axis convention: the target lives on state/<var>, its rate on
    state/<var>_rate, the previous value on old_state/<var>, and times on
    forces/t and old_forces/t."""

    def __init__(self, name, params):
        super().__init__(name, params)
        var = params.get_str("variable", required=True)
        self.to_var = var if "/" in var else f"state/{var}"
        # NEML2 axis convention: the rate lives at <var>_rate and the
        # previous value on the old_state axis with the FULL sub-path
        # preserved (state/internal/ep -> old_state/internal/ep)
        self.rate = f"{self.to_var}_rate"
        self.old = "old_" + self.to_var
        self.t = params.get_str("time", "forces/t")
        self.t_old = f"old_{self.t}"
        self.from_var = [self.rate, self.old, self.t, self.t_old]

    def forward(self, env):
        return {self.to_var: env[self.old]
                + env[self.rate] * (env[self.t] - env[self.t_old])}


class SR2LinearCombination(_NEML2Model):
    """to_var = Σ coefficient_i · from_var_i on Mandel SR2 fields (NEML2
    SR2LinearCombination — e.g. elastic strain = total − plastic)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.from_var = params.get_str_vector("from_var", required=True)
        self.to_var = params.get_str("to_var", required=True)
        self.coefficients = params.get_float_vector(
            "coefficients", [1.0] * len(self.from_var))
        if len(self.coefficients) != len(self.from_var):
            params.error("coefficients", "one coefficient per from_var")

    def forward(self, env):
        out = None
        for c, v in zip(self.coefficients, self.from_var):
            term = c * env[v]
            out = term if out is None else out + term
        return {self.to_var: out}


class VoceIsotropicHardening(_NEML2Model):
    """Isotropic hardening k(ep) = R·(1 − exp(−d·ep)) from the equivalent
    plastic strain (NEML2 VoceIsotropicHardening,
    solid_mechanics/flow_rule)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.R = params.get_float("saturated_hardening", required=True)
        self.d = params.get_float("saturation_rate", required=True)
        self.ep = params.get_str("equivalent_plastic_strain",
                                 "state/internal/ep")
        self.to_var = params.get_str("isotropic_hardening",
                                     "state/internal/k")
        self.from_var = [self.ep]

    def forward(self, env):
        return {self.to_var: self.R * (1.0 - jnp.exp(-self.d * env[self.ep]))}


class LinearIsotropicHardening(_NEML2Model):
    """k(ep) = K·ep (NEML2 LinearIsotropicHardening)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.K = params.get_float("hardening_modulus", required=True)
        self.ep = params.get_str("equivalent_plastic_strain",
                                 "state/internal/ep")
        self.to_var = params.get_str("isotropic_hardening",
                                     "state/internal/k")
        self.from_var = [self.ep]

    def forward(self, env):
        return {self.to_var: self.K * env[self.ep]}


class PerzynaPlasticFlowRate(_NEML2Model):
    """Perzyna viscoplastic flow rate γ̇ = (⟨f⟩/η)^n with overstress
    f = stress_measure − yield (NEML2 PerzynaPlasticFlowRate); ⟨.⟩ is the
    Macaulay bracket.  Combine with SR2Invariant (von Mises), a hardening
    model, and ScalarForwardEulerTimeIntegration to build the standard
    rate-form chain.  `reference_stress` and `exponent` accept a float
    literal OR a variable name, so the Kocks-Mecking pair
    (KocksMeckingFlowViscosity η, KocksMeckingRateSensitivity n) drives
    temperature-dependent viscoplasticity without a new model type.  The
    pow uses a safe floor at ⟨f⟩ = 0 when n is a VARIABLE: a variable
    exponent can sit below 1 somewhere on the grid, where 0^n has an
    infinite jvp that would NaN ImplicitUpdate Jacobians (constant
    n ≥ 1, the common case, keeps the exact primal-and-tangent pow)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.eta_var, self.eta = _float_or_var(params, "reference_stress")
        self.n_var, self.n = _float_or_var(params, "exponent")
        self.f = params.get_str("flow_function", "state/internal/fp")
        self.to_var = params.get_str("flow_rate",
                                     "state/internal/gamma_rate")
        self.from_var = [self.f] + [v for v in (self.eta_var, self.n_var)
                                    if v]

    def forward(self, env):
        eta = env[self.eta_var] if self.eta_var else self.eta
        n = env[self.n_var] if self.n_var else self.n
        over = jnp.maximum(env[self.f], 0.0) / eta
        if self.n_var is None:
            return {self.to_var: over ** n}
        return {self.to_var: _safe_pow(over, n)}


class YieldFunction(_NEML2Model):
    """f = stress_measure − σy − k (NEML2 solid_mechanics YieldFunction):
    the overstress fed to a flow-rate model or the consistency condition of
    a rate-independent return map.  `isotropic_hardening` is optional (perfect
    plasticity without it)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.sy = params.get_float("yield_stress", required=True)
        self.sm = params.get_str("stress_measure", "state/internal/sm")
        self.k = params.get_str("isotropic_hardening", "")
        self.to_var = params.get_str("yield_function", "state/internal/fp")
        self.from_var = [self.sm] + ([self.k] if self.k else [])

    def forward(self, env):
        f = env[self.sm] - self.sy
        if self.k:
            f = f - env[self.k]
        return {self.to_var: f}


class ComposedModel(_NEML2Model):
    """Dependency-ordered composition of sibling [Models] (NEML2
    ComposedModel): sub-model outputs feed later sub-models' inputs; the
    composite's from_var is every input no sibling produces, and every
    produced variable is exposed as an output."""

    def __init__(self, name, params):
        super().__init__(name, params)
        names = params.get_str_vector("models", required=True)
        root = params.node.parent  # the [Models] block
        subs = []
        for n in names:
            node = root.children.get(n)
            if node is None:
                raise NEML2Error(
                    f"ComposedModel '{name}': sub-model '{n}' not found "
                    f"(available: {sorted(root.children)})")
            sp = Params(node)
            mtype = sp.get_str("type", required=True)
            if mtype not in _MODEL_TYPES:
                raise NEML2Error(
                    f"ComposedModel '{name}': sub-model '{n}' has "
                    f"unsupported type '{mtype}'")
            subs.append(_MODEL_TYPES[mtype](n, sp))
        produced = set()
        for m in subs:
            to = m.to_var if isinstance(m.to_var, (list, tuple)) else [m.to_var]
            produced.update(to)
        self.models = subs
        self.from_var = sorted(
            {v for m in subs for v in getattr(m, "from_var", [])} - produced)
        self.to_var = sorted(produced)

    def forward(self, env):
        env = dict(env)
        pending = list(self.models)
        out = {}
        while pending:
            progressed = False
            for m in list(pending):
                if all(v in env for v in getattr(m, "from_var", [])):
                    res = m.forward(env)
                    env.update(res)
                    out.update(res)
                    pending.remove(m)
                    progressed = True
            if not progressed:
                missing = {m.name: [v for v in getattr(m, "from_var", [])
                                    if v not in env] for m in pending}
                raise NEML2Error(
                    f"ComposedModel '{self.name}': unresolvable inputs "
                    f"{missing} (cycle or unmapped variable)")
        return out


class J2RadialReturn(_NEML2Model):
    """Rate-independent J2 (von Mises) plasticity via the radial-return map
    with isotropic hardening — the composed solve NEML2 builds from
    ImplicitUpdate(Newton) over {LinearIsotropicElasticity, SR2Invariant
    VONMISES, YieldFunction, AssociativeIsotropicPlasticHardening,
    ForwardEulerTimeIntegration} (reference wraps any such NEML2 system via
    src/tensor_computes/NEML2TensorCompute.C); marlin_tpu ships it as one
    pure-JAX model with a vectorized `lax.while_loop` Newton on the plastic
    multiplier (the scalar consistency condition the radial return reduces
    J2 to).

    Inputs: forces/E (Mandel SR2 total strain), old_state/internal/Ep,
    old_state/internal/ep.  Outputs: state/S, state/internal/Ep,
    state/internal/ep.  Hardening: `hardening_modulus` H (linear k = H·ep),
    or `saturated_hardening` R + `saturation_rate` d (Voce
    k = R(1−exp(−d·ep))), or neither (perfect plasticity).

    Return map: S_trial = C:(E − Ep_old); f_trial = σvm_trial − σy − k(ep_old);
    where f_trial > 0 solve R(Δep) = σvm_trial − 3G·Δep − σy − k(ep_old+Δep)
    = 0 (Newton, quadratic; closed form Δep = f_trial/(3G+H) for linear
    hardening is the test oracle), then Ep += Δep·N with
    N = (3/2)·dev(S_trial)/σvm_trial and S = S_trial − 2G·Δep·N."""

    def __init__(self, name, params):
        super().__init__(name, params)
        coeffs = params.get_float_vector("coefficients", required=True)
        types = params.get_str_vector("coefficient_types", required=True)
        vals = dict(zip([t.upper() for t in types], coeffs))
        if {"YOUNGS_MODULUS", "POISSONS_RATIO"} <= set(vals):
            E, nu = vals["YOUNGS_MODULUS"], vals["POISSONS_RATIO"]
            self.K = E / (3.0 * (1.0 - 2.0 * nu))
            self.G = E / (2.0 * (1.0 + nu))
        elif {"BULK_MODULUS", "SHEAR_MODULUS"} <= set(vals):
            self.K, self.G = vals["BULK_MODULUS"], vals["SHEAR_MODULUS"]
        else:
            params.error("coefficient_types",
                         "supported pairs: YOUNGS_MODULUS+POISSONS_RATIO or "
                         f"BULK_MODULUS+SHEAR_MODULUS (got {types})")
        self.sy = params.get_float("yield_stress", required=True)
        self.H = params.get_float("hardening_modulus", 0.0)
        self.R = params.get_float("saturated_hardening", 0.0)
        self.d = params.get_float("saturation_rate", 0.0)
        if self.H and self.R:
            params.error("saturated_hardening",
                         "linear and Voce hardening are exclusive")
        self.abs_tol = params.get_float("absolute_tolerance", 1e-10)
        self.max_its = params.get_int("miter", 50)
        self.strain = params.get_str("strain", "forces/E")
        self.stress = params.get_str("stress", "state/S")
        self.Ep = params.get_str("plastic_strain", "state/internal/Ep")
        self.ep = params.get_str("equivalent_plastic_strain",
                                 "state/internal/ep")
        # optional linear (Prager) kinematic hardening: the return maps on
        # the shifted stress ξ = dev(S_trial) − X_old and the back stress
        # evolves as ΔX = 2/3·Hk·ΔEp (consistency denominator 3G + H + Hk)
        self.Hk = params.get_float("kinematic_hardening_modulus", 0.0)
        self.X = params.get_str("back_stress", "state/internal/X")
        self.old_Ep = "old_" + self.Ep
        self.old_ep = "old_" + self.ep
        self.old_X = "old_" + self.X
        self.from_var = [self.strain, self.old_Ep, self.old_ep]
        self.to_var = [self.stress, self.Ep, self.ep]
        if self.Hk:
            self.from_var.append(self.old_X)
            self.to_var.append(self.X)

    def _k(self, ep):
        if self.H:
            return self.H * ep
        if self.R:
            return self.R * (1.0 - jnp.exp(-self.d * ep))
        return jnp.zeros_like(ep)

    def _kp(self, ep):
        if self.H:
            return jnp.full_like(ep, self.H)
        if self.R:
            return self.R * self.d * jnp.exp(-self.d * ep)
        return jnp.zeros_like(ep)

    def forward(self, env):
        import jax

        E = env[self.strain]
        Ep_old = env[self.old_Ep]
        ep_old = env[self.old_ep]
        if E.shape[-1] != 6:
            raise NEML2Error(
                f"J2RadialReturn '{self.name}' expects Mandel SR2 strain "
                f"(trailing axis 6), got shape {E.shape}")
        Ep_old = jnp.broadcast_to(Ep_old, E.shape)
        ep_old = jnp.broadcast_to(ep_old, E.shape[:-1])
        G, K = self.G, self.K
        vol_mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0], E.dtype)

        Ee = E - Ep_old
        tr = Ee[..., 0] + Ee[..., 1] + Ee[..., 2]
        vol = (tr / 3.0)[..., None] * vol_mask
        dev_e = Ee - vol
        s_dev = 2.0 * G * dev_e  # trial deviatoric stress
        S_trial = 3.0 * K * vol + s_dev
        # with kinematic hardening the map acts on the shifted stress
        # ξ = dev(S_trial) − X_old (X is deviatoric by construction)
        if self.Hk:
            X_old = jnp.broadcast_to(env[self.old_X], E.shape)
            xi = s_dev - X_old
        else:
            xi = s_dev
        svm = jnp.sqrt(jnp.maximum(1.5 * jnp.sum(xi * xi, -1), 0.0))
        f_trial = svm - self.sy - self._k(ep_old)
        plastic = f_trial > 0.0

        # vectorized Newton on the consistency condition (one field-wide
        # lax.while_loop; quadratic, 2-3 iterations for linear, ~4 for Voce)
        def resid(dep):
            return jnp.where(
                plastic, svm - (3.0 * G + self.Hk) * dep - self.sy
                - self._k(ep_old + dep), 0.0)

        def cond(carry):
            dep, r, it = carry
            return jnp.logical_and(it < self.max_its,
                                   jnp.max(jnp.abs(r)) > self.abs_tol)

        def body(carry):
            dep, r, it = carry
            drdx = -3.0 * G - self.Hk - self._kp(ep_old + dep)
            dep = jnp.maximum(dep - r / drdx, 0.0)
            return dep, resid(dep), it + 1

        dep0 = jnp.zeros_like(svm)
        dep, _, _ = jax.lax.while_loop(
            cond, body, (dep0, resid(dep0), jnp.zeros((), jnp.int32)))
        dep = jnp.where(plastic, dep, 0.0)

        # radial-return direction N = 3/2 · ξ/σvm(ξ) (Mandel components);
        # Δep·N has equivalent plastic strain exactly Δep
        N = 1.5 * xi / jnp.where(svm > 0.0, svm, 1.0)[..., None]
        dEp = dep[..., None] * N
        out = {
            self.stress: S_trial - 2.0 * G * dEp,
            self.Ep: Ep_old + dEp,
            self.ep: ep_old + dep,
        }
        if self.Hk:
            out[self.X] = X_old + (2.0 / 3.0) * self.Hk * dEp
        return out


class SR2ForwardEulerTimeIntegration(_NEML2Model):
    """s = s_old + ṡ·(t − t_old) on Mandel SR2 variables — NEML2's
    ForwardEulerTimeIntegration<SR2> (integrates tensor state: plastic
    strain, backstress).  Same axis conventions as the Scalar variant."""

    def __init__(self, name, params):
        super().__init__(name, params)
        var = params.get_str("variable", required=True)
        self.to_var = var if "/" in var else f"state/{var}"
        self.rate = f"{self.to_var}_rate"
        self.old = "old_" + self.to_var
        self.t = params.get_str("time", "forces/t")
        self.t_old = f"old_{self.t}"
        self.from_var = [self.rate, self.old, self.t, self.t_old]

    def forward(self, env):
        dt = env[self.t] - env[self.t_old]
        return {self.to_var: env[self.old] + env[self.rate] * dt[..., None]}


class Normality(_NEML2Model):
    """Associative flow directions via normality: for each (from, to) pair,
    to = ∂f/∂from evaluated with f the von Mises stress measure of `model`'s
    input — NEML2's Normality mapping.  marlin_tpu ships the J2 case in
    closed form: N = ∂σvm/∂M = (3/2)·dev(M)/σvm (Mandel), and
    ∂f/∂k = −1 for the isotropic-hardening direction."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.function = params.get_str("function", "state/internal/fp")
        self.stress = params.get_str("stress", "state/internal/M")
        self.to_var_stress = params.get_str("flow_direction",
                                            "state/internal/NM")
        self.from_var = [self.stress]
        self.to_var = self.to_var_stress

    def forward(self, env):
        M = env[self.stress]
        vol_mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0], M.dtype)
        tr = M[..., 0] + M[..., 1] + M[..., 2]
        dev = M - (tr / 3.0)[..., None] * vol_mask
        vm = jnp.sqrt(jnp.maximum(1.5 * jnp.sum(dev * dev, -1), 0.0))
        N = 1.5 * dev / jnp.where(vm > 0.0, vm, 1.0)[..., None]
        return {self.to_var_stress: N}


class AssociativePlasticFlow(_NEML2Model):
    """Ėp = γ̇·N (NEML2 AssociativePlasticFlow): the plastic strain rate
    from the flow rate and the flow direction."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.gamma = params.get_str("flow_rate", "state/internal/gamma_rate")
        self.N = params.get_str("flow_direction", "state/internal/NM")
        self.to_var = params.get_str("plastic_strain_rate",
                                     "state/internal/Ep_rate")
        self.from_var = [self.gamma, self.N]

    def forward(self, env):
        return {self.to_var: env[self.gamma][..., None] * env[self.N]}


class AssociativeIsotropicPlasticHardening(_NEML2Model):
    """ėp = γ̇ (NEML2 AssociativeIsotropicPlasticHardening: for J2 the
    equivalent-plastic-strain rate equals the plastic multiplier rate)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.gamma = params.get_str("flow_rate", "state/internal/gamma_rate")
        self.to_var = params.get_str(
            "equivalent_plastic_strain_rate", "state/internal/ep_rate")
        self.from_var = [self.gamma]

    def forward(self, env):
        return {self.to_var: env[self.gamma]}


class AssociativeKinematicPlasticFlow(_NEML2Model):
    """K̇p = γ̇·(−∂f/∂X) = γ̇·N (NEML2 AssociativeKinematicPlasticFlow):
    the kinematic plastic strain rate; with back-stress X entering the
    overstress as M = S − X, ∂f/∂X = −N."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.gamma = params.get_str("flow_rate", "state/internal/gamma_rate")
        self.N = params.get_str("flow_direction", "state/internal/NM")
        self.to_var = params.get_str(
            "kinematic_plastic_strain_rate", "state/internal/Kp_rate")
        self.from_var = [self.gamma, self.N]

    def forward(self, env):
        return {self.to_var: env[self.gamma][..., None] * env[self.N]}


class LinearKinematicHardening(_NEML2Model):
    """X = 2/3·C·Kp (NEML2 LinearKinematicHardening: Prager back-stress
    from the kinematic plastic strain)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.C = params.get_float("hardening_modulus", required=True)
        self.Kp = params.get_str("kinematic_plastic_strain",
                                 "state/internal/Kp")
        self.to_var = params.get_str("back_stress", "state/internal/X")
        self.from_var = [self.Kp]

    def forward(self, env):
        return {self.to_var: (2.0 / 3.0) * self.C * env[self.Kp]}


class ChabochePlasticHardening(_NEML2Model):
    """One Chaboche back-stress term (NEML2 ChabochePlasticHardening):

        Ẋ = 2/3·C·γ̇·N − g·X·γ̇ − A·‖X‖^(a−1)·X

    (hardening, dynamic recovery, static recovery; ‖X‖ is the von Mises
    norm of the back stress).  Multiple terms sum via SR2LinearCombination."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.C = params.get_float("C", required=True)
        self.g = params.get_float("g", required=True)
        self.A = params.get_float("A", 0.0)
        self.a = params.get_float("a", 1.0)
        self.X = params.get_str("back_stress", "state/internal/X")
        self.gamma = params.get_str("flow_rate", "state/internal/gamma_rate")
        self.N = params.get_str("flow_direction", "state/internal/NM")
        self.to_var = f"{self.X}_rate"
        self.from_var = [self.X, self.gamma, self.N]

    def forward(self, env):
        X, g_rate, N = env[self.X], env[self.gamma], env[self.N]
        rate = ((2.0 / 3.0) * self.C * g_rate[..., None] * N
                - self.g * X * g_rate[..., None])
        if self.A:
            vol_mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0], X.dtype)
            tr = X[..., 0] + X[..., 1] + X[..., 2]
            dev = X - (tr / 3.0)[..., None] * vol_mask
            norm = jnp.sqrt(jnp.maximum(1.5 * jnp.sum(dev * dev, -1), 0.0))
            rate = rate - self.A * (norm ** (self.a - 1.0))[..., None] * X
        return {self.to_var: rate}


class RateIndependentPlasticFlowConstraint(_NEML2Model):
    """The Fischer–Burmeister complementarity residual of rate-INDEPENDENT
    plasticity (NEML2 RateIndependentPlasticFlowConstraint): with the
    plastic multiplier rate γ̇ = state/internal/gamma_rate as an implicit
    unknown, emit

        residual/internal/gamma_rate = γ̇ − f − √(γ̇² + f²)

    i.e. FB(γ̇, −f), which vanishes iff γ̇ ≥ 0, f ≤ 0 and γ̇·f = 0 — the
    KKT conditions.  Combine with Normality/AssociativePlasticFlow and
    BackwardEulerTimeIntegration members inside ImplicitUpdate for the
    standard rate-independent return map solved as one Newton system
    (reference runs the same model via NEML2's assembled Newton,
    src/tensor_computes/NEML2TensorCompute.C)."""

    NCOMP = 1
    emits_residual = True

    def __init__(self, name, params):
        super().__init__(name, params)
        self.f = params.get_str("yield_function", "state/internal/fp")
        self.state_var = params.get_str("flow_rate",
                                        "state/internal/gamma_rate")
        self.to_var = self.state_var.replace("state/", "residual/", 1)
        # old_<flow_rate> is ImplicitUpdate's Newton seed for the unknown;
        # listing it keeps the deck-level mapped-input audit honest
        self.from_var = [self.state_var, self.f, "old_" + self.state_var]

    def forward(self, env):
        g, f = env[self.state_var], env[self.f]
        # safe sqrt: at the FB corner g = f = 0 (a point loaded EXACTLY to
        # yield) sqrt'(0) = inf would NaN the Newton Jacobian (r04 advisor
        # finding).  The double-where keeps both primal and jvp finite and
        # picks the subgradient with d(sqrt)/d(g,f) = 0 at the corner —
        # a valid Clarke subdifferential element of FB, so Newton still
        # converges (residual derivative there is (1, -1)).
        s2 = g * g + f * f
        safe = jnp.where(s2 > 0.0, s2, 1.0)
        norm = jnp.where(s2 > 0.0, jnp.sqrt(safe), 0.0)
        return {self.to_var: g - f - norm}


class ScalarBackwardEulerTimeIntegration(_NEML2Model):
    """residual/<var> = s − s_old − ṡ·(t − t_old) — NEML2's
    BackwardEulerTimeIntegration<Scalar>.  Unlike the forward-Euler variant
    this model does not update the state: it emits the implicit residual on
    NEML2's residual axis, consumed by ImplicitUpdate's Newton solve (the
    rate ṡ is evaluated by sibling models AT the current guess of
    state/<var>, which enters through the composed chain)."""

    NCOMP = 1
    emits_residual = True

    def __init__(self, name, params):
        super().__init__(name, params)
        var = params.get_str("variable", required=True)
        self.state_var = var if "/" in var else f"state/{var}"
        if not self.state_var.startswith("state/"):
            params.error("variable",
                         "implicit integration targets a state/ variable")
        self.rate = f"{self.state_var}_rate"
        self.old = "old_" + self.state_var
        self.t = params.get_str("time", "forces/t")
        self.t_old = f"old_{self.t}"
        self.to_var = self.state_var.replace("state/", "residual/", 1)
        self.from_var = [self.state_var, self.rate, self.old,
                         self.t, self.t_old]

    def forward(self, env):
        dt = env[self.t] - env[self.t_old]
        return {self.to_var: env[self.state_var] - env[self.old]
                - env[self.rate] * dt}


class SR2BackwardEulerTimeIntegration(ScalarBackwardEulerTimeIntegration):
    """residual/<var> = S − S_old − Ṡ·(t − t_old) on Mandel SR2 variables —
    NEML2's BackwardEulerTimeIntegration<SR2> (implicit residual for tensor
    state: plastic strain, back stress)."""

    NCOMP = 6

    def forward(self, env):
        dt = env[self.t] - env[self.t_old]
        return {self.to_var: env[self.state_var] - env[self.old]
                - env[self.rate] * dt[..., None]}


def _find_backward_euler(model):
    """Walk a (possibly composed) model for its implicit-residual members
    (BackwardEulerTimeIntegration and any other residual emitter, e.g.
    RateIndependentPlasticFlowConstraint)."""
    if getattr(model, "emits_residual", False):
        return [model]
    if isinstance(model, ComposedModel):
        found = []
        for m in model.models:
            found.extend(_find_backward_euler(m))
        return found
    return []


class ImplicitUpdate(_NEML2Model):
    """NEML2's ImplicitUpdate: Newton-solve the implicit model's residual
    R(state) = 0 for the integrated state variables, then expose the solved
    state (and every other output of the inner model at the solution).

    The reference wraps NEML2's assembled Newton with libTorch autodiff
    Jacobians (src/tensor_computes/NEML2TensorCompute.C wraps any such
    model).  marlin_tpu does it the JAX way: the unknowns at every grid
    point are packed into one trailing axis u ∈ R^n (scalar vars contribute
    one slot, Mandel SR2 vars six), the per-point Jacobian is built from n
    `jax.jvp` columns of the residual (exact forward-mode autodiff — no
    finite differences), and a field-wide vectorized Newton runs in a
    single `lax.while_loop` with an unrolled elementwise solve
    (smallsolve.py) of the (..., n, n) systems.  Everything stays inside
    the jitted compute graph: no host syncs, no per-point Python.

    Convergence: max|R| < absolute_tolerance, or < relative_tolerance ×
    max|R₀|; `miter` bounds the iteration count (non-convergence leaves the
    last iterate — NaN guards downstream surface divergence, matching the
    NaN semantics of the reference's solver failures)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        inner_name = params.get_str("implicit_model", required=True)
        root = params.node.parent
        node = root.children.get(inner_name)
        if node is None:
            raise NEML2Error(
                f"ImplicitUpdate '{name}': implicit_model '{inner_name}' "
                f"not found (available: {sorted(root.children)})")
        sp = Params(node)
        mtype = sp.get_str("type", required=True)
        if mtype not in _MODEL_TYPES:
            raise NEML2Error(
                f"ImplicitUpdate '{name}': implicit_model '{inner_name}' "
                f"has unsupported type '{mtype}'")
        self.inner = _MODEL_TYPES[mtype](inner_name, sp)
        self.abs_tol = params.get_float("absolute_tolerance", 1e-10)
        self.rel_tol = params.get_float("relative_tolerance", 1e-8)
        self.miter = params.get_int("miter", 50)

        be = _find_backward_euler(self.inner)
        if not be:
            raise NEML2Error(
                f"ImplicitUpdate '{name}': implicit_model '{inner_name}' "
                "contains no BackwardEulerTimeIntegration member — nothing "
                "to solve for")
        # (state var, component count, residual var) per unknown, in a
        # stable order; the packed unknown vector follows this layout
        self.specs = [(m.state_var, m.NCOMP, m.to_var) for m in be]
        unknowns = {s for s, _, _ in self.specs}
        inner_from = set(getattr(self.inner, "from_var", []))
        self.from_var = sorted(inner_from - unknowns)
        inner_to = self.inner.to_var
        inner_to = inner_to if isinstance(inner_to, (list, tuple)) else [inner_to]
        self.to_var = sorted(
            unknowns | {v for v in inner_to if not v.startswith("residual/")})

    def forward(self, env):
        import jax

        n = sum(nc for _, nc, _ in self.specs)

        def unpack(u, base):
            """u (..., n) -> env with the unknown state vars filled in."""
            e = dict(base)
            i = 0
            for var, nc, _ in self.specs:
                e[var] = u[..., i] if nc == 1 else u[..., i:i + nc]
                i += nc
            return e

        def pack_residual(res, shape):
            cols = []
            for var, nc, rvar in self.specs:
                r = res[rvar]
                if nc == 1:
                    cols.append(jnp.broadcast_to(r, shape)[..., None])
                else:
                    cols.append(jnp.broadcast_to(r, shape + (nc,)))
            return jnp.concatenate(cols, axis=-1)

        # initial guess: the old state (NEML2's default Newton seed)
        guess = {var: env["old_" + var] for var, _, _ in self.specs}
        probe = self.inner.forward({**env, **guess})
        # the residuals carry the full broadcast grid shape (forces enter
        # through the chain) — derive the common per-point layout from them
        shape = jnp.broadcast_shapes(*[
            probe[rvar].shape if nc == 1 else probe[rvar].shape[:-1]
            for _, nc, rvar in self.specs])
        cols = []
        for var, nc, _ in self.specs:
            g = jnp.asarray(guess[var])
            if nc == 1:
                cols.append(jnp.broadcast_to(g, shape)[..., None])
            else:
                cols.append(jnp.broadcast_to(g, shape + (nc,)))
        u0 = jnp.concatenate(cols, axis=-1)

        def res_fn(u):
            return pack_residual(self.inner.forward(unpack(u, env)), shape)

        r0 = res_fn(u0)
        # non-finite-excluded initial residual for the relative tolerance —
        # a NaN (or inf: overflowed cosh/sinh at an extreme point, r05
        # review) tol would otherwise disable convergence grid-wide
        r0_ok = jnp.where(jnp.isfinite(r0), jnp.abs(r0), 0.0)
        tol = jnp.maximum(jnp.asarray(self.abs_tol, u0.dtype),
                          self.rel_tol * jnp.max(r0_ok))
        eye = jnp.eye(n, dtype=u0.dtype)

        def jac(u):
            # n exact forward-mode columns; n is small (a handful of state
            # vars), so this beats materializing a full jacfwd over fields
            cols = [jax.jvp(res_fn, (u,),
                            (jnp.broadcast_to(eye[i], u.shape),))[1]
                    for i in range(n)]
            return jnp.stack(cols, axis=-1)  # (..., n, n)

        def cond(carry):
            _, r, it = carry
            # non-finite-robust convergence: the elementwise solve keeps
            # grid points independent, so one diverged point must not
            # freeze every OTHER point at an unconverged iterate (r04
            # advisor finding for NaN — jnp.max(NaN) > tol is False, which
            # would exit Newton after one iteration grid-wide; r05 review
            # extended it to inf, where tol = inf disabled convergence the
            # same way).  Non-finite points are excluded from the residual
            # max: they can never improve, and the NaN/inf stays in the
            # output to surface the divergence.
            r_ok = jnp.where(jnp.isfinite(r), jnp.abs(r), 0.0)
            return jnp.logical_and(it < self.miter,
                                   jnp.max(r_ok) > tol)

        def body(carry):
            u, r, it = carry
            # unrolled elementwise solve (smallsolve.py): GSPMD/layout-safe
            # under sharded decks, unlike the batched-LU custom call
            du = small_solve(jac(u), r)
            u = u - du
            return u, res_fn(u), it + 1

        u, _, _ = jax.lax.while_loop(cond, body,
                                     (u0, r0, jnp.zeros((), jnp.int32)))

        solved = unpack(u, env)
        out = self.inner.forward(solved)
        result = {var: solved[var] for var, _, _ in self.specs}
        for k, v in out.items():
            if not k.startswith("residual/"):
                result[k] = v
        return result


class ArrheniusParameter(_NEML2Model):
    """p(T) = p0·exp(−Q/(R·T)) (NEML2 ArrheniusParameter: thermally
    activated parameter scaling; R defaults to the gas constant in
    J/mol/K)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.p0 = params.get_float("reference_value", required=True)
        self.Q = params.get_float("activation_energy", required=True)
        self.R = params.get_float("ideal_gas_constant", 8.31446261815324)
        self.T = params.get_str("temperature", "forces/T")
        self.to_var = params.get_str("parameter", required=True)
        self.from_var = [self.T]

    def forward(self, env):
        return {self.to_var: self.p0 * jnp.exp(-self.Q / (self.R * env[self.T]))}


class ThermalEigenstrain(_NEML2Model):
    """Isotropic thermal-expansion eigenstrain Eg = α·(T − T0)·I on the
    Mandel SR2 axis (NEML2 ThermalEigenstrain): [αΔT, αΔT, αΔT, 0, 0, 0].
    Subtract from the total strain (SR2LinearCombination) to feed
    elasticity."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.alpha = params.get_float("CTE", required=True)
        self.T0 = params.get_float("reference_temperature", required=True)
        self.T = params.get_str("temperature", "forces/T")
        self.to_var = params.get_str("eigenstrain", "forces/Eg")
        self.from_var = [self.T]

    def forward(self, env):
        dT = env[self.T] - self.T0
        vol = self.alpha * dT
        zero = jnp.zeros_like(vol)
        return {self.to_var: jnp.stack(
            [vol, vol, vol, zero, zero, zero], axis=-1)}


class PowerLawIsotropicHardening(_NEML2Model):
    """k(ep) = K·ep^n (NEML2 PowerLawIsotropicHardening)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.K = params.get_float("hardening_modulus", required=True)
        self.n = params.get_float("exponent", required=True)
        self.ep = params.get_str("equivalent_plastic_strain",
                                 "state/internal/ep")
        self.to_var = params.get_str("isotropic_hardening",
                                     "state/internal/k")
        self.from_var = [self.ep]

    def forward(self, env):
        # a virgin state (ep_old = 0) seeds the ImplicitUpdate Newton at
        # exactly the point where pow's jvp diverges for n < 1; _safe_pow
        # gives a zero (perfect-plasticity) hardening slope at the seed —
        # the next iterate lands at ep > 0 where the true slope takes over
        ep = jnp.maximum(env[self.ep], 0.0)
        return {self.to_var: self.K * _safe_pow(ep, self.n)}


class SlopeSaturationVoceIsotropicHardening(_NEML2Model):
    """Rate-form Voce hardening k̇ = θ·(1 − k/R)·γ̇ (NEML2
    SlopeSaturationVoceIsotropicHardening): integrate state/internal/k with
    a Scalar(Backward|Forward)EulerTimeIntegration member; saturates at R
    with initial hardening slope θ."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.R = params.get_float("saturated_hardening", required=True)
        self.theta = params.get_float("initial_hardening_rate", required=True)
        self.k = params.get_str("isotropic_hardening", "state/internal/k")
        self.gamma_rate = params.get_str("flow_rate",
                                         "state/internal/gamma_rate")
        self.to_var = self.k + "_rate"
        self.from_var = [self.k, self.gamma_rate]

    def forward(self, env):
        return {self.to_var: self.theta * (1.0 - env[self.k] / self.R)
                * env[self.gamma_rate]}


class PowerLawCreep(_NEML2Model):
    """Secondary (steady-state) power-law creep flow rate (classical
    Norton law; the NEML2 creep-family entry point the reference reaches
    through its full-library wrap, src/tensor_computes/NEML2TensorCompute.C):

        γ̇ = A·(⟨sm⟩/σ0)^n

    with sm an effective (von Mises) stress measure.  No yield surface —
    creep flows at any stress.  Compose with SR2Invariant(VONMISES) →
    Normality → AssociativePlasticFlow → SR2(Backward|Forward)Euler for
    the standard 3-D creep chain; ArrheniusParameter supplies a
    temperature-dependent A.  The Macaulay bracket + safe-pow keep the
    jvp finite at sm = 0 for n < 1 (same double-where discipline as
    PowerLawIsotropicHardening)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.A = params.get_float("coefficient", required=True)
        self.n = params.get_float("exponent", required=True)
        self.s0 = params.get_float("reference_stress", 1.0)
        self.sm = params.get_str("stress_measure", "state/internal/sm")
        self.to_var = params.get_str("flow_rate",
                                     "state/internal/gamma_rate")
        self.from_var = [self.sm]

    def forward(self, env):
        s = jnp.maximum(env[self.sm], 0.0) / self.s0
        return {self.to_var: self.A * _safe_pow(s, self.n)}


class BlackburnCreep(_NEML2Model):
    """Blackburn-style sinh creep rate (the hyperbolic-sine minimum creep
    law; covers the power-law-breakdown regime the Norton law misses):

        γ̇ = A·sinh(β·⟨sm⟩)^n

    Same composition surface as PowerLawCreep.  sinh is smooth at 0, so
    only the outer pow needs the safe-pow guard for n < 1."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.A = params.get_float("coefficient", required=True)
        self.beta = params.get_float("beta", required=True)
        self.n = params.get_float("exponent", 1.0)
        self.sm = params.get_str("stress_measure", "state/internal/sm")
        self.to_var = params.get_str("flow_rate",
                                     "state/internal/gamma_rate")
        self.from_var = [self.sm]

    def forward(self, env):
        sh = jnp.sinh(self.beta * jnp.maximum(env[self.sm], 0.0))
        return {self.to_var: self.A * _safe_pow(sh, self.n)}


class IsotropicDamageEffectiveStress(_NEML2Model):
    """Lemaitre effective-stress coupling s̃ = sm/(1−d): the undamaged-
    skeleton stress driving yield/flow when isotropic damage d ∈ [0, 1)
    grows.  Feed the output into YieldFunction/PowerLawCreep in place of
    the raw stress measure; d is clamped to d_max (< 1) to keep the
    division finite at full damage."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.sm = params.get_str("stress_measure", "state/internal/sm")
        self.d = params.get_str("damage", "state/internal/d")
        self.d_max = params.get_float("maximum_damage", 0.99)
        self.to_var = params.get_str("effective_stress",
                                     "state/internal/sm_eff")
        self.from_var = [self.sm, self.d]

    def forward(self, env):
        d = jnp.clip(env[self.d], 0.0, self.d_max)
        return {self.to_var: env[self.sm] / (1.0 - d)}


class PlasticStrainDamageRate(_NEML2Model):
    """Ductile damage accumulation ḋ = γ̇/εf (linear in accumulated
    plastic flow; εf = `failure_strain`, the equivalent plastic strain at
    full damage).  Integrate with Scalar(Backward|Forward)Euler
    TimeIntegration; inside ImplicitUpdate this is the residual-emitting
    damage unknown of the coupled softening system."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.ef = params.get_float("failure_strain", required=True)
        self.gamma = params.get_str("flow_rate", "state/internal/gamma_rate")
        self.to_var = params.get_str("damage_rate", "state/internal/d_rate")
        self.from_var = [self.gamma]

    def forward(self, env):
        return {self.to_var: env[self.gamma] / self.ef}


class GTNYieldFunction(_NEML2Model):
    """Gurson-Tvergaard-Needleman porous-plasticity yield function
    (NEML2 GTNYieldFunction):

        f = (se/σf)² + 2·q1·φ·cosh(q2·skk/(2·σf)) − (1 + q3·φ²)

    with se the von Mises measure, skk the stress trace (pressure
    channel), φ the void fraction, and σf = yield_stress + isotropic
    hardening.  At φ = 0 it reduces to the normalized J2 surface
    (se/σf)² − 1."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.q1 = params.get_float("q1", 1.0)
        self.q2 = params.get_float("q2", 1.0)
        self.q3 = params.get_float("q3", 1.0)
        self.sy = params.get_float("yield_stress", required=True)
        self.se = params.get_str("stress_measure", "state/internal/se")
        self.skk = params.get_str("stress_trace", "state/internal/skk")
        self.phi = params.get_str("void_fraction", "state/internal/phi")
        self.k = params.get_str("isotropic_hardening", "")
        self.to_var = params.get_str("yield_function", "state/internal/fp")
        self.from_var = [self.se, self.skk, self.phi] + (
            [self.k] if self.k else [])

    def forward(self, env):
        sf = self.sy + (env[self.k] if self.k else 0.0)
        se, skk, phi = env[self.se], env[self.skk], env[self.phi]
        return {self.to_var:
                (se / sf) ** 2
                + 2.0 * self.q1 * phi * jnp.cosh(self.q2 * skk / (2.0 * sf))
                - (1.0 + self.q3 * phi * phi)}


class GursonCavitation(_NEML2Model):
    """Void growth from plastic incompressibility of the matrix (NEML2
    GursonCavitation): φ̇ = (1 − φ)·tr(Ėp).  Deviatoric (J2) flow gives
    φ̇ = 0; the pressure-sensitive GTN normal grows voids under triaxial
    load."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.phi = params.get_str("void_fraction", "state/internal/phi")
        self.Ep_rate = params.get_str("plastic_strain_rate",
                                      "state/internal/Ep_rate")
        self.to_var = self.phi + "_rate"
        self.from_var = [self.phi, self.Ep_rate]

    def forward(self, env):
        Ep_rate = env[self.Ep_rate]
        tr = Ep_rate[..., 0] + Ep_rate[..., 1] + Ep_rate[..., 2]
        return {self.to_var: (1.0 - env[self.phi]) * tr}


class ScalarVariableRate(_NEML2Model):
    """ṡ = (s − s_old)/(t − t_old) (NEML2 ScalarVariableRate): the
    backward-difference rate of a state/forces variable, e.g. a strain
    rate driving viscous models."""

    NCOMP = 1

    def __init__(self, name, params):
        super().__init__(name, params)
        var = params.get_str("variable", required=True)
        self.var = var if "/" in var else f"state/{var}"
        self.old = "old_" + self.var
        self.t = params.get_str("time", "forces/t")
        self.t_old = f"old_{self.t}"
        self.to_var = params.get_str("rate", self.var + "_rate")
        self.from_var = [self.var, self.old, self.t, self.t_old]

    def forward(self, env):
        dt = env[self.t] - env[self.t_old]
        return {self.to_var: (env[self.var] - env[self.old]) / dt}


class SR2VariableRate(ScalarVariableRate):
    """Ṡ = (S − S_old)/(t − t_old) on Mandel SR2 variables (NEML2
    SR2VariableRate)."""

    NCOMP = 6

    def forward(self, env):
        dt = env[self.t] - env[self.t_old]
        return {self.to_var:
                (env[self.var] - env[self.old]) / dt[..., None]}


def _euler_rotation(phi1, Phi, phi2):
    """Bunge Z-X-Z Euler angles (radians) -> 3x3 rotation matrix (numpy,
    build-time constant)."""
    import numpy as np

    c1, s1 = np.cos(phi1), np.sin(phi1)
    c, s = np.cos(Phi), np.sin(Phi)
    c2, s2 = np.cos(phi2), np.sin(phi2)
    return np.array([
        [c1 * c2 - s1 * s2 * c, -c1 * s2 - s1 * c2 * c, s1 * s],
        [s1 * c2 + c1 * s2 * c, -s1 * s2 + c1 * c2 * c, -c1 * s],
        [s2 * s, c2 * s, c],
    ])


def _slip_geometry(params):
    """Slip directions and normals (two (ns, 3) numpy arrays, build-time
    constants) for the crystal class + orientation in `params`.

    `crystal_class` = FCC (12 octahedral {111}<110> systems, default) or
    BCC ({110}<111>, 12 systems); `euler_angles` = Bunge Z-X-Z in
    radians rotates the crystal frame.  The single source of the slip
    tables — _schmid_mandel derives the Mandel Schmid tensors from it
    (r05 review deduplicated the enumeration)."""
    import numpy as np

    cls = params.get_str("crystal_class", "FCC").upper()
    if cls == "FCC":
        # each {111} plane keeps its 3 in-plane <110> directions -> 12
        planes = ([1, 1, 1], [-1, 1, 1], [1, -1, 1], [1, 1, -1])
        directions = ([0, 1, -1], [1, 0, -1], [1, -1, 0],
                      [0, 1, 1], [1, 0, 1], [1, 1, 0])
    elif cls == "BCC":
        # each {110} plane holds 2 <111> directions -> 12
        planes = ([1, 1, 0], [1, -1, 0], [1, 0, 1],
                  [1, 0, -1], [0, 1, 1], [0, 1, -1])
        directions = ([1, 1, 1], [-1, 1, 1], [1, -1, 1], [1, 1, -1])
    else:
        raise NEML2Error(f"unknown crystal_class '{cls}' (FCC or BCC)")
    normals, dirs = [], []
    for n in planes:
        n = np.asarray(n, float)
        for d in directions:
            d = np.asarray(d, float)
            if abs(np.dot(n, d)) < 1e-12:
                normals.append(n / np.linalg.norm(n))
                dirs.append(d / np.linalg.norm(d))
    normals, dirs = np.asarray(normals), np.asarray(dirs)

    angles = params.get_float_vector("euler_angles", [0.0, 0.0, 0.0])
    if len(angles) != 3:
        params.error("euler_angles", "three Bunge Z-X-Z angles (radians)")
    R = _euler_rotation(*angles)
    return dirs @ R.T, normals @ R.T


def _schmid_mandel(dirs, normals):
    """Mandel 6-vectors of the symmetric Schmid tensors
    P_a = sym(d_a ⊗ n_a) for an already-built slip geometry."""
    import numpy as np

    P = 0.5 * (dirs[:, :, None] * normals[:, None, :]
               + normals[:, :, None] * dirs[:, None, :])  # (ns, 3, 3)
    rt2 = np.sqrt(2.0)
    return np.stack([P[:, 0, 0], P[:, 1, 1], P[:, 2, 2],
                     rt2 * P[:, 1, 2], rt2 * P[:, 0, 2],
                     rt2 * P[:, 0, 1]], axis=-1)  # (ns, 6) Mandel


def _mrp_rotation(r):
    """Modified-Rodrigues-parameter rotation matrix (NEML2's Rot
    convention, r = tan(θ/4)·axis):

        R = I + (4·(1−|r|²)·S + 8·S²)/(1+|r|²)²,  S = skew(r)

    r has trailing axis 3; returns (..., 3, 3)."""
    rr = jnp.sum(r * r, axis=-1)[..., None, None]
    z = jnp.zeros_like(r[..., 0])
    S = jnp.stack([
        jnp.stack([z, -r[..., 2], r[..., 1]], axis=-1),
        jnp.stack([r[..., 2], z, -r[..., 0]], axis=-1),
        jnp.stack([-r[..., 1], r[..., 0], z], axis=-1),
    ], axis=-2)
    S2 = jnp.einsum("...ij,...jk->...ik", S, S)
    eye = jnp.eye(3, dtype=r.dtype)
    return eye + (4.0 * (1.0 - rr) * S + 8.0 * S2) / (1.0 + rr) ** 2


def _rotated_schmid(dirs, normals, env, orientation):
    """Per-point symmetric Schmid tensors as Mandel 6-vectors for an MRP
    orientation state (3-vector per grid point): the slip directions and
    normals rotate per point, d' = R d, n' = R n."""
    import numpy as np

    rt2 = np.sqrt(2.0)
    R = _mrp_rotation(env[orientation])  # (..., 3, 3)
    d = jnp.einsum("...ij,sj->...si", R, jnp.asarray(dirs, R.dtype))
    n = jnp.einsum("...ij,sj->...si", R, jnp.asarray(normals, R.dtype))
    P = 0.5 * (d[..., :, None] * n[..., None, :]
               + n[..., :, None] * d[..., None, :])  # (..., ns, 3, 3)
    return jnp.stack(
        [P[..., 0, 0], P[..., 1, 1], P[..., 2, 2],
         rt2 * P[..., 1, 2], rt2 * P[..., 0, 2], rt2 * P[..., 0, 1]],
        axis=-1)  # (..., ns, 6)


class ResolvedShear(_NEML2Model):
    """Resolved shear stresses τ_a = M : P_a on every slip system (NEML2
    crystal-plasticity ResolvedShear): the Mandel dot of the stress with
    each symmetric Schmid tensor sym(d_a ⊗ n_a).  The crystal geometry
    (class + euler_angles) is built at load time; an optional
    `orientation` state variable (modified Rodrigues parameters, trailing
    axis 3) rotates the slip systems PER POINT for texture evolution —
    compose with PlasticVorticity + OrientationRate + a Vec time
    integrator."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.dirs, self.normals = _slip_geometry(params)
        self.orientation = params.get_str("orientation", "")
        self.stress = params.get_str("stress", "state/internal/M")
        self.to_var = params.get_str("resolved_shears",
                                     "state/internal/resolved_shears")
        self.from_var = [self.stress] + (
            [self.orientation] if self.orientation else [])
        self.P = _schmid_mandel(self.dirs, self.normals)  # (ns, 6)

    def forward(self, env):
        M = env[self.stress]
        if self.orientation:
            P = _rotated_schmid(self.dirs, self.normals, env,
                                self.orientation).astype(M.dtype)
            return {self.to_var: jnp.einsum("...i,...si->...s", M, P)}
        return {self.to_var: jnp.einsum(
            "...i,si->...s", M, jnp.asarray(self.P, M.dtype))}


class SingleSlipStrengthMap(_NEML2Model):
    """Map the single scalar hardening state τ̄ to every slip system's
    strength g_a = τ0 + τ̄ (NEML2 SingleSlipStrengthMap with
    constant_strength τ0)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.tau0 = params.get_float("constant_strength", required=True)
        self.nslip = params.get_int("n_slip", 12)
        self.hard = params.get_str("slip_hardening",
                                   "state/internal/slip_hardening")
        self.to_var = params.get_str("slip_strengths",
                                     "state/internal/slip_strengths")
        self.from_var = [self.hard]

    def forward(self, env):
        g = self.tau0 + env[self.hard]
        return {self.to_var: jnp.broadcast_to(
            g[..., None], g.shape + (self.nslip,))}


class PowerLawSlipRule(_NEML2Model):
    """Power-law slip-system flow rule (NEML2 PowerLawSlipRule):

        γ̇_a = γ̇0 · |τ_a/g_a|^(n−1) · (τ_a/g_a)

    — odd in τ, so slip reverses with the load.  The |x|^(n-1)·x form is
    evaluated as sign(x)·|x|^n with a safe-pow floor so the jvp stays
    finite at τ = 0 for n < 1 (the n > 1 production case is unaffected)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.g0 = params.get_float("gamma0", required=True)
        self.n = params.get_float("n", required=True)
        self.tau = params.get_str("resolved_shears",
                                  "state/internal/resolved_shears")
        self.g = params.get_str("slip_strengths",
                                "state/internal/slip_strengths")
        self.to_var = params.get_str("slip_rates",
                                     "state/internal/slip_rates")
        self.from_var = [self.tau, self.g]

    def forward(self, env):
        x = env[self.tau] / env[self.g]
        return {self.to_var:
                self.g0 * jnp.sign(x) * _safe_pow(jnp.abs(x), self.n)}


class SumSlipRates(_NEML2Model):
    """Σ_a |γ̇_a| (NEML2 SumSlipRates): the total slip activity driving
    single-strength hardening."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.rates = params.get_str("slip_rates", "state/internal/slip_rates")
        self.to_var = params.get_str("sum_slip_rates",
                                     "state/internal/sum_slip_rates")
        self.from_var = [self.rates]

    def forward(self, env):
        return {self.to_var: jnp.sum(jnp.abs(env[self.rates]), axis=-1)}


class VoceSingleSlipHardening(_NEML2Model):
    """Voce hardening of the single slip strength (NEML2
    VoceSingleSlipHardeningRule): τ̄̇ = θ0·(1 − τ̄/τ_f)·Σ|γ̇_a|.
    Integrate state/internal/slip_hardening with a
    Scalar(Backward|Forward)EulerTimeIntegration member."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.theta0 = params.get_float("initial_slope", required=True)
        self.tau_f = params.get_float("saturated_hardening", required=True)
        self.hard = params.get_str("slip_hardening",
                                   "state/internal/slip_hardening")
        self.ssr = params.get_str("sum_slip_rates",
                                  "state/internal/sum_slip_rates")
        self.to_var = self.hard + "_rate"
        self.from_var = [self.hard, self.ssr]

    def forward(self, env):
        return {self.to_var: self.theta0
                * (1.0 - env[self.hard] / self.tau_f) * env[self.ssr]}


class PlasticDeformationRate(_NEML2Model):
    """Ėp = Σ_a γ̇_a·P_a (NEML2 PlasticDeformationRate, small-deformation
    form): the plastic strain rate as the slip-rate-weighted sum of the
    Schmid tensors, on the Mandel SR2 axis.  Uses the same crystal
    geometry parameters (and optional per-point `orientation`) as
    ResolvedShear."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.dirs, self.normals = _slip_geometry(params)
        self.orientation = params.get_str("orientation", "")
        self.rates = params.get_str("slip_rates", "state/internal/slip_rates")
        self.to_var = params.get_str("plastic_strain_rate",
                                     "state/internal/Ep_rate")
        self.from_var = [self.rates] + (
            [self.orientation] if self.orientation else [])
        self.P = _schmid_mandel(self.dirs, self.normals)

    def forward(self, env):
        g = env[self.rates]
        if self.orientation:
            P = _rotated_schmid(self.dirs, self.normals, env,
                                self.orientation).astype(g.dtype)
            return {self.to_var: jnp.einsum("...s,...si->...i", g, P)}
        return {self.to_var: jnp.einsum(
            "...s,si->...i", g, jnp.asarray(self.P, g.dtype))}


class PlasticVorticity(_NEML2Model):
    """Plastic vorticity of crystal slip (NEML2 PlasticVorticity), as the
    axial 3-vector of W_p = Σ_a γ̇_a·skew(d_a ⊗ n_a):

        w_p = −½ Σ_a γ̇_a · (d_a × n_a)

    (the axial vector ω of W, defined by W·v = ω×v, is −½ d×n for
    skew(d⊗n): with d = x̂, n = ŷ, W·x̂ = −½ŷ = (−½ẑ)×x̂ — r05 review
    caught the original +½ sign, which reversed every texture-evolution
    rotation).  The lattice spin is the total spin minus w_p; for
    quasi-static RVE loading with zero imposed spin the lattice rotates
    at −w_p (OrientationRate's default)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.dirs, self.normals = _slip_geometry(params)
        self.orientation = params.get_str("orientation", "")
        self.rates = params.get_str("slip_rates", "state/internal/slip_rates")
        self.to_var = params.get_str("plastic_vorticity",
                                     "state/internal/plastic_vorticity")
        self.from_var = [self.rates] + (
            [self.orientation] if self.orientation else [])

    def forward(self, env):
        import numpy as np

        g = env[self.rates]
        if self.orientation:
            R = _mrp_rotation(env[self.orientation])
            d = jnp.einsum("...ij,sj->...si", R,
                           jnp.asarray(self.dirs, R.dtype))
            n = jnp.einsum("...ij,sj->...si", R,
                           jnp.asarray(self.normals, R.dtype))
            axial = -0.5 * jnp.cross(d, n)  # (..., ns, 3)
            return {self.to_var:
                    jnp.einsum("...s,...si->...i", g, axial.astype(g.dtype))}
        axial = -0.5 * np.cross(self.dirs, self.normals)  # (ns, 3)
        return {self.to_var:
                jnp.einsum("...s,si->...i", g,
                           jnp.asarray(axial, g.dtype))}


class OrientationRate(_NEML2Model):
    """Lattice-orientation evolution (NEML2 OrientationRate): the rate of
    the modified-Rodrigues orientation state under the lattice spin
    ω = W − w_p (imposed spin W defaults to zero — quasi-static RVE
    loading), via the MRP kinematic relation

        ṙ = ¼·[(1−|r|²)·I + 2·skew(r) + 2·r⊗r]·ω

    (ṙ = ω/4 at r = 0; θ = 4·atan|r| recovers θ̇ = |ω| for a fixed
    axis).  Integrate state/orientation with a Vec time integrator."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.orientation = params.get_str("orientation",
                                          "state/orientation")
        self.wp = params.get_str("plastic_vorticity",
                                 "state/internal/plastic_vorticity")
        self.spin = params.get_str("spin", "")  # optional imposed W axial
        self.to_var = self.orientation + "_rate"
        self.from_var = [self.orientation, self.wp] + (
            [self.spin] if self.spin else [])

    def forward(self, env):
        r = env[self.orientation]
        omega = -env[self.wp]
        if self.spin:
            omega = omega + env[self.spin]
        rr = jnp.sum(r * r, axis=-1)[..., None]
        rw = jnp.sum(r * omega, axis=-1)[..., None]
        return {self.to_var: 0.25 * (
            (1.0 - rr) * omega + 2.0 * jnp.cross(r, omega) + 2.0 * rw * r)}


class VecForwardEulerTimeIntegration(SR2ForwardEulerTimeIntegration):
    """s = s_old + ṡ·dt on trailing-axis-3 Vec variables (NEML2
    ForwardEulerTimeIntegration<Vec>; e.g. the MRP orientation)."""

    NCOMP = 3


class VecBackwardEulerTimeIntegration(SR2BackwardEulerTimeIntegration):
    """Implicit residual on trailing-axis-3 Vec variables (NEML2
    BackwardEulerTimeIntegration<Vec>)."""

    NCOMP = 3


class OlevskySinteringStress(_NEML2Model):
    """Olevsky continuum-sintering stress (NEML2 OlevskySinteringStress;
    Olevsky 1998): the capillary driving pressure of a porous body,

        σ_s = 3·(γ/r0)·(1 − φ)²

    with surface tension γ, characteristic particle/pore radius r0, and
    void fraction φ.  Enters porous-plasticity systems as a hydrostatic
    offset of the GTN pressure channel (skk → skk + 3σ_s) so free
    sintering densifies (φ̇ < 0 through GursonCavitation) without an
    applied load."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.gamma = params.get_float("surface_tension", required=True)
        self.r0 = params.get_float("particle_radius", required=True)
        self.phi = params.get_str("void_fraction", "state/internal/phi")
        self.to_var = params.get_str("sintering_stress",
                                     "state/internal/ss")
        self.from_var = [self.phi]

    def forward(self, env):
        one_m = 1.0 - env[self.phi]
        return {self.to_var: 3.0 * self.gamma / self.r0 * one_m * one_m}


class PowerDegradationFunction(_NEML2Model):
    """Phase-field fracture degradation g(d) = (1−d)^p·(1−η) + η
    (marlin_tpu extension mirroring NEML2's fracture-coupling surface;
    p = 2, η = 1e-3 default — the AT1/AT2 stiffness degradation with a
    residual floor that keeps fully-cracked points solvable)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.p = params.get_float("exponent", 2.0)
        self.eta = params.get_float("residual", 1e-3)
        self.d = params.get_str("damage", "state/d")
        self.to_var = params.get_str("degradation", "state/internal/g")
        self.from_var = [self.d]

    def forward(self, env):
        one_m = jnp.clip(1.0 - env[self.d], 0.0, 1.0)
        return {self.to_var: one_m ** self.p * (1.0 - self.eta) + self.eta}


class StrainEnergyDensity(_NEML2Model):
    """Elastic strain-energy density from a Mandel SR2 strain — the crack
    driving force of phase-field fracture (marlin_tpu extension mirroring
    NEML2's fracture-coupling surface).

    `decomposition = NONE` gives ψ = λ/2·tr(E)² + µ·E:E.
    `decomposition = SPECTRAL` gives the Miehe tension/compression split:
    ψ± = λ/2·⟨tr E⟩±² + µ·Σᵢ⟨εᵢ⟩±² over the principal strains εᵢ
    (batched 3×3 eigh per grid point), emitting BOTH
    `psi` (= ψ⁺, the part damage degrades/drives) and
    `psi_inactive` (= ψ⁻, the compressive part that never drives
    cracks) — closure under crushing stays intact."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.lam = params.get_float("lambda", required=True)
        self.mu = params.get_float("mu", required=True)
        self.decomposition = params.get_str("decomposition", "NONE").upper()
        if self.decomposition not in ("NONE", "SPECTRAL"):
            params.error("decomposition", "NONE or SPECTRAL")
        self.strain = params.get_str("strain", "forces/E")
        self.psi = params.get_str("strain_energy_density",
                                  "state/internal/psi")
        self.psi_neg = params.get_str("inactive_strain_energy_density",
                                      "state/internal/psi_inactive")
        self.to_var = [self.psi] + (
            [self.psi_neg] if self.decomposition == "SPECTRAL" else [])
        self.from_var = [self.strain]

    @staticmethod
    def _unmandel(E):
        """Mandel 6-vector -> symmetric 3x3 (inverse of the SR2 packing:
        off-diagonals carry a 1/sqrt(2))."""
        import numpy as np

        s = 1.0 / np.sqrt(2.0)
        exx, eyy, ezz = E[..., 0], E[..., 1], E[..., 2]
        eyz, exz, exy = s * E[..., 3], s * E[..., 4], s * E[..., 5]
        return jnp.stack([
            jnp.stack([exx, exy, exz], axis=-1),
            jnp.stack([exy, eyy, eyz], axis=-1),
            jnp.stack([exz, eyz, ezz], axis=-1),
        ], axis=-2)

    def forward(self, env):
        E = env[self.strain]
        tr = E[..., 0] + E[..., 1] + E[..., 2]
        if self.decomposition == "NONE":
            psi = 0.5 * self.lam * tr * tr + self.mu * jnp.sum(E * E, -1)
            return {self.psi: psi}
        eig = jnp.linalg.eigvalsh(self._unmandel(E))  # (..., 3) ascending
        tr_p, tr_n = jnp.maximum(tr, 0.0), jnp.minimum(tr, 0.0)
        eig_p, eig_n = jnp.maximum(eig, 0.0), jnp.minimum(eig, 0.0)
        psi_p = (0.5 * self.lam * tr_p * tr_p
                 + self.mu * jnp.sum(eig_p * eig_p, -1))
        psi_n = (0.5 * self.lam * tr_n * tr_n
                 + self.mu * jnp.sum(eig_n * eig_n, -1))
        return {self.psi: psi_p, self.psi_neg: psi_n}


class MixedControlSetup(_NEML2Model):
    """Mixed stress/strain control, assembly half (NEML2
    MixedControlSetup): drive each Mandel component by EITHER a
    prescribed strain or a prescribed stress.  `control` (6 flags;
    1 = stress-controlled) selects per component; `forces/fixed_values`
    carries the prescribed values; the 6-vector implicit unknown
    state/mixed_state holds the complement (the strain of
    stress-controlled components, the stress of strain-controlled
    ones).  Assembles BOTH driving fields:

        E_i = control_i ? mixed_state_i : fixed_i     (strain)
        T_i = control_i ? fixed_i : mixed_state_i     (target stress)

    The constitutive sibling computes S(E); close the system with
    SR2EqualityConstraint(state/mixed_state: S == T) inside
    ImplicitUpdate — stress-controlled RVE loading without an outer
    iteration."""

    def __init__(self, name, params):
        super().__init__(name, params)
        import numpy as np

        ctl = params.get_float_vector("control", required=True)
        if len(ctl) != 6:
            params.error("control", "six Mandel-component flags (0/1)")
        self.control = np.asarray(ctl, float)
        self.fixed = params.get_str("fixed_values", "forces/fixed_values")
        self.state_var = params.get_str("mixed_state", "state/mixed_state")
        self.strain = params.get_str("strain", "forces/E")
        self.target = params.get_str("stress_target", "state/S_target")
        self.to_var = [self.strain, self.target]
        self.from_var = [self.fixed, self.state_var]

    def forward(self, env):
        c = jnp.asarray(self.control, env[self.fixed].dtype)
        fixed, mixed = env[self.fixed], env[self.state_var]
        return {self.strain: c * mixed + (1.0 - c) * fixed,
                self.target: c * fixed + (1.0 - c) * mixed}


class SR2EqualityConstraint(_NEML2Model):
    """residual/<variable> = a − b on Mandel SR2 fields: a generic
    equality-constraint residual emitter for ImplicitUpdate (marlin_tpu
    extension; the closure NEML2 builds into its mixed-control assembly).
    `variable` names the implicit unknown the constraint determines."""

    NCOMP = 6
    emits_residual = True

    def __init__(self, name, params):
        super().__init__(name, params)
        var = params.get_str("variable", required=True)
        self.state_var = var if "/" in var else f"state/{var}"
        if not self.state_var.startswith("state/"):
            # same check as ScalarBackwardEulerTimeIntegration: a non-state
            # variable would make to_var == state_var (the replace below is
            # a no-op) and ImplicitUpdate would silently solve a
            # nonsensical system (r05 review)
            params.error("variable",
                         "implicit constraints target a state/ variable")
        self.a = params.get_str("a", required=True)
        self.b = params.get_str("b", required=True)
        self.to_var = self.state_var.replace("state/", "residual/", 1)
        self.from_var = [self.a, self.b, self.state_var,
                         "old_" + self.state_var]

    def forward(self, env):
        return {self.to_var: env[self.a] - env[self.b]}


def _mu_input(params):
    """The Kocks-Mecking models scale by the shear modulus µ, which is
    temperature-dependent in real use.  `shear_modulus` accepts either a
    float literal (constant µ) or a variable name (compose a µ(T) model
    — e.g. ScalarLinearCombination over forces/T — upstream)."""
    return _float_or_var(params, "shear_modulus")


class KocksMeckingActivationEnergy(_NEML2Model):
    """Normalized activation energy of the Kocks-Mecking flow framework
    (NEML2 KocksMeckingActivationEnergy; Kocks & Mecking 2003):

        g = k·T/(µ·b³) · ln(ε̇0/ε̇)

    with Boltzmann constant k, Burgers vector b, shear modulus µ,
    reference strain rate ε̇0 and the current effective strain rate ε̇
    (e.g. a ScalarVariableRate of the equivalent plastic strain).  g is
    the master coordinate of the KM diagram: the rate-dependent flow
    stress follows ln(σf/µ) = A·g + B, the rate-independent yield sits
    at ln(σy/µ) = C, and the regimes cross at g0 = (C−B)/A
    (KocksMeckingFlowSwitch).  |ε̇| is floored at `rate_floor` so a
    virgin state (ε̇ = 0) gives a large FINITE g — the logarithm's pole
    would otherwise inf the value and NaN every jvp through it inside
    ImplicitUpdate (the r04 advisor failure mode)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.mu_var, self.mu = _mu_input(params)
        self.k = params.get_float("boltzmann_constant", 1.380649e-23)
        self.b = params.get_float("burgers_vector", required=True)
        self.eps0 = params.get_float("reference_strain_rate", required=True)
        self.rate_floor = params.get_float("rate_floor", 1e-20)
        self.T = params.get_str("temperature", "forces/T")
        self.rate = params.get_str("strain_rate",
                                   "state/internal/ep_rate")
        self.to_var = params.get_str("activation_energy",
                                     "state/internal/g")
        self.from_var = [self.T, self.rate] + (
            [self.mu_var] if self.mu_var else [])

    def forward(self, env):
        mu = env[self.mu_var] if self.mu_var else self.mu
        rate = jnp.maximum(jnp.abs(env[self.rate]), self.rate_floor)
        scale = self.k * env[self.T] / (mu * self.b ** 3)
        return {self.to_var: scale * jnp.log(self.eps0 / rate)}


class KocksMeckingRateSensitivity(_NEML2Model):
    """Power-law rate-sensitivity exponent implied by the Kocks-Mecking
    slope A (NEML2 KocksMeckingRateSensitivity):

        n = −µ·b³/(k·T·A)        (A < 0, so n > 0)

    — eliminating g between ln(σf/µ) = A·g + B and the definition of g
    gives σf = µ·e^B·(ε̇/ε̇0)^(1/n) with exactly this n, i.e. the KM
    line IS a Perzyna power law with temperature-dependent exponent.
    Feed n into PerzynaPlasticFlowRate's variable `exponent` (with
    KocksMeckingFlowViscosity as the variable `reference_stress`)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.mu_var, self.mu = _mu_input(params)
        self.A = params.get_float("A", required=True)
        if self.A == 0.0:
            params.error("A", "the Kocks-Mecking slope must be nonzero "
                              "(it divides the rate sensitivity)")
        self.k = params.get_float("boltzmann_constant", 1.380649e-23)
        self.b = params.get_float("burgers_vector", required=True)
        self.T = params.get_str("temperature", "forces/T")
        self.to_var = params.get_str("rate_sensitivity",
                                     "state/internal/n")
        self.from_var = [self.T] + ([self.mu_var] if self.mu_var else [])

    def forward(self, env):
        mu = env[self.mu_var] if self.mu_var else self.mu
        return {self.to_var: -mu * self.b ** 3 / (self.k * env[self.T]
                                                  * self.A)}


class KocksMeckingFlowViscosity(_NEML2Model):
    """Power-law flow viscosity implied by the Kocks-Mecking intercept B
    (NEML2 KocksMeckingFlowViscosity):

        η = e^B · µ · ε̇0^(−1/n),   n = −µ·b³/(k·T·A)

    so that σf = η·ε̇^(1/n) reproduces the KM rate-dependent branch
    ln(σf/µ) = A·g + B identically (the closed-form consistency is
    pinned in tests/test_neml2.py).  Compose with
    KocksMeckingRateSensitivity for the matching exponent."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.mu_var, self.mu = _mu_input(params)
        self.A = params.get_float("A", required=True)
        if self.A == 0.0:
            params.error("A", "the Kocks-Mecking slope must be nonzero "
                              "(it divides the rate sensitivity)")
        self.B = params.get_float("B", required=True)
        self.k = params.get_float("boltzmann_constant", 1.380649e-23)
        self.b = params.get_float("burgers_vector", required=True)
        self.eps0 = params.get_float("reference_strain_rate", required=True)
        self.T = params.get_str("temperature", "forces/T")
        self.to_var = params.get_str("flow_viscosity",
                                     "state/internal/eta")
        self.from_var = [self.T] + ([self.mu_var] if self.mu_var else [])

    def forward(self, env):
        mu = env[self.mu_var] if self.mu_var else self.mu
        n = -mu * self.b ** 3 / (self.k * env[self.T] * self.A)
        return {self.to_var:
                jnp.exp(self.B) * mu * self.eps0 ** (-1.0 / n)}


class KocksMeckingYieldStress(_NEML2Model):
    """Rate-independent yield stress of the Kocks-Mecking diagram (NEML2
    KocksMeckingYieldStress): σy = e^C·µ — the athermal plateau the flow
    stress saturates to below the critical activation energy g0."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.mu_var, self.mu = _mu_input(params)
        self.C = params.get_float("C", required=True)
        self.to_var = params.get_str("yield_stress",
                                     "state/internal/sy")
        self.from_var = [self.mu_var] if self.mu_var else []

    def forward(self, env):
        import math

        mu = env[self.mu_var] if self.mu_var else jnp.asarray(self.mu)
        return {self.to_var: math.exp(self.C) * mu}


class KocksMeckingFlowSwitch(_NEML2Model):
    """Blend rate-independent and rate-dependent flow rates across the
    Kocks-Mecking regime boundary (NEML2 KocksMeckingFlowSwitch):

        γ̇ = γ̇_RI·(1 − s) + γ̇_RD·s,
        s  = (1 + tanh(sharpness·(g − g0)))/2,   g0 = (C − B)/A

    g0 is where the KM rate-dependent line A·g + B crosses the athermal
    plateau C; below it (low T / fast loading) the response is
    rate-independent plasticity, above it rate-dependent creep/
    viscoplasticity.  The tanh blend (width ~1/sharpness in g) keeps the
    switch differentiable for ImplicitUpdate Jacobians — a hard select
    would put a kink exactly at the operating point of decks tuned to
    the transition."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.A = params.get_float("A", required=True)
        if self.A == 0.0:
            params.error("A", "the Kocks-Mecking slope must be nonzero "
                              "(it locates the regime boundary g0)")
        self.B = params.get_float("B", required=True)
        self.C = params.get_float("C", required=True)
        self.sharpness = params.get_float("sharpness", 1.0)
        self.g = params.get_str("activation_energy", "state/internal/g")
        self.ri = params.get_str("rate_independent_flow_rate",
                                 "state/internal/gamma_rate_ri")
        self.rd = params.get_str("rate_dependent_flow_rate",
                                 "state/internal/gamma_rate_rd")
        self.to_var = params.get_str("flow_rate",
                                     "state/internal/gamma_rate")
        self.from_var = [self.g, self.ri, self.rd]

    def forward(self, env):
        g0 = (self.C - self.B) / self.A
        s = 0.5 * (1.0 + jnp.tanh(self.sharpness * (env[self.g] - g0)))
        return {self.to_var: (1.0 - s) * env[self.ri] + s * env[self.rd]}


_MODEL_TYPES = {
    "ScalarMultiplication": ScalarMultiplication,
    "ScalarLinearCombination": ScalarLinearCombination,
    "ScalarParameterToState": ScalarParameterToState,
    "LinearIsotropicElasticity": LinearIsotropicElasticity,
    "SR2Invariant": SR2Invariant,
    "SR2LinearCombination": SR2LinearCombination,
    "ScalarForwardEulerTimeIntegration": ScalarForwardEulerTimeIntegration,
    "VoceIsotropicHardening": VoceIsotropicHardening,
    "LinearIsotropicHardening": LinearIsotropicHardening,
    "PerzynaPlasticFlowRate": PerzynaPlasticFlowRate,
    "YieldFunction": YieldFunction,
    "ComposedModel": ComposedModel,
    "J2RadialReturn": J2RadialReturn,
    "SR2ForwardEulerTimeIntegration": SR2ForwardEulerTimeIntegration,
    "Normality": Normality,
    "AssociativePlasticFlow": AssociativePlasticFlow,
    "AssociativeIsotropicPlasticHardening": AssociativeIsotropicPlasticHardening,
    "AssociativeKinematicPlasticFlow": AssociativeKinematicPlasticFlow,
    "LinearKinematicHardening": LinearKinematicHardening,
    "ChabochePlasticHardening": ChabochePlasticHardening,
    "ArrheniusParameter": ArrheniusParameter,
    "ScalarBackwardEulerTimeIntegration": ScalarBackwardEulerTimeIntegration,
    "SR2BackwardEulerTimeIntegration": SR2BackwardEulerTimeIntegration,
    "ImplicitUpdate": ImplicitUpdate,
    "RateIndependentPlasticFlowConstraint": RateIndependentPlasticFlowConstraint,
    "ThermalEigenstrain": ThermalEigenstrain,
    "PowerLawIsotropicHardening": PowerLawIsotropicHardening,
    "SlopeSaturationVoceIsotropicHardening":
        SlopeSaturationVoceIsotropicHardening,
    "PowerLawCreep": PowerLawCreep,
    "BlackburnCreep": BlackburnCreep,
    "IsotropicDamageEffectiveStress": IsotropicDamageEffectiveStress,
    "PlasticStrainDamageRate": PlasticStrainDamageRate,
    "GTNYieldFunction": GTNYieldFunction,
    "GursonCavitation": GursonCavitation,
    "ScalarVariableRate": ScalarVariableRate,
    "SR2VariableRate": SR2VariableRate,
    "ResolvedShear": ResolvedShear,
    "SingleSlipStrengthMap": SingleSlipStrengthMap,
    "PowerLawSlipRule": PowerLawSlipRule,
    "SumSlipRates": SumSlipRates,
    "VoceSingleSlipHardening": VoceSingleSlipHardening,
    "PlasticDeformationRate": PlasticDeformationRate,
    "MixedControlSetup": MixedControlSetup,
    "SR2EqualityConstraint": SR2EqualityConstraint,
    "OlevskySinteringStress": OlevskySinteringStress,
    "PlasticVorticity": PlasticVorticity,
    "OrientationRate": OrientationRate,
    "PowerDegradationFunction": PowerDegradationFunction,
    "StrainEnergyDensity": StrainEnergyDensity,
    "VecForwardEulerTimeIntegration": VecForwardEulerTimeIntegration,
    "VecBackwardEulerTimeIntegration": VecBackwardEulerTimeIntegration,
    "KocksMeckingActivationEnergy": KocksMeckingActivationEnergy,
    "KocksMeckingRateSensitivity": KocksMeckingRateSensitivity,
    "KocksMeckingFlowViscosity": KocksMeckingFlowViscosity,
    "KocksMeckingYieldStress": KocksMeckingYieldStress,
    "KocksMeckingFlowSwitch": KocksMeckingFlowSwitch,
}


def load_neml2_model(path: str, model_name: str, cli_args: List[str] = ()):
    """Parse a NEML2 HIT input file and instantiate the named model.

    Supported subset: the algebra models in _MODEL_TYPES.  NEML2's
    [Settings] block is accepted (precision handled by the Domain)."""
    from .. import hit

    root = hit.load(path, list(cli_args))
    models = root.children.get("Models")
    if models is None:
        raise NEML2Error(f"No [Models] block in NEML2 input '{path}'")
    node = models.children.get(model_name)
    if node is None:
        raise NEML2Error(
            f"Model '{model_name}' not found in '{path}' "
            f"(available: {sorted(models.children)})"
        )
    p = Params(node)
    mtype = p.get_str("type", required=True)
    if mtype not in _MODEL_TYPES:
        raise NEML2Error(
            f"NEML2 model type '{mtype}' is not in marlin_tpu's supported "
            f"subset {sorted(_MODEL_TYPES)} (reference wraps the full NEML2 "
            "library; see computes/neml2.py)"
        )
    return _MODEL_TYPES[mtype](model_name, p)


@computes.register("NEML2TensorCompute")
class NEML2TensorCompute(TensorCompute):
    """Deck surface of reference NEML2TensorCompute.C: map marlin buffers to
    NEML2 variables, run the model, map outputs back."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.marlin_inputs = params.get_str_vector("marlin_inputs", [])
        self.neml2_inputs = params.get_str_vector("neml2_inputs", [])
        self.neml2_outputs = params.get_str_vector("neml2_outputs", [])
        self.marlin_outputs = params.get_str_vector("marlin_outputs", [])
        if len(self.marlin_inputs) != len(self.neml2_inputs):
            params.error("neml2_inputs", "one NEML2 variable per marlin input")
        if len(self.marlin_outputs) != len(self.neml2_outputs):
            params.error("marlin_outputs", "one marlin buffer per NEML2 output")

        fname = params.get_str("neml2_input_file", required=True)
        from .nn import resolve_data_file

        # same resolution rules as every other data file (deck-relative,
        # cwd, registered data roots)
        fname = resolve_data_file(fname, getattr(problem, "deck_dir", None))
        self.model = load_neml2_model(
            fname,
            params.get_str("neml2_model", required=True),
            params.get_str_vector("cli_args", []),
        )
        # every model input must be mapped, or forward() would die with a
        # bare KeyError from inside the jitted step
        needed = set(getattr(self.model, "from_var", []) or [])
        missing = needed - set(self.neml2_inputs)
        if missing:
            raise ComputeError(
                f"NEML2TensorCompute '{name}': model variables "
                f"{sorted(missing)} are not mapped by neml2_inputs "
                f"(mapped: {self.neml2_inputs})"
            )

        for b in self.marlin_inputs:
            if b not in self.inputs:
                self.inputs.append(b)
        self.outputs = list(self.marlin_outputs)

    def apply(self, state, ctx):
        env = {
            nv: state[mb] for mb, nv in zip(self.marlin_inputs, self.neml2_inputs)
        }
        result = self.model.forward(env)
        out = {}
        for nv, mb in zip(self.neml2_outputs, self.marlin_outputs):
            if nv not in result:
                raise ComputeError(
                    f"NEML2 model '{self.model.name}' did not produce '{nv}'"
                )
            arr = result[nv]
            declared = self.problem.declared_buffer_shape(mb)
            if declared is not None:
                # broadcast to the TARGET buffer's declared shape (grid dims
                # + trailing value dims).  Deciding from arr.ndim instead
                # (r03 advisor finding) breaks spatially-constant
                # tensor-valued results: a (6,) Mandel SR2 on a 3-D grid
                # must become grid+(6,), not raise / mis-tile.
                arr = jnp.broadcast_to(arr, declared)
            elif arr.ndim <= self.domain.dim:
                # implicit buffer: scalar results broadcast over the grid;
                # tensor-valued ones keep their trailing axes
                arr = jnp.broadcast_to(arr, self.domain.shape)
            out[mb] = arr.astype(self.domain.dtype)
        return out
