"""FFT micromechanics computes (deGeus-style Galerkin FFT solver).

Re-designs of:
- reference src/tensor_computes/FFTMechanics.C:76-163 (Green projection +
  Newton/CG matrix-free solve)
- reference src/tensor_computes/HyperElasticIsotropic.C:42-52
- reference src/tensor_computes/ComputeDisplacements.C
- reference src/tensor_computes/ComputeVonMisesStress.C
- reference src/tensor_computes/FFTQuasistaticElasticity.C:96-160
- reference src/tensor_computes/FFTElasticChemicalPotential.C
- reference src/tensor_computes/RankTwoIdentity.C
- reference src/utils/MarlinUtils.C:139-186 (einsum helpers) and
  include/utils/MarlinUtils.h:55-131 (conjugate gradient)
- test-only computes MacroscopicShearTensor / PhaseMechanicsTest
  (reference test/src/tensor_computes/)

The reference's Newton and CG loops sync to the host every iteration
(`.item()` calls, two per CG iteration); here both loops are
``lax.while_loop``s with carried norms — the whole RVE solve is one XLA
program with zero host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Params
from ..registry import computes
from .base import ComputeError, TensorCompute

# -- einsum helpers (reference MarlinUtils.C:139-186) -----------------------
#
# Precision policy (bisected on the real TPU, r03):
# - MATERIALIZED small-grid path: HIGHEST.  XLA's DEFAULT lowers these
#   small contractions onto the MXU at bf16-class precision, flooring the
#   Newton/CG residual ~1e-3 relative — above typical deck tolerances
#   (nl_rel_tol = 2e-4 in mech.i), so the solve exhausts nl_max_its.
#   With HIGHEST, mech.i matches its f64 gold to 3e-6 on the chip.
# - ANALYTIC large-grid path: DEFAULT for dot22.  Every exact formulation
#   tried in that program (HIGHEST dot_general, stack-unrolled,
#   broadcast-unrolled) crashes the axon TPU worker mid-run on the deGeus
#   32^3 RVE; DEFAULT has always converged there (the analytic tangent
#   contraction itself is exact unrolled scalar VPU math).
# - The Green projection's complex contractions are unrolled multiply-adds
#   (exact f32, no dot_general — complex einsum at HIGHEST also crashes).
_HI = jax.lax.Precision.HIGHEST


def trans2(A2):
    return jnp.einsum("...ij->...ji", A2)


def ddot42(A4, B2):
    return jnp.einsum("...ijkl,...lk->...ij", A4, B2, precision=_HI)


def ddot44(A4, B4):
    return jnp.einsum("...ijkl,...lkmn->...ijmn", A4, B4, precision=_HI)


def dot22(A2, B2):
    # DEFAULT precision, deliberately: this form runs in the ANALYTIC
    # (large-grid) path, where the axon TPU worker CRASHES mid-run on any
    # exact formulation (HIGHEST dot_general, stack-unrolled, and
    # broadcast-unrolled all reproduce the crash on the deGeus 32^3 RVE;
    # bisected r03).  The analytic path has always converged at DEFAULT.
    return jnp.einsum("...ij,...jk->...ik", A2, B2)


def dot22_hi(A2, B2):
    # exact (HIGHEST) variant for the MATERIALIZED small-grid path, where
    # bf16-class DEFAULT floors the Newton residual above deck tolerances
    # (mech.i converges to 3e-6 of its f64 gold with this, and exhausts
    # nl_max_its without it); the materialized program runs HIGHEST
    # dot_general without incident on the same backend.
    return jnp.einsum("...ij,...jk->...ik", A2, B2, precision=_HI)


def dot24(A2, B4):
    return jnp.einsum("...ij,...jkmn->...ikmn", A2, B4, precision=_HI)


def dot42(A4, B2):
    return jnp.einsum("...ijkl,...lm->...ijkm", A4, B2, precision=_HI)


def dyad22(A2, B2):
    return jnp.einsum("...ij,...kl->...ijkl", A2, B2)


def conjugate_gradient(A, b, x0, tol, maxiter, Minv=None):
    """Matrix-free CG with relative-to-|b| convergence
    (reference conjugateGradientSolve, include/utils/MarlinUtils.h:55-131).
    Runs as a lax.while_loop; returns (x, iterations, residual_norm).

    `Minv` enables left preconditioning (z = M⁻¹r); None is plain CG.
    One body serves both (r05 review: two drifting copies): with the
    identity preconditioner z aliases r, so sum(r*z) is the same HLO as
    sum(r*r) and the iteration stays BIT-IDENTICAL to the reference
    (gold parity tests pin it).  Convergence is on the TRUE residual
    relative to |b| either way, so a preconditioned solve stops at the
    same physical accuracy.

    Breakdown guard (beyond the reference, which returns whatever iterate
    maxiter lands on): the Green-projected tangent is positive
    SEMI-definite, so when a tolerance below the operator's floor keeps CG
    iterating, roundoff (amplified under sharded-FFT reduction ordering)
    injects null-space components until p·Ap ≈ 0 and the iterates explode
    — measured |F| ~ 2e6 on the tight-tolerance mech3d deck at 4 slab
    ranks.  The guard skips the update on a non-positive p·Ap (or a
    non-positive r·z under an indefinite-roundoff preconditioner), stops
    on NaN or a 100× residual-growth, and returns the best iterate seen
    (a truncated inexact-Newton step).  In the convergent regime none of
    this triggers."""
    apply_Minv = Minv if Minv is not None else (lambda r: r)
    b_norm = jnp.linalg.norm(b)
    x = x0
    r = b - A(x)
    z0 = apply_Minv(r)
    p = z0
    rz0 = jnp.sum(r * z0)
    r0_norm = jnp.linalg.norm(r)
    growth_cap = 100.0 * jnp.maximum(b_norm, r0_norm)

    def cond(carry):
        x, r, p, rz_old, k, res_norm, done, x_best, res_best, blown = carry
        return (~done) & (k < maxiter)

    def body(carry):
        x, r, p, rz_old, k, res_norm, done, x_best, res_best, blown = carry
        Ap = A(p)
        pAp = jnp.sum(p * Ap)
        broke = (pAp <= 0.0) | (rz_old <= 0.0)
        alpha = jnp.where(broke, 0.0, rz_old / jnp.where(broke, 1.0, pAp))
        x = x + alpha * p
        r = r - alpha * Ap
        res_norm = jnp.linalg.norm(r)
        improved = res_norm < res_best
        x_best = jnp.where(improved, x, x_best)
        res_best = jnp.minimum(res_norm, res_best)
        diverged = broke | jnp.isnan(res_norm) | (res_norm > growth_cap)
        done = (res_norm <= tol * b_norm) | diverged
        z = apply_Minv(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz_old == 0.0, 1.0, rz_old)
        p = jnp.where(done, p, z + beta * p)
        return (x, r, p, rz_new, k + 1, res_norm, done,
                x_best, res_best, blown | diverged)

    init = (x, r, p, rz0, jnp.zeros((), jnp.int32), r0_norm,
            b_norm == 0.0, x, r0_norm, jnp.asarray(False))
    (x, r, p, rz, k, res_norm, done,
     x_best, res_best, blown) = jax.lax.while_loop(cond, body, init)
    # only a blown solve substitutes the best iterate — the convergent
    # path returns the final x unchanged (bit-exact gold parity)
    return (jnp.where(blown, x_best, x), k,
            jnp.where(blown, res_best, res_norm))


def preconditioned_conjugate_gradient(A, Minv, b, x0, tol, maxiter):
    """Left-preconditioned CG — `conjugate_gradient` with Minv bound
    (kept as a named entry point for tests/direct callers)."""
    return conjugate_gradient(A, b, x0, tol, maxiter, Minv=Minv)


def _identity_tensors(dim, dtype):
    ti = jnp.eye(dim, dtype=dtype)
    tI4 = jnp.einsum("il,jk->ijkl", ti, ti)
    tI4rt = jnp.einsum("ik,jl->ijkl", ti, ti)
    tI4s = (tI4 + tI4rt) / 2.0
    tII = dyad22(ti, ti)
    return ti, tI4, tI4rt, tI4s, tII


@computes.register("HyperElasticIsotropic")
class HyperElasticIsotropic(TensorCompute):
    """St.Venant-Kirchhoff-style hyperelasticity: S = C:(FᵀF−I)/2, P = F·S,
    consistent tangent K4 (reference HyperElasticIsotropic.C:42-52)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.F = self.input_buffer("F")
        self.mu = self.input_buffer("mu")
        self.K = self.input_buffer("K")
        self.tangent = params.get_str("tangent_operator", "dstressdstrain")
        self.outputs = [self.out, self.tangent]
        #: set False by FFTMechanics when nothing else consumes the rank-4
        #: tangent buffer — apply() then emits the stress only and the
        #: Newton/CG loop contracts the tangent analytically
        #: (tangent_contract), never materializing N·dim⁴ fields
        self.emit_tangent = True

    def _second_pk(self, F, Km, mu, ti):
        """S = C:E without materializing C4: C4 = K·II + 2µ(I4s − II/3)
        contracts with the (symmetric) Green-Lagrange strain to
        S = K·tr(E)·I + 2µ·(E − tr(E)/3·I)."""
        E = 0.5 * (dot22(trans2(F), F) - ti)
        trE = jnp.einsum("...ii->...", E)[..., None, None]
        return Km * trE * ti + 2.0 * mu * (E - trE / 3.0 * ti)

    def apply(self, state, ctx):
        dim = self.domain.dim
        dtype = self.domain.dtype
        ti, tI4, tI4rt, tI4s, tII = _identity_tensors(dim, dtype)
        F = state[self.F]
        if not self.emit_tangent:
            Km = state[self.K][..., None, None]
            mu = state[self.mu][..., None, None]
            P = dot22(F, self._second_pk(F, Km, mu, ti))
            return {self.outputs[0]: P}
        # materialized path: the exact op order of the reference
        # (HyperElasticIsotropic.C:42-52) for 1e-13 gold parity.
        # NOTE on 128³+ grids: XLA lowers these broadcast δ-tensor einsums
        # to a conv whose temporary scales like N·dim⁶ (19 GB at 128³,
        # measured OOM at compile time) — which is why FFTMechanics switches
        # to the analytic tangent_contract on large grids
        Km = state[self.K][..., None, None, None, None]
        mu = state[self.mu][..., None, None, None, None]
        C4 = Km * tII + 2.0 * mu * (tI4s - tII / 3.0)
        S = ddot42(C4, 0.5 * (dot22_hi(trans2(F), F) - ti))
        P = dot22_hi(F, S)
        K4 = dot24(S, tI4) + ddot44(
            ddot44(tI4rt, dot42(dot24(F, C4), trans2(F))), tI4rt
        )
        return {self.outputs[0]: P, self.tangent: K4}

    def tangent_fields(self, scope):
        """The loop-invariant component fields of the analytic contraction
        (functions of F/K/µ only) — computed ONCE per Newton iteration so
        the CG while_loop reuses them instead of rebuilding E/S/B per
        iteration."""
        d = self.domain.dim
        K = scope[self.K]
        mu = scope[self.mu]
        F = scope[self.F]
        Fc = [[F[..., i, j] for j in range(d)] for i in range(d)]
        E = [[0.5 * (sum(Fc[k][i] * Fc[k][j] for k in range(d))
                     - (1.0 if i == j else 0.0))
              for j in range(d)] for i in range(d)]
        trE = sum(E[i][i] for i in range(d))
        S = [[K * trE * (1.0 if i == j else 0.0)
              + 2.0 * mu * (E[i][j] - (trE / 3.0 if i == j else 0.0))
              for j in range(d)] for i in range(d)]
        B = [[sum(Fc[i][k] * Fc[j][k] for k in range(d))
              for j in range(d)] for i in range(d)]
        c = K - 2.0 * mu / 3.0
        return (Fc, S, B, c, mu)

    def tangent_apply(self, fields, dF):
        """trans2(ddot42(K4, trans2(dF))) evaluated WITHOUT K4.

        With B = F·Fᵀ and c = K − 2µ/3, the assembled tangent is
          K4_ijkl = S_il δ_jk + c F_ji F_kl + µ B_jk δ_il + µ F_jl F_ki ,
        so the CG operator's contraction Σ_kl K4_ijkl dF_kl reduces to four
        batched dim×dim matmuls:
          out = S·dFᵀ + c·(F:dF)·Fᵀ + (B·dF)ᵀ·µ + µ·Fᵀ·dF·Fᵀ .
        N·dim³ work and N·dim² traffic per CG iteration instead of reading
        an N·dim⁴ tangent — and no conv-lowered δ-contractions, which is
        what lets 128³ RVEs compile on a 16 GB v5e (VERDICT r01 item 4).

        The sums are fully unrolled over tensor components so every
        intermediate is a plain (nx, ny, nz) scalar field: XLA's remat
        compression inside the CG while_loop otherwise materializes
        (…, 3, 3)-trailing temporaries in a minor-dim tiled layout with a
        57× padding expansion (measured 24 GB at 128³)."""
        d = self.domain.dim
        Fc, S, B, c, mu = fields
        dFc = [[dF[..., i, j] for j in range(d)] for i in range(d)]
        FdF = sum(Fc[i][j] * dFc[i][j] for i in range(d) for j in range(d))
        # T[k][j] = Σ_l dF_kl F_jl
        T = [[sum(dFc[k][l] * Fc[j][l] for l in range(d))
              for j in range(d)] for k in range(d)]
        out = [[
            sum(S[i][l] * dFc[j][l] for l in range(d))
            + c * Fc[j][i] * FdF
            + mu * sum(B[j][k] * dFc[k][i] for k in range(d))
            + mu * sum(Fc[k][i] * T[k][j] for k in range(d))
            for j in range(d)] for i in range(d)]
        # result = outᵀ, assembled once at the end
        return jnp.stack(
            [jnp.stack([out[j][i] for j in range(d)], axis=-1)
             for i in range(d)], axis=-2)

    def tangent_contract(self, scope, dF):
        return self.tangent_apply(self.tangent_fields(scope), dF)


@computes.register("RankTwoIdentity")
class RankTwoIdentity(TensorCompute):
    """F = I everywhere (reference RankTwoIdentity.C)."""

    def apply(self, state, ctx):
        dom = self.domain
        eye = jnp.eye(dom.dim, dtype=dom.dtype)
        return {self.out: jnp.broadcast_to(eye, dom.value_shape((dom.dim, dom.dim)))}


def newton_exhausted_message(name):
    """Error raised when a Newton solve runs out of iterations (reference
    FFTMechanics.C "Exceeded the maximum number of nonlinear iterations")."""
    return (
        f"FFTMechanics '{name}': Exceeded the maximum number of "
        "nonlinear iterations without converging (reference "
        "FFTMechanics.C error; raise nl_max_its or loosen nl_*_tol)"
    )


@computes.register("FFTMechanics")
class FFTMechanics(TensorCompute):
    """Galerkin FFT micromechanics: Ĝ projection built once, Newton loop with
    matrix-free CG over G(K:dF) (reference FFTMechanics.C:96-163)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.F = self.input_buffer("F", required=False) or "F"
        if self.F not in self.inputs:
            self.inputs.append(self.F)
        self.K = self.input_buffer("K")
        self.mu = self.input_buffer("mu", required=False)
        self.stress = params.get_str("stress", "stress")
        self.tangent = params.get_str("tangent_operator", "dstressdstrain")
        self.applied = params.get_str("applied_macroscopic_strain", None)
        if self.applied and self.applied not in self.inputs:
            self.inputs.append(self.applied)
        self.l_tol = params.get_float("l_tol", 1e-2)
        self.l_max_its = params.get_int("l_max_its", 0)
        self.nl_rel_tol = params.get_float("nl_rel_tol", 1e-5)
        self.nl_abs_tol = params.get_float("nl_abs_tol", 1e-8)
        self.nl_max_its = params.get_int("nl_max_its", 100)
        self.constitutive_name = params.get_str("constitutive_model", required=True)
        self.constitutive = None  # bound in check()
        # convergence diagnostic: a pseudo-buffer ANDed across substeps and
        # checked at the executioner's per-step host sync (a jax.debug
        # callback here would lower to host send/recv, which the axon TPU
        # backend does not implement)
        self.converged_key = f"__converged_{name}__"
        # analytic tangent contraction: 'auto' (default) keeps the
        # reference's exact op order on gold-test-sized grids (1e-13
        # parity; the reference specs run 32² and 16³) and switches above
        # 8192 cells, where the analytic operator measured 1.43× faster at
        # 64³ and is the only form that compiles at 128³ on a 16 GB chip;
        # 'true'/'false' force
        self.analytic_param = params.get_enum(
            "analytic_tangent", ["auto", "true", "false"], "auto"
        )
        self.analytic_tangent = False  # resolved in check()
        # CG preconditioning (marlin_tpu extension; the reference's CG is
        # unpreconditioned, include/utils/MarlinUtils.h:55-131):
        # REFERENCE_MEDIUM applies the inverse of the homogeneous
        # Green-projected isotropic tangent built from the volume-average
        # moduli — the classic Moulinec-Suquet reference medium, a
        # closed-form per-k 3x3 solve costing one extra FFT pair per CG
        # iteration and cutting iteration counts with the phase contrast.
        # Default NONE keeps the reference-exact iteration (gold parity).
        self.precond = params.get_enum(
            "preconditioner", ["NONE", "REFERENCE_MEDIUM"], "NONE")

    def _tangent_referenced_in_deck(self) -> bool:
        """True if any deck parameter other than a `tangent_operator`
        declaration references the tangent buffer — i.e. something besides
        the Newton/CG loop consumes the materialized rank-4 field."""
        target = self.tangent

        def walk(node):
            for key, val in node.params.items():
                if key == "tangent_operator":
                    continue
                if target in str(val).split():
                    return True
            return any(walk(ch) for ch in node.blocks())

        return walk(self.problem.root)

    def check(self):
        self.constitutive = self.problem.get_compute(self.constitutive_name)
        if self.stress not in self.constitutive.outputs:
            raise ComputeError(
                f"constitutive_model '{self.constitutive_name}' does not "
                f"provide stress tensor '{self.stress}'."
            )
        # analytic-tangent fast path: contract K4:dF algebraically, never
        # materializing the rank-4 tangent (runs at init_state check time,
        # before any tracing).  Requirements: the constitutive model
        # supports it and nothing else in the deck reads the tangent
        # buffer.  Default 'auto' keeps the reference's exact op order
        # (1e-13 gold parity) on gold-test-sized grids and switches above
        # 8192 cells (1.43× faster at 64³; the only form that compiles at
        # 128³)
        want = self.analytic_param
        if want == "auto":
            want = (
                "true"
                if self.problem.domain.n_cells_global > 8192
                else "false"
            )
        self.analytic_tangent = (
            want == "true"
            # apply() calls the hoisted tangent_fields/tangent_apply pair;
            # gate on the methods actually used so a model with only the
            # older tangent_contract interface falls back to the
            # materialized form instead of failing inside the Newton trace
            and hasattr(self.constitutive, "tangent_fields")
            and hasattr(self.constitutive, "tangent_apply")
            and not self._tangent_referenced_in_deck()
        )
        if self.analytic_tangent:
            self.constitutive.emit_tangent = False
            ct = getattr(self.constitutive, "tangent", None)
            if ct in self.constitutive.outputs:
                self.constitutive.outputs.remove(ct)

    def apply(self, state, ctx):
        if self.constitutive is None:
            self.check()
        dom = self.domain
        dim = dom.dim
        r2_shape = dom.value_shape((dim, dim))

        # Green projection applied FACTORIZED (reference FFTMechanics.C:76-87
        # builds Ĝ_ijlm = δ_im q_j q_l/|q|² once and ddot42-contracts it):
        #   (Ĝ : B)_ij = Σ_kl δ_il q_j q_k/|q|² B_lk = q_j · (Σ_k q_k B_ik)/|q|²
        # so the rank-4 tensor never materializes — it would otherwise be
        # inlined into the HLO as an N·dim⁴ complex literal (87 MB at 64³,
        # rejected by the remote-compile endpoint) AND re-read every CG
        # iteration (dim⁴/dim² = 9× the field's own traffic).  The two
        # (…,dim) factor fields are materialized ONCE per solve (hoisted
        # out of the Newton/CG while_loops as closure constants).
        rshape = dom.reciprocal_shape
        qvec = jnp.stack(
            [
                jnp.broadcast_to(
                    jnp.asarray(dom.reciprocal_axis(d), dtype=dom.dtype), rshape
                )
                for d in range(dim)
            ],
            axis=-1,
        )  # (*recip, dim)
        k2 = dom.k_square
        inv_k2 = jnp.where(k2 == 0, 0.0, 1.0 / jnp.where(k2 == 0, 1.0, k2))
        qn = qvec * inv_k2[..., None]  # q_j / |q|²

        def G(A2):
            # COMPLEX contractions, unrolled over dim <= 3: complex
            # dot_general at Precision.HIGHEST crashes the axon TPU worker
            # at runtime (r03 measurement — the deGeus 32^3 CG loop died
            # mid-execution), and DEFAULT would round through bf16.
            # Explicit multiply-adds run on the VPU at true f32 — exact,
            # portable, and the same FLOPs.
            Bh = dom.fft(A2)  # (*recip, dim, dim)
            s = jnp.stack(
                [sum(Bh[..., i, k] * qvec[..., k] for k in range(dim))
                 for i in range(dim)], axis=-1)
            out = s[..., :, None] * qn[..., None, :]
            return dom.ifft(out).reshape(-1)

        Minv = None
        if self.precond == "REFERENCE_MEDIUM":
            if self.mu is None:
                raise ComputeError(
                    f"FFTMechanics '{self.name}': preconditioner = "
                    "REFERENCE_MEDIUM needs the `mu` buffer (isotropic "
                    "reference moduli come from the K/mu volume averages)")
            # volume-average isotropic reference medium: lam0 = K - 2mu/3
            # (3-D convention; preconditioner quality only — any SPD
            # constant-coefficient medium is admissible)
            mu0 = jnp.mean(state[self.mu]).astype(dom.dtype)
            lam0 = (jnp.mean(state[self.K]) - 2.0 * mu0 / 3.0).astype(
                dom.dtype)
            # Every CG residual lies in range(G), i.e. r̂_ij = rho_i q_j/|q|²
            # with rho_i = Σ_j r̂_ij q_j.  On that range the homogeneous
            # operator A0 dF = G(K0 : dF) reduces per k-point to
            #   A0(w ⊗ q/|q|²) = [mu0·w + (lam0+mu0)(w·q) q/|q|²] ⊗ q/|q|²
            # whose closed-form inverse is
            #   w = rho/mu0 − (lam0+mu0)/((lam0+2mu0)·mu0) · (rho·q) q/|q|²
            # — an elementwise VPU solve, no linear algebra custom calls.
            cfac = (lam0 + mu0) / ((lam0 + 2.0 * mu0) * mu0)

            def Minv(rm):
                Rh = dom.fft(rm.reshape(r2_shape))  # (*recip, dim, dim)
                rho = jnp.stack(
                    [sum(Rh[..., i, j] * qvec[..., j] for j in range(dim))
                     for i in range(dim)], axis=-1)  # (*recip, dim)
                rho_q = sum(rho[..., k] * qvec[..., k] for k in range(dim))
                w = rho / mu0 - (cfac * rho_q * inv_k2)[..., None] * qvec
                zh = w[..., :, None] * qn[..., None, :]
                return dom.ifft(zh).reshape(-1)

        if self.analytic_tangent:
            # the S/B/c component fields are loop-invariant inside CG:
            # build them once per scope (Newton iteration) and close the
            # operator over them
            def make_op(s):
                fields = self.constitutive.tangent_fields(s)
                return lambda dFm: G(self.constitutive.tangent_apply(
                    fields, dFm.reshape(r2_shape)))
        else:
            def make_op(s):
                return lambda dFm: G(trans2(
                    ddot42(s[self.tangent], trans2(dFm.reshape(r2_shape)))
                ))

        scope = dict(state)
        scope[self.out] = scope[self.F]

        def run_constitutive(scope):
            scope = dict(scope)
            scope.update(self.constitutive.apply(scope, ctx))
            return scope

        scope = run_constitutive(scope)

        if self.applied is not None:
            applied = jnp.broadcast_to(scope[self.applied], r2_shape)
            b = -make_op(scope)(applied.reshape(-1))
            scope[self.out] = scope[self.out] + applied
        else:
            b = -make_op(scope)(jnp.zeros_like(scope[self.out]).reshape(-1))

        Fn = jnp.linalg.norm(scope[self.out])
        l_max = self.l_max_its if self.l_max_its else dom.n_cells_global
        carried_keys = sorted({self.out, *self.constitutive.outputs})

        def pack(scope):
            return {k: scope[k] for k in carried_keys}

        def unpack(carry_scope):
            s = dict(scope)
            s.update(carry_scope)
            return s

        def cond(carry):
            iiter, dFm, b, cscope, done = carry
            return (~done) & (iiter <= self.nl_max_its)

        def body(carry):
            iiter, dFm, b, cscope, done = carry
            s = unpack(cscope)
            dFm, k, lnorm = conjugate_gradient(
                make_op(s), b, dFm, self.l_tol, l_max, Minv=Minv
            )
            s[self.out] = s[self.out] + dFm.reshape(r2_shape)
            s = run_constitutive(s)
            b = -G(s[self.stress])
            anorm = jnp.linalg.norm(dFm)
            rnorm = anorm / Fn
            done = ((rnorm < self.nl_rel_tol) | (anorm < self.nl_abs_tol)) & (
                iiter > 0
            )
            return (iiter + 1, dFm, b, pack(s), done)

        dFm0 = jnp.zeros_like(b)
        init = (jnp.zeros((), jnp.int32), dFm0, b, pack(scope), jnp.asarray(False))
        iiter, dFm, b, cscope, done = jax.lax.while_loop(cond, body, init)
        # the reference hard-errors when nl_max_its is exhausted
        # (FFTMechanics.C "Exceeded the maximum number of nonlinear
        # iterations without converging"); silently continuing would write
        # unconverged fields into outputs.  The flag rides the state as a
        # pseudo-buffer (ANDed across substeps; pre-seeded True at init so
        # the substep-loop carry structure is stable) and the executioner
        # raises at its per-step host sync — a jax.debug callback here
        # would need host send/recv, unimplemented on the axon TPU backend.
        out = {k: cscope[k] for k in carried_keys}
        prev = state.get(self.converged_key, jnp.asarray(True))
        out[self.converged_key] = prev & done
        return out


@computes.register("ComputeVonMisesStress")
class ComputeVonMisesStress(TensorCompute):
    """Von Mises stress from the stress tensor
    (reference ComputeVonMisesStress.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.stress = params.get_str("stress", "stress")
        if self.stress not in self.inputs:
            self.inputs.append(self.stress)

    def apply(self, state, ctx):
        s = state[self.stress]
        if self.domain.dim == 3:
            sxx, syy, szz = s[..., 0, 0], s[..., 1, 1], s[..., 2, 2]
            sxy, syz, szx = s[..., 0, 1], s[..., 1, 2], s[..., 2, 0]
            u = jnp.sqrt(
                0.5
                * (
                    (sxx - syy) ** 2
                    + (syy - szz) ** 2
                    + (szz - sxx) ** 2
                    + 6.0 * (sxy**2 + syz**2 + szx**2)
                )
            )
        elif self.domain.dim == 2:
            sxx, syy, sxy = s[..., 0, 0], s[..., 1, 1], s[..., 0, 1]
            u = jnp.sqrt(0.5 * ((sxx - syy) ** 2 + 6.0 * sxy**2))
        else:
            raise ComputeError("Unsupported problem dimension")
        return {self.out: u}


@computes.register("ComputeDisplacements")
class ComputeDisplacements(TensorCompute):
    """Integrate displacements from F in k-space and interpolate to the n+1
    node grid (reference ComputeDisplacements.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.F = self.input_buffer("F")

    def apply(self, state, ctx):
        dom = self.domain
        dim = dom.dim
        F = state[self.F]
        I3 = jnp.eye(dim, dtype=dom.dtype)
        Fbox = dom.average(F)
        Hbar = dom.fft(F - Fbox)
        q = dom.k_grid * (-1j)
        Q = dom.k_square
        # complex contraction unrolled (see G() in FFTMechanics: complex
        # einsum at HIGHEST precision crashes the axon worker)
        numer = jnp.stack(
            [sum(Hbar[..., i, j] * q[..., j] for j in range(dim))
             for i in range(dim)], axis=-1)
        denom = Q[..., None]
        u_periodic_bar = jnp.where(denom == 0, 0.0, numer / denom)
        X = dom.x_grid
        u_aff = jnp.einsum("ij,...j->...i", Fbox - I3, X, precision=_HI)
        u_periodic = dom.ifft(u_periodic_bar)
        u = u_aff + u_periodic

        # bilinear/trilinear interpolation to the (n+1)^dim node grid with
        # align_corners=true (reference uses torch interpolate)
        from jax.scipy.ndimage import map_coordinates

        out_shape = tuple(n + 1 for n in dom.shape)
        grids = [
            jnp.linspace(0.0, dom.shape[d] - 1.0, out_shape[d]) for d in range(dim)
        ]
        mesh = jnp.meshgrid(*grids, indexing="ij")

        def interp_component(comp):
            return map_coordinates(comp, mesh, order=1, mode="nearest")

        comps = [interp_component(u[..., i]) for i in range(dim)]
        return {self.out: jnp.stack(comps, axis=-1)}


@computes.register("FFTQuasistaticElasticity")
class FFTQuasistaticElasticity(TensorCompute):
    """Homogeneous quasistatic elasticity: 3x3 acoustic tensor solve with
    eigenstrain rhs, k=0 pinned (reference FFTQuasistaticElasticity.C:96-160).
    The reference multiplies the (already-angular) reciprocal axes by another
    2*pi*i — replicated for parity."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.displacements = params.get_str_vector("displacements", required=True)
        self.outputs = list(self.displacements)
        self.cbar = self.input_buffer("cbar")
        self.mu = params.get_float("mu", required=True)
        self.lam = params.get_float("lambda", required=True)
        self.e0 = params.get_float("e0", required=True)
        if problem.domain.dim != len(self.displacements):
            params.error(
                "displacements", "Need one displacement variable per mesh dimension"
            )

    def apply(self, state, ctx):
        dom = self.domain
        two_pi_i = 2.0j * jnp.pi
        k = [two_pi_i * dom.reciprocal_axis(d) for d in range(3)]
        ul = 2.0 * self.mu + self.lam
        mu, lam = self.mu, self.lam
        shape = dom.reciprocal_shape
        Axx = jnp.broadcast_to(ul * k[0] * k[0] + mu * k[1] * k[1] + mu * k[2] * k[2], shape)
        Ayy = jnp.broadcast_to(ul * k[1] * k[1] + mu * k[0] * k[0] + mu * k[2] * k[2], shape)
        Azz = jnp.broadcast_to(ul * k[2] * k[2] + mu * k[0] * k[0] + mu * k[1] * k[1], shape)
        Axy = jnp.broadcast_to((lam + mu) * k[0] * k[1], shape)
        Axz = jnp.broadcast_to((lam + mu) * k[0] * k[2], shape)
        Ayz = jnp.broadcast_to((lam + mu) * k[1] * k[2], shape)
        # k=0 pin via a factorized where-mask, NOT a scatter: GSPMD
        # miscompiles a scatter-into-broadcast when the consumer chain
        # crosses into the shard_map FFT (observed: det==0 at each
        # shard's local origin on the 4-rank slab mesh), and on TPU a
        # fused select is free while scatter is not
        k2 = dom.k_square
        at_zero = k2 == 0
        one = jnp.ones((), dtype=Axx.dtype)
        Axx = jnp.where(at_zero, one, Axx)
        Ayy = jnp.where(at_zero, one, Ayy)
        Azz = jnp.where(at_zero, one, Azz)
        cbar = state[self.cbar]
        e = 2.0 * self.e0 * cbar * (3.0 * self.lam + self.mu)
        e = jnp.where(at_zero, jnp.zeros((), dtype=e.dtype), e)
        b0 = k[0] * e
        b1 = k[1] * e
        b2 = k[2] * e
        # closed-form cofactor solve of the symmetric 3x3 acoustic system —
        # pure elementwise arithmetic instead of a batched LU custom call:
        # jnp.linalg.solve miscompiles under GSPMD sharding (NaN fields on
        # the 4-rank slab mesh, while the same call is fine eagerly) and a
        # pointwise adjugate maps onto the VPU without any custom call
        c00 = Ayy * Azz - Ayz * Ayz
        c01 = Axz * Ayz - Axy * Azz
        c02 = Axy * Ayz - Axz * Ayy
        det = Axx * c00 + Axy * c01 + Axz * c02
        inv_det = 1.0 / det
        c11 = Axx * Azz - Axz * Axz
        c12 = Axy * Axz - Axx * Ayz
        c22 = Axx * Ayy - Axy * Axy
        x = jnp.stack(
            [(c00 * b0 + c01 * b1 + c02 * b2) * inv_det,
             (c01 * b0 + c11 * b1 + c12 * b2) * inv_det,
             (c02 * b0 + c12 * b1 + c22 * b2) * inv_det], -1
        )
        return {
            name: dom.ifft(x[..., i]) for i, name in enumerate(self.displacements)
        }


@computes.register("FFTElasticChemicalPotential")
class FFTElasticChemicalPotential(TensorCompute):
    """Elastic chemical potential contribution in k-space
    (reference FFTElasticChemicalPotential.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.displacements = params.get_str_vector("displacements")
        for d in self.displacements:
            if d not in self.inputs:
                self.inputs.append(d)
        self.cbar = self.input_buffer("cbar")
        self.mu = params.get_float("mu", required=True)
        self.lam = params.get_float("lambda", required=True)
        self.e0 = params.get_float("e0", required=True)

    def apply(self, state, ctx):
        dom = self.domain
        two_pi_i = 2.0j * jnp.pi
        k = [two_pi_i * dom.reciprocal_axis(d) for d in range(3)]
        u = [dom.fft(state[d]) for d in self.displacements]
        while len(u) < 3:
            u.append(jnp.zeros_like(u[0]))
        cbar = state[self.cbar]
        out = -self.e0 * (
            self.e0 * (9.0 * self.lam * cbar + self.mu * 6.0 * cbar)
            - (2.0 * self.mu + 3.0 * self.lam)
            * (k[0] * u[0] + k[1] * u[1] + k[2] * u[2])
        )
        return {self.out: out}


@computes.register("MacroscopicShearTensor")
class MacroscopicShearTensor(TensorCompute):
    """Applied shear ramp: (I + t·e01) − <F>
    (reference test/src/tensor_computes/MacroscopicShearTensor.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.F = params.get_str("F", "F")
        if self.F not in self.inputs:
            self.inputs.append(self.F)

    def apply(self, state, ctx):
        dom = self.domain
        avg = dom.average(state[self.F])
        shear = jnp.eye(dom.dim, dtype=dom.dtype)
        shear = shear.at[0, 1].add(ctx["t"])
        return {self.out: shear - avg}


@computes.register("PhaseMechanicsTest")
class PhaseMechanicsTest(TensorCompute):
    """Two-phase microstructure IC: corner block = 1
    (reference test/src/tensor_computes/PhaseMechanicsTest.C)."""

    def apply(self, state, ctx):
        dom = self.domain
        u = jnp.zeros(dom.shape, dtype=dom.dtype)
        s = 30 if dom.dim == 2 else 9
        if dom.dim == 3:
            u = u.at[-s:, :s, -s:].set(1.0)
        elif dom.dim == 2:
            u = u.at[-s:, :s].set(1.0)
        else:
            raise ComputeError("Unsupported problem dimension")
        return {self.out: u}
