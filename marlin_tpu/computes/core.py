"""Core spectral / phase-field / utility computes.

Pure-function re-designs of the reference compute classes in
src/tensor_computes/ (see each class docstring for the exact counterpart).
All heavy lifting is jnp; the enclosing solver step is jax.jit'ed, so XLA
fuses these pointwise chains (the role of the reference's torch JIT executor).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..expression import CompiledExpression, fparse
from ..params import Params
from ..registry import computes
from .base import ComputeError, TensorCompute


@computes.register("ParsedCompute")
class ParsedCompute(TensorCompute):
    """Runtime expression over named buffers
    (reference: src/tensor_computes/ParsedCompute.C:20-271).

    Supports `inputs`, symbolic `derivatives=`, `constant_names/expressions`
    (evaluated sequentially, earlier constants usable in later expressions),
    `extra_symbols` (i, x, y, z, kx, ky, kz, k2, t, pi, e),
    `expand=REAL|RECIPROCAL`, and `is_integer`.
    """

    RESERVED = ["i", "x", "kx", "y", "ky", "z", "kz", "k2", "t", "pi", "e"]

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.extra_symbols = params.get_bool("extra_symbols", False)
        self.expand = params.get_enum("expand", ["REAL", "RECIPROCAL", "NONE"], "NONE")
        self.is_integer = params.get_bool("is_integer", False)

        names = self.input_buffers("inputs")
        if len(set(names)) != len(names):
            params.error("inputs", "Duplicate buffer name.")

        constant_names = params.get_str_vector("constant_names")
        constant_exprs = params.get_str_vector("constant_expressions")
        if len(set(constant_names)) != len(constant_names):
            params.error("constant_names", "Duplicate constant name.")
        if len(constant_names) != len(constant_exprs):
            params.error(
                "constant_names",
                f"constant_names (size {len(constant_names)}) and "
                f"constant_expressions (size {len(constant_exprs)}) must have "
                "equal length.",
            )
        if self.extra_symbols:
            for n in list(constant_names) + list(names):
                if n in self.RESERVED:
                    params.error(
                        "constant_names", f"Cannot use reserved name '{n}'."
                    )

        # constants may be expressions referencing earlier constants and
        # problem-level constants (reference ParsedCompute.C:104-126)
        const_env: Dict[str, float] = dict(problem.constants)
        constants: Dict[str, object] = {}
        for cname, cexpr in zip(constant_names, constant_exprs):
            value = fparse(cexpr, const_env)
            const_env[cname] = value
            constants[cname] = value

        variables = list(names)
        if self.extra_symbols:
            constants["pi"] = math.pi
            constants["e"] = math.e
            constants["i"] = 1j
            variables += ["x", "kx", "y", "ky", "z", "kz", "k2", "t"]

        self.expr = CompiledExpression(
            params.get_str("expression", required=True),
            variables,
            constants=constants,
            simplify=params.get_bool("enable_fpoptimizer", True),
        )
        for d in params.get_str_vector("derivatives"):
            if d not in names:
                params.error(
                    "derivatives",
                    f"Derivative w.r.t `{d}` was requested, but it is not "
                    "listed in `inputs`.",
                )
            self.expr.differentiate(d)
        self.expr.compile()

    def apply(self, state, ctx):
        dom = self.domain
        env = {n: state[n] for n in self.inputs}
        if self.extra_symbols:
            zero = jnp.zeros([1] * dom.dim, dtype=dom.dtype)
            env["x"] = dom.axis(0)
            env["y"] = dom.axis(1) if dom.dim > 1 else zero
            env["z"] = dom.axis(2) if dom.dim > 2 else zero
            env["kx"] = dom.reciprocal_axis(0)
            env["ky"] = dom.reciprocal_axis(1)
            env["kz"] = dom.reciprocal_axis(2)
            env["k2"] = dom.k_square
            env["t"] = ctx["t"]
        u = self.expr(env)
        if self.is_integer:
            # reference casts to torch int64; int64 silently degrades to
            # int32 under jax without x64 — pick the widest available
            # integer dtype explicitly (int64 on the x64 gold path)
            idtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
            u = jnp.asarray(u).astype(idtype)
        else:
            u = jnp.asarray(u)
        if self.expand == "REAL":
            u = jnp.broadcast_to(u, dom.shape)
        elif self.expand == "RECIPROCAL":
            u = jnp.broadcast_to(u, dom.reciprocal_shape)
        return {self.out: u}


@computes.register("ConstantTensor")
class ConstantTensor(TensorCompute):
    """Constant real-space tensor
    (reference: src/tensor_computes/ConstantTensor.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.real = self.constant("real", 0.0)
        # declared-but-unused upstream too: the reference's computeBuffer
        # always torch::full-s regardless (ConstantTensor.C:30,44-52);
        # accepted as inert for deck parity
        self.full = params.get_bool("full", False)

    def apply(self, state, ctx):
        dom = self.domain
        # honor the declared buffer shape (value_dimensions / NEML2 types):
        # the reference fills the buffer's own allocation
        shape = self.problem.declared_buffer_shape(self.out) or dom.shape
        return {self.out: jnp.full(shape, self.real, dtype=dom.dtype)}


def _trace_state_clean() -> bool:
    """True when no jax trace is active.  Prefers the internal helper but
    survives jax._src reshuffles with a public-API probe (ops on constants
    are staged to tracers inside a trace)."""
    try:
        from jax._src.core import trace_state_clean

        return trace_state_clean()
    except Exception:
        import jax

        return not isinstance(jnp.zeros(()), jax.core.Tracer)


@computes.register("ConstantReciprocalTensor")
class ConstantReciprocalTensor(TensorCompute):
    """Constant reciprocal-space tensor (complex)
    (reference: src/tensor_computes/ConstantTensor.C, reciprocal variant)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.real = self.constant("real", 0.0)
        self.imaginary = self.constant("imaginary", 0.0)

    def apply(self, state, ctx):
        import jax

        dom = self.domain
        value = complex(self.real, self.imaginary)
        if not _trace_state_clean():
            # under trace: a scalar broadcast in the program (never a full
            # materialized constant — at 512³ that would be a ~1 GB HLO)
            return {self.out: jnp.full(dom.reciprocal_shape, value, dtype=dom.cdtype)}
        # eager: route through an explicit jit — eager complex broadcast (a
        # complex scalar buffer transfer) is unimplemented on the axon TPU
        if not hasattr(self, "_fill_fn"):
            self._fill_fn = jax.jit(
                lambda: jnp.full(dom.reciprocal_shape, value, dtype=dom.cdtype)
            )
        return {self.out: self._fill_fn()}


@computes.register("RandomTensor")
class RandomTensor(TensorCompute):
    """Uniform random IC between min and max
    (reference: src/tensor_computes/RandomTensor.C:17-55).

    The reference generates on the CPU with torch's RNG for device
    reproducibility; we do exactly the same (torch CPU, same seed semantics)
    so seeded ICs — and therefore the reference gold files — match bit-for-bit
    at f64.  Not traceable; IC computes run eagerly, so this is fine
    (reference marks it supportsJIT()=false too).
    """

    jittable = False

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.min = params.get_float("min", required=True)
        self.max = params.get_float("max", required=True)
        self.seed = params.get_int("seed") if params.has("seed") else None
        self.generate_on_cpu = params.get_bool("generate_on_cpu", True)

    def apply(self, state, ctx):
        import torch

        if not self.generate_on_cpu:
            # reference generate_on_cpu=false draws from the DEVICE RNG —
            # a different stream per device family, which upstream itself
            # flags as non-reproducible (RandomTensor.C:24-27).  Here the
            # device stream is jax.random; only the default CPU stream is
            # bit-compatible with the reference golds.  Unseeded computes
            # fold in the compute name so two unseeded RandomTensors draw
            # INDEPENDENT noise (a shared PRNGKey(0) would correlate them
            # bit-for-bit; the reference's global device stream advances
            # between calls).
            import zlib

            key = jax.random.PRNGKey(self.seed) if self.seed is not None \
                else jax.random.fold_in(
                    jax.random.PRNGKey(0), zlib.crc32(self.name.encode()))
            u = jax.random.uniform(
                key, self.problem.local_tensor_shape(),
                dtype=self.domain.dtype)
            return {self.out: u * (self.max - self.min) + self.min}

        # ALWAYS draw the f64 stream and cast: torch's RNG emits a
        # different sample sequence per dtype, so drawing f32 directly
        # would give every f32 device a DIFFERENT IC than the f64 golds
        # (r03 device-lane finding: c.0 differed by 0.11 — a different
        # random field, not roundoff).  f64 golds stay bit-exact; f32 runs
        # get the same field to f32 eps.
        tdtype = torch.float64
        if self.domain.mesh is None:
            if self.seed is not None:
                torch.manual_seed(self.seed)
            shape = self.problem.local_tensor_shape()
            t = torch.rand(list(shape), dtype=tdtype)
            u = jnp.asarray(np.asarray(t.numpy()), dtype=self.domain.dtype)
            return {self.out: u * (self.max - self.min) + self.min}

        # parallel: the reference calls manual_seed + rand(LOCAL shape) on
        # EVERY rank (RandomTensor.C:42-53 with
        # TensorProblem::getLocalTensorShape) — with a seed, all ranks draw
        # the identical local block, so the global IC is that block tiled in
        # rank order.  Reproduced here on the gathered global array so the
        # parallel golds (e.g. cahnhilliard.rank0001.h5) match bit-for-bit.
        from .. import parallel as par

        slices = par.local_slices(self.domain)
        out = np.empty(self.domain.shape, dtype=np.dtype(self.domain.dtype))
        for sl in slices:
            if self.seed is not None:
                torch.manual_seed(self.seed)
            local_shape = [
                (s.stop or self.domain.shape[d]) - (s.start or 0)
                for d, s in enumerate(sl)
            ]
            t = torch.rand(local_shape, dtype=tdtype)
            out[sl] = t.numpy()
        u = jnp.asarray(out)
        return {self.out: u * (self.max - self.min) + self.min}


@computes.register("ParsedTensor")
class ParsedTensor(ParsedCompute):
    """Legacy spelling used by reference test/tests/tensor_ics/sineic.i:
    the expression lives in `function =` and coordinate symbols are on."""

    def __init__(self, name, params: Params, problem):
        if params.has("function") and not params.has("expression"):
            params.node.set_param("expression", params.node.get("function"))
        if not params.has("extra_symbols"):
            params.node.set_param("extra_symbols", "true")
        super().__init__(name, params, problem)


@computes.register("RunningMaximum")
class RunningMaximum(TensorCompute):
    """out = max(out, input): a monotone envelope — the history variable
    H(x) = max_t ψ(x, t) of phase-field fracture (irreversibility),
    peak-stress/temperature tracking, etc.  marlin_tpu extension (the
    reference ships no history-tracking compute; see
    examples/phase_field_fracture).  The output buffer carries the
    envelope between substeps/steps, so its own initial condition seeds
    it (e.g. a notch driving-force floor); reading the previous value is
    old-state access, not a graph dependency, so no cycle is declared.

    Restriction: the envelope absorbs every evaluation, so under
    solvers that evaluate the compute graph on TRIAL iterates
    (Secant/Broyden nonlinear iterations) a rejected overshoot would
    contaminate the history permanently — those solvers are refused at
    build time.  With AdamsBashforthMoulton, `corrector_steps > 0`
    additionally folds predictor-state evaluations into the envelope
    (bounded by the accepted trajectory's neighborhood; documented, not
    refused)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.input = self.input_buffer("input")

    def check(self):
        solver = getattr(self.problem, "solver", None)
        # iterative solvers (Secant/Broyden, via their existing
        # `iterative` trait) evaluate the compute graph on TRIAL iterates
        if getattr(solver, "iterative", False):
            raise ComputeError(
                f"RunningMaximum '{self.name}': iterative solvers evaluate "
                "the compute graph on trial iterates, which would be "
                "absorbed into the envelope permanently — use a "
                "non-iterative solver (ABM/ForwardEuler) for "
                "history-tracked decks")

    def apply(self, state, ctx):
        # .get with a zeros fallback: an undeclared output buffer is
        # auto-created from this compute's result like any other output
        # (r05 review — a bare state[self.out] KeyError'd the shape pass)
        prev = state.get(self.out)
        cur = state[self.input]
        if prev is None:
            return {self.out: cur}
        return {self.out: jnp.maximum(prev, cur)}


@computes.register("ForwardFFT")
class ForwardFFT(TensorCompute):
    """ū = fft(u) (reference: src/tensor_computes/PerformFFT.C, forward)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.input = self.input_buffer("input")

    def apply(self, state, ctx):
        return {self.out: self.domain.fft(state[self.input])}


@computes.register("InverseFFT")
class InverseFFT(TensorCompute):
    """u = ifft(ū) (reference: src/tensor_computes/PerformFFT.C, inverse)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.input = self.input_buffer("input")

    def apply(self, state, ctx):
        return {self.out: self.domain.ifft(state[self.input])}


class BatchedFFT(TensorCompute):
    """Several independent same-direction FFT computes evaluated as ONE
    batched transform (fields stacked on a trailing value axis, which the
    Domain transforms natively).

    marlin_tpu perf extension (`[Problem] batch_fft = true`): the
    reference dispatches one torch.fft call per PerformFFT op
    (src/tensor_computes/PerformFFT.C:13-31); on TPU, small-grid
    multi-variable decks (e.g. benchmark 2a's 5 coupled fields at 200²)
    are bound by per-transform fixed cost — batching measured ~2× on the
    FFT portion at 200².  Synthesized by ComputeGroup.fuse_ffts, never
    from a deck block.  Fields are grouped by (shape, complexness) at
    trace time; singletons fall through to the plain per-field path, so
    mixed-shape runs stay correct."""

    jittable = True

    def __init__(self, members, problem, inverse: bool):
        params = Params(None, problem.global_params)
        name = ("batch_ifft(" if inverse else "batch_fft(") + \
            ",".join(m.name for m in members) + ")"
        super().__init__(name, params, problem)
        self.members = list(members)
        self.inverse = inverse
        self.inputs = sorted({m.input for m in self.members})
        self.outputs = sorted({m.out for m in self.members})

    def apply(self, state, ctx):
        from ..domain import batched_transform

        op = self.domain.ifft if self.inverse else self.domain.fft
        return batched_transform(
            op, [(m.out, state[m.input]) for m in self.members]
        )


@computes.register("ReciprocalLaplacianFactor")
class ReciprocalLaplacianFactor(TensorCompute):
    """-k² · factor (reference: src/tensor_computes/ReciprocalLaplacianFactor.C:28-31)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.factor = self.constant("factor", 1.0)

    def apply(self, state, ctx):
        return {self.out: -self.domain.k_square * self.factor}


@computes.register("ReciprocalLaplacianSquareFactor")
class ReciprocalLaplacianSquareFactor(TensorCompute):
    """k⁴ · factor — sign convention per reference
    (src/tensor_computes/ReciprocalLaplacianSquareFactor.C: 'ignore the minus
    which would drop in the next step anyways')."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.factor = self.constant("factor", 1.0)

    def apply(self, state, ctx):
        k2 = self.domain.k_square
        return {self.out: k2 * k2 * self.factor}


@computes.register("SwiftHohenbergLinear")
class SwiftHohenbergLinear(TensorCompute):
    """r − α²(1−k²)² (reference: src/tensor_computes/SwiftHohenbergLinear.C:31-36)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.r = self.constant("r", -0.5)
        self.alpha = self.constant("alpha", 1.0)

    def apply(self, state, ctx):
        k2 = self.domain.k_square
        return {self.out: self.r - self.alpha * self.alpha * (1.0 - k2) * (1.0 - k2)}


@computes.register("FFTGradient")
class FFTGradient(TensorCompute):
    """∂u/∂x_d = ifft(i·k_d·ū) (reference: src/tensor_computes/FFTGradient.C:26-40)."""

    DIRS = {"X": 0, "Y": 1, "Z": 2}

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.input = self.input_buffer("input")
        self.input_is_reciprocal = params.get_bool("input_is_reciprocal", False)
        self.direction = self.DIRS[params.get_enum("direction", ["X", "Y", "Z"], "X")]

    def apply(self, state, ctx):
        dom = self.domain
        r = state[self.input] if self.input_is_reciprocal else dom.fft(state[self.input])
        return {self.out: dom.ifft(r * dom.reciprocal_axis(self.direction) * 1j)}


@computes.register("FFTGradientSquare")
class FFTGradientSquare(TensorCompute):
    """factor · Σ_d (∂u/∂x_d)²
    (reference: src/tensor_computes/FFTGradientSquare.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.input = self.input_buffer("input")
        self.input_is_reciprocal = params.get_bool("input_is_reciprocal", False)
        self.factor = self.constant("factor", 1.0)

    def apply(self, state, ctx):
        dom = self.domain
        r = state[self.input] if self.input_is_reciprocal else dom.fft(state[self.input])
        u = None
        for d in range(dom.dim):
            g = dom.ifft(r * dom.reciprocal_axis(d) * 1j)
            u = g * g if u is None else u + g * g
        if self.factor != 1.0:
            u = u * self.factor
        return {self.out: u}


@computes.register("DeAliasingTensor")
class DeAliasingTensor(TensorCompute):
    """De-aliasing filter: SHARP 2/3 rule or Hou-Li exponential
    (reference: src/tensor_computes/DeAliasingTensor.C:31-56)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.method = params.get_enum("method", ["SHARP", "HOULI"], None)
        if self.method is None:
            params.error("method", "is required")
        self.p = params.get_float("p", 16.0)
        self.alpha = params.get_float("alpha", 36.0)

    def apply(self, state, ctx):
        dom = self.domain
        # numpy, not jnp: the axes are host constants and the maxima must be
        # concrete (jnp ops would stage into the surrounding trace)
        axes = [np.abs(np.asarray(dom.reciprocal_axis(d))) for d in range(3)]
        maxima = [float(a.max()) if a.size else 0.0 for a in axes]
        if self.method == "SHARP":
            mask = None
            for a, m in zip(axes, maxima):
                cond = a > 2.0 * m / 3.0
                mask = cond if mask is None else mask | cond
            u = jnp.where(mask, 0.0, 1.0).astype(dom.dtype)
        else:
            acc = None
            for a, m in zip(axes, maxima):
                term = jnp.power(a / (m if m else 1.0), self.p)
                acc = term if acc is None else acc + term
            u = jnp.exp(-self.alpha * acc).astype(dom.dtype)
        return {self.out: jnp.broadcast_to(u, dom.reciprocal_shape)}


@computes.register("ReciprocalAllenCahn")
class ReciprocalAllenCahn(TensorCompute):
    """fft of −L·dF/dη masked by ψ>0 (smoothed-boundary no-flux)
    (reference: src/tensor_computes/ReciprocalAllenCahn.C:38-50)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.dF = self.input_buffer("dF_chem_deta")
        self.L = self.input_buffer("L")
        self.psi = self.input_buffer("psi")
        self.always_update_psi = params.get_bool("always_update_psi", False)

    def apply(self, state, ctx):
        psi_thresh = state[self.psi] > 0.0
        rate = jnp.where(psi_thresh, -1.0 * state[self.L] * state[self.dF], 0.0)
        return {self.out: self.domain.fft(rate)}


@computes.register("ReciprocalMatDiffusion")
class ReciprocalMatDiffusion(TensorCompute):
    """Variable-mobility div(M∇µ) in k-space with smoothed-boundary no-flux
    (reference: src/tensor_computes/ReciprocalMatDiffusion.C:37-66)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.chem_pot = self.input_buffer("chemical_potential")
        self.M = self.input_buffer("mobility")
        self.psi = self.input_buffer("psi", required=False)
        self.always_update_psi = params.get_bool("always_update_psi", False)

    def apply(self, state, ctx):
        dom = self.domain
        k = [dom.reciprocal_axis(d) for d in range(3)]
        mu = state[self.chem_pot]
        M = state[self.M]
        # loop the ACTUAL dimensionality: the padding axes carry k=0, so
        # their flux components are identically zero — transforming them
        # would waste 2-3 full-grid FFTs per evaluation on 2-D decks
        dims = range(dom.dim)
        if self.psi is not None:
            psi = state[self.psi]
            psi_thresh = psi > 0.0
            psibar = dom.fft(psi)
            grad_psi_by_psi = [
                jnp.where(psi_thresh, dom.ifft(k[d] * psibar * 1j) / psi, 0.0)
                for d in dims
            ]
            psi_M = M * psi_thresh
        else:
            grad_psi_by_psi = None
            psi_M = M
        mubar = dom.fft(mu)
        J = [psi_M * dom.ifft(k[d] * mubar * 1j) for d in dims]
        div_J_hat = 1j * sum(k[d] * dom.fft(J[d]) for d in dims)
        if grad_psi_by_psi is not None:
            no_flux_hat = dom.fft(
                sum(grad_psi_by_psi[d] * J[d] for d in dims)
            )
            return {self.out: div_J_hat + no_flux_hat}
        return {self.out: div_J_hat}


@computes.register("SmoothRectangleCompute")
class SmoothRectangleCompute(TensorCompute):
    """Smoothed rectangle indicator IC
    (reference: src/tensor_computes/SmoothRectangleCompute.C — sharp box,
    COS: 0.5+0.5*sin(pi*min_d/w) of the clamped edge distance, TANH:
    0.5+0.5*tanh(4*min_d/w))."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.x1 = params.get_float("x1", required=True)
        self.x2 = params.get_float("x2", required=True)
        self.y1 = params.get_float("y1", required=True)
        self.y2 = params.get_float("y2", required=True)
        self.z1 = params.get_float("z1", 0.0)
        self.z2 = params.get_float("z2", 0.0)
        self.interpolation = params.get_enum("profile", ["COS", "TANH"], "COS")
        self.int_width = params.get_float("int_width", 0.0)
        self.inside = params.get_float("inside", 1.0)
        self.outside = params.get_float("outside", 0.0)

    def apply(self, state, ctx):
        dom = self.domain
        dim = dom.dim
        w = self.int_width
        x = dom._np_axes[0]
        y = dom._np_axes[1] if dim >= 2 else np.zeros(1)
        z = dom._np_axes[2] if dim == 3 else np.zeros(1)

        if w <= 0.0:
            hx = (x >= self.x1) & (x <= self.x2)
            hy = (y >= self.y1) & (y <= self.y2) if dim >= 2 else np.ones_like(y, bool)
            hz = (z >= self.z1) & (z <= self.z2) if dim == 3 else np.ones_like(z, bool)
            h_box = (
                hx.reshape(-1, 1, 1) & hy.reshape(1, -1, 1) & hz.reshape(1, 1, -1)
            ).astype(np.float64)
        elif self.interpolation == "COS":
            mx = np.clip(np.minimum(x - self.x1, self.x2 - x), -w / 2, w / 2)
            my = (
                np.clip(np.minimum(y - self.y1, self.y2 - y), -w / 2, w / 2)
                if dim >= 2 else np.full_like(y, w / 2)
            )
            mz = (
                np.clip(np.minimum(z - self.z1, self.z2 - z), -w / 2, w / 2)
                if dim == 3 else np.full_like(z, w / 2)
            )
            hx = 0.5 + 0.5 * np.sin(math.pi * mx / w)
            hy = 0.5 + 0.5 * np.sin(math.pi * my / w)
            hz = 0.5 + 0.5 * np.sin(math.pi * mz / w)
            h_box = hx.reshape(-1, 1, 1) * hy.reshape(1, -1, 1) * hz.reshape(1, 1, -1)
        else:  # TANH
            mx = np.minimum(x - self.x1, self.x2 - x)
            my = (
                np.minimum(y - self.y1, self.y2 - y)
                if dim >= 2 else np.full_like(y, 10 * w)
            )
            mz = (
                np.minimum(z - self.z1, self.z2 - z)
                if dim == 3 else np.full_like(z, 10 * w / 2.0)
            )
            hx = 0.5 + 0.5 * np.tanh(4 * mx / w)
            hy = 0.5 + 0.5 * np.tanh(4 * my / w)
            hz = 0.5 + 0.5 * np.tanh(4 * mz / w)
            h_box = hx.reshape(-1, 1, 1) * hy.reshape(1, -1, 1) * hz.reshape(1, 1, -1)

        u = np.squeeze(h_box * self.inside + (1 - h_box) * self.outside)
        return {self.out: jnp.asarray(u.reshape(dom.shape), dtype=dom.dtype)}


@computes.register("FiniteDifferenceLaplacian")
class FiniteDifferenceLaplacian(TensorCompute):
    """3/5-point finite-difference Laplacian on the periodic grid
    (reference: src/tensor_computes/FiniteDifferenceLaplacian.C:19-110).

    Implemented with jnp.roll over spatial axes (periodic wrap), which XLA
    fuses; in REAL_SPACE parallel mode the halo exchange supplies ghosts."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.input = self.input_buffer("input")
        self.factor = params.get_float("factor", 1.0)
        self.stencil = int(params.get_enum("stencil_width", ["3", "5"], "3"))
        ghost = 1 if self.stencil == 3 else 2
        problem.request_ghost_layers(ghost)

    def apply(self, state, ctx):
        dom = self.domain
        u = state[self.input]
        out = jnp.zeros_like(u)
        for d in range(dom.dim):
            h2 = dom.grid_spacing[d] ** 2
            if self.stencil == 3:
                out = out + (
                    jnp.roll(u, 1, axis=d) - 2.0 * u + jnp.roll(u, -1, axis=d)
                ) / h2
            else:
                out = out + (
                    -jnp.roll(u, 2, axis=d)
                    + 16.0 * jnp.roll(u, 1, axis=d)
                    - 30.0 * u
                    + 16.0 * jnp.roll(u, -1, axis=d)
                    - jnp.roll(u, -2, axis=d)
                ) / (12.0 * h2)
        return {self.out: out * self.factor}


@computes.register("MooseFunctionTensor")
class MooseFunctionTensor(TensorCompute):
    """Sample a deck-defined function onto the grid.

    The reference samples an arbitrary MOOSE Function
    (src/tensor_computes/MooseFunctionTensor.C); here the deck's [Functions]
    blocks are parsed-expression functions of (x, y, z, t), which covers the
    shipped decks without importing MOOSE."""

    jittable = False

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        fname = params.get_str("function", required=True)
        self.function = problem.get_function(fname)

    def apply(self, state, ctx):
        dom = self.domain
        # the reference samples at i*dx + dx/2 measured from ZERO, ignoring
        # the domain minimum (reference MooseFunctionTensor.C computeBuffer)
        def axis(d):
            h = dom.grid_spacing[d]
            a = np.arange(dom.n_global[d]) * h + h / 2.0
            return dom._np_align(a, d)

        zero = np.zeros([1] * dom.dim)
        env = {
            "x": axis(0),
            "y": axis(1) if dom.dim > 1 else zero,
            "z": axis(2) if dom.dim > 2 else zero,
            "t": ctx["t"],
        }
        u = np.asarray(self.function(env))
        return {
            self.out: jnp.asarray(
                np.broadcast_to(u, dom.shape).astype(np.dtype(dom.dtype))
            )
        }


@computes.register("GradientTensor")
class GradientTensor(TensorCompute):
    """FFT gradient stacked into a 3-vector field.

    The reference wraps the result in a NEML2 Vec (always 3 components,
    reference src/tensor_computes/GradientTensor.C:28-53); here it is a plain
    (..., 3) array — no NEML2 dependency required."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.input = self.input_buffer("input")
        self.input_is_reciprocal = params.get_bool("input_is_reciprocal", False)

    def apply(self, state, ctx):
        dom = self.domain
        r = (
            state[self.input]
            if self.input_is_reciprocal
            else dom.fft(state[self.input])
        ) * 1j
        comps = []
        for d in range(3):
            if d < dom.dim:
                comps.append(dom.ifft(r * dom.reciprocal_axis(d)))
            else:
                comps.append(jnp.zeros(dom.shape, dtype=dom.dtype))
        return {self.out: jnp.stack(comps, -1)}
