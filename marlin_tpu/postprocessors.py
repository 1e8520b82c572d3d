"""Postprocessors: scalar reductions over tensor buffers, reported to CSV.

Re-design of reference src/postprocessors/ (491 LoC).  Each postprocessor is
a pure function ``(state, ctx) -> scalar``; all PPs for a timestep evaluate
inside one jit region, and — unlike the reference, whose ``DomainAction::sum``
is serial-only (src/actions/DomainAction.C:1558-1568) — the reductions are
decomposition-safe under sharding (XLA inserts the collectives).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .params import Params
from .registry import postprocessors


class Postprocessor:
    default_execute_on = ["TIMESTEP_END"]

    def __init__(self, name: str, params: Params, problem):
        self.name = name
        self.params = params
        self.problem = problem
        self.domain = problem.domain
        self.execute_on = set(
            x.upper()
            for x in params.get_str_vector("execute_on", default=self.default_execute_on)
        )

    def history_requests(self):
        return {}

    def check(self, problem):
        """Cross-postprocessor validation; runs after ALL pps are built
        (deck declaration order must not matter)."""

    def compute(self, state, ctx):
        raise NotImplementedError


class TensorPostprocessor(Postprocessor):
    """Base for buffer-reading PPs (reference TensorPostprocessor.C:1-26)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.buffer = params.get_str("buffer", required=True)


@postprocessors.register("TensorAveragePostprocessor")
class TensorAveragePostprocessor(TensorPostprocessor):
    """Mean over the grid (reference TensorAveragePostprocessor.C)."""

    def compute(self, state, ctx):
        u = state["buffers"][self.buffer]
        return jnp.sum(u) / u.size


@postprocessors.register("TensorIntegralPostprocessor")
class TensorIntegralPostprocessor(TensorAveragePostprocessor):
    """Mean · domain volume (reference TensorIntegralPostprocessor.C:29-45)."""

    def compute(self, state, ctx):
        return super().compute(state, ctx) * self.domain.volume_global


@postprocessors.register("TensorIntegralChangePostprocessor")
class TensorIntegralChangePostprocessor(TensorPostprocessor):
    """Σ|u − u_old| · Π h_d (reference TensorIntegralChangePostprocessor.C)."""

    def history_requests(self):
        return {self.buffer: 1}

    def compute(self, state, ctx):
        u = state["buffers"][self.buffer]
        n_old = jnp.minimum(state["n_advances"], state["old"][self.buffer].shape[0])
        u_old = state["old"][self.buffer][0]
        integral = jnp.where(
            n_old > 0,
            jnp.sum(jnp.abs(u - u_old)),
            jnp.sum(jnp.abs(u)),
        )
        return integral * math.prod(self.domain.grid_spacing)


@postprocessors.register("TensorExtremeValuePostprocessor")
class TensorExtremeValuePostprocessor(TensorPostprocessor):
    """MIN/MAX over the grid (reference TensorExtremeValuePostprocessor.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.value_type = params.get_enum("value_type", ["MIN", "MAX"], "MAX")

    def compute(self, state, ctx):
        u = state["buffers"][self.buffer]
        return jnp.min(u) if self.value_type == "MIN" else jnp.max(u)


@postprocessors.register("ReciprocalIntegral")
class ReciprocalIntegral(TensorPostprocessor):
    """k=0 component / N · V (reference ReciprocalIntegral.C)."""

    def compute(self, state, ctx):
        u = state["buffers"][self.buffer]
        zero = u[(0,) * self.domain.dim]
        n = self.domain.n_cells_global
        return jnp.real(zero) / n * self.domain.volume_global


@postprocessors.register("SemiImplicitCriticalTimeStep")
class SemiImplicitCriticalTimeStep(TensorPostprocessor):
    """dt_crit = 1/max|L̄| (reference SemiImplicitCriticalTimeStep.C:30-46)."""

    def compute(self, state, ctx):
        u = state["buffers"][self.buffer]
        max_norm_k = jnp.sqrt(jnp.max(jnp.real(u * jnp.conj(u))))
        return jnp.where(max_norm_k > 0.0, 1.0 / max_norm_k, 1e30)


@postprocessors.register("TensorInterfaceVelocityPostprocessor")
class TensorInterfaceVelocityPostprocessor(TensorPostprocessor):
    """Interface velocity max|du/dt / ∇u|
    (reference TensorInterfaceVelocityPostprocessor.C)."""

    def history_requests(self):
        return {self.buffer: 1}

    def compute(self, state, ctx):
        dom = self.domain
        u = state["buffers"][self.buffer]
        n_old = jnp.minimum(state["n_advances"], state["old"][self.buffer].shape[0])
        u_old = state["old"][self.buffer][0]
        du = (u - u_old) / ctx["dt"]
        ubar = dom.fft(u)
        vsquare = None
        for d in range(dom.dim):
            grad = dom.ifft(ubar * dom.reciprocal_axis(d) * 1j)
            v = jnp.where(jnp.abs(grad) > 1e-3, du / grad, 0.0)
            vsquare = v * v if vsquare is None else vsquare + v * v
        vel = jnp.sqrt(jnp.max(vsquare))
        return jnp.where(n_old > 0, vel, 0.0)


@postprocessors.register("ComputeGroupExecutionCount")
class ComputeGroupExecutionCount(Postprocessor):
    """Execution count of the solver's compute group (JIT sanity check in
    the reference, ComputeGroupExecutionCount.C).  Groups here are traced
    functions executed exactly once per substep; the count is tracked
    host-side on the problem."""

    depends_on_pps = True

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.compute_group = params.get_str("compute_group", None)

    wants_group_evals = True  # problem fetches the device accumulator

    def compute_host(self, pp_values, t):
        # iterative solvers accumulate their data-dependent iteration
        # evals on-device (solver state 'group_evals', fetched by the
        # problem when this pp exists); the static count covers the rest
        return float(self.problem.compute_count) + float(
            getattr(self.problem, "device_group_evals", 0) or 0)


@postprocessors.register("ComputeReynoldsNumber")
class ComputeReynoldsNumber(TensorPostprocessor):
    """LBM Reynolds number (reference ComputeReynoldsNumber.C)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.tau = problem.get_constant(params.get_str("tau", required=True))
        self.D = problem.get_constant(params.get_str("diameter", required=True))

    def compute(self, state, ctx):
        u = state["buffers"][self.buffer]
        # NOTE: the reference uses nu = (tau - 0.5)/sqrt(3) — i.e. c_s, not
        # the textbook c_s² = 1/3 (ComputeReynoldsNumber.C:34).  Kept
        # verbatim for parity; do not "fix" to cs2 without a deck flag.
        kinematic_viscosity = 1.0 / math.sqrt(3.0) * (self.tau - 0.5)
        avg_speed = jnp.sum(u) / u.size
        return avg_speed * self.D / kinematic_viscosity


@postprocessors.register("IterationPostprocessor", "TensorSolverIterations")
class TensorSolverIterations(Postprocessor):
    """Iteration count of the iterative tensor solver."""

    def compute(self, state, ctx):
        return state.get("solver", {}).get("iterations", jnp.zeros((), jnp.int32))


@postprocessors.register("ParsedPostprocessor")
class ParsedPostprocessor(Postprocessor):
    """Expression over other postprocessor values (MOOSE built-in used by
    reference test/tests/solvers/etdrk4_diffusion.i).  Evaluated host-side
    after the tensor postprocessors."""

    depends_on_pps = True

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        from .expression import CompiledExpression

        self.pp_names = params.get_str_vector("pp_names")
        self.pp_symbols = params.get_str_vector("pp_symbols", default=self.pp_names)
        if len(self.pp_symbols) != len(self.pp_names):
            params.error(
                "pp_symbols",
                f"pp_symbols (size {len(self.pp_symbols)}) and pp_names "
                f"(size {len(self.pp_names)}) must have equal length.")
        # parse once at build time (syntax errors surface immediately);
        # evaluation is host-side scalar math.  pi/e are FParser built-ins
        # (every other CompiledExpression call site seeds them too).
        self._expr = CompiledExpression(
            params.get_str("expression", required=True),
            list(self.pp_symbols) + ["t"],
            constants={"pi": math.pi, "e": math.e})

    def check(self, problem):
        # name validation runs AFTER all pps are built — MOOSE decks are
        # declaration-order independent, so forward references are legal
        known = {pp.name for pp in problem.postprocessors}
        for n in self.pp_names:
            if n not in known:
                # misspelled names must error, not silently evaluate as 0
                self.params.error(
                    "pp_names", f"postprocessor '{n}' does not exist")

    def compute_host(self, pp_values, t):
        env = {"t": t}
        for sym, name in zip(self.pp_symbols, self.pp_names):
            # a referenced pp that did not execute on the current flag
            # reports its initial 0 (MOOSE: the pp's current value)
            env[sym] = pp_values.get(name, 0.0)
        return self._expr.evaluate_host(env)


@postprocessors.register("FunctionElementIntegral")
class FunctionElementIntegral(Postprocessor):
    """Integral of a deck function over the mesh with 2-point Gauss
    quadrature per element (the MOOSE built-in used by reference
    test/tests/misc/shiftedfunction.i)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.function = problem.get_function(params.get_str("function", required=True))

    def compute(self, state, ctx):
        import numpy as np

        dom = self.domain
        g = 1.0 / np.sqrt(3.0)
        axes = []
        for d in range(dom.dim):
            h = dom.grid_spacing[d]
            centers = dom._np_axes[d]
            pts = np.concatenate([centers - g * h / 2.0, centers + g * h / 2.0])
            axes.append(np.sort(pts))
        while len(axes) < 3:
            axes.append(np.zeros(1))
        shape3 = [len(a) for a in axes]
        env = {
            "x": axes[0].reshape(-1, 1, 1),
            "y": axes[1].reshape(1, -1, 1),
            "z": axes[2].reshape(1, 1, -1),
            "t": ctx["t"],
        }
        vals = jnp.broadcast_to(self.function(env), shape3)
        weight = 1.0
        for d in range(dom.dim):
            weight *= dom.grid_spacing[d] / 2.0
        return jnp.sum(vals) * weight


class AuxVariablePostprocessor(Postprocessor):
    """Base for MOOSE postprocessors that read an aux variable fed from a
    tensor buffer (the reference couples through MOOSE's FE aux system,
    src/problems/TensorProblem.C:312-379; here the mapped buffer IS the
    variable, so these reductions run on-device inside the PP jit region)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.variable = params.get_str("variable", required=True)
        if self.variable not in problem.aux.variables:
            params.error("variable", f"unknown aux variable '{self.variable}'")

    def _field(self, state):
        buf = self.problem.aux.source_buffer(self.variable)
        if buf is None:
            return jnp.zeros(self.domain.shape, self.domain.dtype)
        return state["buffers"][buf]


@postprocessors.register("ElementExtremeValue", "NodalExtremeValue")
class ElementExtremeValue(AuxVariablePostprocessor):
    """MIN/MAX of an aux variable.  On the conforming mesh both the nodal
    and elemental samplings take values from the buffer itself, so the
    extremum equals the buffer extremum (MOOSE samples at quadrature points,
    which for a multilinear variable is an interior bound — divergence
    documented in README)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.value_type = params.get_enum("value_type", ["MIN", "MAX"], "MAX")

    def compute(self, state, ctx):
        u = self._field(state)
        return jnp.min(u) if self.value_type == "MIN" else jnp.max(u)


@postprocessors.register("ElementAverageValue")
class ElementAverageValue(AuxVariablePostprocessor):
    """Volume-average of an aux variable.  On the periodic conforming mesh
    the exact FE integral of either a constant-monomial or multilinear
    variable reduces to the plain cell mean."""

    def compute(self, state, ctx):
        u = self._field(state)
        return jnp.sum(u) / u.size


@postprocessors.register("ElementIntegralVariablePostprocessor")
class ElementIntegralVariablePostprocessor(ElementAverageValue):
    def compute(self, state, ctx):
        return super().compute(state, ctx) * self.domain.volume_global


class VectorPostprocessor:
    """Base for vector postprocessors (per-step CSV series)."""

    def __init__(self, name, params: Params, problem):
        self.name = name
        self.params = params
        self.problem = problem
        self.domain = problem.domain
        self.execute_on = set(
            x.upper()
            for x in params.get_str_vector("execute_on", default=["TIMESTEP_END"])
        )

    def compute(self, state, ctx):
        """Return dict column -> 1-D array."""
        raise NotImplementedError


@postprocessors.register("TensorHistogram")
class TensorHistogram(VectorPostprocessor):
    """Histogram of buffer values (reference
    src/vectorpostprocessors/TensorHistogram.C): `bins` equal-width bins on
    [min, max], columns `bin` (centers) and `count`."""

    is_vector = True

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.buffer = params.get_str("buffer", required=True)
        self.min = params.get_float("min", required=True)
        self.max = params.get_float("max", required=True)
        self.bins = params.get_int("bins", required=True)
        if self.min > self.max:
            params.error("min", "max must be greater than min")

    def compute(self, state, ctx):
        import numpy as np

        u = np.asarray(state["buffers"][self.buffer]).reshape(-1)
        counts, edges = np.histogram(u, bins=self.bins, range=(self.min, self.max))
        step = (self.max - self.min) / self.bins
        centers = self.min + step / 2.0 + step * np.arange(self.bins)
        return {"bin": centers, "count": counts.astype(float)}
