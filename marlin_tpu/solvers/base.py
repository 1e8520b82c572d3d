"""Solver base classes and state-history machinery.

Re-design of reference TensorSolver / SplitOperatorBase / ExplicitSolverBase
(reference: src/tensor_solver/TensorSolver.C:93-115,
SplitOperatorBase.C:16-66, ExplicitSolverBase.C:14-30).

State pytree layout (managed here and by TensorProblem):

    state = {
      "buffers":    {name: Array},          # current values
      "old":        {name: Array[S, ...]},  # stacked old states (S = max requested)
      "n_advances": int32,                  # count of effective advanceState calls
      "old_dt":     Array[S_dt],            # old MOOSE-dt ring
    }

``advance_state`` mirrors reference TensorBuffer::advanceState
(include/tensor_buffers/TensorBuffer.h:63-80): shift old states back, push
the current value in slot 0.  The per-buffer valid-history count is
min(n_advances, S) — identical to the reference's growing _u_old vector.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..params import Params


def advance_state(state: Dict, dt) -> Dict:
    """Push current buffer values into the old-state stacks."""
    new_old = {}
    for name, stack in state["old"].items():
        cur = state["buffers"][name]
        new_old[name] = jnp.concatenate(
            [cur[None].astype(stack.dtype), stack[:-1]], axis=0
        )
    old_dt = state["old_dt"]
    if old_dt.shape[0] > 0:
        old_dt = jnp.concatenate(
            [jnp.reshape(jnp.asarray(dt, old_dt.dtype), (1,)), old_dt[:-1]]
        )
    return {
        **state,
        "old": new_old,
        "n_advances": state["n_advances"] + 1,
        "old_dt": old_dt,
    }


@dataclass
class SplitVariable:
    """One integrated variable binding for split-operator solvers
    (reference: SplitOperatorBase::Variable)."""

    buffer: str
    reciprocal_buffer: str
    linear_reciprocal: Optional[str]  # None == the deck's `'0'` placeholder
    nonlinear_reciprocal: str


@dataclass
class ExplicitVariable:
    """Variable binding for explicit solvers (reference: ExplicitSolverBase)."""

    buffer: str
    reciprocal_buffer: str
    time_derivative_reciprocal: str


class TensorSolver:
    """Base solver: substep loop + buffer forwarding.

    ``step`` runs one full MOOSE timestep: the substep loop (with
    advance-state between substeps, reference TensorSolver.C:104-107) as one
    traced ``lax.fori_loop``.
    """

    def __init__(self, name: str, params: Params, problem):
        self.name = name
        self.params = params
        self.problem = problem
        self.domain = problem.domain
        self.substeps = params.get_int("substeps", 1)
        if self.substeps < 1:
            params.error("substeps",
                         "must be >= 1 (0 would silently freeze every step)")
        fb = params.get_str_vector("forward_buffer")
        fbn = params.get_str_vector("forward_buffer_new")
        if len(fb) != len(fbn):
            params.error(
                "forward_buffer", "needs as many entries as forward_buffer_new"
            )
        self.forwarded_buffers: List[Tuple[str, str]] = list(zip(fb, fbn))
        self.compute = None  # root ComputeGroup, bound by the problem

    # -- wiring -----------------------------------------------------------
    def bind(self, compute):
        self.compute = compute

    def history_requests(self) -> Dict[str, int]:
        """buffer name -> number of old states requested."""
        return {}

    def extra_input_buffers(self) -> List[str]:
        """Buffers the solver reads that must exist in the state."""
        out = [b for _, b in self.forwarded_buffers]
        return out

    def output_buffers(self) -> List[str]:
        """Buffers the solver writes (integrated variables, forwards)."""
        return [b for b, _ in self.forwarded_buffers]

    # -- execution helpers -------------------------------------------------
    def _run_group(self, state: Dict, t) -> Dict:
        """Evaluate the root compute and apply buffer forwarding
        (reference TensorSolver::forwardBuffers :86-91).  The ctx carries
        the history ring like the LBM substep path does, so any
        old-state-consuming compute (the LBM-BC ctx["old"] pattern) can
        run on the spectral solver path too (RunningMaximum itself is
        buffer-carried and does not need it)."""
        buffers = dict(state["buffers"])
        updates = self.compute.apply(
            buffers, {"t": t, "old": state["old"],
                      "n_advances": state["n_advances"]})
        buffers.update(updates)
        for fwd, fwd_new in self.forwarded_buffers:
            buffers[fwd] = buffers[fwd_new]
        return {**state, "buffers": buffers}

    # -- main entry --------------------------------------------------------
    def step(self, state: Dict, t, dt, dt_old, first_step) -> Dict:
        """One full timestep = `substeps` substeps.

        Substep s sees sub_time = t + s*sub_dt; state advances between
        substeps (skipped during the first MOOSE timestep, matching the
        reference's timeStep()<=1 guard in TensorProblem::advanceState).
        `first_step` is a traced bool so one compiled program serves every
        timestep."""
        sub_dt = dt / self.substeps
        first_step = jnp.asarray(first_step, bool)
        if getattr(self, "carry_reciprocal", False):
            # seed ū = fft(u) once per timestep (the per-substep transform
            # is pruned; see SplitOperatorBase.prune_reciprocal_ffts)
            buffers = dict(state["buffers"])
            for v in self.variables:
                buffers[v.reciprocal_buffer] = self.domain.fft(buffers[v.buffer])
            state = {**state, "buffers": buffers}
        if self.substeps == 1:
            return self.substep(state, t, sub_dt, dt, dt_old, 0, first_step)

        def body(s, carry):
            st = carry
            st = jax.lax.cond(
                (s > 0) & jnp.logical_not(first_step),
                lambda x: advance_state(x, dt),
                lambda x: x,
                st,
            )
            sub_time = t + s * sub_dt
            return self.substep(st, sub_time, sub_dt, dt, dt_old, s, first_step)

        return jax.lax.fori_loop(0, self.substeps, body, state)

    def substep(self, state, sub_time, sub_dt, dt, dt_old, substep_index, first_step):
        raise NotImplementedError

    def _ifft_all(self, pairs):
        """{key: ifft(ū)} for a list of (key, ū) pairs.  Under
        `[Problem] batch_fft = true`, same-(shape, complexness) spectra
        transform as ONE batched inverse (trailing value axis) — the
        solver-side half of the ComputeGroup.fuse_ffts optimization
        (multi-variable decks on small grids are bound by per-transform
        fixed cost).  Shares domain.batched_transform with BatchedFFT so
        the two sides can't drift."""
        from ..domain import batched_transform

        dom = self.domain
        if not getattr(self.problem, "batch_fft", False) or len(pairs) < 2:
            return {k: dom.ifft(u) for k, u in pairs}
        return batched_transform(dom.ifft, pairs)

    def _ifft_stacked(self, names, stacked):
        """{name: ifft(stacked[..., i])} for an ALREADY value-stacked array
        (variable order on the trailing axis).  Under batch_fft the stack is
        transformed whole — no slice/re-stack round-trip in the trace."""
        dom = self.domain
        if getattr(self.problem, "batch_fft", False) and len(names) >= 2:
            res = dom.ifft(stacked)
            return {k: res[..., i] for i, k in enumerate(names)}
        return {k: dom.ifft(stacked[..., i]) for i, k in enumerate(names)}


    def group_evals_per_step(self) -> int:
        """Compute-group evaluations per MOOSE timestep (feeds the
        ComputeGroupExecutionCount postprocessor)."""
        return self.substeps

    # -- history count helper ---------------------------------------------
    def n_old(self, state: Dict, buffer: str):
        """Valid old-state count for a buffer (traced int)."""
        if buffer not in state["old"]:
            return jnp.zeros((), jnp.int32)
        S = state["old"][buffer].shape[0]
        return jnp.minimum(state["n_advances"], S)

    def old_stack(self, state: Dict, buffer: str):
        """Old-state stack for a buffer; empty leading axis if no history."""
        if buffer in state["old"]:
            return state["old"][buffer]
        cur = state["buffers"][buffer]
        return jnp.zeros((0,) + cur.shape, dtype=cur.dtype)


class SplitOperatorBase(TensorSolver):
    """Binds N variables {u, ū, L̄, N̄} (reference SplitOperatorBase.C:36-66)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        buffers = params.get_str_vector("buffer", required=True)
        rbufs = params.get_str_vector("reciprocal_buffer", required=True)
        lins = params.get_str_vector("linear_reciprocal")
        nonlins = params.get_str_vector("nonlinear_reciprocal", required=True)
        n = len(buffers)
        if not lins:
            lins = ["0"] * n
        if len(rbufs) != n or len(lins) != n or len(nonlins) != n:
            params.error(
                "buffer",
                "Must have the same number of entries as 'reciprocal_buffer', "
                "'linear_reciprocal' and 'nonlinear_reciprocal'.",
            )
        self.variables = [
            SplitVariable(
                buffers[i],
                rbufs[i],
                None if lins[i] == "0" else lins[i],
                nonlins[i],
            )
            for i in range(n)
        ]
        self.history_size = 0  # set by subclasses via request_history

        # marlin_tpu extension (perf): when the deck's only producer of
        # ū is `ForwardFFT(input = u)`, that transform is redundant — the
        # previous substep's update already HAS ū, and u = ifft(ū), so
        # fft(u) == ū up to fp roundoff.  `carry_reciprocal = true` prunes
        # the ForwardFFT from the solve group and carries ū across substeps
        # instead, cutting 1 of the 3 FFT passes of a semi-implicit
        # Cahn-Hilliard substep (≈1.3x at 512³).  Off by default: bit-exact
        # gold parity requires the reference's recompute.
        self.carry_reciprocal = params.get_bool("carry_reciprocal", False)
        if self.carry_reciprocal and not getattr(
            self, "supports_carry_reciprocal", False
        ):
            params.error(
                "carry_reciprocal",
                f"not supported by {type(self).__name__}: the solver must "
                "write the updated ū back each substep (currently only "
                "AdamsBashforthMoulton does)",
            )

    def prune_reciprocal_ffts(self):
        """Remove the ForwardFFT members producing each variable's ū
        (carry_reciprocal mode).  Errors if ū has a different producer."""
        from ..computes.base import ComputeGroup
        from ..computes.core import ForwardFFT

        targets = {v.reciprocal_buffer: v.buffer for v in self.variables}
        found = set()

        if not isinstance(self.compute, ComputeGroup):
            raise ValueError(
                "carry_reciprocal = true requires the solver's root compute "
                "to be a ComputeGroup containing the ForwardFFT producers "
                f"(got a single '{type(self.compute).__name__}' via "
                "root_compute)"
            )

        def prune(group):
            kept = []
            for m in group.members:
                if isinstance(m, ComputeGroup):
                    prune(m)
                    kept.append(m)
                elif (
                    isinstance(m, ForwardFFT)
                    and m.out in targets
                    and m.input == targets[m.out]
                ):
                    found.add(m.out)
                else:
                    kept.append(m)
            group.members = kept
            group._update_io()

        prune(self.compute)
        missing = set(targets) - found
        if missing:
            raise ValueError(
                f"carry_reciprocal = true requires each reciprocal_buffer to "
                f"be produced by a ForwardFFT of its buffer; not found for "
                f"{sorted(missing)}"
            )
        self.compute.sort()

    def request_history(self, history_size: int):
        self.history_size = history_size

    def history_requests(self):
        if self.history_size == 0:
            return {}
        return {v.nonlinear_reciprocal: self.history_size for v in self.variables}

    def extra_input_buffers(self):
        out = super().extra_input_buffers()
        for v in self.variables:
            out += [v.reciprocal_buffer, v.nonlinear_reciprocal]
            if v.linear_reciprocal:
                out.append(v.linear_reciprocal)
        return out

    def output_buffers(self):
        return super().output_buffers() + [v.buffer for v in self.variables]


class ExplicitSolverBase(TensorSolver):
    """Binds variables {u, ū, dū/dt} (reference ExplicitSolverBase.C:14-30)."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        buffers = params.get_str_vector("buffer")
        rbufs = params.get_str_vector("reciprocal_buffer")
        tds = params.get_str_vector("time_derivative_reciprocal")
        n = len(buffers)
        if len(rbufs) != n or len(tds) != n:
            params.error(
                "buffer",
                "Must have the same number of entries as 'reciprocal_buffer' "
                "and 'time_derivative_reciprocal'.",
            )
        self.variables = [
            ExplicitVariable(buffers[i], rbufs[i], tds[i]) for i in range(n)
        ]

    def extra_input_buffers(self):
        out = super().extra_input_buffers()
        for v in self.variables:
            out += [v.reciprocal_buffer, v.time_derivative_reciprocal]
        return out

    def output_buffers(self):
        return super().output_buffers() + [v.buffer for v in self.variables]
