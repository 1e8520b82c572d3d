"""Transient executioner, time steppers, Terminator, CSV output.

Plays the role MOOSE's Transient executioner + Outputs system play for the
reference: the outer (host-side) time loop around the jitted step function.
Only scalar postprocessor values cross the device boundary each step; field
outputs fetch buffers on their own cadence.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional

import numpy as np

from .expression import fparse
from .hit import HitNode
from .params import Params
from .problem import TensorProblem


class TimeStepper:
    def __init__(self, params: Params):
        self.dt0 = params.get_float("dt", 1.0)

    def dt(self, step: int, dt_old: float, solver_info: Optional[dict]) -> float:
        return self.dt0


class IterationAdaptiveDT(TimeStepper):
    """MOOSE IterationAdaptiveDT / the reference's
    TensorSolveIterationAdaptiveDT (src/timesteppers/
    TensorSolveIterationAdaptiveDT.C:12-160):

    - grow dt by growth_factor when the solve converges easily
      (iterations < min_iterations), cut back by cutback_factor when it
      struggles (iterations > max_iterations);
    - after a FAILED (non-converged) solve the executioner re-attempts the
      SAME step at dt × cutback_factor_at_failure (computeFailedDT :111-129)
      and dt is not allowed to grow on the first step after a cutback
      (computeDT :76-94);
    - dt is capped by the smallest `timestep_limiting_postprocessor` value
      from step 2 on (limitDTToPostprocessorValue :131-159)."""

    def __init__(self, params: Params):
        super().__init__(params)
        self.growth_factor = params.get_float("growth_factor", 2.0)
        self.cutback_factor = params.get_float("cutback_factor", 0.5)
        self.cutback_factor_at_failure = params.get_float(
            "cutback_factor_at_failure", 0.5
        )
        self.optimal_iterations = params.get_int("optimal_iterations", None)
        self.iteration_window = params.get_int(
            "iteration_window",
            int(self.optimal_iterations / 5) if self.optimal_iterations else 0,
        )
        self.min_iterations = params.get_int("min_iterations", None)
        self.max_iterations = params.get_int("max_iterations", None)
        if self.optimal_iterations is not None:
            if self.min_iterations is None:
                self.min_iterations = self.optimal_iterations - self.iteration_window
            if self.max_iterations is None:
                self.max_iterations = self.optimal_iterations + self.iteration_window
        self.limiting_pps = params.get_str_vector(
            "timestep_limiting_postprocessor", []
        )
        self.cutback_occurred = False

    def dt(self, step, dt_old, solver_info):
        if step <= 1:
            return self.dt0
        allow_growth = not self.cutback_occurred
        self.cutback_occurred = False
        dt = dt_old
        iteration_based = (
            self.min_iterations is not None or self.max_iterations is not None
        )
        if solver_info is not None and iteration_based:
            # reference computeAdaptiveDT: cut when its > max_iterations,
            # grow ONLY when its < min_iterations, else hold
            its = solver_info.get("iterations", 0)
            if self.max_iterations is not None and its > self.max_iterations:
                dt = dt_old * self.cutback_factor
            elif (
                allow_growth
                and self.min_iterations is not None
                and its < self.min_iterations
            ):
                dt = dt_old * self.growth_factor
        elif allow_growth:
            dt = dt_old * self.growth_factor
        return dt

    def failed_dt(self, dt):
        self.cutback_occurred = True
        return dt * self.cutback_factor_at_failure

    def limit_to_pps(self, dt, step, pp_values):
        if not self.limiting_pps or step <= 1:
            return dt
        limit = min(pp_values.get(n, float("inf")) for n in self.limiting_pps)
        return min(dt, limit) if limit < dt else dt


def build_stepper(exec_node: Optional[HitNode], global_params) -> TimeStepper:
    if exec_node is not None:
        ts = exec_node.children.get("TimeStepper") or exec_node.children.get(
            "TimeSteppers"
        )
        if ts is not None:
            p = Params(ts, global_params)
            t = p.get_str("type", "ConstantDT")
            if t in ("IterationAdaptiveDT", "TensorSolveIterationAdaptiveDT"):
                return IterationAdaptiveDT(p)
            return TimeStepper(p)
    return TimeStepper(Params(exec_node, global_params))


class Terminator:
    """[UserObjects] Terminator: act when an expression over postprocessor
    values becomes true (used by reference
    benchmarks/01_spinodal_decomposition/1a.i:107-111).  MOOSE semantics:
    fail_mode = HARD (default) ends the run — cleanly for the default
    error_level, as an error for error_level = ERROR; fail_mode = SOFT
    fails the CURRENT timestep so the stepper retries it at cut dt."""

    def __init__(self, params: Params):
        self.expression = params.get_str("expression", required=True)
        self.fail_mode = params.get_enum("fail_mode", ["HARD", "SOFT"], "HARD")
        self.error_level = params.get_enum(
            "error_level", ["NONE", "INFO", "WARNING", "ERROR"], "INFO")
        self.message = params.get_str("message", None)

    def check(self, pp_values: Dict[str, float]) -> bool:
        # a broken expression (misspelled postprocessor, syntax error) must
        # surface, not silently disable termination
        try:
            return fparse(self.expression, pp_values) != 0.0
        except Exception as e:
            raise RuntimeError(
                f"Terminator expression '{self.expression}' failed to "
                f"evaluate: {e}"
            ) from e


class CSVWriter:
    """MOOSE-compatible CSV output: `time` column + ASCII-sorted
    postprocessor columns, 14 significant digits."""

    def __init__(self, path: str):
        self.path = path
        self.rows: List[Dict[str, float]] = []
        self.columns: List[str] = []

    def add_row(self, time: float, values: Dict[str, float]):
        row = {"time": time}
        row.update(values)
        for k in values:
            if k not in self.columns:
                self.columns.append(k)
        self.rows.append(row)

    @staticmethod
    def _fmt(x: float) -> str:
        if x == 0:
            return "0"
        return f"{x:.14g}"

    _written = 0          # rows already on disk
    _written_cols = None  # column set they were written with

    def write(self):
        """Flush to disk.  Called every timestep (a mid-run abort must not
        lose the rows so far — MOOSE flushes per step), so new rows APPEND
        in O(1); the file is only rewritten when the column set changes
        (it never does after row 0: the postprocessor set is fixed at
        build and every row is seeded with all names)."""
        cols = ["time"] + sorted(self.columns)
        if cols != self._written_cols:
            with open(self.path, "w") as f:
                f.write(",".join(cols) + "\n")
                for row in self.rows:
                    f.write(",".join(self._fmt(row.get(c, 0.0))
                                     for c in cols) + "\n")
            self._written_cols = cols
            self._written = len(self.rows)
            return
        with open(self.path, "a") as f:
            for row in self.rows[self._written:]:
                f.write(",".join(self._fmt(row.get(c, 0.0))
                                 for c in cols) + "\n")
        self._written = len(self.rows)


class Transient:
    """The time loop: dt scheduling, solver stepping, postprocessor and
    output execution, terminator checks."""

    def __init__(
        self,
        problem: TensorProblem,
        exec_node: Optional[HitNode] = None,
        outputs_node: Optional[HitNode] = None,
        user_objects_node: Optional[HitNode] = None,
        file_base: Optional[str] = None,
        output_dir: str = ".",
    ):
        self.problem = problem
        gp = problem.global_params
        p = Params(exec_node, gp)
        self.num_steps = p.get_int("num_steps", 10**9)
        self.start_time = p.get_float("start_time", 0.0)
        self.end_time = p.get_float("end_time", 1e30)
        self.dtmin = p.get_float("dtmin", 1e-12)
        self.dtmax = p.get_float("dtmax", 1e30)
        self.stepper = build_stepper(exec_node, gp)
        if "dt" in (exec_node.params if exec_node is not None else {}):
            self.stepper.dt0 = p.get_float("dt")

        self.terminators: List[Terminator] = []
        if user_objects_node is not None:
            for b in user_objects_node.blocks():
                bp = Params(b, gp)
                if bp.get_str("type") == "Terminator":
                    self.terminators.append(Terminator(bp))

        os.makedirs(output_dir or ".", exist_ok=True)
        self.output_dir = output_dir or "."
        self.csv = None
        op = Params(outputs_node, gp)
        # always read the deck's file_base through Params (even when the
        # caller supplies one) so the unused-parameter audit sees the access
        deck_file_base = op.get_str("file_base", None)
        self.file_base = file_base or deck_file_base or "out"
        csv_enabled = op.get_bool("csv", False)
        if outputs_node is not None:
            # MOOSE also allows `[Outputs] [name] type = CSV []` sub-blocks
            for b in outputs_node.blocks():
                if Params(b, gp).get_str("type") == "CSV":
                    csv_enabled = True
        if csv_enabled:
            self.csv = CSVWriter(os.path.join(output_dir, self.file_base + ".csv"))
        self.tensor_outputs = []  # XDMF etc., attached externally

        # [Outputs] exodus = true (or a type = Exodus sub-block): write the
        # aux variables + postprocessors to <file_base>.e (reference relies
        # on MOOSE/libMesh ExodusII_IO; see marlin_tpu/exodus.py)
        exodus_enabled = op.get_bool("exodus", False)
        if outputs_node is not None:
            for b in outputs_node.blocks():
                btype = Params(b, gp).get_str("type")
                if btype == "Exodus":
                    exodus_enabled = True
                elif btype not in ("CSV", None):
                    raise ValueError(
                        f"Unknown [Outputs] sub-block type '{btype}' "
                        f"(block '{b.name}')"
                    )
        if exodus_enabled:
            from .exodus import ExodusOutput

            self.tensor_outputs.append(
                ExodusOutput(
                    os.path.join(output_dir, self.file_base + ".e"), problem
                )
            )

        # perf graph (reference `perf_graph = true`, MOOSE TIME_SECTION)
        from .perf import PerfGraph

        self.perf = PerfGraph(enabled=op.get_bool("perf_graph", False))

        self.state = None
        self.time = self.start_time
        self.step_count = 0
        self.rejected_steps = 0
        self.pp_values: Dict[str, float] = {}
        # checkpoint/resume (reference only checkpoints MOOSE-side data, not
        # tensor buffers — SURVEY §5.4; this is the full-state superset)
        self.checkpoint_interval = p.get_int("checkpoint_interval", 0)
        self.checkpoint_path = os.path.join(
            output_dir, self.file_base + "_checkpoint.npz"
        )

    # ------------------------------------------------------------------
    def init(self):
        with self.perf.section("problem::init_state (build + ICs)"):
            self.state = self.problem.init_state()
        self.time = self.start_time
        # EXEC_INITIAL: run INITIAL postprocessors; CSV row 0 reports 0 for
        # TIMESTEP_END-only postprocessors (MOOSE semantics, see reference
        # gold test/tests/solvers/gold/diagonal_10_0_1.csv row 0)
        initial = self.problem.execute_postprocessors(
            self.state, "INITIAL", self.time, 0.0
        )
        self.pp_values = {pp.name: 0.0 for pp in self.problem.postprocessors}
        self.pp_values.update(initial)
        if self.csv is not None:
            self.csv.add_row(self.time, dict(self.pp_values))
        # INITIAL-only aux kernels keep their t=0 projection even if the
        # first output sampling happens at a later step
        self.problem.aux.seed_initial(self.state)
        self._run_outputs(initial=True)
        self._vpp_counter = 0
        self._write_vpps("INITIAL")

    def _run_outputs(self, initial=False):
        with self.perf.section("outputs"):
            for out in self.tensor_outputs:
                if getattr(out, "wants_pp_values", False):
                    out.output(
                        self.problem, self.state, self.time,
                        initial=initial, pp_values=self.pp_values,
                    )
                else:
                    out.output(self.problem, self.state, self.time, initial=initial)

    def _write_vpps(self, flag):
        """Vector postprocessor CSV series: <file_base>_<name>_NNNN.csv
        (MOOSE naming convention)."""
        active = [
            v for v in self.problem.vector_postprocessors if flag in v.execute_on
        ]
        if flag == "TIMESTEP_END":
            self._vpp_counter += 1
        if not active:
            return
        outdir = self.output_dir
        for v in active:
            cols = v.compute(self.state, {"t": self.time})
            path = os.path.join(
                outdir, f"{self.file_base}_{v.name}_{self._vpp_counter:04d}.csv"
            )
            names = list(cols)
            rows = zip(*[cols[c] for c in names])
            with open(path, "w") as f:
                f.write(",".join(names) + "\n")
                for row in rows:
                    f.write(",".join(CSVWriter._fmt(x) for x in row) + "\n")

    def save_checkpoint(self):
        from . import checkpoint

        checkpoint.save(
            self.checkpoint_path,
            self.state,
            self.time,
            self.step_count,
            self._last_dt,
            self.pp_values,
            aux_cache=self.problem.aux._initial_cache,
        )

    def recover(self, path=None):
        """Resume from a checkpoint: restores state, time, and step count."""
        from . import checkpoint

        state, meta = checkpoint.load(path or self.checkpoint_path)
        self.state = state
        self.time = meta["time"]
        self.step_count = meta["step"]
        self._vpp_counter = meta["step"]
        self._last_dt = meta["dt"]
        self._lbm_residual = None  # re-fetch from the restored state
        self.pp_values = dict(meta.get("pp_values", {}))
        # restore the INITIAL-only aux-kernel samples; a checkpoint written
        # before this field existed leaves the cache empty, in which case
        # the first post-resume sample would otherwise masquerade as t=0 —
        # seed from the restored state is wrong too, so re-seeding is NOT
        # attempted: the saved cache is the only valid source
        self.problem.aux._initial_cache.update({
            k: np.asarray(v) for k, v in meta.get("aux_cache", {}).items()
        })

    _last_dt = 0.0
    _lbm_residual = None
    _vpp_counter = 0

    def run(self) -> Dict[str, float]:
        if self.state is None:
            self.init()
        dt_old = self._last_dt  # nonzero when resuming from a checkpoint
        dt = self._last_dt or self.stepper.dt0
        solver_info = None
        while self.step_count < self.num_steps and self.time < self.end_time - 1e-13:
            # LBM convergence early-out (reference LatticeBoltzmannProblem::
            # execute :74 — once the residual drops below tolerance, all
            # further execution is skipped)
            if self.problem.is_lbm:
                # the residual normally arrives as a host float with the
                # previous step's pp sync (step_with_pps appends
                # `_lbm_residual`); the device fetch only happens before the
                # first step / after a checkpoint resume
                res = self._lbm_residual
                if res is None:
                    dres = self.state.get("solver", {}).get("residual")
                    res = None if dres is None else float(dres)
                if res is not None and res < self.problem.lbm_tolerance:
                    break
            self.step_count += 1
            dt = self.stepper.dt(self.step_count, dt, solver_info)
            if hasattr(self.stepper, "limit_to_pps"):
                dt = self.stepper.limit_to_pps(dt, self.step_count, self.pp_values)
            dt = min(dt, self.dtmax, self.end_time - self.time)
            dt = max(dt, self.dtmin)

            # attempt the step; on solver non-convergence RE-ATTEMPT THE SAME
            # step with cut dt (MOOSE Transient semantics — the reference's
            # computeFailedDT, TensorSolveIterationAdaptiveDT.C:111-129).
            # The pre-step state pytree is immutable, so rejection is free.
            prev_state = self.state
            while True:
                section = (
                    "solver::step (first; incl. compile)"
                    if self.step_count == 1
                    else "solver::step"
                )
                with self.perf.section(section):
                    self.state, values = self.problem.step_with_pps(
                        prev_state, self.time, dt, dt_old,
                        first_step=(self.step_count == 1),
                    )
                solver_info = self._solver_info()
                # SOFT terminators fail the CURRENT step (MOOSE fail_mode =
                # SOFT): retry at cut dt like a non-converged solve
                soft_fired = any(
                    t.check({**self.pp_values,
                             **{k: v for k, v in values.items()
                                if not k.startswith("_")}})
                    for t in self.terminators if t.fail_mode == "SOFT"
                )
                solve_ok = (
                    solver_info is None
                    or solver_info.get("converged", True)
                )
                if solve_ok and not soft_fired:
                    break
                if not hasattr(self.stepper, "failed_dt"):
                    if soft_fired:
                        # MOOSE fails the step; with no adaptive stepper
                        # there is no cutback path, which MOOSE reports as
                        # a dtmin abort — never silently ignore the
                        # terminator (reference Terminator fail_mode=SOFT)
                        raise RuntimeError(
                            "Terminator fired with fail_mode = SOFT but the "
                            "TimeStepper cannot cut back the timestep (no "
                            "IterationAdaptiveDT); cannot continue!"
                        )
                    # non-converged iterative solve with constant dt: the
                    # reference solvers roll back to the old solution, warn,
                    # and the run continues (SecantSolver.C:185-193)
                    break
                if dt <= self.dtmin:
                    raise RuntimeError(
                        "Solve failed and timestep already at dtmin, "
                        "cannot continue!"
                    )
                self.rejected_steps += 1
                dt = max(self.stepper.failed_dt(dt), self.dtmin)
            self._last_dt = dt
            self.time += dt
            dt_old = dt
            # internal early-out scalar: consume it before it leaks into the
            # CSV / console pp tables
            self._lbm_residual = values.pop("_lbm_residual", None)
            self.pp_values.update(values)
            if self.csv is not None:
                self.csv.add_row(self.time, dict(self.pp_values))
                self.csv.write()
            self._run_outputs()
            self._write_vpps("TIMESTEP_END")
            if (
                self.checkpoint_interval
                and self.step_count % self.checkpoint_interval == 0
            ):
                self.save_checkpoint()

            hard_fired = [t for t in self.terminators
                          if t.fail_mode == "HARD" and t.check(self.pp_values)]
            if hard_fired:
                t = hard_fired[0]
                msg = t.message or (
                    f"Terminator expression '{t.expression}' is true")
                if t.error_level == "ERROR":
                    raise RuntimeError(msg)
                if t.error_level != "NONE":
                    print(msg)
                break

        if self.csv is not None:
            self.csv.write()
        with self.perf.section("outputs"):
            for out in self.tensor_outputs:
                out.finalize()
        if self.perf.enabled:
            print(self.perf.report())
        return self.pp_values

    def _solver_info(self):
        sstate = self.state.get("solver", {})
        if "iterations" not in sstate:
            return None
        return {
            "iterations": int(sstate["iterations"]),
            "converged": bool(sstate["converged"]),
        }


def run_deck(
    root: HitNode,
    file_base: Optional[str] = None,
    output_dir: str = ".",
    mesh=None,
    deck_stem: Optional[str] = None,
    deck_dir: Optional[str] = None,
) -> Transient:
    """Build and run a full deck; returns the finished Transient."""
    problem = TensorProblem(root, mesh=mesh, deck_dir=deck_dir)
    transient = Transient(
        problem,
        exec_node=root.children.get("Executioner"),
        outputs_node=root.children.get("Outputs"),
        user_objects_node=root.children.get("UserObjects"),
        file_base=file_base,
        output_dir=output_dir,
    )
    # [TensorOutputs] — XDMF/HDF5 field outputs
    tout = root.children.get("TensorOutputs")
    if tout is not None:
        from .outputs import build_tensor_outputs

        transient.tensor_outputs.extend(build_tensor_outputs(
            tout, problem, output_dir=output_dir, default_file_base=deck_stem
        ))
    # unknown-parameter audit (MOOSE validParams analog): after init_state
    # every object (incl. buffer specs, read during IC setup) has consumed
    # its keys, so any never-read key is a typo or an unsupported feature
    from .params import check_unused

    transient.init()
    check_unused(
        root, strict=problem.problem_params.get_bool("strict_params", False)
    )
    transient.run()
    return transient
