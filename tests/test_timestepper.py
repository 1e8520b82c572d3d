"""Step-rejection + adaptive-dt semantics (reference
src/timesteppers/TensorSolveIterationAdaptiveDT.C):

- a non-converged iterative solve re-attempts the SAME step with dt cut by
  cutback_factor_at_failure (computeFailedDT :111-129) — time does not
  advance for the failed attempt;
- dt may not grow on the step right after a cutback (computeDT :76-94);
- `timestep_limiting_postprocessor` caps dt from step 2 on
  (limitDTToPostprocessorValue :131-159).
"""

import math

import pytest

from marlin_tpu import hit
from marlin_tpu.executioner import Transient
from marlin_tpu.problem import TensorProblem

# nonlinear diffusion u_t = ∇²u − u³, secant-solved per k-point: at a huge
# dt the damped secant cannot converge in max_iterations; at the cut dt it
# converges immediately
_SECANT_DECK = """
[Domain]
  dim = 1
  nx = 16
  xmax = 6.283185307179586
[]
[TensorComputes]
  [Initialize]
    [u]
      type = ParsedCompute
      buffer = u
      extra_symbols = true
      expression = 'sin(x)'
    []
    [Lbar]
      type = ReciprocalLaplacianFactor
      factor = 1
      buffer = Lbar
    []
  []
  [Solve]
    [N]
      type = ParsedCompute
      buffer = N
      expression = '-u*u*u'
      inputs = u
    []
    [Nbar]
      type = ForwardFFT
      buffer = Nbar
      input = N
    []
    [ubar]
      type = ForwardFFT
      buffer = ubar
      input = u
    []
  []
[]
[TensorSolver]
  type = SecantSolver
  buffer = u
  reciprocal_buffer = ubar
  linear_reciprocal = Lbar
  nonlinear_reciprocal = Nbar
  substeps = 1
  max_iterations = {max_its}
  absolute_tolerance = 1e-10
  relative_tolerance = 1e-10
[]
[Problem]
  type = TensorProblem
[]
[Executioner]
  type = Transient
  num_steps = {num_steps}
  [TimeStepper]
    type = TensorSolveIterationAdaptiveDT
    dt = {dt}
    cutback_factor_at_failure = {cutback}
    growth_factor = 2.0
    min_iterations = 1000
  []
[]
"""


def _run(dt, cutback, max_its=10, num_steps=2, growth=2.0):
    root = hit.parse(
        _SECANT_DECK.format(dt=dt, cutback=cutback, max_its=max_its, num_steps=num_steps)
    )
    root.children["Executioner"].children["TimeStepper"].set_param(
        "growth_factor", str(growth)
    )
    problem = TensorProblem(root)
    tr = Transient(problem, exec_node=root.children.get("Executioner"))
    tr.run()
    return tr


# measured on this model: the damped secant at max_iterations=10 FAILS at
# dt=1.0 (10 its, not converged) and converges at dt=1e-3 (8 its)


def test_failed_step_is_reattempted_with_cut_dt():
    """A non-converged solve must repeat the SAME step at cut dt; time
    advances only by the accepted (cut) dt, never the failed attempt."""
    tr = _run(dt=1.0, cutback=0.001, num_steps=1)
    assert tr.rejected_steps >= 1
    assert tr.step_count == 1
    assert math.isclose(tr.time, 1e-3, rel_tol=1e-12), tr.time


def test_converged_run_has_no_rejections():
    tr = _run(dt=1e-3, cutback=0.5, max_its=30, growth=1.0)
    assert tr.rejected_steps == 0
    assert tr.step_count == 2
    assert math.isclose(tr.time, 2e-3, rel_tol=1e-12)


def test_dtmin_failure_raises():
    """Reference: 'Solve failed and timestep already at dtmin, cannot
    continue!' (computeFailedDT :115-117)."""
    root = hit.parse(
        _SECANT_DECK.format(dt=1.0, cutback=0.5, max_its=2, num_steps=1)
    )
    root.children["Executioner"].set_param("dtmin", "1.0")
    problem = TensorProblem(root)
    tr = Transient(problem, exec_node=root.children.get("Executioner"))
    with pytest.raises(RuntimeError, match="already at dtmin"):
        tr.run()


def test_no_growth_after_cutback():
    """dt must not grow on the step right after a failure cutback
    (computeDT :76-94, _cutback_occurred)."""
    tr = _run(dt=1.0, cutback=0.001, num_steps=2)
    assert tr.rejected_steps >= 1
    # step 1: reject dt=1.0, accept 1e-3; step 2: growth suppressed -> 1e-3
    # (min_iterations=1000 would otherwise always grow: time would be 3e-3)
    assert math.isclose(tr.time, 2e-3, rel_tol=1e-10), tr.time


_LIMIT_DECK = """
[Domain]
  dim = 1
  nx = 16
  xmax = 6.283185307179586
[]
[TensorComputes]
  [Initialize]
    [u]
      type = ParsedCompute
      buffer = u
      extra_symbols = true
      expression = 'sin(x)'
    []
    [Lbar]
      type = ReciprocalLaplacianFactor
      factor = 1
      buffer = Lbar
    []
  []
  [Solve]
    [Nbar]
      type = ConstantReciprocalTensor
      buffer = Nbar
    []
    [ubar]
      type = ForwardFFT
      buffer = ubar
      input = u
    []
  []
[]
[TensorSolver]
  type = AdamsBashforthMoulton
  buffer = u
  reciprocal_buffer = ubar
  linear_reciprocal = Lbar
  nonlinear_reciprocal = Nbar
  substeps = 1
[]
[Problem]
  type = TensorProblem
[]
[Postprocessors]
  [dt_crit]
    type = SemiImplicitCriticalTimeStep
    buffer = Lbar
    execute_on = 'INITIAL TIMESTEP_END'
  []
[]
[Executioner]
  type = Transient
  num_steps = 3
  [TimeStepper]
    type = TensorSolveIterationAdaptiveDT
    dt = 1.0
    growth_factor = 2.0
    timestep_limiting_postprocessor = dt_crit
  []
[]
"""


def test_timestep_limiting_postprocessor():
    """dt is capped at the smallest limiting-PP value from step 2 on."""
    root = hit.parse(_LIMIT_DECK)
    problem = TensorProblem(root)
    tr = Transient(problem, exec_node=root.children.get("Executioner"))
    tr.run()
    # Lbar = -k² on 16 points over 2π: max |L| = 8² = 64 → dt_crit = 1/64.
    # step 1: dt = 1 (limit not applied on the first step, :136);
    # steps 2,3: dt capped to 1/64
    assert math.isclose(tr.time, 1.0 + 2.0 / 64.0, rel_tol=1e-9), tr.time


def test_perf_graph(capsys):
    """`[Outputs] perf_graph = true` prints the per-section timing table
    (reference 1a.i:178 / MOOSE TIME_SECTION perf graph)."""
    root = hit.parse(
        _SECANT_DECK.format(dt=1e-3, cutback=0.5, max_its=30, num_steps=2)
        + "\n[Outputs]\n  perf_graph = true\n[]\n"
    )
    problem = TensorProblem(root)
    tr = Transient(
        problem,
        exec_node=root.children.get("Executioner"),
        outputs_node=root.children.get("Outputs"),
    )
    tr.run()
    out = capsys.readouterr().out
    assert "Performance Graph:" in out
    assert "solver::step (first; incl. compile)" in out
    assert "problem::init_state" in out


def test_min_iterations_only_holds_dt():
    """With only min_iterations set, dt must NOT grow when iterations >=
    min (reference computeAdaptiveDT grows only when its < min_iterations;
    code-review r2 finding)."""
    from marlin_tpu.executioner import IterationAdaptiveDT
    from marlin_tpu.params import Params

    node = hit.parse("[TimeStepper]\n  dt = 1\n  min_iterations = 5\n  growth_factor = 2\n[]").children["TimeStepper"]
    ts = IterationAdaptiveDT(Params(node))
    # 8 iterations >= min 5 -> hold
    assert ts.dt(2, 1.0, {"iterations": 8, "converged": True}) == 1.0
    # 3 iterations < min 5 -> grow
    assert ts.dt(3, 1.0, {"iterations": 3, "converged": True}) == 2.0


def test_carry_reciprocal_rejected_for_non_abm():
    """carry_reciprocal is ABM-only (other solvers never write ū back;
    code-review r2 finding)."""
    from marlin_tpu.params import ParamError

    deck = _SECANT_DECK.format(dt=1e-3, cutback=0.5, max_its=5, num_steps=1)
    deck = deck.replace("substeps = 1", "substeps = 1\n  carry_reciprocal = true")
    with pytest.raises(ParamError, match="carry_reciprocal"):
        TensorProblem(hit.parse(deck))


_TERM_DECK_TAIL = """
[UserObjects]
  [term]
    type = Terminator
    expression = '{expr}'
    {extra}
  []
[]
"""


def _run_terminator(expr, extra="", num_steps=5):
    deck = _LIMIT_DECK.replace("num_steps = 3", f"num_steps = {num_steps}") \
        + _TERM_DECK_TAIL.format(expr=expr, extra=extra)
    root = hit.parse(deck)
    problem = TensorProblem(root)
    tr = Transient(problem,
                   exec_node=root.children.get("Executioner"),
                   user_objects_node=root.children.get("UserObjects"))
    tr.run()
    return tr


def test_terminator_stops_run():
    """Default HARD/INFO terminator ends the run cleanly (reference
    benchmarks/01_spinodal_decomposition/1a.i usage)."""
    tr = _run_terminator("dt_crit > 0")  # true from step 1
    assert tr.step_count == 1


def test_terminator_error_level_error_raises():
    """MOOSE fail_mode=HARD + error_level=ERROR aborts as an error."""
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        _run_terminator("dt_crit > 0",
                        extra="error_level = ERROR\n    message = 'boom'")


def test_terminator_broken_expression_raises():
    """A misspelled postprocessor in the expression must surface instead
    of silently disabling termination (regression: check() used to
    swallow every exception and return False)."""
    import pytest

    with pytest.raises(RuntimeError, match="failed to.*evaluate"):
        _run_terminator("dt_crti > 0")


def test_terminator_soft_fails_the_step():
    """fail_mode=SOFT fails the CURRENT timestep: the stepper retries at
    cut dt until dtmin, then hard-errors (MOOSE semantics)."""
    import pytest

    with pytest.raises(RuntimeError, match="dtmin"):
        _run_terminator("dt_crit > 0", extra="fail_mode = SOFT", num_steps=2)


def test_vpp_csv_respects_output_dir(tmp_path):
    """Vector-postprocessor CSV series land in output_dir even when the
    scalar CSV output is disabled (regression: they fell back to cwd)."""
    import os

    from marlin_tpu import hit as hit_mod
    from marlin_tpu.executioner import run_deck

    root = hit_mod.load(
        "/root/reference/test/tests/histogram/test.i",
        ["Executioner/num_steps=1", "Outputs/csv=false"])
    run_deck(root, file_base="hist_out", output_dir=str(tmp_path),
             deck_stem="test")
    files = os.listdir(tmp_path)
    assert any(f.startswith("hist_out_hist_") and f.endswith(".csv")
               for f in files), files


def test_csv_flushed_every_step(tmp_path):
    """The scalar CSV is (re)written each timestep, so a mid-run abort
    still leaves the rows written so far (MOOSE flush-per-step behavior)."""
    import os

    import numpy as np
    import pytest

    deck = (_LIMIT_DECK.replace("num_steps = 3", "num_steps = 10")
            + _TERM_DECK_TAIL.format(
                expr="dt_crit > 0",
                extra="error_level = ERROR\n    message = 'stop'"))
    root = hit.parse(deck)
    problem = TensorProblem(root)
    from marlin_tpu.executioner import Transient

    tr = Transient(problem,
                   exec_node=root.children.get("Executioner"),
                   outputs_node=hit.parse("[Outputs]\ncsv = true\n[]")
                   .children["Outputs"],
                   user_objects_node=root.children.get("UserObjects"),
                   file_base="abort", output_dir=str(tmp_path))
    with pytest.raises(RuntimeError, match="stop"):
        tr.run()
    path = os.path.join(str(tmp_path), "abort.csv")
    assert os.path.exists(path)
    rows = np.genfromtxt(path, delimiter=",", names=True)
    assert np.atleast_1d(rows).shape[0] >= 2  # initial + step 1
