"""Regression tests for the round-3 review items (VERDICT.md r02):
fuse_pps auto-fallback when a backend rejects the fused step+pp program,
Let.differentiate rebinding order (ADVICE r02 medium), and xdmfdiff
local-gap pairing live in their subsystem test files."""

import warnings

import pytest

from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem

PP_DECK = """
[Domain]
  dim = 2
  nx = 8
  ny = 8
  xmax = 1
  ymax = 1
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ParsedCompute
      buffer = c
      extra_symbols = true
      expression = 'sin(2*pi*x)*cos(2*pi*y)+1'
    []
  []
  [Solve]
    [decay]
      type = ParsedCompute
      buffer = c
      expression = 'c*0.9'
      inputs = c
    []
  []
[]
[Problem]
  type = TensorProblem
[]
[Postprocessors]
  [avg_c]
    type = TensorAveragePostprocessor
    buffer = c
  []
[]
"""


class _RejectOnce:
    """Stand-in for a jitted fused step+pp program whose backend compile
    fails (the axon remote-TPU rejection signature)."""

    def __init__(self):
        self.calls = 0

    def __call__(self, *a, **k):
        self.calls += 1
        raise RuntimeError("UNIMPLEMENTED: backend rejected fused program")


def test_fuse_pps_auto_fallback():
    """A backend that rejects the fused step+pp program on its first call
    must NOT break the run: step_with_pps warns once, flips fuse_pps off,
    and serves the step + postprocessors via the split path."""
    root = hit.parse(PP_DECK)
    p = TensorProblem(root)
    state = p.init_state()
    assert p.fuse_pps

    reject = _RejectOnce()
    p._step_fns["step_pp"] = reject  # pre-seed the cache with the rejection
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        new_state, vals = p.step_with_pps(state, 0.0, 0.1, 0.0, True)
    assert reject.calls == 1
    assert any("fuse_pps" in str(x.message) for x in w)
    assert p.fuse_pps is False
    assert vals["avg_c"] == pytest.approx(0.9, rel=1e-6)

    # subsequent steps stay on the split path with no further warnings
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        _, vals2 = p.step_with_pps(new_state, 0.1, 0.1, 0.1, False)
    assert not [x for x in w2 if "fuse_pps" in str(x.message)]
    assert vals2["avg_c"] == pytest.approx(0.81, rel=1e-6)


def test_fuse_pps_later_failure_reraises():
    """Once the fused program has served a call, a later exception is a
    real error and must surface, not silently fall back."""
    root = hit.parse(PP_DECK)
    p = TensorProblem(root)
    state = p.init_state()
    state, vals = p.step_with_pps(state, 0.0, 0.1, 0.0, True)
    assert p.fuse_pps and getattr(p, "_step_pp_verified", False)

    def boom(*a, **k):
        raise RuntimeError("mid-run failure")

    p._step_fns["step_pp"] = boom
    with pytest.raises(RuntimeError, match="mid-run failure"):
        p.step_with_pps(state, 0.1, 0.1, 0.1, False)


def test_bench_allow_variant_warm_scaling(monkeypatch):
    """bench._allow_variant: cold reserves must not permanently starve
    early-child variants when the child's own compile came back warm
    (review r03 finding)."""
    import time as _time

    import bench

    deadline = _time.time() + 500  # 500s of raw budget left
    monkeypatch.setenv("MARLIN_TPU_BENCH_DEADLINE", str(deadline))
    monkeypatch.setenv("MARLIN_TPU_BENCH_RESERVE", "1720")  # 1a's cold reserve

    # cold compile observed: full reserve applies -> variant starved
    assert not bench._allow_variant(300, observed_compile_s=250.0)
    # warm compile observed: reserve and cost scale down -> variant runs
    assert bench._allow_variant(300, observed_compile_s=10.0)
    # no deadline env: always allowed (standalone --child runs)
    monkeypatch.delenv("MARLIN_TPU_BENCH_DEADLINE")
    assert bench._allow_variant(10_000, observed_compile_s=None)


def test_h5_diff_per_dataset_overrides(tmp_path):
    """gold.h5_diff: per-dataset-prefix tolerance overrides apply to all
    frames of that field and leave other fields at the base tolerance."""
    import h5py
    import numpy as np

    from tests import gold as goldmod

    g = tmp_path / "gold.h5"
    m = tmp_path / "mine.h5"
    with h5py.File(g, "w") as f:
        f["c.0"] = np.ones((4, 4))
        f["mu.0"] = np.ones((4, 4))
    with h5py.File(m, "w") as f:
        f["c.0"] = np.ones((4, 4)) + 1e-5
        f["mu.0"] = np.ones((4, 4)) + 0.05  # 5% off
    monkey_ref = goldmod.REF
    try:
        goldmod.REF = str(tmp_path)
        # without override: mu fails at the base tolerance
        with pytest.raises(AssertionError, match="mu.0"):
            goldmod.h5_diff("gold.h5", str(m), abs_tol=1e-4, rel_tol=0.0)
        # with a mu override both pass; c still guarded by the base tol
        goldmod.h5_diff("gold.h5", str(m), abs_tol=1e-4, rel_tol=0.0,
                        overrides={"mu": (1e-3, 0.1)})
        with h5py.File(m, "r+") as f:
            del f["c.0"]
            f["c.0"] = np.ones((4, 4)) + 0.01
        with pytest.raises(AssertionError, match="c.0"):
            goldmod.h5_diff("gold.h5", str(m), abs_tol=1e-4, rel_tol=0.0,
                            overrides={"mu": (1e-3, 0.1)})
    finally:
        goldmod.REF = monkey_ref
