"""`[Problem] batch_fft = true` — batching independent same-shape FFT
computes (and the solver's per-variable inverse transforms) into single
batched transforms (marlin_tpu perf extension; the reference dispatches
one torch.fft per PerformFFT op, src/tensor_computes/PerformFFT.C).

The knob must be numerically invisible: batched rfftn/irfftn apply the
same 1-D kernels per trailing slice, so trajectories match the unbatched
path bit-for-bit in f64.
"""

import jax
import numpy as np
import pytest

from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem

DECK_2A = "/root/reference/benchmarks/02_oswald_ripening/2a.i"


def _run_2a(cli, steps=2):
    root = hit.load(
        DECK_2A, cli + ["TensorSolver/substeps=5",
                        "Domain/floating_precision=DOUBLE"])
    p = TensorProblem(root)
    s = p.init_state()
    step = jax.jit(p._step_impl)
    t, dt, dto = 0.0, 1e-3, 0.0
    for k in range(steps):
        s = step(s, t, dt, dto, k == 0)
        t, dto, dt = t + dt, dt, min(dt * 1.1, 10.0)
    return p, {k: np.asarray(v) for k, v in s["buffers"].items()}


def test_2a_bitexact_parity():
    """5-variable Ostwald deck: batched == unbatched bit-for-bit (f64)."""
    _, a = _run_2a([])
    _, b = _run_2a(["Problem/batch_fft=true"])
    for k in ("c", "n1", "n2", "n3", "n4", "c_bar", "mu_c_bar"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_2a_execution_order_shows_batches():
    """The solve group's 10 forward transforms (5 ū + 5 µ̄) fuse into a
    single batched node."""
    root = hit.load(DECK_2A, ["Problem/batch_fft=true"])
    p = TensorProblem(root)
    order = p.solver.compute.execution_order()
    batches = [n for n in order if n.startswith("batch_fft(")]
    # Kahn's stable order puts all 10 forward transforms back to back, so
    # they fuse into a single batch node
    assert len(batches) == 1, order
    for name in ("c_bar", "n1_bar", "mu_c_bar", "mu_n4_bar"):
        assert name in batches[0]


def test_fft_of_fft_chain_not_fused():
    """A ForwardFFT consuming another ForwardFFT's output must keep its
    ordering (the run splits instead of batching a dependency)."""
    deck = """
[Domain]
  dim = 2
  nx = 8
  ny = 8
  xmax = 1
  ymax = 1
[]
[TensorComputes]
  [Initialize]
    [a]
      type = ConstantTensor
      buffer = a
      real = 1.0
    []
  []
  [Solve]
    [abar]
      type = ForwardFFT
      buffer = abar
      input = a
    []
    [abarbar]
      type = ForwardFFT
      buffer = abarbar
      input = abar
    []
    [nbar]
      type = ParsedCompute
      buffer = nbar
      expression = 'abar*0'
      inputs = abar
    []
  []
[]
[TensorSolver]
  type = ForwardEulerSolver
  buffer = a
  reciprocal_buffer = abar
  time_derivative_reciprocal = nbar
[]
[Problem]
  type = TensorProblem
  batch_fft = true
[]
"""
    p = TensorProblem(hit.parse(deck))
    order = p.solver.compute.execution_order()
    assert not any(
        n.startswith("batch_fft(") and "abarbar" in n and "abar," in n
        for n in order
    )
    # the chain still executes in order
    assert order.index("abar") < order.index("abarbar")


def test_batch_fft_rejected_in_parallel_mode():
    root = hit.load(DECK_2A, ["Problem/batch_fft=true",
                              "Domain/parallel_mode=FFT_SLAB"])
    with pytest.raises(Exception, match="serial-only"):
        TensorProblem(root)


def test_coupled_solver_batched_ifft_parity():
    """AdamsBashforthMoultonCoupled's per-variable inverse transforms
    batch under the knob; trajectories bit-match the unbatched run."""
    deck = "/root/reference/test/tests/solvers/coupled.i"

    def run(cli):
        root = hit.load(deck, cli + ["ss=10", "cs=1", "order=2",
                                     "Domain/floating_precision=DOUBLE"])
        p = TensorProblem(root)
        s = p.init_state()
        step = jax.jit(p._step_impl)
        t, dt = 0.0, 0.1
        for k in range(3):
            s = step(s, t, dt, dt, k == 0)
            t += dt
        return {k: np.asarray(v) for k, v in s["buffers"].items()}

    a = run([])
    b = run(["Problem/batch_fft=true"])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.parametrize("deck", [
    "benchmarks/02_oswald_ripening/2a_secant.i",
    "benchmarks/02_oswald_ripening/2a_broyden.i",
])
def test_iterative_solvers_batched_parity(deck):
    """Secant/Broyden multi-variable decks: the batched inverse
    transforms inside the iteration while_loops (and the batched group
    forward transforms) leave trajectories bit-identical (f64)."""
    path = f"/root/reference/{deck}"

    def run(cli):
        root = hit.load(path, cli + ["TensorSolver/substeps=3",
                                     "Domain/floating_precision=DOUBLE"])
        p = TensorProblem(root)
        s = p.init_state()
        step = jax.jit(p._step_impl)
        t, dt, dto = 0.0, 1e-3, 0.0
        for k in range(2):
            s = step(s, t, dt, dto, k == 0)
            t, dto, dt = t + dt, dt, min(dt * 1.1, 10.0)
        return {k: np.asarray(v) for k, v in s["buffers"].items()}

    a = run([])
    b = run(["Problem/batch_fft=true"])
    for k in ("c", "n1", "n4"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


SOLVERLESS_DECK = """
[Domain]
  dim = 2
  nx = 8
  ny = 8
  xmax = 1
  ymax = 1
[]
[TensorComputes]
  [Initialize]
    [a]
      type = RandomTensor
      buffer = a
      min = 0
      max = 1
      seed = 1
    []
    [b]
      type = RandomTensor
      buffer = b
      min = 0
      max = 1
      seed = 2
    []
  []
  [Solve]
    [abar]
      type = ForwardFFT
      buffer = abar
      input = a
    []
    [bbar]
      type = ForwardFFT
      buffer = bbar
      input = b
    []
    [mix]
      type = ParsedCompute
      buffer = a
      expression = 'a*0.5 + b*0.5'
      inputs = 'a b'
    []
  []
[]
[Problem]
  type = TensorProblem
[]
"""


def _run_solverless(cli):
    root = hit.parse(SOLVERLESS_DECK)
    hit.apply_cli_args(root, cli + ["Domain/floating_precision=DOUBLE"])
    hit.expand_braces(root)
    p = TensorProblem(root)
    s = p.init_state()
    step = jax.jit(p._step_impl)
    for k in range(3):
        s = step(s, 0.1 * k, 0.1, 0.1, k == 0)
    return p, {k: np.asarray(v) for k, v in s["buffers"].items()}


def test_solverless_deck_batch_fft_fuses_and_matches():
    """Decks without a [TensorSolver]/[TensorTimeIntegrators] block still
    get batch_fft fusion (the per-step computes run in declared order,
    reference TensorProblem::execute else-branch) with bit-exact parity."""
    pa, a = _run_solverless([])
    pb, b = _run_solverless(["Problem/batch_fft=true"])
    assert pa._solverless_group is None
    order = pb._solverless_group.execution_order()
    assert any(n.startswith("batch_fft(") for n in order), order
    for k in ("a", "abar", "bbar"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_solverless_deck_batch_fft_rejected_in_parallel_mode():
    """The serial-only rejection fires even without a solver block
    (regression: the _build_solver early return used to skip it)."""
    root = hit.parse(SOLVERLESS_DECK)
    hit.apply_cli_args(root, ["Problem/batch_fft=true",
                              "Domain/parallel_mode=FFT_SLAB"])
    with pytest.raises(Exception, match="serial-only"):
        TensorProblem(root)


NESTED_GROUP_DECK = """
[Domain]
  dim = 2
  nx = 8
  ny = 8
  xmax = 1
  ymax = 1
[]
[TensorComputes]
  [Initialize]
    [a]
      type = RandomTensor
      buffer = a
      min = 0
      max = 1
      seed = 1
    []
    [b]
      type = RandomTensor
      buffer = b
      min = 0
      max = 1
      seed = 2
    []
  []
  [Solve]
    [ffts]
      type = ComputeGroup
      computes = 'abar bbar'
      [abar]
        type = ForwardFFT
        buffer = abar
        input = a
      []
      [bbar]
        type = ForwardFFT
        buffer = bbar
        input = b
      []
    []
    [mix]
      type = ParsedCompute
      buffer = a
      expression = 'a*0.5 + b*0.5'
      inputs = 'a b'
    []
  []
[]
[Problem]
  type = TensorProblem
[]
"""


def test_nested_group_fusion_survives_init_state():
    """fuse_ffts recursion into a nested ComputeGroup must survive
    init_state, which wraps the same member objects in a fresh '_all_solve'
    group and re-sorts (regression: the recursion used to rebuild the
    nested group's sorted_members, silently discarding the BatchedFFT)."""
    root = hit.parse(NESTED_GROUP_DECK)
    hit.apply_cli_args(root, ["Problem/batch_fft=true",
                              "Domain/floating_precision=DOUBLE"])
    hit.expand_braces(root)
    p = TensorProblem(root)
    p.init_state()  # re-sorts a fresh group over the same members
    order = p._solverless_group.execution_order()
    assert any(n.startswith("batch_fft(") for n in order), order


def test_batch_fft_rejected_for_lbm():
    """LatticeBoltzmannProblem decks reject batch_fft by name (the LBM
    substep loop builds its own groups; silently ignoring the knob would
    be worse)."""
    deck = "/root/reference/test/tests/lbm/channel2D.i"
    root = hit.load(deck, ["Problem/batch_fft=true"])
    with pytest.raises(Exception, match="does not apply to"):
        TensorProblem(root)


SOLVERLESS_NESTED_DEP_DECK = """
[Domain]
  dim = 2
  nx = 8
  ny = 8
  xmax = 1
  ymax = 1
[]
[TensorComputes]
  [Initialize]
    [a]
      type = RandomTensor
      buffer = a
      min = 1
      max = 2
      seed = 1
    []
  []
  [Solve]
    [grp]
      type = ComputeGroup
      computes = 'c d'
      # consumer declared BEFORE its producer: only a topological sort
      # of the nested group executes d first
      [c]
        type = ParsedCompute
        buffer = c
        expression = 'd*2'
        inputs = d
      []
      [d]
        type = ParsedCompute
        buffer = d
        expression = 'a+1'
        inputs = a
      []
    []
  []
[]
[Problem]
  type = TensorProblem
[]
"""


def test_solverless_nested_group_is_sorted_under_batch_fft():
    """Nested groups are dependency-sorted in the reference even when the
    top level runs in declared order; the solverless batch_fft path must
    not freeze them unsorted (regression: fuse_ffts froze the declared
    consumer-before-producer order, producing c=0 instead of 2(a+1))."""
    def run(cli):
        root = hit.parse(SOLVERLESS_NESTED_DEP_DECK)
        hit.apply_cli_args(root, cli + ["Domain/floating_precision=DOUBLE"])
        hit.expand_braces(root)
        p = TensorProblem(root)
        s = jax.jit(p._step_impl)(p.init_state(), 0.0, 0.1, 0.1, True)
        return {k: np.asarray(v) for k, v in s["buffers"].items()}

    a = run([])
    b = run(["Problem/batch_fft=true"])
    np.testing.assert_array_equal(a["d"], a["a"] + 1.0)
    np.testing.assert_array_equal(a["c"], 2.0 * (a["a"] + 1.0))
    for k in ("a", "c", "d"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
