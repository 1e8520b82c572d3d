"""ETDRK4 `cox_matthews = true` — corrected Cox & Matthews (2002)
coefficients (the reference's own phi1 and L->0 limits deviate; see
solvers/etdrk4.py docstring).  The default stays reference-exact."""

import jax
import numpy as np
import pytest

from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem

DECK = """
[Domain]
  dim = 1
  nx = 64
  xmax = 6.283185307179586
  floating_precision = DOUBLE
[]
[TensorBuffers]
  [u][]
  [ubar][]
  [Lbar][]
  [Nbar][]
  [mu][]
[]
[TensorComputes]
  [Initialize]
    [u]
      type = ParsedCompute
      buffer = u
      extra_symbols = true
      expression = '0.1*sin(x) + 0.05*cos(2*x)'
    []
    [Lbar]
      type = ReciprocalLaplacianFactor
      factor = 1
      buffer = Lbar
    []
  []
  [Solve]
    [mu]
      type = ParsedCompute
      buffer = mu
      expression = 'u - u^3'
      inputs = u
    []
    [Nbar]
      type = ForwardFFT
      buffer = Nbar
      input = mu
    []
    [ubar]
      type = ForwardFFT
      buffer = ubar
      input = u
    []
  []
[]
[TensorSolver]
  type = ETDRK4Solver
  buffer = u
  reciprocal_buffer = ubar
  linear_reciprocal = Lbar
  nonlinear_reciprocal = Nbar
  substeps = {substeps}
  cox_matthews = {cm}
[]
[Problem]
  type = TensorProblem
[]
"""


def _run(substeps, cm, steps=1, dt=0.5):
    root = hit.parse(DECK.format(substeps=substeps, cm=cm))
    hit.expand_braces(root)
    p = TensorProblem(root)
    s = p.init_state()
    step = jax.jit(p._step_impl)
    t = 0.0
    for k in range(steps):
        s = step(s, t, dt, dt, k == 0)
        t += dt
    return np.asarray(s["buffers"]["u"])


def test_cox_matthews_fourth_order_convergence():
    """Allen-Cahn-type nonlinear deck: halving the substep size cuts the
    error ~16x (4th order).  The reference-exact phi1 (~1/(L*dt) for small
    L*dt) cannot achieve this on nonlinear content."""
    ref = _run(64, "true")
    e1 = np.abs(_run(4, "true") - ref).max()
    e2 = np.abs(_run(8, "true") - ref).max()
    order = np.log2(e1 / e2)
    assert 3.5 < order < 4.8, (e1, e2, order)


def test_cox_matthews_nonlinear_is_stable_and_accurate():
    """Against a tiny-dt self-reference, the corrected mode lands within
    discretization error while staying bounded."""
    ref = _run(128, "true")
    u = _run(8, "true")
    assert np.isfinite(u).all()
    assert np.abs(u - ref).max() < 1e-6


def test_default_mode_unchanged_reference_exact():
    """cox_matthews=false keeps the reference-exact phi tables: on the
    purely LINEAR diffusion deck both modes agree to round-off (only
    exp(L*dt) matters when N=0), preserving the shipped gold behavior."""
    from .gold import REF
    import os

    deck = os.path.join(REF, "test/tests/solvers/etdrk4_diffusion.i")
    if not os.path.exists(deck):
        pytest.skip("deck not shipped")

    def run(cm):
        root = hit.load(deck, ["Executioner/num_steps=2",
                               "Domain/floating_precision=DOUBLE",
                               f"TensorSolver/cox_matthews={cm}"])
        p = TensorProblem(root)
        s = p.init_state()
        step = jax.jit(p._step_impl)
        s = step(s, 0.0, 0.01, 0.01, True)
        return np.asarray(s["buffers"]["T"] if "T" in s["buffers"]
                          else list(s["buffers"].values())[0])

    a = run("false")
    b = run("true")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14)
