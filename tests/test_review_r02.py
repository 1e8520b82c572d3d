"""Regression tests for the round-2 review findings: ParsedPostprocessor
declaration-order/constants/cross-flag semantics, RandomTensor device-RNG
independence, bare !include, and the INITIAL-only aux-kernel cache."""

import numpy as np
import pytest

from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem


def _build(deck):
    root = hit.parse(deck)
    hit.expand_braces(root)
    return TensorProblem(root)


_PP_DECK = """
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
      type = ConstantTensor
      buffer = c
      real = 2
    []
  []
[]
[Problem]
  type = TensorProblem
[]
[Postprocessors]
{pps}
[]
"""


def test_parsed_pp_forward_reference():
    """A ParsedPostprocessor may reference a pp declared LATER in the deck
    (MOOSE decks are declaration-order independent)."""
    p = _build(_PP_DECK.format(pps="""
  [doubled]
    type = ParsedPostprocessor
    expression = '2*avg'
    pp_names = 'avg'
  []
  [avg]
    type = TensorAveragePostprocessor
    buffer = c
  []
"""))
    s = p.init_state()
    _, vals = p.step_with_pps(s, 0.0, 0.1, 0.1, first_step=True)
    assert vals["avg"] == pytest.approx(2.0)
    assert vals["doubled"] == pytest.approx(4.0)


def test_parsed_pp_misspelled_name_errors():
    with pytest.raises(Exception, match="does not exist"):
        _build(_PP_DECK.format(pps="""
  [avg]
    type = TensorAveragePostprocessor
    buffer = c
  []
  [bad]
    type = ParsedPostprocessor
    expression = '2*agv'
    pp_names = 'agv'
  []
"""))


def test_parsed_pp_pi_constant():
    """pi/e are FParser built-ins and must be available in
    ParsedPostprocessor expressions."""
    p = _build(_PP_DECK.format(pps="""
  [avg]
    type = TensorAveragePostprocessor
    buffer = c
  []
  [scaled]
    type = ParsedPostprocessor
    expression = 'avg*pi + e'
    pp_names = 'avg'
  []
"""))
    s = p.init_state()
    _, vals = p.step_with_pps(s, 0.0, 0.1, 0.1, first_step=True)
    assert vals["scaled"] == pytest.approx(2.0 * np.pi + np.e)


def test_parsed_pp_cross_flag_reference_reports_zero():
    """Referencing a pp that did not execute on the current flag reports
    its initial 0 instead of crashing (MOOSE: the pp's current value)."""
    p = _build(_PP_DECK.format(pps="""
  [avg]
    type = TensorAveragePostprocessor
    buffer = c
  []
  [onflag]
    type = ParsedPostprocessor
    expression = '1 + avg'
    pp_names = 'avg'
    execute_on = 'INITIAL TIMESTEP_END'
  []
"""))
    s = p.init_state()
    vals = p.execute_postprocessors(s, "INITIAL", 0.0, 0.0)
    assert vals["onflag"] == pytest.approx(1.0)  # avg didn't run -> 0


def test_random_tensor_unseeded_device_draws_independent():
    """Two unseeded generate_on_cpu=false RandomTensors must draw
    INDEPENDENT noise, not share PRNGKey(0) bit-for-bit."""
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
    [c]
      type = RandomTensor
      buffer = c
      min = 0
      max = 1
      generate_on_cpu = false
    []
    [eta]
      type = RandomTensor
      buffer = eta
      min = 0
      max = 1
      generate_on_cpu = false
    []
  []
[]
[Problem]
  type = TensorProblem
[]
"""
    p = _build(deck)
    s = p.init_state()
    c = np.asarray(s["buffers"]["c"])
    eta = np.asarray(s["buffers"]["eta"])
    assert not np.allclose(c, eta)


def test_bare_include_raises_named_error():
    with pytest.raises(hit.HitError, match="missing a file path"):
        hit.parse("!include\n[Domain]\n[]", base_dir="/tmp")


def test_initial_aux_cache_seeds_from_t0(tmp_path):
    """An INITIAL-only aux kernel keeps the t=0 projection even when the
    first output sampling happens after the state has advanced."""
    deck = """
[Domain]
  dim = 2
  nx = 4
  ny = 4
  xmax = 1
  ymax = 1
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ConstantTensor
      buffer = c
      real = 3
    []
  []
[]
[Problem]
  type = TensorProblem
[]
[AuxVariables]
  [c_ic]
    order = CONSTANT
    family = MONOMIAL
  []
[]
[AuxKernels]
  [proj]
    type = ProjectTensorAux
    variable = c_ic
    buffer = c
    execute_on = 'INITIAL'
  []
[]
"""
    p = _build(deck)
    s = p.init_state()
    p.aux.seed_initial(s)
    # mutate the buffer as a timestep would
    s = {**s, "buffers": {**s["buffers"], "c": s["buffers"]["c"] * 0 + 9.0}}
    vals = p.aux.values(s, "c_ic")
    assert np.allclose(vals, 3.0)
