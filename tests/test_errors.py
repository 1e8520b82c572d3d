"""Error-path tests (the reference's RunException specs,
test/tests/tensor_compute/tests:72-90)."""

import pytest

from marlin_tpu import hit
from marlin_tpu.problem import ProblemError, TensorProblem

REF = "/root/reference"


def test_one_undeclared_constant():
    root = hit.load(
        f"{REF}/test/tests/tensor_compute/backandforth.i",
        ["Domain/dim=1", "Domain/nx=10", "TensorComputes/Initialize/zero/real=null"],
    )
    p = TensorProblem(root)
    with pytest.raises(ProblemError, match="Constant null was requested but never declared"):
        p.init_state()


def test_two_undeclared_constants():
    root = hit.load(
        f"{REF}/test/tests/tensor_compute/backandforth.i",
        [
            "Domain/dim=1",
            "Domain/nx=10",
            "TensorComputes/Initialize/zero/real=null",
            "TensorComputes/Initialize/zero/imaginary=zero",
        ],
    )
    p = TensorProblem(root)
    with pytest.raises(
        ProblemError, match="Constants null, zero were requested but never declared"
    ):
        p.init_state()


def test_declared_constants_ok():
    root = hit.load(
        f"{REF}/test/tests/tensor_compute/backandforth.i",
        [
            "Domain/dim=1",
            "Domain/nx=10",
            'Problem/scalar_constant_names=null',
            'Problem/scalar_constant_values=0.25',
            "TensorComputes/Initialize/zero/real=null",
        ],
    )
    p = TensorProblem(root)
    p.init_state()


class TestUnusedParams:
    """Unknown-parameter rejection (MOOSE validParams analog): every deck
    key must be consumed by some object; typos warn by default and raise
    under [Problem] strict_params = true."""

    DECK = """
[Domain]
  dim = 1
  nx = 8
  {domain_extra}
[]
[TensorComputes]
  [Initialize]
    [u]
      type = ConstantTensor
      buffer = u
      real = 1
      {ic_extra}
    []
  []
[]
[Problem]
  type = TensorProblem
  {problem_extra}
[]
[Executioner]
  type = Transient
  num_steps = 1
[]
"""

    def _run(self, **kw):
        from marlin_tpu import hit
        from marlin_tpu.executioner import run_deck

        args = {"domain_extra": "", "ic_extra": "", "problem_extra": ""}
        args.update(kw)
        return run_deck(hit.parse(self.DECK.format(**args)), output_dir="/tmp")

    def test_typo_raises_in_strict_mode(self):
        from marlin_tpu.params import ParamError

        with pytest.raises(ParamError, match="reel"):
            self._run(
                ic_extra="reel = 2",
                problem_extra="strict_params = true",
            )

    def test_typo_warns_by_default(self, capsys):
        self._run(ic_extra="reel = 2")
        err = capsys.readouterr().err
        assert "Unused" in err and "reel" in err

    def test_clean_deck_is_silent(self, capsys):
        self._run(problem_extra="strict_params = true")
        assert "Unused" not in capsys.readouterr().err

    def test_inert_reference_params_accepted(self):
        # device_names etc. are legal reference-deck knobs that collapse to
        # JAX platform selection — never reported
        self._run(
            domain_extra="device_names = 'cuda cuda'\n  device_weights = '1 2'",
            problem_extra="strict_params = true",
        )


def test_aux_kernel_unknown_buffer():
    """A typo'd AuxKernel buffer fails at build with a named error, not a
    KeyError at output time (code-review r2 finding)."""
    from marlin_tpu.aux import AuxError

    deck = """
[Domain]
  dim = 1
  nx = 8
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ConstantTensor
      buffer = c
      real = 1
    []
  []
[]
[AuxVariables]
  [c]
  []
[]
[AuxKernels]
  [c]
    type = ProjectTensorAux
    buffer = cc
    variable = c
  []
[]
[Problem]
  type = TensorProblem
[]
"""
    with pytest.raises(AuxError, match="unknown buffer 'cc'"):
        TensorProblem(hit.parse(deck))


def test_file_base_not_reported_unused(capsys):
    """Outputs/file_base must never trip the unused-parameter audit
    (code-review r2 finding)."""
    from marlin_tpu import hit as _hit
    from marlin_tpu.executioner import run_deck

    deck = """
[Domain]
  dim = 1
  nx = 8
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ConstantTensor
      buffer = c
      real = 1
    []
  []
[]
[Problem]
  type = TensorProblem
  strict_params = true
[]
[Executioner]
  type = Transient
  num_steps = 1
[]
[Outputs]
  file_base = custom_base
  csv = true
[]
"""
    run_deck(_hit.parse(deck), file_base="override", output_dir="/tmp")
    assert "Unused" not in capsys.readouterr().err
