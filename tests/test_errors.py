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
