"""Native (C++) expression evaluator: build, bind, and differentially test
against the Python engine on a corpus."""

import math
import random

import pytest

from marlin_tpu import native
from marlin_tpu.expression import Ops, parse


def python_eval(expr, env):
    scope = {"pi": math.pi, "e": math.e, **env}
    return float(parse(expr).evaluate(scope, Ops()))


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


CORPUS = [
    ("1 + 2 * 3", {}),
    ("2^3^2", {}),
    ("-2^2", {}),
    ("pi * 2", {}),
    ("sin(x)*cos(y) + exp(-x^2)", {"x": 0.37, "y": 1.2}),
    ("if(x < 0.5, x^2, sqrt(x))", {"x": 0.3}),
    ("if(x < 0.5, x^2, sqrt(x))", {"x": 0.9}),
    ("a := x + 1; b := a * x; b^2 - a", {"x": 0.77}),
    ("min(x, y) + max(x, y)", {"x": 3.0, "y": -1.0}),
    ("(x <= y) & (y != 0) | !(x > 0)", {"x": 1.0, "y": 2.0}),
    ("hypot(3, 4) + atan2(1, 1)", {}),
    ("7 % 3 + 10 / 4", {}),
    ("tanh(x) + log10(100) + abs(-x)", {"x": 0.5}),
]


@pytest.mark.parametrize("expr,env", CORPUS, ids=[c[0][:25] for c in CORPUS])
def test_native_matches_python(lib, expr, env):
    assert native.eval_scalar(expr, env) == pytest.approx(
        python_eval(expr, env), rel=1e-14, abs=1e-14
    )


def test_native_fuzz(lib):
    rng = random.Random(42)
    ops = ["+", "-", "*", "/"]
    fns = ["sin", "cos", "exp", "tanh", "abs", "sqrt"]
    for _ in range(200):
        x = rng.uniform(0.1, 3.0)
        expr = f"{rng.uniform(0.1, 2):.4f}"
        for _ in range(rng.randint(1, 6)):
            fn = rng.choice(fns)
            expr = f"{fn}(({expr}) {rng.choice(ops)} {rng.uniform(0.1, 2):.4f})"
        try:
            p = python_eval(expr, {"x": x})
        except ValueError:
            # domain error (e.g. sqrt of a negative): native returns nan
            assert math.isnan(native.eval_scalar(expr, {"x": x})), expr
            continue
        n = native.eval_scalar(expr, {"x": x})
        if math.isnan(p):
            assert math.isnan(n), expr
        else:
            assert n == pytest.approx(p, rel=1e-12, abs=1e-12), expr


def test_native_errors(lib):
    with pytest.raises(native.NativeError):
        native.eval_scalar("nosuchfn(1)", {})
    with pytest.raises(native.NativeError):
        native.eval_scalar("x +", {"x": 1.0})
