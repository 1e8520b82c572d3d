"""Expression engine tests.

Mirrors the reference's parser unit-test strategy
(reference: unit/src/ParsedTensorTest.C:19-350): parse/eval correctness,
symbolic differentiation vs finite differences, simplification rules,
substitution incl. let-expression shadowing, and error paths.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from marlin_tpu.expression import (
    CompiledExpression,
    ExpressionError,
    JaxOps,
    Ops,
    fparse,
    parse,
)


def ev(expr, **env):
    ast = parse(expr)
    return ast.evaluate({"pi": math.pi, "e": math.e, **env}, JaxOps())


class TestParseEval:
    def test_arithmetic(self):
        assert fparse("1 + 2 * 3") == 7
        assert fparse("(1 + 2) * 3") == 9
        assert fparse("2^3^2") == 512  # right associative
        assert fparse("-2^2") == -4  # unary binds outside power
        assert fparse("7 % 3") == 1
        assert fparse("10 / 4") == 2.5

    def test_scientific_numbers(self):
        assert fparse("1e3") == 1000
        assert fparse("1.5e-2") == 0.015
        assert fparse("2.5E+1") == 25

    def test_functions(self):
        assert fparse("sin(0)") == 0
        assert abs(fparse("cos(pi)") + 1) < 1e-14
        assert fparse("max(3, 7)") == 7
        assert fparse("min(3, 7)") == 3
        assert fparse("if(1 < 2, 10, 20)") == 10
        assert fparse("if(1 > 2, 10, 20)") == 20
        assert fparse("abs(-4)") == 4
        assert fparse("hypot(3,4)") == 5
        assert fparse("pow(2,10)") == 1024

    def test_comparison_logic(self):
        assert fparse("(1 < 2) & (3 > 2)") == 1
        assert fparse("(1 < 2) & (3 < 2)") == 0
        assert fparse("(1 > 2) | (3 > 2)") == 1
        assert fparse("!(1 > 2)") == 1
        assert fparse("1 != 2") == 1
        assert fparse("2 == 2") == 1

    def test_let_expression(self):
        assert fparse("a := 2; a * 3") == 6
        assert fparse("a := 2; b := a + 1; a * b") == 6
        assert fparse("r := 3^2 + 4^2; sqrt(r)") == 5

    def test_tensor_eval(self):
        x = jnp.linspace(0.0, 1.0, 11)
        out = ev("x^2 + 1", x=x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) ** 2 + 1)

    def test_tensor_if(self):
        x = jnp.array([-1.0, 0.0, 1.0])
        out = ev("if(x > 0, x, -x)", x=x)
        np.testing.assert_allclose(np.asarray(out), [1.0, 0.0, 1.0])

    def test_fparse_env(self):
        assert fparse("pi*2") == math.pi * 2
        assert fparse("n*2", {"n": 21}) == 42


class TestDifferentiate:
    CASES = [
        "x^2",
        "x^3 + 2*x",
        "sin(x)",
        "cos(x)",
        "tan(x)",
        "sinh(x)",
        "cosh(x)",
        "tanh(x)",
        "exp(x)",
        "log(x)",
        "log10(x)",
        "log2(x)",
        "sqrt(x)",
        "x*sin(x)*exp(x)",
        "sin(x)/x",
        "x^x",
        "2^x",
        "atan(x)",
        "asin(x/2)",
        "acos(x/2)",
        "1/(1+x^2)",
        "a := x^2; sin(a) + a",
        "a := x + 1; b := a * x; b^2",
        "min(x, 0.7)",
        "max(x, 0.3)",
        "abs(x - 0.5)",
        "hypot(x, 1)",
        "atan2(x, 1)",
    ]

    @pytest.mark.parametrize("expr", CASES)
    def test_fd_check(self, expr):
        ast = parse(expr).differentiate("x").simplify()
        ops = JaxOps()
        h = 1e-6
        for x0 in (0.31, 0.77, 1.23):
            sym = float(ast.evaluate({"x": jnp.array(x0)}, ops))
            fp = fparse(expr, {"x": x0 + h})
            fm = fparse(expr, {"x": x0 - h})
            fd = (fp - fm) / (2 * h)
            assert sym == pytest.approx(fd, rel=1e-4, abs=1e-6), expr

    def test_derivative_of_unrelated_var(self):
        ast = parse("x + y").differentiate("z").simplify()
        assert str(ast) == "0"

    def test_second_derivative(self):
        ast = parse("x^4").differentiate("x").differentiate("x").simplify()
        ops = JaxOps()
        assert float(ast.evaluate({"x": jnp.array(2.0)}, ops)) == pytest.approx(48.0)


class TestSimplify:
    @pytest.mark.parametrize(
        "expr,expected",
        [
            ("2 + 3", "5"),
            ("4 * 5", "20"),
            ("2 ^ 3", "8"),
            ("x * 0", "0"),
            ("x * 1", "x"),
            ("x + 0", "x"),
            ("x - 0", "x"),
            ("0 / x", "0"),
            ("x / 1", "x"),
            ("x ^ 1", "x"),
            ("x ^ 0", "1"),
            ("sin(0)", "0"),
            ("--x", "x"),
        ],
    )
    def test_rules(self, expr, expected):
        assert str(parse(expr).simplify()) == expected


class TestSubstitute:
    def test_simple(self):
        expr = parse("x + y").substitute("x", parse("2*z"))
        assert str(expr) == "((2 * z) + y)"

    def test_let_shadowing_outer_var(self):
        expr = parse("a := x + 1; a * x").substitute("x", parse("y + z"))
        assert str(expr) == "a:=((y + z) + 1); (a * (y + z))"

    def test_let_shadowing_bound_name(self):
        expr = parse("a := x + 1; a * x").substitute("a", parse("y + z"))
        assert str(expr) == "a:=(x + 1); (a * x)"

    def test_let_chain(self):
        expr = parse("a := x; b := a + 1; b * x").substitute("x", parse("2*z"))
        assert str(expr) == "a:=(2 * z); b:=(a + 1); (b * (2 * z))"


class TestErrors:
    @pytest.mark.parametrize(
        "expr",
        ["x + ", "(x + y", "x + y)", "sin(x", "a := ; x + a", "x + * y", "", "1.2.3 + x"],
    )
    def test_syntax_errors(self, expr):
        with pytest.raises(ExpressionError):
            parse(expr)

    def test_unknown_symbol_in_compiled(self):
        with pytest.raises(ExpressionError):
            CompiledExpression("x + q", ["x"])

    def test_unknown_function_eval(self):
        with pytest.raises(ExpressionError):
            ev("nosuchfn(1)")


class TestCompiledExpression:
    def test_roundtrip(self):
        ce = CompiledExpression(
            "rho_s*(c-c_alpha)^2*(c_beta-c)^2",
            ["c"],
            constants={"rho_s": 5.0, "c_alpha": 0.3, "c_beta": 0.7},
        )
        c = jnp.array([0.3, 0.5, 0.7])
        out = ce({"c": c})
        np.testing.assert_allclose(
            np.asarray(out), 5 * (np.asarray(c) - 0.3) ** 2 * (0.7 - np.asarray(c)) ** 2
        )

    def test_derivative(self):
        # the benchmark 1a free-energy derivative (reference
        # benchmarks/01_spinodal_decomposition/1a.i:57-63 uses derivatives=c)
        ce = CompiledExpression(
            "rho_s*(c-c_alpha)^2*(c_beta-c)^2",
            ["c"],
            constants={"rho_s": 5.0, "c_alpha": 0.3, "c_beta": 0.7},
        ).differentiate("c")
        c0 = 0.45
        h = 1e-7
        fd = (
            5 * (c0 + h - 0.3) ** 2 * (0.7 - c0 - h) ** 2
            - 5 * (c0 - h - 0.3) ** 2 * (0.7 - c0 + h) ** 2
        ) / (2 * h)
        out = float(ce({"c": jnp.array(c0)}))
        assert out == pytest.approx(fd, rel=1e-6)


def test_let_shadowing_survives_simplify():
    """`x := 2; x := x+1; x` — constant inlining must stop at the
    re-binding (regression: simplify substituted past the shadow and
    returned 2 instead of 3)."""
    e = parse("x := 2; x := x+1; x")
    assert fparse("x := 2; x := x+1; x", {}) == 3.0
    assert e.simplify().evaluate({}, Ops()) == 3.0


def test_scalar_if_is_lazy():
    """FParser if() evaluates only the taken branch — the guarded-division
    idiom must not crash on the host-scalar path (the tensor backend keeps
    jnp.where, matching the reference's torch-where lowering)."""
    assert fparse("if(a!=0, 1/a, 0)", {"a": 0.0}) == 0.0
    assert fparse("if(a!=0, 1/a, 0)", {"a": 4.0}) == 0.25


class TestLetShadowedDifferentiation:
    """Differentiating w.r.t. a variable that a let-binding re-binds: the
    body's references mean the LOCAL, so only the chain-rule term applies.
    The reference's own implementation double-counts here
    (MarlinExpressionParser.C:1078-1100 computes d/dvar[body] with the
    shadowed name treated as the outer var) — deliberately not replicated."""

    def _d(self, expr, var, env):
        import jax.numpy as jnp

        from marlin_tpu.expression import JaxOps, parse

        ast = parse(expr).differentiate(var).simplify()
        return float(ast.evaluate(
            {k: jnp.array(v) for k, v in env.items()}, JaxOps()))

    def test_rebinding_differentiation_var(self):
        # c_local = 2c; body = c_local -> d/dc = 2 (NOT 3)
        assert self._d("c := 2*c; c", "c", {"c": 1.3}) == pytest.approx(2.0)

    def test_rebinding_later_in_chain(self):
        # a = c_outer; c_local = 2*c_outer; body = a + c_local -> d/dc = 3
        assert self._d("a := c; c := 2*c; a + c", "c",
                       {"c": 0.7}) == pytest.approx(3.0)

    def test_rebound_local_chains_once(self):
        # a = x; a = 2a = 2x; body = a*x = 2x^2 -> d/dx = 4x
        assert self._d("a := x; a := 2*a; a * x", "x",
                       {"x": 1.5}) == pytest.approx(6.0)

    def test_rebinding_nonconstant_partial_uses_old_value(self):
        # a = x; a = a*a = x^2; body = a -> d/dx = 2x. The chain partial
        # 2*a must evaluate against the OLD a (=x), not the rebound a (=x^2):
        # at x=1.5 the answer is 3.0, not 4.5.
        assert self._d("a := x; a := a*a; a", "x",
                       {"x": 1.5}) == pytest.approx(3.0)

    def test_rebinding_nonconstant_partial_chain_body(self):
        # a = x; a = a*a; body = a*x = x^3 -> d/dx = 3x^2
        assert self._d("a := x; a := a*a; a * x", "x",
                       {"x": 2.0}) == pytest.approx(12.0)

    def test_nonshadowing_unchanged(self):
        # the plain chain-rule path must be unaffected
        assert self._d("a := sin(x^2); a + 2*a + 3*a", "x",
                       {"x": 0.5}) == pytest.approx(
                           6 * 2 * 0.5 * math.cos(0.25))


def test_enable_fpoptimizer_false_preserves_ieee_order():
    """simplify=False must survive compile(): 0*log(u) keeps NaN semantics
    for u <= 0 instead of being folded away."""
    import jax.numpy as jnp

    from marlin_tpu.expression import CompiledExpression

    e = CompiledExpression("0*log(u) + u", ["u"], simplify=False).compile()
    assert math.isnan(float(e({"u": jnp.array(-1.0)})))
    folded = CompiledExpression("0*log(u) + u", ["u"], simplify=True).compile()
    assert float(folded({"u": jnp.array(-1.0)})) == -1.0
