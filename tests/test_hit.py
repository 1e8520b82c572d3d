"""HIT deck parser tests, including parsing of actual reference decks."""

import glob
import os

import pytest

from marlin_tpu import hit

REF = "/root/reference"


class TestBasic:
    def test_blocks_and_params(self):
        root = hit.parse(
            """
            [Domain]
              dim = 2
              nx = 200
            []
            [TensorBuffers]
              [c]
              []
              [mu]
              []
            []
            """
        )
        dom = root.child("Domain")
        assert dom.get("dim") == "2"
        assert dom.get("nx") == "200"
        assert [b.name for b in root.child("TensorBuffers").blocks()] == ["c", "mu"]

    def test_nested_close_and_comments(self):
        root = hit.parse(
            """
            # comment
            [A]
              [B]
                x = 1 # trailing comment
              [../]
              y = 'a b c'
            []
            """
        )
        assert root.child("A/B").get("x") == "1"
        assert root.child("A").get("y") == "a b c"

    def test_multiline_quoted(self):
        root = hit.parse("[A]\n v = 'a b\n c d'\n[]\n")
        assert root.child("A").get("v").split() == ["a", "b", "c", "d"]

    def test_active_inactive(self):
        root = hit.parse("[G]\n active = 'a c'\n [a][]\n [b][]\n [c][]\n[]")
        assert [b.name for b in root.child("G").blocks()] == ["a", "c"]
        root2 = hit.parse("[G]\n inactive = 'b'\n [a][]\n [b][]\n [c][]\n[]")
        assert [b.name for b in root2.child("G").blocks()] == ["a", "c"]

    def test_unbalanced(self):
        with pytest.raises(hit.HitError):
            hit.parse("[A]\n x = 1\n")


class TestBraces:
    def test_fparse(self):
        root = hit.parse("[D]\n xmax = '${fparse pi*2}'\n[]")
        hit.expand_braces(root)
        assert float(root.child("D").get("xmax")) == pytest.approx(6.283185307179586)

    def test_variable_substitution(self):
        root = hit.parse("ss = 10\n[S]\n substeps = ${ss}\n[]")
        hit.expand_braces(root)
        assert root.child("S").get("substeps") == "10"

    def test_cli_variable(self):
        root = hit.parse("[S]\n substeps = ${ss}\n file = out_${ss}\n[]")
        variables = hit.apply_cli_args(root, ["ss=20"])
        hit.expand_braces(root, variables)
        assert root.child("S").get("substeps") == "20"
        assert root.child("S").get("file") == "out_20"

    def test_cli_path_override(self):
        root = hit.parse("[Domain]\n nx = 10\n[]")
        hit.apply_cli_args(root, ["Domain/nx=64", "Domain/parallel_mode=FFT_SLAB"])
        assert root.child("Domain").get("nx") == "64"
        assert root.child("Domain").get("parallel_mode") == "FFT_SLAB"

    def test_fparse_with_variable(self):
        root = hit.parse("L = 100\n[D]\n xmax = '${fparse L / 4}'\n[]")
        hit.expand_braces(root)
        assert root.child("D").get("xmax") == "25"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
class TestReferenceDecks:
    """Every shipped reference deck must parse (capability parity check)."""

    DECKS = sorted(
        glob.glob(f"{REF}/test/tests/**/*.i", recursive=True)
        + glob.glob(f"{REF}/benchmarks/**/*.i", recursive=True)
        + glob.glob(f"{REF}/examples/**/*.i", recursive=True)
    )

    @pytest.mark.parametrize("deck", DECKS, ids=[os.path.basename(d) for d in DECKS])
    def test_parse_deck(self, deck):
        with open(deck) as f:
            root = hit.parse(f.read(), base_dir=os.path.dirname(deck))
        # brace expansion needs externally supplied vars for some decks; only
        # expand when all variables resolve
        try:
            hit.expand_braces(root)
        except hit.HitError:
            pass
        assert root is not None

    def test_benchmark_1a_contents(self):
        root = hit.load(f"{REF}/benchmarks/01_spinodal_decomposition/1a.i")
        assert root.child("Domain").get("nx") == "200"
        solve = root.child("TensorComputes/Solve")
        names = [b.name for b in solve.blocks()]
        assert names == ["mu", "mubar", "Mbarmubar", "cbar"]
        mu = root.child("TensorComputes/Solve/mu")
        assert mu.get("type") == "ParsedCompute"
        assert mu.get("derivatives") == "c"


def test_brace_prefix_variables_not_misrouted():
    """Variables whose names merely START with 'units'/'fparse' are plain
    substitutions (regression: startswith dispatch hijacked them)."""
    root = hit.parse("""
units_cell = 2
fparse_tol = 3
[Domain]
  nx = ${units_cell}
  ny = ${fparse_tol}
  nz = ${fparse units_cell + fparse_tol}
[]
""")
    hit.expand_braces(root)
    d = root.children["Domain"]
    assert d.get("nx") == "2"
    assert d.get("ny") == "3"
    assert d.get("nz") == "5"


def test_fparse_nonfinite_substitutes_inf():
    """`${fparse 1e200*1e200}` substitutes 'inf' (FParser behavior) instead
    of crashing the int() fast-path formatter."""
    root = hit.parse("[X]\n  v = ${fparse 1e200*1e200}\n[]")
    hit.expand_braces(root)
    assert root.children["X"].get("v") == "inf"


def test_self_referential_param_resolves_to_ancestor():
    """`[Executioner] dt = ${dt}` resolves to the top-level dt (MOOSE hit
    lexical scoping), not to itself (regression: raised 'Recursive brace
    expression'); mutual recursion still errors."""
    root = hit.parse("dt = '${units 10 s }'\n[Executioner]\n  dt = ${dt}\n[]")
    hit.expand_braces(root)
    assert root.children["Executioner"].get("dt") == "10"

    bad = hit.parse("a = ${b}\nb = ${a}\n[X]\n  v = ${a}\n[]")
    with pytest.raises(hit.HitError):
        hit.expand_braces(bad)
