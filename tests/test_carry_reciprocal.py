"""carry_reciprocal solver option (marlin_tpu perf extension, documented in
README/PERF.md): prune the redundant `ForwardFFT(input = u) -> ū` from the
solve group and carry ū across substeps — fft(ifft(ū)) == ū up to fp
roundoff, so trajectories agree with the recompute path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as g
from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem


def _run(deck, substeps=50, steps=2):
    p = TensorProblem(hit.parse(deck))
    s = p.init_state()
    step = jax.jit(p._step_impl)
    out = step(s, 0.0, 1.0, 1.0, jnp.asarray(True))
    for k in range(1, steps):
        out = step(out, k * 1.0, 1.0, 1.0, jnp.asarray(False))
    return np.asarray(out["buffers"]["c"])


def test_carry_matches_recompute():
    deck = g._CH_DECK.format(nx=64, ny=64, substeps=50)
    carry = deck.replace("substeps = 50", "substeps = 50\n  carry_reciprocal = true")
    c1 = _run(deck)
    c2 = _run(carry)
    np.testing.assert_allclose(c1, c2, atol=1e-12)


def test_carry_prunes_the_fft():
    deck = g._CH_DECK.format(nx=16, ny=16, substeps=2)
    carry = deck.replace("substeps = 2", "substeps = 2\n  carry_reciprocal = true")
    p = TensorProblem(hit.parse(carry))
    names = p.solver.compute.execution_order()
    assert "cbar" not in names  # the ForwardFFT producing ū is gone
    assert "mubar" in names  # other transforms stay


def test_carry_requires_forward_fft_producer():
    deck = g._CH_DECK.format(nx=16, ny=16, substeps=2)
    bad = deck.replace("substeps = 2", "substeps = 2\n  carry_reciprocal = true")
    # make ū's producer a ParsedCompute instead of a ForwardFFT
    bad = bad.replace(
        """    [cbar]
      type = ForwardFFT
      buffer = cbar
      input = c
    []""",
        """    [cbar]
      type = ParsedCompute
      buffer = cbar
      expression = 'mubar*0'
      inputs = 'mubar'
    []""",
    )
    with pytest.raises(ValueError, match="carry_reciprocal"):
        TensorProblem(hit.parse(bad))


def test_carry_f32_tracks_f64_better_than_recompute():
    """r03 finding (PERF.md benchmark-2a investigation): at f32, the CARRIED
    ū trajectory is the accurate one — the recompute path's per-substep
    fft(ifft(.)) round-trip injects noise that accumulates much faster.
    Measured on the real 2a deck: carry-f32 is ~80x closer to the f64
    truth after 4000 substeps.  This pins the mechanism at small scale."""
    deck = g._CH_DECK.format(nx=64, ny=64, substeps=200)
    carry = deck.replace("substeps = 200",
                         "substeps = 200\n  carry_reciprocal = true")

    def run(d, x64):
        jax.config.update("jax_enable_x64", x64)
        try:
            root = hit.parse(d)
            if x64:
                from marlin_tpu.hit import apply_cli_args
                apply_cli_args(root, ["Domain/floating_precision=DOUBLE"])
            p = TensorProblem(root)
            s = p.init_state()
            step = jax.jit(p._step_impl)
            s = step(s, 0.0, 1.0, 1.0, jnp.asarray(True))
            s = step(s, 1.0, 1.0, 1.0, jnp.asarray(False))
            return np.asarray(s["buffers"]["c"], dtype=np.float64)
        finally:
            jax.config.update("jax_enable_x64", True)

    # f32 runs (the suite default is x64; flip it off per run)
    c_recompute = run(deck, x64=False)
    c_carry = run(carry, x64=False)
    c_truth = run(deck, x64=True)

    err_recompute = np.abs(c_recompute - c_truth).max()
    err_carry = np.abs(c_carry - c_truth).max()
    # robust margin (measured ~80x on the 2a deck, ~10-100x here)
    assert err_carry * 3 < err_recompute, (
        f"carry err {err_carry:.3e} not clearly below recompute err "
        f"{err_recompute:.3e}")
