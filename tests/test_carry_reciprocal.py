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
