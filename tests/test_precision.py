"""SINGLE-precision purity: in an x64-enabled process a
`floating_precision = SINGLE` deck must stay float32 end-to-end — any f64
numpy constant table or strong-typed scalar in a compute chain silently
promotes the whole step (and breaks the fori_loop carry, as the
natural-convection example did before stencil/LBM tables were cast)."""

import jax
import numpy as np
import pytest

from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem

from .gold import REF

DECKS = [
    # (relpath, cli) — one per physics family / constant-table code path
    ("test/tests/lbm/channel2D.i", []),                    # BGK + BCs
    ("test/tests/lbm/smagorinsky_mrt.i", []),              # hermite + SGS tau
    ("test/tests/lbm/isotropic_stencil_mrt.i", []),        # MRT M/S tables
    ("test/tests/cahnhilliard/cahnhilliard.i", []),        # spectral ABM
    ("test/tests/mechanics/mech.i", []),                   # FFTMechanics CG
]


@pytest.mark.parametrize("deck,cli", DECKS,
                         ids=[d.split("/")[-1] for d, _ in DECKS])
def test_single_precision_state_stays_f32(deck, cli):
    import os

    if not os.path.exists(os.path.join(REF, deck)):
        pytest.skip("deck not shipped")
    root = hit.load(os.path.join(REF, deck),
                    cli + ["Domain/floating_precision=SINGLE"])
    p = TensorProblem(root)
    s = p.init_state()
    s = jax.jit(p._step_impl)(s, 0.0, 0.1, 0.0, True)

    bad = []
    for name, arr in s["buffers"].items():
        k = np.dtype(arr.dtype).kind
        if k == "f" and arr.dtype != np.float32:
            bad.append(f"{name}: {arr.dtype}")
        if k == "c" and arr.dtype != np.complex64:
            bad.append(f"{name}: {arr.dtype}")
    assert not bad, "f64 leaked into SINGLE-precision buffers: " + ", ".join(bad)
