"""Lattice Boltzmann gold parity (reference test/tests/lbm/tests).

All 22 reference LBM specs: channel flow 2D/3D, obstacle, phase-field LBM,
mixed BCs over all three stencils, Smagorinsky-MRT, with .h5 media fixtures —
compared with HDF5Diff semantics (abs_tol 1e-10)."""

import os

import pytest

from .gold import REF, h5_diff, run_ref_deck

DECKS = [
    "channel2D",
    "channel3D",
    "isotropic_stencil_mrt",
    "obstacle",
    "phase",
    "dirichlet_box",
    "dirichlet_wall",
    "dirichlet_regional",
    "neumann_box",
    "neumann_wall",
    "neumann_regional",
    "stacking",
    "vertical_density_bcs",
    "vertical_velocity_bcs",
    "horizontal_mixed_bcs_d2q9",
    "horizontal_mixed_bcs_d2q9_reverse",
    "mixed_bcs_d3q19",
    "mixed_bcs_d3q19_reverse",
    "mixed_bcs_d3q27",
    "mixed_bcs_d3q27_reverse",
    "smagorinsky_mrt",
]


@pytest.mark.parametrize("deck", DECKS)
def test_lbm(deck):
    gold = f"test/tests/lbm/gold/{deck}.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip(f"no gold for {deck}")
    _, tmp = run_ref_deck(f"test/tests/lbm/{deck}.i")
    h5_diff(gold, f"{tmp}/{deck}.h5", abs_tol=1e-10)


def test_lbm_smagorinsky_jit_flag():
    """reference spec `smagorinsky_mrt_jit`: same gold with enable_jit=true
    (a no-op knob here — every compute chain is jitted — but the deck
    surface must accept it)."""
    gold = "test/tests/lbm/gold/smagorinsky_mrt.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck(
        "test/tests/lbm/smagorinsky_mrt.i",
        ["TensorComputes/Solve/root/enable_jit=true"],
    )
    h5_diff(gold, f"{tmp}/smagorinsky_mrt.h5", abs_tol=1e-10)
