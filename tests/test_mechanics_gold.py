"""FFT micromechanics gold parity (reference test/tests/mechanics/tests).

The deGeus-style FFTMechanics Newton+CG solve driven by ForwardEulerSolver
with buffer forwarding (Fnew -> F) must reproduce the reference's
mech.h5/mech3d.h5 golds (HDF5Diff abs_tol 1e-13 in the reference spec)."""

from .gold import h5_diff, run_ref_deck


def test_mechanics_2d():
    _, tmp = run_ref_deck("test/tests/mechanics/mech.i")
    h5_diff("test/tests/mechanics/gold/mech.h5", f"{tmp}/mech.h5")


def test_mechanics_3d():
    _, tmp = run_ref_deck("test/tests/mechanics/mech3d.i")
    h5_diff("test/tests/mechanics/gold/mech3d.h5", f"{tmp}/mech3d.h5")
