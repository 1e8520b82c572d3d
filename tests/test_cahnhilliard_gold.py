"""Cahn-Hilliard end-to-end gold parity (reference test/tests/cahnhilliard/).

The XDMF/HDF5 output of the seeded-RNG Cahn-Hilliard solve must match the
reference gold .h5 to 1e-13 (reference spec: xdmf_output_hdf5 tester with
abs_tol=1e-13) — this exercises the torch-RNG IC parity, the ABM substep
loop, FFT conventions, NODE periodic extension, and frame bookkeeping."""

from .gold import h5_diff, run_ref_deck


def test_cahnhilliard_hdf5():
    _, tmp = run_ref_deck(
        "test/tests/cahnhilliard/cahnhilliard.i", ["TensorOutputs/active=xdmf"]
    )
    h5_diff(
        "test/tests/cahnhilliard/gold/cahnhilliard.h5", f"{tmp}/cahnhilliard.h5"
    )


def test_cahnhilliard_hdf5_jit_flag():
    """The reference's enable_jit=true spec variant (same gold): tracing/JIT
    is always-on in this framework, the flag is accepted for deck parity."""
    _, tmp = run_ref_deck(
        "test/tests/cahnhilliard/cahnhilliard.i",
        [
            "TensorOutputs/active=xdmf",
            "TensorComputes/Solve/cahn_hilliard/enable_jit=true",
        ],
    )
    h5_diff(
        "test/tests/cahnhilliard/gold/cahnhilliard.h5", f"{tmp}/cahnhilliard.h5"
    )
