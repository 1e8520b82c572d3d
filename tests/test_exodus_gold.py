"""Exodiff parity: the aux-variable coupling surface vs the reference's
Exodus golds (reference test/tests/cahnhilliard/tests specs map_to_aux_2d,
map_to_aux_3d, project_tensor, explicit_euler_exodiff, explicit_smoothed).

Node/element ordering differs (libMesh numbers nodes in element-insertion
order; marlin_tpu writes the lexicographic grid order), so frames are
canonicalized onto the (i,j,k) grid by coordinate before comparison —
the values themselves must match the golds.
"""

import os

import numpy as np
import pytest

from marlin_tpu.exodus import read_exodus

from .gold import REF, run_ref_deck

GOLD = os.path.join(REF, "test/tests/cahnhilliard/gold")


def _canon_nodal(e, name, h, dim):
    """(T, num_nodes) -> (T, n0+1, ..) grid by node coordinates."""
    vals = e["nodal"][name]
    idx = []
    shape = []
    for ax in "xyz"[:dim]:
        i = np.round(e["coords"][ax] / h[{"x": 0, "y": 1, "z": 2}[ax]]).astype(int)
        idx.append(i)
        shape.append(i.max() + 1)
    out = np.zeros((vals.shape[0], *shape))
    out[(slice(None), *idx)] = vals
    return out


def _canon_elem(e, name, h, dim):
    """(T, num_elem) -> (T, n0, ..) grid by element-center coordinates."""
    vals = e["elem"][name]
    conn = e["connect"] - 1
    idx = []
    shape = []
    for d, ax in enumerate("xyz"[:dim]):
        c = e["coords"][ax][conn].mean(axis=1)
        i = np.round((c - h[d] / 2) / h[d]).astype(int)
        idx.append(i)
        shape.append(i.max() + 1)
    out = np.zeros((vals.shape[0], *shape))
    out[(slice(None), *idx)] = vals
    return out


def exodiff(gold_path, mine_path, h, dim, abs_tol=1e-10):
    g = read_exodus(gold_path)
    m = read_exodus(mine_path)
    np.testing.assert_allclose(m["time"], g["time"], atol=1e-12)
    assert set(m["nodal"]) == set(g["nodal"])
    assert set(m["elem"]) == set(g["elem"])
    for name in g["nodal"]:
        gv = _canon_nodal(g, name, h, dim)
        mv = _canon_nodal(m, name, h, dim)
        d = np.abs(gv - mv).max()
        assert d <= abs_tol, f"nodal '{name}' differs by {d:.3e}"
    for name in g["elem"]:
        gv = _canon_elem(g, name, h, dim)
        mv = _canon_elem(m, name, h, dim)
        d = np.abs(gv - mv).max()
        assert d <= abs_tol, f"elem '{name}' differs by {d:.3e}"
    for name in g["glo"]:
        if name in m["glo"]:
            d = np.abs(g["glo"][name] - m["glo"][name]).max()
            assert d <= 1e-9, f"global '{name}' differs by {d:.3e}"


def test_map_to_aux_2d(tmp_path):
    """reference test/tests/cahnhilliard/tests `map_to_aux_2d`"""
    _, tmp = run_ref_deck(
        "test/tests/cahnhilliard/cahnhilliard.i",
        [
            "TensorBuffers/c/map_to_aux_variable=c",
            "TensorBuffers/mu/map_to_aux_variable=mu",
        ],
        tmpdir=str(tmp_path),
    )
    exodiff(
        os.path.join(GOLD, "cahnhilliard_out.e"),
        os.path.join(tmp, "cahnhilliard_out.e"),
        h=(0.15, 0.15), dim=2,
    )


def test_map_to_aux_3d(tmp_path):
    """reference test/tests/cahnhilliard/tests `map_to_aux_3d`"""
    _, tmp = run_ref_deck(
        "test/tests/cahnhilliard/cahnhilliard.i",
        [
            "TensorBuffers/c/map_to_aux_variable=c",
            "TensorBuffers/mu/map_to_aux_variable=mu",
            "Domain/dim=3", "Domain/nx=5", "Domain/ny=5", "Domain/nz=5",
            "Domain/zmax=3", "Outputs/file_base=map_to_aux_3d",
        ],
        tmpdir=str(tmp_path),
    )
    exodiff(
        os.path.join(GOLD, "map_to_aux_3d.e"),
        os.path.join(tmp, "map_to_aux_3d.e"),
        h=(0.6, 0.6, 0.6), dim=3,
    )


def test_project_tensor_aux(tmp_path):
    """reference test/tests/cahnhilliard/tests `project_tensor`: the
    ProjectTensorAux kernel path produces the same gold."""
    _, tmp = run_ref_deck(
        "test/tests/cahnhilliard/cahnhilliard.i",
        ['AuxKernels/active=c mu'],
        tmpdir=str(tmp_path),
    )
    exodiff(
        os.path.join(GOLD, "cahnhilliard_out.e"),
        os.path.join(tmp, "cahnhilliard_out.e"),
        h=(0.15, 0.15), dim=2,
    )


def test_explicit_euler_exodiff(tmp_path):
    """reference test/tests/cahnhilliard/tests `explicit_euler_exodiff`.
    The reference does not ship this spec's gold .e, so numeric teeth come
    from a REPO-LOCAL f64 gold (tests/gold_local/, generated once from this
    deck's seeded-RNG trajectory): the final c field must reproduce to
    1e-10 — any regression in the explicit path, the RNG IC, or the FFT
    conventions trips it.  Physics sanity checks are kept alongside."""
    _, tmp = run_ref_deck(
        "test/tests/cahnhilliard/cahnhilliard_explicit.i", tmpdir=str(tmp_path)
    )
    e = read_exodus(os.path.join(tmp, "cahnhilliard_explicit_out.e"))
    c = e["nodal"]["c"]
    assert c.shape[0] >= 2 and np.isfinite(c).all()
    assert 0.2 < c[-1].mean() < 0.8
    gold = np.load(os.path.join(os.path.dirname(__file__), "gold_local",
                                "cahnhilliard_explicit_c_final.npy"))
    np.testing.assert_allclose(np.asarray(c[-1], dtype=np.float64), gold,
                               atol=1e-10)


@pytest.mark.parametrize("method,base", [("SHARP", "sharp"), ("HOULI", "houli")])
def test_explicit_smoothed(tmp_path, method, base):
    """reference test/tests/cahnhilliard/tests `explicit_smoothed`"""
    _, tmp = run_ref_deck(
        "test/tests/cahnhilliard/cahnhilliard_explicit_smooth.i",
        [
            f"TensorComputes/Initialize/smooth/method={method}",
            f"Outputs/file_base={base}",
        ],
        tmpdir=str(tmp_path),
    )
    exodiff(
        os.path.join(GOLD, f"{base}.e"),
        os.path.join(tmp, f"{base}.e"),
        h=(0.06, 0.06), dim=2,
    )
