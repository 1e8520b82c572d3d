"""Legacy-ASCII VTK export (marlin_tpu/vtk.py) — the analog of the
reference's scripts/create_vtk.py numpy->vtkStructuredGrid utility,
without the vtk-package dependency."""

import numpy as np
import pytest

from marlin_tpu.vtk import write_structured_vtk, write_state_vtk


def _parse_vtk(path):
    """Minimal legacy-VTK reader for the writer's own output."""
    with open(path) as f:
        lines = f.read().splitlines()
    head = {}
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.startswith(("DIMENSIONS", "ORIGIN", "SPACING", "POINT_DATA")):
            parts = ln.split()
            head[parts[0]] = [float(x) for x in parts[1:]]
        if ln.startswith(("SCALARS", "VECTORS")):
            break
        i += 1
    npoints = int(head["POINT_DATA"][0])
    fields = {}
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("SCALARS"):
            name = ln.split()[1]
            i += 2  # skip LOOKUP_TABLE
            vals = [float(lines[i + k]) for k in range(npoints)]
            i += npoints
            fields[name] = np.array(vals)
        elif ln.startswith("VECTORS"):
            name = ln.split()[1]
            i += 1
            vals = [[float(x) for x in lines[i + k].split()]
                    for k in range(npoints)]
            i += npoints
            fields[name] = np.array(vals)
        else:
            i += 1
    return head, fields


def test_scalar_roundtrip_2d(tmp_path):
    rng = np.random.RandomState(0)
    c = rng.rand(4, 6)
    path = tmp_path / "out.vtk"
    write_structured_vtk(str(path), {"c": c}, spacing=(0.5, 0.25))
    head, fields = _parse_vtk(path)
    assert head["DIMENSIONS"] == [4, 6, 1]
    assert head["SPACING"] == [0.5, 0.25, 1.0]
    # x varies fastest: value at flat index j*nx + i == c[i, j]
    got = fields["c"].reshape(6, 4)  # (y, x)
    np.testing.assert_allclose(got.T, c, rtol=1e-10)


def test_vector_and_3d(tmp_path):
    rng = np.random.RandomState(1)
    u = rng.rand(3, 4, 5, 3)
    s = rng.rand(3, 4, 5)
    path = tmp_path / "out3.vtk"
    write_structured_vtk(str(path), {"disp": u, "c": s})
    head, fields = _parse_vtk(path)
    assert head["DIMENSIONS"] == [3, 4, 5]
    got = fields["disp"].reshape(5, 4, 3, 3).transpose(2, 1, 0, 3)
    np.testing.assert_allclose(got, u, rtol=1e-10)
    gots = fields["c"].reshape(5, 4, 3).transpose(2, 1, 0)
    np.testing.assert_allclose(gots, s, rtol=1e-10)


def test_2d_vector_padded_to_3(tmp_path):
    u = np.random.RandomState(2).rand(4, 4, 2)
    path = tmp_path / "v2.vtk"
    write_structured_vtk(str(path), {"v": u}, grid_shape=(4, 4))
    _, fields = _parse_vtk(path)
    assert fields["v"].shape == (16, 3)
    assert np.all(fields["v"][:, 2] == 0.0)


def test_state_export(tmp_path):
    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    deck = """
[Domain]
  dim = 2
  nx = 8
  ny = 8
  xmax = 2
  ymax = 2
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ParsedCompute
      buffer = c
      extra_symbols = true
      expression = 'x + 10*y'
    []
  []
[]
[Problem]
  type = TensorProblem
[]
"""
    p = TensorProblem(hit.parse(deck))
    s = p.init_state()
    path = tmp_path / "state.vtk"
    write_state_vtk(str(path), p, s, ["c"])
    head, fields = _parse_vtk(path)
    assert head["SPACING"][0] == pytest.approx(0.25)
    assert head["ORIGIN"][0] == pytest.approx(0.125)
    got = fields["c"].reshape(8, 8).T
    np.testing.assert_allclose(got, np.asarray(s["buffers"]["c"]), atol=1e-6)


def test_lone_vector_state_export(tmp_path):
    """A single vector buffer exported via write_state_vtk must come out
    as a VECTORS field on the domain grid, not be misread as a
    higher-rank scalar grid (grid_shape is taken from the Domain)."""
    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    deck = """
[Domain]
  dim = 2
  nx = 8
  ny = 8
  xmax = 2
  ymax = 2
[]
[TensorBuffers]
  [disp]
    value_dimensions = '2'
  []
[]
[Problem]
  type = TensorProblem
[]
"""
    p = TensorProblem(hit.parse(deck))
    s = p.init_state()
    path = tmp_path / "disp.vtk"
    write_state_vtk(str(path), p, s, ["disp"])
    head, fields = _parse_vtk(path)
    assert head["DIMENSIONS"] == [8, 8, 1]
    assert fields["disp"].shape == (64, 3)


def test_many_component_field_written_per_component(tmp_path):
    """>3 trailing components (a flattened rank-2 tensor) can't be a VTK
    VECTORS field — the writer falls back to per-component scalars."""
    F = np.random.RandomState(3).rand(4, 4, 9)
    path = tmp_path / "F.vtk"
    write_structured_vtk(str(path), {"F": F}, grid_shape=(4, 4))
    _, fields = _parse_vtk(path)
    for c in range(9):
        got = fields[f"F_{c}"].reshape(4, 4).T
        np.testing.assert_allclose(got, F[..., c], rtol=1e-10)


def test_mismatched_shapes_rejected(tmp_path):
    with pytest.raises(ValueError, match="does not match"):
        write_structured_vtk(
            str(tmp_path / "x.vtk"),
            {"a": np.zeros((4, 4)), "b": np.zeros((5, 5))},
        )


def test_tensor_valued_field_flattens(tmp_path):
    """Rank-2 tensor buffers export as flattened per-component scalars."""
    from marlin_tpu.vtk import write_structured_vtk

    path = str(tmp_path / "t.vtk")
    stress = np.arange(4 * 4 * 2 * 2, dtype=float).reshape(4, 4, 2, 2)
    write_structured_vtk(path, {"stress": stress}, grid_shape=(4, 4))
    text = open(path).read()
    assert "SCALARS stress_0 double 1" in text
    assert "SCALARS stress_3 double 1" in text


def test_complex_field_rejected(tmp_path):
    from marlin_tpu.vtk import write_structured_vtk

    with pytest.raises(ValueError, match="complex"):
        write_structured_vtk(str(tmp_path / "c.vtk"),
                             {"cbar": np.zeros((4, 4), complex)},
                             grid_shape=(4, 4))
