"""XDMF output parity (reference test/tests/cahnhilliard/tests specs
`xdmf_output_xml` (XMLDiff vs cahnhilliard.xmf), `xdmf_output_hdf5_parallel`
(HDF5Diff vs cahnhilliard.rank0001.h5 at 2 ranks), plus OVERSIZED_NODAL
mode behavior (reference XDMFTensorOutput.C:287-295))."""

import os
import xml.etree.ElementTree as ET

import jax
import numpy as np
import pytest

from .gold import REF, h5_diff, run_ref_deck

GOLD = os.path.join(REF, "test/tests/cahnhilliard/gold")


def _norm(text):
    """Whitespace-separated tokens, floats canonicalized."""
    out = []
    for tok in (text or "").split():
        try:
            out.append(float(tok))
        except ValueError:
            out.append(tok)
    return out


def _values_close(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if abs(x - y) > 1e-10 * max(1.0, abs(x)):
                return False
        elif x != y:
            return False
    return True


def xml_diff(gold_path, mine_path):
    """Semantic XML comparison (MOOSE XMLDiff analog): same tree structure,
    same attributes, float-tolerant values."""

    def compare(g, m, path):
        assert g.tag == m.tag, f"{path}: tag {g.tag} vs {m.tag}"
        assert set(g.attrib) == set(m.attrib), (
            f"{path}: attrs {sorted(g.attrib)} vs {sorted(m.attrib)}"
        )
        for k in g.attrib:
            assert _values_close(_norm(g.attrib[k]), _norm(m.attrib[k])), (
                f"{path}@{k}: '{g.attrib[k]}' vs '{m.attrib[k]}'"
            )
        assert _values_close(_norm(g.text), _norm(m.text)), (
            f"{path} text: '{g.text}' vs '{m.text}'"
        )
        gc, mc = list(g), list(m)
        assert len(gc) == len(mc), f"{path}: {len(gc)} vs {len(mc)} children"
        for i, (a, b) in enumerate(zip(gc, mc)):
            compare(a, b, f"{path}/{g.tag}[{i}]")

    compare(
        ET.parse(gold_path).getroot(), ET.parse(mine_path).getroot(), ""
    )


def test_xdmf_output_xml(tmp_path):
    """reference spec `xdmf_output_xml`: .xmf structure matches the gold."""
    _, tmp = run_ref_deck(
        "test/tests/cahnhilliard/cahnhilliard.i",
        ["TensorOutputs/active=xdmf"],
        tmpdir=str(tmp_path),
    )
    xml_diff(
        os.path.join(GOLD, "cahnhilliard.xmf"),
        os.path.join(tmp, "cahnhilliard.xmf"),
    )


def test_xdmf_output_hdf5_parallel(tmp_path):
    """reference spec `xdmf_output_hdf5_parallel`: FFT_SLAB at 2 ranks
    writes one .h5 per rank; rank 1's file matches the gold byte-values."""
    from marlin_tpu import hit, parallel
    from marlin_tpu.domain import ParallelMode
    from marlin_tpu.executioner import run_deck

    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:2])
    root = hit.load(
        os.path.join(REF, "test/tests/cahnhilliard/cahnhilliard.i"),
        ["TensorOutputs/active=xdmf2", "Domain/parallel_mode=FFT_SLAB"],
    )
    run_deck(
        root, file_base="cahnhilliard_out", output_dir=str(tmp_path),
        deck_stem="cahnhilliard", mesh=mesh,
    )
    h5_diff(
        "test/tests/cahnhilliard/gold/cahnhilliard.rank0001.h5",
        os.path.join(str(tmp_path), "cahnhilliard.rank0001.h5"),
        abs_tol=1e-13,
    )
    # rank-0 file exists and holds the complementary slab
    import h5py

    with h5py.File(os.path.join(str(tmp_path), "cahnhilliard.rank0000.h5")) as f:
        assert f["c.0"].shape == (20, 10)
    # global XMF: per-frame Spatial collection with one subgrid per rank
    tree = ET.parse(os.path.join(str(tmp_path), "cahnhilliard.xmf"))
    frames = tree.getroot().findall(".//Grid[@CollectionType='Spatial']")
    assert len(frames) == 11
    assert len(frames[0].findall("Grid")) == 2


def test_xdmf_parallel_uneven_mesh(tmp_path):
    """Per-rank XDMF on an UNEVEN slab mesh (8 ranks over ny=20: GSPMD
    ceil-division gives 3-row slabs, a 2-row slab, and one EMPTY rank) —
    rank files cover the grid exactly once and empty ranks are skipped."""
    import h5py
    import numpy as np

    from marlin_tpu import hit, parallel
    from marlin_tpu.domain import ParallelMode
    from marlin_tpu.executioner import run_deck

    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:8])
    root = hit.load(
        os.path.join(REF, "test/tests/cahnhilliard/cahnhilliard.i"),
        ["TensorOutputs/active=xdmf2", "Domain/parallel_mode=FFT_SLAB",
         "Executioner/num_steps=2"],
    )
    run_deck(
        root, file_base="cahnhilliard_out", output_dir=str(tmp_path),
        deck_stem="cahnhilliard", mesh=mesh,
    )
    rows = 0
    written = []
    for r in range(8):
        p = os.path.join(str(tmp_path), f"cahnhilliard.rank{r:04d}.h5")
        if not os.path.exists(p):
            continue
        written.append(r)
        with h5py.File(p) as f:
            rows += f["c.0"].shape[1]
    assert rows == 20
    assert written == list(range(7))  # the empty 8th rank writes no file
    # the XMF spatial collection also skips the empty rank
    tree = ET.parse(os.path.join(str(tmp_path), "cahnhilliard.xmf"))
    frames = tree.getroot().findall(".//Grid[@CollectionType='Spatial']")
    assert len(frames[0].findall("Grid")) == 7


def test_xdmf_parallel_rejects_node_mode(tmp_path):
    """reference XDMFTensorOutput.C:90-93: CELL-only in parallel."""
    from marlin_tpu import hit, parallel
    from marlin_tpu.domain import ParallelMode
    from marlin_tpu.executioner import run_deck
    from marlin_tpu.params import ParamError

    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:2])
    root = hit.load(
        os.path.join(REF, "test/tests/cahnhilliard/cahnhilliard.i"),
        ["TensorOutputs/active=xdmf", "Domain/parallel_mode=FFT_SLAB"],
    )
    with pytest.raises(ParamError, match="only CELL"):
        run_deck(
            root, file_base="x", output_dir=str(tmp_path),
            deck_stem="cahnhilliard", mesh=mesh,
        )


def test_oversized_nodal(tmp_path):
    """OVERSIZED_NODAL writes node-centered data WITHOUT periodic extension
    — the buffer already carries n+1-sized data (reference
    XDMFTensorOutput.C:47-49, 287-295).  An (n+1)-sized IC round-trips
    bit-exact and is declared Center=Node at its own dimensions."""
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck
    import h5py

    deck = """
[Domain]
  dim = 2
  nx = 8
  ny = 8
  xmax = 8
  ymax = 8
[]
[TensorBuffers]
  [disp]
    value_dimensions = ''
  []
  [c]
  []
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ParsedCompute
      buffer = c
      extra_symbols = true
      expression = 'sin(x)+0.1*cos(y)'
    []
  []
[]
[TensorOutputs]
  [xdmf]
    type = XDMFTensorOutput
    buffer = 'c'
    output_mode = 'OVERSIZED_NODAL'
    enable_hdf5 = true
    transpose = false
  []
[]
[Problem]
  type = TensorProblem
[]
[Executioner]
  type = Transient
  num_steps = 1
  dt = 1
[]
"""
    path = tmp_path / "oversized.i"
    path.write_text(deck)
    run_deck(
        hit.load(str(path)), file_base="oversized_out",
        output_dir=str(tmp_path), deck_stem="oversized",
    )
    with h5py.File(tmp_path / "oversized.h5") as f:
        # no periodic extension: dataset keeps the raw 8x8 buffer shape
        assert f["c.0"].shape == (8, 8)
    tree = ET.parse(tmp_path / "oversized.xmf")
    attr = tree.getroot().find(".//Attribute[@Name='c']")
    assert attr.get("Center") == "Node"
    assert attr.find("DataItem").get("Dimensions") == "8 8"


def test_xdmf_output_hdf5_parallel_jit(tmp_path):
    """reference spec `xdmf_output_hdf5_parallel_jit`: the slab-parallel
    run with enable_jit=true reproduces the same per-rank gold."""
    from marlin_tpu import hit, parallel
    from marlin_tpu.domain import ParallelMode
    from marlin_tpu.executioner import run_deck

    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:2])
    root = hit.load(
        os.path.join(REF, "test/tests/cahnhilliard/cahnhilliard.i"),
        [
            "TensorOutputs/active=xdmf2",
            "Domain/parallel_mode=FFT_SLAB",
            "TensorComputes/Solve/cahn_hilliard/enable_jit=true",
        ],
    )
    run_deck(
        root, file_base="cahnhilliard_out", output_dir=str(tmp_path),
        deck_stem="cahnhilliard", mesh=mesh,
    )
    h5_diff(
        "test/tests/cahnhilliard/gold/cahnhilliard.rank0001.h5",
        os.path.join(str(tmp_path), "cahnhilliard.rank0001.h5"),
        abs_tol=1e-13,
    )
