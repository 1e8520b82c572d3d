"""marlin_tpu.xdmfdiff — the user-facing XDMF series comparator (analog of
reference scripts/xdmfdiff.py, the serial-vs-parallel validation tool)."""

import io
import os
import shutil

import h5py
import numpy as np

from marlin_tpu import xdmfdiff

from .gold import run_ref_deck


def _make_outputs(tmp_path):
    run_ref_deck("test/tests/lbm/channel2D.i",
                 ["Executioner/num_steps=2", "Problem/substeps=5"],
                 tmpdir=str(tmp_path))
    return str(tmp_path / "channel2D.xmf"), str(tmp_path / "channel2D.h5")


def test_identical_series_match(tmp_path):
    xmf, _ = _make_outputs(tmp_path)
    out = io.StringIO()
    assert xdmfdiff.compare(xmf, xmf, out=out) == 0
    assert "[OK]" in out.getvalue()


def test_perturbed_series_fails_and_cli_exit_codes(tmp_path):
    xmf, h5 = _make_outputs(tmp_path)
    xmf_b = str(tmp_path / "b.xmf")
    h5_b = str(tmp_path / "b.h5")
    shutil.copy(h5, h5_b)
    with open(xmf) as f:
        text = f.read()
    with open(xmf_b, "w") as f:
        f.write(text.replace(os.path.basename(h5), os.path.basename(h5_b)))
    with h5py.File(h5_b, "r+") as f:
        name = [k for k in f.keys() if k.endswith(".1")][0]
        data = np.asarray(f[name])
        data.flat[0] += 1.0
        del f[name]
        f[name] = data

    out = io.StringIO()
    assert xdmfdiff.compare(xmf, xmf_b, out=out) == 1
    assert "[FAIL]" in out.getvalue()

    assert xdmfdiff.main([xmf, xmf]) == 0
    assert xdmfdiff.main([xmf, xmf_b]) == 1
    # a loose tolerance lets the perturbation through
    assert xdmfdiff.main([xmf, xmf_b, "--atol", "10"]) == 0


def test_snapshot_count_mismatch(tmp_path):
    xmf, _ = _make_outputs(tmp_path)
    series = xdmfdiff.read_series(xmf)
    assert len(series) == 3  # T0 + 2 steps
    # truncated copy: drop the last <Grid Name="T2">
    import xml.etree.ElementTree as ET

    tree = ET.parse(xmf)
    for dom in tree.getroot():
        for grid in dom:
            if grid.get("CollectionType") == "Temporal":
                grid.remove(list(grid)[-1])
    xmf_b = str(tmp_path / "trunc.xmf")
    tree.write(xmf_b)
    out = io.StringIO()
    assert xdmfdiff.compare(xmf, xmf_b, out=out) >= 1
    assert "snapshot count differs" in out.getvalue()


DET_DECK = """
[Domain]
  dim = 2
  nx = 16
  ny = 16
  xmax = 1
  ymax = 1
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ParsedCompute
      buffer = c
      extra_symbols = true
      expression = 'sin(2*pi*x)*cos(2*pi*y)'
    []
  []
  [Solve]
    [decay]
      type = ParsedCompute
      buffer = c
      expression = 'c*0.99'
      inputs = c
    []
  []
[]
[Problem]
  type = TensorProblem
[]
[TensorOutputs]
  [xdmf]
    type = XDMFTensorOutput
    buffer = c
    output_mode = Cell
    enable_hdf5 = true
  []
[]
[Executioner]
  type = Transient
  num_steps = 2
  [TimeStepper]
    type = ConstantDT
    dt = 0.1
  []
[]
"""


def test_serial_vs_parallel_series_match(tmp_path):
    """The tool's headline use case (reference scripts/xdmfdiff.py
    docstring: serial vs parallel output): a deterministic-IC deck run
    serially and on a 2-rank FFT_SLAB mesh produces per-rank spatial
    collections that reassemble (by geometry origin) to the serial
    fields."""
    import jax

    from marlin_tpu import hit, parallel
    from marlin_tpu.domain import ParallelMode
    from marlin_tpu.executioner import run_deck

    def run(out, mesh=None):
        root = hit.parse(DET_DECK)
        hit.apply_cli_args(root, ["Domain/floating_precision=DOUBLE"] + (
            ["Domain/parallel_mode=FFT_SLAB"] if mesh is not None else []))
        hit.expand_braces(root)
        run_deck(root, file_base="det_out", output_dir=str(tmp_path / out),
                 deck_stem="det", mesh=mesh)
        return str(tmp_path / out / "det.xmf")

    a = run("ser")
    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:2])
    b = run("par", mesh=mesh)
    out = io.StringIO()
    assert xdmfdiff.compare(a, b, out=out) == 0, out.getvalue()
    # and the parallel series really was a multi-piece spatial collection
    snaps = xdmfdiff.read_series(b)
    assert snaps[0][1]["c"].shape == (16, 16)


def test_time_based_pairing_with_extra_leading_frame(tmp_path):
    """Snapshots pair by TIME value, not index: a series with one extra
    leading frame still compares its equal-time frames cleanly (plus a
    count-mismatch + unpaired-frame report)."""
    xmf, _ = _make_outputs(tmp_path)
    import xml.etree.ElementTree as ET

    tree = ET.parse(xmf)
    for dom in tree.getroot():
        for grid in dom:
            if grid.get("CollectionType") == "Temporal":
                grid.remove(list(grid)[0])  # drop the t=0 frame
    xmf_b = str(tmp_path / "late.xmf")
    tree.write(xmf_b)
    out = io.StringIO()
    failures = xdmfdiff.compare(xmf, xmf_b, out=out)
    text = out.getvalue()
    # both remaining frames matched at their true times...
    assert "[FAIL]" not in text
    assert "[OK]" in text
    # ...and the dropped frame is reported as unpaired (+ count mismatch)
    assert "no matching snapshot" in text
    assert failures == 2


def test_xdmf_mistyped_buffer_raises(tmp_path):
    """A mistyped name in the XDMF `buffer` list errors by name instead of
    silently writing a series without the field (same policy as
    outputs.py's mistyped-type error)."""
    import pytest

    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck

    root = hit.parse(DET_DECK)
    hit.apply_cli_args(root, ["TensorOutputs/xdmf/buffer=concnetration"])
    hit.expand_braces(root)
    with pytest.raises(Exception, match="concnetration"):
        run_deck(root, file_base="det_out", output_dir=str(tmp_path),
                 deck_stem="det")


def test_xdmf_writer_thread_error_propagates(tmp_path, monkeypatch):
    """An exception inside the async writer thread (disk full, missing
    h5py...) re-raises at the next join point — the run must not exit 0
    with missing output."""
    import pytest

    from marlin_tpu import hit
    from marlin_tpu import xdmf as xdmf_mod
    from marlin_tpu.executioner import run_deck

    monkeypatch.setattr(
        xdmf_mod.XDMFTensorOutput, "_write_h5",
        lambda self, frame_data: (_ for _ in ()).throw(OSError("disk full")))
    root = hit.parse(DET_DECK)
    hit.expand_braces(root)
    with pytest.raises(RuntimeError, match="writer thread.*disk full"):
        run_deck(root, file_base="det_out", output_dir=str(tmp_path),
                 deck_stem="det")


def test_binary_layout_and_nan_fails(tmp_path):
    """The default (enable_hdf5=false) .bin sidecar layout reads back, and
    NaN values FAIL the comparison (a diff tool must never pass on NaN)."""
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck

    root = hit.parse(DET_DECK.replace("enable_hdf5 = true",
                                      "enable_hdf5 = false"))
    hit.apply_cli_args(root, ["Domain/floating_precision=DOUBLE"])
    hit.expand_braces(root)
    run_deck(root, file_base="det_out", output_dir=str(tmp_path / "bin"),
             deck_stem="det")
    xmf = str(tmp_path / "bin" / "det.xmf")
    series = xdmfdiff.read_series(xmf)
    assert series and series[0][1]["c"].shape == (16, 16)
    out = io.StringIO()
    assert xdmfdiff.compare(xmf, xmf, out=out) == 0

    # poison one value with NaN in a copy
    import glob

    bins = sorted(glob.glob(str(tmp_path / "bin" / "*.bin")))
    assert bins
    import shutil

    shutil.copytree(tmp_path / "bin", tmp_path / "nan")
    target = sorted(glob.glob(str(tmp_path / "nan" / "*.bin")))[0]
    data = np.fromfile(target, dtype=np.float64)
    data[0] = np.nan
    data.tofile(target)
    out = io.StringIO()
    assert xdmfdiff.compare(
        xmf, str(tmp_path / "nan" / "det.xmf"), out=out) >= 1
    assert "[FAIL]" in out.getvalue()


def test_pair_by_time_local_gap():
    """One tightly-spaced adaptive-dt frame pair must not clamp the pairing
    tolerance for the whole series: pairing uses the LOCAL neighbor gap, so
    frames at t=100 vs t=100+1e-6 (local gap ~50) still pair even when two
    other frames sit 1e-5 apart."""
    fa = {"c": np.zeros((2, 2))}
    # global min gap is 1e-5 (the first two frames); the t=100 pair differs
    # by 1e-4 — within isclose's rtol and WELL within its local gap (50),
    # but 20x the global min gap that the old logic clamped everything to.
    sa = [(0.0, fa), (1e-5, fa), (50.0, fa), (100.0, fa)]
    sb = [(0.0, fa), (1e-5, fa), (50.0, fa), (100.0 + 1e-4, fa)]
    pairs, (ua, ub) = xdmfdiff._pair_by_time(sa, sb)
    assert not ua and not ub
    assert len(pairs) == 4
