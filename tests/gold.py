"""Gold-file parity harness: run reference decks with marlin_tpu and compare
against the reference's shipped gold files (the analog of MOOSE's
CSVDiff/HDF5Diff testers, reference scripts/TestHarness/testers/HDF5Diff.py)."""

import os

import numpy as np

from marlin_tpu import hit
from marlin_tpu.executioner import run_deck

REF = "/root/reference"


def run_ref_deck(relpath, cli_args=(), tmpdir="/tmp/marlin_tpu_gold"):
    os.makedirs(tmpdir, exist_ok=True)
    root = hit.load(os.path.join(REF, relpath), list(cli_args))
    stem = os.path.splitext(os.path.basename(relpath))[0]
    out_node = root.children.get("Outputs")
    file_base = out_node.get("file_base") if out_node is not None else None
    return (
        run_deck(
            root,
            file_base=file_base or stem + "_out",  # MOOSE default output base
            output_dir=tmpdir,
            deck_stem=stem,
            deck_dir=os.path.dirname(os.path.join(REF, relpath)),
        ),
        tmpdir,
    )


def csv_diff(gold_relpath, out_csv, rel_tol=5.5e-6, abs_tol=1e-11):
    """Compare CSVs column-wise (MOOSE CSVDiff defaults: rel 5.5e-6)."""
    gold = np.genfromtxt(os.path.join(REF, gold_relpath), delimiter=",", names=True)
    mine = np.genfromtxt(out_csv, delimiter=",", names=True)
    assert set(gold.dtype.names) == set(mine.dtype.names), (
        f"column mismatch: {gold.dtype.names} vs {mine.dtype.names}"
    )
    g0 = np.atleast_1d(gold)
    m0 = np.atleast_1d(mine)
    assert len(g0) == len(m0), f"row count mismatch: {len(g0)} vs {len(m0)}"
    worst = 0.0
    for col in gold.dtype.names:
        g, m = g0[col], m0[col]
        err = np.abs(g - m)
        rel = err / np.maximum(np.abs(g), 1e-300)
        bad = (err > abs_tol) & (rel > rel_tol)
        assert not bad.any(), (
            f"column '{col}' differs: max abs {err.max():.3e}, "
            f"max rel {rel[err > abs_tol].max() if (err > abs_tol).any() else 0:.3e}"
        )
        worst = max(worst, float(rel.max()))
    return worst


def h5_diff(gold_relpath, out_h5, abs_tol=1e-13, rel_tol=0.0, overrides=None):
    """Compare every dataset in two HDF5 files (the reference's custom
    HDF5Diff tester, scripts/TestHarness/testers/HDF5Diff.py:15-100).

    rel_tol scales with each dataset's own magnitude (tol = abs_tol +
    rel_tol * max|gold|) — used by the f32 real-device lane, where
    derivative-scaled fields (e.g. mu) drift proportionally to their range
    while order-1 fields stay near abs_tol.  `overrides` maps a dataset
    NAME PREFIX (the part before the frame index) to its own
    (abs_tol, rel_tol) pair for fields with a known larger device floor."""
    import h5py

    with h5py.File(os.path.join(REF, gold_relpath)) as g, h5py.File(out_h5) as m:
        gk, mk = set(g.keys()), set(m.keys())
        assert gk == mk, f"dataset mismatch: only-gold={gk-mk} only-mine={mk-gk}"
        for k in gk:
            ga, ma = g[k][...], m[k][...]
            assert ga.shape == ma.shape, f"{k}: shape {ga.shape} vs {ma.shape}"
            d = np.abs(ga - ma).max()
            at, rt = abs_tol, rel_tol
            prefix = k.rsplit(".", 1)[0] if "." in k else k
            if overrides and prefix in overrides:
                at, rt = overrides[prefix]
            tol = at + rt * float(np.abs(ga).max())
            assert d <= tol, f"dataset '{k}' differs by {d:.3e} (tol {tol:.3e})"


def h5_diff_early_frames(gold_relpath, out_h5, max_frame, abs_tol, rel_tol):
    """f32 device-lane comparator for UNSTABLE trajectories (spinodal
    growth amplifies any f32-vs-f64 difference exponentially, so late
    frames of a chaotic deck cannot be compared tightly on ANY f32 device
    — the reference's own mps lane has the same property).  Frames
    `<name>.k` with k <= max_frame compare at the given tolerances; later
    frames only assert same shape, finite values, and the gold's value
    range (pattern-phase divergence allowed)."""
    import h5py

    with h5py.File(os.path.join(REF, gold_relpath)) as g, h5py.File(out_h5) as m:
        gk, mk = set(g.keys()), set(m.keys())
        assert gk == mk, f"dataset mismatch: only-gold={gk-mk} only-mine={mk-gk}"
        for k in sorted(gk):
            ga, ma = g[k][...], m[k][...]
            assert ga.shape == ma.shape, f"{k}: shape {ga.shape} vs {ma.shape}"
            frame = int(k.rsplit(".", 1)[1]) if "." in k else 0
            if frame <= max_frame:
                d = np.abs(ga - ma).max()
                tol = abs_tol + rel_tol * float(np.abs(ga).max())
                assert d <= tol, (
                    f"early frame '{k}' differs by {d:.3e} (tol {tol:.3e})")
            else:
                assert np.isfinite(ma).all(), f"late frame '{k}' has non-finite values"
                lo, hi = float(ga.min()), float(ga.max())
                pad = 0.2 * (hi - lo) + abs_tol
                assert ma.min() >= lo - pad and ma.max() <= hi + pad, (
                    f"late frame '{k}' out of the gold's value range: "
                    f"[{ma.min():.3g}, {ma.max():.3g}] vs [{lo:.3g}, {hi:.3g}]")
