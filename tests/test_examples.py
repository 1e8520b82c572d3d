"""Smoke-run the reference's shipped example decks (shortened horizons).

These have no gold files (reference examples/ publishes no timings or
golds); the tests assert the decks build, run, and produce finite,
physically-sane values — capability parity for the example gallery."""

import math
import os

import numpy as np
import pytest

from .gold import REF, run_ref_deck


def _finite(values):
    return all(math.isfinite(v) for v in values.values())


def test_swift_hohenberg():
    tr, _ = run_ref_deck(
        "examples/swift_hohenberg/swifthohenberg.i",
        ["Executioner/num_steps=5"],
    )
    assert tr.step_count == 5
    assert _finite(tr.pp_values)


def test_rotating_grain():
    tr, _ = run_ref_deck(
        "examples/swift_hohenberg/rotating_grain.i",
        ["Executioner/num_steps=3"],
    )
    assert tr.step_count == 3
    assert _finite(tr.pp_values)


def test_degeus_mechanics():
    """The deGeus RVE example (hyperelastic FFT micromechanics, reference
    examples/degeus_mechanics/mech.i) — shrunk to 16^3 and 2 substeps to
    keep the CPU-f64 CI fast; the full 32^3 RVE is the benchmark target."""
    tr, _ = run_ref_deck(
        "examples/degeus_mechanics/mech.i",
        [
            "Executioner/num_steps=1",
            "Domain/nx=16", "Domain/ny=16", "Domain/nz=16",
            "TensorSolver/substeps=2",
        ],
    )
    assert tr.step_count == 1
    assert _finite(tr.pp_values)


@pytest.mark.parametrize(
    "deck", ["cahnhilliard.i", "cahnhilliard2.i", "cahnhilliard3.i", "cahnhilliard4.i"]
)
def test_cahn_hilliard_examples(deck):
    """The example gallery ships production sizes (200^2..100^3 grids at
    1000 substeps targeted at CUDA); the smoke run shrinks grid and substep
    count so the full suite stays fast on the f64 CPU CI."""
    cli = ["Executioner/num_steps=3"]
    if deck == "cahnhilliard.i":
        cli += ["Domain/nx=64", "Domain/ny=64", "TensorSolver/substeps=20"]
    elif deck == "cahnhilliard2.i":  # 3-D, explicit [TensorSolver]
        cli += ["Domain/nx=32", "Domain/ny=32", "Domain/nz=32",
                "TensorSolver/substeps=20"]
    else:  # 3-D, legacy [TensorTimeIntegrators] + spectral_solve_substeps
        cli += ["Domain/nx=32", "Domain/ny=32", "Domain/nz=32",
                "Problem/spectral_solve_substeps=20"]
    tr, _ = run_ref_deck(f"examples/cahn_hilliard/{deck}", cli)
    assert tr.step_count == 3
    assert _finite(tr.pp_values)


def test_benchmark_2a_ostwald():
    """Ostwald ripening benchmark (5 coupled fields; reference
    benchmarks/02_oswald_ripening/2a.i)."""
    tr, _ = run_ref_deck(
        "benchmarks/02_oswald_ripening/2a.i", ["Executioner/num_steps=3"]
    )
    assert tr.step_count == 3
    assert _finite(tr.pp_values)


def test_benchmark_1a_spinodal():
    tr, _ = run_ref_deck(
        "benchmarks/01_spinodal_decomposition/1a.i", ["Executioner/num_steps=2"]
    )
    assert tr.step_count == 2
    assert _finite(tr.pp_values)
    # free energy near the PFHub starting value (319.03, reference
    # benchmarks/01_spinodal_decomposition/results.1a.1.json)
    assert 250 < tr.pp_values["F"] < 350


LBM_EXAMPLES = [
    ("examples/lbm/Karman-vortex/cylinder.i", []),
    ("examples/lbm/Hagen–Poiseuille/channel.i", []),
    ("examples/lbm/Rayleigh-Benard/rayleigh-benard.i", []),
    ("examples/lbm/natural_convection_3D/convection.i", []),
    ("examples/lbm/Phase-field/phase.i", []),
    ("examples/lbm/Formula1-aerodynamics/f1.i", []),
]


def _synth_cylinder_media(path):
    """Karman-vortex channel with a circular obstacle at reduced scale
    (cylinder.ipynb add_circles; solid=0 fluid=1)."""
    nx, ny = 160, 40
    x, y = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    media = np.ones((nx, ny), dtype=np.int64)
    media[(x - 40) ** 2 + (y - 20) ** 2 <= 6 ** 2] = 0
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("binary_media", data=media)
    return ["Domain/nx=%d" % nx, "Domain/ny=%d" % ny]


def _synth_dome_media(path):
    """natural_convection_3D dome at reduced scale (dome.ipynb): cylinder-
    capped dome cavity, floor solid, an interior box heat source; fluid
    cells 26-adjacent to the box become region 3 (Neumann heat flux) and
    cells adjacent to outer walls region 2 (Dirichlet T)."""
    nx, ny, nz = 36, 36, 54
    x = np.arange(nx)[:, None, None]
    y = np.arange(ny)[None, :, None]
    z = np.arange(nz)[None, None, :]
    R = nx / 2
    x0, y0, zj = R, ny - R, nz - R
    bx = by = bz = 0.3 * R
    buf = 1
    r2 = (x - x0) ** 2 + (y - y0) ** 2
    Rb = R - buf
    dome = np.where(z <= zj, r2 < Rb * Rb, r2 + (z - zj) ** 2 < Rb * Rb)
    cx, cy, cz = x0 + 0.1 * R, y0 + 10 * ny / 270 + 25 * ny / 270, 2.0 * bz
    box = ((np.abs(x - cx) <= bx) & (np.abs(y - cy) <= by)
           & (np.abs(z - cz) <= bz))
    media = np.where(z <= buf, 0, np.where(dome & ~box, 1, 0)).astype(np.int64)
    off = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
           for k in (-1, 0, 1) if (i, j, k) != (0, 0, 0)]

    def adjacent(target_solid):
        adj = np.zeros_like(media, bool)
        for dx_, dy_, dz_ in off:
            xs = slice(max(0, -dx_), nx - max(0, dx_))
            ys = slice(max(0, -dy_), ny - max(0, dy_))
            zs = slice(max(0, -dz_), nz - max(0, dz_))
            xs2 = slice(max(0, dx_), nx - max(0, -dx_))
            ys2 = slice(max(0, dy_), ny - max(0, -dy_))
            zs2 = slice(max(0, dz_), nz - max(0, -dz_))
            adj[xs, ys, zs] |= target_solid[xs2, ys2, zs2] & (
                media[xs, ys, zs] == 1)
        return adj

    media[adjacent((media == 0) & box) & (media == 1)] = 3
    media[adjacent(media == 0) & (media == 1)] = 2
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("binary_media", data=media)
    return ["Domain/nx=%d" % nx, "Domain/ny=%d" % ny, "Domain/nz=%d" % nz,
            "Domain/xmax=%d" % nx, "Domain/ymax=%d" % ny,
            "Domain/zmax=%d" % nz]


def _synth_car_media(path):
    """Formula1-aerodynamics at reduced scale (formula_1.ipynb voxelizes
    the car STL; here an ellipsoidal bluff body on a solid ground plane —
    the same wall/inlet/outlet topology: D3Q27 Smagorinsky + projection,
    Zou-He velocity inlet, zero-gradient outlet)."""
    nx, ny, nz = 48, 20, 14
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    media = np.ones((nx, ny, nz), dtype=np.int64)
    media[:, :, 0] = 0  # ground plane
    body = (((x - 16) / 8.0) ** 2 + ((y - 10) / 4.0) ** 2
            + ((z - 4) / 3.0) ** 2) <= 1.0
    media[body] = 0
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("binary_media", data=media)
    return ["Domain/nx=%d" % nx, "Domain/ny=%d" % ny, "Domain/nz=%d" % nz,
            "Domain/xmax=%d" % nx, "Domain/ymax=%d" % ny,
            "Domain/zmax=%d" % nz]


# upstream generates each deck's binary_media.h5 in a sibling notebook; the
# same geometry is synthesized here at reduced scale so the decks run
MEDIA_SYNTH = {
    "examples/lbm/Karman-vortex/cylinder.i": _synth_cylinder_media,
    "examples/lbm/natural_convection_3D/convection.i": _synth_dome_media,
    "examples/lbm/Formula1-aerodynamics/f1.i": _synth_car_media,
}


@pytest.mark.parametrize(
    "deck,cli", LBM_EXAMPLES, ids=[d.split("/")[2] for d, _ in LBM_EXAMPLES]
)
def test_lbm_examples(deck, cli, tmp_path):
    """LBM example gallery smoke runs (reference examples/lbm/; shortened:
    2 MOOSE steps with a handful of LBM substeps).  Decks whose
    binary_media.h5 is notebook-generated upstream get an equivalent
    reduced-scale fixture synthesized on the fly."""
    if not os.path.exists(os.path.join(REF, deck)):
        pytest.skip("deck not shipped")
    deck_dir = os.path.dirname(os.path.join(REF, deck))
    cli = list(cli)
    with open(os.path.join(REF, deck)) as f:
        text = f.read()
    for line in text.splitlines():
        if "file =" in line:
            fname = line.split("=", 1)[1].strip().strip("'\"")
            if not os.path.exists(os.path.join(deck_dir, fname)):
                synth = MEDIA_SYNTH.get(deck)
                if synth is None:
                    pytest.skip(
                        f"media file {fname} not shipped (notebook-generated)")
                media_file = str(tmp_path / "binary_media.h5")
                cli += synth(media_file)
                cli.append("TensorBuffers/binary_media/file=" + media_file)
    tr, _ = run_ref_deck(deck, cli + ["Executioner/num_steps=2",
                                      "Problem/substeps=5"],
                         tmpdir=str(tmp_path))
    assert tr.step_count >= 1
    assert _finite(tr.pp_values)
    if "binary_media" in tr.state["buffers"]:
        u = np.asarray(tr.state["buffers"].get(
            "velocity", tr.state["buffers"].get("u")))
        solid = np.asarray(tr.state["buffers"]["binary_media"]) == 0
        assert np.isfinite(u).all()
        assert np.abs(u[solid]).max() == 0.0


def test_libtorch_kks_example():
    """examples/libtorch_kks/KKS_libtorch.i: the TorchScript-surrogate KKS
    example (bare model filename resolved through the data roots)."""
    tr, _ = run_ref_deck("examples/libtorch_kks/KKS_libtorch.i", ["Executioner/num_steps=2"])
    assert tr.step_count == 2
    assert _finite(tr.pp_values)


def test_deck_census():
    """EVERY reference deck must build into a TensorProblem (full deck-
    surface compatibility).  Exempt: impact/ (plain MOOSE-FEM, out of scope
    per SURVEY §7), !include fragments, NEML2 model files, and decks that
    require cli-supplied parameters by design."""
    import glob

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    skip = (
        "examples/impact",          # MOOSE-FEM solid mechanics, no tensor path
        "neml2_input.i",            # NEML2 model file, not a deck
        "cahnhilliard_fem.i",       # plain MOOSE-FEM variant of the example
        "Rayleigh-Benard/boundary.i",  # !include fragments of
        "Rayleigh-Benard/buffers.i",   # rayleigh-benard.i (built below as
        "Rayleigh-Benard/solve.i",     # part of the whole deck)
        "cahnhilliard_explicit_smooth.i",  # requires cli method= (spec does)
        "tensor_compute/backandforth.i",   # requires cli dim= (spec does)
    )
    decks = sorted(glob.glob(os.path.join(REF, "**", "*.i"), recursive=True))
    failures = []
    for d in decks:
        if any(s in d for s in skip):
            continue
        try:
            root = hit.load(d, ["ss=2", "cs=0", "order=1",
                                "solver=AdamsBashforthMoulton",
                                "corrector_steps=0", "predictor_order=1",
                                "dt=0.1"])
            TensorProblem(root, deck_dir=os.path.dirname(d))
        except Exception as e:
            failures.append(f"{d.replace(REF + '/', '')}: {type(e).__name__}: {e}")
    assert not failures, "unbuildable decks:\n" + "\n".join(failures)


def test_pebbles_example_with_synthesized_media(tmp_path):
    """examples/lbm/Pebbles/pebbles.i — thermal double-distribution (f + g)
    D3Q19 flow through a packed pebble bed.  The shipped deck reads
    binary_media.h5 which upstream generates in pebbles.ipynb (packed
    non-overlapping spheres); the notebook's generator is reproduced here
    at reduced scale so the deck itself runs end-to-end.  (The F1
    aerodynamics example stays build-only: its media needs an external
    car-body STL download.)"""
    import h5py

    deck = "examples/lbm/Pebbles/pebbles.i"
    if not os.path.exists(os.path.join(REF, deck)):
        pytest.skip("deck not shipped")

    # packed spheres, integer centres, solid=0 fluid=1 (pebbles.ipynb cell 2)
    nx, ny, nz = 48, 16, 16
    rng = np.random.RandomState(7)
    media = np.ones((nx, ny, nz), dtype=np.int64)
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    centres, radius = [], 4
    for _ in range(200):
        c = rng.randint([radius + 8, 0, 0],
                        [nx - radius - 8, ny, nz])
        if all(np.sum((c - p) ** 2) >= (2 * radius) ** 2 for p in centres):
            centres.append(c)
        if len(centres) == 6:
            break
    for c in centres:
        media[(x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2
              <= radius ** 2] = 0
    media_file = str(tmp_path / "binary_media.h5")
    with h5py.File(media_file, "w") as f:
        f.create_dataset("binary_media", data=media)

    tr, _ = run_ref_deck(deck, [
        "Domain/nx=%d" % nx, "Domain/ny=%d" % ny, "Domain/nz=%d" % nz,
        "Domain/xmax=%d" % nx, "Domain/ymax=%d" % ny, "Domain/zmax=%d" % nz,
        "TensorBuffers/binary_media/file=" + media_file,
        # the shipped deck passes 2 velocity constants for the
        # 3-component mv buffer — the reference raises the identical
        # "number of constants must match" error (LBMConstantTensor.C:40)
        "TensorComputes/Initialize/velocity/constants=0.0 0.0 0.0",
        "Executioner/num_steps=2", "Problem/substeps=5",
    ], tmpdir=str(tmp_path))
    assert tr.step_count >= 1
    assert _finite(tr.pp_values)
    v = np.asarray(tr.state["buffers"]["velocity"])
    assert np.isfinite(v).all() and np.abs(v).max() < 1.0
    # solids keep zero velocity
    solid = np.asarray(tr.state["buffers"]["binary_media"]) == 0
    assert np.abs(v[solid]).max() == 0.0


def test_phase_field_fracture_showcase(tmp_path):
    """The repo's own AT2 fracture deck (examples/phase_field_fracture):
    damage must stay in [0, 1], grow under the shear ramp, and stay
    LOCALIZED around the notch plane (crack physics, not uniform
    damage diffusion)."""
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck

    root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deck = os.path.join(root_dir, "examples/phase_field_fracture/fracture.i")
    root = hit.load(deck, ["Executioner/num_steps=10"])
    tr = run_deck(root, output_dir=str(tmp_path), deck_dir=os.path.dirname(deck))
    d = np.asarray(tr.state["buffers"]["d"])
    assert np.all(d >= -1e-6) and np.all(d <= 1.0 + 1e-6)
    # localization: mean damage on the notch row dwarfs the far field
    ny = d.shape[1]
    notch_band = d[:, ny // 2 - 2:ny // 2 + 3].mean()
    far_field = d[:, : ny // 4].mean()
    assert notch_band > 5 * far_field, (notch_band, far_field)
    # growth: the damage integral increased from the IC
    assert tr.pp_values["crack_area"] > 0.02


def test_running_maximum_envelope(tmp_path):
    """RunningMaximum holds the peak of a DECAYING input (irreversibility
    contract of the fracture history variable), seeded by the buffer IC."""
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck

    (tmp_path / "deck.i").write_text(
        """
[Domain]
  dim = 1
  nx = 8
  xmax = 8
  mesh_mode = DUMMY
[]
[TensorBuffers]
  [H]
  []
  [src]
  []
[]
[TensorComputes]
  [Initialize]
    [seed]
      type = ParsedCompute
      buffer = H
      expression = '(x < 2) * 5.0'
      extra_symbols = true
    []
  []
  [Solve]
    [src]
      type = ParsedCompute
      buffer = src
      expression = '2.0*exp(-t)'
      extra_symbols = true
    []
    [H]
      type = RunningMaximum
      buffer = H
      input = src
    []
  []
[]
[Postprocessors]
  [max_H]
    type = TensorExtremeValuePostprocessor
    buffer = H
    value_type = MAX
    execute_on = 'TIMESTEP_END'
  []
  [min_H]
    type = TensorExtremeValuePostprocessor
    buffer = H
    value_type = MIN
    execute_on = 'TIMESTEP_END'
  []
[]
[Problem]
  type = TensorProblem
[]
[Executioner]
  type = Transient
  num_steps = 4
  dt = 1.0
[]
"""
    )
    tr = run_deck(hit.load(str(tmp_path / "deck.i")),
                  output_dir=str(tmp_path), deck_dir=str(tmp_path))
    H = np.asarray(tr.state["buffers"]["H"])
    # the IC seed (5.0) survives the decaying source everywhere it was set
    assert H.max() == 5.0
    # outside the seed the envelope is the source's PEAK over the run
    # (first evaluation at sub_time = 0): 2.0, NOT its final decayed
    # value 2 exp(-3)
    np.testing.assert_allclose(H.min(), 2.0, rtol=1e-6)


def test_running_maximum_undeclared_buffer_and_solver_guard(tmp_path):
    """An undeclared RunningMaximum output buffer is auto-created like any
    other compute output (r05 review: previously a raw KeyError in the
    shape pass), and iterative solvers are refused with a named error."""
    import pytest

    from marlin_tpu import hit
    from marlin_tpu.computes.base import ComputeError
    from marlin_tpu.executioner import run_deck

    base = """
[Domain]
  dim = 1
  nx = 8
  xmax = 8
  mesh_mode = DUMMY
[]
[TensorBuffers]
  [src]
  []
{extra_buffers}
[]
[TensorComputes]
  [Solve]
    [src]
      type = ParsedCompute
      buffer = src
      expression = '1.0 + 0*x'
      extra_symbols = true
    []
    [H]
      type = RunningMaximum
      buffer = H
      input = src
    []
  []
[]
{solver}
[Problem]
  type = TensorProblem
[]
[Executioner]
  type = Transient
  num_steps = 2
  dt = 1.0
[]
"""
    # undeclared H buffer: auto-created, envelope works
    (tmp_path / "a.i").write_text(base.format(extra_buffers="", solver=""))
    tr = run_deck(hit.load(str(tmp_path / "a.i")),
                  output_dir=str(tmp_path), deck_dir=str(tmp_path))
    assert float(np.asarray(tr.state["buffers"]["H"]).max()) == 1.0

    # iterative solver: named refusal
    solver = """
[TensorSolver]
  type = SecantSolver
  buffer = src
  reciprocal_buffer = srcbar
  linear_reciprocal = '0'
  nonlinear_reciprocal = nl
[]
"""
    (tmp_path / "b.i").write_text(base.format(
        extra_buffers="  [srcbar]\n  []\n  [nl]\n  []\n", solver=solver))
    with pytest.raises(ComputeError, match="trial iterates"):
        run_deck(hit.load(str(tmp_path / "b.i")),
                 output_dir=str(tmp_path), deck_dir=str(tmp_path))


def test_neml2_creep_showcase(tmp_path):
    """examples/neml2_creep: thermally-activated Norton creep through the
    NEML2 deck surface — stress relaxes, hot relaxes faster than cold."""
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck

    root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deck = os.path.join(root_dir, "examples/neml2_creep/creep.i")
    root = hit.load(deck, ["Executioner/num_steps=10"])
    tr = run_deck(root, output_dir=str(tmp_path),
                  deck_dir=os.path.dirname(deck))
    sm = np.asarray(tr.state["buffers"]["sm"])
    ep = np.asarray(tr.state["buffers"]["ep"])
    e = np.broadcast_to(np.asarray(tr.state["buffers"]["e"]), sm.shape)
    # stress stays below the elastic (unrelaxed) value and ep in [0, e]
    assert np.all(sm <= 1000.0 * e + 1e-6)
    assert np.all(ep >= -1e-12) and np.all(ep <= e + 1e-9)
    nx = sm.shape[0]
    # the hot half (right) relaxed much further than the cold half (left)
    cold = (1000.0 * e - sm)[: nx // 4].mean()
    hot = (1000.0 * e - sm)[-nx // 4:].mean()
    assert hot > 10 * max(cold, 1e-9), (hot, cold)


def test_neml2_creep_showcase_sharded_matches_serial():
    """The creep showcase's field-wide implicit Newton (NEML2 deck
    surface) under FFT_SLAB@4 matches the serial run bit-for-bit-class
    (elementwise constitutive solve: decomposition must be invisible)."""
    import jax

    from marlin_tpu import hit, parallel
    from marlin_tpu.domain import ParallelMode
    from marlin_tpu.executioner import run_deck

    root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deck = os.path.join(root_dir, "examples/neml2_creep/creep.i")
    dd = os.path.dirname(deck)
    over = ["Executioner/num_steps=4", "Domain/floating_precision=DOUBLE"]
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        ser = run_deck(hit.load(deck, over), output_dir=tmp + "/s",
                       deck_dir=dd)
        mesh = parallel.make_mesh(ParallelMode.FFT_SLAB,
                                  devices=jax.devices()[:4])
        par = run_deck(hit.load(deck, over + [
            "Domain/parallel_mode=FFT_SLAB"]), output_dir=tmp + "/p",
            mesh=mesh, deck_dir=dd)
    for k in ("ep", "sm"):
        a = np.asarray(ser.state["buffers"][k])
        b = np.asarray(par.state["buffers"][k])
        np.testing.assert_allclose(b, a, atol=1e-12, err_msg=k)
