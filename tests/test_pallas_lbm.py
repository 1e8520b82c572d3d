"""Fused LBM stream+collide Pallas kernel (marlin_tpu/pallas_lbm.py,
deck knob `[Problem] lbm_backend = PALLAS`).

Verifies, in interpret mode on the CPU backend:
  - full state-pytree parity (buffers, old ring, residual, n_advances)
    against the default JNP chain on the reference channel3D deck,
  - reference gold parity (HDF5Diff 1e-10, same gold as the JNP path),
  - face bounce-back on all six faces incl. the x-face program-id masks
    and the odd-extent block=1 path,
  - named rejection of non-fusable chains (Zou-He BCs, 2-D decks).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import marlin_tpu.pallas_lbm as PL
from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem

from .gold import REF, h5_diff, run_ref_deck


@pytest.fixture(autouse=True)
def interpret_mode():
    PL._INTERPRET = True
    yield
    PL._INTERPRET = False


def _run_deck(root, steps=3, deck_dir=None):
    p = TensorProblem(root, deck_dir=deck_dir)
    s = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    for i in range(steps):
        s = p.step(s, float(i), dt, dt, i == 0)
    return p, s


def _assert_state_parity(s1, s2, tol=1e-12):
    for name in s1["buffers"]:
        d = np.max(np.abs(np.asarray(s1["buffers"][name])
                          - np.asarray(s2["buffers"][name])))
        assert d < tol, f"buffer {name}: maxdiff {d}"
    for name in s1["old"]:
        d = np.max(np.abs(np.asarray(s1["old"][name])
                          - np.asarray(s2["old"][name])))
        assert d < tol, f"old[{name}]: maxdiff {d}"
    r1 = float(s1["solver"]["residual"])
    r2 = float(s2["solver"]["residual"])
    assert abs(r1 - r2) < tol, f"residual {r1} vs {r2}"
    assert int(s1["n_advances"]) == int(s2["n_advances"])


def test_fused_state_parity_channel3d():
    """Fused path leaves the ENTIRE state pytree equal to the jnp chain
    (reference test/tests/lbm/channel3D.i, y-face bounce-back)."""
    deck = os.path.join(REF, "test/tests/lbm/channel3D.i")
    over = ["Problem/substeps=7"]
    _, s1 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=JNP"]))
    _, s2 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=PALLAS"]))
    _assert_state_parity(s1, s2)


_ALLFACE_DECK = """
[Domain]
  dim = 3
  nx = {n}
  ny = 10
  nz = 12
  mesh_mode = DUMMY
[]
[Stencil]
  [s]
    type = {stencil}
  []
[]
[TensorBuffers]
  [f]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [feq]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [fpc]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [velocity]
    type = LBMTensorBuffer
    buffer_type = mv
  []
  [density]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [speed]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [vx]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [vy]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [vz]
    type = LBMTensorBuffer
    buffer_type = ms
  []
[]
[TensorComputes]
  [Initialize]
    [initial_density]
      type = LBMConstantTensor
      buffer = density
      constants = 1.0
    []
    [vx]
      type = ParsedCompute
      buffer = vx
      extra_symbols = true
      expression = '0.01*sin(x*6.28)'
    []
    [vy]
      type = ParsedCompute
      buffer = vy
      extra_symbols = true
      expression = '0.02*cos(y*6.28)'
    []
    [vz]
      type = LBMConstantTensor
      buffer = vz
      constants = 0.0
    []
    [initial_velocity]
      type = LBMStackTensors
      buffer = velocity
      inputs = 'vx vy vz'
    []
    [initial_equilibrium]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [initial_distribution]
      type = LBMEquilibrium
      buffer = f
      bulk = density
      velocity = velocity
    []
    [initial_distribution_pc]
      type = LBMEquilibrium
      buffer = fpc
      bulk = density
      velocity = velocity
    []
  []
  [Solve]
    [equilibrium]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [collision]
      type = LBMBGKCollision
      buffer = fpc
      f = f
      feq = feq
      tau0 = 0.8
    []
    [density]
      type = LBMComputeDensity
      buffer = density
      f = f
    []
    [velocity]
      type = LBMComputeVelocity
      buffer = velocity
      f = f
      rho = density
      add_body_force = true
      body_force_x = 0.0001
      body_force_z = -0.00005
    []
    [speed]
      type = LBMComputeVelocityMagnitude
      buffer = speed
      velocity = velocity
    []
    [residual]
      type = LBMComputeResidual
      buffer = speed
      speed = speed
    []
  []
  [Boundary]
    [top]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = top
    []
    [bottom]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = bottom
    []
    [left]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = left
    []
    [right]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = right
    []
    [front]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = front
    []
    [back]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = back
    []
  []
[]
[TensorSolver]
  type = LBMStream
  buffer = f
  f_old = fpc
[]
[Problem]
  type = LatticeBoltzmannProblem
  substeps = 6
  lbm_backend = {backend}
[]
"""


@pytest.mark.parametrize("n,stencil", [(9, "LBMD3Q19"), (8, "LBMD3Q27")])
def test_fused_all_faces(n, stencil):
    """Bounce-back on all six faces: exercises the x-face program-id masks,
    overlapping-corner BC ordering, a z body force, the odd-extent
    block=1 path (n=9), and the D3Q27 stencil."""
    _, s1 = _run_deck(hit.parse(_ALLFACE_DECK.format(
        n=n, stencil=stencil, backend="JNP")))
    _, s2 = _run_deck(hit.parse(_ALLFACE_DECK.format(
        n=n, stencil=stencil, backend="PALLAS")))
    _assert_state_parity(s1, s2)


_MEDIA_DECK = """
[Domain]
  dim = 3
  nx = 8
  ny = 12
  nz = 10
  mesh_mode = DUMMY
[]
[Stencil]
  [s]
    type = LBMD3Q19
  []
[]
[TensorBuffers]
  [f]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [feq]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [fpc]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [velocity]
    type = LBMTensorBuffer
    buffer_type = mv
  []
  [density]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [speed]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [media]
    type = LBMTensorBuffer
    buffer_type = ms
    is_integer = true
    file = {media_h5}
  []
[]
[TensorComputes]
  [Initialize]
    [initial_density]
      type = LBMConstantTensor
      buffer = density
      constants = 1.0
    []
    [initial_velocity]
      type = LBMConstantTensor
      buffer = velocity
      constants = '0.01 0.0 0.0'
    []
    [initial_equilibrium]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [initial_distribution]
      type = LBMEquilibrium
      buffer = f
      bulk = density
      velocity = velocity
    []
    [initial_distribution_pc]
      type = LBMEquilibrium
      buffer = fpc
      bulk = density
      velocity = velocity
    []
  []
  [Solve]
    [equilibrium]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [collision]
      type = LBMBGKCollision
      buffer = fpc
      f = f
      feq = feq
      tau0 = 0.9
    []
    [density]
      type = LBMComputeDensity
      buffer = density
      f = f
    []
    [velocity]
      type = LBMComputeVelocity
      buffer = velocity
      f = f
      rho = density
      add_body_force = true
      body_force_x = 0.0002
    []
    [speed]
      type = LBMComputeVelocityMagnitude
      buffer = speed
      velocity = velocity
    []
    [residual]
      type = LBMComputeResidual
      buffer = speed
      speed = speed
    []
  []
  [Boundary]
    [top]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = top
    []
    [bottom]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = bottom
    []
    [wall]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = wall
    []
  []
[]
[TensorSolver]
  type = LBMStream
  buffer = f
  f_old = fpc
[]
[Problem]
  type = LatticeBoltzmannProblem
  substeps = 6
  binary_media = media
  lbm_backend = {backend}
[]
"""


def test_fused_media_wall_parity(tmp_path):
    """Binary media (box obstacle, h5-loaded like the reference decks) +
    wall bounce-back + face bounce-back: the fused kernel computes the
    obstacle masks in-kernel from the media halo and must match the jnp
    chain's static-mask path."""
    import h5py

    media = np.ones((8, 12, 10), dtype=np.int64)
    media[3:6, 4:8, 2:6] = 0
    h5 = tmp_path / "media.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("media", data=media)

    _, s1 = _run_deck(hit.parse(_MEDIA_DECK.format(backend="JNP", media_h5=h5)))
    _, s2 = _run_deck(hit.parse(_MEDIA_DECK.format(backend="PALLAS", media_h5=h5)))
    # solids produce exact zeros in both paths; NaN would poison the diff
    assert np.isfinite(np.asarray(s2["buffers"]["velocity"])).all()
    assert np.isfinite(np.asarray(s1["buffers"]["velocity"])).all()
    # the obstacle must actually deflect the flow (wall BC active)
    v = np.asarray(s1["buffers"]["velocity"])
    assert np.abs(v[..., 1]).max() > 0
    _assert_state_parity(s1, s2)


def test_fused_gold_channel3d():
    """The fused backend reproduces the reference gold
    (test/tests/lbm/gold/channel3D.h5, HDF5Diff abs_tol 1e-10)."""
    gold = "test/tests/lbm/gold/channel3D.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck(
        "test/tests/lbm/channel3D.i",
        ["Problem/lbm_backend=PALLAS"],
        tmpdir="/tmp/marlin_tpu_gold_pallas_lbm",
    )
    h5_diff(gold, f"{tmp}/channel3D.h5", abs_tol=1e-10)


def test_fused_state_parity_channel2d():
    """2-D (D2Q9) fused path: blocks are (q, B, ny) with lanes on y; the
    deck-level trailing nz = 1 axis is squeezed around the kernel
    (reference test/tests/lbm/channel2D.i)."""
    deck = os.path.join(REF, "test/tests/lbm/channel2D.i")
    over = ["Problem/substeps=7"]
    _, s1 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=JNP"]))
    _, s2 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=PALLAS"]))
    _assert_state_parity(s1, s2)


def test_fused_gold_channel2d():
    gold = "test/tests/lbm/gold/channel2D.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck(
        "test/tests/lbm/channel2D.i",
        ["Problem/lbm_backend=PALLAS"],
        tmpdir="/tmp/marlin_tpu_gold_pallas_lbm2d",
    )
    h5_diff(gold, f"{tmp}/channel2D.h5", abs_tol=1e-10)


def test_fused_sharded_parity():
    """Distributed fused path: REAL_SPACE 1-D mesh (4 virtual devices),
    x-halo planes exchanged via lax.ppermute around the kernel, x-face
    masks on global coordinates, residual psum — must match the serial
    jnp chain."""
    import jax

    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    deck = os.path.join(REF, "test/tests/lbm/channel3D.i")
    over = ["Problem/substeps=7", "Domain/nx=12", "Domain/ny=10",
            "Domain/nz=10"]
    _, s1 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=JNP"]))

    mesh = parallel.make_mesh(
        ParallelMode.REAL_SPACE, jax.devices()[:4], shape=(4,)
    )
    root = hit.load(deck, over + [
        "Problem/lbm_backend=PALLAS", "Domain/parallel_mode=REAL_SPACE"])
    p = TensorProblem(root, mesh=mesh)
    s2 = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    for i in range(3):
        s2 = p.step(s2, float(i), dt, dt, i == 0)
    _assert_state_parity(s1, s2)


def test_fused_sharded_xface_parity():
    """Sharded + bounce-back on ALL faces incl. left/right: the x-face
    masks must use the GLOBAL coordinate (SMEM shard offset), so only the
    first/last shard's boundary blocks apply them."""
    import jax

    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    _, s1 = _run_deck(hit.parse(_ALLFACE_DECK.format(
        n=8, stencil="LBMD3Q19", backend="JNP")))

    mesh = parallel.make_mesh(
        ParallelMode.REAL_SPACE, jax.devices()[:4], shape=(4,)
    )
    deck = _ALLFACE_DECK.format(n=8, stencil="LBMD3Q19", backend="PALLAS")
    deck = deck.replace("[Domain]", "[Domain]\n  parallel_mode = REAL_SPACE")
    p = TensorProblem(hit.parse(deck), mesh=mesh)
    s2 = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    for i in range(3):
        s2 = p.step(s2, float(i), dt, dt, i == 0)
    _assert_state_parity(s1, s2)


def test_fused_sharded_media_parity(tmp_path):
    """Sharded + binary media: the obstacle straddles a shard boundary so
    the wall bounce-back needs the exchanged media halo planes."""
    import h5py
    import jax

    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    media = np.ones((8, 12, 10), dtype=np.int64)
    media[3:6, 4:8, 2:6] = 0  # spans the 4-device shard boundary at x=4
    h5 = tmp_path / "media.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("media", data=media)

    _, s1 = _run_deck(hit.parse(_MEDIA_DECK.format(backend="JNP", media_h5=h5)))

    mesh = parallel.make_mesh(
        ParallelMode.REAL_SPACE, jax.devices()[:4], shape=(4,)
    )
    deck = _MEDIA_DECK.format(backend="PALLAS", media_h5=h5).replace(
        "[Domain]", "[Domain]\n  parallel_mode = REAL_SPACE"
    )
    p = TensorProblem(hit.parse(deck), mesh=mesh)
    s2 = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    for i in range(3):
        s2 = p.step(s2, float(i), dt, dt, i == 0)
    _assert_state_parity(s1, s2)


def test_fused_sharded_2d_mesh_parity():
    """Distributed fused path on a 2-D (2×4) REAL_SPACE mesh (VERDICT r01
    item 6): x halo planes AND y halo rows (with x-corner halos for exact
    diagonal pulls) exchanged via ppermute, y-face masks on global
    coordinates — must match the serial jnp chain."""
    import jax

    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    deck = os.path.join(REF, "test/tests/lbm/channel3D.i")
    over = ["Problem/substeps=7", "Domain/nx=12", "Domain/ny=12",
            "Domain/nz=10"]
    _, s1 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=JNP"]))

    mesh = parallel.make_mesh(
        ParallelMode.REAL_SPACE, jax.devices()[:8], shape=(2, 4)
    )
    root = hit.load(deck, over + [
        "Problem/lbm_backend=PALLAS", "Domain/parallel_mode=REAL_SPACE"])
    p = TensorProblem(root, mesh=mesh)
    s2 = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    for i in range(3):
        s2 = p.step(s2, float(i), dt, dt, i == 0)
    _assert_state_parity(s1, s2)


def test_fused_sharded_2d_mesh_media_parity(tmp_path):
    """2-D mesh + binary media: the obstacle spans BOTH the x and y shard
    boundaries, so wall bounce-back needs the exchanged media halo rows
    and corners."""
    import h5py
    import jax

    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    media = np.ones((8, 12, 10), dtype=np.int64)
    media[3:6, 4:8, 2:6] = 0  # spans x=4 (2-dev) and y=3,6,9 (4-dev) cuts
    h5 = tmp_path / "media.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("media", data=media)

    _, s1 = _run_deck(hit.parse(_MEDIA_DECK.format(backend="JNP", media_h5=h5)))

    mesh = parallel.make_mesh(
        ParallelMode.REAL_SPACE, jax.devices()[:8], shape=(2, 4)
    )
    deck = _MEDIA_DECK.format(backend="PALLAS", media_h5=h5).replace(
        "[Domain]", "[Domain]\n  parallel_mode = REAL_SPACE"
    )
    p = TensorProblem(hit.parse(deck), mesh=mesh)
    s2 = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    for i in range(3):
        s2 = p.step(s2, float(i), dt, dt, i == 0)
    _assert_state_parity(s1, s2)


@pytest.mark.parametrize("deck", [
    "mixed_bcs_d3q19", "mixed_bcs_d3q19_reverse",
    "mixed_bcs_d3q27", "horizontal_mixed_bcs_d2q9",
    "horizontal_mixed_bcs_d2q9_reverse",
])
def test_fused_zouhe_parity(deck):
    """Zou-He fixed-order faces now fuse (VERDICT r03 item 6): the
    collisionless mixed-BC decks (reference test/tests/lbm/mixed_bcs_*.i —
    LBMStream with f_old = f, fixed-zeroth/first-order inlet/outlet, no
    collision) leave the whole state pytree equal to the jnp chain."""
    path = os.path.join(REF, f"test/tests/lbm/{deck}.i")
    over = ["Problem/substeps=6"]
    _, s1 = _run_deck(hit.load(path, over + ["Problem/lbm_backend=JNP"]))
    _, s2 = _run_deck(hit.load(path, over + ["Problem/lbm_backend=PALLAS"]))
    _assert_state_parity(s1, s2, tol=1e-10)


def test_fused_gold_mixed_d3q19():
    """The fused Zou-He path reproduces the reference gold
    (test/tests/lbm/gold/mixed_bcs_d3q19.h5)."""
    gold = "test/tests/lbm/gold/mixed_bcs_d3q19.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck(
        "test/tests/lbm/mixed_bcs_d3q19.i",
        ["Problem/lbm_backend=PALLAS"],
        tmpdir="/tmp/marlin_tpu_gold_pallas_zouhe",
    )
    h5_diff(gold, f"{tmp}/mixed_bcs_d3q19.h5", abs_tol=1e-10)


_INLET_OUTLET_DECK = """
[Domain]
  dim = 3
  nx = 12
  ny = 10
  nz = 10
  mesh_mode = DUMMY
[]
[Stencil]
  [s]
    type = LBMD3Q19
  []
[]
[TensorBuffers]
  [f]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [feq]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [fpc]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [velocity]
    type = LBMTensorBuffer
    buffer_type = mv
  []
  [density]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [speed]
    type = LBMTensorBuffer
    buffer_type = ms
  []
[]
[TensorComputes]
  [Initialize]
    [initial_density]
      type = LBMConstantTensor
      buffer = density
      constants = 1.0
    []
    [initial_velocity]
      type = LBMConstantTensor
      buffer = velocity
      constants = '0.01 0.0 0.0'
    []
    [initial_f]
      type = LBMEquilibrium
      buffer = f
      bulk = density
      velocity = velocity
    []
    [initial_fpc]
      type = LBMEquilibrium
      buffer = fpc
      bulk = density
      velocity = velocity
    []
  []
  [Solve]
    [density]
      type = LBMComputeDensity
      buffer = density
      f = f
    []
    [velocity]
      type = LBMComputeVelocity
      buffer = velocity
      f = f
      rho = density
    []
    [feq]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [collision]
      type = LBMBGKCollision
      buffer = fpc
      f = f
      feq = feq
      tau0 = 0.6
    []
    [speed]
      type = LBMComputeVelocityMagnitude
      buffer = speed
      velocity = velocity
    []
    [residual]
      type = LBMComputeResidual
      buffer = speed
      speed = speed
    []
  []
  [Boundary]
    [top]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = top
    []
    [bottom]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = bottom
    []
    [front]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = front
    []
    [back]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = back
    []
    [inlet]
      type = LBMFixedFirstOrderBC
      buffer = f
      f = f
      value = 0.01
      boundary = left
    []
    [outlet]
      type = LBMMicroscopicZeroGradientBC
      buffer = f
      boundary = right
    []
  []
[]
[TensorSolver]
  type = LBMStream
  buffer = f
  f_old = fpc
[]
[Problem]
  type = LatticeBoltzmannProblem
  substeps = 6
  lbm_backend = {backend}
[]
[Executioner]
  type = Transient
  num_steps = 3
[]
"""


def test_fused_inlet_outlet_parity():
    """The production channel pattern (reference examples/lbm/Pebbles —
    BGK collision, wall bounce-back, Zou-He velocity inlet, zero-gradient
    outlet) fuses with full state-pytree parity, including the residual
    (speed) chain."""
    _, s1 = _run_deck(hit.parse(_INLET_OUTLET_DECK.format(backend="JNP")))
    _, s2 = _run_deck(hit.parse(_INLET_OUTLET_DECK.format(backend="PALLAS")))
    _assert_state_parity(s1, s2, tol=1e-10)


def test_fused_sharded_zouhe_parity():
    """Sharded (REAL_SPACE 1-D mesh) Zou-He faces: the inlet/outlet masks
    use GLOBAL x coordinates, so only the boundary shards apply them."""
    import jax

    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    _, s1 = _run_deck(hit.parse(_INLET_OUTLET_DECK.format(backend="JNP")))

    mesh = parallel.make_mesh(
        ParallelMode.REAL_SPACE, jax.devices()[:2], shape=(2,)
    )
    deck = _INLET_OUTLET_DECK.format(backend="PALLAS").replace(
        "[Domain]", "[Domain]\n  parallel_mode = REAL_SPACE"
    )
    p = TensorProblem(hit.parse(deck), mesh=mesh)
    s2 = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    for i in range(3):
        s2 = p.step(s2, float(i), dt, dt, i == 0)
    _assert_state_parity(s1, s2, tol=1e-10)


def test_fused_perturb_ignored_off_d2q9_left():
    """perturb = true on a non-D2Q9 deck is a silent no-op in the jnp
    chain (the sine profile exists only in the D2Q9 left-face branch) —
    the fused path keeps that parity instead of rejecting."""
    deck = _INLET_OUTLET_DECK.format(backend="PALLAS").replace(
        "value = 0.01", "value = 0.01\n      perturb = true"
    )
    jdeck = deck.replace("lbm_backend = PALLAS", "lbm_backend = JNP")
    _, s1 = _run_deck(hit.parse(jdeck))
    _, s2 = _run_deck(hit.parse(deck))
    _assert_state_parity(s1, s2, tol=1e-10)


def test_fused_rejects_bounceback_after_zouhe():
    """A bounce-back face listed AFTER a Zou-He BC would reorder the face
    writes — rejected with a named error."""
    deck = _INLET_OUTLET_DECK.format(backend="PALLAS")
    # move the [top] bounce-back block after the [outlet] block
    top_block = """    [top]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = top
    []
"""
    assert top_block in deck
    deck = deck.replace(top_block, "")
    tail = "    []\n  []\n[]\n[TensorSolver]"
    assert tail in deck
    deck = deck.replace(tail, "    []\n" + top_block + "  []\n[]\n[TensorSolver]")
    p = TensorProblem(hit.parse(deck))
    s = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    with pytest.raises(PL.FusedChainError, match="listed after"):
        p.step(s, 0.0, dt, dt, False)


def test_fused_gold_mrt_d3q27():
    """MRT collision (static MSM contraction in-kernel) on the reference
    D3Q27 deck reproduces the gold (test/tests/lbm/isotropic_stencil_mrt.i)."""
    gold = "test/tests/lbm/gold/isotropic_stencil_mrt.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck(
        "test/tests/lbm/isotropic_stencil_mrt.i",
        ["Problem/lbm_backend=PALLAS"],
        tmpdir="/tmp/marlin_tpu_gold_pallas_mrt",
    )
    h5_diff(gold, f"{tmp}/isotropic_stencil_mrt.h5", abs_tol=1e-10)


def test_fused_mrt_state_parity():
    deck = os.path.join(REF, "test/tests/lbm/isotropic_stencil_mrt.i")
    over = ["Problem/substeps=6"]
    _, s1 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=JNP"]))
    _, s2 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=PALLAS"]))
    _assert_state_parity(s1, s2)


def test_pick_block_rejects_oversized_transverse():
    """Transverse extents too large for VMEM even at x-block 1 raise the
    module's named error instead of a raw Mosaic failure."""
    with pytest.raises(PL.FusedChainError, match="VMEM"):
        PL._pick_block(1024, 1024, 1024, 27, 4)


def test_pick_block_forced_oversized_rejected(monkeypatch):
    """A forced MARLIN_TPU_LBM_BLOCK that blows the VMEM budget raises the
    named error, not a raw Mosaic compile failure (ADVICE r01)."""
    monkeypatch.setenv("MARLIN_TPU_LBM_BLOCK", "8")
    with pytest.raises(PL.FusedChainError, match="MARLIN_TPU_LBM_BLOCK"):
        PL._pick_block(1024, 512, 512, 27, 4)
    # a forced block that fits is still honored
    monkeypatch.setenv("MARLIN_TPU_LBM_BLOCK", "2")
    assert PL._pick_block(8, 12, 10, 19, 4) == 2


def test_fused_rejects_smagorinsky():
    """Smagorinsky needs a global mean density inside the substep — not
    fusable in one pass; the error names the offending compute."""
    root = hit.load(
        os.path.join(REF, "test/tests/lbm/smagorinsky_mrt.i"),
        ["Problem/lbm_backend=PALLAS"],
    )
    p = TensorProblem(root)
    s = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    with pytest.raises(PL.FusedChainError, match="not fusable|LBM"):
        p.step(s, 0.0, dt, dt, False)


def test_fused_two_lattice_rayleigh_benard_parity():
    """Thermal double-distribution decks fuse (r04): the full
    Rayleigh-Benard example (reference examples/lbm/Rayleigh-Benard —
    fluid f + passive-scalar g, Boussinesq buoyancy via LBMComputeForces,
    Guo forcing via LBMApplyForces, bounce-back walls on f, fixed-density
    (temperature Dirichlet) Zou-He faces on g, residual on T) leaves the
    whole state pytree equal to the jnp chain at reduced scale."""
    deck = os.path.join(REF, "examples/lbm/Rayleigh-Benard/rayleigh-benard.i")
    if not os.path.exists(deck):
        pytest.skip("deck not shipped")
    over = ["Nx=48", "Ny=24", "Problem/substeps=6"]
    _, s1 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=JNP"]))
    _, s2 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=PALLAS"]))
    _assert_state_parity(s1, s2, tol=1e-10)


def test_fused_two_lattice_sharded_parity():
    """Sharded two-lattice: BOTH distributions' halo planes ride the
    ppermute exchange; parity vs the serial jnp chain."""
    import jax

    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    deck = os.path.join(REF, "examples/lbm/Rayleigh-Benard/rayleigh-benard.i")
    if not os.path.exists(deck):
        pytest.skip("deck not shipped")
    over = ["Nx=48", "Ny=24", "Problem/substeps=5"]
    _, s1 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=JNP"]))

    mesh = parallel.make_mesh(
        ParallelMode.REAL_SPACE, jax.devices()[:2], shape=(2,)
    )
    root = hit.load(deck, over + [
        "Problem/lbm_backend=PALLAS", "Domain/parallel_mode=REAL_SPACE"])
    p = TensorProblem(root, mesh=mesh)
    s2 = p.init_state()
    dt = jnp.asarray(1.0, p.domain.dtype)
    for i in range(3):
        s2 = p.step(s2, float(i), dt, dt, i == 0)
    _assert_state_parity(s1, s2, tol=1e-10)


_THERMAL_3D_DECK = """
[Domain]
  dim = 3
  nx = 12
  ny = 8
  nz = 8
  mesh_mode = DUMMY
[]
[Stencil]
  [s]
    type = LBMD3Q19
  []
[]
[TensorBuffers]
  [f]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [feq]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [fpc]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [g]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [geq]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [gpc]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [velocity]
    type = LBMTensorBuffer
    buffer_type = mv
  []
  [density]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [T]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [F]
    type = LBMTensorBuffer
    buffer_type = mv
  []
  [media]
    type = LBMTensorBuffer
    buffer_type = ms
    is_integer = true
    file = {media_h5}
  []
[]
[TensorComputes]
  [Initialize]
    [density]
      type = LBMConstantTensor
      buffer = density
      constants = 1.0
    []
    [velocity]
      type = LBMConstantTensor
      buffer = velocity
      constants = '0.0 0.0 0.0'
    []
    [temperature]
      type = ParsedCompute
      buffer = T
      expression = '1.0 + 0.05 * sin(x / 2.0) * cos(y / 3.0) * cos(z / 5.0)'
      extra_symbols = true
    []
    [feq0]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [f0]
      type = LBMEquilibrium
      buffer = f
      bulk = density
      velocity = velocity
    []
    [fpc0]
      type = LBMEquilibrium
      buffer = fpc
      bulk = density
      velocity = velocity
    []
    [geq0]
      type = LBMEquilibrium
      buffer = geq
      bulk = T
      velocity = velocity
    []
    [g0]
      type = LBMEquilibrium
      buffer = g
      bulk = T
      velocity = velocity
    []
    [gpc0]
      type = LBMEquilibrium
      buffer = gpc
      bulk = T
      velocity = velocity
    []
  []
  [Solve]
    [Temperature]
      type = LBMComputeDensity
      buffer = T
      f = g
    []
    [Density]
      type = LBMComputeDensity
      buffer = density
      f = f
    []
    [Forces]
      type = LBMComputeForces
      buffer = F
      rho0 = 1.0
      rho = density
      temperature = T
      T0 = 1.0
      enable_buoyancy = true
      gravity = 0.0005
      gravity_direction = 2
    []
    [Velocity]
      type = LBMComputeVelocity
      buffer = velocity
      f = f
      rho = density
      forces = F
      enable_forces = true
    []
    [Geq]
      type = LBMEquilibrium
      buffer = geq
      bulk = T
      velocity = velocity
    []
    [Gcoll]
      type = LBMMRTCollision
      buffer = gpc
      f = g
      feq = geq
      tau0 = 0.8
    []
    [Feq]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [Fcoll]
      type = LBMMRTCollision
      buffer = fpc
      f = f
      feq = feq
      tau0 = 0.6
    []
    [Apply]
      type = LBMApplyForces
      buffer = fpc
      rho = density
      forces = F
      tau0 = 0.6
    []
    [Residual]
      type = LBMComputeResidual
      buffer = T
      speed = T
    []
  []
  [Boundary]
    [wall]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = wall
    []
    [top]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = back
    []
    [bottom]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = front
    []
    [hot_bottom]
      type = LBMFixedZerothOrderBC
      buffer = g
      f = g
      value = 1.1
      boundary = left
    []
    [cold_top]
      type = LBMFixedZerothOrderBC
      buffer = g
      f = g
      value = 1.0
      boundary = right
    []
  []
[]
[TensorSolver]
  type = LBMStream
  buffer = 'f g'
  f_old = 'fpc gpc'
[]
[Problem]
  type = LatticeBoltzmannProblem
  substeps = 6
  lbm_backend = {backend}
  is_binary_media = true
  binary_media = media
[]
[Executioner]
  type = Transient
  num_steps = 3
[]
"""


def test_fused_two_lattice_thermal_3d_mrt_media_parity(tmp_path):
    """The Pebbles production pattern (reference examples/lbm/Pebbles):
    3-D thermal double-distribution with MRT collisions on BOTH lattices,
    obstacle bounce-back (binary media), buoyancy + Guo forcing, and
    Zou-He temperature faces on the thermal lattice."""
    import h5py

    media = np.ones((12, 8, 8), dtype=np.int64)
    media[5:8, 3:6, 2:5] = 0  # interior obstacle
    h5 = tmp_path / "media.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("media", data=media)

    _, s1 = _run_deck(hit.parse(
        _THERMAL_3D_DECK.format(backend="JNP", media_h5=h5)))
    _, s2 = _run_deck(hit.parse(
        _THERMAL_3D_DECK.format(backend="PALLAS", media_h5=h5)))
    _assert_state_parity(s1, s2, tol=1e-10)


def test_fused_obstacle_smagorinsky_parity():
    """Smagorinsky collision with Hermite projection fuses on 2-D
    single-block decks (the global mean density is an in-VMEM
    reduction): reference test/tests/lbm/obstacle.i — wall bounce-back,
    Zou-He velocity inlet, zero-gradient outlet."""
    deck = os.path.join(REF, "test/tests/lbm/obstacle.i")
    if not os.path.exists(deck):
        pytest.skip("deck not shipped")
    over = ["Problem/substeps=6"]
    dd = os.path.dirname(deck)
    _, s1 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=JNP"]),
                      deck_dir=dd)
    _, s2 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=PALLAS"]),
                      deck_dir=dd)
    _assert_state_parity(s1, s2, tol=1e-10)


def test_fused_gold_obstacle():
    gold = "test/tests/lbm/gold/obstacle.h5"
    if not os.path.exists(os.path.join(REF, gold)):
        pytest.skip("no gold")
    _, tmp = run_ref_deck(
        "test/tests/lbm/obstacle.i",
        ["Problem/lbm_backend=PALLAS"],
        tmpdir="/tmp/marlin_tpu_gold_pallas_obstacle",
    )
    h5_diff(gold, f"{tmp}/obstacle.h5", abs_tol=1e-10)


def test_fused_karman_vortex_parity(tmp_path):
    """The full Kármán-vortex example pattern (reference
    examples/lbm/Karman-vortex/cylinder.i): Smagorinsky + projection,
    obstacle bounce-back around the cylinder, perturbed (sine-profile)
    Zou-He velocity inlet, zero-gradient outlet — at reduced scale with
    a synthesized cylinder media."""
    import h5py

    deck = os.path.join(REF, "examples/lbm/Karman-vortex/cylinder.i")
    if not os.path.exists(deck):
        pytest.skip("deck not shipped")
    nx, ny = 64, 32
    x, y = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    media = np.ones((nx, ny), dtype=np.int64)
    media[(x - 16) ** 2 + (y - 16) ** 2 <= 5 ** 2] = 0
    h5 = tmp_path / "binary_media.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("binary_media", data=media)

    over = [f"Domain/nx={nx}", f"Domain/ny={ny}", "Problem/substeps=6",
            "TensorBuffers/binary_media/file=" + str(h5)]
    _, s1 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=JNP"]))
    _, s2 = _run_deck(hit.load(deck, over + ["Problem/lbm_backend=PALLAS"]))
    _assert_state_parity(s1, s2, tol=1e-10)


def test_fused_thermal3d_parity():
    """3-D thermal double-distribution (the bench _THERMAL3D_DECK: D3Q19
    f+g, Boussinesq buoyancy with gravity along x, bounce-back plates +
    Zou-He fixed-temperature left/right faces): the fused two-lattice
    3-D kernel must match the jnp chain.  The reference's own 3-D thermal
    deck is examples/lbm/natural_convection_3D/convection.i (same chain
    with notebook-generated regional media)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        import bench
    finally:
        sys.path.pop(0)

    states = []
    for backend in ("JNP", "PALLAS"):
        root = hit.parse(bench._THERMAL3D_DECK.format(
            n=16, substeps=5, backend=backend))
        _, s = _run_deck(root)
        states.append(s)
    _assert_state_parity(states[0], states[1], tol=1e-10)
