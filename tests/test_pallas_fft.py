"""Pallas unordered-FFT fast path (marlin_tpu/pallas_fft.py + the
`[Domain] fft_backend = PALLAS` knob).  On CPU the kernels run in Pallas
interpret mode; the TPU perf numbers live in PERF.md (2.2x over XLA's
rfftn/irfftn pair at 512³)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import marlin_tpu.pallas_fft as pf
from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = pf._INTERPRET
    pf._INTERPRET = True
    yield
    pf._INTERPRET = old


@pytest.mark.parametrize("n", [64, 128, 256, 384, 512, 640, 768, 896, 1024])
def test_lanes_roundtrip_and_order(n):
    rng = np.random.RandomState(0)
    x = rng.randn(8, n).astype(np.float32)
    rr, ri = jax.jit(lambda a: pf.fft_lanes(a, None, n))(jnp.asarray(x))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    ref = np.fft.fft(x, axis=1)[:, pf.true_k_order(n)]
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
    back = jax.jit(lambda a, b: pf.ifft_lanes(a, b, n))(rr, ri)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


@pytest.mark.parametrize("n", [64, 128, 256, 384, 640])
def test_sublanes_roundtrip_and_order(n):
    rng = np.random.RandomState(1)
    x = rng.randn(n, 128).astype(np.float32)
    rr, ri = jax.jit(lambda a: pf.fft_sublanes(a, None, n))(jnp.asarray(x))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    ref = np.fft.fft(x, axis=0)[pf.true_k_order(n), :]
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
    br, bi = jax.jit(lambda a, b: pf.ifft_sublanes(a, b, n))(rr, ri)
    np.testing.assert_allclose(np.asarray(br), x, atol=1e-4)


def test_2d_matches_fftn_under_permutation():
    rng = np.random.RandomState(2)
    x = rng.randn(128, 256).astype(np.float32)
    u = jax.jit(pf.fftn_unordered)(jnp.asarray(x))
    ref = np.fft.fftn(x)
    perm = np.ix_(pf.true_k_order(128), pf.true_k_order(256))
    assert np.abs(np.asarray(u) - ref[perm]).max() / np.abs(ref).max() < 1e-5
    back = jax.jit(lambda v: pf.ifftn_unordered(v, (128, 256)))(u)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_permuted_freqs_consistency():
    """k-axis arrays built with permuted_freqs line up with the spectrum
    storage order: differentiating sin(x) via the unordered transform."""
    n = 128
    L = 2 * np.pi
    h = L / n
    x = (np.arange(n) + 0.5) * h
    f = np.sin(x).astype(np.float32)
    field = np.tile(f, (128, 1)).T.astype(np.float32)  # vary along axis 0
    u = jax.jit(pf.fftn_unordered)(jnp.asarray(field))
    k0 = 2 * np.pi * pf.permuted_freqs(n, d=h)
    du = jax.jit(lambda v: pf.ifftn_unordered(v * (1j * jnp.asarray(k0))[:, None], (n, 128)))(u)
    np.testing.assert_allclose(np.asarray(du)[:, 0], np.cos(x), atol=1e-4)


_CH = """
[Domain]
  dim = 2
  nx = 128
  ny = 128
  xmax = 128
  ymax = 128
  {backend}
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ParsedCompute
      buffer = c
      extra_symbols = true
      expression = 'c0+epsilon*(cos(0.196349540849362*x)*cos(0.14726215563702*y)+(cos(0.098174770424681*x)*cos(0.245436926061703*y))^2)'
      constant_names = 'c0 epsilon'
      constant_expressions = '0.5 0.01'
    []
    [Mbar]
      type = ReciprocalLaplacianFactor
      factor = 5
      buffer = Mbar
    []
    [kappabarbar]
      type = ReciprocalLaplacianSquareFactor
      factor = -10
      buffer = kappabarbar
    []
  []
  [Solve]
    [mu]
      type = ParsedCompute
      buffer = mu
      expression = 'rho_s*(c-c_alpha)^2*(c_beta-c)^2'
      constant_names = 'rho_s c_alpha c_beta'
      constant_expressions = '5 0.3 0.7'
      derivatives = c
      inputs = c
    []
    [mubar]
      type = ForwardFFT
      buffer = mubar
      input = mu
    []
    [Mbarmubar]
      type = ParsedCompute
      buffer = Mbarmubar
      expression = 'Mbar*mubar'
      inputs = 'Mbar mubar'
    []
    [cbar]
      type = ForwardFFT
      buffer = cbar
      input = c
    []
  []
[]
[TensorSolver]
  type = AdamsBashforthMoulton
  buffer = c
  reciprocal_buffer = cbar
  linear_reciprocal = kappabarbar
  nonlinear_reciprocal = Mbarmubar
  substeps = 5
[]
[Problem]
  type = TensorProblem
[]
"""


def test_ch_solver_physics_parity():
    """The full semi-implicit Cahn-Hilliard step produces the same REAL-space
    trajectory under the PALLAS unordered spectrum as under jnp.fft — the
    permutation is internal and never observable in physics."""

    def run(backend):
        root = hit.parse(_CH.format(backend=backend))
        p = TensorProblem(root)
        s = p.init_state()
        step = jax.jit(p._step_impl)
        out = step(s, 0.0, 1.0, 1.0, jnp.asarray(True))
        out = step(out, 1.0, 1.0, 1.0, jnp.asarray(False))
        return np.asarray(out["buffers"]["c"])

    c_ref = run("")
    c_pal = run("fft_backend = PALLAS")
    np.testing.assert_allclose(c_pal, c_ref, atol=5e-5)


def test_slab_distributed_matches_serial():
    """fft_backend = PALLAS + FFT_SLAB: z/x kernels per-shard, one planar
    all_to_all, y kernel — same permuted spectrum as the serial backend."""
    from marlin_tpu import parallel
    from marlin_tpu.domain import Domain, FFTBackend, ParallelMode

    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:4])
    dom = Domain(dim=3, n=[64, 64, 64], maxs=[64, 64, 64],
                 parallel_mode=ParallelMode.FFT_SLAB, mesh=mesh,
                 fft_backend=FFTBackend.PALLAS)
    ser = Domain(dim=3, n=[64, 64, 64], maxs=[64, 64, 64],
                 fft_backend=FFTBackend.PALLAS)
    x = jnp.asarray(np.random.RandomState(11).rand(64, 64, 64))
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, parallel.real_spec(dom, 3)))
    got = np.asarray(jax.jit(dom.fft)(xs))
    ref = np.asarray(jax.jit(ser.fft)(x.astype(jnp.float32)))
    # f32 summation order differs between the serial and per-shard kernel
    # compositions; scale the tolerance by the spectrum magnitude
    np.testing.assert_allclose(got, ref, atol=1e-4 * np.abs(ref).max())
    back = np.asarray(jax.jit(dom.ifft)(dom.fft(xs)))
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-4)

    # tensor fields must hit the same named rejection on BOTH directions
    # (not a cryptic reshape/shard failure inside the slab kernels)
    tens = jnp.zeros((64, 64, 64, 3, 3), jnp.float32)
    with pytest.raises(RuntimeError, match="scalar fields only"):
        dom.fft(tens)
    with pytest.raises(RuntimeError, match="scalar fields only"):
        dom.ifft(tens.astype(jnp.complex64))


def test_pallas_rejects_unsupported():
    # 516 > DIRECT_MAX and is not a 128-multiple: no MXU-tile factorization
    # (extents down to 8 run as direct DFT matmuls since r02)
    with pytest.raises(Exception, match="PALLAS requires"):
        TensorProblem(hit.parse(_CH.format(backend="fft_backend = PALLAS")
                                .replace("nx = 128", "nx = 516")
                                .replace("xmax = 128", "xmax = 516")))


def test_grid_feasibility_check():
    """Per-extent support is not enough: mid-axis kernels see transverse
    extents of prod(trailing dims), so a 3-D direct-DFT grid like 200³
    (transverse 200·200 = 40000) must be rejected at BUILD time by
    Domain, while 200², 64³ and 512³ remain fine."""
    assert pf.grid_unsupported_reason((200, 200)) is None
    assert pf.grid_unsupported_reason((64, 64, 64)) is None
    assert pf.grid_unsupported_reason((512, 512, 512)) is None
    assert pf.grid_unsupported_reason((400,)) is None
    reason = pf.grid_unsupported_reason((200, 200, 200))
    assert reason is not None and "tileable" in reason
    assert "516" in pf.grid_unsupported_reason((516, 516)) or \
        pf.grid_unsupported_reason((516, 516)) is not None

    from marlin_tpu.domain import Domain, FFTBackend

    with pytest.raises(ValueError, match="cannot tile this grid"):
        Domain(dim=3, n=(200, 200, 200), mins=(0, 0, 0), maxs=(1, 1, 1),
               fft_backend=FFTBackend.PALLAS)


def test_reference_extent_200():
    """The reference's benchmark-1a extent (200, a direct DFT matmul —
    sub-128 composite bases are impossible on Mosaic, see base())
    round-trips and matches numpy under the permutation."""
    rng = np.random.RandomState(12)
    x = rng.randn(16, 200).astype(np.float32)
    rr, ri = jax.jit(lambda a: pf.fft_lanes(a, None, 200))(jnp.asarray(x))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    ref = np.fft.fft(x, axis=1)[:, pf.true_k_order(200)]
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
    back = jax.jit(lambda a, b: pf.ifft_lanes(a, b, 200))(rr, ri)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_ch_solver_physics_parity_200():
    """Full CH physics parity at the reference's own 200² grid — the
    extent generalization that lets fused_spectral run benchmark 1a."""

    def run(backend):
        deck = (_CH.format(backend=backend)
                .replace("nx = 128", "nx = 200").replace("ny = 128", "ny = 200")
                .replace("xmax = 128", "xmax = 200").replace("ymax = 128", "ymax = 200"))
        root = hit.parse(deck)
        p = TensorProblem(root)
        s = p.init_state()
        step = jax.jit(p._step_impl)
        out = step(s, 0.0, 1.0, 1.0, jnp.asarray(True))
        return np.asarray(out["buffers"]["c"])

    np.testing.assert_allclose(
        run("fft_backend = PALLAS"), run(""), atol=5e-5)


@pytest.mark.parametrize("shape", [(256, 128), (384, 64), (64, 640)])
def test_anisotropic_grid(shape):
    """Mixed supported extents, including the non-power-of-two radices and
    the 64 half-tile base (VERDICT r01 item 7)."""
    rng = np.random.RandomState(3)
    x = rng.randn(*shape).astype(np.float32)
    u = jax.jit(pf.fftn_unordered)(jnp.asarray(x))
    ref = np.fft.fftn(x)
    perm = np.ix_(pf.true_k_order(shape[0]), pf.true_k_order(shape[1]))
    assert np.abs(np.asarray(u) - ref[perm]).max() / np.abs(ref).max() < 1e-5
    back = jax.jit(lambda v: pf.ifftn_unordered(v, shape))(u)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_ch_solver_physics_parity_384():
    """Physics parity at a non-power-of-two radix-3 extent."""

    def run(backend):
        deck = (_CH.format(backend=backend)
                .replace("nx = 128", "nx = 384").replace("xmax = 128", "xmax = 384"))
        root = hit.parse(deck)
        p = TensorProblem(root)
        s = p.init_state()
        step = jax.jit(p._step_impl)
        out = step(s, 0.0, 1.0, 1.0, jnp.asarray(True))
        return np.asarray(out["buffers"]["c"])

    np.testing.assert_allclose(
        run("fft_backend = PALLAS"), run(""), atol=5e-5)


def test_tensor_valued_fields():
    """Rank-(dim+k) fields (FFTMechanics' (…, dim, dim) deformation
    gradients) transform per component under the PALLAS backend: the value
    axes batch through the planar kernels (r02 — enables the deGeus CG
    loop on the fast FFTs)."""
    from marlin_tpu.domain import Domain, FFTBackend

    dom = Domain(dim=2, n=[64, 128], maxs=[64, 128],
                 fft_backend=FFTBackend.PALLAS)
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.randn(64, 128, 2, 2).astype(np.float32))
    u = jax.jit(dom.fft)(x)
    for i in range(2):
        for j in range(2):
            comp = jax.jit(dom.fft)(x[..., i, j])
            np.testing.assert_allclose(
                np.asarray(u[..., i, j]), np.asarray(comp), atol=1e-5)
    back = jax.jit(dom.ifft)(u)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
    # (…, dim) vectors too (ComputeDisplacements' u_periodic path)
    v = jnp.asarray(rng.randn(64, 128, 2).astype(np.float32))
    uv = jax.jit(dom.fft)(v)
    backv = jax.jit(dom.ifft)(uv)
    np.testing.assert_allclose(np.asarray(backv), np.asarray(v), atol=1e-4)


def test_mechanics_physics_parity():
    """The full FFTMechanics Newton/CG solve (reference mech.i at a
    PALLAS-supported 64² extent) reproduces the DEFAULT-backend trajectory
    — the CG operator's tensor-valued fft/ifft pairs and the Green
    projection's permuted reciprocal axes compose correctly."""

    def run(backend):
        over = ["Domain/nx=64", "Domain/ny=64",
                "Executioner/num_steps=1", "TensorSolver/substeps=2",
                "Domain/floating_precision=SINGLE"] + (
                    [f"Domain/fft_backend={backend}"] if backend else [])
        root = hit.load("/root/reference/test/tests/mechanics/mech.i", over)
        p = TensorProblem(root)
        s = p.init_state()
        step = jax.jit(p._step_impl)
        dt = jnp.asarray(0.01, p.domain.dtype)
        out = step(s, 0.01, dt, dt, jnp.asarray(True))
        return np.asarray(out["buffers"]["F"])

    F_ref = run("")
    F_pal = run("PALLAS")
    np.testing.assert_allclose(F_pal, F_ref, atol=2e-5)


@pytest.mark.parametrize("n", [8, 16, 32, 48])
def test_small_extents(n):
    """Direct-DFT extents below 64 (r02): the deGeus 32³ RVE and the
    mechanics gold grids become PALLAS-eligible.  Full-dim minor and
    second-minor blocks satisfy the Mosaic tiling rules at any size."""
    rng = np.random.RandomState(4)
    x = rng.randn(max(n, 16), n).astype(np.float32)
    rr, ri = jax.jit(lambda a: pf.fft_lanes(a, None, n))(jnp.asarray(x))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    ref = np.fft.fft(x, axis=1)[:, pf.true_k_order(n)]
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
    back = jax.jit(lambda a, b: pf.ifft_lanes(a, b, n))(rr, ri)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)
    # 3-D roundtrip at the deGeus RVE extent
    if n == 32:
        y = rng.randn(32, 32, 32).astype(np.float32)
        u = jax.jit(pf.fftn_unordered)(jnp.asarray(y))
        back3 = jax.jit(lambda v: pf.ifftn_unordered(v, (32, 32, 32)))(u)
        np.testing.assert_allclose(np.asarray(back3), y, atol=1e-4)


def test_slab_grid_feasibility_check():
    """The build-time tileability check also covers the 3-D FFT_SLAB path:
    per-SHARD kernel shapes are checked against the mesh size (review
    finding r02: a 4-rank 200³ slab deck used to pass Domain construction
    and die inside the jitted shard_map trace)."""
    import jax

    from marlin_tpu import parallel
    from marlin_tpu.domain import Domain, FFTBackend, ParallelMode

    assert pf.slab_grid_unsupported_reason((512, 512, 512), 4) is None
    assert pf.slab_grid_unsupported_reason((128, 128, 128), 4) is None
    # 200³ at 4 ranks: x kernel transverse (200/4)*200 = 10000 can't tile
    assert pf.slab_grid_unsupported_reason((200, 200, 200), 4) is not None
    # odd split: 128 not divisible by 3 ranks
    assert "divisible" in pf.slab_grid_unsupported_reason((128, 128, 128), 3)

    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:4])
    with pytest.raises(ValueError, match="cannot tile this grid"):
        Domain(dim=3, n=(200, 200, 200), mins=(0, 0, 0), maxs=(1, 1, 1),
               parallel_mode=ParallelMode.FFT_SLAB, mesh=mesh,
               fft_backend=FFTBackend.PALLAS)


def test_pencil_requires_3d():
    """FFT_PENCIL on a 2-D grid is rejected at build time with the
    reference's message (DomainAction.C:572) — _use_rfft would otherwise
    declare a half-spectrum x axis that the 2-D transforms never produce."""
    from marlin_tpu.domain import Domain, ParallelMode

    with pytest.raises(ValueError, match="must be 3 for pencil"):
        Domain(dim=2, n=(8, 8), maxs=(1.0, 1.0),
               parallel_mode=ParallelMode.FFT_PENCIL)


def test_fwd_axes_planar_rejects_pre_with_imag():
    """pre-op fusion is only defined for a real input plane; passing both
    pre= and imag= must raise instead of silently dropping the producer."""
    import jax.numpy as jnp

    x = jnp.zeros((8, 128))
    with pytest.raises(ValueError, match="real input"):
        pf.fwd_axes_planar(x, (0, 1), pre=lambda v: v * 2.0, imag=x)
