"""Fused semi-implicit spectral substep (marlin_tpu/pallas_spectral.py,
deck knob `[TensorSolver] fused_spectral = true`).

Interpret-mode parity on CPU: the fused path must reproduce the unfused
carry_reciprocal + fft_backend=PALLAS trajectory (identical formula at
f32) and the plain jnp.fft physics, plus named rejection of non-fusable
chains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import marlin_tpu.pallas_fft as pf
import marlin_tpu.pallas_spectral as ps
from marlin_tpu import hit
from marlin_tpu.problem import TensorProblem


@pytest.fixture(autouse=True)
def interpret_mode():
    pf._INTERPRET = True
    yield
    pf._INTERPRET = False


_CH = """
[Domain]
  dim = 2
  nx = 128
  ny = 128
  xmax = 128
  ymax = 128
  {domain_extra}
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
  {solver_extra}
[]
[Problem]
  type = TensorProblem
[]
"""


def _run(domain_extra, solver_extra, steps=3, dt=1.0):
    root = hit.parse(_CH.format(domain_extra=domain_extra,
                                solver_extra=solver_extra))
    p = TensorProblem(root)
    s = p.init_state()
    step = jax.jit(p._step_impl)
    for i in range(steps):
        s = step(s, float(i), dt, dt, jnp.asarray(i == 0))
    return s


def test_fused_matches_unfused_pallas():
    """fused_spectral reproduces the unfused carry_reciprocal trajectory
    (same formula, same kernels for the transforms) including the carried
    ū and N̄ state."""
    s1 = _run("fft_backend = PALLAS", "carry_reciprocal = true")
    s2 = _run("fft_backend = PALLAS",
              "carry_reciprocal = true\n  fused_spectral = true")
    # the real field (physics) stays tight; spectral buffers accumulate f32
    # trajectory divergence through the nonlinearity over 14 substeps (the
    # single-substep kernel-vs-manual test below pins the kernel itself at
    # ~5e-6 relative)
    for name, rel in (("c", None), ("mu", None), ("cbar", 5e-4),
                      ("Mbarmubar", 5e-4), ("mubar", 5e-4)):
        a = np.asarray(s1["buffers"][name])
        b = np.asarray(s2["buffers"][name])
        tol = 2e-5 if rel is None else rel * np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=tol, err_msg=name)
    a = np.asarray(s1["old"]["Mbarmubar"])
    b = np.asarray(s2["old"]["Mbarmubar"])
    np.testing.assert_allclose(b, a, atol=5e-4 * np.abs(a).max())
    assert int(s1["n_advances"]) == int(s2["n_advances"])


def test_fused_substep_kernel_exact():
    """ONE fused substep against the same formula spelled out in jnp with
    the same pallas transforms — pins the kernel math itself (the k² table
    rebuild, M̄/L̄ factors, β weighting, semi-implicit division)."""
    import marlin_tpu.pallas_spectral as ps2

    root = hit.parse(_CH.format(
        domain_extra="fft_backend = PALLAS",
        solver_extra="carry_reciprocal = true\n  fused_spectral = true"))
    p = TensorProblem(root)
    s = p.init_state()
    plan = ps2.match_chain(p.solver)
    dom = p.domain
    c = s["buffers"]["c"].astype(jnp.float32)
    cbar = dom.fft(c)
    nx = plan.shape[0]
    L = int(np.prod(plan.shape[1:], dtype=int))
    cr = jnp.real(cbar).astype(jnp.float32).reshape(nx, L)
    ci = jnp.imag(cbar).astype(jnp.float32).reshape(nx, L)
    onr = jnp.ones((nx, L), jnp.float32) * 0.3
    oni = jnp.ones((nx, L), jnp.float32) * -0.1
    dt = jnp.asarray(0.2, jnp.float32)
    b0, b1 = jnp.asarray(1.5, jnp.float32), jnp.asarray(-0.5, jnp.float32)
    scal = jnp.stack([dt, b0, b1, jnp.zeros((), jnp.float32)]).reshape(1, 4)
    c2, ur, ui, nr, ni = jax.jit(
        lambda *a: ps2.ch_substep(*a, plan)
    )(c, cr, ci, onr, oni, scal)

    mu = plan.mu_fn(c)
    mubar = pf.fftn_unordered(mu)
    k2 = dom.k_square
    N = -k2 * plan.mobility * mubar
    oldN = (onr + 1j * oni).reshape(plan.shape)
    ubar = (cbar + dt * (b0 * N + b1 * oldN)) / (
        1.0 - dt * (k2 * k2 * plan.lin[1])
    )
    c2_ref = pf.ifftn_unordered(ubar, plan.shape)

    scale_N = float(jnp.abs(N).max())
    scale_u = float(jnp.abs(ubar).max())
    assert float(jnp.abs((nr + 1j * ni).reshape(plan.shape) - N).max()) < 2e-5 * scale_N
    assert float(jnp.abs((ur + 1j * ui).reshape(plan.shape) - ubar).max()) < 2e-5 * scale_u
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c2_ref), atol=1e-5)


def test_fused_physics_vs_jnp_fft():
    """End-to-end physics: the fused path agrees with the plain jnp.fft
    non-carry chain (recomputed ū each substep) to f32 accumulation."""
    s1 = _run("", "")
    s2 = _run("fft_backend = PALLAS",
              "carry_reciprocal = true\n  fused_spectral = true")
    np.testing.assert_allclose(
        np.asarray(s2["buffers"]["c"]), np.asarray(s1["buffers"]["c"]),
        atol=2e-4,
    )


def test_fused_first_step_semantics():
    """During MOOSE step 1 no state advances happen and the AB order stays
    0 — a single fused step must equal the unfused one exactly."""
    s1 = _run("fft_backend = PALLAS", "carry_reciprocal = true", steps=1)
    s2 = _run("fft_backend = PALLAS",
              "carry_reciprocal = true\n  fused_spectral = true", steps=1)
    np.testing.assert_allclose(
        np.asarray(s2["buffers"]["c"]), np.asarray(s1["buffers"]["c"]),
        atol=2e-5,
    )
    assert int(s1["n_advances"]) == int(s2["n_advances"]) == 0


_SH = """
[Domain]
  dim = 2
  nx = 128
  ny = 128
  xmax = 188.49555921538757
  ymax = 188.49555921538757
  {domain_extra}
[]
[TensorComputes]
  [Initialize]
    [psi]
      type = ParsedCompute
      buffer = psi
      extra_symbols = true
      expression = '0.035+0.03*cos(0.3*x)*cos(0.4*y)+0.02*(cos(0.23*x+0.11*y))^2'
    []
    [linear]
      type = SwiftHohenbergLinear
      buffer = linear
      alpha = 1
      r = 0.025
    []
  []
  [Solve]
    [psi3]
      type = ParsedCompute
      buffer = psi3
      expression = '0.20*psi^2-psi^3'
      inputs = psi
    []
    [psibar]
      type = ForwardFFT
      buffer = psibar
      input = psi
    []
    [psi3bar]
      type = ForwardFFT
      buffer = psi3bar
      input = psi3
    []
  []
[]
[TensorSolver]
  type = AdamsBashforthMoulton
  buffer = psi
  reciprocal_buffer = psibar
  linear_reciprocal = linear
  nonlinear_reciprocal = psi3bar
  substeps = 5
  {solver_extra}
[]
[Problem]
  type = TensorProblem
[]
"""


def test_fused_swift_hohenberg():
    """Swift-Hohenberg class: N̄ = fft(g(ψ)) directly (no M̄ factor) and
    L̄ = r − α²(1−k²)² from SwiftHohenbergLinear — both rebuilt in-kernel
    (reference examples/swift_hohenberg/swifthohenberg.i chain)."""

    def run(solver_extra, steps=3):
        root = hit.parse(_SH.format(domain_extra="fft_backend = PALLAS",
                                    solver_extra=solver_extra))
        p = TensorProblem(root)
        s = p.init_state()
        step = jax.jit(p._step_impl)
        for i in range(steps):
            s = step(s, float(i), 1.0, 1.0, jnp.asarray(i == 0))
        return s

    s1 = run("carry_reciprocal = true")
    s2 = run("carry_reciprocal = true\n  fused_spectral = true")
    np.testing.assert_allclose(
        np.asarray(s2["buffers"]["psi"]), np.asarray(s1["buffers"]["psi"]),
        atol=2e-5,
    )
    a = np.asarray(s1["buffers"]["psi3bar"])
    b = np.asarray(s2["buffers"]["psi3bar"])
    np.testing.assert_allclose(b, a, atol=max(5e-4 * np.abs(a).max(), 2e-5))


def test_fused_ab1_no_history():
    """AB1 decks (predictor_order = corrector_order = 1) request history
    depth 0 — the fused path must accept them (β₁ = 0, history unused)."""
    extra = ("carry_reciprocal = true\n  fused_spectral = true\n"
             "  predictor_order = 1\n  corrector_order = 1")
    s1 = _run("fft_backend = PALLAS",
              "carry_reciprocal = true\n  predictor_order = 1\n"
              "  corrector_order = 1")
    s2 = _run("fft_backend = PALLAS", extra)
    np.testing.assert_allclose(
        np.asarray(s2["buffers"]["c"]), np.asarray(s1["buffers"]["c"]),
        atol=2e-5,
    )
    assert "Mbarmubar" not in s1["old"] and "Mbarmubar" not in s2["old"]


_CH3D = """
[Domain]
  dim = 3
  nx = 64
  ny = 64
  nz = 64
  xmax = 64
  ymax = 64
  zmax = 64
  fft_backend = PALLAS
  {domain_extra}
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ParsedCompute
      buffer = c
      extra_symbols = true
      expression = '0.5+0.01*(cos(0.2*x)*cos(0.25*y)+cos(0.15*z)*cos(0.3*x))'
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
      expression = '5*(c-0.3)^2*(0.7-c)^2'
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
  substeps = 4
  carry_reciprocal = true
  {solver_extra}
[]
[Problem]
  type = TensorProblem
[]
"""


def _run_3d(domain_extra, solver_extra, mesh=None, steps=2):
    from marlin_tpu import parallel

    root = hit.parse(_CH3D.format(domain_extra=domain_extra,
                                  solver_extra=solver_extra))
    p = TensorProblem(root, mesh=mesh)
    s = p.init_state()
    if mesh is not None:
        s = parallel.shard_state(p.domain, s)
    step = jax.jit(p._step_impl)
    for i in range(steps):
        s = step(s, float(i), 1.0, 1.0, jnp.asarray(i == 0))
    return s


def test_fused_sharded_slab_parity():
    """The distributed fused substep (shard_map over the slab mesh, planar
    all_to_alls between the per-shard kernels — VERDICT r01 item 2) must
    reproduce the serial fused trajectory."""
    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    s1 = _run_3d("", "fused_spectral = true")
    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:4])
    s2 = _run_3d("parallel_mode = FFT_SLAB", "fused_spectral = true",
                 mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(s2["buffers"]["c"]), np.asarray(s1["buffers"]["c"]),
        atol=2e-5,
    )
    for name in ("cbar", "Mbarmubar"):
        a = np.asarray(s1["buffers"][name])
        b = np.asarray(s2["buffers"][name])
        np.testing.assert_allclose(b, a, atol=max(5e-4 * np.abs(a).max(), 2e-5),
                                   err_msg=name)


def test_sharded_slab_unfused_parity():
    """fft_backend = PALLAS + FFT_SLAB without fusion: the regular chain's
    ForwardFFT/solver transforms ride the distributed unordered kernels."""
    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    s1 = _run_3d("", "")
    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:4])
    s2 = _run_3d("parallel_mode = FFT_SLAB", "", mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(s2["buffers"]["c"]), np.asarray(s1["buffers"]["c"]),
        atol=2e-5,
    )


def test_fused_requires_pallas_backend():
    with pytest.raises(ps.SpectralChainError, match="fft_backend = PALLAS"):
        _run("", "carry_reciprocal = true\n  fused_spectral = true", steps=1)


@pytest.mark.parametrize("corr", ["corrector_steps = 1",
                                  "corrector_steps = 2",
                                  "corrector_steps = 1\n  corrector_order = 1"])
def test_fused_corrector_parity(corr):
    """The Adams-Moulton corrector runs fused (same kernel, α-weights,
    ū base = pre-predictor ū, frozen N_n) — including the order-1 quirk
    where the group re-evaluates but ū stays."""
    s1 = _run("fft_backend = PALLAS", f"carry_reciprocal = true\n  {corr}")
    s2 = _run("fft_backend = PALLAS",
              f"carry_reciprocal = true\n  fused_spectral = true\n  {corr}")
    np.testing.assert_allclose(
        np.asarray(s2["buffers"]["c"]), np.asarray(s1["buffers"]["c"]),
        atol=2e-5,
    )
    a = np.asarray(s1["buffers"]["Mbarmubar"])
    b = np.asarray(s2["buffers"]["Mbarmubar"])
    np.testing.assert_allclose(b, a, atol=max(5e-4 * np.abs(a).max(), 2e-5))


def test_fused_rejects_high_corrector_order():
    with pytest.raises(ps.SpectralChainError, match="corrector"):
        _run(
            "fft_backend = PALLAS",
            "carry_reciprocal = true\n  fused_spectral = true\n"
            "  corrector_steps = 1\n  corrector_order = 3",
            steps=1,
        )


def test_fused_requires_carry():
    from marlin_tpu.params import ParamError

    with pytest.raises(ParamError, match="carry_reciprocal"):
        _run("fft_backend = PALLAS", "fused_spectral = true", steps=1)


_MULTI = """
[Domain]
  dim = 2
  nx = 64
  ny = 64
  xmax = 64
  ymax = 64
  {domain_extra}
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ParsedCompute
      buffer = c
      extra_symbols = true
      expression = '0.5+0.01*(cos(0.196349540849362*x)*cos(0.294524311274043*y)+(cos(0.392699081698724*x)*cos(0.196349540849362*y))^2)'
    []
    [n1]
      type = ParsedCompute
      buffer = n1
      extra_symbols = true
      expression = '0.1+0.05*cos(0.098174770424681*x)*cos(0.196349540849362*y)'
    []
    [Lbar]
      type = ReciprocalLaplacianFactor
      buffer = Lbar
    []
    [MkappaL2bar]
      type = ReciprocalLaplacianSquareFactor
      factor = -15
      buffer = MkappaL2bar
    []
    [kappaLbar]
      type = ReciprocalLaplacianFactor
      factor = 15
      buffer = kappaLbar
    []
  []
  [Solve]
    [mu_c]
      type = ParsedCompute
      buffer = mu_c
      expression = '(2*(c-0.3)^2*(0.7-c)^2 + n1^2*c)*5'
      derivatives = c
      inputs = 'c n1'
    []
    [mu_n1]
      type = ParsedCompute
      buffer = mu_n1
      expression = '(n1^2*(1-n1)^2 + n1^2*c)*(-5)'
      derivatives = n1
      inputs = 'c n1'
    []
    [mu_c_bar]
      type = ForwardFFT
      buffer = mu_c_bar
      input = mu_c
    []
    [mu_n1_bar]
      type = ForwardFFT
      buffer = mu_n1_bar
      input = mu_n1
    []
    [Mbar_mu_c_bar]
      type = ParsedCompute
      buffer = Mbar_mu_c_bar
      expression = 'Lbar*mu_c_bar'
      inputs = 'Lbar mu_c_bar'
    []
    [c_bar]
      type = ForwardFFT
      buffer = c_bar
      input = c
    []
    [n1_bar]
      type = ForwardFFT
      buffer = n1_bar
      input = n1
    []
  []
[]
[TensorSolver]
  type = AdamsBashforthMoulton
  buffer = 'c n1'
  reciprocal_buffer = 'c_bar n1_bar'
  linear_reciprocal = 'MkappaL2bar kappaLbar'
  nonlinear_reciprocal = 'Mbar_mu_c_bar mu_n1_bar'
  substeps = 5
  predictor_order = 2
  corrector_order = 2
  corrector_steps = 0
  {solver_extra}
[]
[Problem]
  type = TensorProblem
[]
"""


def _run_multi(domain_extra, solver_extra, steps=3, dt=0.05):
    root = hit.parse(_MULTI.format(domain_extra=domain_extra,
                                   solver_extra=solver_extra))
    p = TensorProblem(root)
    s = p.init_state()
    step = jax.jit(p._step_impl)
    for i in range(steps):
        s = step(s, i * dt, dt, dt, jnp.asarray(i == 0))
    return s


def test_multi_fused_matches_unfused_pallas():
    """The N-variable fused path (benchmark-2a shape: CH field + AC field,
    per-variable M/L polynomials) reproduces the unfused carry trajectory."""
    s1 = _run_multi("fft_backend = PALLAS", "carry_reciprocal = true")
    s2 = _run_multi("fft_backend = PALLAS",
                    "carry_reciprocal = true\n  fused_spectral = true")
    for name in ("c", "n1", "mu_c", "mu_n1"):
        a = np.asarray(s1["buffers"][name])
        b = np.asarray(s2["buffers"][name])
        np.testing.assert_allclose(b, a, atol=5e-5, err_msg=name)
    for name in ("c_bar", "n1_bar", "Mbar_mu_c_bar", "mu_n1_bar"):
        a = np.asarray(s1["buffers"][name])
        b = np.asarray(s2["buffers"][name])
        np.testing.assert_allclose(b, a, atol=5e-4 * np.abs(a).max(),
                                   err_msg=name)
    assert int(s1["n_advances"]) == int(s2["n_advances"])


def test_multi_fused_physics_vs_jnp_fft():
    s1 = _run_multi("", "")
    s2 = _run_multi("fft_backend = PALLAS",
                    "carry_reciprocal = true\n  fused_spectral = true")
    for name in ("c", "n1"):
        np.testing.assert_allclose(
            np.asarray(s2["buffers"][name]), np.asarray(s1["buffers"][name]),
            atol=2e-4, err_msg=name)


def test_multi_fused_sharded_slab_parity():
    """The N-variable fused substep on the 4-device slab mesh (every stage
    vmapped over the field axis inside shard_map, planar all_to_alls with
    the leading-axis shift) reproduces the serial multi-var trajectory."""
    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    deck3d = _mk_multi_3d_deck()

    def run(domain_extra, solver_extra, mesh=None):
        root = hit.parse(deck3d.format(domain_extra=domain_extra,
                                       solver_extra=solver_extra))
        p = TensorProblem(root, mesh=mesh)
        s = p.init_state()
        if mesh is not None:
            s = parallel.shard_state(p.domain, s)
        step = jax.jit(p._step_impl)
        for i in range(2):
            s = step(s, i * 0.05, 0.05, 0.05, jnp.asarray(i == 0))
        return s

    s1 = run("fft_backend = PALLAS",
             "carry_reciprocal = true\n  fused_spectral = true")
    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:4])
    s2 = run("fft_backend = PALLAS\n  parallel_mode = FFT_SLAB",
             "carry_reciprocal = true\n  fused_spectral = true", mesh=mesh)
    for name in ("c", "n1"):
        np.testing.assert_allclose(
            np.asarray(s2["buffers"][name]), np.asarray(s1["buffers"][name]),
            atol=5e-5, err_msg=name)


def test_multi_fused_named_rejections():
    """Non-fusable multi-variable chains raise SpectralChainError naming
    the offending feature."""
    # µ reading a non-variable buffer
    bad = _MULTI.replace("inputs = 'c n1'", "inputs = 'c n1 Lbar'", 1)
    root = hit.parse(bad.format(
        domain_extra="fft_backend = PALLAS",
        solver_extra="carry_reciprocal = true\n  fused_spectral = true"))
    p = TensorProblem(root)
    s = p.init_state()
    with pytest.raises(ps.SpectralChainError, match="non-variable"):
        p.solver.step(s, 0.0, 0.05, 0.05, True)

    # an extra unfusable compute in the solve group
    bad2 = _MULTI.replace("""    [c_bar]
      type = ForwardFFT""", """    [extra]
      type = ParsedCompute
      buffer = extra
      expression = 'c*2'
      inputs = c
    []
    [c_bar]
      type = ForwardFFT""", 1)
    root2 = hit.parse(bad2.format(
        domain_extra="fft_backend = PALLAS",
        solver_extra="carry_reciprocal = true\n  fused_spectral = true"))
    p2 = TensorProblem(root2)
    s2 = p2.init_state()
    with pytest.raises(ps.SpectralChainError, match="extra"):
        p2.solver.step(s2, 0.0, 0.05, 0.05, True)


def _mk_multi_3d_deck():
    """16^3 variant of _MULTI (direct-DFT extent; ICs reference all axes)."""
    return _MULTI.replace("""  dim = 2
  nx = 64
  ny = 64
  xmax = 64
  ymax = 64""", """  dim = 3
  nx = 16
  ny = 16
  nz = 16
  xmax = 16
  ymax = 16
  zmax = 16""").replace("cos(0.196349540849362*x)*cos(0.294524311274043*y)",
                        "cos(0.785398163397448*x)*cos(0.392699081698724*y)*cos(0.392699081698724*z)"
              ).replace("0.05*cos(0.098174770424681*x)*cos(0.196349540849362*y)",
                        "0.05*cos(0.392699081698724*x)*cos(0.392699081698724*y)*cos(0.785398163397448*z)")


def test_multi_fused_3d():
    """The N-variable fused path on a 3-D grid (vmapped planar kernels over
    the field axis at a direct-DFT extent)."""
    deck3d = _mk_multi_3d_deck()
    def run(domain_extra, solver_extra):
        root = hit.parse(deck3d.format(domain_extra=domain_extra,
                                       solver_extra=solver_extra))
        p = TensorProblem(root)
        s = p.init_state()
        step = jax.jit(p._step_impl)
        for i in range(2):
            s = step(s, i * 0.05, 0.05, 0.05, jnp.asarray(i == 0))
        return s

    s1 = run("fft_backend = PALLAS", "carry_reciprocal = true")
    s2 = run("fft_backend = PALLAS",
             "carry_reciprocal = true\n  fused_spectral = true")
    for name in ("c", "n1"):
        np.testing.assert_allclose(
            np.asarray(s2["buffers"][name]), np.asarray(s1["buffers"][name]),
            atol=5e-5, err_msg=name)


def test_poly_kernel_matches_single_var_kernel():
    """The multi-variable polynomial update kernel (_call_update_poly) and
    the single-variable kernel (_call_update) implement the SAME predictor
    formula; this locks them together so a future edit to one cannot
    silently diverge the other (review r03 finding).  Exercised for both
    lapsq (CH) and sh (Swift-Hohenberg) linear forms."""
    rng = np.random.RandomState(3)
    n, L = 64, 64
    mk = lambda: jnp.asarray(rng.randn(n, L).astype(np.float32))
    mr, mi, cr, ci, onr, oni = (mk() for _ in range(6))
    kx2 = jnp.asarray(np.abs(rng.randn(n, 1)).astype(np.float32))
    kyz2 = jnp.asarray(np.abs(rng.randn(1, L)).astype(np.float32))
    scal = jnp.asarray([[0.05, 1.5, -0.5, 0.0]], jnp.float32)

    class FakePlan:
        pass

    # CH form: M = -k2*mobility, L = k4*kappa
    plan = FakePlan()
    plan.mobility = 5.0
    plan.lin = ("lapsq", -10.0)
    ref = ps._call_update(mr, mi, cr, ci, onr, oni, kx2, kyz2, scal, plan)
    scal8 = jnp.asarray([[0.05, 1.5, -0.5, 0.0, -5.0, 0.0, 0.0, -10.0]],
                        jnp.float32)
    got = ps._call_update_poly(mr, mi, cr, ci, onr, oni, kx2, kyz2, scal8)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)

    # SH form: M = identity, L = r - a^2 (1-k2)^2 = (r-a^2) + 2a^2 k2 - a^2 k4
    plan2 = FakePlan()
    plan2.mobility = None
    plan2.lin = ("sh", 0.025, 1.0)
    ref2 = ps._call_update(mr, mi, cr, ci, onr, oni, kx2, kyz2, scal, plan2)
    scal8b = jnp.asarray([[0.05, 1.5, -0.5, 1.0, 0.0,
                           0.025 - 1.0, 2.0, -1.0]], jnp.float32)
    got2 = ps._call_update_poly(mr, mi, cr, ci, onr, oni, kx2, kyz2, scal8b)
    for a, b in zip(ref2, got2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)
