"""NEML2-equivalent constitutive path (reference
src/tensor_computes/NEML2TensorCompute.C + test/tests/neml2/).

marlin_tpu implements the deck surface with a pure-JAX model registry
covering a documented subset of NEML2's algebra models (see
computes/neml2.py)."""

import os

import numpy as np
import pytest

from .gold import REF, csv_diff, run_ref_deck


def test_neml2_scalar_gold():
    """reference test/tests/neml2/tests `scalar`: ScalarMultiplication
    C = A*B over the grid, CSVDiff vs gold (time,C = 1,6)."""
    _, tmp = run_ref_deck("test/tests/neml2/scalar.i")
    csv_diff("test/tests/neml2/gold/scalar_out.csv", f"{tmp}/scalar_out.csv")


def test_neml2_linear_combination(tmp_path):
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck

    deck_dir = str(tmp_path)
    (tmp_path / "model.i").write_text(
        """
[Models]
  [combo]
    type = ScalarLinearCombination
    from_var = 'forces/A forces/B'
    to_var = 'state/C'
    coefficients = '2 -1'
  []
[]
"""
    )
    (tmp_path / "deck.i").write_text(
        """
[Domain]
  dim = 2
  nx = 4
  ny = 4
[]
[Problem]
  type = TensorProblem
[]
[TensorComputes]
  [Initialize]
    [A]
      type = ConstantTensor
      buffer = A
      real = 5
    []
    [B]
      type = ConstantTensor
      buffer = B
      real = 3
    []
    [C]
      type = NEML2TensorCompute
      neml2_input_file = model.i
      neml2_model = combo
      marlin_inputs = 'A B'
      neml2_inputs = 'forces/A forces/B'
      neml2_outputs = 'state/C'
      marlin_outputs = 'C'
    []
  []
[]
[Executioner]
  type = Transient
  num_steps = 1
[]
"""
    )
    root = hit.load(str(tmp_path / "deck.i"))
    tr = run_deck(root, output_dir=str(tmp_path), deck_dir=deck_dir)
    C = np.asarray(tr.state["buffers"]["C"])
    np.testing.assert_allclose(C, 2 * 5 - 3)


def test_neml2_unknown_model_type_errors(tmp_path):
    """Unsupported NEML2 model types name the divergence clearly."""
    from marlin_tpu import hit
    from marlin_tpu.computes.neml2 import NEML2Error
    from marlin_tpu.executioner import run_deck

    (tmp_path / "model.i").write_text(
        "[Models]\n  [m]\n    type = GreenLagrangeStrain\n  []\n[]\n"
    )
    (tmp_path / "deck.i").write_text(
        """
[Domain]
  dim = 1
  nx = 4
[]
[Problem]
  type = TensorProblem
[]
[TensorComputes]
  [Initialize]
    [C]
      type = NEML2TensorCompute
      neml2_input_file = model.i
      neml2_model = m
      marlin_outputs = 'C'
      neml2_outputs = 'state/C'
    []
  []
[]
[Executioner]
  type = Transient
  num_steps = 1
[]
"""
    )
    with pytest.raises(NEML2Error, match="supported subset"):
        run_deck(
            hit.load(str(tmp_path / "deck.i")),
            output_dir=str(tmp_path), deck_dir=str(tmp_path),
        )


def test_neml2_buffer_types(tmp_path):
    """VectorTensor / SR2Tensor buffers get the NEML2 primitive trailing
    dims (reference src/tensor_buffers/NEML2TensorBuffer.C)."""
    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    (tmp_path / "deck.i").write_text(
        """
[Domain]
  dim = 2
  nx = 4
  ny = 4
[]
[TensorBuffers]
  [v]
    type = VectorTensor
  []
  [s]
    type = SR2Tensor
  []
[]
[Problem]
  type = TensorProblem
[]
"""
    )
    p = TensorProblem(hit.load(str(tmp_path / "deck.i")))
    state = p.init_state()
    assert state["buffers"]["v"].shape == (4, 4, 3)
    assert state["buffers"]["s"].shape == (4, 4, 6)


def test_project_vector_tensor_aux(tmp_path):
    """ProjectVectorTensorAux: component-wise projection of a vector buffer
    onto an aux variable (reference ProjectVectorTensorAux.C — upstream
    marks it untested; here it round-trips through Exodus components)."""
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck
    from marlin_tpu.exodus import read_exodus

    (tmp_path / "deck.i").write_text(
        """
[Domain]
  dim = 2
  nx = 4
  ny = 4
  xmax = 4
  ymax = 4
[]
[TensorBuffers]
  [v]
    type = VectorTensor
  []
[]
[TensorComputes]
  [Initialize]
    [v]
      type = ConstantTensor
      buffer = v
      real = 2
    []
  []
[]
[AuxVariables]
  [v]
    family = MONOMIAL
    order = CONSTANT
  []
[]
[AuxKernels]
  [v]
    type = ProjectVectorTensorAux
    buffer = v
    variable = v
  []
[]
[Problem]
  type = TensorProblem
[]
[Executioner]
  type = Transient
  num_steps = 1
[]
[Outputs]
  exodus = true
[]
"""
    )
    run_deck(
        hit.load(str(tmp_path / "deck.i")), file_base="vec_out",
        output_dir=str(tmp_path), deck_stem="deck",
    )
    e = read_exodus(tmp_path / "vec_out.e")
    assert set(e["elem"]) == {"v_x", "v_y", "v_z"}
    for comp in e["elem"].values():
        np.testing.assert_allclose(comp, 2.0)


def _run_mini_deck(tmp_path, model_i, deck_body):
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck

    (tmp_path / "model.i").write_text(model_i)
    (tmp_path / "deck.i").write_text(deck_body)
    root = hit.load(str(tmp_path / "deck.i"))
    return run_deck(root, output_dir=str(tmp_path), deck_dir=str(tmp_path))


def test_neml2_linear_isotropic_elasticity(tmp_path):
    """VERDICT r03 item 7: a real (non-algebra) constitutive model.
    S = 3K·vol(E) + 2G·dev(E) on Mandel SR2 buffers; checked against the
    closed form for a uniaxial strain state."""
    tr = _run_mini_deck(
        tmp_path,
        """
[Models]
  [elast]
    type = LinearIsotropicElasticity
    coefficients = '100 0.3'
    coefficient_types = 'YOUNGS_MODULUS POISSONS_RATIO'
    strain = 'forces/E'
    stress = 'state/S'
  []
[]
""",
        """
[Domain]
  dim = 2
  nx = 4
  ny = 4
[]
[TensorBuffers]
  [E]
    type = SR2Tensor
  []
  [S]
    type = SR2Tensor
  []
[]
[Problem]
  type = TensorProblem
[]
[TensorComputes]
  [Initialize]
    [E]
      type = ConstantTensor
      buffer = E
      real = 0.01
    []
    [S]
      type = NEML2TensorCompute
      neml2_input_file = model.i
      neml2_model = elast
      marlin_inputs = 'E'
      neml2_inputs = 'forces/E'
      neml2_outputs = 'state/S'
      marlin_outputs = 'S'
    []
  []
[]
[Executioner]
  type = Transient
  num_steps = 1
[]
""",
    )
    S = np.asarray(tr.state["buffers"]["S"])
    assert S.shape[-1] == 6
    E_mod, nu, eps = 100.0, 0.3, 0.01
    K = E_mod / (3 * (1 - 2 * nu))
    G = E_mod / (2 * (1 + nu))
    # the IC fills every Mandel component with eps; tr = 3*eps so
    # vol = eps*I, dev = eps on the shear slots only
    np.testing.assert_allclose(S[..., 0], 3 * K * eps, rtol=1e-6)
    np.testing.assert_allclose(S[..., 3], 2 * G * eps, rtol=1e-6)


def test_neml2_sr2_invariant_vonmises(tmp_path):
    from marlin_tpu import hit
    from marlin_tpu.computes.neml2 import load_neml2_model

    (tmp_path / "model.i").write_text(
        """
[Models]
  [vm]
    type = SR2Invariant
    invariant_type = VONMISES
    tensor = 'state/S'
    invariant = 'state/vm'
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "vm")
    import jax.numpy as jnp

    # pure shear in Mandel notation: S_xy = s => mandel slot 5 = sqrt(2)*s
    s = 7.0
    S = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, np.sqrt(2) * s])
    vm = np.asarray(m.forward({"state/S": S})["state/vm"])
    np.testing.assert_allclose(vm, np.sqrt(3.0) * s, rtol=1e-6)
    # uniaxial stress: vm == |sigma|
    S1 = jnp.asarray([5.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(m.forward({"state/S": S1})["state/vm"]), 5.0, rtol=1e-6)


def test_neml2_rate_form_forward_euler(tmp_path):
    """Rate-form integration s = s_old + s_rate*(t - t_old) with NEML2's
    state/old_state/forces axis naming."""
    from marlin_tpu import hit
    from marlin_tpu.computes.neml2 import load_neml2_model

    (tmp_path / "model.i").write_text(
        """
[Models]
  [integrate]
    type = ScalarForwardEulerTimeIntegration
    variable = 'state/foo'
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "integrate")
    import jax.numpy as jnp

    out = m.forward({
        "state/foo_rate": jnp.asarray(2.0),
        "old_state/foo": jnp.asarray(1.0),
        "forces/t": jnp.asarray(0.7),
        "old_forces/t": jnp.asarray(0.2),
    })
    np.testing.assert_allclose(np.asarray(out["state/foo"]), 2.0)


def test_neml2_buffer_primitive_types(tmp_path):
    """R2/SSR4/Rot NEML2 primitives get their trailing dims (reference
    src/tensor_buffers/NEML2TensorBuffer.C type map)."""
    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    deck = """
[Domain]
  dim = 2
  nx = 4
  ny = 4
[]
[TensorBuffers]
  [r2]
    type = R2Tensor
  []
  [ssr4]
    type = SSR4Tensor
  []
  [rot]
    type = RotTensor
  []
[]
[Problem]
  type = TensorProblem
[]
"""
    p = TensorProblem(hit.parse(deck))
    s = p.init_state()
    assert s["buffers"]["r2"].shape == (4, 4, 3, 3)
    assert s["buffers"]["ssr4"].shape == (4, 4, 6, 6)
    assert s["buffers"]["rot"].shape == (4, 4, 3)


def test_neml2_viscoplastic_chain(tmp_path):
    """A composed rate-form viscoplastic chain from real NEML2 model names:
    von Mises stress -> Voce hardening -> Perzyna overstress flow rate ->
    forward-Euler update of the plastic multiplier.  Checked against the
    closed form."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [vm]
    type = SR2Invariant
    invariant_type = VONMISES
    tensor = 'state/S'
    invariant = 'state/internal/svm'
  []
  [voce]
    type = VoceIsotropicHardening
    saturated_hardening = 100
    saturation_rate = 2.0
  []
  [linhard]
    type = LinearIsotropicHardening
    hardening_modulus = 500
  []
  [flow]
    type = PerzynaPlasticFlowRate
    reference_stress = 50
    exponent = 3
  []
  [integrate]
    type = ScalarForwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [elastic_strain]
    type = SR2LinearCombination
    from_var = 'forces/E state/internal/Ep'
    to_var = 'state/internal/Ee'
    coefficients = '1 -1'
  []
[]
"""
    )
    path = str(tmp_path / "model.i")
    vm = load_neml2_model(path, "vm")
    voce = load_neml2_model(path, "voce")
    linh = load_neml2_model(path, "linhard")
    flow = load_neml2_model(path, "flow")
    integ = load_neml2_model(path, "integrate")
    comb = load_neml2_model(path, "elastic_strain")

    S = jnp.asarray([120.0, 0.0, 0.0, 0.0, 0.0, 0.0])  # uniaxial
    svm = vm.forward({"state/S": S})["state/internal/svm"]
    np.testing.assert_allclose(np.asarray(svm), 120.0, rtol=1e-6)

    ep = jnp.asarray(0.1)
    k = voce.forward({"state/internal/ep": ep})["state/internal/k"]
    np.testing.assert_allclose(np.asarray(k), 100 * (1 - np.exp(-0.2)),
                               rtol=1e-6)
    k2 = linh.forward({"state/internal/ep": ep})["state/internal/k"]
    np.testing.assert_allclose(np.asarray(k2), 50.0, rtol=1e-6)

    # overstress f = svm - (yield+k); take f = 120 - 100 = 20
    rate = flow.forward({"state/internal/fp": jnp.asarray(20.0)})[
        "state/internal/gamma_rate"]
    np.testing.assert_allclose(np.asarray(rate), (20 / 50) ** 3, rtol=1e-6)
    # negative overstress -> no flow (Macaulay bracket)
    rate0 = flow.forward({"state/internal/fp": jnp.asarray(-5.0)})[
        "state/internal/gamma_rate"]
    np.testing.assert_allclose(np.asarray(rate0), 0.0)

    newep = integ.forward({
        "state/internal/ep_rate": rate, "old_state/internal/ep": ep,
        "forces/t": jnp.asarray(1.5), "old_forces/t": jnp.asarray(1.0),
    })["state/internal/ep"]
    np.testing.assert_allclose(np.asarray(newep),
                               0.1 + 0.5 * (20 / 50) ** 3, rtol=1e-6)

    E = jnp.asarray([0.02, 0.0, 0.0, 0.0, 0.0, 0.0])
    Ep = jnp.asarray([0.005, 0.0, 0.0, 0.0, 0.0, 0.0])
    Ee = comb.forward({"forces/E": E, "state/internal/Ep": Ep})[
        "state/internal/Ee"]
    np.testing.assert_allclose(np.asarray(Ee[0]), 0.015, rtol=1e-6)


def _j2_model_file(tmp_path, hardening):
    (tmp_path / "model.i").write_text(
        f"""
[Models]
  [j2]
    type = J2RadialReturn
    coefficients = '200e3 0.3'
    coefficient_types = 'YOUNGS_MODULUS POISSONS_RATIO'
    yield_stress = 250
    {hardening}
  []
[]
"""
    )
    return str(tmp_path / "model.i")


def test_neml2_j2_radial_return_linear_closed_form(tmp_path):
    """Radial return with LINEAR hardening has the closed form
    dep = f_trial/(3G+H) — the standard return-map oracle (NEML2 composes
    the same solve from ImplicitUpdate(Newton); reference wraps it via
    src/tensor_computes/NEML2TensorCompute.C)."""
    import jax.numpy as jnp

    from marlin_tpu.computes.neml2 import load_neml2_model

    H = 1000.0
    m = load_neml2_model(
        _j2_model_file(tmp_path, "hardening_modulus = 1000"), "j2")
    G = 200e3 / (2 * (1 + 0.3))
    K = 200e3 / (3 * (1 - 0.6))

    E = jnp.asarray([0.004, 0.0, 0.0, 0.0, 0.0, 0.0])
    out = m.forward({
        "forces/E": E,
        "old_state/internal/Ep": jnp.zeros(6),
        "old_state/internal/ep": jnp.zeros(()),
    })
    # closed-form trial state (uniaxial strain)
    tr = 0.004
    dev = np.array([0.004 - tr / 3, -tr / 3, -tr / 3, 0, 0, 0])
    s_dev = 2 * G * dev
    svm_tr = np.sqrt(1.5 * np.sum(s_dev ** 2))
    f_tr = svm_tr - 250.0
    assert f_tr > 0
    dep = f_tr / (3 * G + H)

    np.testing.assert_allclose(np.asarray(out["state/internal/ep"]), dep,
                               rtol=1e-6)
    # consistency: updated vm stress sits exactly on the hardened yield
    S = np.asarray(out["state/S"])
    trS = S[0] + S[1] + S[2]
    devS = S - np.array([trS / 3] * 3 + [0, 0, 0])
    svm_new = np.sqrt(1.5 * np.sum(devS ** 2))
    np.testing.assert_allclose(svm_new, 250.0 + H * dep, rtol=1e-6)
    # volumetric response stays elastic
    np.testing.assert_allclose(trS, 3 * K * tr, rtol=1e-6)
    # plastic strain is deviatoric and its equivalent measure equals dep
    Ep = np.asarray(out["state/internal/Ep"])
    np.testing.assert_allclose(Ep[0] + Ep[1] + Ep[2], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.sqrt(2 / 3 * np.sum(Ep ** 2)), dep,
                               rtol=1e-6)


def test_neml2_j2_radial_return_voce_newton(tmp_path):
    """Voce hardening needs the Newton loop (no closed form): check the
    consistency residual is solved to tolerance and the elastic branch is
    untouched, on a mixed elastic/plastic field (the while_loop is
    vectorized over the grid)."""
    import jax.numpy as jnp

    from marlin_tpu.computes.neml2 import load_neml2_model

    R, d = 100.0, 50.0
    m = load_neml2_model(
        _j2_model_file(
            tmp_path, "saturated_hardening = 100\n    saturation_rate = 50"),
        "j2")
    G = 200e3 / (2 * (1 + 0.3))

    # two material points: plastic (0.004) and elastic (0.0005)
    E = jnp.asarray([[0.004, 0, 0, 0, 0, 0], [0.0005, 0, 0, 0, 0, 0]])
    out = m.forward({
        "forces/E": E,
        "old_state/internal/Ep": jnp.zeros((2, 6)),
        "old_state/internal/ep": jnp.zeros(2),
    })
    ep = np.asarray(out["state/internal/ep"])
    assert ep[0] > 0 and ep[1] == 0.0

    for i, e11 in enumerate([0.004, 0.0005]):
        tr = e11
        dev = np.array([e11 - tr / 3, -tr / 3, -tr / 3, 0, 0, 0])
        svm_tr = np.sqrt(1.5 * np.sum((2 * G * dev) ** 2))
        if i == 0:
            resid = svm_tr - 3 * G * ep[0] - 250.0 - R * (1 - np.exp(-d * ep[0]))
            assert abs(resid) < 1e-6
        else:
            assert svm_tr < 250.0  # genuinely elastic
            S = np.asarray(out["state/S"])[1]
            np.testing.assert_allclose(
                S[0], (200e3 / (3 * (1 - 0.6))) * tr + 2 * G * dev[0],
                rtol=1e-6)


def test_neml2_composed_model_rate_chain(tmp_path):
    """ComposedModel resolves the dependency order of a real NEML2
    viscoplastic chain (von Mises -> Voce @ old ep -> YieldFunction ->
    Perzyna -> forward Euler) and exposes only unproduced variables as
    inputs."""
    import jax.numpy as jnp

    from marlin_tpu.computes.neml2 import load_neml2_model

    (tmp_path / "model.i").write_text(
        """
[Models]
  [vm]
    type = SR2Invariant
    invariant_type = VONMISES
    tensor = 'state/S'
    invariant = 'state/internal/sm'
  []
  [voce]
    type = VoceIsotropicHardening
    saturated_hardening = 100
    saturation_rate = 2.0
    equivalent_plastic_strain = 'old_state/internal/ep'
  []
  [yield]
    type = YieldFunction
    yield_stress = 100
    isotropic_hardening = 'state/internal/k'
  []
  [flow]
    type = PerzynaPlasticFlowRate
    reference_stress = 50
    exponent = 3
    flow_function = 'state/internal/fp'
    flow_rate = 'state/internal/ep_rate'
  []
  [integrate]
    type = ScalarForwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [chain]
    type = ComposedModel
    models = 'integrate flow yield voce vm'
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "chain")
    # declared inputs are exactly the unproduced variables
    assert set(m.from_var) == {"state/S", "old_state/internal/ep",
                               "forces/t", "old_forces/t"}

    S = jnp.asarray([180.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    ep0 = 0.1
    out = m.forward({
        "state/S": S,
        "old_state/internal/ep": jnp.asarray(ep0),
        "forces/t": jnp.asarray(2.0),
        "old_forces/t": jnp.asarray(1.5),
    })
    k = 100 * (1 - np.exp(-2.0 * ep0))
    f = 180.0 - 100.0 - k
    rate = (max(f, 0.0) / 50.0) ** 3
    np.testing.assert_allclose(np.asarray(out["state/internal/fp"]), f,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["state/internal/ep"]),
                               ep0 + 0.5 * rate, rtol=1e-6)


def test_neml2_composed_model_cycle_errors(tmp_path):
    from marlin_tpu.computes.neml2 import NEML2Error, load_neml2_model

    (tmp_path / "model.i").write_text(
        """
[Models]
  [a]
    type = ScalarLinearCombination
    from_var = 'state/b'
    to_var = 'state/a'
  []
  [b]
    type = ScalarLinearCombination
    from_var = 'state/a'
    to_var = 'state/b'
  []
  [chain]
    type = ComposedModel
    models = 'a b'
  []
[]
"""
    )
    with pytest.raises(NEML2Error, match="unresolvable"):
        load_neml2_model(str(tmp_path / "model.i"), "chain").forward({})


def test_neml2_j2_deck_level(tmp_path):
    """J2RadialReturn through the full NEML2TensorCompute deck surface:
    SR2Tensor buffers in, stress + plastic state out, inside the jitted
    init program."""
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck

    (tmp_path / "model.i").write_text(
        """
[Models]
  [j2]
    type = J2RadialReturn
    coefficients = '200e3 0.3'
    coefficient_types = 'YOUNGS_MODULUS POISSONS_RATIO'
    yield_stress = 250
    hardening_modulus = 1000
  []
[]
"""
    )
    (tmp_path / "deck.i").write_text(
        """
[Domain]
  dim = 2
  nx = 4
  ny = 4
[]
[Problem]
  type = TensorProblem
[]
[TensorBuffers]
  [E]
    type = SR2Tensor
  []
  [Ep_old]
    type = SR2Tensor
  []
  [ep_old]
    type = PlainTensorBuffer
  []
  [S]
    type = SR2Tensor
  []
  [Ep]
    type = SR2Tensor
  []
  [ep]
    type = PlainTensorBuffer
  []
[]
[TensorComputes]
  [Initialize]
    [E]
      type = ConstantTensor
      buffer = E
      real = 0.004
    []
    [j2]
      type = NEML2TensorCompute
      neml2_input_file = model.i
      neml2_model = j2
      marlin_inputs = 'E Ep_old ep_old'
      neml2_inputs = 'forces/E old_state/internal/Ep old_state/internal/ep'
      neml2_outputs = 'state/S state/internal/Ep state/internal/ep'
      marlin_outputs = 'S Ep ep'
    []
  []
[]
[Executioner]
  type = Transient
  num_steps = 1
[]
"""
    )
    root = hit.load(str(tmp_path / "deck.i"))
    tr = run_deck(root, output_dir=str(tmp_path), deck_dir=str(tmp_path))
    G = 200e3 / (2 * (1 + 0.3))
    # the IC fills every Mandel component with 0.004
    E_m = np.full(6, 0.004)
    tr_ = E_m[0] + E_m[1] + E_m[2]
    dev = E_m - np.array([tr_ / 3] * 3 + [0, 0, 0])
    svm_tr = np.sqrt(1.5 * np.sum((2 * G * dev) ** 2))
    dep = (svm_tr - 250.0) / (3 * G + 1000.0)
    assert dep > 0
    ep = np.asarray(tr.state["buffers"]["ep"])
    assert ep.shape == (4, 4)
    np.testing.assert_allclose(ep, dep, rtol=1e-5)


def test_neml2_sr2_forward_euler(tmp_path):
    """ForwardEulerTimeIntegration<SR2>: tensor state integrates
    componentwise with the scalar dt broadcast over the Mandel axis."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [integrate_Ep]
    type = SR2ForwardEulerTimeIntegration
    variable = 'state/internal/Ep'
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "integrate_Ep")
    rate = jnp.asarray([[1.0, -0.5, -0.5, 0.0, 0.0, 0.3]] * 2)
    old = jnp.asarray([[0.1, 0.0, 0.0, 0.0, 0.0, 0.0]] * 2)
    out = m.forward({
        "state/internal/Ep_rate": rate,
        "old_state/internal/Ep": old,
        "forces/t": jnp.asarray([2.0, 2.0]),
        "old_forces/t": jnp.asarray([1.5, 1.5]),
    })["state/internal/Ep"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(old) + 0.5 * np.asarray(rate), rtol=1e-6)


def test_neml2_chaboche_rate_chain(tmp_path):
    """The standard NEML2 Chaboche viscoplastic assembly — overstress
    M = S − X, von Mises measure, yield, Perzyna flow, NORMALITY flow
    direction, associative plastic/kinematic flows, Chaboche back-stress
    rate — composed via ComposedModel and checked against closed forms."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [overstress]
    type = SR2LinearCombination
    from_var = 'state/S state/internal/X'
    to_var = 'state/internal/M'
    coefficients = '1 -1'
  []
  [vm]
    type = SR2Invariant
    invariant_type = VONMISES
    tensor = 'state/internal/M'
    invariant = 'state/internal/sm'
  []
  [yield]
    type = YieldFunction
    yield_stress = 100
  []
  [flow]
    type = PerzynaPlasticFlowRate
    reference_stress = 50
    exponent = 2
  []
  [normality]
    type = Normality
    stress = 'state/internal/M'
    flow_direction = 'state/internal/NM'
  []
  [ep_flow]
    type = AssociativePlasticFlow
  []
  [iso_hard]
    type = AssociativeIsotropicPlasticHardening
  []
  [kin_flow]
    type = AssociativeKinematicPlasticFlow
  []
  [chaboche]
    type = ChabochePlasticHardening
    C = 1000
    g = 9
  []
  [all]
    type = ComposedModel
    models = 'overstress vm yield flow normality ep_flow iso_hard kin_flow chaboche'
  []
[]
"""
    )
    path = str(tmp_path / "model.i")
    m = load_neml2_model(path, "all")

    # uniaxial stress 160, back stress 10 along x (deviatoric part matters)
    S = jnp.asarray([160.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    X = jnp.asarray([10.0, -5.0, -5.0, 0.0, 0.0, 0.0])  # deviatoric
    out = m.forward({"state/S": S, "state/internal/X": X})

    M = np.asarray(S) - np.asarray(X)
    tr = M[:3].sum()
    dev = M - np.concatenate([np.full(3, tr / 3), np.zeros(3)])
    sm = np.sqrt(1.5 * np.sum(dev * dev))
    np.testing.assert_allclose(np.asarray(out["state/internal/sm"]), sm,
                               rtol=1e-6)
    f = sm - 100.0
    gam = (max(f, 0.0) / 50.0) ** 2
    np.testing.assert_allclose(np.asarray(out["state/internal/gamma_rate"]),
                               gam, rtol=1e-6)
    N = 1.5 * dev / sm
    np.testing.assert_allclose(np.asarray(out["state/internal/NM"]), N,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["state/internal/Ep_rate"]),
                               gam * N, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["state/internal/ep_rate"]),
                               gam, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["state/internal/Kp_rate"]),
                               gam * N, rtol=1e-6)
    X_rate = (2.0 / 3.0) * 1000 * gam * N - 9 * np.asarray(X) * gam
    np.testing.assert_allclose(np.asarray(out["state/internal/X_rate"]),
                               X_rate, rtol=1e-6)


def test_neml2_chaboche_static_recovery(tmp_path):
    """Chaboche static-recovery term −A·‖X‖^(a−1)·X (von Mises norm)."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [chaboche]
    type = ChabochePlasticHardening
    C = 0
    g = 0
    A = 1e-6
    a = 3.0
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "chaboche")
    X = jnp.asarray([30.0, -15.0, -15.0, 0.0, 0.0, 0.0])
    out = m.forward({
        "state/internal/X": X,
        "state/internal/gamma_rate": jnp.asarray(0.0),
        "state/internal/NM": jnp.zeros(6),
    })["state/internal/X_rate"]
    norm = np.sqrt(1.5 * np.sum(np.asarray(X) ** 2))  # already deviatoric
    np.testing.assert_allclose(np.asarray(out),
                               -1e-6 * norm ** 2 * np.asarray(X), rtol=1e-6)


def test_neml2_linear_kinematic_hardening(tmp_path):
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [kin]
    type = LinearKinematicHardening
    hardening_modulus = 1500
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "kin")
    Kp = jnp.asarray([0.01, -0.005, -0.005, 0.0, 0.002, 0.0])
    out = m.forward({"state/internal/Kp": Kp})["state/internal/X"]
    np.testing.assert_allclose(np.asarray(out),
                               (2.0 / 3.0) * 1500 * np.asarray(Kp), rtol=1e-6)


def test_neml2_arrhenius_parameter(tmp_path):
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [eta]
    type = ArrheniusParameter
    reference_value = 100
    activation_energy = 50000
    parameter = 'parameters/eta'
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "eta")
    T = jnp.asarray(800.0)
    out = m.forward({"forces/T": T})["parameters/eta"]
    np.testing.assert_allclose(
        np.asarray(out), 100 * np.exp(-50000 / (8.31446261815324 * 800.0)),
        rtol=1e-6)


def test_neml2_j2_kinematic_radial_return(tmp_path):
    """Radial return with combined linear isotropic + kinematic (Prager)
    hardening: Δep = f_trial/(3G + H + Hk) on the shifted stress
    ξ = dev(S_trial) − X_old, with ΔX = 2/3·Hk·ΔEp."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [j2]
    type = J2RadialReturn
    coefficients = '200e3 0.3'
    coefficient_types = 'YOUNGS_MODULUS POISSONS_RATIO'
    yield_stress = 250
    hardening_modulus = 1000
    kinematic_hardening_modulus = 2000
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "j2")
    E_mod, nu = 200e3, 0.3
    G = E_mod / (2 * (1 + nu))
    K = E_mod / (3 * (1 - 2 * nu))

    E = jnp.asarray([[0.004, 0.0, 0.0, 0.0, 0.0, 0.0],
                     [0.0005, 0.0, 0.0, 0.0, 0.0, 0.0]])  # 2nd stays elastic
    Ep0 = jnp.zeros((2, 6))
    ep0 = jnp.zeros(2)
    X0 = jnp.asarray([[20.0, -10.0, -10.0, 0.0, 0.0, 0.0],
                      [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    out = m.forward({
        "forces/E": E,
        "old_state/internal/Ep": Ep0,
        "old_state/internal/ep": ep0,
        "old_state/internal/X": X0,
    })

    # manual radial return for row 0
    Em = np.asarray(E[0])
    tr = Em[:3].sum()
    dev_e = Em - np.concatenate([np.full(3, tr / 3), np.zeros(3)])
    s_dev = 2 * G * dev_e
    xi = s_dev - np.asarray(X0[0])
    svm = np.sqrt(1.5 * np.sum(xi * xi))
    f_tr = svm - 250.0
    assert f_tr > 0
    dep = f_tr / (3 * G + 1000.0 + 2000.0)
    N = 1.5 * xi / svm
    S_tr = 3 * K * np.concatenate([np.full(3, tr / 3), np.zeros(3)]) + s_dev
    np.testing.assert_allclose(np.asarray(out["state/internal/ep"])[0], dep,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["state/S"])[0],
                               S_tr - 2 * G * dep * N, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out["state/internal/X"])[0],
                               np.asarray(X0[0]) + (2 / 3) * 2000 * dep * N,
                               rtol=1e-6, atol=1e-10)
    # elastic row: no plastic flow, back stress unchanged
    np.testing.assert_allclose(np.asarray(out["state/internal/ep"])[1], 0.0)
    np.testing.assert_allclose(np.asarray(out["state/internal/X"])[1],
                               0.0, atol=1e-12)


def test_neml2_implicit_update_scalar_ode(tmp_path):
    """ImplicitUpdate + ScalarBackwardEulerTimeIntegration on the linear ODE
    ṡ = a·s + b: backward Euler has the exact closed form
    s = (s_old + b·dt)/(1 − a·dt); the residual is linear in s, so Newton
    lands on it to machine precision in one iteration."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [bsrc]
    type = ScalarParameterToState
    to_var = 'state/b'
    value = 3.0
  []
  [rate]
    type = ScalarLinearCombination
    from_var = 'state/s state/b'
    to_var = 'state/s_rate'
    coefficients = '-2.0 1.0'
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/s'
  []
  [system]
    type = ComposedModel
    models = 'bsrc rate integ'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    # the unknown is solved for, not an input; its old value + times are
    assert "state/s" not in m.from_var
    assert "old_state/s" in m.from_var

    out = m.forward({
        "old_state/s": jnp.asarray(1.0),
        "forces/t": jnp.asarray(0.5),
        "old_forces/t": jnp.asarray(0.0),
    })
    # s = (1 + 3·0.5)/(1 + 2·0.5) = 2.5/2 = 1.25
    np.testing.assert_allclose(np.asarray(out["state/s"]), 1.25, atol=1e-12)
    # the rate at the SOLVED state is exposed too (implicit consistency)
    np.testing.assert_allclose(np.asarray(out["state/s_rate"]),
                               -2.0 * 1.25 + 3.0, atol=1e-12)


def test_neml2_implicit_perzyna_viscoplasticity(tmp_path):
    """The standard NEML2 implicit viscoplastic system — elasticity on
    Ee = E − Ep, von Mises stress, linear isotropic hardening, Perzyna
    overstress flow, normality, associative flow — backward-Euler
    integrated by ImplicitUpdate with mixed unknowns (Ep: Mandel 6, ep: 1;
    packed n = 7).  Verified by (a) self-consistency of the residuals at
    the solution, (b) agreement with a 2000-substep forward-Euler
    integration, (c) the elastic branch staying exactly elastic, on a
    grid-shaped strain field."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [elastic_strain]
    type = SR2LinearCombination
    from_var = 'forces/E state/internal/Ep'
    to_var = 'state/internal/Ee'
    coefficients = '1 -1'
  []
  [elasticity]
    type = LinearIsotropicElasticity
    strain = 'state/internal/Ee'
    stress = 'state/S'
    coefficients = '200e3 0.3'
    coefficient_types = 'YOUNGS_MODULUS POISSONS_RATIO'
  []
  [vm]
    type = SR2Invariant
    invariant_type = VONMISES
    tensor = 'state/S'
    invariant = 'state/internal/sm'
  []
  [hard]
    type = LinearIsotropicHardening
    hardening_modulus = 1000
  []
  [yield]
    type = YieldFunction
    yield_stress = 100
    stress_measure = 'state/internal/sm'
    isotropic_hardening = 'state/internal/k'
  []
  [flow]
    type = PerzynaPlasticFlowRate
    reference_stress = 50
    exponent = 2
  []
  [normality]
    type = Normality
    stress = 'state/S'
    flow_direction = 'state/internal/NM'
  []
  [epflow]
    type = AssociativePlasticFlow
    plastic_strain_rate = 'state/internal/Ep_rate'
  []
  [eprate]
    type = AssociativeIsotropicPlasticHardening
  []
  [integ_Ep]
    type = SR2BackwardEulerTimeIntegration
    variable = 'state/internal/Ep'
  []
  [integ_ep]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [system]
    type = ComposedModel
    models = 'elastic_strain elasticity vm hard yield flow normality
              epflow eprate integ_Ep integ_ep'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
    absolute_tolerance = 1e-9
    relative_tolerance = 1e-12
  []
[]
"""
    )
    path = str(tmp_path / "model.i")
    m = load_neml2_model(path, "impl")
    system = load_neml2_model(path, "system")

    # 2×2 grid of uniaxial strains: three plastic magnitudes + one elastic
    mag = jnp.asarray([[4e-3, 2.5e-3], [6e-3, 1e-4]])
    E = mag[..., None] * jnp.asarray([1.0, 0, 0, 0, 0, 0])
    dt = 0.1
    env = {
        "forces/E": E,
        "old_state/internal/Ep": jnp.zeros(6),
        "old_state/internal/ep": jnp.asarray(0.0),
        "forces/t": jnp.asarray(dt),
        "old_forces/t": jnp.asarray(0.0),
    }
    out = m.forward(env)
    Ep, ep, S = out["state/internal/Ep"], out["state/internal/ep"], out["state/S"]
    assert Ep.shape == (2, 2, 6) and ep.shape == (2, 2)

    # (a) residuals at the solution vanish
    res = system.forward({**env, "state/internal/Ep": Ep,
                          "state/internal/ep": ep})
    np.testing.assert_allclose(np.asarray(res["residual/internal/Ep"]), 0.0,
                               atol=2e-9)
    np.testing.assert_allclose(np.asarray(res["residual/internal/ep"]), 0.0,
                               atol=2e-9)

    # (c) the elastic point carries no plastic strain; stress is C:E exact
    np.testing.assert_allclose(np.asarray(ep)[1, 1], 0.0, atol=1e-14)
    elas = load_neml2_model(path, "elasticity")
    S_el = elas.forward({"state/internal/Ee": E})["state/S"]
    np.testing.assert_allclose(np.asarray(S)[1, 1], np.asarray(S_el)[1, 1],
                               rtol=1e-12)

    # (b) independent oracle: with Ep_old = 0 and proportional loading the
    # implicit BE system reduces exactly to the scalar radial-return
    # equation g(Δep) = Δep − dt·((svm_tr − 3G·Δep − sy − H·Δep)/η)⁺ⁿ = 0
    # (svm drops 3G·Δep along the fixed flow direction); bisection to 1e-15
    E_mod, nu, sy, H, eta, n_exp = 200e3, 0.3, 100.0, 1000.0, 50.0, 2.0
    G = E_mod / (2 * (1 + nu))
    for idx in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        e = float(mag[idx])
        svm_tr = 2.0 * G * e  # vm stress of a uniaxial-strain elastic trial
        f_tr = svm_tr - sy
        if f_tr <= 0:
            np.testing.assert_allclose(np.asarray(ep)[idx], 0.0, atol=1e-14)
            continue

        def g(d):
            over = max(svm_tr - 3 * G * d - sy - H * d, 0.0) / eta
            return d - dt * over ** n_exp

        lo, hi = 0.0, f_tr / (3 * G + H)
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if g(mid) > 0:
                hi = mid
            else:
                lo = mid
        dep_ref = 0.5 * (lo + hi)
        np.testing.assert_allclose(np.asarray(ep)[idx], dep_ref, rtol=1e-8)
        # plastic strain follows the (fixed) trial flow direction
        dev_e = np.asarray(E[idx]) - np.asarray(
            [e / 3, e / 3, e / 3, 0, 0, 0])
        N_tr = 1.5 * (2 * G * dev_e) / svm_tr
        np.testing.assert_allclose(np.asarray(Ep)[idx], dep_ref * N_tr,
                                   rtol=1e-7, atol=1e-12)


def test_neml2_implicit_update_deck_level(tmp_path):
    """ImplicitUpdate driven through NEML2TensorCompute in a deck: the
    solved state lands in a marlin buffer (scalar ODE with a spatially
    varying initial condition)."""
    from marlin_tpu import hit
    from marlin_tpu.executioner import run_deck
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [rate]
    type = ScalarMultiplication
    from_var = 'state/s'
    to_var = 'state/s_rate'
    coefficient = -4.0
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/s'
  []
  [system]
    type = ComposedModel
    models = 'rate integ'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    (tmp_path / "deck.i").write_text(
        """
[Domain]
  dim = 2
  nx = 4
  ny = 4
  xmax = 1
  ymax = 1
[]
[Problem]
  type = TensorProblem
[]
[TensorBuffers]
  [s0][]
  [t][]
  [t_old][]
  [s][]
[]
[TensorComputes]
  [Initialize]
    [s0]
      type = ParsedCompute
      buffer = s0
      expression = '1+x'
      extra_symbols = true
    []
    [t]
      type = ConstantTensor
      buffer = t
      real = 0.25
    []
    [t_old]
      type = ConstantTensor
      buffer = t_old
      real = 0
    []
    [s]
      type = NEML2TensorCompute
      neml2_input_file = model.i
      neml2_model = impl
      marlin_inputs = 's0 t t_old'
      neml2_inputs = 'old_state/s forces/t old_forces/t'
      neml2_outputs = 'state/s'
      marlin_outputs = 's'
    []
  []
[]
[Executioner]
  type = Transient
  num_steps = 1
[]
"""
    )
    root = hit.load(str(tmp_path / "deck.i"))
    tr = run_deck(root, output_dir=str(tmp_path), deck_dir=str(tmp_path))
    s0 = np.asarray(tr.state["buffers"]["s0"])
    s = np.asarray(tr.state["buffers"]["s"])
    # backward Euler on ṡ = −4s: s = s0/(1 + 4·0.25) = s0/2 (the '1+x'
    # parsed IC stays a broadcastable (nx,1); the solved state is grid-full)
    np.testing.assert_allclose(s, np.broadcast_to(s0, s.shape) / 2.0,
                               atol=1e-12)


def test_neml2_thermal_eigenstrain(tmp_path):
    """ThermalEigenstrain: Eg = alpha*(T - T0)*I on the Mandel axis, fed to
    elasticity through SR2LinearCombination (the standard thermo-elastic
    chain; reference runs it via NEML2's ThermalEigenstrain)."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [eg]
    type = ThermalEigenstrain
    CTE = 1e-5
    reference_temperature = 300
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "eg")
    T = jnp.asarray([[300.0, 400.0], [250.0, 350.0]])
    out = m.forward({"forces/T": T})["forces/Eg"]
    assert out.shape == (2, 2, 6)
    vol = 1e-5 * (np.asarray(T) - 300.0)
    np.testing.assert_allclose(np.asarray(out[..., :3]),
                               np.stack([vol] * 3, axis=-1), atol=1e-15)
    np.testing.assert_allclose(np.asarray(out[..., 3:]), 0.0, atol=0)


def test_neml2_power_law_and_slope_saturation_hardening(tmp_path):
    """PowerLawIsotropicHardening k = K*ep^n and the rate-form
    SlopeSaturationVoceIsotropicHardening kdot = theta*(1 - k/R)*gdot;
    the latter's backward-Euler fixed point saturates at R."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [pl]
    type = PowerLawIsotropicHardening
    hardening_modulus = 200
    exponent = 0.5
  []
  [ssv]
    type = SlopeSaturationVoceIsotropicHardening
    saturated_hardening = 100
    initial_hardening_rate = 1000
  []
[]
"""
    )
    pl = load_neml2_model(str(tmp_path / "model.i"), "pl")
    out = pl.forward({"state/internal/ep": jnp.asarray([0.0, 0.04, 0.09])})
    np.testing.assert_allclose(np.asarray(out["state/internal/k"]),
                               [0.0, 200 * 0.2, 200 * 0.3], atol=1e-12)
    # negative Newton probe stays finite (clamped at 0)
    neg = pl.forward({"state/internal/ep": jnp.asarray(-1e-3)})
    assert float(neg["state/internal/k"]) == 0.0

    ssv = load_neml2_model(str(tmp_path / "model.i"), "ssv")
    out = ssv.forward({"state/internal/k": jnp.asarray(20.0),
                       "state/internal/gamma_rate": jnp.asarray(0.01)})
    np.testing.assert_allclose(np.asarray(out["state/internal/k_rate"]),
                               1000 * (1 - 0.2) * 0.01, atol=1e-12)
    # saturation: zero rate at k = R
    sat = ssv.forward({"state/internal/k": jnp.asarray(100.0),
                       "state/internal/gamma_rate": jnp.asarray(0.01)})
    np.testing.assert_allclose(np.asarray(sat["state/internal/k_rate"]),
                               0.0, atol=1e-12)


def test_neml2_rate_independent_plasticity_fb(tmp_path):
    """RateIndependentPlasticFlowConstraint inside ImplicitUpdate: a scalar
    perfect-plasticity system with unknowns (ep, gamma_rate) and the
    Fischer-Burmeister KKT residual.  Closed form: s = E*(e - ep); plastic
    when E*e > sy with s = sy, ep = e - sy/E; elastic stays exactly
    elastic.  Exercised on a field mixing both branches (the vectorized
    Newton converges per-point)."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [stress]
    type = ScalarLinearCombination
    from_var = 'forces/e state/internal/ep'
    to_var = 'state/internal/s'
    coefficients = '1000.0 -1000.0'
  []
  [yield]
    type = YieldFunction
    stress_measure = 'state/internal/s'
    yield_stress = 5.0
  []
  [eprate]
    type = ScalarLinearCombination
    from_var = 'state/internal/gamma_rate'
    to_var = 'state/internal/ep_rate'
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [fb]
    type = RateIndependentPlasticFlowConstraint
  []
  [system]
    type = ComposedModel
    models = 'stress yield eprate integ fb'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    assert "state/internal/gamma_rate" not in m.from_var
    assert "old_state/internal/gamma_rate" in m.from_var

    e = jnp.asarray([0.004, 0.010, 0.020])  # elastic, plastic, plastic
    out = m.forward({
        "forces/e": e,
        "old_state/internal/ep": jnp.zeros_like(e),
        "old_state/internal/gamma_rate": jnp.zeros_like(e),
        "forces/t": jnp.asarray(1.0),
        "old_forces/t": jnp.asarray(0.0),
    })
    ep = np.asarray(out["state/internal/ep"])
    s = np.asarray(out["state/internal/s"])
    g = np.asarray(out["state/internal/gamma_rate"])
    np.testing.assert_allclose(ep, [0.0, 0.005, 0.015], atol=1e-9)
    np.testing.assert_allclose(s, [4.0, 5.0, 5.0], atol=1e-6)
    np.testing.assert_allclose(g, ep, atol=1e-9)  # dt = 1, ep_old = 0

    # second step from the plastic state with UNLOADING: purely elastic,
    # ep frozen, gamma_rate returns to 0
    out2 = m.forward({
        "forces/e": jnp.asarray([0.004, 0.008, 0.018]),
        "old_state/internal/ep": out["state/internal/ep"],
        "old_state/internal/gamma_rate": out["state/internal/gamma_rate"],
        "forces/t": jnp.asarray(2.0),
        "old_forces/t": jnp.asarray(1.0),
    })
    np.testing.assert_allclose(np.asarray(out2["state/internal/ep"]),
                               ep, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out2["state/internal/s"]),
                               [4.0, 3.0, 3.0], atol=1e-6)

def test_neml2_power_law_implicit_from_virgin(tmp_path):
    """PowerLawIsotropicHardening (n<1) composed INSIDE the rate-independent
    Fischer-Burmeister return map, starting from a virgin state ep_old = 0
    (r04 advisor finding: the jvp of ep**n at ep=0 is infinite for n<1, so
    the ImplicitUpdate Jacobian went inf and every grid point NaN'd on the
    first step).  Closed form for the plastic branch: E*(e-ep) = sy + K*√ep
    → with x = √ep, K x² ... solved exactly via the quadratic formula."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    E, sy, K = 1000.0, 5.0, 100.0
    (tmp_path / "model.i").write_text(
        """
[Models]
  [stress]
    type = ScalarLinearCombination
    from_var = 'forces/e state/internal/ep'
    to_var = 'state/internal/s'
    coefficients = '1000.0 -1000.0'
  []
  [hard]
    type = PowerLawIsotropicHardening
    hardening_modulus = 100.0
    exponent = 0.5
  []
  [yield]
    type = YieldFunction
    stress_measure = 'state/internal/s'
    isotropic_hardening = 'state/internal/k'
    yield_stress = 5.0
  []
  [eprate]
    type = ScalarLinearCombination
    from_var = 'state/internal/gamma_rate'
    to_var = 'state/internal/ep_rate'
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [fb]
    type = RateIndependentPlasticFlowConstraint
  []
  [system]
    type = ComposedModel
    models = 'stress hard yield eprate integ fb'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    e = jnp.asarray([0.004, 0.010, 0.020])  # elastic, plastic, plastic
    out = m.forward({
        "forces/e": e,
        "old_state/internal/ep": jnp.zeros_like(e),
        "old_state/internal/gamma_rate": jnp.zeros_like(e),
        "forces/t": jnp.asarray(1.0),
        "old_forces/t": jnp.asarray(0.0),
    })
    ep = np.asarray(out["state/internal/ep"])
    s = np.asarray(out["state/internal/s"])
    assert np.all(np.isfinite(ep)), f"NaN from virgin-state power-law: {ep}"
    # plastic branch closed form: E(e-ep) = sy + K sqrt(ep); with x=sqrt(ep)
    # E x^2 + K x + (sy - E e) = 0
    def ep_exact(ei):
        if E * ei <= sy:
            return 0.0
        x = (-K + np.sqrt(K * K + 4 * E * (E * ei - sy))) / (2 * E)
        return x * x
    expect = [ep_exact(float(v)) for v in np.asarray(e)]
    np.testing.assert_allclose(ep, expect, atol=1e-9)
    np.testing.assert_allclose(
        s, [E * 0.004] + [sy + K * np.sqrt(v) for v in expect[1:]], atol=1e-6)


def test_neml2_fb_corner_exact_yield(tmp_path):
    """A point loaded EXACTLY to yield (E*e == sy) sits at the
    Fischer-Burmeister corner g = f = 0 where sqrt has an infinite
    derivative (r04 advisor finding: one NaN point froze Newton for the
    whole grid after a single iteration, leaving neighbors at s = 5.0025
    instead of 5.0).  The safe-sqrt plus NaN-robust convergence must leave
    every point converged and finite."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [stress]
    type = ScalarLinearCombination
    from_var = 'forces/e state/internal/ep'
    to_var = 'state/internal/s'
    coefficients = '1000.0 -1000.0'
  []
  [yield]
    type = YieldFunction
    stress_measure = 'state/internal/s'
    yield_stress = 5.0
  []
  [eprate]
    type = ScalarLinearCombination
    from_var = 'state/internal/gamma_rate'
    to_var = 'state/internal/ep_rate'
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [fb]
    type = RateIndependentPlasticFlowConstraint
  []
  [system]
    type = ComposedModel
    models = 'stress yield eprate integ fb'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    # 0.005 is EXACTLY at yield (1000*0.005 == 5.0, representable in fp);
    # neighbors mix elastic and plastic branches
    e = jnp.asarray([0.004, 0.005, 0.010, 0.020])
    out = m.forward({
        "forces/e": e,
        "old_state/internal/ep": jnp.zeros_like(e),
        "old_state/internal/gamma_rate": jnp.zeros_like(e),
        "forces/t": jnp.asarray(1.0),
        "old_forces/t": jnp.asarray(0.0),
    })
    ep = np.asarray(out["state/internal/ep"])
    s = np.asarray(out["state/internal/s"])
    assert np.all(np.isfinite(ep)), f"NaN at the FB corner: {ep}"
    np.testing.assert_allclose(ep, [0.0, 0.0, 0.005, 0.015], atol=1e-9)
    np.testing.assert_allclose(s, [4.0, 5.0, 5.0, 5.0], atol=1e-6)

def test_neml2_power_law_creep(tmp_path):
    """PowerLawCreep gdot = A*(sm/s0)^n: exact values, zero and negative
    stress give zero rate (finite jvp via the safe-pow guard)."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [creep]
    type = PowerLawCreep
    coefficient = 1e-6
    exponent = 5.0
    reference_stress = 100.0
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "creep")
    sm = jnp.asarray([0.0, -50.0, 100.0, 200.0])
    out = m.forward({"state/internal/sm": sm})
    g = np.asarray(out["state/internal/gamma_rate"])
    np.testing.assert_allclose(g, [0.0, 0.0, 1e-6, 1e-6 * 2.0 ** 5],
                               rtol=1e-12)


def test_neml2_implicit_creep_relaxation(tmp_path):
    """PowerLawCreep inside ImplicitUpdate: stress relaxation at constant
    total strain, s = E*(e - ep), epdot = A*s^n.  One backward-Euler step
    verified against an in-test bisection of
    ep1 = dt*A*(E*(e - ep1))^n."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    E, A, n = 1000.0, 1e-4, 3.0
    (tmp_path / "model.i").write_text(
        """
[Models]
  [stress]
    type = ScalarLinearCombination
    from_var = 'forces/e state/internal/ep'
    to_var = 'state/internal/sm'
    coefficients = '1000.0 -1000.0'
  []
  [creep]
    type = PowerLawCreep
    coefficient = 1e-4
    exponent = 3.0
  []
  [eprate]
    type = ScalarLinearCombination
    from_var = 'state/internal/gamma_rate'
    to_var = 'state/internal/ep_rate'
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [system]
    type = ComposedModel
    models = 'stress creep eprate integ'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    e = jnp.asarray([0.002, 0.004])
    out = m.forward({
        "forces/e": e,
        "old_state/internal/ep": jnp.zeros_like(e),
        "forces/t": jnp.asarray(1.0),
        "old_forces/t": jnp.asarray(0.0),
    })
    ep = np.asarray(out["state/internal/ep"])

    def ep_exact(ei):
        lo, hi = 0.0, ei
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            r = mid - A * (E * (ei - mid)) ** n
            lo, hi = (lo, mid) if r > 0 else (mid, hi)
        return 0.5 * (lo + hi)

    np.testing.assert_allclose(
        ep, [ep_exact(float(v)) for v in np.asarray(e)], atol=1e-10)
    np.testing.assert_allclose(np.asarray(out["state/internal/sm"]),
                               E * (np.asarray(e) - ep), rtol=1e-9)


def test_neml2_blackburn_creep(tmp_path):
    """BlackburnCreep gdot = A*sinh(beta*sm)^n exact values."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [creep]
    type = BlackburnCreep
    coefficient = 2e-5
    beta = 0.01
    exponent = 2.0
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "creep")
    sm = jnp.asarray([0.0, 100.0, 300.0])
    g = np.asarray(m.forward({"state/internal/sm": sm})
                   ["state/internal/gamma_rate"])
    np.testing.assert_allclose(
        g, [0.0, 2e-5 * np.sinh(1.0) ** 2, 2e-5 * np.sinh(3.0) ** 2],
        rtol=1e-6)


def test_neml2_damage_softening_chain(tmp_path):
    """IsotropicDamageEffectiveStress + PlasticStrainDamageRate coupled to
    the Fischer-Burmeister return map: yield on sm/(1-d) with d = ep/ef.
    One step from virgin state has the closed form
    ep = (E*e - sy)/(E - sy/ef) (consistency: E*(e-ep) = sy*(1-ep/ef))."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    E, sy, ef = 1000.0, 5.0, 0.1
    (tmp_path / "model.i").write_text(
        """
[Models]
  [stress]
    type = ScalarLinearCombination
    from_var = 'forces/e state/internal/ep'
    to_var = 'state/internal/sm'
    coefficients = '1000.0 -1000.0'
  []
  [eff]
    type = IsotropicDamageEffectiveStress
    damage = 'state/internal/d'
  []
  [yield]
    type = YieldFunction
    stress_measure = 'state/internal/sm_eff'
    yield_stress = 5.0
  []
  [eprate]
    type = ScalarLinearCombination
    from_var = 'state/internal/gamma_rate'
    to_var = 'state/internal/ep_rate'
  []
  [drate]
    type = PlasticStrainDamageRate
    failure_strain = 0.1
  []
  [epinteg]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [dinteg]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/d'
  []
  [fb]
    type = RateIndependentPlasticFlowConstraint
  []
  [system]
    type = ComposedModel
    models = 'stress eff yield eprate drate epinteg dinteg fb'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    e = jnp.asarray([0.004, 0.010])  # elastic, plastic+damaging
    z = jnp.zeros_like(e)
    out = m.forward({
        "forces/e": e,
        "old_state/internal/ep": z,
        "old_state/internal/d": z,
        "old_state/internal/gamma_rate": z,
        "forces/t": jnp.asarray(1.0),
        "old_forces/t": jnp.asarray(0.0),
    })
    ep = np.asarray(out["state/internal/ep"])
    d = np.asarray(out["state/internal/d"])
    ep_pl = (E * 0.010 - sy) / (E - sy / ef)
    np.testing.assert_allclose(ep, [0.0, ep_pl], atol=1e-9)
    np.testing.assert_allclose(d, [0.0, ep_pl / ef], atol=1e-8)
    # softening: the DAMAGED true stress is below the undamaged yield
    s = np.asarray(out["state/internal/sm"])
    assert s[1] < sy
    np.testing.assert_allclose(s[1], sy * (1 - ep_pl / ef), rtol=1e-6)


def test_neml2_gtn_yield_and_cavitation(tmp_path):
    """GTNYieldFunction reduces to normalized J2 at phi=0, matches the
    full formula at phi>0; GursonCavitation gives phidot = (1-phi)*tr(Ep_rate)
    and zero for deviatoric flow."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [gtn]
    type = GTNYieldFunction
    yield_stress = 100.0
    q1 = 1.5
    q2 = 1.2
    q3 = 2.25
  []
  [cav]
    type = GursonCavitation
  []
[]
"""
    )
    gtn = load_neml2_model(str(tmp_path / "model.i"), "gtn")
    se = jnp.asarray([100.0, 150.0])
    skk = jnp.asarray([0.0, 90.0])
    phi = jnp.asarray([0.0, 0.05])
    f = np.asarray(gtn.forward({"state/internal/se": se,
                                "state/internal/skk": skk,
                                "state/internal/phi": phi})
                   ["state/internal/fp"])
    # phi=0, se=sy: exactly on the J2 surface
    np.testing.assert_allclose(f[0], 0.0, atol=1e-12)
    expect = (1.5 ** 2 + 2 * 1.5 * 0.05 * np.cosh(1.2 * 90.0 / 200.0)
              - (1 + 2.25 * 0.05 ** 2))
    np.testing.assert_allclose(f[1], expect, rtol=1e-6)

    cav = load_neml2_model(str(tmp_path / "model.i"), "cav")
    # dilational flow: tr = 0.03; deviatoric flow: tr = 0
    Ep_rate = jnp.asarray([[0.01, 0.01, 0.01, 0.0, 0.0, 0.0],
                           [0.02, -0.01, -0.01, 0.1, 0.0, 0.0]])
    out = cav.forward({"state/internal/phi": jnp.asarray([0.2, 0.2]),
                       "state/internal/Ep_rate": Ep_rate})
    np.testing.assert_allclose(np.asarray(out["state/internal/phi_rate"]),
                               [0.8 * 0.03, 0.0], atol=1e-12)


def test_neml2_variable_rates(tmp_path):
    """Scalar/SR2VariableRate: backward-difference rates."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [srate]
    type = ScalarVariableRate
    variable = 'forces/e'
  []
  [trate]
    type = SR2VariableRate
    variable = 'forces/E'
  []
[]
"""
    )
    srate = load_neml2_model(str(tmp_path / "model.i"), "srate")
    out = srate.forward({"forces/e": jnp.asarray(0.3),
                         "old_forces/e": jnp.asarray(0.1),
                         "forces/t": jnp.asarray(2.0),
                         "old_forces/t": jnp.asarray(1.5)})
    np.testing.assert_allclose(float(out["forces/e_rate"]), 0.4, rtol=1e-12)

    trate = load_neml2_model(str(tmp_path / "model.i"), "trate")
    E1 = jnp.asarray([1.0, 0.0, 0.0, 0.5, 0.0, 0.0])
    E0 = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    out = trate.forward({"forces/E": E1, "old_forces/E": E0,
                         "forces/t": jnp.asarray(1.0),
                         "old_forces/t": jnp.asarray(0.5)})
    np.testing.assert_allclose(np.asarray(out["forces/E_rate"]),
                               [2.0, 0, 0, 1.0, 0, 0], rtol=1e-12)

def test_neml2_crystal_schmid_geometry(tmp_path):
    """FCC/BCC slip geometry: 12 systems each, traceless Schmid tensors
    with Mandel self-contraction 1/2 (orthonormal d, n)."""
    from marlin_tpu.computes.neml2 import load_neml2_model

    (tmp_path / "model.i").write_text(
        """
[Models]
  [fcc]
    type = ResolvedShear
  []
  [bcc]
    type = ResolvedShear
    crystal_class = BCC
  []
[]
"""
    )
    for name in ("fcc", "bcc"):
        m = load_neml2_model(str(tmp_path / "model.i"), name)
        P = m.P
        assert P.shape == (12, 6), name
        np.testing.assert_allclose(P[:, :3].sum(axis=1), 0.0, atol=1e-12)
        np.testing.assert_allclose((P * P).sum(axis=1), 0.5, atol=1e-12)


def test_neml2_resolved_shear_schmid_factors(tmp_path):
    """Uniaxial stress along z on an unrotated FCC crystal: the resolved
    shears are sigma times the Schmid factors — 8 systems at the maximal
    1/sqrt(6), 4 inactive."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        "[Models]\n  [rs]\n    type = ResolvedShear\n  []\n[]\n"
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "rs")
    sigma = 100.0
    M = jnp.asarray([0.0, 0.0, sigma, 0.0, 0.0, 0.0])
    tau = np.sort(np.abs(np.asarray(
        m.forward({"state/internal/M": M})
        ["state/internal/resolved_shears"])))
    np.testing.assert_allclose(tau[:4], 0.0, atol=1e-9)
    np.testing.assert_allclose(tau[4:], sigma / np.sqrt(6.0), rtol=1e-12)

    # rotation invariance of the ACTIVITY SPECTRUM: rotating crystal and
    # load together must reproduce the same sorted shears — here just
    # check a rotated crystal still has 12 finite shears bounded by
    # sigma/2 (max possible Schmid factor)
    (tmp_path / "rot.i").write_text(
        """
[Models]
  [rs]
    type = ResolvedShear
    euler_angles = '0.3 0.7 1.1'
  []
[]
"""
    )
    mr = load_neml2_model(str(tmp_path / "rot.i"), "rs")
    taur = np.asarray(mr.forward({"state/internal/M": M})
                      ["state/internal/resolved_shears"])
    assert np.all(np.abs(taur) <= sigma / 2 + 1e-9)


def test_neml2_crystal_plasticity_rate_chain(tmp_path):
    """Full single-crystal rate chain at fixed stress: ResolvedShear ->
    SingleSlipStrengthMap -> PowerLawSlipRule -> SumSlipRates ->
    VoceSingleSlipHardening + PlasticDeformationRate, verified against a
    numpy reimplementation; plastic flow is traceless (slip preserves
    volume)."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [rs]
    type = ResolvedShear
  []
  [map]
    type = SingleSlipStrengthMap
    constant_strength = 50.0
  []
  [rule]
    type = PowerLawSlipRule
    gamma0 = 1e-3
    n = 8.0
  []
  [ssr]
    type = SumSlipRates
  []
  [voce]
    type = VoceSingleSlipHardening
    initial_slope = 500.0
    saturated_hardening = 30.0
  []
  [pdr]
    type = PlasticDeformationRate
  []
  [chain]
    type = ComposedModel
    models = 'rs map rule ssr voce pdr'
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "chain")
    M = jnp.asarray([10.0, -5.0, 80.0, 3.0, 0.0, 7.0])
    hard = jnp.asarray(10.0)
    out = m.forward({"state/internal/M": M,
                     "state/internal/slip_hardening": hard})

    P = load_neml2_model(str(tmp_path / "model.i"), "rs").P  # (12, 6)
    tau = np.asarray(M) @ P.T
    g = 50.0 + 10.0
    x = tau / g
    rates = 1e-3 * np.sign(x) * np.abs(x) ** 8
    np.testing.assert_allclose(
        np.asarray(out["state/internal/slip_rates"]), rates, rtol=1e-5)
    np.testing.assert_allclose(
        float(out["state/internal/sum_slip_rates"]),
        np.sum(np.abs(rates)), rtol=1e-5)
    np.testing.assert_allclose(
        float(out["state/internal/slip_hardening_rate"]),
        500.0 * (1 - 10.0 / 30.0) * np.sum(np.abs(rates)), rtol=1e-5)
    Ep_rate = np.asarray(out["state/internal/Ep_rate"])
    np.testing.assert_allclose(Ep_rate, rates @ P, rtol=1e-5)
    np.testing.assert_allclose(Ep_rate[:3].sum(), 0.0, atol=1e-10)


def test_neml2_crystal_implicit_hardening(tmp_path):
    """Implicit (backward-Euler) integration of the single slip strength
    inside ImplicitUpdate at fixed stress: tau_bar1 solves
    tau_bar1 = tau_bar0 + dt*theta0*(1 - tau_bar1/tau_f)*S(tau_bar1),
    verified against an in-test fixed-point iteration."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [rs]
    type = ResolvedShear
  []
  [map]
    type = SingleSlipStrengthMap
    constant_strength = 50.0
  []
  [rule]
    type = PowerLawSlipRule
    gamma0 = 1e-3
    n = 8.0
  []
  [ssr]
    type = SumSlipRates
  []
  [voce]
    type = VoceSingleSlipHardening
    initial_slope = 500.0
    saturated_hardening = 30.0
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/slip_hardening'
  []
  [system]
    type = ComposedModel
    models = 'rs map rule ssr voce integ'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    M = jnp.asarray([0.0, 0.0, 120.0, 0.0, 0.0, 0.0])
    out = m.forward({
        "state/internal/M": M,
        "old_state/internal/slip_hardening": jnp.asarray(2.0),
        "forces/t": jnp.asarray(1.0),
        "old_forces/t": jnp.asarray(0.0),
    })
    got = float(out["state/internal/slip_hardening"])

    P = load_neml2_model(str(tmp_path / "model.i"), "rs").P

    def S(tb):
        tau = np.asarray(M) @ P.T
        x = tau / (50.0 + tb)
        return np.sum(np.abs(1e-3 * np.sign(x) * np.abs(x) ** 8))

    tb = 2.0
    for _ in range(200):
        tb = 2.0 + 1.0 * 500.0 * (1 - tb / 30.0) * S(tb)
    np.testing.assert_allclose(got, tb, rtol=1e-6)

def test_neml2_mixed_control_setup(tmp_path):
    """MixedControlSetup + SR2EqualityConstraint inside ImplicitUpdate:
    stress-controlled loading of linear elasticity recovers the
    compliance solution (uniaxial: E_xx = s/E, E_yy = E_zz = -nu*s/E);
    a mixed strain/stress-controlled case stores the complementary
    stress in mixed_state."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [setup]
    type = MixedControlSetup
    control = '1 1 1 1 1 1'
  []
  [elast]
    type = LinearIsotropicElasticity
    strain = 'forces/E'
    stress = 'state/S'
    coefficients = '1000.0 0.3'
    coefficient_types = 'YOUNGS_MODULUS POISSONS_RATIO'
  []
  [close]
    type = SR2EqualityConstraint
    variable = 'state/mixed_state'
    a = 'state/S'
    b = 'state/S_target'
  []
  [system]
    type = ComposedModel
    models = 'setup elast close'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    sigma = 100.0
    fixed = jnp.asarray([sigma, 0.0, 0.0, 0.0, 0.0, 0.0])
    out = m.forward({
        "forces/fixed_values": fixed,
        "old_state/mixed_state": jnp.zeros(6),
    })
    E = np.asarray(out["forces/E"])
    np.testing.assert_allclose(
        E, [0.1, -0.03, -0.03, 0, 0, 0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(out["state/S"]),
                               np.asarray(fixed), atol=1e-6)

    # mixed: xx strain-controlled at 0.1, the rest stress-controlled at 0
    (tmp_path / "mixed.i").write_text(
        (tmp_path / "model.i").read_text().replace(
            "control = '1 1 1 1 1 1'", "control = '0 1 1 1 1 1'")
    )
    m2 = load_neml2_model(str(tmp_path / "mixed.i"), "impl")
    fixed2 = jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.0, 0.0])
    out2 = m2.forward({
        "forces/fixed_values": fixed2,
        "old_state/mixed_state": jnp.zeros(6),
    })
    np.testing.assert_allclose(np.asarray(out2["forces/E"]),
                               [0.1, -0.03, -0.03, 0, 0, 0], atol=1e-8)
    # mixed_state holds the complementary stress on the strain-controlled
    # component (S_xx = 100) and the strains elsewhere
    ms = np.asarray(out2["state/mixed_state"])
    np.testing.assert_allclose(ms[0], sigma, rtol=1e-6)
    np.testing.assert_allclose(ms[1:3], [-0.03, -0.03], atol=1e-8)

def test_neml2_olevsky_sintering_stress(tmp_path):
    """OlevskySinteringStress ss = 3*(gamma/r0)*(1-phi)^2 exact values,
    and the free-sintering sign: feeding skk + 3*ss into the GTN surface
    at zero applied stress gives f > 0 (densification driving force)."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [ss]
    type = OlevskySinteringStress
    surface_tension = 2.0
    particle_radius = 0.5
  []
  [gtn]
    type = GTNYieldFunction
    yield_stress = 1.0
    q1 = 1.0
    q2 = 1.0
    q3 = 1.0
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "ss")
    phi = jnp.asarray([0.0, 0.3])
    ss = np.asarray(m.forward({"state/internal/phi": phi})
                    ["state/internal/ss"])
    np.testing.assert_allclose(ss, [12.0, 12.0 * 0.49], rtol=1e-12)

    gtn = load_neml2_model(str(tmp_path / "model.i"), "gtn")
    f = gtn.forward({"state/internal/se": jnp.asarray(0.0),
                     "state/internal/skk": jnp.asarray(3.0 * float(ss[1])),
                     "state/internal/phi": jnp.asarray(0.3)})
    assert float(f["state/internal/fp"]) > 0.0

def test_neml2_implicit_inf_residual_point_isolated(tmp_path):
    """One grid point whose residual overflows to +inf (BlackburnCreep
    sinh at extreme stress) must not freeze Newton grid-wide (r05 review:
    the NaN-robust convergence guard did not cover inf — tol became inf
    and every point silently returned the unconverged seed)."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    E, A, beta, n = 1000.0, 1e-4, 1.0, 3.0
    (tmp_path / "model.i").write_text(
        """
[Models]
  [stress]
    type = ScalarLinearCombination
    from_var = 'forces/e state/internal/ep'
    to_var = 'state/internal/sm'
    coefficients = '1000.0 -1000.0'
  []
  [creep]
    type = BlackburnCreep
    coefficient = 1e-4
    beta = 1.0
    exponent = 3.0
  []
  [eprate]
    type = ScalarLinearCombination
    from_var = 'state/internal/gamma_rate'
    to_var = 'state/internal/ep_rate'
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [system]
    type = ComposedModel
    models = 'stress creep eprate integ'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "impl")
    # point 1's stress is 1000*1e6: sinh overflows to inf at the seed
    e = jnp.asarray([0.002, 1e6])
    out = m.forward({
        "forces/e": e,
        "old_state/internal/ep": jnp.zeros_like(e),
        "forces/t": jnp.asarray(1.0),
        "old_forces/t": jnp.asarray(0.0),
    })
    ep = np.asarray(out["state/internal/ep"])

    def resid(x):
        return x - A * np.sinh(beta * E * (0.002 - x)) ** n

    lo, hi = 0.0, 0.002
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        lo, hi = (lo, mid) if resid(mid) > 0 else (mid, hi)
    # the healthy point converged to the closed form (NOT the ep=0 seed)
    assert ep[0] > 0.0
    np.testing.assert_allclose(ep[0], 0.5 * (lo + hi), atol=1e-10)
    # the overflowed point surfaces non-finite state rather than a
    # plausible-looking unconverged value
    assert not np.isfinite(ep[1]) or not np.isfinite(
        np.asarray(out["state/internal/sm"])[1])

def test_neml2_mrp_rotation_matrix():
    """Modified-Rodrigues rotation: r = tan(theta/4)*axis reproduces the
    axis-angle rotation matrix exactly."""
    from marlin_tpu.computes.neml2 import _mrp_rotation
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    for _ in range(5):
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        theta = rng.uniform(-2.5, 2.5)
        r = np.tan(theta / 4.0) * axis
        R = np.asarray(_mrp_rotation(jnp.asarray(r)))
        # Rodrigues axis-angle
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R_exact = (np.eye(3) + np.sin(theta) * K
                   + (1 - np.cos(theta)) * (K @ K))
        np.testing.assert_allclose(R, R_exact, atol=1e-12)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_neml2_resolved_shear_orientation_state(tmp_path):
    """ResolvedShear with a per-point MRP orientation state: zero MRP
    matches the baked geometry; MRP(theta about z) matches the
    euler_angles=(theta,0,0) baked version at every point."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    theta = 0.6
    (tmp_path / "model.i").write_text(
        f"""
[Models]
  [baked]
    type = ResolvedShear
    euler_angles = '{theta} 0 0'
  []
  [tex]
    type = ResolvedShear
    orientation = 'state/orientation'
  []
[]
"""
    )
    baked = load_neml2_model(str(tmp_path / "model.i"), "baked")
    tex = load_neml2_model(str(tmp_path / "model.i"), "tex")
    M = jnp.asarray([[0.0, 0.0, 100.0, 0.0, 0.0, 0.0],
                     [30.0, -10.0, 50.0, 5.0, 2.0, 1.0]])

    # zero orientation == unrotated crystal
    zero = jnp.zeros((2, 3))
    (tmp_path / "plain.i").write_text(
        "[Models]\n  [rs]\n    type = ResolvedShear\n  []\n[]\n")
    plain = load_neml2_model(str(tmp_path / "plain.i"), "rs")
    np.testing.assert_allclose(
        np.asarray(tex.forward({"state/internal/M": M,
                                "state/orientation": zero})
                   ["state/internal/resolved_shears"]),
        np.asarray(plain.forward({"state/internal/M": M})
                   ["state/internal/resolved_shears"]), atol=1e-12)

    # MRP rotation about z == Bunge (theta, 0, 0)
    r = jnp.asarray([0.0, 0.0, np.tan(theta / 4.0)])
    rb = jnp.broadcast_to(r, (2, 3))
    np.testing.assert_allclose(
        np.asarray(tex.forward({"state/internal/M": M,
                                "state/orientation": rb})
                   ["state/internal/resolved_shears"]),
        np.asarray(baked.forward({"state/internal/M": M})
                   ["state/internal/resolved_shears"]), atol=1e-9)


def test_neml2_plastic_vorticity_and_orientation_rate(tmp_path):
    """PlasticVorticity w = 0.5*sum gdot*(d x n) against numpy;
    OrientationRate: rdot = omega/4 at r=0 and the exact fixed-axis
    radial form rdot = (1+r^2)*omega/4."""
    from marlin_tpu.computes.neml2 import load_neml2_model, _slip_geometry
    from marlin_tpu.params import Params
    from marlin_tpu import hit
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [wp]
    type = PlasticVorticity
  []
  [orate]
    type = OrientationRate
  []
[]
"""
    )
    wp = load_neml2_model(str(tmp_path / "model.i"), "wp")
    rates = jnp.asarray(np.linspace(-1e-3, 1e-3, 12))
    out = wp.forward({"state/internal/slip_rates": rates})
    w = np.asarray(out["state/internal/plastic_vorticity"])
    d, n = wp.dirs, wp.normals
    # TRUE axial convention (W v = w x v): -1/2 d x n per system, checked
    # against a direct tensor construction rather than the model's own
    # formula (r05 review: a mirrored expected value hid a sign error)
    expect = np.zeros(3)
    for a in range(12):
        W = 0.5 * (np.outer(d[a], n[a]) - np.outer(n[a], d[a]))
        wa = np.array([W[2, 1], W[0, 2], W[1, 0]])  # axial of a skew W
        expect += float(rates[a]) * wa
    np.testing.assert_allclose(w, expect, atol=1e-12)
    # cross-check the identity itself on one system
    v = np.array([0.3, -0.2, 0.7])
    W0 = 0.5 * (np.outer(d[0], n[0]) - np.outer(n[0], d[0]))
    np.testing.assert_allclose(W0 @ v,
                               np.cross(-0.5 * np.cross(d[0], n[0]), v),
                               atol=1e-12)

    orate = load_neml2_model(str(tmp_path / "model.i"), "orate")
    wvec = jnp.asarray([0.0, 0.0, 0.02])
    # r = 0: rdot = omega/4 = -wp/4
    out = orate.forward({"state/orientation": jnp.zeros(3),
                         "state/internal/plastic_vorticity": wvec})
    np.testing.assert_allclose(np.asarray(out["state/orientation_rate"]),
                               [0, 0, -0.005], atol=1e-15)
    # fixed axis r || omega: rdot = (1+|r|^2)*omega/4
    r0 = jnp.asarray([0.0, 0.0, 0.3])
    out = orate.forward({"state/orientation": r0,
                         "state/internal/plastic_vorticity": wvec})
    np.testing.assert_allclose(np.asarray(out["state/orientation_rate"]),
                               [0, 0, -0.02 / 4 * (1 + 0.09)], atol=1e-12)


def test_neml2_texture_evolution_single_slip(tmp_path):
    """Forward-Euler texture evolution under constant single slip: the
    lattice rotates about -(d x n) at omega = gdot/2, so after time t the
    MRP magnitude is tan(gdot*t/8) along that axis (theta = gdot*t/2)."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [wp]
    type = PlasticVorticity
  []
  [orate]
    type = OrientationRate
  []
  [integ]
    type = VecForwardEulerTimeIntegration
    variable = 'state/orientation'
  []
  [chain]
    type = ComposedModel
    models = 'wp orate integ'
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "chain")
    gdot = 0.02
    rates = np.zeros(12)
    rates[0] = gdot  # single active system
    wp_model = load_neml2_model(str(tmp_path / "model.i"), "wp")
    # lattice spin omega = -w_p = +1/2 gdot (d x n): the crystal rotates
    # ABOUT +d x n (counter-rotation against the plastic spin)
    axis = 0.5 * np.cross(wp_model.dirs[0], wp_model.normals[0])
    axis_hat = axis / np.linalg.norm(axis)

    r = jnp.zeros(3)
    dt, steps = 0.05, 200
    for k in range(steps):
        out = m.forward({
            "state/internal/slip_rates": jnp.asarray(rates),
            "old_state/orientation": r,
            "state/orientation": r,  # rate evaluated at current state
            "forces/t": jnp.asarray((k + 1) * dt),
            "old_forces/t": jnp.asarray(k * dt),
        })
        r = out["state/orientation"]
    theta = gdot * dt * steps / 2.0
    expect = np.tan(theta / 4.0) * axis_hat
    np.testing.assert_allclose(np.asarray(r), expect, rtol=2e-3)

def test_neml2_fracture_coupling_models(tmp_path):
    """PowerDegradationFunction and StrainEnergyDensity: exact values,
    and the Miehe spectral split — uniaxial (nu-free) tension is all
    psi+, compression all psi-, and the split always sums to >= the
    deviatoric part with psi+ + psi- == psi_full for lambda >= 0 strains
    of one sign."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [g]
    type = PowerDegradationFunction
    residual = 0.001
  []
  [psi]
    type = StrainEnergyDensity
    lambda = 100.0
    mu = 50.0
  []
  [psis]
    type = StrainEnergyDensity
    lambda = 100.0
    mu = 50.0
    decomposition = SPECTRAL
  []
[]
"""
    )
    g = load_neml2_model(str(tmp_path / "model.i"), "g")
    out = g.forward({"state/d": jnp.asarray([0.0, 0.5, 1.0])})
    np.testing.assert_allclose(
        np.asarray(out["state/internal/g"]),
        [1.0, 0.25 * 0.999 + 0.001, 0.001], rtol=1e-12)

    lam, mu = 100.0, 50.0
    e = 0.01
    # uniaxial strain state [e,0,0,...]: tr = e
    E = jnp.asarray([e, 0.0, 0.0, 0.0, 0.0, 0.0])
    psi = load_neml2_model(str(tmp_path / "model.i"), "psi")
    full = float(psi.forward({"forces/E": E})["state/internal/psi"])
    np.testing.assert_allclose(full, 0.5 * lam * e * e + mu * e * e,
                               rtol=1e-12)

    psis = load_neml2_model(str(tmp_path / "model.i"), "psis")
    out = psis.forward({"forces/E": E})
    np.testing.assert_allclose(float(out["state/internal/psi"]), full,
                               rtol=1e-9)
    np.testing.assert_allclose(
        float(out["state/internal/psi_inactive"]), 0.0, atol=1e-12)
    # pure compression: everything inactive
    out = psis.forward({"forces/E": -E})
    np.testing.assert_allclose(float(out["state/internal/psi"]), 0.0,
                               atol=1e-12)
    np.testing.assert_allclose(
        float(out["state/internal/psi_inactive"]), full, rtol=1e-9)
    # mixed state with shear: psi+ + psi- >= mu-part, both nonnegative,
    # and rotating the strain leaves the split invariant (eigh-based)
    Em = jnp.asarray([0.01, -0.004, 0.0, 0.0, 0.0, 0.5 * 0.006])
    out = psis.forward({"forces/E": Em})
    pp, pn = (float(out["state/internal/psi"]),
              float(out["state/internal/psi_inactive"]))
    assert pp > 0.0 and pn > 0.0

def test_neml2_spectral_split_jvp_finite_at_degeneracy(tmp_path):
    """StrainEnergyDensity SPECTRAL must stay differentiable at repeated
    eigenvalues (virgin E=0 is triply degenerate, uniaxial doubly) — the
    eigenvalue-only jvp has no 1/(lam_i - lam_j) term, unlike full eigh
    (r05 review follow-up: pins the property so a refactor to
    jnp.linalg.eigh would be caught)."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    import jax
    import jax.numpy as jnp

    (tmp_path / "model.i").write_text(
        """
[Models]
  [psis]
    type = StrainEnergyDensity
    lambda = 100.0
    mu = 50.0
    decomposition = SPECTRAL
  []
[]
"""
    )
    m = load_neml2_model(str(tmp_path / "model.i"), "psis")

    def f(E):
        out = m.forward({"forces/E": E})
        return (out["state/internal/psi"]
                + out["state/internal/psi_inactive"])

    for E in ([0.0] * 6,                      # triple degeneracy
              [0.01, 0, 0, 0, 0, 0],          # double (two zero eigs)
              [0.01, 0.01, 0.01, 0, 0, 0]):   # triple, nonzero
        E = jnp.asarray(E)
        tangent = jnp.ones(6)
        _, t = jax.jvp(f, (E,), (tangent,))
        assert np.isfinite(float(t)), (E, t)


def test_neml2_kocks_mecking_closed_form(tmp_path):
    """Kocks-Mecking family: each output against its closed form, plus
    the defining consistency of the framework — the FlowViscosity /
    RateSensitivity pair must reproduce the KM rate-dependent line
    sigma_f = mu*exp(A*g + B) exactly when fed the ActivationEnergy
    output (the three formulas are one diagram)."""
    import jax.numpy as jnp
    from marlin_tpu.computes.neml2 import load_neml2_model

    k, b, eps0 = 1.380649e-23, 2.5e-10, 1e10
    A, B = -0.4, -3.0
    mu = 60.0e9
    (tmp_path / "model.i").write_text(f"""
[Models]
  [g]
    type = KocksMeckingActivationEnergy
    shear_modulus = {mu}
    burgers_vector = {b}
    reference_strain_rate = {eps0}
  []
  [n]
    type = KocksMeckingRateSensitivity
    shear_modulus = {mu}
    burgers_vector = {b}
    A = {A}
  []
  [eta]
    type = KocksMeckingFlowViscosity
    shear_modulus = {mu}
    burgers_vector = {b}
    reference_strain_rate = {eps0}
    A = {A}
    B = {B}
  []
  [sy]
    type = KocksMeckingYieldStress
    shear_modulus = {mu}
    C = -4.0
  []
[]
""")
    path = str(tmp_path / "model.i")
    T = jnp.asarray([300.0, 600.0])
    rate = jnp.asarray([1e-3, 1e-5])

    g = load_neml2_model(path, "g").forward(
        {"forces/T": T, "state/internal/ep_rate": rate}
    )["state/internal/g"]
    g_exp = k * T / (mu * b**3) * np.log(eps0 / rate)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_exp), rtol=1e-6)

    n = load_neml2_model(path, "n").forward(
        {"forces/T": T})["state/internal/n"]
    np.testing.assert_allclose(
        np.asarray(n), -mu * b**3 / (k * np.asarray(T) * A), rtol=1e-6)

    eta = load_neml2_model(path, "eta").forward(
        {"forces/T": T})["state/internal/eta"]
    np.testing.assert_allclose(
        np.asarray(eta),
        np.exp(B) * mu * eps0 ** (-1.0 / np.asarray(n)), rtol=1e-6)

    sy = load_neml2_model(path, "sy").forward({})["state/internal/sy"]
    np.testing.assert_allclose(float(sy), np.exp(-4.0) * mu, rtol=1e-12)

    # the diagram closes: eta * rate^(1/n) == mu * exp(A*g + B)
    sigma_f = np.asarray(eta) * np.asarray(rate) ** (1.0 / np.asarray(n))
    np.testing.assert_allclose(
        sigma_f, mu * np.exp(A * np.asarray(g) + B), rtol=1e-5)

    # virgin state: rate = 0 floors to rate_floor -> finite g, finite jvp
    import jax

    mdl = load_neml2_model(path, "g")

    def g_of_rate(r):
        return mdl.forward({"forces/T": T[:1],
                            "state/internal/ep_rate": r})["state/internal/g"]

    val, tan = jax.jvp(g_of_rate, (jnp.zeros(1),), (jnp.ones(1),))
    assert np.all(np.isfinite(np.asarray(val)))
    assert np.all(np.isfinite(np.asarray(tan)))


def test_neml2_kocks_mecking_flow_switch(tmp_path):
    """FlowSwitch blends the two regimes across g0 = (C-B)/A: deep in
    each regime it returns that regime's rate, at g0 exactly the
    average; a variable shear modulus exercises the mu-as-input path of
    the companion models."""
    import jax.numpy as jnp
    from marlin_tpu.computes.neml2 import load_neml2_model

    A, B, C = -0.5, -3.0, -4.5
    g0 = (C - B) / A  # = 3.0
    (tmp_path / "model.i").write_text(f"""
[Models]
  [switch]
    type = KocksMeckingFlowSwitch
    A = {A}
    B = {B}
    C = {C}
    sharpness = 500
  []
  [sy_var_mu]
    type = KocksMeckingYieldStress
    shear_modulus = state/mu
    C = {C}
  []
[]
""")
    path = str(tmp_path / "model.i")
    sw = load_neml2_model(path, "switch")
    g = jnp.asarray([g0 - 1.0, g0, g0 + 1.0])
    ri = jnp.full(3, 2.0)
    rd = jnp.full(3, 10.0)
    out = sw.forward({"state/internal/g": g,
                      "state/internal/gamma_rate_ri": ri,
                      "state/internal/gamma_rate_rd": rd}
                     )["state/internal/gamma_rate"]
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], 2.0, atol=1e-6)   # rate-independent
    np.testing.assert_allclose(out[1], 6.0, atol=1e-6)   # exact crossover
    np.testing.assert_allclose(out[2], 10.0, atol=1e-6)  # rate-dependent

    sy = load_neml2_model(path, "sy_var_mu").forward(
        {"state/mu": jnp.asarray([50.0e9, 40.0e9])})["state/internal/sy"]
    np.testing.assert_allclose(
        np.asarray(sy), np.exp(C) * np.asarray([50.0e9, 40.0e9]), rtol=1e-6)


def test_neml2_kocks_mecking_perzyna_chain(tmp_path):
    """The KM pair drives Perzyna viscoplasticity: reference_stress and
    exponent as VARIABLES (eta(T) from KocksMeckingFlowViscosity, n(T)
    from KocksMeckingRateSensitivity) inside one ComposedModel —
    gamma_rate == (f/eta(T))^n(T) closed-form at two temperatures."""
    import jax.numpy as jnp
    from marlin_tpu.computes.neml2 import load_neml2_model

    k, b, eps0 = 1.380649e-23, 2.5e-10, 1e6
    A, B = -1.0, -2.0
    mu = 10.0e9
    (tmp_path / "model.i").write_text(f"""
[Models]
  [n]
    type = KocksMeckingRateSensitivity
    shear_modulus = {mu}
    burgers_vector = {b}
    A = {A}
    rate_sensitivity = 'state/internal/n'
  []
  [eta]
    type = KocksMeckingFlowViscosity
    shear_modulus = {mu}
    burgers_vector = {b}
    reference_strain_rate = {eps0}
    A = {A}
    B = {B}
    flow_viscosity = 'state/internal/eta'
  []
  [flow]
    type = PerzynaPlasticFlowRate
    reference_stress = 'state/internal/eta'
    exponent = 'state/internal/n'
  []
  [chain]
    type = ComposedModel
    models = 'n eta flow'
  []
[]
""")
    m = load_neml2_model(str(tmp_path / "model.i"), "chain")
    T = jnp.asarray([800.0, 1200.0])
    f = jnp.asarray([2.0e8, 2.0e8])
    out = m.forward({"forces/T": T, "state/internal/fp": f})
    n = -mu * b**3 / (k * np.asarray(T) * A)
    eta = np.exp(B) * mu * eps0 ** (-1.0 / n)
    np.testing.assert_allclose(
        np.asarray(out["state/internal/gamma_rate"]),
        (np.asarray(f) / eta) ** n, rtol=1e-5)
    # hotter -> lower n, lower eta -> faster flow at equal overstress
    rates = np.asarray(out["state/internal/gamma_rate"])
    assert rates[1] > rates[0]


def test_neml2_kocks_mecking_zero_slope_errors(tmp_path):
    """A = 0 (divides the rate sensitivity / locates g0) is a named
    load-time error, not a runtime inf."""
    from marlin_tpu.computes.neml2 import load_neml2_model
    from marlin_tpu.params import ParamError

    (tmp_path / "model.i").write_text("""
[Models]
  [n]
    type = KocksMeckingRateSensitivity
    shear_modulus = 1e9
    burgers_vector = 2.5e-10
    A = 0
  []
[]
""")
    with pytest.raises(ParamError, match="nonzero"):
        load_neml2_model(str(tmp_path / "model.i"), "n")
