"""Regression tests for the round-2 continuation review findings:
postprocess-chain FFTMechanics Newton diagnostics, checkpointed
INITIAL-only aux caches, non-INITIAL execute_on aux sampling, SOFT
Terminator with a constant-dt stepper, and xdmfdiff time pairing on
tightly-spaced series."""

import numpy as np
import pytest

from marlin_tpu import hit
from marlin_tpu.executioner import Transient
from marlin_tpu.problem import TensorProblem

REF = "/root/reference"


# ---------------------------------------------------------------------------
# FFTMechanics Newton-exhaustion flags must be observed in the POSTPROCESS
# chain too (they only exist in the pp-pass buffer dict, not the stepped
# state — reference FFTMechanics.C hard-errors regardless of which chain
# hosts the compute)

_PP_MECH_ARGS = [
    # an independent steady mechanics solve in the Postprocess chain,
    # deliberately unable to converge in one iteration
    "TensorComputes/Postprocess/he2/type=HyperElasticIsotropic",
    "TensorComputes/Postprocess/he2/buffer=stress2",
    "TensorComputes/Postprocess/he2/F=Fpp",
    "TensorComputes/Postprocess/he2/K=K",
    "TensorComputes/Postprocess/he2/mu=mu",
    "TensorComputes/Postprocess/ppmech/type=FFTMechanics",
    "TensorComputes/Postprocess/ppmech/buffer=Fpp",
    "TensorComputes/Postprocess/ppmech/F=F",
    "TensorComputes/Postprocess/ppmech/K=K",
    "TensorComputes/Postprocess/ppmech/mu=mu",
    "TensorComputes/Postprocess/ppmech/constitutive_model=he2",
    "TensorComputes/Postprocess/ppmech/stress=stress2",
    "TensorComputes/Postprocess/ppmech/applied_macroscopic_strain=applied_strain",
    "TensorComputes/Postprocess/ppmech/nl_max_its=1",
    "TensorComputes/Postprocess/ppmech/nl_rel_tol=1e-30",
    "TensorComputes/Postprocess/ppmech/nl_abs_tol=1e-30",
]


def _pp_mech_problem():
    root = hit.load(f"{REF}/test/tests/mechanics/mech.i", _PP_MECH_ARGS)
    return TensorProblem(root)


def test_pp_chain_newton_exhaustion_raises_fused():
    p = _pp_mech_problem()
    s = p.init_state()
    # the ppmech flag must be among the tracked diagnostics
    assert any("ppmech" in k for k in p.newton_diag_keys())
    with pytest.raises(RuntimeError, match="[Nn]onlinear iterations"):
        p.step_with_pps(s, 0.0, 0.02, 0.0, first_step=True)


def test_pp_chain_newton_exhaustion_raises_unfused():
    """With fuse_pps=False the pp chain runs at output time
    (run_postprocess_computes) — exhaustion must surface there."""
    p = _pp_mech_problem()
    p.fuse_pps = False
    s = p.init_state()
    s = p.step(s, 0.0, 0.02, 0.0, first_step=True)
    with pytest.raises(RuntimeError, match="[Nn]onlinear iterations"):
        p.run_postprocess_computes(s, 0.02)


# ---------------------------------------------------------------------------
# aux execute_on semantics: only a kernel restricted to INITIAL freezes its
# first sample; any other flag set samples live

_AUX_DECK = """
[Domain]
  dim = 2
  nx = 4
  ny = 4
  xmax = 1
  ymax = 1
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ConstantTensor
      buffer = c
      real = 3
    []
  []
[]
[Problem]
  type = TensorProblem
[]
[AuxVariables]
  [c_aux]
    order = CONSTANT
    family = MONOMIAL
  []
[]
[AuxKernels]
  [proj]
    type = ProjectTensorAux
    variable = c_aux
    buffer = c
    execute_on = '{flags}'
  []
[]
"""


def _aux_problem(flags):
    root = hit.parse(_AUX_DECK.format(flags=flags))
    hit.expand_braces(root)
    return TensorProblem(root)


@pytest.mark.parametrize("flags", ["FINAL", "TIMESTEP_BEGIN",
                                   "INITIAL TIMESTEP_END"])
def test_aux_non_initial_flags_sample_live(flags):
    """execute_on=FINAL (or any non-INITIAL-only set) must NOT freeze the
    t=0 sample (regression: any set lacking TIMESTEP_END was cached)."""
    p = _aux_problem(flags)
    s = p.init_state()
    p.aux.seed_initial(s)
    s2 = {**s, "buffers": {**s["buffers"], "c": s["buffers"]["c"] * 0 + 9.0}}
    assert np.allclose(p.aux.values(s2, "c_aux"), 9.0)


def test_aux_initial_only_still_frozen():
    p = _aux_problem("INITIAL")
    s = p.init_state()
    p.aux.seed_initial(s)
    s2 = {**s, "buffers": {**s["buffers"], "c": s["buffers"]["c"] * 0 + 9.0}}
    assert np.allclose(p.aux.values(s2, "c_aux"), 3.0)


# ---------------------------------------------------------------------------
# checkpoint/resume must preserve the INITIAL-only aux cache (the t=0 state
# is unrecoverable after resume)


def test_checkpoint_preserves_initial_aux_cache(tmp_path):
    deck = _AUX_DECK.format(flags="INITIAL") + """
[Executioner]
  type = Transient
  num_steps = 2
  dt = 0.5
[]
"""
    def make():
        root = hit.parse(deck)
        hit.expand_braces(root)
        p = TensorProblem(root)
        return Transient(p, exec_node=root.children.get("Executioner"),
                         file_base="ck_aux", output_dir=str(tmp_path))

    tr = make()
    tr.init()
    # mutate the buffer to distinguish live sampling from the cache
    tr.state = {**tr.state,
                "buffers": {**tr.state["buffers"],
                            "c": tr.state["buffers"]["c"] * 0 + 7.0}}
    tr.save_checkpoint()

    res = make()
    res.recover()
    # the restored cache must report the t=0 projection (3), not the
    # checkpointed buffer content (7)
    assert np.allclose(res.problem.aux.values(res.state, "c_aux"), 3.0)


# ---------------------------------------------------------------------------
# SOFT terminator + constant-dt stepper: must hard-error, not silently
# continue (MOOSE fails the step; with no cutback path the run cannot
# proceed)

_TERM_DECK = """
[Domain]
  dim = 1
  nx = 8
  xmax = 6.283185307179586
[]
[TensorComputes]
  [Initialize]
    [u]
      type = ParsedCompute
      buffer = u
      extra_symbols = true
      expression = 'sin(x)'
    []
    [Lbar]
      type = ReciprocalLaplacianFactor
      factor = 1
      buffer = Lbar
    []
  []
  [Solve]
    [Nbar]
      type = ConstantReciprocalTensor
      buffer = Nbar
    []
    [ubar]
      type = ForwardFFT
      buffer = ubar
      input = u
    []
  []
[]
[TensorSolver]
  type = AdamsBashforthMoulton
  buffer = u
  reciprocal_buffer = ubar
  linear_reciprocal = Lbar
  nonlinear_reciprocal = Nbar
  substeps = 1
[]
[Problem]
  type = TensorProblem
[]
[Postprocessors]
  [dt_crit]
    type = SemiImplicitCriticalTimeStep
    buffer = Lbar
    execute_on = 'INITIAL TIMESTEP_END'
  []
[]
[UserObjects]
  [term]
    type = Terminator
    expression = 'dt_crit > 0'
    fail_mode = SOFT
  []
[]
[Executioner]
  type = Transient
  num_steps = 3
  dt = 0.1
[]
"""


def test_soft_terminator_constant_dt_raises():
    root = hit.parse(_TERM_DECK)
    problem = TensorProblem(root)
    tr = Transient(problem,
                   exec_node=root.children.get("Executioner"),
                   user_objects_node=root.children.get("UserObjects"))
    with pytest.raises(RuntimeError, match="SOFT.*cannot continue"):
        tr.run()


# ---------------------------------------------------------------------------
# xdmfdiff: tightly-spaced frame times must not be greedily mis-paired by
# np.isclose's fixed default tolerances


def test_xdmfdiff_pairs_subtolerance_spacing_exactly():
    from marlin_tpu.xdmfdiff import _pair_by_time

    f = {"u": np.zeros(2)}
    sa = [(0.0, f), (1e-9, f), (2e-9, f)]
    pairs, (ua, ub) = _pair_by_time(sa, list(sa))
    assert not ua and not ub
    # each frame pairs with its own time, not the first merely-close one
    assert [(a[0], b[0]) for a, b in pairs] == [(0.0, 0.0), (1e-9, 1e-9),
                                               (2e-9, 2e-9)]


def test_xdmfdiff_rejects_cross_frame_pairing():
    from marlin_tpu.xdmfdiff import _pair_by_time

    f = {"u": np.zeros(2)}
    # old behavior: 0.0 paired with 1e-9 via np.isclose atol=1e-8
    pairs, (ua, ub) = _pair_by_time([(0.0, f), (1e-9, f)], [(1e-9, f)])
    assert ua == [0.0]
    assert [(a[0], b[0]) for a, b in pairs] == [(1e-9, 1e-9)]


def test_xdmfdiff_tolerant_pairing_still_works():
    from marlin_tpu.xdmfdiff import _pair_by_time

    f = {"u": np.zeros(2)}
    # coarsely-spaced series with float noise: normal matching unaffected
    sa = [(0.1, f), (0.2, f)]
    sb = [(0.1 + 1e-12, f), (0.2 - 1e-12, f)]
    pairs, (ua, ub) = _pair_by_time(sa, sb)
    assert not ua and not ub and len(pairs) == 2


# ---------------------------------------------------------------------------
# serial (NONE) complex round-trip: ifft must shape-detect a full spectrum
# instead of silently cropping it through irfftn


def test_serial_complex_fft_roundtrip():
    import jax.numpy as jnp

    from marlin_tpu.domain import Domain

    dom = Domain(dim=2, n=(8, 8), maxs=(1.0, 1.0))
    x = jnp.asarray(np.random.RandomState(0).randn(8, 8), dom.dtype)
    z = x + 0.5j * x[::-1]
    spec = dom.fft(z)
    assert spec.shape == (8, 8)  # full spectrum for complex input
    back = dom.ifft(spec)
    # real-dtype buffers: the round-trip returns Re(z) (mesh-less slab
    # convention); previously irfftn silently cropped the spectrum
    assert np.allclose(back, np.real(z), atol=1e-6)
    # the half-spectrum path is untouched
    specr = dom.fft(x)
    assert specr.shape == (8, 5)
    assert np.allclose(dom.ifft(specr), x, atol=1e-6)
