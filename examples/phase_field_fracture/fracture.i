#
# Phase-field brittle fracture (AT2) coupled to FFT micromechanics —
# a marlin_tpu showcase deck composing ONLY registered reference-parity
# types: the single-edge-notch shear test (Miehe et al. 2010).
#
# Staggered scheme per substep: FFTMechanics solves quasi-static
# equilibrium with (1-d)^2-degraded moduli under a ramped macroscopic
# shear, the von Mises stress supplies the crack driving force
# H = sV^2/(2 E0), and the damage field d evolves by the AT2
# Ginzburg-Landau flow integrated semi-implicitly in k-space:
#
#   d_t = L * [ 2(1-d) H - (Gc/ell) d + Gc*ell * lap(d) ]
#
# (linear part -L*(Gc/ell + Gc*ell*k^2) treated implicitly, driving
# force explicitly).  Irreversibility via the RunningMaximum history
# envelope H(x) = max_t psi(x, t), seeded by the notch IC.
#

ell = 0.04
Gc = 2.7e-3
L = 200.0
E0 = 210.0
keta = 1e-3

[Domain]
  dim = 2
  nx = 96
  ny = 96
  xmax = 1
  ymax = 1
  mesh_mode = DUMMY
[]

[TensorBuffers]
  [d]
  []
  [dbar]
  []
  [Lbar]
  []
  [Nbar]
  []
  [g]
  []
  [K]
  []
  [mu]
  []
  [F]
  []
  [Fnew]
  []
  [stress]
  []
  [applied_strain]
  []
  [sV]
  []
  [H]
  []
  [psi]
  []
  [Nreal]
  []
[]

[TensorComputes]
  [Initialize]
    [notch]
      # initial crack: a thin fully-damaged strip from the left edge to
      # the domain center
      type = SmoothRectangleCompute
      buffer = d
      x1 = -0.1
      x2 = 0.5
      y1 = ${fparse 0.5 - 0.01}
      y2 = ${fparse 0.5 + 0.01}
      inside = 1.0
      outside = 0.0
    []
    [Finit]
      type = RankTwoIdentity
      buffer = F
    []
    [notch_drive]
      # seed the history envelope with a driving-force floor along the
      # notch (H >> Gc/(2 ell) keeps d ~= 1 there)
      type = SmoothRectangleCompute
      buffer = H
      x1 = -0.1
      x2 = 0.5
      y1 = ${fparse 0.5 - 0.01}
      y2 = ${fparse 0.5 + 0.01}
      inside = 1.0
      outside = 0.0
    []
    [Lbar]
      # AT2 linear factor, implicit: -L*(Gc/ell + Gc*ell*k^2)
      type = ParsedCompute
      buffer = Lbar
      expression = '-${L}*(${Gc}/${ell} + ${Gc}*${ell}*k2)'
      extra_symbols = true
      expand = RECIPROCAL
    []
  []

  [Solve]
    [g]
      # degradation with a residual-stiffness floor
      type = ParsedCompute
      buffer = g
      expression = '(1-d)^2*(1-${keta}) + ${keta}'
      inputs = d
    []
    [K]
      type = ParsedCompute
      buffer = K
      expression = 'g*175.0'
      inputs = g
    []
    [mu]
      type = ParsedCompute
      buffer = mu
      expression = 'g*80.77'
      inputs = g
    []
    [hyper_elasticity]
      type = HyperElasticIsotropic
      buffer = stress
      F = Fnew
      K = K
      mu = mu
    []
    [applied_strain]
      type = MacroscopicShearTensor
      buffer = applied_strain
    []
    [mech]
      type = FFTMechanics
      buffer = Fnew
      F = F
      K = K
      mu = mu
      l_tol = 1e-2
      nl_rel_tol = 2e-2
      nl_abs_tol = 2e-2
      constitutive_model = hyper_elasticity
      stress = stress
      applied_macroscopic_strain = applied_strain
    []
    [vonmises]
      type = ComputeVonMisesStress
      buffer = sV
      stress = stress
    []
    [psi]
      # instantaneous crack driving force
      type = ParsedCompute
      buffer = psi
      expression = 'sV^2/(2*${E0})'
      inputs = sV
    []
    [H]
      # irreversibility: H(x) = max over time of psi(x) through the
      # solver history ring (seeded by the notch IC above)
      type = RunningMaximum
      buffer = H
      input = psi
    []
    [Nreal]
      type = ParsedCompute
      buffer = Nreal
      expression = '2*${L}*(1-d)*H'
      inputs = 'd H'
    []
    [Nbar]
      type = ForwardFFT
      buffer = Nbar
      input = Nreal
    []
    [dbar]
      type = ForwardFFT
      buffer = dbar
      input = d
    []
  []
[]

[TensorSolver]
  type = AdamsBashforthMoulton
  buffer = d
  reciprocal_buffer = dbar
  linear_reciprocal = Lbar
  nonlinear_reciprocal = Nbar
  substeps = 5
  forward_buffer = F
  forward_buffer_new = Fnew
[]

[Postprocessors]
  [max_d]
    type = TensorExtremeValuePostprocessor
    buffer = d
    value_type = MAX
    execute_on = 'TIMESTEP_END'
  []
  [crack_area]
    type = TensorIntegralPostprocessor
    buffer = d
    execute_on = 'TIMESTEP_END'
  []
  [max_sV]
    type = TensorExtremeValuePostprocessor
    buffer = sV
    value_type = MAX
    execute_on = 'TIMESTEP_END'
  []
[]

[TensorOutputs]
  [xdmf]
    type = XDMFTensorOutput
    buffer = 'd sV'
    output_mode = 'Cell Cell'
    enable_hdf5 = true
  []
[]

[Problem]
  type = TensorProblem
[]

[Executioner]
  type = Transient
  num_steps = 40
  dt = 2e-3
[]

[Outputs]
  csv = true
  execute_on = 'TIMESTEP_END'
[]
