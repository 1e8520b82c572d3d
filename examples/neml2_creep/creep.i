#
# Thermal creep relaxation — a marlin_tpu showcase of the NEML2 deck
# surface: a clamped bar with a spatially varying strain field and a
# hot-to-cold temperature gradient relaxes by thermally-activated
# Norton creep (model.i: Arrhenius prefactor + power-law flow +
# backward-Euler ImplicitUpdate), the whole per-point Newton running
# INSIDE the jitted step.  Hot regions relax faster.
#

dt = 0.1

[Domain]
  dim = 2
  nx = 64
  ny = 64
  xmax = 1
  ymax = 1
  mesh_mode = DUMMY
[]

[TensorBuffers]
  [e][]
  [T][]
  [ep_old][]
  [ep][]
  [sm][]
  [t_now][]
  [t_old][]
[]

[TensorComputes]
  [Initialize]
    [e]
      # applied strain: 0.002 at the bottom to 0.005 at the top
      type = ParsedCompute
      buffer = e
      expression = '0.002 + 0.003*y'
      extra_symbols = true
    []
    [T]
      # temperature gradient: 600 (left) to 1200 (right)
      type = ParsedCompute
      buffer = T
      expression = '600 + 600*x'
      extra_symbols = true
    []
    [ep_old]
      type = ConstantTensor
      buffer = ep_old
      real = 0
    []
  []

  [Solve]
    [t_now]
      type = ParsedCompute
      buffer = t_now
      expression = 't'
      extra_symbols = true
    []
    [t_old]
      type = ParsedCompute
      buffer = t_old
      expression = 't - ${dt}'
      extra_symbols = true
    []
    [creep]
      type = NEML2TensorCompute
      neml2_input_file = model.i
      neml2_model = impl
      marlin_inputs = 'e T ep_old t_now t_old'
      neml2_inputs = 'forces/e forces/T old_state/internal/ep forces/t old_forces/t'
      neml2_outputs = 'state/internal/ep state/internal/sm'
      marlin_outputs = 'ep sm'
    []
  []
[]

[TensorSolver]
  # steady per-step constitutive solve; ep_old <- ep forwarding carries
  # the creep strain between steps (the mech.i F/Fnew pattern)
  type = ForwardEulerSolver
  forward_buffer = ep_old
  forward_buffer_new = ep
[]

[Postprocessors]
  [mean_sm]
    type = TensorAveragePostprocessor
    buffer = sm
    execute_on = 'TIMESTEP_END'
  []
  [max_ep]
    type = TensorExtremeValuePostprocessor
    buffer = ep
    value_type = MAX
    execute_on = 'TIMESTEP_END'
  []
[]

[Problem]
  type = TensorProblem
[]

[Executioner]
  type = Transient
  num_steps = 20
  dt = ${dt}
[]

[Outputs]
  csv = true
  execute_on = 'TIMESTEP_END'
[]
