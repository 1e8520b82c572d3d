# Thermally-activated Norton creep, solved implicitly per grid point:
#   sm      = E (e - ep)                    elastic stress at fixed strain
#   A(T)    = A0 exp(-Q/(R T))              Arrhenius creep prefactor
#   ep_rate = A(T) * (sm / s0)^n            power-law (Norton) creep
# backward-Euler integrated inside ImplicitUpdate (field-wide Newton).
[Models]
  [stress]
    type = ScalarLinearCombination
    from_var = 'forces/e state/internal/ep'
    to_var = 'state/internal/sm'
    coefficients = '1000.0 -1000.0'
  []
  [arr]
    type = ArrheniusParameter
    reference_value = 1.0
    activation_energy = 8.0e4
    parameter = 'params/A'
    temperature = 'forces/T'
  []
  [creep]
    type = PowerLawCreep
    coefficient = 1.0
    exponent = 3.0
    reference_stress = 1.0
    flow_rate = 'state/internal/g0'
  []
  [scale]
    type = ScalarMultiplication
    from_var = 'params/A state/internal/g0'
    to_var = 'state/internal/ep_rate'
  []
  [integ]
    type = ScalarBackwardEulerTimeIntegration
    variable = 'state/internal/ep'
  []
  [system]
    type = ComposedModel
    models = 'stress arr creep scale integ'
  []
  [impl]
    type = ImplicitUpdate
    implicit_model = system
  []
[]
