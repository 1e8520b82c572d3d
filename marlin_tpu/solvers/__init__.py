"""Time integration solvers (reference: src/tensor_solver/, 1,344 LoC).

All solvers are pure functions of the state pytree: one full timestep
(including the substep loop) traces into a single XLA computation via
``lax.fori_loop``, unlike the reference which re-launches the compute graph
from C++ for each of up to 1000 substeps.
"""

from . import base, abm, abm_coupled, etdrk4, forward_euler  # noqa: F401
from . import secant, broyden, lbm_stream  # noqa: F401
from . import predictors  # noqa: F401
