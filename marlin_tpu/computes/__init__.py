"""Tensor compute library (the ops layer).

Pure-function re-design of the reference's ~55 TensorCompute classes
(reference: src/tensor_computes/).  Importing this package registers all
compute types with marlin_tpu.registry.computes.
"""

from . import base, core  # noqa: F401
from . import mechanics  # noqa: F401
from . import lbm, lbm_bc  # noqa: F401
from . import neml2, nn  # noqa: F401
