"""marlin_tpu — a TPU-native Fourier spectral solver framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
Marlin framework (a MOOSE/libTorch spectral solver): phase-field PDEs
(Cahn-Hilliard, Allen-Cahn, Swift-Hohenberg, KKS), FFT micromechanics
(deGeus-style), and Lattice Boltzmann flow on uniform periodic grids.

Fields are HBM-resident pytrees of jax Arrays; computes are pure functions
wired by buffer name into a dependency-sorted DAG; the whole solver step is
one `jax.jit` region.  Multi-chip execution uses `jax.sharding.Mesh` with
slab/pencil FFT decompositions (all_to_all) and real-space halo exchange
(ppermute) instead of the reference's MPI backend.
"""

__version__ = "0.1.0"

from . import expression, hit, stencils  # noqa: F401
