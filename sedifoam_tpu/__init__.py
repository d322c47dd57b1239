"""sedifoam_tpu — a TPU-native coupled CFD-DEM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of sediFoam
(OpenFOAM+LAMMPS coupled solver for particle-laden flows):

- structured finite-volume incompressible two-phase fluid solver (PISO)
- soft-sphere DEM with Hertzian/Hookean contact, shear history, granular
  walls, cohesion and lubrication
- diffusion-based coarse-graining coupling between the two

Everything runs as one jittable ``step`` on a device (or a
``jax.sharding.Mesh`` of devices); there is no MPI, no dual domain
decomposition, and no host round-trips in the hot loop.

Reference capability map: see SURVEY.md at the repo root.
"""

from sedifoam_tpu import ops  # noqa: F401
from sedifoam_tpu.grid import Grid  # noqa: F401

__version__ = "0.1.0"
