"""Sharding specs for the coupled state over a device mesh.

Layout design (the TPU replacement for the reference's dual MPI
decomposition, SURVEY.md section 5.8):

- grid fields shard along grid-x; GSPMD inserts the halo exchanges the
  FV stencils need (the OpenFOAM processor-patch analogue);
- particle arrays shard along the capacity axis. With
  DEMConfig.sort_on_rebuild (OFF by default — the permutation costs ~11%
  single-chip and TPU row gathers don't reward locality; multi-chip runs
  must enable it for slab alignment) the SoA is
  re-sorted by bin id — x-major, matching the grid decomposition — at
  every neighbor rebuild, so each device's contiguous particle block
  corresponds to an x-slab of space: the (K, N) partner gathers and the
  particle<->grid transfers then reference mostly device-local rows, and
  the collectives GSPMD inserts carry only the slab-boundary halo
  instead of an all-gather of the full SoA. Re-sorting doubles as the
  re-bucketing step that replaces MPI particle migration
  (softParticleCloud.C:602-687): a particle that drifts across a slab
  boundary changes devices at the next rebuild.
- the capacity split is even while slab populations are not, so
  alignment is approximate; exactness is not required — it only moves
  work between the local and collective paths.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sedifoam_tpu.solver import SimState


def make_mesh(n_devices: Optional[int] = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_state(state: SimState, mesh: Mesh, axis: str = "d") -> SimState:
    """Place a SimState on the mesh.

    - particle arrays: sharded along the capacity axis (the (N,N,3) shear
      tensor along its first axis) — "particle parallelism";
    - fluid grid fields: sharded along grid-x where divisible — "spatial
      domain decomposition"; XLA adds the halo exchanges;
    - scalars and small fields: replicated.
    """
    n_dev = mesh.shape[axis]
    capacity = state.particles.pos.shape[0]
    nx = state.fluid.p.shape[0]

    def spec_for(x):
        if x.ndim == 0:
            return P()
        shape = x.shape
        # particle-capacity leading axis
        if shape[0] == capacity and capacity % n_dev == 0:
            return P(axis, *([None] * (x.ndim - 1)))
        # particle-capacity MINOR axis: the (K, N) neighbor table, the
        # (3, K, N) contact history and the (3, W, N) wall history — the
        # largest DEM state. Sharding N (the 128-lane axis) makes
        # per-device bytes drop 1/n_dev; round-2 replicated these.
        if x.ndim >= 2 and shape[-1] == capacity and capacity % n_dev == 0:
            return P(*([None] * (x.ndim - 1)), axis)
        # grid scalar (nx, ny, nz) or vector (3, nx, ny, nz)
        if x.ndim >= 3 and shape[-3] == nx and nx % n_dev == 0:
            lead = [None] * (x.ndim - 3)
            return P(*lead, axis, None, None)
        return P(*([None] * x.ndim))

    def place(x):
        return jax.device_put(x, NamedSharding(mesh, spec_for(x)))

    return jax.tree.map(place, state)
