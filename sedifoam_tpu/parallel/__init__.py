"""Multi-chip scaling via jax.sharding (the TPU replacement for the
reference's dual MPI domain decompositions).

The reference parallelizes by decomposing space twice (OpenFOAM mesh
ranks + LAMMPS bricks) and reconciling with an all-to-all transpose
(softParticleCloud.C:602-687). Here a single `jax.sharding.Mesh` carries
both: grid fields are sharded along x (XLA inserts halo exchanges for the
stencils over ICI), particle arrays are sharded along the capacity axis
(gathers/scatters to the grid become collectives), and global reductions
(CG dot products, conservation audits) become psums — all emitted
automatically by GSPMD from sharding annotations.
"""
