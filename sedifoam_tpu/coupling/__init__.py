"""Fluid-particle coupling (the enhancedCloud of the reference).

The reference's coupling layer is ~2000 lines of MPI choreography
(softParticleCloud.C transposes between two domain decompositions) around
~300 lines of physics. On TPU the entire data plane collapses to
gather/scatter by cell index (jax.ops.segment_sum / array gathers):

- drag.py      — ErgunWenYu / SyamlalOBrien / NoCorrection Jd correlations
- transfer.py  — particle->grid scatter (particleToEulerianField,
                 calcTcFields) and grid->particle gathers
- smoothing.py — diffusion-based coarse-graining (the Sun & Xiao two-grid
                 smoothing), implicit Euler sub-steps solved with PCG
- forces.py    — the 7-force per-particle fluid force sum
- cloud.py     — the subcycled evolve() orchestration
"""
