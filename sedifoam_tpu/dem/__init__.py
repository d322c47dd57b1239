"""Soft-sphere DEM engine (TPU-native LAMMPS-granular equivalent).

Replaces the reference's in-process LAMMPS (interfaceToLammps/*,
lammps-1Feb14) with dense JAX kernels:

- pair.py      — gran/hooke/history and gran/hertzFix/history contact
- walls.py     — fix wall/gran (xplane/yplane/zplane/zcylinder)
- cohesion.py  — fix cohesive (van der Waals)
- integrate.py — nve/sphere velocity-Verlet + gravity + fluid drag,
                 subcycled with lax.scan
- state.py     — fixed-capacity struct-of-arrays particle state

The dense all-pairs backend stores the full (N, N, 3) shear-history
tensor: exact history semantics with zero bookkeeping, ideal on TPU up to
~10k particles. The binned neighbor-table backend (neighbor.py) covers
larger counts.
"""
