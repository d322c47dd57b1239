"""Runtime services around the jitted step: observability, IO, recovery.

The reference's auxiliary subsystems (SURVEY.md §5) map here:
- diagnostics.py — the built-in runtime audits (momentum-conservation
  totals, alpha min/max, Courant numbers, average particle velocity)
- probes.py     — OpenFOAM probes function-object analogue
- runner.py     — time loop + write intervals + timing splits
  (writeCPUTime.H analogue)
- checkpoint.py — full-state checkpoint/resume INCLUDING contact shear
  history (the reference cannot restart LAMMPS-side state:
  softParticleCloud.C:525-528 "To be implemented")
"""
