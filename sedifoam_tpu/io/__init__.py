"""Case IO: populate the unified config from the reference's own formats.

- foamdict.py — tolerant OpenFOAM dictionary parser (constant/*, system/*,
  0/* field files, blockMeshDict)
- lammps.py   — in.lammps command script + granular data file parser
- case.py     — assemble a runnable SimConfig + initial state from a
  reference case directory (so cases/auto-testing/* run unmodified)
- checkpoint.py — full-state save/restore (improves on the reference,
  which cannot checkpoint LAMMPS contact history: SURVEY.md §5.4)
"""
