"""Two-phase incompressible fluid solver (the OpenFOAM side of sediFoam).

piso.py reproduces the per-step sequence of lammpsFoam.C:74-123:
alphaEqn (beta = 1-alpha), UbEqn assembly (UEqns.H), PISO pressure
correction with the particle momentum source entering through the face
flux (pEqn.H:21-23), channel forcing feedback, and the DDtU material
derivatives the coupling consumes.
"""
