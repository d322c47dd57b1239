"""Pressure-Poisson preconditioner.

OpenFOAM runs the pressure solve with a DIC preconditioner; here the
exact inverse of the CONSTANT-coefficient Poisson operator (unit
diffusivity, same BCs) is applied via tensor-product fast diagonalization
(fastsolve.py) — per-axis MXU matmuls at any grid size. The true
operator's face coefficient Dp = betaf*rUbAf/rhob varies mildly around
its mean, so PCG converges in a handful of iterations.
"""

from __future__ import annotations

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.grid import Grid


def make_preconditioner(grid: Grid, pbc: _bc.FieldBC, needs_ref: bool,
                        ref_cell: int, dtype):
    """Returns precond(r, dp_scale) -> z (tensor-product fast
    diagonalization at any grid size; see fastsolve.py)."""
    from sedifoam_tpu import fastsolve
    import jax.numpy as jnp
    solver = fastsolve.pressure_preconditioner(grid, pbc, dtype)
    inv_vol = 1.0 / grid.cell_volume  # scalar or (nx,ny,nz)
    if not grid.uniform:
        inv_vol = jnp.asarray(inv_vol, dtype)

    def precond(r, dp_scale):
        # operator A = L * Dp (negative definite, volume-integrated);
        # the fastdiag inverts the volume-NORMALIZED (-V^-1 L):
        # L^-1 r = -solve(r/V, 0), so A^-1 r = -solve(r/V, 0)/Dp
        z = solver.solve(r * inv_vol, 0.0, project_null=True)
        return -z / dp_scale

    return precond
