"""Dense constant-coefficient preconditioner for the pressure Poisson.

OpenFOAM runs the pressure solve with a DIC preconditioner; on TPU, for
the small/medium grids of the validation cases, a better trade is the
exact dense inverse of the CONSTANT-coefficient Poisson operator (unit
diffusivity, same BCs), built once per config in numpy and applied as one
matmul per CG iteration on the MXU. The true operator's face coefficient
Dp = betaf*rUbAf/rhob varies mildly in space and time; preconditioning
with inv(L_1)/mean(Dp) brings PCG to a handful of iterations.

BC treatment for the preconditioner matrix: fixedValue/inletOutlet ->
Dirichlet, zeroGradient/empty/slip -> Neumann, cyclic -> wrap. When the
operator is all-Neumann (singular), the reference cell is pinned the same
way fvMatrix::setReference does.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.grid import Grid

DENSE_PRECOND_MAX_CELLS = 16384


@lru_cache(maxsize=8)
def dense_poisson_inverse(grid: Grid, pbc: _bc.FieldBC, needs_ref: bool,
                          ref_cell: int) -> np.ndarray:
    """inv of the unit-Dp pressure laplacian (n, n), numpy f64."""
    n = grid.n_cells
    area = grid.face_area
    spacing = grid.spacing
    idx = np.arange(n).reshape(grid.shape)
    A = np.zeros((n, n))

    for axis in range(3):
        coef = area[axis] / spacing[axis]
        # internal faces
        for side in range(grid.shape[axis] - 1):
            lo = np.take(idx, side, axis=axis).ravel()
            hi = np.take(idx, side + 1, axis=axis).ravel()
            A[lo, lo] -= coef
            A[hi, hi] -= coef
            A[lo, hi] += coef
            A[hi, lo] += coef
        lo_p, hi_p = pbc.axis(axis)
        first = np.take(idx, 0, axis=axis).ravel()
        last = np.take(idx, grid.shape[axis] - 1, axis=axis).ravel()
        for patch, cells in ((lo_p, first), (hi_p, last)):
            if patch.kind in (_bc.FIXED_VALUE, _bc.INLET_OUTLET):
                A[cells, cells] -= 2.0 * coef
            elif patch.kind == _bc.CYCLIC:
                A[first, first] -= coef
                A[last, last] -= coef
                A[first, last] += coef
                A[last, first] += coef
                break  # both sides handled at once
    if needs_ref:
        d = A[ref_cell, ref_cell]
        A[ref_cell, ref_cell] += d

    return np.linalg.inv(A)


def make_preconditioner(grid: Grid, pbc: _bc.FieldBC, needs_ref: bool,
                        ref_cell: int, dtype):
    """Returns precond(r, dp_scale) -> z (tensor-product fast
    diagonalization at any grid size; see fastsolve.py)."""
    from sedifoam_tpu import fastsolve
    solver = fastsolve.pressure_preconditioner(grid, pbc, dtype)

    def precond(r, dp_scale):
        # operator A = L * Dp (negative definite); A^-1 r = -solve(r, 0)/Dp
        z = solver.solve(r, 0.0, project_null=True)
        return -z / dp_scale

    return precond
