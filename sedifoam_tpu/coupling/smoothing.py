"""Diffusion-based coarse-graining smoothing (enhancedCloud::smoothField).

The Sun & Xiao two-grid formulation (documentation/two-grid-formulation):
integrate pure diffusion d f/dt = div(DT grad f) for a pseudo-time
T = bandwidth^2/4 in `steps` implicit Euler sub-steps (enhancedCloud.C:
523-570, 790-907), with zeroGradient BCs and an anisotropic DT given by
the cloudProperties `smoothDirection` tensor diagonal.

This decouples the averaging kernel width from the mesh spacing so cells
may be smaller than particles. Each implicit step is a PCG solve at tol
1e-10 (fvSolution tempDiffScalar/tempDiffVector).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sedifoam_tpu import bc as _bc
from sedifoam_tpu import linop, linsolve, ops
from sedifoam_tpu.grid import FaceField, Grid


def smooth(field, grid: Grid, bandwidth: float, steps: int,
           direction: Tuple[float, float, float] = (1.0, 1.0, 1.0),
           tol: float = 1e-10, max_iter: int = 500):
    """Smooth a scalar (nx,ny,nz) or stacked-vector (3,nx,ny,nz) field."""
    if steps <= 0 or bandwidth <= 0.0:
        return field

    diffusion_time = bandwidth ** 2 / 4.0
    dt = diffusion_time / steps
    zg = _bc.zero_gradient()

    d = jnp.asarray(direction, field.dtype)
    gamma_face = FaceField(
        jnp.full((grid.nx + 1, grid.ny, grid.nz), d[0], field.dtype),
        jnp.full((grid.nx, grid.ny + 1, grid.nz), d[1], field.dtype),
        jnp.full((grid.nx, grid.ny, grid.nz + 1), d[2], field.dtype),
    )
    lap = linop.laplacian(gamma_face, grid, zg, dtype=field.dtype)
    V_dt = grid.cell_volume / dt

    def apply_fn(x):
        return V_dt * x - lap.apply(x)

    diag = V_dt + jnp.zeros(grid.shape, field.dtype) - lap.diag

    def one_step(f):
        sol = linsolve.pcg(apply_fn, V_dt * f, f, diag, tol=tol,
                           max_iter=max_iter)
        return sol.x

    def smooth_scalar(f):
        def body(f, _):
            return one_step(f), None
        f, _ = jax.lax.scan(body, f, None, length=steps)
        return f

    if field.ndim == 4:  # vector: smooth each component
        return jnp.stack([smooth_scalar(field[j]) for j in range(field.shape[0])])
    return smooth_scalar(field)
