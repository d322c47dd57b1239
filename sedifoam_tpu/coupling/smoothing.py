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
import numpy as np

from sedifoam_tpu import bc as _bc
from sedifoam_tpu import linop, linsolve, ops
from sedifoam_tpu.grid import FaceField, Grid

USE_FASTDIAG = True  # exact tensor-product smoother (CG fallback if False)


def smooth(field, grid: Grid, bandwidth: float, steps: int,
           direction: Tuple[float, float, float] = (1.0, 1.0, 1.0),
           tol: float = 1e-10, max_iter: int = 500):
    """Smooth a scalar (nx,ny,nz) or stacked-vector (3,nx,ny,nz) field."""
    if steps <= 0 or bandwidth <= 0.0:
        return field

    if USE_FASTDIAG:
        # exact tensor-product solve: (V/dt I - L)^-1 applied `steps`
        # times, all matmuls (fastsolve.py) — no iteration, any grid size
        from sedifoam_tpu import fastsolve
        solver = fastsolve.smoothing_solver(
            grid, tuple(float(d) for d in direction), field.dtype)
        # volume-normalized implicit Euler: (1/dt I - V^-1 L) x = f/dt,
        # all `steps` applications collapsed into one transform pair in
        # the shared eigenbasis (FastDiag.solve_pow) — same math, 1/steps
        # the matmul work per smooth
        dt_f = (bandwidth ** 2 / 4.0) / steps
        c0 = 1.0 / dt_f
        return solver.solve_pow(field, c0, int(steps))

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

    def smooth_scalar(f):
        def body(f, _):
            sol = linsolve.pcg(apply_fn, V_dt * f, f, diag, tol=tol,
                               max_iter=max_iter)
            return sol.x, None
        f, _ = jax.lax.scan(body, f, None, length=steps)
        return f

    def smooth_vector(f):
        # one batched solve per diffusion step (3 RHS, shared operator)
        def body(f, _):
            sol = linsolve.pcg_multi(apply_fn, V_dt * f, f, diag, tol=tol,
                                     max_iter=max_iter)
            return sol.x, None
        f, _ = jax.lax.scan(body, f, None, length=steps)
        return f

    if field.ndim == 4:
        return smooth_vector(field)
    return smooth_scalar(field)
