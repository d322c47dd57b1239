"""Particle <-> grid transfer: the TPU replacement for the reference's
foam-rank/lammps-rank MPI transpose layer (softParticleCloud.C:602-1095).

Everything is a gather (grid -> particle) or a segment_sum scatter
(particle -> grid) keyed by the particle's host-cell flat index. Inactive
particles scatter zero weight and gather from a clamped cell.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sedifoam_tpu.dem.state import ParticleState
from sedifoam_tpu.grid import Grid

ROOTVSMALL = 1e-18


def particle_cells(state: ParticleState, grid: Grid):
    """Flat host-cell index per particle (clamped into the box)."""
    ijk = grid.locate(state.pos)
    return grid.flat_index(ijk)


def cell_volume_at(cells, grid: Grid, dtype):
    """Host-cell volume per particle: scalar on uniform grids, a gather on
    graded ones."""
    V = grid.cell_volume
    if grid.uniform:
        return V
    return jnp.asarray(V, dtype).ravel()[cells]


def scatter_to_grid(values, cells, active, grid: Grid):
    """sum_p values_p -> host cells. values: (N,) or (N,3).

    Accumulation error note (dtype policy): the per-cell fan-in is
    bounded by the particles physically inside one cell (O(10^2) at
    packing), so the f32 segment-sum error is <= eps*log2(fanin) ~ 1e-6
    relative — unlike the O(N) global audit sums, which use the
    compensated accumulators in utils/accum.py. On the f64 CPU paths
    (golden tests) this sum is f64 end to end.
    """
    if values.ndim == 2:
        comps = [scatter_to_grid(values[:, j], cells, active, grid)
                 for j in range(values.shape[1])]
        return jnp.stack(comps)
    w = jnp.where(active, values, 0.0)
    flat = jax.ops.segment_sum(w, cells, num_segments=grid.n_cells)
    return flat.reshape(grid.shape)


def gather_from_grid(field, cells):
    """field value at each particle's host cell. field: (nx,ny,nz) or (3,...)."""
    if field.ndim == 4:
        return jnp.stack([field[j].ravel()[cells]
                          for j in range(field.shape[0])], axis=-1)
    return field.ravel()[cells]


def particle_to_eulerian(state: ParticleState, grid: Grid,
                         smooth_fn, alpha_smooth: bool, up_smooth: bool
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """particleToEulerianField (enhancedCloud.C:911-980).

    Returns (gamma, Ue): solid volume fraction and ensemble solid velocity.
    smooth_fn(field) applies the diffusion coarse-graining.
    """
    cells = particle_cells(state, grid)
    vol = state.volume
    V = grid.cell_volume
    if not grid.uniform:
        V = jnp.asarray(V, vol.dtype)

    gamma = scatter_to_grid(vol, cells, state.active, grid) / V
    Ue = scatter_to_grid(vol[:, None] * state.vel, cells, state.active,
                         grid) / V

    if alpha_smooth:
        gamma = smooth_fn(gamma)
    if up_smooth:
        Ue = smooth_fn(Ue)

    # normalize by gamma where particles exist
    denom = jnp.where(gamma > ROOTVSMALL, gamma, 1.0)
    Ue = jnp.where(gamma[None] > ROOTVSMALL, Ue / denom[None], Ue)
    return gamma, Ue


def calc_asrc(state: ParticleState, jd_vals, uf_smoothed, gamma, grid: Grid,
              smooth_fn, drag_smooth: bool):
    """calcTcFields (enhancedCloud.C:316-441): the explicit particle->fluid
    momentum source Asrc [kg m^-2 s^-2]; Omega is zeroed in the reference
    (fully explicit coupling) so only Asrc is returned.

    Asrc_cell = sum_p omg_p*(U_p - UfSmoothed_cell), omg = Vol*Jd/Vcell,
    then (1-gamma)-weighted smoothing.
    """
    cells = particle_cells(state, grid)
    V = cell_volume_at(cells, grid, jd_vals.dtype)
    omg = state.volume * jd_vals / V
    uf_at_p = gather_from_grid(uf_smoothed, cells)
    contrib = omg[:, None] * (state.vel - uf_at_p)
    asrc = scatter_to_grid(contrib, cells, state.active, grid)

    one_minus = 1.0 - gamma
    asrc = asrc * one_minus[None]
    if drag_smooth:
        asrc = smooth_fn(asrc)
    denom = jnp.where(jnp.abs(one_minus) > ROOTVSMALL, one_minus, 1.0)
    asrc = asrc / denom[None]
    return asrc


def calc_omega_asrc_semi(state: ParticleState, jd_vals, grid: Grid):
    """Semi-implicit coupling fields (enhancedCloud.C:338-360):
    Omega = sum_p omg, Asrc = sum_p omg*U_p (no smoothing in the
    reference's branch)."""
    cells = particle_cells(state, grid)
    V = cell_volume_at(cells, grid, jd_vals.dtype)
    omg = state.volume * jd_vals / V
    omega = scatter_to_grid(omg, cells, state.active, grid)
    asrc = scatter_to_grid(omg[:, None] * state.vel, cells, state.active,
                           grid)
    return omega, asrc


def weighted_smooth_uf(Uf, gamma, smooth_fn):
    """UfSmoothed = smooth((1-gamma)*Uf)/(1-gamma) (enhancedCloud.C:675-690)."""
    one_minus = 1.0 - gamma
    out = smooth_fn(Uf * one_minus[None])
    denom = jnp.where(jnp.abs(one_minus) > ROOTVSMALL, one_minus, 1.0)
    return out / denom[None]
