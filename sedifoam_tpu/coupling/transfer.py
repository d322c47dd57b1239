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

    Vector values go through ONE 2-D segment_sum (a single row scatter;
    per-component scatters measured ~1.6x slower on the chip at 131k).

    Accumulation error note (dtype policy): the per-cell fan-in is
    bounded by the particles physically inside one cell (O(10^2) at
    packing), so the f32 segment-sum error is <= eps*log2(fanin) ~ 1e-6
    relative — unlike the O(N) global audit sums, which use the
    compensated accumulators in utils/accum.py. On the f64 CPU paths
    (golden tests) this sum is f64 end to end.
    """
    if values.ndim == 2:
        w = jnp.where(active[:, None], values, 0.0)
        flat = jax.ops.segment_sum(w, cells, num_segments=grid.n_cells)
        return jnp.moveaxis(flat, -1, 0).reshape((values.shape[1],)
                                                 + grid.shape)
    w = jnp.where(active, values, 0.0)
    flat = jax.ops.segment_sum(w, cells, num_segments=grid.n_cells)
    return flat.reshape(grid.shape)


def scatter_fields(cells, active, grid: Grid, *values):
    """ONE row scatter for several per-particle fields at the same cells.

    values: each (N,) or (N,3); packed into one (N, C) segment_sum.
    Returns one grid field per input ((nx,ny,nz) or (3,nx,ny,nz))."""
    cols, splits = [], []
    for v in values:
        if v.ndim == 2:
            cols.append(v)
            splits.append(v.shape[1])
        else:
            cols.append(v[:, None])
            splits.append(0)          # 0 marks "scalar"
    packed = jnp.concatenate(cols, axis=1)
    w = jnp.where(active[:, None], packed, 0.0)
    flat = jax.ops.segment_sum(w, cells, num_segments=grid.n_cells)
    out, o = [], 0
    for s in splits:
        if s == 0:
            out.append(flat[:, o].reshape(grid.shape))
            o += 1
        else:
            out.append(jnp.moveaxis(flat[:, o:o + s], -1, 0
                                    ).reshape((s,) + grid.shape))
            o += s
    return out


def gather_from_grid(field, cells):
    """field value at each particle's host cell. field: (nx,ny,nz) or (3,...).

    Vector fields pack to (n_cells, 3) and take ONE row gather: measured
    ~2x faster than three scalar gathers at 131k particles on the chip.
    """
    if field.ndim == 4:
        packed = field.reshape(field.shape[0], -1).T
        return packed[cells]
    return field.ravel()[cells]


def gather_fields(cells, *fields):
    """ONE row gather for several grid fields at the same host cells.

    fields: each (nx,ny,nz) or (C,nx,ny,nz); all components concatenate
    into one (n_cells, C_total) table so the per-particle lookup is a
    single row gather. Returns one array per input ((N,) or (N,C))."""
    cols, splits = [], []
    for f in fields:
        if f.ndim == 4:
            cols.append(f.reshape(f.shape[0], -1))
            splits.append(f.shape[0])
        else:
            cols.append(f.reshape(1, -1))
            splits.append(0)
    packed = jnp.concatenate(cols, axis=0).T      # (n_cells, C_total)
    g = packed[cells]                             # one row gather
    out, o = [], 0
    for s in splits:
        if s == 0:
            out.append(g[:, o])
            o += 1
        else:
            out.append(g[:, o:o + s])
            o += s
    return out


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

    gamma, Ue = scatter_fields(cells, state.active, grid,
                               vol, vol[:, None] * state.vel)
    gamma = gamma / V
    Ue = Ue / V

    if alpha_smooth and up_smooth:
        # one batched tensor-product solve for all 4 components
        packed = smooth_fn(jnp.concatenate([gamma[None], Ue], axis=0))
        gamma, Ue = packed[0], packed[1:]
    elif alpha_smooth:
        gamma = smooth_fn(gamma)
    elif up_smooth:
        Ue = smooth_fn(Ue)

    # normalize by gamma where particles exist
    denom = jnp.where(gamma > ROOTVSMALL, gamma, 1.0)
    Ue = jnp.where(gamma[None] > ROOTVSMALL, Ue / denom[None], Ue)
    return gamma, Ue


def calc_asrc(state: ParticleState, jd_vals, uf_smoothed, gamma, grid: Grid,
              smooth_fn, drag_smooth: bool, uf_at_p=None):
    """calcTcFields (enhancedCloud.C:316-441): the explicit particle->fluid
    momentum source Asrc [kg m^-2 s^-2]; Omega is zeroed in the reference
    (fully explicit coupling) so only Asrc is returned.

    Asrc_cell = sum_p omg_p*(U_p - UfSmoothed_cell), omg = Vol*Jd/Vcell,
    then (1-gamma)-weighted smoothing. uf_at_p, when the caller already
    gathered UfSmoothed at the particles, skips the second gather.
    """
    cells = particle_cells(state, grid)
    V = cell_volume_at(cells, grid, jd_vals.dtype)
    omg = state.volume * jd_vals / V
    if uf_at_p is None:
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
    omega, asrc = scatter_fields(cells, state.active, grid,
                                 omg, omg[:, None] * state.vel)
    return omega, asrc


def weighted_smooth_uf(Uf, gamma, smooth_fn):
    """UfSmoothed = smooth((1-gamma)*Uf)/(1-gamma) (enhancedCloud.C:675-690)."""
    one_minus = 1.0 - gamma
    out = smooth_fn(Uf * one_minus[None])
    denom = jnp.where(jnp.abs(one_minus) > ROOTVSMALL, one_minus, 1.0)
    return out / denom[None]
