"""Runtime physics audits (jit-safe scalar reductions).

Mirrors the reference's built-in per-step assertions/printouts:
- momentum-conservation totals Ftotal/Utotal (enhancedCloud.C:395-435,
  932-976)
- dispersed-phase fraction stats (alphaEqn.H:53-57)
- Courant numbers (CourantNo.H, alphaEqn.H relative-flux print)
- average particle velocity (enhancedCloud::averageInfo, :1341-1370)

All reductions become psums over the device mesh when the state is
sharded.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from sedifoam_tpu.config import FluidConfig
from sedifoam_tpu.grid import Grid
from sedifoam_tpu.solver import SimState


def compute(state: SimState, grid: Grid, cfg: FluidConfig, dem_cfg=None
            ) -> Dict[str, jnp.ndarray]:
    fs, ps = state.fluid, state.particles
    V = grid.cell_volume
    if not grid.uniform:
        V = jnp.asarray(V, fs.alpha.dtype)
    dt = cfg.dt

    # Courant number: max over faces of |phi|/A * dt / d (facewise so
    # graded axes use their local spacing)
    co = 0.0
    co_r = 0.0
    area = grid.face_area
    for a in range(3):
        if grid.uniform:
            inv_ad = 1.0 / (area[a] * grid.spacing[a])
        else:
            import numpy as np
            d = grid.axis_dists(a)
            shape = [1, 1, 1]
            shape[a] = len(d)
            inv_ad = 1.0 / (area[a] * d.reshape(shape))
        co = jnp.maximum(co, jnp.max(jnp.abs(fs.phib[a]) * inv_ad) * dt)
        rel = jnp.abs(fs.phia[a] - fs.phib[a])
        co_r = jnp.maximum(co_r, jnp.max(rel * inv_ad) * dt)

    # particle->fluid momentum source total (Ftotal2 analogue)
    one_minus = 1.0 - fs.alpha
    f_total = jnp.stack([jnp.sum(fs.Asrc[c] * V * one_minus)
                         for c in range(3)])

    # dispersed-phase stats
    alpha_mean = jnp.sum(fs.alpha * V) / grid.total_volume

    # solid momentum total (Utotal2 analogue)
    u_solid = jnp.stack([jnp.sum(fs.Ua[c] * V * fs.alpha) for c in range(3)])

    # average particle velocity (averageInfo)
    vol = ps.volume * ps.active
    total_vol = jnp.sum(vol)
    avg_vel = jnp.sum(ps.vel * vol[:, None], axis=0) / (total_vol + 1e-30)

    out = {
        "courant": co,
        "courant_rel": co_r,
        "alpha_mean": alpha_mean,
        "alpha_min": jnp.min(fs.alpha),
        "alpha_max": jnp.max(fs.alpha),
        "asrc_total_x": f_total[0],
        "asrc_total_y": f_total[1],
        "asrc_total_z": f_total[2],
        "solid_momentum_y": u_solid[1],
        "n_particles": jnp.sum(ps.active),
        "avg_particle_vel_y": avg_vel[1],
        "max_particle_speed": jnp.max(
            jnp.sqrt(jnp.sum(ps.vel ** 2, axis=-1)) * ps.active),
        "continuity_err": jnp.max(jnp.abs(_ops().div_flux(fs.phi, grid))),
    }
    if dem_cfg is not None and dem_cfg.backend == "lattice":
        # lattice bins silently drop overflow particles from contacts;
        # surface any unslotted actives (must stay 0 in a healthy run)
        slotted = jnp.sum(ps.nbr_idx < ps.n_capacity)
        out["lattice_unslotted"] = jnp.sum(ps.active) - slotted
    return out


def _ops():
    from sedifoam_tpu import ops
    return ops
