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
    from sedifoam_tpu.utils.accum import stable_dot, stable_sum

    fs, ps = state.fluid, state.particles
    pol = getattr(cfg, "dtype_policy", "compensated")
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

    # particle->fluid momentum source total (Ftotal2 analogue) —
    # compensated accumulation (enhancedCloud.C does these in f64)
    one_minus = 1.0 - fs.alpha
    f_total = jnp.stack([stable_dot(fs.Asrc[c] * V, one_minus, pol)
                         for c in range(3)])

    # dispersed-phase stats
    alpha_mean = stable_dot(fs.alpha, V, pol) / grid.total_volume

    # solid momentum total (Utotal2 analogue)
    u_solid = jnp.stack([stable_dot(fs.Ua[c] * V, fs.alpha, pol)
                         for c in range(3)])

    # average particle velocity (averageInfo)
    vol = ps.volume * ps.active
    total_vol = stable_sum(vol, pol)
    avg_vel = jnp.stack([stable_dot(ps.vel[:, c], vol, pol)
                         for c in range(3)]) / (total_vol + 1e-30)

    # audit drift: how much the plain f32 tree-sum differs from the
    # compensated accumulator on the largest-cancellation total — a
    # live measure of f32 accumulation error (recorded per battery case).
    # Normalized by the ABSOLUTE-value mass of the sum: the signed total
    # legitimately crosses zero at a fluidization plateau, and a
    # near-zero denominator would turn benign round-off into an O(1)
    # "drift" (seen as 1.99 on xiaocase1's end state)
    terms = fs.Asrc[1] * V * one_minus
    asrc_y_plain = jnp.sum(terms)
    audit_drift = jnp.abs(asrc_y_plain - f_total[1]) / (
        stable_sum(jnp.abs(terms), pol) + 1e-30)

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
        "audit_drift_asrc_y": audit_drift,
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
