"""Per-particle fluid force sum (enhancedCloud::updateDragOnParticles,
enhancedCloud.C:112-312): drag, pressure gradient, buoyancy, added mass
(clipped), Saffman-like lift, Basset-history reduced-order model
(Elghannay & Tafti), wall lubrication, and the inlet forcing region —
each behind its cloudProperties switch.

Returns the constant-over-subcycle force pushed into the DEM fdrag fix,
plus the updated history-force state.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from sedifoam_tpu.config import CloudConfig, FluidConfig
from sedifoam_tpu.coupling import drag as _drag
from sedifoam_tpu.coupling.transfer import gather_fields, particle_cells
from sedifoam_tpu.dem.state import ParticleState
from sedifoam_tpu.grid import Grid

ROOTVSMALL = 1e-18


def g1n(delta_n):
    """History kernel g1n (enhancedCloud.C:1372-1384):
    n < 1 -> 0.9279; else 0.9279*(2n-1)/n * n^(-n/(2n-1)) + 0.001531."""
    n = jnp.maximum(delta_n, 1.0)
    g = 0.9279 * (2.0 * n - 1.0) / n * n ** (-n / (2.0 * n - 1.0)) + 0.001531
    return jnp.where(delta_n < 1.0, 0.9279, g)


def particle_forces(
    state: ParticleState,
    uf_smoothed,       # (3,...) smoothed fluid velocity
    uf_smoothed_old,   # (3,...) previous-step smoothed fluid velocity
    grad_p,            # (3,...) pressure gradient
    curl_u,            # (3,...) curl of fluid velocity
    ddt_uf,            # (3,...) DDtUb material derivative
    grid: Grid,
    ccfg: CloudConfig,
    fcfg: FluidConfig,
    alpha_field,
    step_index,
    need_dudt: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, ParticleState]:
    """Returns (p_drag (N,3), p_dudt (N,3), state with history updated).

    need_dudt=False skips gathering DDtUb: the result feeds only the
    added-mass term here and fix fdrag's carrier_rho correction
    (dem/integrate.py), so callers whose config turns both off pass
    False and p_dudt is exact zeros (the downstream terms are
    Python-gated off on the same switches — numerics identical)."""
    cells = particle_cells(state, grid)
    vol = state.volume
    d = jnp.maximum(2.0 * state.radius, 1e-300)
    dt = fcfg.dt
    rhob, nub = fcfg.rhob, fcfg.nub

    need_dudt = need_dudt or ccfg.particle_added_mass

    # every grid field this force sum needs, in ONE packed row gather
    # (per-field gathers measured ~2x slower at 131k on the chip)
    fields = [uf_smoothed, alpha_field]
    if need_dudt:
        fields.append(ddt_uf)
    if ccfg.particle_pressure_grad:
        fields.append(grad_p)
    if ccfg.particle_lift:
        fields.append(curl_u)
    if ccfg.particle_history_force:
        fields.append(uf_smoothed_old)
    gathered = gather_fields(cells, *fields)
    uf_p, p_alpha = gathered[:2]
    rest = list(gathered[2:])
    dudt_p = rest.pop(0) if need_dudt else jnp.zeros_like(state.vel)
    gp = rest.pop(0) if ccfg.particle_pressure_grad else None
    cu = rest.pop(0) if ccfg.particle_lift else None
    uf_old_p = rest.pop(0) if ccfg.particle_history_force else None

    uri = uf_p - state.vel
    mag_uri = jnp.sqrt(jnp.sum(uri * uri, axis=-1))

    jd_vals = _drag.jd(ccfg.drag_model, mag_uri, p_alpha, d, nub, rhob)

    p_drag = jnp.zeros_like(state.vel)

    if ccfg.particle_drag:
        p_drag = p_drag + (jd_vals * (1.0 - p_alpha) * vol)[:, None] * uri
    if ccfg.particle_pressure_grad:
        p_drag = p_drag - gp * vol[:, None]
    if ccfg.particle_buoyancy:
        g = jnp.asarray(fcfg.gravity, p_drag.dtype)
        p_drag = p_drag - g[None, :] * (rhob * vol)[:, None]
    if ccfg.particle_added_mass:
        dupdt = (state.vel - state.vel_fluid_old) / dt
        acc = dudt_p - dupdt
        mag_acc = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
        acc = jnp.where((mag_acc > 10.0)[:, None],
                        acc / (mag_acc + ROOTVSMALL)[:, None] * 10.0, acc)
        p_drag = p_drag + 0.5 * rhob * vol[:, None] * acc
    if ccfg.particle_lift:
        mag_cu = jnp.sqrt(jnp.sum(cu * cu, axis=-1))
        lift = (1.6 * rhob * math.sqrt(nub)) * (d ** 2)[:, None] * \
            jnp.cross(uri, cu) / jnp.sqrt(mag_cu + ROOTVSMALL)[:, None]
        p_drag = p_drag + lift

    n0, sum_fb = state.n0, state.sum_delta_fb
    if ccfg.particle_history_force:
        # reduced-order Basset history (enhancedCloud.C:197-234)
        tau_d = d ** 2 / nub
        uri_old = uf_old_p - state.vel_fluid_old
        rep = mag_uri * d / nub
        rep_old = jnp.sqrt(jnp.sum(uri_old * uri_old, axis=-1)) * d / nub
        tau_h = tau_d * (0.632 / (rep + ROOTVSMALL) + 0.087) ** 2
        tau_h_old = tau_d * (0.632 / (rep_old + ROOTVSMALL) + 0.087) ** 2
        cb = -1.5 * d ** 2 * rhob * math.sqrt(math.pi * nub)
        n_total = step_index.astype(p_drag.dtype)
        tau_t = dt * (n_total - n0)
        dupdt = (state.vel - state.vel_fluid_old) / dt
        delta_fb = cb[:, None] * dupdt / math.sqrt(dt)

        young = tau_t < tau_h  # still within the history window
        # branch 1: accumulate
        sum1 = sum_fb + delta_fb
        dnh1 = n_total - n0
        fh1 = g1n(dnh1)[:, None] * sum1
        n0_1 = n0
        # branch 2: rescale the window
        sum2 = (tau_h / jnp.maximum(tau_h_old, ROOTVSMALL))[:, None] * sum_fb
        dnh2 = tau_h / dt
        sum2 = ((dnh2 - 1.0) / jnp.maximum(dnh2, ROOTVSMALL))[:, None] * sum2
        n0_2 = n_total - dnh2
        sum2 = sum2 + delta_fb
        fh2 = g1n(dnh2)[:, None] * sum2

        sum_fb = jnp.where(young[:, None], sum1, sum2)
        n0 = jnp.where(young, n0_1, n0_2)
        fh = jnp.where(young[:, None], fh1, fh2)
        p_drag = p_drag + fh * dt
    if ccfg.lubrication_force:
        # hardcoded y-wall lubrication (enhancedCloud.C:235-248)
        dist_min = 1e-4 * d
        dist_max = 0.1 * d
        dist_wall = state.pos[:, 1] - 0.5 * d
        pvel = state.vel[:, 1]
        in_range = (dist_wall < dist_max) & (dist_wall > dist_min)
        f_lub = (6.0 * math.pi * nub * rhob * (-pvel)
                 / jnp.where(in_range, dist_wall, 1.0) * d ** 2 / 4.0)
        p_drag = p_drag.at[:, 1].add(jnp.where(in_range, f_lub, 0.0))
    if any(abs(v) > 0 for v in ccfg.inlet_force) and len(ccfg.inlet_box) == 6:
        box = ccfg.inlet_box
        inside = jnp.ones(state.n_capacity, bool)
        for a in range(3):
            inside &= (state.pos[:, a] >= box[2 * a]) & \
                      (state.pos[:, a] <= box[2 * a + 1])
        target = jnp.asarray(ccfg.inlet_force, p_drag.dtype)
        f_inlet = state.mass[:, None] * (target[None, :] - state.vel) / dt
        p_drag = jnp.where(inside[:, None], f_inlet, p_drag)

    state = state._replace(n0=n0, sum_delta_fb=sum_fb)
    return p_drag, dudt_p, state
