"""Hydrodynamic lubrication for polydisperse spheres (pair lubricate/poly).

Reference: interfaceToLammps/pair_lubricate_poly.cpp:65-430 — FLD
(fast lubrication dynamics) isotropic drag plus pairwise squeeze/shear/
pump resistances between unequal spheres:

- isotropic (flagfld): F -= R0*a*v, T -= RT0*a^3*w, with optional
  volume-fraction corrections to R0/RT0 (flagVF branch at :175-186);
- pairwise (flagHI): scalar resistances a_sq (squeeze), a_sh (shear),
  a_pu (pump) from the scaled gap h = (r - a_i - a_j)/a_i and the radius
  ratio beta0 = a_j/a_i, including the log terms when flaglog is set
  (:306-330); gaps below cut_inner are regularized exactly as the
  reference does (:294-296, including its 100*(a_i+a_j) quirk).

Box shearing (fix deform coupling) is not supported — the reference's
cohesive-suspension configs don't use it with sediFoam.

Dense ordered-pair evaluation with component-tuple layout (see pair.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp

from sedifoam_tpu.config import WALL_ZCYLINDER
from sedifoam_tpu.dem.state import ParticleState


def _pairwise_lub(p, mu, delta, r, within, radi, radj, vi, vj, wi, wj, xl):
    """Shared squeeze/shear/pump math for any pair-enumeration layout.

    All inputs are broadcast pair arrays; vi/vj are surface velocities at
    the closest-approach point, xl the contact offset from particle i.
    Returns (fpair (3-tuple), torque contributions (3-tuple) or None).
    """
    h_sep = r - radi - radj
    h_sep = jnp.where(r < p.cut_inner, 100.0 * radi + 100.0 * radj, h_sep)
    h = jnp.maximum(h_sep / radi, 1e-12)

    beta0 = radj / radi
    beta1 = 1.0 + beta0
    logih = jnp.log(1.0 / h)

    a_sq = beta0 ** 2 / beta1 ** 2 / h
    if p.flaglog:
        a_sq = a_sq + (1.0 + 7.0 * beta0 + beta0 ** 2) / 5.0 / beta1 ** 3 \
            * logih
        a_sq = a_sq + (1.0 + 18.0 * beta0 - 29.0 * beta0 ** 2
                       + 18.0 * beta0 ** 3 + beta0 ** 4) / 21.0 \
            / beta1 ** 4 * h * logih
    a_sq = 6.0 * math.pi * mu * radi * a_sq

    if p.flaglog:
        a_sh = (4.0 * beta0 * (2.0 + beta0 + 2.0 * beta0 ** 2)
                / 15.0 / beta1 ** 3 * logih)
        a_sh = a_sh + (4.0 * (16.0 - 45.0 * beta0 + 58.0 * beta0 ** 2
                              - 45.0 * beta0 ** 3 + 16.0 * beta0 ** 4)
                       / 375.0 / beta1 ** 4 * h * logih)
        a_sh = 6.0 * math.pi * mu * radi * a_sh
        a_pu = beta0 * (4.0 + beta0) / 10.0 / beta1 ** 2 * logih
        a_pu = a_pu + ((32.0 - 33.0 * beta0 + 83.0 * beta0 ** 2
                        + 43.0 * beta0 ** 3) / 250.0 / beta1 ** 3 * h * logih)
        a_pu = 8.0 * math.pi * mu * radi ** 3 * a_pu

    vr = tuple(vi[c] - vj[c] for c in range(3))
    vnnr = sum(vr[c] * delta[c] for c in range(3)) / r
    vn = tuple(vnnr * delta[c] / r for c in range(3))
    vt = tuple(vr[c] - vn[c] for c in range(3))

    fpair = tuple(a_sq * vn[c] for c in range(3))
    if p.flaglog:
        fpair = tuple(fpair[c] + a_sh * vt[c] for c in range(3))
    fpair = tuple(jnp.where(within, fpair[c], 0.0) for c in range(3))

    tq = wt = None
    if p.flaglog:
        tq = (xl[1] * fpair[2] - xl[2] * fpair[1],
              xl[2] * fpair[0] - xl[0] * fpair[2],
              xl[0] * fpair[1] - xl[1] * fpair[0])
        dw = tuple(wi[c] - wj[c] for c in range(3))
        wdotn = sum(dw[c] * delta[c] for c in range(3)) / r
        wt = tuple(jnp.where(within, a_pu * (dw[c] - wdotn * delta[c] / r),
                             0.0) for c in range(3))
        tq = tuple(jnp.where(within, tq[c], 0.0) for c in range(3))
    return fpair, tq, wt


def wall_bounded_volume(box_lo, box_hi, walls, step_time=0.0):
    """Effective V_T for the volume-fraction correction when plane walls
    bound the suspension (pair_lubricate_poly.cpp:514-539: each fix-wall
    side overrides the domain extent on its axis; moving walls trigger a
    per-step recompute, :152-177). Wiggled walls shift both sides by the
    same offset walls.py applies; jnp trig keeps it traceable when
    step_time is a scan index. Returns a scalar (python float for static
    walls)."""
    lo = list(box_lo)
    hi = list(box_hi)
    for w in walls:
        if w.style == WALL_ZCYLINDER:
            continue      # reference's wall volume logic is plane-only
        a = w.axis
        wlo, whi = w.lo, w.hi
        if w.wiggle and w.wiggle_axis == a and w.period > 0.0:
            arg = 2.0 * math.pi / w.period * step_time
            off = w.amplitude - w.amplitude * jnp.cos(arg)
            wlo = None if wlo is None else wlo + off
            whi = None if whi is None else whi + off
        if wlo is not None:
            lo[a] = wlo
        if whi is not None:
            hi[a] = whi
    return (hi[0] - lo[0]) * (hi[1] - lo[1]) * (hi[2] - lo[2])


@dataclasses.dataclass(frozen=True)
class LubricationParams:
    """pair_style lubricate/poly mu flaglog flagfld cutinner cutoff
    [flagHI] [flagVF]."""

    mu: float = 1e-3          # dynamic viscosity
    flaglog: int = 0          # include log terms (and shear/pump)
    flagfld: int = 0          # isotropic FLD drag
    cut_inner: float = 0.0    # inner gap regularization cutoff (distance)
    cut: float = 0.0          # outer cutoff (distance)
    flag_hi: int = 1          # pairwise hydrodynamic interactions
    flag_vf: int = 1          # volume-fraction corrections
    box_volume: float = 1.0   # V_T for the volume-fraction correction


def lubrication_forces(state: ParticleState, p: LubricationParams,
                       periodic_len=None, vol_T=None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (force (N,3), torque (N,3)). vol_T overrides p.box_volume
    (wall-bounded volume, see wall_bounded_volume)."""
    mu = p.mu
    x, v, w = state.pos, state.vel, state.omega
    rad = state.radius
    n = state.n_capacity
    active = state.active

    force = jnp.zeros_like(v)
    torque = jnp.zeros_like(v)

    # ---- isotropic FLD terms (with volume-fraction correction) --------
    if p.flagfld:
        vol_p = jnp.sum(state.volume * active)
        vol = p.box_volume if vol_T is None else vol_T
        vf = vol_p / vol if p.flag_vf else 0.0
        if p.flaglog:
            R0 = 6 * math.pi * mu * (1.0 + 2.725 * vf - 6.583 * vf * vf)
            RT0 = 8 * math.pi * mu * (1.0 + 0.749 * vf - 2.469 * vf * vf)
        else:
            R0 = 6 * math.pi * mu * (1.0 + 2.16 * vf)
            RT0 = 8 * math.pi * mu * (1.0 + 0.0 * vf)
        force = force - R0 * rad[:, None] * v * active[:, None]
        torque = torque - RT0 * (rad ** 3)[:, None] * w * active[:, None]

    if not p.flag_hi:
        return force, torque

    # ---- pairwise squeeze/shear/pump -----------------------------------
    from sedifoam_tpu.dem.pair import min_image
    delta = min_image(tuple(x[:, None, c] - x[None, :, c] for c in range(3)),
                      periodic_len)
    rsq = delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2
    within = active[:, None] & active[None, :] & ~jnp.eye(n, dtype=bool)
    within &= rsq < p.cut ** 2
    rsq_safe = jnp.where(within, rsq, 1.0)
    r = jnp.sqrt(rsq_safe)

    radi = rad[:, None]
    radj = rad[None, :]

    # closest-approach points (from centers, along -delta for i)
    xl = tuple(-delta[c] / r * radi for c in range(3))
    jl = tuple(-delta[c] / r * radj for c in range(3))

    wi = tuple(w[:, None, c] + jnp.zeros_like(r) for c in range(3))
    wj = tuple(w[None, :, c] + jnp.zeros_like(r) for c in range(3))

    # surface velocities at closest approach (no background shear field)
    vi = (v[:, None, 0] + (wi[1] * xl[2] - wi[2] * xl[1]),
          v[:, None, 1] + (wi[2] * xl[0] - wi[0] * xl[2]),
          v[:, None, 2] + (wi[0] * xl[1] - wi[1] * xl[0]))
    vj = (v[None, :, 0] - (wj[1] * jl[2] - wj[2] * jl[1]),
          v[None, :, 1] - (wj[2] * jl[0] - wj[0] * jl[2]),
          v[None, :, 2] - (wj[0] * jl[1] - wj[1] * jl[0]))

    fpair, tq, wt = _pairwise_lub(p, mu, delta, r, within, radi, radj,
                                  vi, vj, wi, wj, xl)
    force = force - jnp.stack([jnp.sum(fpair[c], axis=1)
                               for c in range(3)], axis=-1)
    if p.flaglog:
        torque = torque - jnp.stack([
            jnp.sum(tq[c] + wt[c], axis=1) for c in range(3)], axis=-1)

    return force, torque


def lubrication_forces_binned(state: ParticleState, p: LubricationParams,
                              idx, periodic_len=None, vol_T=None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pair lubricate/poly over the (K, N) neighbor table (binner cutoff
    and K must cover p.cut's ring; enforced by the case loader)."""
    from sedifoam_tpu.dem.neighbor import gather_partners

    mu = p.mu
    v, w, rad = state.vel, state.omega, state.radius
    active = state.active

    force = jnp.zeros_like(v)
    torque = jnp.zeros_like(v)

    if p.flagfld:
        vol_p = jnp.sum(state.volume * active)
        vol = p.box_volume if vol_T is None else vol_T
        vf = vol_p / vol if p.flag_vf else 0.0
        if p.flaglog:
            R0 = 6 * math.pi * mu * (1.0 + 2.725 * vf - 6.583 * vf * vf)
            RT0 = 8 * math.pi * mu * (1.0 + 0.749 * vf - 2.469 * vf * vf)
        else:
            R0 = 6 * math.pi * mu * (1.0 + 2.16 * vf)
            RT0 = 8 * math.pi * mu * (1.0 + 0.0 * vf)
        force = force - R0 * rad[:, None] * v * active[:, None]
        torque = torque - RT0 * (rad ** 3)[:, None] * w * active[:, None]

    if not p.flag_hi:
        return force, torque

    has, pg, delta, rsq = gather_partners(state, idx, periodic_len)
    within = has & active[None, :] & (rsq < p.cut ** 2)
    r = jnp.sqrt(jnp.where(within, rsq, 1.0))

    radi = rad[None, :]          # particle i broadcast over slots
    radj = pg[..., 9]

    xl = tuple(-delta[c] / r * radi for c in range(3))
    jl = tuple(-delta[c] / r * radj for c in range(3))
    wi = tuple(w[:, c][None, :] + jnp.zeros_like(r) for c in range(3))
    wj = tuple(pg[..., 6 + c] for c in range(3))
    vi = (v[:, 0][None, :] + (wi[1] * xl[2] - wi[2] * xl[1]),
          v[:, 1][None, :] + (wi[2] * xl[0] - wi[0] * xl[2]),
          v[:, 2][None, :] + (wi[0] * xl[1] - wi[1] * xl[0]))
    vj = (pg[..., 3] - (wj[1] * jl[2] - wj[2] * jl[1]),
          pg[..., 4] - (wj[2] * jl[0] - wj[0] * jl[2]),
          pg[..., 5] - (wj[0] * jl[1] - wj[1] * jl[0]))

    fpair, tq, wt = _pairwise_lub(p, mu, delta, r, within, radi, radj,
                                  vi, vj, wi, wj, xl)
    force = force - jnp.stack([jnp.sum(fpair[c], axis=0)
                               for c in range(3)], axis=-1)
    if p.flaglog:
        torque = torque - jnp.stack([
            jnp.sum(tq[c] + wt[c], axis=0) for c in range(3)], axis=-1)
    return force, torque
