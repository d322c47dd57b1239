"""Granular contact force laws, shared by pair and wall kernels.

Implements the exact math of the reference's DEM styles:
- gran/hooke & gran/hooke/history (stock LAMMPS, mirrored in
  interfaceToLammps/fix_wall_granFix.cpp:356-556)
- gran/hertzFix/history (interfaceToLammps/pair_gran_hertzFix_history.cpp:
  191-255), including the corrected stiffness normalisation constants
  2/1.82, 4/5.46, 8/8.84 and the damping ratio
  beta = -ln(gamman)/sqrt(ln^2(gamman)+pi^2).

All functions are elementwise over arbitrary batch shapes; `touch` masks
non-contacts. Everything is NaN-safe under jit (guarded divisions/sqrt).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from sedifoam_tpu.config import (PAIR_HERTZ_HISTORY, PAIR_HOOKE,
                                 PAIR_HOOKE_HISTORY, PairParams)

_SQRT56 = math.sqrt(5.0 / 6.0)


def _safe_div(a, b):
    return a / jnp.where(b == 0.0, 1.0, b)


def hertz_beta(gamman: float) -> float:
    """Damping ratio from the 'restitution-style' gamman of hertzFix."""
    ln = math.log(gamman)
    return -ln / math.sqrt(ln * ln + math.pi * math.pi)


def contact_force(
    params: PairParams,
    dt: float,
    touch,            # (...,) bool
    overlap,          # (...,) radsum - r (pair) or radius - r (wall)
    r, rinv, rsqinv,  # (...,) contact distance and inverses (guarded)
    delta,            # (..., 3) x_i - x_j (or signed wall distance vector)
    vnnr,             # (...,) vr . delta
    vtr,              # (..., 3) relative tangential surface velocity
    shear,            # (..., 3) accumulated shear history (pre-update)
    meff,             # (...,) effective mass
    poly_arg,         # (...,) (radsum-r)*ri*rj/radsum  or (radius-r)*radius
    shearupdate: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (force (...,3), tangential force fs (...,3), new_shear).

    force includes the normal component delta*ccel + fs. Torque is computed
    by callers as -rad * (delta x fs) * rinv.
    """
    p = params.resolved()
    zero3 = jnp.zeros_like(vtr)

    if p.style == PAIR_HOOKE:
        damp = meff * p.gamman * vnnr * rsqinv
        ccel = p.kn * overlap * rinv - damp
        vrel = jnp.sqrt(jnp.sum(vtr * vtr, axis=-1))
        fn = p.xmu * jnp.abs(ccel * r)
        fs = meff * p.gammat * vrel
        ft = jnp.where(vrel != 0.0, jnp.minimum(fn, fs) / jnp.where(vrel == 0, 1.0, vrel), 0.0)
        fs_vec = -ft[..., None] * vtr
        force = delta * (ccel * touch)[..., None] + jnp.where(touch[..., None], fs_vec, 0.0)
        return force, jnp.where(touch[..., None], fs_vec, 0.0), jnp.zeros_like(shear)

    # --- history styles: update & rotate shear -------------------------
    if shearupdate:
        shear = shear + vtr * dt
    shrmag = jnp.sqrt(jnp.sum(shear * shear, axis=-1))
    rsht = jnp.sum(shear * delta, axis=-1) * rsqinv
    if shearupdate:
        shear = shear - rsht[..., None] * delta

    if p.style == PAIR_HOOKE_HISTORY:
        damp = meff * p.gamman * vnnr * rsqinv
        ccel = p.kn * overlap * rinv - damp
        fs_vec = -(p.kt * shear + (meff * p.gammat)[..., None] * vtr)
        # Coulomb cap with history rescaling
        fs = jnp.sqrt(jnp.sum(fs_vec * fs_vec, axis=-1))
        fn = p.xmu * jnp.abs(ccel * r)
        over = fs > fn
        scale = _safe_div(fn, fs)
        damp_t = (meff * p.gammat / max(p.kt, 1e-300))[..., None] * vtr
        shear_rescaled = scale[..., None] * (shear + damp_t) - damp_t
        shear = jnp.where((over & (shrmag != 0.0))[..., None], shear_rescaled, shear)
        fs_capped = jnp.where(shrmag[..., None] != 0.0,
                              scale[..., None] * fs_vec, zero3)
        fs_vec = jnp.where(over[..., None], fs_capped, fs_vec)

    elif p.style == PAIR_HERTZ_HISTORY:
        beta = hertz_beta(p.gamman)
        sqrt_poly = jnp.sqrt(jnp.maximum(poly_arg, 0.0))
        sn = (2.0 / 1.82) * p.kn * sqrt_poly
        st = (8.0 / 8.84) * p.kn * sqrt_poly
        damp = 2.0 * _SQRT56 * beta * vnnr * rsqinv
        polyhertz = sqrt_poly
        ccel = (polyhertz * (4.0 / 5.46) * p.kn * overlap * rinv
                - jnp.sqrt(sn * meff) * damp)
        tdamp_coef = jnp.sqrt(st * meff) * (2.0 * _SQRT56 * beta)
        fs_vec = (-(polyhertz * (8.0 / 8.84) * p.kt)[..., None] * shear
                  - tdamp_coef[..., None] * vtr)
        fs = jnp.sqrt(jnp.sum(fs_vec * fs_vec, axis=-1))
        fn = p.xmu * jnp.abs(ccel * r)
        over = fs > fn
        scale = _safe_div(fn, fs)
        # the reference's rescale constant: sqrt(st*meff)*2*sqrt(5/6)*beta
        # * vtr / 8.84 * 8.0 / kt
        damp_t = (tdamp_coef / 8.84 * 8.0 / max(p.kt, 1e-300))[..., None] * vtr
        shear_rescaled = scale[..., None] * (shear + damp_t) - damp_t
        shear = jnp.where((over & (shrmag != 0.0))[..., None], shear_rescaled, shear)
        fs_capped = jnp.where(shrmag[..., None] != 0.0,
                              scale[..., None] * fs_vec, zero3)
        fs_vec = jnp.where(over[..., None], fs_capped, fs_vec)

    else:
        raise ValueError(f"unknown pair style {p.style}")

    # zero everything on non-contacts (incl. the shear history)
    tmask = touch[..., None]
    shear = jnp.where(tmask, shear, 0.0)
    fs_vec = jnp.where(tmask, fs_vec, 0.0)
    force = jnp.where(tmask, delta * ccel[..., None] + fs_vec, 0.0)
    return force, fs_vec, shear
