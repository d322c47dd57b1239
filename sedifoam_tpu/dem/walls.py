"""Granular wall forces (fix wall/gran).

Mirrors interfaceToLammps/fix_wall_granFix.cpp: plane walls on any axis
(with optional lo/hi sides), a z-axis cylinder, optional wiggle
(oscillating wall) and shear (moving wall) velocity, and per-wall shear
history with the same hooke/hooke_history/hertz_history force laws as the
particle-particle pair styles.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from sedifoam_tpu.config import WALL_ZCYLINDER, WallSpec
from sedifoam_tpu.dem.forcelaws import contact_force
from sedifoam_tpu.dem.state import ParticleState

_BIG = 1e30


def _wall_geometry(spec: WallSpec, x, rad, step_time: float):
    """Signed distance vector (N,3) from wall contact point and wall velocity."""
    n = x.shape[0]
    vwall = jnp.zeros((n, 3), x.dtype)
    wlo = spec.lo if spec.lo is not None else -_BIG
    whi = spec.hi if spec.hi is not None else _BIG

    if spec.wiggle:
        arg = 2.0 * math.pi / spec.period * step_time
        if spec.wiggle_axis == spec.axis:
            wlo = wlo + spec.amplitude - spec.amplitude * math.cos(arg)
            whi = whi + spec.amplitude - spec.amplitude * math.cos(arg)
        vw = spec.amplitude * 2.0 * math.pi / spec.period * math.sin(arg)
        vwall = vwall.at[:, spec.wiggle_axis].set(vw)
    elif spec.vshear != 0.0 and spec.shear_axis >= 0:
        vwall = vwall.at[:, spec.shear_axis].set(spec.vshear)

    delta = jnp.zeros((n, 3), x.dtype)
    if spec.style == WALL_ZCYLINDER:
        delxy = jnp.sqrt(x[:, 0] ** 2 + x[:, 1] ** 2)
        delr = spec.cylradius - delxy
        inside = delr <= rad
        safe = jnp.where(delxy == 0.0, 1.0, delxy)
        dx = jnp.where(inside, -delr / safe * x[:, 0], 0.0)
        dy = jnp.where(inside, -delr / safe * x[:, 1], 0.0)
        dz = jnp.where(inside, 0.0, spec.cylradius)  # far away -> no touch
        delta = jnp.stack([dx, dy, dz], axis=-1)
        if spec.vshear != 0.0 and spec.shear_axis != 2:
            vwall = jnp.stack([
                jnp.where(inside, spec.vshear * x[:, 1] / safe, 0.0),
                jnp.where(inside, -spec.vshear * x[:, 0] / safe, 0.0),
                jnp.zeros_like(dx),
            ], axis=-1)
    else:
        a = spec.axis
        del1 = x[:, a] - wlo
        del2 = whi - x[:, a]
        d = jnp.where(del1 < del2, del1, -del2)
        delta = delta.at[:, a].set(d)

    return delta, vwall


def wall_forces(state: ParticleState, walls: Tuple[WallSpec, ...], dt: float,
                step_time: float = 0.0, shearupdate: bool = True):
    """Sum wall contact forces over all wall fixes.

    Returns (force (N,3), torque (N,3), new_wall_shear (N,W,3)).
    """
    force = jnp.zeros_like(state.vel)
    torque = jnp.zeros_like(state.vel)
    if not walls:
        return force, torque, state.wall_shear

    new_shear_cols = []
    x, v, w = state.pos, state.vel, state.omega
    rad, m = state.radius, state.mass

    for wi, spec in enumerate(walls):
        delta, vwall = _wall_geometry(spec, x, rad, step_time)
        rsq = jnp.sum(delta * delta, axis=-1)
        touch = state.active & (rsq <= rad * rad) & (rsq > 0.0)

        rsq_safe = jnp.where(touch, rsq, 1.0)
        r = jnp.sqrt(rsq_safe)
        rinv = 1.0 / r
        rsqinv = 1.0 / rsq_safe

        vr = v - vwall
        vnnr = jnp.sum(vr * delta, axis=-1)
        vn = delta * (vnnr * rsqinv)[..., None]
        vt = vr - vn
        wr = rad[:, None] * w * rinv[:, None]
        vtr = vt - jnp.stack([
            delta[:, 2] * wr[:, 1] - delta[:, 1] * wr[:, 2],
            delta[:, 0] * wr[:, 2] - delta[:, 2] * wr[:, 0],
            delta[:, 1] * wr[:, 0] - delta[:, 0] * wr[:, 1],
        ], axis=-1)

        overlap = rad - r
        poly_arg = overlap * rad  # (radius - r) * radius for walls
        shear_w = state.wall_shear[:, wi, :]

        f_w, fs_vec, new_shear = contact_force(
            spec.params, dt, touch, overlap, r, rinv, rsqinv, delta,
            vnnr, vtr, shear_w, m, poly_arg, shearupdate)

        force = force + f_w
        tor = jnp.stack([
            delta[:, 1] * fs_vec[:, 2] - delta[:, 2] * fs_vec[:, 1],
            delta[:, 2] * fs_vec[:, 0] - delta[:, 0] * fs_vec[:, 2],
            delta[:, 0] * fs_vec[:, 1] - delta[:, 1] * fs_vec[:, 0],
        ], axis=-1) * rinv[:, None]
        torque = torque - rad[:, None] * tor
        new_shear_cols.append(new_shear)

    wall_shear = state.wall_shear
    for wi, ns in enumerate(new_shear_cols):
        wall_shear = wall_shear.at[:, wi, :].set(ns)
    return force, torque, wall_shear
