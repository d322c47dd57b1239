"""Dense all-pairs granular contact kernel.

TPU-native equivalent of the reference's pair compute loop
(interfaceToLammps/pair_gran_hertzFix_history.cpp:109-287). Instead of
neighbor lists + per-neighbor shear slots, each ordered pair (i, j) is
evaluated on the (N, N) tile with its own shear-history row — regular
dense math the VPU eats, with exact slot-free history semantics
(shear[i,j] = -shear[j,i] holds by construction since vtr_ij = -vtr_ji).

O(N^2) compute/memory: the right trade below ~10k particles (all the
reference validation cases). dem/neighbor.py provides the binned backend
for larger counts.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from sedifoam_tpu.config import PAIR_NONE, PairParams
from sedifoam_tpu.dem.forcelaws import contact_force
from sedifoam_tpu.dem.state import ParticleState


def pair_forces(state: ParticleState, params: PairParams, dt: float,
                shearupdate: bool = True
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Contact forces/torques for all active pairs.

    Returns (force (N,3), torque (N,3), new_shear (N,N,3)).
    """
    n = state.n_capacity
    if params.style == PAIR_NONE:
        z = jnp.zeros_like(state.vel)
        return z, z, state.shear

    x = state.pos
    v = state.vel
    w = state.omega
    rad = state.radius
    m = state.mass

    delta = x[:, None, :] - x[None, :, :]          # (N, N, 3) x_i - x_j
    rsq = jnp.sum(delta * delta, axis=-1)
    radsum = rad[:, None] + rad[None, :]

    valid = state.active[:, None] & state.active[None, :]
    valid &= ~jnp.eye(n, dtype=bool)
    touch = valid & (rsq < radsum * radsum)

    rsq_safe = jnp.where(touch, rsq, 1.0)
    r = jnp.sqrt(rsq_safe)
    rinv = 1.0 / r
    rsqinv = 1.0 / rsq_safe

    vr = v[:, None, :] - v[None, :, :]
    vnnr = jnp.sum(vr * delta, axis=-1)
    vn = delta * (vnnr * rsqinv)[..., None]
    vt = vr - vn
    # relative rotational surface velocity
    wr = (rad[:, None, None] * w[:, None, :] + rad[None, :, None] * w[None, :, :]
          ) * rinv[..., None]
    # vtr = vt - cross(wr, delta)/|..| per LAMMPS component formulas:
    # vtr1 = vt1 - (delz*wr2 - dely*wr3) etc.
    vtr = vt - jnp.stack([
        delta[..., 2] * wr[..., 1] - delta[..., 1] * wr[..., 2],
        delta[..., 0] * wr[..., 2] - delta[..., 2] * wr[..., 0],
        delta[..., 1] * wr[..., 0] - delta[..., 0] * wr[..., 1],
    ], axis=-1)

    meff = m[:, None] * m[None, :] / jnp.maximum(m[:, None] + m[None, :], 1e-300)
    overlap = radsum - r
    poly_arg = overlap * rad[:, None] * rad[None, :] / jnp.maximum(radsum, 1e-300)

    force_pair, fs_vec, new_shear = contact_force(
        params, dt, touch, overlap, r, rinv, rsqinv, delta,
        vnnr, vtr, state.shear, meff, poly_arg, shearupdate)

    force = jnp.sum(force_pair, axis=1)
    # torque_i -= rad_i * (delta x fs) / r  (summed over j)
    tor = jnp.stack([
        delta[..., 1] * fs_vec[..., 2] - delta[..., 2] * fs_vec[..., 1],
        delta[..., 2] * fs_vec[..., 0] - delta[..., 0] * fs_vec[..., 2],
        delta[..., 0] * fs_vec[..., 1] - delta[..., 1] * fs_vec[..., 0],
    ], axis=-1) * rinv[..., None]
    torque = -rad[:, None] * jnp.sum(tor, axis=1)

    return force, torque, new_shear
