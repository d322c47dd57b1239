"""Dense all-pairs granular contact kernel.

TPU-native equivalent of the reference's pair compute loop
(interfaceToLammps/pair_gran_hertzFix_history.cpp:109-287). Instead of
neighbor lists + per-neighbor shear slots, each ordered pair (i, j) is
evaluated on the (N, N) tile with its own shear-history row — regular
dense math the VPU eats, with exact slot-free history semantics
(shear[i,j] = -shear[j,i] holds by construction since vtr_ij = -vtr_ji).

Vectors are component-tuples of (N, N) arrays and the stored shear is
(3, N, N) — no trailing length-3 axis (TPU would pad it to 128 lanes).

O(N^2) compute/memory: the right trade below ~10k particles (all the
reference validation cases). dem/neighbor.py provides the binned backend
for larger counts.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from sedifoam_tpu.config import PAIR_NONE, PairParams
from sedifoam_tpu.dem.forcelaws import contact_force, vcross
from sedifoam_tpu.dem.state import ParticleState


def min_image(delta, periodic_len):
    """Minimum-image convention per axis (LAMMPS domain->minimum_image;
    the particle side of the reference's cyclic transforms,
    lammpsFoam/softParticle.C:186-198). periodic_len: static 3-tuple of
    domain length (periodic axis) or None."""
    if periodic_len is None or all(L is None for L in periodic_len):
        return delta
    return tuple(
        d - L * jnp.round(d / L) if L is not None else d
        for d, L in zip(delta, periodic_len))


def pair_forces(state: ParticleState, params: PairParams, dt: float,
                shearupdate: bool = True, periodic_len=None
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Contact forces/torques for all active pairs.

    Returns (force (N,3), torque (N,3), new_shear (3,N,N)).
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

    delta = min_image(tuple(x[:, None, c] - x[None, :, c] for c in range(3)),
                      periodic_len)
    rsq = delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2
    radsum = rad[:, None] + rad[None, :]

    valid = state.active[:, None] & state.active[None, :]
    valid &= ~jnp.eye(n, dtype=bool)
    if state.rigid is not None:
        # exclude intra-body pairs (rigid clumps, dem/rigid.py): their
        # granular forces are central and cancel in the body sums
        valid &= ~((state.mol[:, None] == state.mol[None, :])
                   & (state.mol[:, None] > 0))
    touch = valid & (rsq < radsum * radsum)

    rsq_safe = jnp.where(touch, rsq, 1.0)
    r = jnp.sqrt(rsq_safe)
    rinv = 1.0 / r
    rsqinv = 1.0 / rsq_safe

    vr = tuple(v[:, None, c] - v[None, :, c] for c in range(3))
    vnnr = sum(vr[c] * delta[c] for c in range(3))
    vn = tuple(delta[c] * vnnr * rsqinv for c in range(3))
    vt = tuple(vr[c] - vn[c] for c in range(3))
    # relative rotational surface velocity
    wr = tuple((rad[:, None] * w[:, None, c] + rad[None, :] * w[None, :, c])
               * rinv for c in range(3))
    # vtr = vt - cross(wr, delta)/.. per LAMMPS component formulas:
    # vtr1 = vt1 - (delz*wr2 - dely*wr3) etc.
    vtr = (vt[0] - (delta[2] * wr[1] - delta[1] * wr[2]),
           vt[1] - (delta[0] * wr[2] - delta[2] * wr[0]),
           vt[2] - (delta[1] * wr[0] - delta[0] * wr[1]))

    meff = m[:, None] * m[None, :] / jnp.maximum(m[:, None] + m[None, :],
                                                 1e-300)
    overlap = radsum - r
    poly_arg = overlap * rad[:, None] * rad[None, :] / \
        jnp.maximum(radsum, 1e-300)

    shear = (state.shear[0], state.shear[1], state.shear[2])
    force_pair, fs_vec, new_shear = contact_force(
        params, dt, touch, overlap, r, rinv, rsqinv, delta,
        vnnr, vtr, shear, meff, poly_arg, shearupdate)

    force = jnp.stack([jnp.sum(force_pair[c], axis=1) for c in range(3)],
                      axis=-1)
    # torque_i -= rad_i * cross(delta, fs)/r  (summed over j)
    tor = vcross(delta, fs_vec)
    torque = jnp.stack(
        [-rad * jnp.sum(tor[c] * rinv, axis=1) for c in range(3)], axis=-1)

    return force, torque, jnp.stack(new_shear)
