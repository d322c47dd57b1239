"""Van der Waals cohesion between spheres (fix cohesive).

Dense ordered-pair version of interfaceToLammps/fix_cohesive.cpp:138-260:
model 0 is the retarded 3-branch piecewise law (Hamaker constant `ah`,
London wavelength `lam`, separation cutoffs smin/smax), model 1 the
unretarded law. Attractive: ccel < 0 pulls particles together along the
center line.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from sedifoam_tpu.config import CohesionParams
from sedifoam_tpu.dem.state import ParticleState

_PINV = 0.25 / math.atan(1.0)  # 1/pi


def cohesion_ccel(r, radsum, within, params: CohesionParams):
    """Central cohesive force magnitude (negative = attraction) for any
    pair-enumeration layout; the exact piecewise laws of
    fix_cohesive.cpp:183-244."""
    sep = r - radsum  # surface separation (can be negative in contact)
    ah, lam, smin = params.ah, params.lam, params.smin
    if params.model == 0:
        d_far = jnp.maximum(sep, 1e-300)
        ccel_far = -ah * radsum * lam * (
            6.4988e-3 - 4.5316e-4 * lam / d_far
            + 1.1326e-5 * lam * lam / (d_far * d_far)) / d_far ** 3

        def _mid(d):
            return (-ah * (lam + 22.242 * d) * radsum * lam / 24.0
                    / (lam + 11.121 * d) ** 2 / (d * d))

        ccel_mid = _mid(jnp.maximum(sep, 1e-300))
        ccel_min = _mid(jnp.full_like(sep, smin))
        ccel = jnp.where(sep > lam * _PINV, ccel_far,
                         jnp.where(sep > smin, ccel_mid, ccel_min))
    else:
        d = jnp.maximum(sep, 1e-300)
        ccel_out = -ah * radsum ** 6 / 6.0 / (d * d) / (r + radsum) ** 2 \
            / r ** 3
        ccel_in = (-ah * radsum ** 6 / 6.0 / (smin * smin)
                   / (smin + 2.0 * radsum) ** 2 / (smin + radsum) ** 3)
        ccel = jnp.where(sep > smin, ccel_out, ccel_in)
    return jnp.where(within, ccel, 0.0)


def cohesion_forces(state: ParticleState, params: Optional[CohesionParams],
                    periodic_len=None):
    """Dense all-pairs cohesion."""
    if params is None or params.ah == 0.0:
        return jnp.zeros_like(state.vel)
    from sedifoam_tpu.dem.pair import min_image

    x, rad = state.pos, state.radius
    n = state.n_capacity
    delta = min_image(tuple(x[:, None, c] - x[None, :, c] for c in range(3)),
                      periodic_len)
    rsq = delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2
    radsum = rad[:, None] + rad[None, :]

    valid = state.active[:, None] & state.active[None, :]
    valid &= ~jnp.eye(n, dtype=bool)
    cut = radsum + params.smax
    within = valid & (rsq < cut * cut)

    r = jnp.sqrt(jnp.where(within, rsq, 1.0))
    ccel = cohesion_ccel(r, radsum, within, params)
    rinv = 1.0 / r
    return jnp.stack([jnp.sum(delta[c] * ccel * rinv, axis=1)
                      for c in range(3)], axis=-1)


def cohesion_forces_binned(state: ParticleState,
                           params: Optional[CohesionParams], idx,
                           periodic_len=None):
    """Cohesion over the (K, N) neighbor table (fix_cohesive.cpp has its
    own neighbor-list request, fix_cohesive.cpp:92-96; here the table is
    shared — the binner's cutoff must cover d_max + smax, enforced by the
    case loader)."""
    if params is None or params.ah == 0.0:
        return jnp.zeros_like(state.vel)
    from sedifoam_tpu.dem.neighbor import gather_partners

    has, pg, delta, rsq = gather_partners(state, idx, periodic_len)
    rad = state.radius
    radsum = rad[None, :] + pg[..., 9]
    cut = radsum + params.smax
    within = has & state.active[None, :] & (rsq < cut * cut)
    r = jnp.sqrt(jnp.where(within, rsq, 1.0))
    ccel = cohesion_ccel(r, radsum, within, params)
    rinv = 1.0 / r
    return jnp.stack([jnp.sum(delta[c] * ccel * rinv, axis=0)
                      for c in range(3)], axis=-1)
