"""Contact-network observables (compute gran/local, compute cohe/local).

Reference: interfaceToLammps/compute_gran_local.cpp:43-121 — per-contact
local arrays (distance, overlap-energy proxy, normal force magnitude,
force components, pair tags, contact point) for contact-network analysis.

Fixed-shape version: returns dense per-pair tables masked by `touch`;
callers filter host-side (np.asarray + boolean mask) when writing dumps.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from sedifoam_tpu.config import DEMConfig
from sedifoam_tpu.dem.forcelaws import contact_force
from sedifoam_tpu.dem.state import ParticleState


def contact_table(state: ParticleState, cfg: DEMConfig) -> Dict[str, jnp.ndarray]:
    """Per-contact quantities for all touching pairs (dense (N,N) masks).

    Returns dict of (N, N) arrays: touching, dist, fn (normal force
    magnitude), fx/fy/fz, tag_i/tag_j broadcast.
    """
    x, rad = state.pos, state.radius
    n = state.n_capacity

    delta = tuple(x[:, None, c] - x[None, :, c] for c in range(3))
    rsq = delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2
    radsum = rad[:, None] + rad[None, :]
    valid = state.active[:, None] & state.active[None, :]
    valid &= ~jnp.eye(n, dtype=bool)
    touch = valid & (rsq < radsum * radsum)

    rsq_safe = jnp.where(touch, rsq, 1.0)
    r = jnp.sqrt(rsq_safe)

    # forces via the same pair kernel (no shear update)
    from sedifoam_tpu.dem.pair import pair_forces
    if cfg.backend == "dense":
        v = state.vel
        w = state.omega
        m = state.mass
        rinv, rsqinv = 1.0 / r, 1.0 / rsq_safe
        vr = tuple(v[:, None, c] - v[None, :, c] for c in range(3))
        vnnr = sum(vr[c] * delta[c] for c in range(3))
        vn = tuple(delta[c] * vnnr * rsqinv for c in range(3))
        vt = tuple(vr[c] - vn[c] for c in range(3))
        wr = tuple((rad[:, None] * w[:, None, c]
                    + rad[None, :] * w[None, :, c]) * rinv for c in range(3))
        vtr = (vt[0] - (delta[2] * wr[1] - delta[1] * wr[2]),
               vt[1] - (delta[0] * wr[2] - delta[2] * wr[0]),
               vt[2] - (delta[1] * wr[0] - delta[0] * wr[1]))
        meff = m[:, None] * m[None, :] / jnp.maximum(
            m[:, None] + m[None, :], 1e-300)
        overlap = radsum - r
        poly = overlap * rad[:, None] * rad[None, :] / jnp.maximum(radsum,
                                                                   1e-300)
        shear = (state.shear[0], state.shear[1], state.shear[2])
        f, fs, _ = contact_force(cfg.pair, 0.0, touch, overlap, r, rinv,
                                 rsqinv, delta, vnnr, vtr, shear, meff,
                                 poly, shearupdate=False)
        fn_mag = jnp.sqrt(sum((f[c] - fs[c]) ** 2 for c in range(3)))
        return {
            "touching": touch,
            "dist": jnp.where(touch, r, 0.0),
            "fn": fn_mag,
            "fx": f[0], "fy": f[1], "fz": f[2],
            "tag_i": jnp.broadcast_to(state.tag[:, None], (n, n)),
            "tag_j": jnp.broadcast_to(state.tag[None, :], (n, n)),
        }
    raise NotImplementedError(
        "contact_table currently requires the dense backend")
