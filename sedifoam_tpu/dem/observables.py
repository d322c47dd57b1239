"""Contact-network observables (compute gran/local, compute cohe/local).

Reference: interfaceToLammps/compute_gran_local.cpp:43-121 and
compute_cohe_local.cpp:43-121 — per-contact local arrays (distance,
normal-force magnitude, force components, pair tags) for contact-network
analysis.

Fixed-shape versions: the dense backend returns (N, N) pair tables, the
binned backend (K, N) neighbor-slot tables — both masked by `touching`;
callers filter host-side (np.asarray + boolean mask) when writing dumps.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from sedifoam_tpu.config import DEMConfig
from sedifoam_tpu.dem.forcelaws import contact_force
from sedifoam_tpu.dem.state import ParticleState


def contact_table(state: ParticleState, cfg: DEMConfig
                  ) -> Dict[str, jnp.ndarray]:
    """Per-contact quantities for all touching pairs.

    Dense backend: dict of (N, N) arrays. Binned backend: dict of (K, N)
    arrays over the neighbor table. Keys: touching, dist, fn (normal force
    magnitude), fx/fy/fz, tag_i, tag_j.
    """
    x, rad = state.pos, state.radius
    n = state.n_capacity
    plen = cfg.periodic_len()
    if cfg.backend not in ("dense", "binned"):
        raise NotImplementedError(
            f"contact_table supports dense/binned, not {cfg.backend!r}")

    if cfg.backend == "dense":
        from sedifoam_tpu.dem.pair import min_image
        v, w, m = state.vel, state.omega, state.mass
        delta = min_image(
            tuple(x[:, None, c] - x[None, :, c] for c in range(3)), plen)
        rsq = delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2
        radsum = rad[:, None] + rad[None, :]
        valid = state.active[:, None] & state.active[None, :]
        valid &= ~jnp.eye(n, dtype=bool)
        touch = valid & (rsq < radsum * radsum)
        rsq_safe = jnp.where(touch, rsq, 1.0)
        r = jnp.sqrt(rsq_safe)
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
        poly = overlap * rad[:, None] * rad[None, :] / jnp.maximum(
            radsum, 1e-300)
        shear = (state.shear[0], state.shear[1], state.shear[2])
        tag_i = jnp.broadcast_to(state.tag[:, None], (n, n))
        tag_j = jnp.broadcast_to(state.tag[None, :], (n, n))
    else:
        from sedifoam_tpu.dem.neighbor import gather_partners
        v, w, m = state.vel, state.omega, state.mass
        idx = state.nbr_idx
        has, pg, delta, rsq = gather_partners(state, idx, plen)
        radj = pg[..., 9]
        radsum = rad[None, :] + radj
        touch = has & state.active[None, :] & (rsq < radsum * radsum)
        rsq_safe = jnp.where(touch, rsq, 1.0)
        r = jnp.sqrt(rsq_safe)
        rinv, rsqinv = 1.0 / r, 1.0 / rsq_safe
        vr = tuple(v[:, c][None, :] - pg[..., 3 + c] for c in range(3))
        vnnr = sum(vr[c] * delta[c] for c in range(3))
        vn = tuple(delta[c] * vnnr * rsqinv for c in range(3))
        vt = tuple(vr[c] - vn[c] for c in range(3))
        wr = tuple((rad[None, :] * w[:, c][None, :] + radj * pg[..., 6 + c])
                   * rinv for c in range(3))
        vtr = (vt[0] - (delta[2] * wr[1] - delta[1] * wr[2]),
               vt[1] - (delta[0] * wr[2] - delta[2] * wr[0]),
               vt[2] - (delta[1] * wr[0] - delta[0] * wr[1]))
        mj = pg[..., 10]
        meff = m[None, :] * mj / jnp.maximum(m[None, :] + mj, 1e-300)
        overlap = radsum - r
        poly = overlap * rad[None, :] * radj / jnp.maximum(radsum, 1e-300)
        shear = (state.shear[0], state.shear[1], state.shear[2])
        jcl = jnp.clip(idx, 0, n - 1)
        tag_i = jnp.broadcast_to(state.tag[None, :], idx.shape)
        tag_j = jnp.where(has, state.tag[jcl], 0)

    f, fs, _ = contact_force(cfg.pair, 0.0, touch, overlap, r, rinv,
                             rsqinv, delta, vnnr, vtr, shear, meff,
                             poly, shearupdate=False)
    fn_mag = jnp.sqrt(sum((f[c] - fs[c]) ** 2 for c in range(3)))
    return {
        "touching": touch,
        "dist": jnp.where(touch, r, 0.0),
        "fn": fn_mag,
        "fx": f[0], "fy": f[1], "fz": f[2],
        "tag_i": tag_i,
        "tag_j": tag_j,
    }


def cohesion_table(state: ParticleState, cfg: DEMConfig
                   ) -> Dict[str, jnp.ndarray]:
    """compute cohe/local (interfaceToLammps/compute_cohe_local.cpp:43-121):
    per cohesive pair within the smax ring — dist, force magnitude,
    fx/fy/fz, tag1/tag2. Dense -> (N, N) tables, binned -> (K, N)."""
    params = cfg.cohesion
    assert params is not None, "cohesion_table requires fix cohesive"
    if cfg.backend not in ("dense", "binned"):
        raise NotImplementedError(
            f"cohesion_table supports dense/binned, not {cfg.backend!r}")
    from sedifoam_tpu.dem.cohesion import cohesion_ccel

    x, rad = state.pos, state.radius
    n = state.n_capacity
    plen = cfg.periodic_len()

    if cfg.backend == "dense":
        from sedifoam_tpu.dem.pair import min_image
        delta = min_image(
            tuple(x[:, None, c] - x[None, :, c] for c in range(3)), plen)
        rsq = delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2
        radsum = rad[:, None] + rad[None, :]
        valid = state.active[:, None] & state.active[None, :]
        valid &= ~jnp.eye(n, dtype=bool)
        tag_i = jnp.broadcast_to(state.tag[:, None], (n, n))
        tag_j = jnp.broadcast_to(state.tag[None, :], (n, n))
    else:
        from sedifoam_tpu.dem.neighbor import gather_partners
        idx = state.nbr_idx
        has, pg, delta, rsq = gather_partners(state, idx, plen)
        radsum = rad[None, :] + pg[..., 9]
        valid = has & state.active[None, :]
        jcl = jnp.clip(idx, 0, n - 1)
        tag_i = jnp.broadcast_to(state.tag[None, :], idx.shape)
        tag_j = jnp.where(has, state.tag[jcl], 0)

    cut = radsum + params.smax
    within = valid & (rsq < cut * cut)
    r = jnp.sqrt(jnp.where(within, rsq, 1.0))
    ccel = cohesion_ccel(r, radsum, within, params)
    rinv = 1.0 / r
    f = tuple(delta[c] * ccel * rinv for c in range(3))
    return {
        "touching": within,
        "dist": jnp.where(within, r, 0.0),
        "force": jnp.abs(ccel),
        "fx": f[0], "fy": f[1], "fz": f[2],
        "tag_i": tag_i,
        "tag_j": tag_j,
    }
