"""Active-window DEM stepping for injection-driven cases.

Injection cases (enhancedCloud add/delete regions, softParticleCloud.C:
1099-1268) allocate a fixed particle CAPACITY sized for the end-of-run
population, but every per-substep cost of the binned DEM backend —
the (K, N) partner row gather, the rebuild's candidate distance pass,
the elementwise integrate — scales with the TABLE size N, not the live
population. jetFlow pays capacity 65,536 from step 0 while holding 2
active particles (round-4 full-stage stall, ~54 s/step in-battery).

The TPU-native fix: keep shapes static per compile, but step on a
PREFIX WINDOW of the SoA sized to the live population, and regrow
(power-of-two) when the population approaches the window. XLA retraces
once per window size — a handful of compiles over a whole run — and
every step in between runs at the cost of the actual population.

Soundness: active particles always live in a prefix of the SoA —
make_particles fills slots [0, n); injection takes the LOWEST-index
inactive slots (inject.add_particles: stable argsort of `active` puts
inactive slots in increasing index order); deletion flips bits inside
the prefix, and the holes are exactly what the next injection refills;
sort_on_rebuild parks inactive rows last. The window functions below
assert nothing silently: callers grow BEFORE saturation so injection
never drops particles at a full window (window_headroom).

The neighbor-table empty-slot sentinel is the table size itself
(neighbor.py: idx == N), so slicing/growing remaps sentinel values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sedifoam_tpu.dem.state import ParticleState


def high_water(particles: ParticleState) -> jnp.ndarray:
    """Highest active slot index + 1 (0 if none active)."""
    n = particles.active.shape[0]
    idx = jnp.where(particles.active, jnp.arange(n), -1)
    return jnp.max(idx) + 1


def window_slice(ps: ParticleState, w: int) -> ParticleState:
    """Restrict the SoA to its first `w` slots (binned backend only).

    Caller must guarantee every active particle lives below `w`
    (high_water(ps) <= w). Neighbor-table sentinels remap to `w`."""
    cap = ps.n_capacity
    if w >= cap:
        return ps
    if ps.rigid is not None:
        raise NotImplementedError("active-window stepping does not "
                                  "support rigid clumps")
    if ps.nbr_idx.shape[0] == 0 or ps.shear.shape[-1] != cap:
        raise NotImplementedError("active-window stepping requires the "
                                  "binned backend's (K, N) table")

    def m(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        if x.shape[0] == cap:
            return x[:w]
        if x.ndim >= 2 and x.shape[-1] == cap:
            return x[..., :w]
        return x

    out = jax.tree.map(m, ps)
    nbr = jnp.where(out.nbr_idx >= w, w, out.nbr_idx).astype(jnp.int32)
    return out._replace(nbr_idx=nbr)


def window_grow(ps: ParticleState, w_new: int) -> ParticleState:
    """Extend a windowed SoA to `w_new` slots (inactive defaults)."""
    w_old = ps.n_capacity
    if w_new <= w_old:
        return ps

    def m(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        if x.shape[0] == w_old:
            pad = jnp.zeros((w_new - w_old,) + x.shape[1:], x.dtype)
            return jnp.concatenate([x, pad], axis=0)
        if x.ndim >= 2 and x.shape[-1] == w_old:
            pad = jnp.zeros(x.shape[:-1] + (w_new - w_old,), x.dtype)
            return jnp.concatenate([x, pad], axis=-1)
        return x

    out = jax.tree.map(m, ps)
    # zero-padding a (K, w) int table would point every new slot at
    # particle 0 — remap old sentinels and fill the new columns with
    # the new sentinel instead
    k = ps.nbr_idx.shape[0]
    nbr_old = jnp.where(ps.nbr_idx >= w_old, w_new, ps.nbr_idx)
    nbr_pad = jnp.full((k, w_new - w_old), w_new, jnp.int32)
    nbr = jnp.concatenate([nbr_old, nbr_pad], axis=-1).astype(jnp.int32)
    return out._replace(nbr_idx=nbr)


def next_window(n_active_hi: int, w_cur: int, capacity: int,
                w_min: int = 2048) -> int:
    """Power-of-two window with >= 50% headroom over the high-water mark
    (injection bursts between host visits must never saturate it)."""
    w = max(w_min, w_cur)
    while w < capacity and n_active_hi * 2 > w:
        w *= 2
    return min(w, capacity)
