"""Binned Verlet neighbor lists + fixed-slot contact kernel.

TPU-native replacement for LAMMPS's bin-based neighbor build
(`neighbor ... bin`, `neigh_modify delay 0`) at particle counts where the
dense all-pairs backend (pair.py) is too big. Everything is fixed-shape:

- particles are binned on a cell grid of pitch >= cutoff+skin and sorted
  by bin id (one XLA sort);
- each particle gathers candidates from its 27 neighbor bins (static
  27*max_per_bin slots), distance-filters, and keeps the K nearest slots;
- shear history lives per (particle, slot); between rebuilds the list is
  static so history accumulates in place. On rebuild, history is carried
  over by matching partner indices (K x K compare per particle), exactly
  preserving LAMMPS's per-contact shear semantics;
- rebuilds trigger on the Verlet-skin displacement criterion via
  lax.cond (half-skin rule), like LAMMPS's check yes.

The force math is the same forcelaws.contact_force as the dense backend —
only the pair enumeration differs.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sedifoam_tpu.config import PairParams
from sedifoam_tpu.dem.forcelaws import contact_force
from sedifoam_tpu.dem.state import ParticleState


class NeighborTable(NamedTuple):
    idx: jnp.ndarray            # (N, K) partner index; == N means empty slot
    pos_at_build: jnp.ndarray   # (N, 3)


def make_binner(lo: Tuple[float, float, float], hi: Tuple[float, float, float],
                cutoff: float, k_neighbors: int, max_per_bin: int):
    """Build a jit-safe neighbor-rebuild function with static bin geometry."""
    nbx = max(int((hi[0] - lo[0]) / cutoff), 1)
    nby = max(int((hi[1] - lo[1]) / cutoff), 1)
    nbz = max(int((hi[2] - lo[2]) / cutoff), 1)
    n_bins = nbx * nby * nbz
    K = k_neighbors
    M = max_per_bin

    # 27 neighbor-bin offsets
    offsets = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
               for k in (-1, 0, 1)]

    def rebuild(pos, active) -> jnp.ndarray:
        n = pos.shape[0]
        lo_a = jnp.asarray(lo, pos.dtype)
        size = jnp.asarray([(hi[0] - lo[0]) / nbx, (hi[1] - lo[1]) / nby,
                            (hi[2] - lo[2]) / nbz], pos.dtype)
        ijk = jnp.clip(jnp.floor((pos - lo_a) / size).astype(jnp.int32),
                       0, jnp.asarray([nbx - 1, nby - 1, nbz - 1]))
        bin_id = (ijk[:, 0] * nby + ijk[:, 1]) * nbz + ijk[:, 2]
        bin_id = jnp.where(active, bin_id, n_bins)  # park inactive

        order = jnp.argsort(bin_id)                 # (N,) sorted particle ids
        sorted_bins = bin_id[order]
        # start offset of each bin in the sorted array
        starts = jnp.searchsorted(sorted_bins, jnp.arange(n_bins + 1))

        # candidate slots: for each of 27 offsets, M entries from that bin
        cand_list = []
        valid_list = []
        for (di, dj, dk) in offsets:
            nijk = ijk + jnp.asarray([di, dj, dk])
            ok = jnp.all((nijk >= 0) & (nijk < jnp.asarray([nbx, nby, nbz])),
                         axis=1)
            nb_id = (nijk[:, 0] * nby + nijk[:, 1]) * nbz + nijk[:, 2]
            nb_id = jnp.clip(nb_id, 0, n_bins - 1)
            s = starts[nb_id]                        # (N,)
            e = starts[nb_id + 1]
            slot = s[:, None] + jnp.arange(M)[None, :]   # (N, M)
            v = ok[:, None] & (slot < e[:, None])
            cand = order[jnp.clip(slot, 0, n - 1)]
            cand_list.append(cand)
            valid_list.append(v)
        cand = jnp.concatenate(cand_list, axis=1)     # (N, 27M)
        valid = jnp.concatenate(valid_list, axis=1)

        me = jnp.arange(n)[:, None]
        valid &= cand != me
        valid &= active[:, None]

        # keep the K nearest candidates (by squared distance)
        dvec = pos[:, None, :] - pos[cand]
        d2 = jnp.sum(dvec * dvec, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf)
        # top-K smallest: full sort along the candidate axis
        order2 = jnp.argsort(d2, axis=1)[:, :K]
        idx = jnp.take_along_axis(cand, order2, axis=1)
        keep = jnp.take_along_axis(valid, order2, axis=1)
        idx = jnp.where(keep, idx, n)                 # sentinel
        return idx.astype(jnp.int32)

    return rebuild


def carry_over_shear(old_idx, new_idx, old_shear):
    """Transfer per-contact shear across a rebuild by partner matching."""
    n = old_idx.shape[0]
    match = (new_idx[:, :, None] == old_idx[:, None, :]) & \
            (new_idx[:, :, None] < n)
    # (N, Knew, Kold) x (N, Kold, 3) -> (N, Knew, 3); at most one match
    return jnp.einsum("nko,nod->nkd", match.astype(old_shear.dtype),
                      old_shear)


def pair_forces_binned(state: ParticleState, params: PairParams, dt: float,
                       idx, shearupdate: bool = True):
    """Contact forces via the (N, K) neighbor table.

    Returns (force, torque, new_shear) with shear shaped (N, K, 3).
    """
    n = state.n_capacity
    x, v, w = state.pos, state.vel, state.omega
    rad, m = state.radius, state.mass

    has = idx < n
    j = jnp.clip(idx, 0, n - 1)                   # (N, K)

    xj = x[j]
    delta = x[:, None, :] - xj                    # (N, K, 3)
    rsq = jnp.sum(delta * delta, axis=-1)
    radj = rad[j]
    radsum = rad[:, None] + radj
    touch = has & state.active[:, None] & (rsq < radsum * radsum)

    rsq_safe = jnp.where(touch, rsq, 1.0)
    r = jnp.sqrt(rsq_safe)
    rinv = 1.0 / r
    rsqinv = 1.0 / rsq_safe

    vr = v[:, None, :] - v[j]
    vnnr = jnp.sum(vr * delta, axis=-1)
    vn = delta * (vnnr * rsqinv)[..., None]
    vt = vr - vn
    wr = (rad[:, None, None] * w[:, None, :] + radj[..., None] * w[j]
          ) * rinv[..., None]
    vtr = vt - jnp.stack([
        delta[..., 2] * wr[..., 1] - delta[..., 1] * wr[..., 2],
        delta[..., 0] * wr[..., 2] - delta[..., 2] * wr[..., 0],
        delta[..., 1] * wr[..., 0] - delta[..., 0] * wr[..., 1],
    ], axis=-1)

    mj = m[j]
    meff = m[:, None] * mj / jnp.maximum(m[:, None] + mj, 1e-300)
    overlap = radsum - r
    poly_arg = overlap * rad[:, None] * radj / jnp.maximum(radsum, 1e-300)

    force_pair, fs_vec, new_shear = contact_force(
        params, dt, touch, overlap, r, rinv, rsqinv, delta,
        vnnr, vtr, state.shear, meff, poly_arg, shearupdate)

    force = jnp.sum(force_pair, axis=1)
    tor = jnp.stack([
        delta[..., 1] * fs_vec[..., 2] - delta[..., 2] * fs_vec[..., 1],
        delta[..., 2] * fs_vec[..., 0] - delta[..., 0] * fs_vec[..., 2],
        delta[..., 0] * fs_vec[..., 1] - delta[..., 1] * fs_vec[..., 0],
    ], axis=-1) * rinv[..., None]
    torque = -rad[:, None] * jnp.sum(tor, axis=1)

    return force, torque, new_shear
