"""Binned Verlet neighbor lists + fixed-slot contact kernel.

TPU-native replacement for LAMMPS's bin-based neighbor build
(`neighbor ... bin`, `neigh_modify delay 0`) at particle counts where the
dense all-pairs backend (pair.py) is too big. Everything is fixed-shape:

- particles are binned on a cell grid of pitch >= cutoff and sorted by
  bin id (one XLA sort);
- each particle gathers candidates from its 27 neighbor bins (static
  27*max_per_bin slots), distance-filters, and keeps the K nearest;
- shear history lives per (slot, particle); between rebuilds the list is
  static so history accumulates in place. On rebuild, history is carried
  over by matching partner indices, exactly preserving LAMMPS's
  per-contact shear semantics;
- rebuilds trigger on the Verlet-skin displacement criterion via
  lax.cond (half-skin rule), like LAMMPS's `check yes`.

TPU layout: all (slots, particles) arrays keep the big N axis minor-most
— idx is (K, N), shear is (3, K, N) — so nothing pads to 128 lanes.
The force math is the same forcelaws.contact_force as the dense backend;
only the pair enumeration differs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sedifoam_tpu.config import PairParams
from sedifoam_tpu.dem.forcelaws import contact_force, vcross
from sedifoam_tpu.dem.state import ParticleState


def make_binner(lo: Tuple[float, float, float], hi: Tuple[float, float, float],
                cutoff: float, k_neighbors: int, max_per_bin: int,
                periodic: Tuple[bool, bool, bool] = (False, False, False),
                audit_ring: float = 0.0):
    """Build a jit-safe neighbor-rebuild function with static bin geometry.

    rebuild(pos (N,3), active (N,)) -> (idx (K, N) int32, dropped int32),
    where idx == N marks an empty slot. Periodic axes wrap their bin
    neighborhoods and candidate distances use the minimum image.

    audit_ring > 0 arms the K-truncation safety audit: `dropped` counts
    in-ring candidates (distance < audit_ring) the K-nearest selection
    had to discard — the LAMMPS "dangerous builds" analogue. A nonzero
    count means K is too small for the observed packing and contact
    pairs may be missed; with audit_ring == 0 `dropped` is always 0.
    This is what makes density-sized K (below the geometric worst-case
    bound) safe to run: the audit verifies the bound at every rebuild.
    """
    nbx = max(int((hi[0] - lo[0]) / cutoff), 1)
    nby = max(int((hi[1] - lo[1]) / cutoff), 1)
    nbz = max(int((hi[2] - lo[2]) / cutoff), 1)
    n_bins = nbx * nby * nbz
    if n_bins + 1 >= 2 ** 31:
        # bin ids are int32 lane values; no memory scales with n_bins
        # (extents come from searchsorted at the queried ids) but the id
        # arithmetic must not wrap
        raise ValueError(
            f"bin grid {nbx}x{nby}x{nbz} overflows int32 ids; "
            "increase the cutoff or shrink the domain")
    K = k_neighbors
    M = max_per_bin
    nb = (nbx, nby, nbz)
    plen = tuple((hi[a] - lo[a]) if periodic[a] else None for a in range(3))

    def axis_offsets(a: int):
        # on a periodic axis with <3 bins, +1 and -1 wrap to the same bin:
        # deduplicate statically so a candidate never appears twice
        if not periodic[a] or nb[a] >= 3:
            return (-1, 0, 1)
        return (-1, 0) if nb[a] == 2 else (0,)

    offsets = [(i, j, k) for i in axis_offsets(0) for j in axis_offsets(1)
               for k in axis_offsets(2)]

    def rebuild(pos, active) -> jnp.ndarray:
        n = pos.shape[0]
        lo_a = jnp.asarray(lo, pos.dtype)
        size = jnp.asarray([(hi[0] - lo[0]) / nbx, (hi[1] - lo[1]) / nby,
                            (hi[2] - lo[2]) / nbz], pos.dtype)
        ijk = jnp.clip(jnp.floor((pos - lo_a) / size).astype(jnp.int32),
                       0, jnp.asarray([nbx - 1, nby - 1, nbz - 1]))
        bin_id = (ijk[:, 0] * nby + ijk[:, 1]) * nbz + ijk[:, 2]
        bin_id = jnp.where(active, bin_id, n_bins)  # park inactive

        order = jnp.argsort(bin_id)                 # (N,) particle ids
        sorted_bins = bin_id[order]

        # candidate SLOTS (positions in the sorted order): for each of 27
        # offsets, M entries from that bin; layout (27M, N) keeps N minor.
        # Bin extents come from searchsorted AT THE QUERIED IDS — never
        # from an O(n_bins) starts table: a dilute case's bin grid can
        # dwarf the particle count (jetFlow: 0.3 m box / 0.8 mm cutoff =
        # 52M bins; the full-table rebuild measured 5.7 s vs ~10 ms here)
        ok_list, nbid_list = [], []
        for (di, dj, dk) in offsets:
            nijk = ijk + jnp.asarray([di, dj, dk])
            ok = jnp.ones(n, bool)
            cols = []
            for a in range(3):
                col = nijk[:, a]
                if periodic[a]:
                    col = jnp.mod(col, nb[a])
                else:
                    ok &= (col >= 0) & (col < nb[a])
                cols.append(col)
            nb_id = (cols[0] * nby + cols[1]) * nbz + cols[2]
            ok_list.append(ok)
            nbid_list.append(jnp.clip(nb_id, 0, n_bins - 1))
        nb_ids = jnp.stack(nbid_list)                 # (27, N)
        # method="sort": the default binary search lowers to ~13 rounds
        # of scalar gathers (~33 ns/elem on TPU; measured 206 ms for
        # these shapes); the rank-by-sort form is ~19x faster
        s27 = jnp.searchsorted(sorted_bins, nb_ids, method="sort")
        e27 = jnp.searchsorted(sorted_bins, nb_ids + 1, method="sort")
        arangeM = jnp.arange(M)[None, :, None]        # (1, M, 1)
        slot = s27[:, None, :] + arangeM              # (27, M, N)
        valid = jnp.stack(ok_list)[:, None, :] & (slot < e27[:, None, :])
        slots = jnp.clip(slot, 0, n - 1).reshape(-1, n)   # (27M, N)
        valid = valid.reshape(-1, n)

        # distances via SORTED positions
        me_slot = jnp.argsort(order)                  # particle -> sorted pos
        valid &= slots != me_slot[None, :]
        valid &= active[None, :]
        if n <= 32768:
            # ONE (27M, N, 3) partner row gather fused into the d2
            # reduction: per-component scalar gathers cost ~33 ns/elem,
            # ~16x a row gather (measured 212 vs 13 ms at N=8k, where
            # injection cases rebuild every add)
            pos_sorted = pos[order]                   # (N, 3)
            diff = pos[None, :, :] - pos_sorted[slots]    # (27M, N, 3)
            for c in range(3):
                if plen[c] is not None:
                    dc = diff[..., c]
                    diff = diff.at[..., c].set(
                        dc - plen[c] * jnp.round(dc / plen[c]))
            d2 = jnp.sum(diff * diff, axis=-1)
        else:
            # at large N, XLA can materialize the (27M, N, 3) gather in
            # its lane-padded (3 -> 128) layout — 18 GB at 131k — so fall
            # back to per-component scalar gathers; big beds rebuild on
            # the Verlet-skin cadence, not every step, so the slower
            # rebuild amortizes. A round-5 attempt to CHUNK the packed
            # gather at 16384 columns (to keep every capacity on the
            # fused path; the round-4 jetFlow stall paid 583 ms/rebuild
            # here vs 88 ms at 32768) WEDGED the axon chip for ~1 h on
            # each execution at capacity 65536 — reverted; injection
            # cases avoid this path via active-window stepping
            # (runtime/window.py), which keeps the table at the live
            # population (<= 32768 for every shipped case)
            d2 = jnp.zeros_like(slots, pos.dtype)
            for c in range(3):
                pc_sorted = pos[:, c][order]
                diff = pos[:, c][None, :] - pc_sorted[slots]
                if plen[c] is not None:
                    diff = diff - plen[c] * jnp.round(diff / plen[c])
                d2 = d2 + diff * diff
        d2 = jnp.where(valid, d2, jnp.inf)

        # K nearest via ascending argsort on the candidate axis (top_k
        # on the transposed minor axis measured 12x slower), then a
        # small (K, N) gather recovers the particle ids
        sel = jnp.argsort(d2, axis=0)[:K]              # (K, N)
        d2k = jnp.take_along_axis(d2, sel, axis=0)
        slot_sel = jnp.take_along_axis(slots, sel, axis=0)     # (K, N)
        keep = jnp.isfinite(d2k)
        idx = order[slot_sel]                          # (K, N)
        if audit_ring > 0.0:
            inring = jnp.sum(d2 < audit_ring * audit_ring, axis=0)  # (N,)
            dropped = jnp.sum(jnp.maximum(inring - K, 0))
        else:
            dropped = jnp.zeros((), jnp.int32)
        return (jnp.where(keep, idx, n).astype(jnp.int32),
                dropped.astype(jnp.int32))

    return rebuild


def make_sort_order(lo, hi, cutoff,
                    periodic=(False, False, False)):
    """Bin-sort permutation builder: order (N,) with new_row -> particle.

    Sorting the SoA by bin at every rebuild makes partner indices in the
    (K, N) table point into a small local window, so the per-substep
    partner row gather stops thrashing HBM across the full particle set
    (each 512B row fetch lands near its predecessor). Inactive particles
    park at the end.
    """
    nbx = max(int((hi[0] - lo[0]) / cutoff), 1)
    nby = max(int((hi[1] - lo[1]) / cutoff), 1)
    nbz = max(int((hi[2] - lo[2]) / cutoff), 1)
    n_bins = nbx * nby * nbz

    def sort_order(pos, active):
        lo_a = jnp.asarray(lo, pos.dtype)
        size = jnp.asarray([(hi[0] - lo[0]) / nbx, (hi[1] - lo[1]) / nby,
                            (hi[2] - lo[2]) / nbz], pos.dtype)
        ijk = jnp.clip(jnp.floor((pos - lo_a) / size).astype(jnp.int32),
                       0, jnp.asarray([nbx - 1, nby - 1, nbz - 1]))
        bin_id = (ijk[:, 0] * nby + ijk[:, 1]) * nbz + ijk[:, 2]
        bin_id = jnp.where(active, bin_id, n_bins)
        return jnp.argsort(bin_id)

    return sort_order


def permute_particle_state(st: ParticleState, order) -> ParticleState:
    """Reorder the fixed-capacity SoA so row r holds particle order[r].

    (N, ...) fields take a row gather; the (3, K, N)/(3, W, N) history
    tensors and the (K, N) neighbor table permute their N axis via row
    gathers of their transposes; neighbor-table VALUES are relabeled to
    the new rows (sentinel N maps to N).
    """
    n = st.n_capacity
    rank = jnp.argsort(order)                    # old row -> new row
    rank_ext = jnp.concatenate([rank, jnp.asarray([n])]).astype(jnp.int32)

    def p_rows(x):                               # (N, ...) or (N,)
        return x[order]

    def p_minor(x):                              # (..., N) -> permute last
        moved = jnp.moveaxis(x, -1, 0)           # (N, ...)
        return jnp.moveaxis(moved[order], 0, -1)

    idx_perm = p_minor(st.nbr_idx) if st.nbr_idx.shape[0] else st.nbr_idx
    if st.nbr_idx.shape[0]:
        # relabel partner ids via a row gather of the (N+1, 1) rank table
        idx_perm = rank_ext[:, None][idx_perm][..., 0]
        # binned (3, K, N): the K (slot) axis stays fixed; only N moves.
        # Keying this on shapes misclassified K == capacity cases (tiny
        # meshes) as dense and permuted the slot axis too, decoupling the
        # shear rows from nbr_idx rows — branch on the table instead.
        shear = p_minor(st.shear)
    else:
        shear = st.shear[:, order][:, :, order]  # dense (3, N, N)

    return st._replace(
        pos=p_rows(st.pos), vel=p_rows(st.vel), omega=p_rows(st.omega),
        radius=p_rows(st.radius), mass=p_rows(st.mass),
        density=p_rows(st.density), ptype=p_rows(st.ptype),
        tag=p_rows(st.tag), active=p_rows(st.active),
        force=p_rows(st.force), torque=p_rows(st.torque),
        shear=shear, wall_shear=p_minor(st.wall_shear),
        nbr_idx=idx_perm, pos_at_build=p_rows(st.pos_at_build),
        fdrag=p_rows(st.fdrag), dudt=p_rows(st.dudt),
        v_old=p_rows(st.v_old), n0=p_rows(st.n0),
        sum_delta_fb=p_rows(st.sum_delta_fb),
        vel_fluid_old=p_rows(st.vel_fluid_old),
        # rigid-clump per-particle fields move with their rows; the body
        # SoA (st.rigid) is indexed by body id and stays put
        mol=p_rows(st.mol), displace=p_rows(st.displace),
    )


def carry_over_shear(old_idx, new_idx, old_shear):
    """Transfer per-contact shear across a rebuild by partner matching.

    old_idx (Ko, N), new_idx (Kn, N), old_shear (3, Ko, N) -> (3, Kn, N).
    """
    n = old_idx.shape[1]
    match = (new_idx[:, None, :] == old_idx[None, :, :]) & \
            (new_idx[:, None, :] < n)                 # (Kn, Ko, N)
    m = match.astype(old_shear.dtype)
    # HIGHEST: TPU f32 einsum defaults to bfloat16 passes, which would
    # round the carried shear history to ~3 digits at every rebuild.
    # (A VPU mask-multiply-reduce was measured 26x SLOWER here — the
    # (3, Kn, Ko, N) broadcast materializes through HBM.)
    return jnp.einsum("kon,con->ckn", m, old_shear,
                      precision=jax.lax.Precision.HIGHEST)


def scrub_dead_partners(idx, active):
    """Rewrite table slots that point at deactivated particles to the
    empty sentinel (== n_capacity).

    The reference deletes atoms from LAMMPS outright (library.cpp:
    492-621), so a stale partner can never exert forces. Here deletion
    is a mask flip and the (K, N) table keeps the row until the next
    Verlet rebuild — so every DELETE EVENT must scrub the table once.
    Scrubbing at the (rare, lax.cond-gated) event keeps the per-substep
    partner gathers free of any activity column: a live 12th gathered
    column measured a 3x cliff on the fused chain (31.9M -> 10.4M
    coupled psteps/s, round-3 regression c28bb68).

    Works for the binned (K, N) table and the lattice (M, S)
    slot_particle table alike — both use idx == n as the empty slot.
    tests/test_ghost_partner.py covers the delete paths end to end.
    """
    n = active.shape[0]
    j = jnp.clip(idx, 0, n - 1)
    keep = active[j] | (idx >= n)          # sentinel stays sentinel
    return jnp.where(keep, idx, n).astype(idx.dtype)


def gather_partners(state: ParticleState, idx, periodic_len=None):
    """Partner-field gather for the (K, N) neighbor table.

    Returns (has (K,N) bool, pg (K,N,11) packed partner fields, delta
    3-tuple of x_i - x_j with minimum image, rsq). Packed layout:
    [x,y,z, vx,vy,vz, wx,wy,wz, rad, m].
    ONE row gather for all partner fields: scalar gathers cost ~10x a
    row gather on TPU (each lookup pays index processing; rows amortize).
    Partner activity is NOT gathered here: delete events scrub the
    table instead (scrub_dead_partners) — keeping the gather free of a
    live activity column is worth 3x on the fused chain.
    """
    n = state.n_capacity
    x, v, w = state.pos, state.vel, state.omega
    rad, m = state.radius, state.mass

    j = jnp.clip(idx, 0, n - 1)                   # (K, N)
    packed = jnp.stack([x[:, 0], x[:, 1], x[:, 2],
                        v[:, 0], v[:, 1], v[:, 2],
                        w[:, 0], w[:, 1], w[:, 2],
                        rad, m], axis=-1)         # (N, 11)
    pg = packed[j]                                # (K, N, 11)
    has = idx < n

    from sedifoam_tpu.dem.pair import min_image
    delta = min_image(tuple(x[:, c][None, :] - pg[..., c] for c in range(3)),
                      periodic_len)
    rsq = delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2
    return has, pg, delta, rsq


def pair_forces_binned(state: ParticleState, params: PairParams, dt: float,
                       idx, shearupdate: bool = True, periodic_len=None):
    """Contact forces via the (K, N) neighbor table.

    Returns (force (N,3), torque (N,3), new_shear (3, K, N)).
    """
    n = state.n_capacity
    x, v, w = state.pos, state.vel, state.omega
    rad, m = state.radius, state.mass

    has, pg, delta, rsq = gather_partners(state, idx, periodic_len)
    radj = pg[..., 9]
    radsum = rad[None, :] + radj
    touch = has & state.active[None, :] & (rsq < radsum * radsum)

    rsq_safe = jnp.where(touch, rsq, 1.0)
    r = jnp.sqrt(rsq_safe)
    rinv = 1.0 / r
    rsqinv = 1.0 / rsq_safe

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
    poly_arg = overlap * rad[None, :] * radj / jnp.maximum(radsum, 1e-300)

    shear = (state.shear[0], state.shear[1], state.shear[2])
    force_pair, fs_vec, new_shear = contact_force(
        params, dt, touch, overlap, r, rinv, rsqinv, delta,
        vnnr, vtr, shear, meff, poly_arg, shearupdate)

    force = jnp.stack([jnp.sum(force_pair[c], axis=0) for c in range(3)],
                      axis=-1)
    tor = vcross(delta, fs_vec)
    torque = jnp.stack(
        [-rad * jnp.sum(tor[c] * rinv, axis=0) for c in range(3)], axis=-1)

    return force, torque, jnp.stack(new_shear)
