"""Particle injection/deletion regions under jit (mask flips, no resize).

Reference: softParticleCloud::{addNewParticles, addAndDeleteParticle,
findAddParticleCells} (softParticleCloud.C:1099-1352) and the evolve hook
(enhancedCloud.C:697-711). Every addParticleTimeStep seconds, one particle
is seeded at each cell center inside addParticleBox (subsampled by
reduceNumberFactor, positions jittered by randomPerturb); deleteParticle
clears a box region; deleteBeforeAdd clears the seed region first.

With the fixed-capacity SoA, adding = activating inactive slots (a
masked scatter), deleting = clearing mask bits — no recompiles.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sedifoam_tpu.config import CloudConfig
from sedifoam_tpu.dem.state import ParticleState
from sedifoam_tpu.grid import Grid


def seed_positions(grid: Grid, box, reduce_factor: int) -> np.ndarray:
    """Static injection sites: cell centers in the box, subsampled like
    findAddParticleCells (softParticleCloud.C:1271-1352)."""
    if len(box) != 6:
        return np.zeros((0, 3))
    # pure numpy (trace-time constant): no device arrays here
    xs, ys, zs = (grid.axis_centers(a) for a in range(3))
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    centers = np.stack([X, Y, Z]).reshape(3, -1).T
    inside = np.all(
        (centers >= np.asarray(box[0::2])) & (centers <= np.asarray(box[1::2])),
        axis=1)
    pts = centers[inside]
    n_cell = len(pts)
    if n_cell == 0 or reduce_factor <= 1:
        return pts
    n_line = int(np.sqrt(n_cell))
    i = np.arange(n_cell)
    keep = ((i % reduce_factor) % reduce_factor == 0) & \
           ((i // max(n_line, 1)) % reduce_factor == 0)
    return pts[keep]


def _in_box(pos, box):
    lo = jnp.asarray(box[0::2], pos.dtype)
    hi = jnp.asarray(box[1::2], pos.dtype)
    return jnp.all((pos >= lo) & (pos <= hi), axis=-1)


def delete_in_box(state: ParticleState, box) -> ParticleState:
    if len(box) != 6:
        return state
    inside = _in_box(state.pos, box)
    return state._replace(active=state.active & ~inside)


def add_particles(state: ParticleState, sites: jnp.ndarray,
                  ccfg: CloudConfig, rng_key) -> ParticleState:
    """Activate one inactive slot per seed site (capacity permitting)."""
    n_add = sites.shape[0]
    if n_add == 0:
        return state
    cap = state.n_capacity
    d, rho, ptype = ccfg.add_info

    # slot assignment: the k-th seed takes the k-th inactive slot
    inactive_rank = jnp.cumsum(~state.active) - 1        # rank among inactive
    slot_of_rank = jnp.argsort(state.active)             # inactive slots first
    take = jnp.arange(n_add)
    slots = slot_of_rank[jnp.clip(take, 0, cap - 1)]
    ok = take < jnp.sum(~state.active)                   # capacity check
    slots = jnp.where(ok, slots, cap - 1)                # clamp (masked below)

    perturb = ccfg.random_perturb * (
        0.5 - jax.random.uniform(rng_key, (n_add, 3), state.pos.dtype))
    new_pos = jnp.asarray(sites, state.pos.dtype) + perturb
    new_vel = jnp.broadcast_to(
        jnp.asarray(ccfg.add_velocity, state.vel.dtype), (n_add, 3))

    max_tag = jnp.max(jnp.where(state.active, state.tag, 0))
    new_tags = max_tag + 1 + jnp.arange(n_add, dtype=jnp.int32)

    def scat(arr, vals):
        upd = jnp.where(ok[:, None] if vals.ndim == 2 else ok, vals,
                        arr[slots])
        return arr.at[slots].set(upd)

    mass = rho * (4.0 / 3.0) * jnp.pi * (d / 2.0) ** 3
    state = state._replace(
        pos=scat(state.pos, new_pos),
        vel=scat(state.vel, new_vel),
        v_old=scat(state.v_old, new_vel),
        vel_fluid_old=scat(state.vel_fluid_old, new_vel),
        pos_at_build=scat(state.pos_at_build, new_pos),
        omega=scat(state.omega, jnp.zeros((n_add, 3), state.omega.dtype)),
        radius=scat(state.radius, jnp.full(n_add, d / 2.0, state.radius.dtype)),
        mass=scat(state.mass, jnp.full(n_add, mass, state.mass.dtype)),
        density=scat(state.density, jnp.full(n_add, rho, state.density.dtype)),
        ptype=scat(state.ptype, jnp.full(n_add, ptype, jnp.int32)),
        tag=scat(state.tag, new_tags),
        n0=scat(state.n0, jnp.zeros(n_add, state.n0.dtype)),
        sum_delta_fb=scat(state.sum_delta_fb,
                          jnp.zeros((n_add, 3), state.sum_delta_fb.dtype)),
        fdrag=scat(state.fdrag, jnp.zeros((n_add, 3), state.fdrag.dtype)),
        # injected particles are free spheres; the slot may have belonged
        # to a deleted rigid member — clear its body link
        mol=scat(state.mol, jnp.zeros(n_add, jnp.int32)),
        displace=scat(state.displace,
                      jnp.zeros((n_add, 3), state.displace.dtype)),
        active=state.active.at[slots].set(
            jnp.where(ok, True, state.active[slots])),
    )
    return state


def maybe_add_delete(state: ParticleState, time_to_add, rng_key,
                     sites: jnp.ndarray, grid: Grid, ccfg: CloudConfig,
                     dt_fluid: float):
    """The addAndDeleteParticle driver, jit-safe via lax.cond.

    Matches softParticleCloud.C:1206-1268: when the countdown expires, the
    seed region is (optionally) cleared and refilled and the countdown
    resets; otherwise it decrements by the fluid dt. Box deletion runs
    every call. Returns (state, new_time_to_add, new_rng_key, added,
    deleted) — `added` is a traced bool, True when an add actually
    fired, so the caller can gate the forced neighbor-rebuild/setup pass
    on it instead of paying it every coupled step. `deleted` is True
    when the box delete deactivated anyone: deletions need no full
    rebuild, but the caller MUST scrub the neighbor tables (integrate.
    scrub_deactivated) so stale partners stop exerting forces
    (tests/test_ghost_partner.py). The delete_before_add clear needs
    neither: the add path's forced rebuild covers it.
    """
    added = jnp.asarray(False)
    deleted = jnp.asarray(False)
    if ccfg.add_particle > 0 and sites.shape[0] > 0:
        key_add, key_next = jax.random.split(rng_key)

        def do_add(st):
            if ccfg.delete_before_add and len(ccfg.clear_box) == 6:
                st = delete_in_box(st, ccfg.clear_box)
            return add_particles(st, sites, ccfg, key_add)

        due = time_to_add <= 0.0
        state = jax.lax.cond(due, do_add, lambda st: st, state)
        time_to_add = jnp.where(due, ccfg.add_interval,
                                time_to_add - dt_fluid)
        rng_key = key_next
        added = added | due

    if ccfg.delete_particle > 0 and len(ccfg.delete_box) == 6:
        was_active = state.active
        state = delete_in_box(state, ccfg.delete_box)
        deleted = deleted | jnp.any(was_active != state.active)

    return state, time_to_add, rng_key, added, deleted
