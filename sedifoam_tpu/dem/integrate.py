"""DEM time integration: nve/sphere velocity-Verlet with granular fixes.

Reproduces one LAMMPS `run N pre no post no` (interfaceToLammps/
library.cpp:372-386) as a `lax.scan` over substeps:

  initial_integrate (nve/sphere) -> pair+wall contact forces ->
  post_force fixes (gravity, fdrag incl. per-substep added mass,
  cohesion) -> final_integrate

Force state carries across calls exactly like LAMMPS's `pre no` run
continuation; `setup_forces` is the one-time setup() pass (shearupdate
off, matching pair_gran_hertzFix_history.cpp:65-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sedifoam_tpu.config import DEMConfig
from sedifoam_tpu.dem.cohesion import cohesion_forces
from sedifoam_tpu.dem.pair import pair_forces
from sedifoam_tpu.dem.state import ParticleState
from sedifoam_tpu.dem.walls import wall_forces

_INERTIA = 0.4  # solid sphere moment-of-inertia factor (LAMMPS nve/sphere)


def scrub_deactivated(state: ParticleState, cfg: DEMConfig) -> ParticleState:
    """Invalidate table slots pointing at deactivated particles.

    MUST be called (lax.cond-gated on an actual delete) by every path
    that flips `active` off between rebuilds: the partner gathers trust
    the table (see neighbor.scrub_dead_partners). The dense backend
    masks `active` per pair-eval and needs no scrub.
    """
    if cfg.backend not in ("binned", "lattice") or \
            state.nbr_idx.shape[0] == 0:
        return state
    from sedifoam_tpu.dem.neighbor import scrub_dead_partners
    return state._replace(
        nbr_idx=scrub_dead_partners(state.nbr_idx, state.active))


def maybe_rebuild_neighbors(state: ParticleState, cfg: DEMConfig,
                            force: bool = False) -> ParticleState:
    """Verlet-skin rebuild check (binned backend only)."""
    if cfg.backend == "lattice":
        from sedifoam_tpu.dem import lattice as _lat

        geom = _lat.make_geom(cfg)

        def do_rebuild_lat(st: ParticleState) -> ParticleState:
            new_slot, _overflow = _lat.bin_slots(geom, st.pos, st.active)
            shear = _lat.carry_shear_lattice(
                st.nbr_idx, new_slot, st.shear, geom, st.n_capacity,
                k_compact=max(16, cfg.nbr_k))
            return st._replace(nbr_idx=new_slot, shear=shear,
                               pos_at_build=st.pos)

        if force:
            return do_rebuild_lat(state)
        disp = state.pos - state.pos_at_build
        for a in range(3):
            if cfg.periodic[a]:
                L = cfg.domain_hi[a] - cfg.domain_lo[a]
                da = disp[:, a]
                disp = disp.at[:, a].set(da - L * jnp.round(da / L))
        max_d2 = jnp.max(jnp.sum(disp * disp, axis=-1) * state.active)
        need = max_d2 > (0.5 * cfg.skin) ** 2
        return jax.lax.cond(need, do_rebuild_lat, lambda st: st, state)

    if cfg.backend != "binned":
        return state
    from sedifoam_tpu.dem.neighbor import (carry_over_shear, make_binner,
                                           make_sort_order,
                                           permute_particle_state)

    rebuild_fn = make_binner(cfg.domain_lo, cfg.domain_hi, cfg.cutoff,
                             cfg.nbr_k, cfg.max_per_bin,
                             periodic=cfg.periodic,
                             audit_ring=cfg.audit_ring)
    sort_fn = make_sort_order(cfg.domain_lo, cfg.domain_hi, cfg.cutoff,
                              periodic=cfg.periodic) \
        if cfg.sort_on_rebuild else None

    def do_rebuild(st: ParticleState) -> ParticleState:
        if sort_fn is not None:
            st = permute_particle_state(st, sort_fn(st.pos, st.active))
        idx, dropped = rebuild_fn(st.pos, st.active)
        if st.rigid is not None:
            # intra-body contacts are excluded at the TABLE (rebuild-time
            # scrub, zero per-substep cost): members at fixed overlap
            # exert central equal-opposite forces that cancel in the body
            # sums anyway (dem/rigid.py module docstring)
            from sedifoam_tpu.dem.rigid import scrub_same_mol
            idx = scrub_same_mol(idx, st.mol)
        shear = carry_over_shear(st.nbr_idx, idx, st.shear)
        return st._replace(nbr_idx=idx, shear=shear, pos_at_build=st.pos,
                           nbr_dropped=jnp.maximum(st.nbr_dropped, dropped))

    if force:
        return do_rebuild(state)

    disp = state.pos - state.pos_at_build
    for a in range(3):
        if cfg.periodic[a]:
            L = cfg.domain_hi[a] - cfg.domain_lo[a]
            da = disp[:, a]
            disp = disp.at[:, a].set(da - L * jnp.round(da / L))
    max_d2 = jnp.max(jnp.sum(disp * disp, axis=-1) * state.active)
    need = max_d2 > (0.5 * cfg.skin) ** 2
    return jax.lax.cond(need, do_rebuild, lambda st: st, state)


def compute_forces(state: ParticleState, cfg: DEMConfig,
                   step_time: float = 0.0, shearupdate: bool = True
                   ) -> ParticleState:
    """Total force/torque + contact history update, LAMMPS fix order."""
    dt = cfg.dt
    plen = cfg.periodic_len()
    fused_wall_shear = None
    if cfg.backend == "binned":
        import jax as _jax
        if cfg.fused_chain and _jax.default_backend() == "tpu" and \
                state.pos.dtype == jnp.float32:
            from sedifoam_tpu.dem.fused import (pair_forces_binned_fused,
                                                walls_fusible)
            fuse_walls = cfg.walls if walls_fusible(cfg.walls) else ()
            f_pair, tq_pair, shear, fused_wall_shear = \
                pair_forces_binned_fused(
                    state, cfg.pair, dt, state.nbr_idx, shearupdate,
                    periodic_len=plen, walls=fuse_walls)
        else:
            from sedifoam_tpu.dem.neighbor import pair_forces_binned
            f_pair, tq_pair, shear = pair_forces_binned(
                state, cfg.pair, dt, state.nbr_idx, shearupdate,
                periodic_len=plen)
    elif cfg.backend == "lattice":
        from sedifoam_tpu.dem import lattice as _lat
        if cfg.cohesion is not None or cfg.lubrication is not None:
            raise NotImplementedError(
                "cohesion/lubrication are not wired for the lattice "
                "backend; use backend='binned'")
        geom = _lat.make_geom(cfg)
        f_pair, tq_pair, shear = _lat.lattice_pair_forces(
            state, cfg, geom, state.nbr_idx, state.shear, shearupdate)
    else:
        f_pair, tq_pair, shear = pair_forces(state, cfg.pair, dt, shearupdate,
                                             periodic_len=plen)
    if fused_wall_shear is not None:
        # wall pass already fused into the pair kernel
        f_wall = jnp.zeros_like(state.vel)
        tq_wall = jnp.zeros_like(state.vel)
        wall_shear = fused_wall_shear
    else:
        f_wall, tq_wall, wall_shear = wall_forces(
            state, cfg.walls, dt, step_time, shearupdate)

    g = jnp.asarray(cfg.gravity, state.vel.dtype)
    f_grav = state.mass[:, None] * g[None, :]

    # fix fdrag post_force (fix_fluid_drag.cpp:114-164)
    f_drag = state.fdrag
    v_old = state.v_old
    if cfg.carrier_rho != 0.0:
        acc = (state.vel - v_old) / dt
        f_drag = f_drag + (cfg.carrier_rho / state.density)[:, None] * (
            0.5 * state.mass[:, None] * (state.dudt - acc))
    v_old = state.vel

    if cfg.backend == "binned":
        from sedifoam_tpu.dem.cohesion import cohesion_forces_binned
        f_cohe = cohesion_forces_binned(state, cfg.cohesion, state.nbr_idx,
                                        periodic_len=plen)
    else:
        f_cohe = cohesion_forces(state, cfg.cohesion, periodic_len=plen)

    force = f_pair + f_wall + f_grav + f_drag + f_cohe
    torque = tq_pair + tq_wall

    if cfg.lubrication is not None:
        # wall-bounded suspension volume for the VF-corrected FLD terms
        # (pair_lubricate_poly.cpp:514-539, recomputed per step for
        # moving walls :152-177); falls back to the data-file box when
        # no plane walls bound the domain
        from sedifoam_tpu.dem.lubrication import wall_bounded_volume
        vol_T = None
        if cfg.walls:
            vol_T = wall_bounded_volume(cfg.domain_lo, cfg.domain_hi,
                                        cfg.walls, step_time)
        if cfg.backend == "binned":
            from sedifoam_tpu.dem.lubrication import (
                lubrication_forces_binned)
            f_lub, tq_lub = lubrication_forces_binned(
                state, cfg.lubrication, state.nbr_idx, periodic_len=plen,
                vol_T=vol_T)
        else:
            from sedifoam_tpu.dem.lubrication import lubrication_forces
            f_lub, tq_lub = lubrication_forces(state, cfg.lubrication,
                                               periodic_len=plen,
                                               vol_T=vol_T)
        force = force + f_lub
        torque = torque + tq_lub

    if cfg.frozen_types:
        # `fix ... freeze` post_force (defined after all force fixes in
        # every reference case that uses it): zero total force/torque so
        # nve/sphere leaves the frozen bed at rest
        frozen = jnp.zeros_like(state.active)
        for t in cfg.frozen_types:
            frozen = frozen | (state.ptype == t)
        force = jnp.where(frozen[:, None], 0.0, force)
        torque = jnp.where(frozen[:, None], 0.0, torque)

    amask = state.active[:, None]
    return state._replace(
        force=jnp.where(amask, force, 0.0),
        torque=jnp.where(amask, torque, 0.0),
        shear=shear,
        wall_shear=wall_shear,
        v_old=jnp.where(amask, v_old, 0.0),
    )


def setup_forces(state: ParticleState, cfg: DEMConfig,
                 step_time: float = 0.0) -> ParticleState:
    """LAMMPS setup(): compute initial forces without advancing shear."""
    state = maybe_rebuild_neighbors(state, cfg, force=True)
    return compute_forces(state, cfg, step_time, shearupdate=False)


def _substep(state: ParticleState, cfg: DEMConfig, step_time):
    dtf = 0.5 * cfg.dt
    minv = jnp.where(state.active, 1.0 / state.mass, 0.0)[:, None]
    iinv = jnp.where(state.active,
                     1.0 / (_INERTIA * state.mass * state.radius ** 2),
                     0.0)[:, None]

    # initial_integrate (nve/sphere)
    vel = state.vel + dtf * state.force * minv
    pos = state.pos + cfg.dt * vel * state.active[:, None]
    # periodic wrap (LAMMPS Domain::pbc / softParticle.C cyclic transforms)
    for a in range(3):
        if cfg.periodic[a]:
            lo = cfg.domain_lo[a]
            L = cfg.domain_hi[a] - lo
            pos = pos.at[:, a].set(lo + jnp.mod(pos[:, a] - lo, L))
    omega = state.omega + dtf * state.torque * iinv
    state = state._replace(pos=pos, vel=vel, omega=omega)

    # rigid clumps (fix rigid/small molecule): body velocity-Verlet
    # OVERWRITES member pos/vel/omega — the per-particle drift above is
    # discarded for members (dem/rigid.py)
    if state.rigid is not None:
        from sedifoam_tpu.dem import rigid as _rig
        state = _rig.initial_integrate(state, cfg.dt, cfg.domain_lo,
                                       cfg.domain_hi, cfg.periodic)

    # neighbor maintenance + forces at the new positions
    state = maybe_rebuild_neighbors(state, cfg)
    state = compute_forces(state, cfg, step_time, shearupdate=True)

    # final_integrate
    vel = state.vel + dtf * state.force * minv
    omega = state.omega + dtf * state.torque * iinv
    state = state._replace(vel=vel, omega=omega)
    if state.rigid is not None:
        from sedifoam_tpu.dem import rigid as _rig
        state = _rig.final_integrate(state, cfg.dt)
    return state


def run_dem(state: ParticleState, cfg: DEMConfig, n_steps: int,
            t0: float = 0.0) -> ParticleState:
    """Advance n_steps DEM substeps (lammps_step equivalent)."""

    def body(carry, i):
        return _substep(carry, cfg, t0 + i * cfg.dt), None

    state, _ = jax.lax.scan(body, state, jnp.arange(n_steps))
    return state
