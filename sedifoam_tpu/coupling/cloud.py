"""Subcycled particle evolution (enhancedCloud::evolve,
enhancedCloud.C:669-787) and the post-move coupling-source computation
(calcTcFields via liftDragCoeffs.H).

Per fluid step:
  1. UfSmoothed = smooth((1-gamma) Uf)/(1-gamma)
  2. for k in subCycles:
       - Uri refresh, 7-force per-particle sum (forces.py)
       - subSteps DEM substeps with the force held constant (fdrag fix)
       - delete particles that left the domain (the OpenFOAM wall-patch
         delete: softParticle.C:177-184)
       - k == 0: particleToEulerianField -> (alpha, Ua)
  3. liftDragCoeffs.H: cap alpha, calcTcFields -> Asrc, lift coefficient
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax.numpy as jnp

from sedifoam_tpu import bc as _bc
from sedifoam_tpu import ops
from sedifoam_tpu.config import CloudConfig, DEMConfig, FluidConfig
from sedifoam_tpu.coupling import drag as _drag
from sedifoam_tpu.coupling import forces as _forces
from sedifoam_tpu.coupling import smoothing as _smoothing
from sedifoam_tpu.coupling import transfer as _transfer
from sedifoam_tpu.dem import integrate as _dem
from sedifoam_tpu.dem.state import ParticleState
from sedifoam_tpu.fluid.state import FluidBCs, FluidState
from sedifoam_tpu.grid import Grid


def _smooth_fn(grid: Grid, ccfg: CloudConfig):
    return partial(_smoothing.smooth, grid=grid,
                   bandwidth=ccfg.diffusion_band_width,
                   steps=ccfg.diffusion_steps,
                   direction=ccfg.smooth_direction)


def _delete_outside(state: ParticleState, grid: Grid, dcfg: DEMConfig
                    ) -> ParticleState:
    """Deactivate particles that left the fluid domain (OpenFOAM deletes
    them on wall-patch hit during Cloud::move). Periodic (cyclic) axes
    never delete — particles wrap instead (softParticle.C:186-198).

    A delete event also scrubs the neighbor tables (lax.cond-gated on an
    actual deletion) so stale partners exert no forces — the reference
    removes the atom from LAMMPS outright (library.cpp:492-621)."""
    import jax as _jax
    lo = (grid.x0, grid.y0, grid.z0)
    hi = grid.hi
    inside = jnp.ones(state.pos.shape[0], bool)
    for a in range(3):
        if not dcfg.periodic[a]:
            inside &= (state.pos[:, a] >= lo[a]) & (state.pos[:, a] <= hi[a])
    new_active = state.active & inside
    deleted = jnp.any(new_active != state.active)
    state = state._replace(active=new_active)
    return _jax.lax.cond(deleted,
                         lambda st: _dem.scrub_deactivated(st, dcfg),
                         lambda st: st, state)


def evolve(fluid: FluidState, particles: ParticleState,
           uf_smoothed_old, grid: Grid, bcs: FluidBCs,
           ccfg: CloudConfig, dcfg: DEMConfig, fcfg: FluidConfig
           ) -> Tuple[FluidState, ParticleState, jnp.ndarray]:
    """One full evolve(). Returns (fluid', particles', UfSmoothed)."""
    smooth = _smooth_fn(grid, ccfg)
    gamma = fluid.alpha

    uf = fluid.Ub
    if ccfg.uf_smooth:
        uf_smoothed = _transfer.weighted_smooth_uf(uf, gamma, smooth)
    else:
        uf_smoothed = uf

    # frozen during the subcycle loop (p, Ub unchanged inside evolve)
    grad_p = ops.grad(fluid.p, grid, bcs.p, t=fluid.time)
    curl_u = ops.curl(fluid.Ub, grid, bcs.Ub, t=fluid.time)

    # static injection sites (findAddParticleCells analogue)
    inject_on = ccfg.add_particle > 0 or ccfg.delete_particle > 0
    if inject_on:
        from sedifoam_tpu.dem import inject as _inject
        sites = jnp.asarray(_inject.seed_positions(
            grid, ccfg.add_box, ccfg.reduce_number_factor))

    alpha, Ua = fluid.alpha, fluid.Ua
    for k in range(ccfg.sub_cycles):
        if inject_on:
            particles_, tta, key, added, deleted = _inject.maybe_add_delete(
                particles, particles.time_to_add, particles.rng_key,
                sites, grid, ccfg, fcfg.dt)
            particles = particles_._replace(time_to_add=tta, rng_key=key)

            # newly ADDED particles need fresh neighbor tables / forces
            # (their reused slots carry stale rows) — but only when an
            # add actually fired (every addParticleTimeStep, not every
            # coupled step). Deletions alone skip the rebuild but must
            # scrub stale partners out of the tables
            # (tests/test_ghost_partner.py).
            def _setup(st):
                st = _dem.maybe_rebuild_neighbors(st, dcfg, force=True)
                return _dem.compute_forces(st, dcfg, shearupdate=False)

            import jax as _jax

            def _no_add(st):
                return _jax.lax.cond(
                    deleted, lambda s: _dem.scrub_deactivated(s, dcfg),
                    lambda s: s, st)

            particles = _jax.lax.cond(added, _setup, _no_add, particles)

        p_drag, p_dudt, particles = _forces.particle_forces(
            particles, uf_smoothed, uf_smoothed_old, grad_p, curl_u,
            fluid.DDtUb, grid, ccfg, fcfg, alpha, fluid.step,
            need_dudt=(ccfg.particle_added_mass or dcfg.carrier_rho != 0.0))

        vel_before = particles.vel
        particles = particles._replace(fdrag=p_drag, dudt=p_dudt)
        particles = _dem.run_dem(particles, dcfg, ccfg.sub_steps,
                                 t0=float(0.0))
        # p.UOld() = pre-DEM velocity (softParticleCloud.C:570)
        particles = particles._replace(vel_fluid_old=vel_before)

        if ccfg.delete_outside:
            particles = _delete_outside(particles, grid, dcfg)

        if k == 0:
            alpha, Ua = _transfer.particle_to_eulerian(
                particles, grid, smooth, ccfg.alpha_smooth, ccfg.up_smooth)

    fluid = fluid._replace(alpha=alpha, Ua=Ua)
    return fluid, particles, uf_smoothed


def lift_drag_coeffs(fluid: FluidState, particles: ParticleState,
                     uf_smoothed, grid: Grid, bcs: FluidBCs,
                     ccfg: CloudConfig, fcfg: FluidConfig) -> FluidState:
    """liftDragCoeffs.H + calcTcFields: alpha cap, Asrc, lift coefficient."""
    smooth = _smooth_fn(grid, ccfg)

    # cap unphysical alpha (liftDragCoeffs.H:6-14)
    alpha = jnp.minimum(fluid.alpha, fcfg.max_possible_alpha)

    # calcTcFields: per-particle Jd at current state (alpha + Uf in one
    # packed row gather)
    cells = _transfer.particle_cells(particles, grid)
    p_alpha, uf_at_p = _transfer.gather_fields(cells, alpha, uf_smoothed)
    uri = uf_at_p - particles.vel
    mag_uri = jnp.sqrt(jnp.sum(uri * uri, axis=-1))
    d = jnp.maximum(2.0 * particles.radius, 1e-300)
    jd_vals = _drag.jd(ccfg.drag_model, mag_uri, p_alpha, d,
                       fcfg.nub, fcfg.rhob)

    if ccfg.semi_implicit_drag:
        # dormant reference branch (enhancedCloud.C:338-360): Omega on the
        # momentum diagonal makes stiff gas-solid drag unconditionally
        # stable; Asrc carries omg*U_p through the flux
        drag_coef, asrc = _transfer.calc_omega_asrc_semi(
            particles, jd_vals, grid)
    else:
        asrc = _transfer.calc_asrc(particles, jd_vals, uf_smoothed, alpha,
                                   grid, smooth, ccfg.drag_smooth,
                                   uf_at_p=uf_at_p)
        # Omega_ *= 0 (enhancedCloud.C:391): implicit drag disabled
        drag_coef = jnp.zeros_like(alpha)

    # liftCoeff = Cl*beta*rhob*(Ur ^ curl U)  (liftDragCoeffs.H:23)
    if fcfg.Cl != 0.0:
        beta = 1.0 - alpha
        Ur = fluid.Ua - fluid.Ub
        U_mix = alpha[None] * fluid.Ua + beta[None] * fluid.Ub
        curl_U = ops.curl(U_mix, grid, _bc.uniform_bc(_bc.ZERO_GRADIENT,
                                                      (0.0, 0.0, 0.0)))
        lift = fcfg.Cl * (beta * fcfg.rhob)[None] * jnp.cross(
            Ur, curl_U, axisa=0, axisb=0, axisc=0)
    else:
        # Cl == 0 makes the whole term exact zeros — skip the mixture
        # curl (one full stencil pass per step, ~0.5 ms at the bench
        # grid; XLA cannot fold 0*x under IEEE semantics)
        lift = jnp.zeros_like(fluid.lift_coeff)

    return fluid._replace(alpha=alpha, Asrc=asrc, drag_coef=drag_coef,
                          lift_coeff=lift)
