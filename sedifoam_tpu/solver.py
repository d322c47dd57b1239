"""The coupled CFD-DEM solver: one jittable step.

Reproduces the lammpsFoam main loop (lammpsFoam/lammpsFoam.C:52-129):

  init:  particleToEulerianField -> alpha/Ua; initial UfSmoothed;
         liftDragCoeffs (calcTcFields)
  step:  UEqns + PISO + gradP.adjust + turbulence + DDtU   (fluid)
         moveParticles: evolve() (subcycled DEM + averaging) (particles)
         liftDragCoeffs: alpha cap + Asrc + lift            (coupling)

The whole step — including the subcycled DEM scan, the diffusion
smoothing solves, and the pressure PCG — is one XLA computation; there
are no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sedifoam_tpu.config import CloudConfig, DEMConfig, FluidConfig
from sedifoam_tpu.coupling import cloud as _cloud
from sedifoam_tpu.coupling import transfer as _transfer
from sedifoam_tpu.dem import integrate as _dem
from sedifoam_tpu.dem.state import ParticleState
from sedifoam_tpu.fluid.state import FluidBCs, FluidState
from sedifoam_tpu.fluid.step import advance_time, fluid_step
from sedifoam_tpu.grid import Grid


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Full static configuration of a coupled case (hashable)."""

    grid: Grid
    bcs: FluidBCs
    fluid: FluidConfig
    cloud: CloudConfig
    dem: DEMConfig


class SimState(NamedTuple):
    fluid: FluidState
    particles: ParticleState
    uf_smoothed: jnp.ndarray       # current smoothed fluid velocity
    uf_smoothed_old: jnp.ndarray   # previous step's (history force)


def initialize(fluid: FluidState, particles: ParticleState,
               cfg: SimConfig) -> SimState:
    """enhancedCloud ctor + pre-loop liftDragCoeffs (jitted: some backends
    only support the full op set through XLA compilation)."""
    return jax.jit(lambda f, p: _initialize_impl(f, p, cfg))(fluid, particles)


def _initialize_impl(fluid: FluidState, particles: ParticleState,
                     cfg: SimConfig) -> SimState:
    grid, bcs = cfg.grid, cfg.bcs
    smooth = _cloud._smooth_fn(grid, cfg.cloud)

    particles = particles._replace(
        time_to_add=jnp.asarray(cfg.cloud.add_interval,
                                particles.pos.dtype),
        rng_key=jax.random.PRNGKey(0))
    particles = _dem.setup_forces(particles, cfg.dem)

    alpha, Ua = _transfer.particle_to_eulerian(
        particles, grid, smooth, cfg.cloud.alpha_smooth, cfg.cloud.up_smooth)
    fluid = fluid._replace(alpha=alpha, Ua=Ua, alpha_old=alpha, Ua_old=Ua)

    if cfg.cloud.uf_smooth:
        uf_smoothed = _transfer.weighted_smooth_uf(fluid.Ub, alpha, smooth)
    else:
        uf_smoothed = fluid.Ub

    fluid = _cloud.lift_drag_coeffs(fluid, particles, uf_smoothed, grid,
                                    bcs, cfg.cloud, cfg.fluid)
    return SimState(fluid, particles, uf_smoothed, uf_smoothed)


def need_ddtu(cfg: SimConfig) -> bool:
    """DDtU.H consumers: the Cvm virtual-mass RHS (piso.assemble_ub_eqn),
    the particle added-mass force (coupling/forces.py), and fix fdrag's
    carrier_rho correction (dem/integrate.py). With all three off, the
    material derivatives are dead work (one full TVD convection pass per
    phase per step) and are skipped — exact zeros flow instead."""
    return (cfg.fluid.Cvm != 0.0 or cfg.cloud.particle_added_mass
            or cfg.dem.carrier_rho != 0.0)


def coupled_step(state: SimState, cfg: SimConfig) -> SimState:
    """One fluid timestep of the coupled system."""
    grid, bcs = cfg.grid, cfg.bcs
    fluid, particles = state.fluid, state.particles

    fluid = advance_time(fluid, cfg.fluid)
    fluid = fluid_step(fluid, grid, bcs, cfg.fluid, advance=False,
                       need_ddtu=need_ddtu(cfg))

    fluid, particles, uf_smoothed = _cloud.evolve(
        fluid, particles, state.uf_smoothed, grid, bcs,
        cfg.cloud, cfg.dem, cfg.fluid)

    fluid = _cloud.lift_drag_coeffs(fluid, particles, uf_smoothed, grid,
                                    bcs, cfg.cloud, cfg.fluid)

    return SimState(fluid, particles, uf_smoothed, state.uf_smoothed)


def make_step_fn(cfg: SimConfig, n_sub: int = 1):
    """A jitted function advancing n_sub coupled steps."""

    @jax.jit
    def run(state: SimState) -> SimState:
        if n_sub == 1:
            return coupled_step(state, cfg)

        def body(s, _):
            return coupled_step(s, cfg), None

        state, _ = jax.lax.scan(body, state, None, length=n_sub)
        return state

    return run


def adjust_dem_timestep(dt_fluid: float, dt_dem_in: float, sub_cycles: int):
    """softParticleCloud::adjustLampTimestep (softParticleCloud.C:209-261).

    Returns (dt_dem_adjusted, sub_cycles, sub_steps).

    Matches the reference exactly, including its quirk: solidStepsPerDt is
    truncated down to a multiple of subCycles while the DEM dt stays
    dtFluid/dnSub, so for non-divisible ratios the DEM advances less than
    one fluid step per coupled step (softParticleCloud.C:219-221 truncate,
    :224 dtLampAdj). The reference's FatalError for a nonzero remainder is
    unreachable after that truncation; we warn loudly instead of silently
    reproducing the mismatch.
    """
    dn_sub = round(dt_fluid / dt_dem_in)
    if dn_sub == 0:
        dn_sub = 1
    solid_steps = (int(dn_sub) // int(sub_cycles)) * int(sub_cycles)
    if solid_steps != int(dn_sub):
        import warnings
        warnings.warn(
            f"adjust_dem_timestep: dtFluid/dtDEM rounds to {int(dn_sub)} "
            f"substeps, not divisible by subCycles={sub_cycles}; truncating "
            f"to {solid_steps} (DEM advances {solid_steps}/{int(dn_sub)} of "
            "each fluid step — same as the reference's silent truncation at "
            "softParticleCloud.C:219-224). Pick dt values so that "
            "round(dtFluid/dtDEM) is a multiple of subCycles.",
            stacklevel=2)
    dt_dem = dt_fluid / dn_sub
    if sub_cycles >= solid_steps:
        return dt_dem, solid_steps, 1
    sub_steps, extra = divmod(solid_steps, sub_cycles)
    if extra != 0:
        raise ValueError(
            f"subCycles {sub_cycles} does not divide {solid_steps} DEM steps")
    return dt_dem, sub_cycles, sub_steps
