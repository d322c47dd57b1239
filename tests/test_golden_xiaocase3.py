"""Golden test: xiaocase3 — single-particle entrainment in upward flow.

Reference case: cases/auto-testing/test-cases/xiaocase3: a 0.083 mm,
2000 kg/m^3 sphere starts at rest in a 4x4x0.5 mm quasi-2D duct with a
0.05 m/s upward inflow and zero gravity; drag + pressure-gradient forces
accelerate it to the fluid velocity. The reference validates the particle
velocity time-series against data/xiaoCase3.dat (Xiao & Sun 2011) and
data/lammps08.dat.

This is the SURVEY.md §7 "minimum end-to-end slice": laminar PISO +
SyamlalOBrien drag + 1 particle + no contacts.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu import bc
from sedifoam_tpu.config import (CloudConfig, DEMConfig, FluidConfig,
                                 PISOConfig, PairParams, WallSpec)
from sedifoam_tpu.dem.state import make_particles
from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
from sedifoam_tpu.grid import Grid
from sedifoam_tpu.solver import (SimConfig, adjust_dem_timestep,
                                 coupled_step, initialize, make_step_fn)

DATA = os.path.join(os.path.dirname(__file__), "golden_data")


def make_xiaocase3():
    """Build the case from the reference's own dictionaries (cited inline)."""
    # blockMeshDict: 4x4x0.5 mm box, 10x10x1 cells
    grid = Grid(nx=10, ny=10, nz=1, dx=4e-4, dy=4e-4, dz=5e-4)

    emp = bc.PatchBC(bc.EMPTY)
    # 0/Ub: inlet (ym) fixedValue (0 0.05 0); outlet (yp) inletOutlet;
    # walls (xm, xp) fixedValue 0
    vin = 0.05
    bcs = FluidBCs(
        alpha=bc.make_field_bc({
            "ym": bc.PatchBC(bc.FIXED_VALUE, (0.0,)),
            "yp": bc.PatchBC(bc.INLET_OUTLET, (0.0,)),
            "xm": bc.PatchBC(bc.ZERO_GRADIENT),
            "xp": bc.PatchBC(bc.ZERO_GRADIENT),
            "zm": emp, "zp": emp}),
        p=bc.make_field_bc({
            "ym": bc.PatchBC(bc.ZERO_GRADIENT),
            "yp": bc.PatchBC(bc.FIXED_VALUE, (0.0,)),
            "xm": bc.PatchBC(bc.ZERO_GRADIENT),
            "xp": bc.PatchBC(bc.ZERO_GRADIENT),
            "zm": emp, "zp": emp}),
        Ub=bc.make_field_bc({
            "ym": bc.PatchBC(bc.FIXED_VALUE, (0.0, vin, 0.0)),
            "yp": bc.PatchBC(bc.INLET_OUTLET, (0.0, 0.0, 0.0)),
            "xm": bc.PatchBC(bc.FIXED_VALUE, (0.0, 0.0, 0.0)),
            "xp": bc.PatchBC(bc.FIXED_VALUE, (0.0, 0.0, 0.0)),
            "zm": emp, "zp": emp}),
        Ua=bc.make_field_bc({"zm": emp, "zp": emp},
                            default=bc.PatchBC(bc.ZERO_GRADIENT,
                                               (0.0, 0.0, 0.0))),
    )

    # controlDict: deltaT 2e-5; in.lammps: timestep 2e-7 -> 100 substeps;
    # cloudProperties: subCycles 1
    dt_fluid = 2e-5
    dt_dem, sub_cycles, sub_steps = adjust_dem_timestep(dt_fluid, 2e-7, 1)

    fluid_cfg = FluidConfig(
        dt=dt_fluid, rhob=1000.0, nub=1e-6, rhoa=2000.0,
        Cvm=0.0, Cl=0.0, gravity=(0.0, 0.0, 0.0),
        piso=PISOConfig(n_correctors=2, p_tol=1e-10),
    )
    # cloudProperties: dragModel SyamlalOBrien; diffusionBandWidth 2e-4
    cloud_cfg = CloudConfig(
        drag_model="SyamlalOBrien",
        sub_cycles=sub_cycles, sub_steps=sub_steps,
        diffusion_band_width=2e-4, diffusion_steps=6,
    )
    # in.lammps: pair gran/hooke/history 5000 NULL 11200 NULL 0.1 0;
    # walls at x/y/z box faces; gravity magnitude 0; fix fdrag (no rho arg)
    pair = PairParams(style="hooke_history", kn=5000.0, kt=None,
                      gamman=11200.0, gammat=None, xmu=0.1, dampflag=0)
    walls = (
        WallSpec(style="xplane", lo=0.0, hi=0.004, params=pair),
        WallSpec(style="yplane", lo=0.0, hi=0.004, params=pair),
        WallSpec(style="zplane", lo=0.0, hi=0.0005, params=pair),
    )
    dem_cfg = DEMConfig(dt=dt_dem, pair=pair, walls=walls,
                        gravity=(0.0, 0.0, 0.0), carrier_rho=0.0)

    cfg = SimConfig(grid=grid, bcs=bcs, fluid=fluid_cfg, cloud=cloud_cfg,
                    dem=dem_cfg)

    # IC_uniform.in: one atom, d=8.3e-5, rho=2000, at (2e-3, 1.9e-3, 2.5e-4)
    particles = make_particles(
        pos=[[2.0e-3, 1.9e-3, 2.5e-4]], radius=8.3e-5 / 2.0,
        density=2000.0, capacity=1, n_walls=len(walls))

    fluid = init_fluid(grid, Ub=jnp.zeros((3,) + grid.shape).at[1].set(vin))
    return cfg, fluid, particles


@pytest.mark.slow
def test_xiaocase3_settling_curve():
    cfg, fluid, particles = make_xiaocase3()
    state = initialize(fluid, particles, cfg)

    step = make_step_fn(cfg)
    n_steps = 250  # endTime 0.005 / deltaT 2e-5
    times, vels = [], []
    for i in range(n_steps):
        state = step(state)
        times.append((i + 1) * cfg.fluid.dt)
        vels.append(float(state.particles.vel[0, 1]))

    times = np.asarray(times)
    vels = np.asarray(vels)

    bench = np.loadtxt(os.path.join(DATA, "xiaoCase3.dat"))
    vb = np.interp(times, bench[:, 0], bench[:, 1])

    # terminal velocity: fluid velocity (no gravity) ~0.0504 in benchmark
    assert abs(vels[-1] - vb[-1]) < 0.05 * 0.05
    # curve-level agreement over the rise (skip the first few transients)
    mask = times > 2e-4
    err = np.max(np.abs(vels[mask] - vb[mask]))
    assert err < 0.004, f"max deviation {err:.4g} m/s vs benchmark"


def test_xiaocase3_short_sanity():
    """Cheap smoke: after 25 steps the particle is accelerating upward."""
    cfg, fluid, particles = make_xiaocase3()
    state = initialize(fluid, particles, cfg)
    step = make_step_fn(cfg)
    for _ in range(25):
        state = step(state)
    v = float(state.particles.vel[0, 1])
    # benchmark: v(5e-4 s) ~ 0.026 m/s
    assert 0.01 < v < 0.045
    assert bool(jnp.isfinite(state.fluid.p).all())
    assert bool(jnp.isfinite(state.fluid.Ub).all())
    # particle hasn't moved far yet
    assert abs(float(state.particles.pos[0, 1]) - 1.9e-3) < 5e-4
