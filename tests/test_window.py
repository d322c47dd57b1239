"""Active-window DEM stepping (runtime/window.py).

The round-4 jetFlow full-stage stall traced to capacity-sized DEM
tables on a near-empty injection case; the window keeps the table at
the live population. These tests pin (a) the slice/grow round trip
incl. neighbor-sentinel remapping, (b) physics equality between a
windowed and a full-capacity run of an injection case.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from sedifoam_tpu import bc
from sedifoam_tpu.config import (CloudConfig, DEMConfig, FluidConfig,
                                 PISOConfig, PairParams)
from sedifoam_tpu.dem.state import make_particles
from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
from sedifoam_tpu.grid import Grid
from sedifoam_tpu.runtime import window as win
from sedifoam_tpu.runtime.runner import Simulation
from sedifoam_tpu.solver import SimConfig, initialize


def _inject_case(capacity=8192):
    """Tiny fluidized column that injects particles near the bottom
    every 2 steps and deletes them near the top (jetFlow pattern)."""
    nx, ny, nz = 6, 12, 6
    dx = 2e-3
    grid = Grid(nx=nx, ny=ny, nz=nz, dx=dx, dy=dx, dz=dx)
    zg3 = bc.PatchBC(bc.ZERO_GRADIENT, (0.0, 0.0, 0.0))
    vin = 0.1
    bcs = FluidBCs(
        alpha=bc.make_field_bc({
            "ym": bc.PatchBC(bc.FIXED_VALUE, (0.0,)),
            "yp": bc.PatchBC(bc.INLET_OUTLET, (0.0,))}),
        p=bc.make_field_bc({"yp": bc.PatchBC(bc.FIXED_VALUE, (0.0,))}),
        Ub=bc.make_field_bc({
            "ym": bc.PatchBC(bc.FIXED_VALUE, (0.0, vin, 0.0)),
            "yp": bc.PatchBC(bc.INLET_OUTLET, (0.0, 0.0, 0.0))},
            default=bc.PatchBC(bc.FIXED_VALUE, (0.0, 0.0, 0.0))),
        Ua=bc.make_field_bc({}, default=zg3),
    )
    dt = 1e-4
    fluid_cfg = FluidConfig(
        dt=dt, rhob=1000.0, nub=1e-6, gravity=(0.0, -9.81, 0.0),
        piso=PISOConfig(n_correctors=1, p_tol=1e-6, p_max_iter=60))
    L = (nx * dx, ny * dx, nz * dx)
    cloud_cfg = CloudConfig(
        drag_model="ErgunWenYu", sub_cycles=1, sub_steps=4,
        diffusion_band_width=2 * dx, diffusion_steps=2,
        particle_buoyancy=True,
        add_particle=1, add_interval=2 * dt,
        add_box=(0.25 * L[0], 0.75 * L[0], 0.1 * L[1], 0.3 * L[1],
                 0.25 * L[2], 0.75 * L[2]),
        add_info=(5e-4, 2500.0, 1),
        add_velocity=(0.0, 0.4, 0.0),
        delete_particle=1,
        delete_box=(0.0, L[0], 0.9 * L[1], L[1], 0.0, L[2]))
    pair = PairParams(style="hertz_history", kn=1e4, gamman=0.5, xmu=0.3)
    dem_cfg = DEMConfig(dt=dt / 4, pair=pair, gravity=(0.0, -9.81, 0.0),
                        backend="binned", nbr_k=8, max_per_bin=8,
                        cutoff=8e-4, skin=1.5e-4,
                        domain_lo=(0.0, 0.0, 0.0), domain_hi=L)
    cfg = SimConfig(grid=grid, bcs=bcs, fluid=fluid_cfg, cloud=cloud_cfg,
                    dem=dem_cfg)
    pos = np.asarray([[L[0] / 2, 0.02 * L[1] + 2.6e-4, L[2] / 2]])
    particles = make_particles(pos, 2.5e-4, 2500.0, capacity=capacity,
                               n_walls=0, neighbor_k=8, dtype=jnp.float32)
    fluid = init_fluid(grid, dtype=jnp.float32)
    return cfg, initialize(fluid, particles, cfg)


def test_slice_grow_roundtrip_sentinels():
    cfg, state = _inject_case(capacity=8192)
    ps = state.particles
    w = 4096
    small = win.window_slice(ps, w)
    assert small.pos.shape == (w, 3)
    assert small.nbr_idx.shape == (ps.nbr_idx.shape[0], w)
    assert small.shear.shape[-1] == w
    # empty sentinel moved capacity -> w
    assert int(jnp.max(small.nbr_idx)) <= w
    assert bool(jnp.all((small.nbr_idx == w) | (small.nbr_idx < w)))

    back = win.window_grow(small, 8192)
    assert back.pos.shape == ps.pos.shape
    # active rows and their tables survive the round trip
    np.testing.assert_array_equal(np.asarray(back.active),
                                  np.asarray(ps.active))
    np.testing.assert_array_equal(np.asarray(back.pos),
                                  np.asarray(ps.pos))
    np.testing.assert_array_equal(np.asarray(back.nbr_idx),
                                  np.asarray(ps.nbr_idx))


def test_high_water_and_next_window():
    cfg, state = _inject_case(capacity=8192)
    assert int(win.high_water(state.particles)) == 1
    assert win.next_window(1, 0, 8192) == 2048
    assert win.next_window(1500, 2048, 8192) == 4096
    assert win.next_window(3000, 2048, 8192) == 8192
    assert win.next_window(9000, 2048, 8192) == 8192  # capped


def test_windowed_run_matches_full(tmp_path):
    """20 coupled steps with injection + deletion: the windowed runner
    (table 2048) reproduces the full-capacity run (table 8192) on every
    active particle, matched by tag."""
    cfg, state = _inject_case(capacity=8192)
    sim_full = Simulation(cfg, state, steps_per_host_visit=5,
                          active_window=False)
    sim_full.run(20 * cfg.fluid.dt)

    cfg2, state2 = _inject_case(capacity=8192)
    sim_win = Simulation(cfg2, state2, steps_per_host_visit=5,
                         active_window=True)
    assert sim_win.state.particles.n_capacity == 2048   # windowed
    sim_win.run(20 * cfg2.fluid.dt)

    pf, pw = sim_full.state.particles, sim_win.state.particles
    af, aw = np.asarray(pf.active), np.asarray(pw.active)
    tf = np.asarray(pf.tag)[af]
    tw = np.asarray(pw.tag)[aw]
    assert len(tf) > 2                                  # injection fired
    np.testing.assert_array_equal(np.sort(tf), np.sort(tw))
    of, ow = np.argsort(tf), np.argsort(tw)
    for name in ("pos", "vel", "omega"):
        xf = np.asarray(getattr(pf, name))[af][of]
        xw = np.asarray(getattr(pw, name))[aw][ow]
        np.testing.assert_allclose(xf, xw, rtol=0, atol=1e-6,
                                   err_msg=name)
    # the checkpoint of a windowed sim is full-capacity and resumable
    # by a full-capacity session
    ck = str(tmp_path / "w.npz")
    sim_win.save_checkpoint(ck)
    cfg3, state3 = _inject_case(capacity=8192)
    sim3 = Simulation(cfg3, state3, active_window=False)
    sim3.resume(ck)
    a3 = np.asarray(sim3.state.particles.active)
    np.testing.assert_array_equal(np.sort(np.asarray(
        sim3.state.particles.tag)[a3]), np.sort(tw))
