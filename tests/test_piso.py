"""Fluid PISO solver tests: single-phase sanity (alpha = 0).

With no particles the two-phase solver must behave as a standard
incompressible PISO — these check mass conservation and the analytic
Poiseuille profile for the channel-forcing path (chPressureGrad analog).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu import bc
from sedifoam_tpu.config import ChannelForcing, FluidConfig, PISOConfig
from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
from sedifoam_tpu.fluid.step import fluid_step
from sedifoam_tpu.grid import Grid


def _channel_setup(ny=16, G=0.02, H=0.01, nub=1e-5):
    """Periodic-x plane channel, walls at y=0,H, forced by gradPbar=G."""
    grid = Grid(nx=4, ny=ny, nz=1, dx=H / 4, dy=H / ny, dz=H)
    cyc = bc.PatchBC(bc.CYCLIC)
    wall0 = bc.PatchBC(bc.FIXED_VALUE, (0.0, 0.0, 0.0))
    emp = bc.PatchBC(bc.EMPTY)
    zg = bc.PatchBC(bc.ZERO_GRADIENT)
    bcs = FluidBCs(
        alpha=bc.make_field_bc({"xm": cyc, "xp": cyc, "zm": emp, "zp": emp}),
        p=bc.make_field_bc({"xm": cyc, "xp": cyc, "ym": zg, "yp": zg,
                            "zm": emp, "zp": emp}),
        Ub=bc.make_field_bc({"xm": cyc, "xp": cyc, "ym": wall0, "yp": wall0,
                             "zm": emp, "zp": emp},
                            default=bc.PatchBC(bc.ZERO_GRADIENT,
                                               (0.0, 0.0, 0.0))),
        Ua=bc.make_field_bc({"xm": cyc, "xp": cyc, "zm": emp, "zp": emp},
                            default=bc.PatchBC(bc.ZERO_GRADIENT,
                                               (0.0, 0.0, 0.0))),
    )
    cfg = FluidConfig(
        dt=2e-3, rhob=1000.0, nub=nub,
        piso=PISOConfig(n_correctors=2, p_tol=1e-12),
        forcing=ChannelForcing(mode="gradPbar", grad_pbar=G,
                               flow_direction=(1.0, 0.0, 0.0)),
    )
    fs = init_fluid(grid)
    return grid, bcs, cfg, fs


def test_poiseuille_steady_profile():
    G, H, nub = 0.02, 0.01, 1e-5
    grid, bcs, cfg, fs = _channel_setup(G=G, H=H, nub=nub)

    step = jax.jit(lambda s: fluid_step(s, grid, bcs, cfg))
    # viscous time scale H^2/nu = 10 s; run to near steady state
    for _ in range(3000):
        fs = step(fs)

    y = np.asarray(grid.cell_centers()[1][0, :, 0])
    u = np.asarray(fs.Ub[0][0, :, 0])
    u_exact = G / (2 * nub) * y * (H - y)
    # near-wall cells carry the O(h^2) FV wall-treatment difference
    np.testing.assert_allclose(u, u_exact, rtol=1.5e-2, atol=1e-4)
    # x-invariance
    np.testing.assert_allclose(np.asarray(fs.Ub[0]).std(axis=0).max(), 0.0,
                               atol=1e-10)


def test_continuity_after_piso():
    grid, bcs, cfg, fs = _channel_setup()
    step = jax.jit(lambda s: fluid_step(s, grid, bcs, cfg))
    for _ in range(5):
        fs = step(fs)
    from sedifoam_tpu import ops
    div_phib = np.asarray(ops.div_flux(fs.phib, grid))
    assert np.abs(div_phib).max() < 1e-8


def test_inlet_outlet_throughflow():
    """Uniform inflow through a straight duct stays uniform and conserves
    mass (xiaocase3 topology: fixedValue inlet, inletOutlet outlet)."""
    H = 0.004
    grid = Grid(nx=6, ny=10, nz=1, dx=H / 6, dy=H / 10, dz=5e-4)
    vin = 0.05
    inlet = bc.PatchBC(bc.FIXED_VALUE, (0.0, vin, 0.0))
    outlet_u = bc.PatchBC(bc.INLET_OUTLET, (0.0, 0.0, 0.0))
    wall0 = bc.PatchBC(bc.ZERO_GRADIENT, (0.0, 0.0, 0.0))  # slip-ish sanity
    emp = bc.PatchBC(bc.EMPTY)
    bcs = FluidBCs(
        alpha=bc.make_field_bc({"zm": emp, "zp": emp}),
        p=bc.make_field_bc({"ym": bc.PatchBC(bc.ZERO_GRADIENT),
                            "yp": bc.PatchBC(bc.FIXED_VALUE, (0.0,)),
                            "zm": emp, "zp": emp}),
        Ub=bc.make_field_bc({"ym": inlet, "yp": outlet_u, "zm": emp,
                             "zp": emp}, default=wall0),
        Ua=bc.make_field_bc({"zm": emp, "zp": emp}, default=wall0),
    )
    cfg = FluidConfig(dt=2e-5, rhob=1000.0, nub=1e-6,
                      piso=PISOConfig(n_correctors=2, p_tol=1e-12))
    fs = init_fluid(grid, Ub=jnp.zeros((3,) + grid.shape).at[1].set(vin))

    step = jax.jit(lambda s: fluid_step(s, grid, bcs, cfg))
    for _ in range(50):
        fs = step(fs)

    u = np.asarray(fs.Ub[1])
    np.testing.assert_allclose(u, vin, rtol=1e-3)
    # inflow == outflow
    qin = float(jnp.sum(fs.phib.y[:, 0]))
    qout = float(jnp.sum(fs.phib.y[:, -1]))
    np.testing.assert_allclose(qin, qout, rtol=1e-5)


def test_ibm_relaxation_zone():
    """IBM zone (createIBMForce.H): velocity driven to zero in marked cells."""
    import dataclasses
    grid, bcs, cfg, fs = _channel_setup()
    cfg = dataclasses.replace(cfg, add_ibm_force=True, ibm_relax_time=1e-4)
    ind = jnp.zeros(grid.shape).at[:, 6:10, :].set(1.0)
    fs = fs._replace(ibm_indicator=ind,
                     Ub=fs.Ub.at[0].set(0.01))
    step = jax.jit(lambda s: fluid_step(s, grid, bcs, cfg))
    for _ in range(200):
        fs = step(fs)
    u = np.asarray(fs.Ub[0][0, :, 0])
    # marked band is held near zero while the free region flows
    assert np.abs(u[6:10]).max() < 5e-4
    assert u[0:3].max() > 1e-3


def test_dns_forcing_injects_energy():
    """UO spectral forcing (calcDNSForce.H) stirs a periodic box."""
    import dataclasses
    from sedifoam_tpu.config import ChannelForcing
    grid = Grid(nx=8, ny=8, nz=8, dx=1e-2, dy=1e-2, dz=1e-2)
    cyc = bc.PatchBC(bc.CYCLIC)
    bcs = FluidBCs(*(bc.make_field_bc(
        {p: cyc for p in ("xm", "xp", "ym", "yp", "zm", "zp")},
        default=cyc) for _ in range(4)))
    cfg = FluidConfig(dt=1e-3, rhob=1000.0, nub=1e-6,
                      piso=PISOConfig(p_tol=1e-8, p_max_iter=300),
                      add_dns_force=True, dns_alpha=1.0, dns_sigma=5.0,
                      dns_k_upper=500.0)
    fs = init_fluid(grid)
    step = jax.jit(lambda s: fluid_step(s, grid, bcs, cfg))
    for _ in range(30):
        fs = step(fs)
    ke = float(jnp.mean(jnp.sum(fs.Ub ** 2, axis=0)))
    assert np.isfinite(ke) and ke > 1e-12
    # still (approximately) divergence-free despite the forcing — limited
    # by the pressure-solve tolerance relative to the stirring magnitude
    from sedifoam_tpu import ops
    div_max = float(jnp.abs(ops.div_flux(fs.phib, grid)).max())
    u_rms = float(jnp.sqrt(ke))
    assert div_max * grid.dx / max(u_rms, 1e-12) < 1e-2


def test_k_epsilon_homogeneous_decay():
    """kEpsilon transport with no flow: dk/dt=-eps, deps/dt=-C2 eps^2/k
    -> power-law decay k ~ t^(-1/(C2-1)) (standard model benchmark)."""
    import dataclasses
    from sedifoam_tpu.config import TurbulenceConfig
    from sedifoam_tpu.fluid import turbulence as T
    grid = Grid(nx=4, ny=4, nz=4, dx=0.01, dy=0.01, dz=0.01)
    zg = bc.PatchBC(bc.ZERO_GRADIENT)
    zg3 = bc.PatchBC(bc.ZERO_GRADIENT, (0.0, 0.0, 0.0))
    bcs = FluidBCs(alpha=bc.make_field_bc({}),
                   p=bc.make_field_bc({}),
                   Ub=bc.make_field_bc({}, default=zg3),
                   Ua=bc.make_field_bc({}, default=zg3))
    k0, e0 = 1.0, 10.0
    cfg = FluidConfig(dt=1e-3, rhob=1000.0, nub=1e-6,
                      turbulence=TurbulenceConfig(model="kEpsilon"))
    fs = init_fluid(grid)
    fs = fs._replace(k=jnp.full(grid.shape, k0),
                     epsilon=jnp.full(grid.shape, e0),
                     nut=jnp.full(grid.shape, 0.09 * k0 ** 2 / e0))
    correct = jax.jit(lambda s: T.correct(s, grid, bcs, cfg))
    n = 200
    for _ in range(n):
        fs = correct(fs)
    t = n * cfg.dt
    C2 = cfg.turbulence.C2
    # analytic: k(t) = k0 (1 + (C2-1) e0 t / k0)^(-1/(C2-1))
    k_exact = k0 * (1 + (C2 - 1) * e0 * t / k0) ** (-1.0 / (C2 - 1))
    k_num = float(fs.k.mean())
    assert abs(k_num - k_exact) / k_exact < 0.05
    # field stays uniform
    assert float(fs.k.std()) < 1e-10
