"""DEM engine unit/physics tests (integrator, contact laws, walls).

The reference exercises its DEM only through end-to-end cases
(cases/auto-testing); these add the per-kernel checks it lacks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.config import (PAIR_HERTZ_HISTORY, PAIR_HOOKE_HISTORY,
                                 DEMConfig, PairParams, WallSpec)
from sedifoam_tpu.dem.integrate import run_dem, setup_forces
from sedifoam_tpu.dem.state import make_particles


def test_free_fall():
    st = make_particles(pos=[[0.0, 1.0, 0.0]], radius=0.01, density=2000.0,
                        n_walls=0)
    cfg = DEMConfig(dt=1e-4, gravity=(0.0, -9.81, 0.0))
    st = setup_forces(st, cfg)
    n = 100
    st = run_dem(st, cfg, n)
    t = n * cfg.dt
    # velocity-Verlet is exact for constant acceleration
    np.testing.assert_allclose(float(st.vel[0, 1]), -9.81 * t, rtol=1e-12)
    np.testing.assert_allclose(float(st.pos[0, 1]), 1.0 - 0.5 * 9.81 * t * t,
                               rtol=1e-10)


def test_inactive_particles_frozen():
    st = make_particles(pos=[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], radius=0.01,
                        density=1000.0, capacity=4, n_walls=0)
    cfg = DEMConfig(dt=1e-4, gravity=(0.0, -9.81, 0.0))
    st = setup_forces(st, cfg)
    st = run_dem(st, cfg, 50)
    assert float(jnp.abs(st.pos[2:]).max()) == 0.0
    assert float(jnp.abs(st.vel[2:]).max()) == 0.0


def _collide(style, kn=1e5, gamman=0.3, xmu=0.5, dampflag=1, offset=0.0):
    """Two equal spheres approaching head-on (optionally offset for obliquity)."""
    r = 0.005
    st = make_particles(
        pos=[[-2.5 * r, 0.0, 0.0], [2.5 * r, offset, 0.0]],
        vel=[[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]],
        radius=r, density=2500.0, n_walls=0)
    pair = PairParams(style=style, kn=kn, gamman=gamman, xmu=xmu,
                      dampflag=dampflag)
    cfg = DEMConfig(dt=2e-7, pair=pair)
    st = setup_forces(st, cfg)
    st = run_dem(st, cfg, 120000)  # long enough to separate again
    return st


@pytest.mark.parametrize("style,gamman", [
    (PAIR_HOOKE_HISTORY, 50.0),
    (PAIR_HERTZ_HISTORY, 0.8),
])
def test_headon_collision_momentum_and_bounce(style, gamman):
    st = _collide(style, gamman=gamman)
    v = np.asarray(st.vel)
    # momentum conserved (equal masses -> velocities sum to zero)
    np.testing.assert_allclose(v[0] + v[1], 0.0, atol=1e-12)
    # they bounced apart and lost energy
    assert v[0, 0] < 0.0 and v[1, 0] > 0.0
    assert abs(v[0, 0]) <= 1.0 + 1e-12
    # no residual overlap / separated
    gap = float(st.pos[1, 0] - st.pos[0, 0])
    assert gap > 2 * 0.005


def test_hertz_restitution_close_to_gamman():
    """For the hertzFix damping design, gamman IS the restitution coeff."""
    e_target = 0.8
    st = _collide(PAIR_HERTZ_HISTORY, kn=1e6, gamman=e_target, xmu=0.0)
    e = abs(float(st.vel[1, 0])) / 1.0
    assert abs(e - e_target) < 0.05


def test_oblique_collision_spins_particles():
    st = _collide(PAIR_HERTZ_HISTORY, gamman=0.8, xmu=0.5, offset=0.004)
    w = np.asarray(st.omega)
    assert np.abs(w).max() > 1e-3  # friction torque spun them up
    # spin about z (impact plane is x-y)
    assert np.abs(w[:, 2]).max() > np.abs(w[:, 0]).max()


def test_wall_bounce_and_rest():
    """Ball dropped on a y-floor: bounces, never penetrates deeply, and
    comes to rest at overlap where contact balances gravity."""
    r = 0.005
    st = make_particles(pos=[[0.0, 3 * r, 0.0]], radius=r, density=2500.0,
                        n_walls=1)
    # near-critical damping (2*sqrt(kn*m) ~ 7.2, meff*gamman = 3.9) so the
    # ball settles within the simulated window
    wall = WallSpec(style="yplane", lo=0.0, hi=None,
                    params=PairParams(style=PAIR_HOOKE_HISTORY, kn=1e4,
                                      gamman=3000.0, xmu=0.5))
    cfg = DEMConfig(dt=1e-6, walls=(wall,), gravity=(0.0, -9.81, 0.0))
    st = setup_forces(st, cfg)
    traj_min = 1e9
    for _ in range(10):
        st = run_dem(st, cfg, 20000)
        traj_min = min(traj_min, float(st.pos[0, 1]))
    # never penetrates more than ~20% of radius
    assert traj_min > r * 0.8
    # settled: tiny velocity, resting just below y=r (static overlap)
    assert abs(float(st.vel[0, 1])) < 1e-3
    m = float(st.mass[0])
    overlap_static = m * 9.81 / 1e4
    np.testing.assert_allclose(float(st.pos[0, 1]), r - overlap_static,
                               rtol=0.05)


def test_tangential_coulomb_cap():
    """Sliding particle on a frictional floor decelerates at mu*g."""
    r = 0.005
    mu = 0.3
    st = make_particles(pos=[[0.0, r * 0.999, 0.0]],
                        vel=[[0.5, 0.0, 0.0]],
                        radius=r, density=2500.0, n_walls=1)
    wall = WallSpec(style="yplane", lo=0.0, hi=None,
                    params=PairParams(style=PAIR_HOOKE_HISTORY, kn=1e5,
                                      gamman=100.0, xmu=mu))
    cfg = DEMConfig(dt=1e-6, walls=(wall,), gravity=(0.0, -9.81, 0.0))
    st = setup_forces(st, cfg)
    st = run_dem(st, cfg, 2000)
    t = 2000 * 1e-6
    vx = float(st.vel[0, 0])
    # Coulomb-limited sliding: deceleration on the order of mu*g (the
    # normal force oscillates around m*g during the settling transient,
    # so allow a generous band around the rigid-plane value)
    assert 0.5 - 3.0 * mu * 9.81 * t < vx < 0.5 - 0.3 * mu * 9.81 * t
    # friction torque spins the particle toward rolling (omega_z < 0 for
    # +x sliding on a floor with normal +y)
    assert float(st.omega[0, 2]) < 0.0


def test_lubrication_squeeze_resists_approach():
    """pair lubricate/poly: approaching spheres feel a squeeze force that
    diverges as the gap closes; the isotropic FLD term damps motion."""
    from sedifoam_tpu.dem.lubrication import (LubricationParams,
                                              lubrication_forces)
    r1, r2 = 0.005, 0.0025  # polydisperse
    gap = 0.001
    st = make_particles(
        pos=[[0.0, 0.0, 0.0], [r1 + r2 + gap, 0.0, 0.0]],
        vel=[[0.1, 0.0, 0.0], [-0.1, 0.0, 0.0]],
        radius=[r1, r2], density=1000.0, n_walls=0)
    p = LubricationParams(mu=1e-3, flaglog=1, flagfld=1,
                          cut_inner=(r1 + r2) * 1.0001,
                          cut=(r1 + r2 + 3 * gap), box_volume=1e-3)
    f, tq = lubrication_forces(st, p)
    f = np.asarray(f)
    # squeeze opposes approach: particle 0 pushed -x, particle 1 +x
    assert f[0, 0] < 0 and f[1, 0] > 0
    # smaller gap -> larger force
    st2 = st._replace(pos=st.pos.at[1, 0].set(r1 + r2 + gap / 4))
    f2, _ = lubrication_forces(st2, p)
    assert abs(float(f2[0, 0])) > abs(f[0, 0])
    # isotropic drag on a lone moving particle
    st3 = st._replace(active=st.active.at[1].set(False))
    f3, _ = lubrication_forces(st3, p)
    assert f3[0, 0] < 0  # opposes +x motion
