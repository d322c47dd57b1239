"""Binned neighbor-backend tests: equivalence with the dense backend."""

import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.config import DEMConfig, PairParams, WallSpec
from sedifoam_tpu.dem.integrate import run_dem, setup_forces
from sedifoam_tpu.dem.neighbor import make_binner
from sedifoam_tpu.dem.state import make_particles

BOX = (0.0, 0.0, 0.0), (0.02, 0.02, 0.02)
R = 5e-4


def _random_packing(n=64, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(2 * R, 0.02 - 2 * R, size=(n, 3))
    vel = rng.randn(n, 3) * 0.05
    return pos, vel


def _configs(backend):
    pair = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.4)
    wall = WallSpec(style="yplane", lo=0.0, hi=0.02, params=pair)
    return DEMConfig(
        dt=1e-6, pair=pair, walls=(wall,), gravity=(0.0, -9.81, 0.0),
        backend=backend, nbr_k=32, max_per_bin=8,
        cutoff=2 * R * 1.6, skin=0.6 * R,
        domain_lo=BOX[0], domain_hi=BOX[1])


def test_binner_finds_all_contacts():
    pos, _ = _random_packing(128, seed=3)
    active = jnp.ones(128, bool)
    rebuild = make_binner(BOX[0], BOX[1], cutoff=2 * R * 1.6,
                          k_neighbors=32, max_per_bin=8)
    idx, _ = rebuild(jnp.asarray(pos), active)
    idx = np.asarray(idx)  # (K, N)
    # brute-force within-cutoff pairs must all appear in the table
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    for i, j in zip(*np.where(d < 2 * R)):
        assert j in idx[:, i], f"missing contact {i}-{j}"


def test_binned_matches_dense_forces():
    pos, vel = _random_packing(64)
    st_d = make_particles(pos, R, 2500.0, vel=vel, n_walls=1)
    st_b = make_particles(pos, R, 2500.0, vel=vel, n_walls=1, neighbor_k=32)
    cfg_d, cfg_b = _configs("dense"), _configs("binned")
    st_d = setup_forces(st_d, cfg_d)
    st_b = setup_forces(st_b, cfg_b)
    from tagsort import by_tag
    fb, fd = by_tag(st_b, "force"), by_tag(st_d, "force")
    np.testing.assert_allclose(fb, fd,
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(by_tag(st_b, "torque"),
                               by_tag(st_d, "torque"), rtol=1e-12,
                               atol=1e-14)


def test_binned_matches_dense_trajectory():
    """A settling pile: both backends produce the same physics (shear
    history carried exactly across rebuilds)."""
    pos, vel = _random_packing(48, seed=7)
    st_d = make_particles(pos, R, 2500.0, vel=vel, n_walls=1)
    st_b = make_particles(pos, R, 2500.0, vel=vel, n_walls=1, neighbor_k=32)
    cfg_d, cfg_b = _configs("dense"), _configs("binned")
    st_d = setup_forces(st_d, cfg_d)
    st_b = setup_forces(st_b, cfg_b)
    st_d = run_dem(st_d, cfg_d, 3000)
    st_b = run_dem(st_b, cfg_b, 3000)
    from tagsort import by_tag
    np.testing.assert_allclose(by_tag(st_b, "pos"), by_tag(st_d, "pos"),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(by_tag(st_b, "vel"), by_tag(st_d, "vel"),
                               rtol=0, atol=1e-6)


def test_add_delete_particles():
    """Particle injection/deletion regions (softParticleCloud add/delete)."""
    import jax
    from sedifoam_tpu.dem import inject
    from sedifoam_tpu.config import CloudConfig
    from sedifoam_tpu.grid import Grid

    grid = Grid(nx=8, ny=8, nz=1, dx=1e-3, dy=1e-3, dz=1e-3)
    ccfg = CloudConfig(
        add_particle=1, add_interval=0.1,
        add_box=(0.0, 8e-3, 6e-3, 8e-3, 0.0, 1e-3),
        add_info=(4e-4, 2000.0, 1), add_velocity=(0.0, -0.1, 0.0),
        random_perturb=1e-4, reduce_number_factor=1,
        delete_particle=1, delete_box=(0.0, 8e-3, 0.0, 1e-3, 0.0, 1e-3))
    sites = jnp.asarray(inject.seed_positions(grid, ccfg.add_box, 1))
    assert sites.shape[0] == 16  # 8x2 cells in the top band

    st = make_particles([[4e-3, 4e-3, 5e-4]], 2e-4, 2000.0,
                        capacity=64, n_walls=0)
    st = st._replace(time_to_add=jnp.asarray(0.0),
                     rng_key=jax.random.PRNGKey(1))

    st2, tta, key, _, _ = inject.maybe_add_delete(
        st, st.time_to_add, st.rng_key, sites, grid, ccfg, dt_fluid=1e-3)
    assert int(st2.active.sum()) == 17      # 1 + 16 injected
    assert float(tta) == 0.1                # countdown reset
    assert int(st2.tag.max()) == 17         # tags continue from max
    # injected velocity applied
    inj = np.asarray(st2.active) & (np.asarray(st2.tag) > 1)
    np.testing.assert_allclose(np.asarray(st2.vel)[inj, 1], -0.1)

    # move a particle into the delete box -> removed on next call
    st3 = st2._replace(pos=st2.pos.at[0, 1].set(5e-4))
    st4, _, _, _, deleted = inject.maybe_add_delete(
        st3, tta, key, sites, grid, ccfg, dt_fluid=1e-3)
    assert not bool(st4.active[0])
    assert bool(deleted)
    assert int(st4.active.sum()) == 16


def test_truncation_audit_counts_dropped_inring():
    """audit_ring arms the K-truncation audit (LAMMPS dangerous-builds
    analogue): a K too small for the packing reports exactly the number
    of in-ring partners the K-nearest selection discarded."""
    # 6 particles clustered within one ring of each other: each sees 5
    pos = np.asarray([[0.0, 0.0, 0.0]] * 6) + \
        np.asarray([[0.0, 0, 0], [1.05, 0, 0], [-1.05, 0, 0],
                    [0, 1.05, 0], [0, -1.05, 0], [0, 0, 1.05]]) * 2 * R
    pos += 0.01  # keep inside BOX
    active = jnp.ones(6, bool)
    ring = 2 * R * 1.3
    mk = lambda k: make_binner(BOX[0], BOX[1], cutoff=2 * R * 1.6,
                               k_neighbors=k, max_per_bin=8,
                               audit_ring=ring)
    # count in-ring partners per particle by brute force
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    inring = (d < ring).sum(axis=1)
    assert inring.max() >= 3  # the cluster is actually dense
    _, dropped_ok = mk(int(inring.max()))(jnp.asarray(pos), active)
    assert int(dropped_ok) == 0
    k_small = 2
    _, dropped = mk(k_small)(jnp.asarray(pos), active)
    assert int(dropped) == int(np.maximum(inring - k_small, 0).sum())
    # audit disarmed -> always 0
    mk0 = make_binner(BOX[0], BOX[1], cutoff=2 * R * 1.6,
                      k_neighbors=k_small, max_per_bin=8)
    _, d0 = mk0(jnp.asarray(pos), active)
    assert int(d0) == 0


def test_density_sized_k8_matches_dense_on_benchlike_bed():
    """The headline bench runs K=8 (density-sized, audit-verified) on a
    just-touching jittered simple-cubic bed; prove the K=8 table gives
    the dense backend's forces exactly and the audit stays clean."""
    rng = np.random.RandomState(7)
    pitch = 2.02 * R
    nx = 6
    ii = np.arange(nx ** 3)
    pos = np.stack([2 * R + (ii % nx) * pitch,
                    2 * R + ((ii // nx) % nx) * pitch,
                    2 * R + (ii // nx ** 2) * pitch], axis=1)
    pos += rng.uniform(-0.05 * R, 0.05 * R, pos.shape)
    vel = rng.randn(len(pos), 3) * 0.02
    pair = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.4)
    common = dict(dt=1e-6, pair=pair, gravity=(0.0, -9.81, 0.0),
                  cutoff=2 * R * 1.6, skin=0.6 * R,
                  domain_lo=BOX[0], domain_hi=BOX[1])
    cfg_d = DEMConfig(backend="dense", **common)
    cfg_b = DEMConfig(backend="binned", nbr_k=8, max_per_bin=10,
                      audit_ring=2 * R + 0.6 * R, **common)
    st_d = make_particles(pos, R, 2500.0, vel=vel, n_walls=0)
    st_b = make_particles(pos, R, 2500.0, vel=vel, n_walls=0, neighbor_k=8)
    st_d = run_dem(setup_forces(st_d, cfg_d), cfg_d, 50)
    st_b = run_dem(setup_forces(st_b, cfg_b), cfg_b, 50)
    assert int(st_b.nbr_dropped) == 0
    np.testing.assert_allclose(np.asarray(st_b.force), np.asarray(st_d.force),
                               rtol=0, atol=1e-10 * float(
                                   np.abs(st_d.force).max() + 1e-30))
    np.testing.assert_allclose(np.asarray(st_b.pos), np.asarray(st_d.pos))
