"""Lattice (roll-based) contact backend: exact equivalence vs dense.

The lattice backend enumerates pairs via ghost-padded bin rolls instead
of gathered neighbor tables (dem/lattice.py). Its physics must be
bit-compatible with the dense all-pairs reference: forces, torques, and
shear history across substeps, rebuilds, periodic seams, and freeze.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.config import DEMConfig, PairParams
from sedifoam_tpu.dem import integrate as _dem
from sedifoam_tpu.dem import lattice as _lat
from sedifoam_tpu.dem.state import make_particles
from tagsort import by_tag

L = 1.0e-2
R = 5e-4
PAIR = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.5)


def _cfg(backend, periodic=(False, False, False), **kw):
    args = dict(dt=1e-6, pair=PAIR, gravity=(0.0, -9.81, 0.0),
                backend=backend, nbr_k=16, max_per_bin=6,
                cutoff=1.7e-3, skin=4e-4,
                domain_lo=(0.0, 0.0, 0.0), domain_hi=(L, L, L),
                periodic=periodic)
    args.update(kw)
    return DEMConfig(**args)


def _parts(backend, cfg, pos, vel, rad):
    geom = _lat.make_geom(cfg) if backend == "lattice" else None
    return make_particles(pos=pos, radius=rad, density=2500.0, vel=vel,
                          n_walls=0, lattice_geom=geom,
                          neighbor_k=cfg.nbr_k if backend == "binned"
                          else None)


def _packing(n=60, seed=0, spread=0.9):
    rng = np.random.RandomState(seed)
    pos = rng.uniform((1 - spread) / 2 * L, (1 + spread) / 2 * L,
                      size=(n, 3))
    vel = rng.uniform(-0.05, 0.05, size=(n, 3))
    rad = rng.uniform(0.8 * R, 1.2 * R, size=n)
    return pos, vel, rad


@pytest.mark.parametrize("periodic", [(False, False, False),
                                      (True, False, True),
                                      (True, True, True)])
def test_lattice_matches_dense_forces(periodic):
    pos, vel, rad = _packing(seed=1, spread=1.0 if any(periodic) else 0.9)
    out = {}
    for backend in ("dense", "lattice"):
        cfg = _cfg(backend, periodic=periodic)
        parts = _parts(backend, cfg, pos, vel, rad)
        parts = _dem.setup_forces(parts, cfg)
        out[backend] = tuple(by_tag(parts, "force", "torque"))
    scale = np.abs(out["dense"][0]).max() + 1e-300
    np.testing.assert_allclose(out["lattice"][0], out["dense"][0],
                               atol=1e-12 * scale)
    np.testing.assert_allclose(out["lattice"][1], out["dense"][1],
                               atol=1e-12 * (np.abs(out["dense"][1]).max()
                                             + 1e-300))


@pytest.mark.parametrize("periodic", [(False, False, False),
                                      (True, False, True)])
def test_lattice_matches_dense_trajectory(periodic):
    """60 substeps with shear history accumulating (no rebuild)."""
    pos, vel, rad = _packing(seed=2)
    out = {}
    for backend in ("dense", "lattice"):
        cfg = _cfg(backend, periodic=periodic)
        parts = _parts(backend, cfg, pos, vel, rad)
        parts = _dem.setup_forces(parts, cfg)
        parts = _dem.run_dem(parts, cfg, 60)
        out[backend] = tuple(by_tag(parts, "pos", "vel", "omega"))
    for a, b in zip(out["dense"], out["lattice"]):
        np.testing.assert_allclose(b, a, rtol=0,
                                   atol=1e-10 * (np.abs(a).max() + 1e-300))


def test_lattice_carry_across_rebuild():
    """Shear history survives a forced rebuild (slot re-assignment)."""
    pos, vel, rad = _packing(seed=3)
    out = {}
    for backend in ("dense", "lattice"):
        cfg = _cfg(backend)
        parts = _parts(backend, cfg, pos, vel, rad)
        parts = _dem.setup_forces(parts, cfg)
        parts = _dem.run_dem(parts, cfg, 30)
        # force a rebuild mid-trajectory (dense is key-stable; lattice
        # must carry its per-pair history through new slot keys)
        parts = _dem.maybe_rebuild_neighbors(parts, cfg, force=True)
        parts = _dem.run_dem(parts, cfg, 30)
        out[backend] = tuple(by_tag(parts, "pos", "vel", "omega"))
    for a, b in zip(out["dense"], out["lattice"]):
        np.testing.assert_allclose(b, a, rtol=0,
                                   atol=1e-9 * (np.abs(a).max() + 1e-300))


def test_lattice_natural_rebuild_long_run():
    """Long enough that the Verlet-skin criterion triggers rebuilds."""
    pos, vel, rad = _packing(seed=4)
    vel = vel * 4.0   # move fast enough to exceed skin/2
    out = {}
    for backend in ("dense", "lattice"):
        cfg = _cfg(backend, periodic=(True, True, True))
        parts = _parts(backend, cfg, pos, vel, rad)
        parts = _dem.setup_forces(parts, cfg)
        parts = _dem.run_dem(parts, cfg, 150)
        out[backend] = tuple(by_tag(parts, "pos", "vel"))
    for a, b in zip(out["dense"], out["lattice"]):
        np.testing.assert_allclose(b, a, rtol=0,
                                   atol=1e-8 * (np.abs(a).max() + 1e-300))


def test_lattice_freeze_and_walls():
    from sedifoam_tpu.config import WallSpec
    walls = (WallSpec(style="yplane", lo=0.0, hi=L, params=PAIR),)
    pos = np.array([[0.005, 0.0008, 0.005],   # resting on the bottom wall
                    [0.005, 0.004, 0.005]])
    out = {}
    for backend in ("dense", "lattice"):
        cfg = _cfg(backend, walls=walls, frozen_types=(2,))
        parts = make_particles(
            pos=pos, radius=R, density=2500.0, ptype=[1, 2], n_walls=1,
            lattice_geom=_lat.make_geom(cfg) if backend == "lattice"
            else None)
        parts = _dem.setup_forces(parts, cfg)
        parts = _dem.run_dem(parts, cfg, 80)
        out[backend] = tuple(by_tag(parts, "pos", "vel"))
    for a, b in zip(out["dense"], out["lattice"]):
        np.testing.assert_allclose(b, a, atol=1e-14)
    # frozen particle stayed
    np.testing.assert_allclose(out["dense"][0][1], pos[1], atol=0.0)


def test_lattice_coupled_step():
    """The lattice backend drives the full coupled CFD-DEM step."""
    import importlib

    import jax

    ge = importlib.import_module("__graft_entry__")
    from sedifoam_tpu.solver import coupled_step

    cfg, state = ge._tiny_case(nx=8, ny=8, nz=8, n_particles=64,
                               sub_steps=2, backend="lattice",
                               dtype=jnp.float64)
    cfg_d, state_d = ge._tiny_case(nx=8, ny=8, nz=8, n_particles=64,
                                   sub_steps=2, backend="dense",
                                   dtype=jnp.float64)
    step = jax.jit(lambda s: coupled_step(s, cfg))
    step_d = jax.jit(lambda s: coupled_step(s, cfg_d))
    for _ in range(3):
        state = step(state)
        state_d = step_d(state_d)
    assert bool(jnp.isfinite(state.fluid.p).all())
    np.testing.assert_allclose(np.asarray(state.fluid.alpha),
                               np.asarray(state_d.fluid.alpha),
                               atol=1e-12)
    np.testing.assert_allclose(*(by_tag(s.particles, "pos")
                                 for s in (state, state_d)), atol=1e-12)
