"""Periodic particle boundaries (LAMMPS `boundary pp ff pp`;
lammpsFoam/softParticle.C:186-198 cyclic transforms).

Covers: minimum-image contact across the seam (dense + binned), position
wrap under integration, frozen-type groups (`fix ... freeze`), and the
in.lammps parsing of boundary/group/freeze.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.config import DEMConfig, PairParams
from sedifoam_tpu.dem import integrate as _dem
from sedifoam_tpu.dem.state import make_particles

PAIR = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.5)
L = 1.0e-2  # box length per axis


def _cfg(backend, periodic=(True, False, False), **kw):
    args = dict(dt=1e-6, pair=PAIR, gravity=(0.0, 0.0, 0.0),
                backend=backend, nbr_k=8, max_per_bin=6,
                cutoff=2.5e-3, skin=5e-4,
                domain_lo=(0.0, 0.0, 0.0), domain_hi=(L, L, L),
                periodic=periodic)
    args.update(kw)
    return DEMConfig(**args)


def _two_across_seam(backend):
    """Two particles overlapping only through the x seam."""
    r = 1e-3
    pos = np.array([[0.0005, 0.005, 0.005],     # near x=0
                    [L - 0.0006, 0.005, 0.005]])  # near x=L
    vel = np.array([[-0.05, 0.0, 0.0], [0.05, 0.0, 0.0]])  # separating... no:
    # moving toward each other THROUGH the seam
    cfg = _cfg(backend)
    parts = make_particles(pos=pos, radius=r, density=2000.0, vel=vel,
                           n_walls=0,
                           neighbor_k=cfg.nbr_k if backend == "binned"
                           else None)
    return parts, cfg


@pytest.mark.parametrize("backend", ["dense", "binned"])
def test_seam_contact_force(backend):
    parts, cfg = _two_across_seam(backend)
    parts = _dem.setup_forces(parts, cfg)
    f = np.asarray(parts.force)
    # gap through the seam = 0.0011 < 2r = 0.002: overlapping -> repulsion
    # pushes particle 0 in +x (away from the seam) and particle 1 in -x
    assert f[0, 0] > 0.0, f
    assert f[1, 0] < 0.0, f
    np.testing.assert_allclose(f[0], -f[1], rtol=1e-12)


def test_dense_binned_equivalence_periodic():
    """A random periodic packing: both backends produce identical forces."""
    rng = np.random.RandomState(3)
    n = 40
    pos = rng.uniform(0.0, L, size=(n, 3))
    vel = rng.uniform(-0.02, 0.02, size=(n, 3))
    out = {}
    for backend in ("dense", "binned"):
        cfg = _cfg(backend, periodic=(True, True, True))
        parts = make_particles(pos=pos, radius=8e-4, density=2500.0, vel=vel,
                               n_walls=0,
                               neighbor_k=cfg.nbr_k if backend == "binned"
                               else None)
        parts = _dem.setup_forces(parts, cfg)
        parts = _dem.run_dem(parts, cfg, 20)
        from tagsort import by_tag
        out[backend] = tuple(by_tag(parts, "pos", "vel"))
    np.testing.assert_allclose(out["dense"][0], out["binned"][0],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(out["dense"][1], out["binned"][1],
                               rtol=0, atol=1e-9)


def test_position_wrap():
    cfg = _cfg("dense", periodic=(True, False, False),
               pair=PairParams(style="none"))
    pos = np.array([[L - 1e-4, 0.005, 0.005]])
    parts = make_particles(pos=pos, radius=1e-3, density=2000.0,
                           vel=np.array([[1.0, 0.0, 0.0]]), n_walls=0)
    parts = _dem.setup_forces(parts, cfg)
    parts = _dem.run_dem(parts, cfg, 300)  # travels 3e-4 m, crosses seam
    x = float(parts.pos[0, 0])
    assert 0.0 <= x < L
    assert abs(x - 2e-4) < 1e-8


def test_momentum_conserved_through_seam():
    parts, cfg = _two_across_seam("dense")
    parts = _dem.setup_forces(parts, cfg)
    p0 = np.asarray(jnp.sum(parts.vel * parts.mass[:, None], axis=0))
    parts = _dem.run_dem(parts, cfg, 200)
    p1 = np.asarray(jnp.sum(parts.vel * parts.mass[:, None], axis=0))
    np.testing.assert_allclose(p0, p1, atol=1e-14)


def test_frozen_types():
    cfg = _cfg("dense", periodic=(False, False, False),
               gravity=(0.0, -9.81, 0.0), frozen_types=(2,))
    pos = np.array([[0.005, 0.006, 0.005],   # type 1, falls
                    [0.005, 0.002, 0.005]])  # type 2, frozen
    parts = make_particles(pos=pos, radius=1e-3, density=2000.0,
                           ptype=[1, 2], n_walls=0)
    parts = _dem.setup_forces(parts, cfg)
    parts = _dem.run_dem(parts, cfg, 100)
    assert float(parts.vel[0, 1]) < 0.0          # falling
    np.testing.assert_allclose(np.asarray(parts.pos[1]), pos[1], atol=0.0)
    np.testing.assert_allclose(np.asarray(parts.vel[1]), 0.0, atol=0.0)


def test_parse_boundary_group_freeze(tmp_path):
    script = tmp_path / "in.lammps"
    script.write_text(
        "boundary pp ff pp\n"
        "pair_style gran/hooke/history 2000.0 NULL 56000 NULL 0.1 0\n"
        "timestep 2e-6\n"
        "group bottom type 2\n"
        "group active subtract all bottom\n"
        "fix 1 all nve/sphere\n"
        "fix 2 all gravity 9.8 vector 0 -1 0\n"
        "fix 3 all fdrag\n"
        "fix 4 bottom freeze\n"
        "fix ywall all wall/gran 2000.0 NULL 56000 NULL 0.1 0 "
        "yplane 0.00 0.04\n")
    from sedifoam_tpu.io.lammps import parse_input_script
    case = parse_input_script(str(script))
    assert case.periodic == (True, False, True)
    assert case.frozen_types == (2,)
    assert case.pair.style == "hooke_history"
    assert case.pair.kn == 2000.0
    assert len(case.walls) == 1 and case.walls[0].style == "yplane"


def test_parse_lubricate_poly(tmp_path):
    script = tmp_path / "in.lammps"
    script.write_text(
        "pair_style lubricate/poly 1.0e-3 1 1 2.05e-3 2.5e-3\n"
        "timestep 1e-6\n")
    from sedifoam_tpu.io.lammps import parse_input_script
    case = parse_input_script(str(script))
    assert case.lubrication is not None
    assert case.lubrication.mu == 1.0e-3
    assert case.lubrication.flaglog == 1
    assert case.lubrication.cut == 2.5e-3
