"""Lubrication wall-region volume fraction + analytic squeeze film.

Reference: pair_lubricate_poly.cpp:514-539 (fix-wall extents shrink the
suspension volume V_T used for the FLD volume-fraction correction) and
:152-177 (moving walls force a per-step recompute). The pairwise squeeze
term at leading order is Taylor's film law F = 6*pi*mu*a_eff^2*V/h with
a_eff = r1*r2/(r1+r2), an independent closed form the kernel must hit.
"""

import math

import numpy as np
import pytest

from sedifoam_tpu.config import DEMConfig, PairParams, WallSpec
from sedifoam_tpu.dem import integrate as _dem
from sedifoam_tpu.dem.lubrication import (LubricationParams,
                                          lubrication_forces,
                                          lubrication_forces_binned,
                                          wall_bounded_volume)
from sedifoam_tpu.dem.state import make_particles

PAIR = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.5)


def test_wall_bounded_volume_static_and_wiggle():
    lo, hi = (0.0, 0.0, 0.0), (1.0, 2.0, 3.0)
    # no walls: raw box
    assert wall_bounded_volume(lo, hi, ()) == pytest.approx(6.0)
    # y walls shrink the slab to [0.5, 1.5]
    walls = (WallSpec(style="yplane", lo=0.5, hi=1.5, params=PAIR),)
    assert wall_bounded_volume(lo, hi, walls) == pytest.approx(3.0)
    # one-sided wall (LAMMPS NULL side) only overrides its side
    walls = (WallSpec(style="xplane", lo=0.25, hi=None, params=PAIR),)
    assert wall_bounded_volume(lo, hi, walls) == pytest.approx(0.75 * 6.0)
    # wiggled wall along its own axis shifts both sides by
    # A*(1 - cos(2 pi t / T)) — at t = T/2 the offset is 2A
    walls = (WallSpec(style="zplane", lo=0.0, hi=2.0, params=PAIR,
                      wiggle=True, wiggle_axis=2, amplitude=0.1,
                      period=1.0),)
    v0 = wall_bounded_volume(lo, hi, walls, step_time=0.0)
    vh = wall_bounded_volume(lo, hi, walls, step_time=0.5)
    assert float(v0) == pytest.approx(1.0 * 2.0 * 2.0)
    assert float(vh) == pytest.approx(float(v0))  # both sides shift equally
    # wiggle transverse to the wall axis leaves the volume alone
    walls = (WallSpec(style="zplane", lo=0.0, hi=2.0, params=PAIR,
                      wiggle=True, wiggle_axis=0, amplitude=0.1,
                      period=1.0),)
    assert float(wall_bounded_volume(lo, hi, walls, 0.3)) == \
        pytest.approx(4.0)


@pytest.mark.parametrize("backend", ["dense", "binned"])
def test_squeeze_film_matches_taylor_law(backend):
    """Leading-order squeeze force F = 6 pi mu a_eff^2 V / h."""
    mu = 1.3e-3
    r1, r2 = 5e-4, 3e-4
    h = 2e-5                       # gap << radii: asymptotic regime
    V = 0.04                       # approach speed of particle 0
    pos = [[0.0, 0.0, 0.0], [r1 + r2 + h, 0.0, 0.0]]
    vel = [[V, 0.0, 0.0], [0.0, 0.0, 0.0]]
    p = LubricationParams(mu=mu, flaglog=0, flagfld=0,
                          cut_inner=(r1 + r2) * 1.001,
                          cut=(r1 + r2) * 1.5, flag_hi=1)
    if backend == "dense":
        st = make_particles(pos=pos, radius=[r1, r2], density=1000.0,
                            vel=vel, n_walls=0)
        f, _ = lubrication_forces(st, p)
    else:
        cfg = DEMConfig(dt=1e-6, pair=PAIR, backend="binned", nbr_k=8,
                        max_per_bin=4, cutoff=2.0 * (r1 + r2), skin=2e-4,
                        domain_lo=(-2e-3, -2e-3, -2e-3),
                        domain_hi=(4e-3, 2e-3, 2e-3))
        st = make_particles(pos=pos, radius=[r1, r2], density=1000.0,
                            vel=vel, n_walls=0, neighbor_k=cfg.nbr_k)
        st = _dem.maybe_rebuild_neighbors(st, cfg, force=True)
        f, _ = lubrication_forces_binned(st, p, st.nbr_idx)
    a_eff = r1 * r2 / (r1 + r2)
    f_taylor = 6.0 * math.pi * mu * a_eff ** 2 * V / h
    f = np.asarray(f)
    # particle 0 moves +x toward particle 1: film resists with -x force
    assert f[0, 0] < 0
    assert abs(-f[0, 0] - f_taylor) / f_taylor < 1e-6
    # reaction on particle 1
    assert abs(f[1, 0] - f_taylor) / f_taylor < 1e-6


def test_wall_volume_feeds_fld_drag():
    """compute_forces uses the wall-bounded V_T, not the raw box."""
    L = 8e-3
    r = 5e-4
    walls = (WallSpec(style="yplane", lo=0.0, hi=L / 2, params=PAIR),)
    lub = LubricationParams(mu=1e-3, flaglog=0, flagfld=1, flag_hi=0,
                            flag_vf=1, cut_inner=1.9 * r, cut=3 * r,
                            box_volume=L ** 3)
    cfg = DEMConfig(dt=1e-6, pair=PAIR, walls=walls, backend="dense",
                    gravity=(0.0, 0.0, 0.0), lubrication=lub,
                    domain_lo=(0.0, 0.0, 0.0), domain_hi=(L, L, L))
    st = make_particles(pos=[[L / 4, L / 4, L / 4]], radius=r,
                        density=1000.0, vel=[[0.1, 0.0, 0.0]],
                        n_walls=len(walls))
    st = _dem.setup_forces(st, cfg)
    vol_p = 4.0 / 3.0 * math.pi * r ** 3
    vf = vol_p / (L * L * (L / 2))          # wall-halved volume
    expect = -6 * math.pi * lub.mu * (1.0 + 2.16 * vf) * r * 0.1
    got = float(st.force[0, 0])
    assert got == pytest.approx(expect, rel=1e-6)
    # and it differs from what the raw box volume would give
    vf_raw = vol_p / L ** 3
    raw = -6 * math.pi * lub.mu * (1.0 + 2.16 * vf_raw) * r * 0.1
    assert abs(got - raw) > 0.1 * abs(raw - expect)
