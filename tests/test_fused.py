"""Fused Pallas binned chain (dem/fused.py) vs the XLA reference path.

Runs in Pallas interpret mode so CPU CI covers the kernel math; the real
Mosaic lowering is exercised on the chip by bench.py and a TPU-gated
test below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.config import DEMConfig, PairParams, WallSpec
from sedifoam_tpu.dem.fused import pair_forces_binned_fused
from sedifoam_tpu.dem.integrate import run_dem, setup_forces
from sedifoam_tpu.dem.neighbor import pair_forces_binned
from sedifoam_tpu.dem.state import make_particles

BOX = (0.0, 0.0, 0.0), (8e-3, 16e-3, 8e-3)
R = 5e-4


def _state_cfg(n=96, seed=0, periodic=(False, False, False), settle=300,
               wall_gap=2.0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(wall_gap * R, np.asarray(BOX[1]) - wall_gap * R,
                      size=(n, 3))
    vel = rng.randn(n, 3) * 0.05
    pair = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.4)
    walls = tuple(WallSpec(style=s, lo=0.0, hi=h, params=pair)
                  for a, (s, h) in enumerate(
                      (("xplane", BOX[1][0]), ("yplane", BOX[1][1]),
                       ("zplane", BOX[1][2]))) if not periodic[a])
    cfg = DEMConfig(
        dt=1e-6, pair=pair, walls=walls, gravity=(0.0, -9.81, 0.0),
        backend="binned", nbr_k=24, max_per_bin=8,
        cutoff=2 * R * 1.6, skin=0.6 * R, periodic=periodic,
        domain_lo=BOX[0], domain_hi=BOX[1])
    st = make_particles(pos, R, 2500.0, vel=vel, n_walls=len(walls),
                        neighbor_k=cfg.nbr_k, dtype=jnp.float32)
    st = setup_forces(st, cfg)
    if settle:
        st = run_dem(st, cfg, settle)
    return st, cfg


@pytest.mark.parametrize("periodic", [(False, False, False),
                                      (True, False, True)])
def test_fused_matches_xla_chain(periodic):
    st, cfg = _state_cfg(periodic=periodic)
    plen = cfg.periodic_len()
    f0, t0, s0 = pair_forces_binned(st, cfg.pair, cfg.dt, st.nbr_idx,
                                    True, plen)
    f1, t1, s1, ws1 = pair_forces_binned_fused(
        st, cfg.pair, cfg.dt, st.nbr_idx, True, plen, interpret=True)
    assert ws1 is None
    assert bool(jnp.any(jnp.abs(f0) > 0))   # real contacts present
    for a, b in ((f0, f1), (t0, t1), (s0, s1)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.max(np.abs(a)) + 1e-30
        assert np.max(np.abs(a - b)) / denom < 1e-6


def test_fused_no_shearupdate_branch():
    st, cfg = _state_cfg(seed=3)
    f0, t0, s0 = pair_forces_binned(st, cfg.pair, cfg.dt, st.nbr_idx,
                                    False, None)
    f1, t1, s1, _ = pair_forces_binned_fused(
        st, cfg.pair, cfg.dt, st.nbr_idx, False, None, interpret=True)
    for a, b in ((f0, f1), (t0, t1), (s0, s1)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.max(np.abs(a)) + 1e-30
        assert np.max(np.abs(a - b)) / denom < 1e-6


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic lowering needs a TPU")
def test_fused_matches_xla_on_tpu():
    st, cfg = _state_cfg(settle=100)
    f0, t0, s0 = jax.jit(lambda s: pair_forces_binned(
        s, cfg.pair, cfg.dt, s.nbr_idx, True, None))(st)
    f1, t1, s1, _ = jax.jit(lambda s: pair_forces_binned_fused(
        s, cfg.pair, cfg.dt, s.nbr_idx, True, None))(st)
    for a, b in ((f0, f1), (t0, t1), (s0, s1)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.max(np.abs(a)) + 1e-30
        assert np.max(np.abs(a - b)) / denom < 1e-5


def test_fused_walls_match_xla():
    """Fused wall pass (plane walls in-kernel) vs XLA pair+wall sum."""
    from sedifoam_tpu.dem.walls import wall_forces
    # wall_gap<1 puts some particle centers within R of the planes, so
    # real wall overlaps exist from step 0
    st, cfg = _state_cfg(seed=5, settle=0, wall_gap=0.6)
    f0, t0, s0 = pair_forces_binned(st, cfg.pair, cfg.dt, st.nbr_idx,
                                    True, None)
    fw, tw, ws0 = wall_forces(st, cfg.walls, cfg.dt, 0.0, True)
    f1, t1, s1, ws1 = pair_forces_binned_fused(
        st, cfg.pair, cfg.dt, st.nbr_idx, True, None, interpret=True,
        walls=cfg.walls)
    assert ws1 is not None
    assert bool(jnp.any(jnp.abs(fw) > 0))      # wall contacts present
    for a, b in ((f0 + fw, f1), (t0 + tw, t1), (s0, s1), (ws0, ws1)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.max(np.abs(a)) + 1e-30
        assert np.max(np.abs(a - b)) / denom < 1e-6
