"""Measure the real binned contact kernel at production scale, vs K."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sedifoam_tpu.config import DEMConfig, PairParams
from sedifoam_tpu.dem import integrate as _dem
from sedifoam_tpu.dem.neighbor import pair_forces_binned
from sedifoam_tpu.dem.state import make_particles

N = 131072
D = 1e-3
L = (0.128, 0.064, 0.032)  # ~ half-filled box at this N


def sync(x):
    return float(jax.tree.leaves(x)[0].ravel()[0])


def build(k):
    rng = np.random.RandomState(0)
    pos = rng.uniform([0, 0, 0], L, size=(N, 3))
    cfg = DEMConfig(dt=1e-6, pair=PairParams(style="hertz_history", kn=1e5,
                                             gamman=0.7, xmu=0.5),
                    gravity=(0.0, -9.81, 0.0), backend="binned",
                    nbr_k=k, max_per_bin=10, cutoff=1.6 * D, skin=0.3 * D,
                    domain_lo=(0.0, 0.0, 0.0), domain_hi=L)
    parts = make_particles(pos=pos, radius=D / 2, density=2500.0,
                           capacity=N, n_walls=0, neighbor_k=k,
                           dtype=jnp.float32)
    parts = _dem.setup_forces(parts, cfg)
    return cfg, parts


def timeit(fn, *args, n=10):
    out = jax.jit(fn)(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.jit(fn)(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


for k in (32, 24, 16, 12):
    cfg, parts = build(k)
    ms_force = timeit(
        lambda p, c=cfg: pair_forces_binned(p, c.pair, c.dt, p.nbr_idx)[0],
        parts)
    ms_substep = timeit(
        lambda p, c=cfg: _dem._substep(p, c, 0.0).vel, parts)
    occ = float((np.asarray(parts.nbr_idx) < N).mean())
    print(f"K={k}: pair_forces={ms_force:.2f} ms  substep={ms_substep:.2f} "
          f"ms  slot_occupancy={occ:.2f}", flush=True)
