"""Timing: binned vs lattice backend, 10-substep run_dem at 131k (f32).

Measured as the real thing runs: one jitted lax.scan of 10 substeps.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sedifoam_tpu.config import DEMConfig, PairParams, WallSpec
from sedifoam_tpu.dem import integrate as _dem
from sedifoam_tpu.dem import lattice as _lat
from sedifoam_tpu.dem.state import make_particles

N = 131072
R = 5e-4
L = (0.064, 0.128, 0.064)
PAIR = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.3)


def bed_positions():
    rng = np.random.RandomState(42)
    pitch = 2.02 * R
    nxp = int((L[0] - 2 * R) / pitch)
    nzp = int((L[2] - 2 * R) / pitch)
    ii = np.arange(N)
    ix, iz, iy = ii % nxp, (ii // nxp) % nzp, ii // (nxp * nzp)
    pos = np.stack([2 * R + ix * pitch, 2 * R + iy * pitch,
                    2 * R + iz * pitch], axis=1)
    return pos + rng.uniform(-0.05 * R, 0.05 * R, pos.shape)


def build(backend, M=6, k=24, sort=True):
    walls = (WallSpec(style="yplane", lo=0.0, hi=L[1], params=PAIR),)
    cfg = DEMConfig(dt=5e-6, pair=PAIR, walls=walls,
                    gravity=(0.0, -9.81, 0.0), backend=backend,
                    nbr_k=k, max_per_bin=M, cutoff=2 * R * 1.6,
                    skin=0.6 * R, domain_lo=(0.0, 0.0, 0.0), domain_hi=L,
                    sort_on_rebuild=sort)
    geom = _lat.make_geom(cfg) if backend == "lattice" else None
    parts = make_particles(
        pos=bed_positions(), radius=R, density=2500.0, capacity=N,
        n_walls=1, lattice_geom=geom,
        neighbor_k=k if backend == "binned" else None, dtype=jnp.float32)
    parts = _dem.setup_forces(parts, cfg)
    if geom is not None:
        occ = (np.asarray(parts.nbr_idx) < N).sum(axis=0)
        print(f"lattice M={M}: S={geom.S} max_occupancy="
              f"{(np.asarray(parts.nbr_idx) < N).sum(axis=0).max()} "
              f"mean={occ[occ > 0].mean():.2f}", flush=True)
    return cfg, parts


def sync(x):
    return float(jax.tree.leaves(x)[0].ravel()[0])


def timeit(cfg, parts, n=5):
    run = jax.jit(lambda p: _dem.run_dem(p, cfg, 10))
    out = run(parts)
    sync(out.vel)
    t0 = time.perf_counter()
    for _ in range(n):
        out = run(out)
    sync(out.vel)
    ms = (time.perf_counter() - t0) / (n * 10) * 1e3
    return ms


for backend, kw in (("binned", {}), ("binned", {"sort": False}),
                    ("lattice", {"M": 6}), ("lattice", {"M": 8})):
    try:
        cfg, parts = build(backend, **kw)
        ms = timeit(cfg, parts)
        print(f"{backend} {kw}: {ms:.2f} ms/substep -> "
              f"{N / ms * 1e3 / 1e6:.1f}M psteps/s", flush=True)
    except Exception as e:
        print(f"{backend} {kw}: FAILED {type(e).__name__}: {e}",
              flush=True)
