"""Isolate the fixed per-substep cost in the DEM scan body.

bench_dem_shapes.py measured ~3.5 ms per substep at capacity 8192
(65k partner rows = 0.2 ms of gather) — a fixed cost independent of
table size. This scans each piece of _substep separately:

  A: full substep            (rebuild-check + forces + integrate)
  B: forces + integrate      (no rebuild-check cond)
  C: rebuild-check only      (the lax.cond + displacement predicate)
  D: forces only
  E: integrate only
  F: forces minus walls/cohesion (pair chain alone)

Run: python scripts/probe_substep_fixed.py [--cap 8192] [--nsub 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=8192)
    ap.add_argument("--K", type=int, default=16)
    ap.add_argument("--active", type=int, default=2048)
    ap.add_argument("--nsub", type=int, default=20)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from sedifoam_tpu.config import DEMConfig, PairParams
    from sedifoam_tpu.dem import integrate as _dem
    from sedifoam_tpu.dem.state import make_particles

    d = 0.0005
    cap, K = args.cap, args.K
    n_act = min(args.active, cap)
    rng = np.random.default_rng(0)
    pos = rng.uniform(-0.02, 0.02, (n_act, 3)) * [1, 0, 1]
    pos[:, 1] = rng.uniform(0.0, 0.08, n_act)
    vel = np.zeros((n_act, 3))
    vel[:, 1] = 1.72
    st = make_particles(pos, d / 2, 1000.0, vel=vel, capacity=cap,
                        neighbor_k=K, dtype=jnp.float32)
    cfg = DEMConfig(
        dt=1e-6, pair=PairParams(style="hertz_history", kn=1e4, kt=2857.0,
                                 gamman=0.3, xmu=0.1),
        gravity=(0.0, -9.81, 0.0),
        backend="binned", nbr_k=K, max_per_bin=10,
        cutoff=1.6 * d, skin=0.3 * d, audit_ring=1.3 * d,
        domain_lo=(-0.15, 0.0, -0.15), domain_hi=(0.15, 0.3, 0.15))

    st = jax.jit(lambda s: _dem.setup_forces(s, cfg))(st)
    float(st.pos.ravel()[0])

    def scan_of(body):
        def run(s):
            def f(c, _):
                return body(c), None
            out, _ = jax.lax.scan(f, s, None, length=args.nsub)
            return out
        return jax.jit(run)

    variants = {
        "A_full_substep": scan_of(lambda s: _dem._substep(s, cfg, 0.0)),
        "B_forces_integrate": scan_of(
            lambda s: s._replace(vel=s.vel + 1e-12 * _dem.compute_forces(
                s, cfg).force)),
        "C_rebuildcheck_only": scan_of(
            lambda s: _dem.maybe_rebuild_neighbors(
                s._replace(pos=s.pos + 1e-12), cfg)),
        "D_forces_only": scan_of(
            lambda s: s._replace(fdrag=1e-30 * _dem.compute_forces(
                s, cfg).force + s.fdrag)),
    }

    out = {}
    for name, fn in variants.items():
        s2 = fn(st)
        float(s2.pos.ravel()[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s2 = fn(s2)
            float(s2.pos.ravel()[0])
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts) / args.nsub * 1e3, 3)
        print(f"{name}: {out[name]} ms/iter", flush=True)

    print(json.dumps({"cap": cap, "K": K, "nsub": args.nsub, **out}))


if __name__ == "__main__":
    main()
