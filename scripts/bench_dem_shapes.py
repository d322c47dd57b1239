"""Per-substep DEM cost vs (capacity, K) at the jetFlow shape.

The jetFlow full-stage profile (scripts/profile_jetflow.py) measured
~19 ms per DEM substep at capacity 65536 / K=16 — 5.6x the 3.2 ns/row
gather floor for its 1.05M partner rows. This sweeps the table shape on
a jet-like dilute bed (small active cluster, rest of capacity inactive)
to pin where the extra time goes: the partner gather, the fused chain,
the rebuild-check, or the forced rebuild itself.

Run: python scripts/bench_dem_shapes.py [--caps 8192,16384,32768,65536]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="8192,16384,32768,65536")
    ap.add_argument("--ks", default="8,16")
    ap.add_argument("--active", type=int, default=2048)
    ap.add_argument("--nsub", type=int, default=10)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from sedifoam_tpu.config import DEMConfig, PairParams
    from sedifoam_tpu.dem import integrate as _dem
    from sedifoam_tpu.dem.state import make_particles

    d = 0.0005
    results = []
    for cap in [int(c) for c in args.caps.split(",")]:
        for K in [int(k) for k in args.ks.split(",")]:
            n_act = min(args.active, cap)
            rng = np.random.default_rng(0)
            # dilute jet-like cluster near the inlet: mean spacing 2d
            pos = rng.uniform(-0.02, 0.02, (n_act, 3)) * [1, 0, 1]
            pos[:, 1] = rng.uniform(0.0, 0.08, n_act)
            vel = np.zeros((n_act, 3))
            vel[:, 1] = 1.72
            st = make_particles(pos, d / 2, 1000.0, vel=vel,
                                capacity=cap, neighbor_k=K,
                                dtype=jnp.float32)
            cfg = DEMConfig(
                dt=1e-6, pair=PairParams(style="hertz_history", kn=1e4,
                                         kt=2857.0, gamman=0.3, xmu=0.1),
                gravity=(0.0, -9.81, 0.0),
                backend="binned", nbr_k=K, max_per_bin=10,
                cutoff=1.6 * d, skin=0.3 * d, audit_ring=1.3 * d,
                domain_lo=(-0.15, 0.0, -0.15), domain_hi=(0.15, 0.3, 0.15))

            f_setup = jax.jit(lambda s, c=cfg: _dem.setup_forces(s, c))
            st = f_setup(st)
            float(st.pos.ravel()[0])

            f_run = jax.jit(lambda s, c=cfg, n=args.nsub: _dem.run_dem(
                s, c, n))
            st2 = f_run(st)
            float(st2.pos.ravel()[0])

            # thread outputs so the tunnel cannot dedupe
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                st2 = f_run(st2)
                float(st2.pos.ravel()[0])
                ts.append(time.perf_counter() - t0)
            sub_ms = min(ts) / args.nsub * 1e3

            # forces only (no integrate/rebuild-check)
            f_forces = jax.jit(lambda s, c=cfg: _dem.compute_forces(s, c))
            sf = f_forces(st)
            float(sf.pos.ravel()[0])
            tf = []
            for _ in range(3):
                t0 = time.perf_counter()
                sf = f_forces(sf)
                float(sf.pos.ravel()[0])
                tf.append(time.perf_counter() - t0)

            # partner gather only
            from sedifoam_tpu.dem.neighbor import gather_partners
            f_gath = jax.jit(lambda s, c=cfg: gather_partners(
                s, s.nbr_idx, c.periodic_len())[1].sum())
            v = f_gath(st)
            float(v)
            tg = []
            s_in = st
            for i in range(3):
                # perturb input so dedupe can't fire
                s_in = s_in._replace(pos=s_in.pos + 1e-9 * (i + 1))
                t0 = time.perf_counter()
                v = f_gath(s_in)
                float(v)
                tg.append(time.perf_counter() - t0)

            # forced rebuild (no force pass)
            f_reb = jax.jit(lambda s, c=cfg: _dem.maybe_rebuild_neighbors(
                s, c, force=True))
            sr = f_reb(st)
            float(sr.pos.ravel()[0])
            tr = []
            s_in = st
            for i in range(3):
                s_in = s_in._replace(pos=s_in.pos + 1e-9 * (i + 1))
                t0 = time.perf_counter()
                sr = f_reb(s_in)
                float(sr.pos.ravel()[0])
                tr.append(time.perf_counter() - t0)

            row = {"cap": cap, "K": K, "active": n_act,
                   "substep_ms": round(sub_ms, 2),
                   "forces_ms": round(min(tf) * 1e3, 2),
                   "gather_ms": round(min(tg) * 1e3, 2),
                   "rebuild_ms": round(min(tr) * 1e3, 2),
                   "rows_M": round(cap * K / 1e6, 2)}
            results.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
