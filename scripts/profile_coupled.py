"""Phase profile of the headline-bench coupled step on the chip.

Times each phase as its own jitted program with REAL syncs and with
outputs THREADED back as the next iteration's inputs (the tunnel dedupes
repeated identical executions — see STATUS.md platform quirks — so
same-arg timing loops measure only the dispatch floor).

Phases:
  step     : the full coupled step (bench.py's exact program)
  dem10    : the 10-substep DEM scan alone (run_dem)
  fluid    : advance_time + fluid_step (PISO + turbulence)
  evolve   : cloud.evolve (DEM scan + P2G/G2P transfers + smoothing)
  source   : lift_drag_coeffs (alpha cap, Asrc, lift)

Run on the TPU: python scripts/profile_coupled.py [--n 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_case
    from sedifoam_tpu.coupling import cloud as _cloud
    from sedifoam_tpu.dem import integrate as _dem
    from sedifoam_tpu.fluid.step import advance_time, fluid_step
    from sedifoam_tpu.solver import coupled_step

    if args.small:
        cfg, state = build_case(n_particles=256, nx=8, ny=16, nz=8,
                                sub_steps=10, backend="dense")
    else:
        cfg, state = build_case(n_particles=131072, nx=32, ny=64, nz=32,
                                sub_steps=10, backend="binned")

    def sync(x):
        return float(jax.tree.leaves(x)[0].ravel()[0])

    f_step = jax.jit(lambda s: coupled_step(s, cfg))
    f_dem = jax.jit(lambda p: _dem.run_dem(p, cfg.dem,
                                           cfg.cloud.sub_steps))
    f_fluid = jax.jit(lambda fs: fluid_step(
        advance_time(fs, cfg.fluid), cfg.grid, cfg.bcs, cfg.fluid,
        advance=False))
    f_evolve = jax.jit(lambda s: _cloud.evolve(
        s.fluid, s.particles, s.uf_smoothed, cfg.grid, cfg.bcs,
        cfg.cloud, cfg.dem, cfg.fluid))
    f_source = jax.jit(lambda s: _cloud.lift_drag_coeffs(
        s.fluid, s.particles, s.uf_smoothed, cfg.grid, cfg.bcs,
        cfg.cloud, cfg.fluid))

    out = {}

    def timed(name, fn, x0, thread):
        y = fn(x0)
        sync(y)                                    # compile + warm
        x = thread(x0, y)
        t0 = time.perf_counter()
        for _ in range(args.n):
            y = fn(x)
            x = thread(x, y)
        sync(y)
        out[name] = round((time.perf_counter() - t0) / args.n * 1e3, 3)
        print(f"{name:8s} {out[name]:9.3f} ms", flush=True)

    timed("step", f_step, state, lambda x, y: y)
    timed("dem10", f_dem, state.particles, lambda x, y: y)
    timed("fluid", f_fluid, state.fluid, lambda x, y: y)
    timed("evolve", f_evolve, state,
          lambda x, y: x._replace(fluid=y[0], particles=y[1],
                                  uf_smoothed=y[2]))
    timed("source", f_source, state, lambda x, y: x._replace(fluid=y))
    out["sum_phases"] = round(out["fluid"] + out["evolve"]
                              + out["source"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
