"""Profile ONE coupled step at the jetFlow FULL shape (round-5 item #1).

The round-4 battery killed jetFlow's full stage after 3h47m at ~250/7500
steps (~54 s/step); quick mode (2x-coarsened, capacity 8192) runs the
whole case in ~90 s. This script isolates where the full-size program
(313k-cell embedded O-grid + capacity-65536 DEM tables) spends its time:

  1. compile wall time + XLA memory analysis (HBM spill check)
  2. per-step wall over a window covering injection events
     (add_interval/dt steps apart) vs quiet steps
  3. phase split (fluid / evolve / source) at the full shape
  4. the forced neighbor rebuild + setup_forces alone (the injection
     path's lax.cond body) at capacity 65536

Run:  python scripts/profile_jetflow.py [--steps 30] [--capacity 65536]
Prints one JSON line at the end.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--capacity", type=int, default=65536)
    ap.add_argument("--case",
                    default="/root/reference/cases/example-cases/jetFlow")
    ap.add_argument("--skip-phases", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.solver import initialize, make_step_fn

    t0 = time.perf_counter()
    cfg, fluid, particles, controls = load_case(
        args.case, backend="binned", dtype=jnp.float32, embed_ogrid=True,
        capacity=args.capacity)
    print(f"load_case: {time.perf_counter()-t0:.1f}s  grid="
          f"{cfg.grid.shape} ncells={int(np.prod(cfg.grid.shape))} "
          f"capacity={args.capacity} sub_cycles={cfg.cloud.sub_cycles} "
          f"sub_steps={cfg.cloud.sub_steps} dt={cfg.fluid.dt} "
          f"add_interval={cfg.cloud.add_interval}", flush=True)
    dcfg = cfg.dem
    print(f"dem: nbr_k={dcfg.nbr_k} max_per_bin={dcfg.max_per_bin} "
          f"cutoff={dcfg.cutoff} skin={dcfg.skin} "
          f"domain={dcfg.domain_lo}..{dcfg.domain_hi}", flush=True)
    if dcfg.cutoff > 0:
        nbins = [int(np.ceil((dcfg.domain_hi[a] - dcfg.domain_lo[a])
                             / dcfg.cutoff)) for a in range(3)]
        print(f"bins: {nbins} = {int(np.prod(nbins)):,}", flush=True)

    t0 = time.perf_counter()
    state = initialize(fluid, particles, cfg)
    jax.block_until_ready(state)
    # real sync through the tunnel: fetch a value
    float(state.fluid.p.ravel()[0])
    print(f"initialize: {time.perf_counter()-t0:.1f}s  active="
          f"{int(np.asarray(state.particles.active).sum())}", flush=True)

    step = make_step_fn(cfg, n_sub=1)
    t0 = time.perf_counter()
    lowered = step.lower(state)
    print(f"lower: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            "peak_mb": round((ma.argument_size_in_bytes
                              + ma.output_size_in_bytes
                              + ma.temp_size_in_bytes) / 2**20, 1),
        }
        print(f"memory: {mem}", flush=True)
    except Exception as e:  # axon may not expose it
        print(f"memory_analysis unavailable: {e}", flush=True)

    def sync(s):
        return float(s.fluid.p.ravel()[0])

    # warm-up execution (first run can include final codegen)
    t0 = time.perf_counter()
    state = compiled(state)
    sync(state)
    print(f"first step: {time.perf_counter()-t0:.1f}s", flush=True)

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state = compiled(state)
        sync(state)
        times.append(time.perf_counter() - t0)
        print(f"step {i}: {times[-1]*1e3:.1f} ms  active="
              f"{int(np.asarray(state.particles.active).sum())}", flush=True)

    times = np.asarray(times)
    result = {
        "grid": list(cfg.grid.shape),
        "capacity": args.capacity,
        "step_ms_median": round(float(np.median(times)) * 1e3, 1),
        "step_ms_max": round(float(times.max()) * 1e3, 1),
        "step_ms_all": [round(float(t) * 1e3, 1) for t in times],
        **mem,
    }

    if not args.skip_phases:
        from sedifoam_tpu.runtime.runner import Simulation
        sim = Simulation(cfg, state)
        sim.state = state
        split = sim.timing_split(n=3)
        result["timing_split_ms"] = {k: round(v * 1e3, 1)
                                     for k, v in split.items()}
        print(f"phase split: {result['timing_split_ms']}", flush=True)

        # the injection lax.cond body alone: forced rebuild + setup
        from sedifoam_tpu.dem import integrate as _dem
        f_setup = jax.jit(lambda st: _dem.compute_forces(
            _dem.maybe_rebuild_neighbors(st, cfg.dem, force=True),
            cfg.dem, shearupdate=False))
        ps = f_setup(state.particles)
        float(ps.pos.ravel()[0])
        t_re = []
        for _ in range(3):
            t0 = time.perf_counter()
            ps = f_setup(ps)
            float(ps.pos.ravel()[0])
            t_re.append(time.perf_counter() - t0)
        result["forced_rebuild_ms"] = round(min(t_re) * 1e3, 1)
        print(f"forced rebuild+setup: {result['forced_rebuild_ms']} ms",
              flush=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
