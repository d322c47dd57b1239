"""Multi-chip coupled-throughput bench — runs UNCHANGED on a real v5e-8.

Shards the headline bench bed (131,072 particles, 32x64x32 grid, binned
K=8, f32) over every available device exactly as the dryrun does
(parallel/mesh.shard_state: grid-x slabs + capacity-axis particle
sharding, sort_on_rebuild for slab alignment) and measures coupled
particle-substeps/s. On this machine only ONE real chip is reachable, so:

  python scripts/bench_multichip.py                 # real chip(s), n=all
  python scripts/bench_multichip.py --devices 1     # subset
  python scripts/bench_multichip.py --virtual 8     # 8 virtual CPU devs
                                                    # (harness validation
                                                    #  only; CPU speed is
                                                    #  not the metric)

On real multi-chip hardware the same invocation times the same program
over the ICI mesh; compare against SCALING.md's projected psteps/s.
Prints ONE JSON line.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def run_bench(n_devices, n_particles, n_timed):
    import jax
    import jax.numpy as jnp

    import bench
    from sedifoam_tpu.parallel.mesh import make_mesh, shard_state
    from sedifoam_tpu.solver import make_step_fn

    sub_steps = 10
    cfg, state = bench.build_case(n_particles=n_particles,
                                  nx=32, ny=64, nz=32,
                                  sub_steps=sub_steps, backend="binned",
                                  sort_on_rebuild=(n_devices > 1))
    mesh = make_mesh(n_devices)
    state = shard_state(state, mesh)
    step = make_step_fn(cfg)

    def sync(s):
        return float(jnp.sum(s.particles.vel[:, 1]))

    t0 = time.perf_counter()
    state = step(state)
    sync(state)
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_timed):
        state = step(state)
    sync(state)
    dt_wall = time.perf_counter() - t0

    dropped = int(state.particles.nbr_dropped)
    psteps = n_particles * sub_steps * n_timed / dt_wall
    result = {
        "metric": "particle_dem_substeps_per_sec_coupled_multichip",
        "value": round(psteps, 1),
        "unit": "particle-substeps/s",
        "n_devices": n_devices,
        "backend": jax.default_backend(),
        "n_particles": n_particles,
        "step_ms": round(dt_wall / n_timed * 1e3, 2),
        "first_step_s": round(t_first, 1),
        "nbr_dropped": dropped,
    }
    print(json.dumps(result))
    if dropped:
        raise SystemExit("NEIGHBOR AUDIT FAILED: in-ring partners dropped")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="devices to use (0 = all available)")
    ap.add_argument("--virtual", type=int, default=0,
                    help="re-exec on N virtual CPU devices (harness "
                    "validation; CPU wall time is not the metric)")
    ap.add_argument("--particles", type=int, default=131072)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    if args.virtual:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append(
            f"--xla_force_host_platform_device_count={args.virtual}")
        env["XLA_FLAGS"] = " ".join(flags)
        code = (
            "import os, sys; "
            "os.environ['JAX_PLATFORMS'] = 'cpu'; "
            f"os.environ['XLA_FLAGS'] = {env['XLA_FLAGS']!r}; "
            f"sys.path.insert(0, {REPO!r}); "
            f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r}); "
            f"from bench_multichip import run_bench; "
            f"run_bench({args.virtual}, {args.particles}, {args.steps})")
        res = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO)
        sys.exit(res.returncode)

    import jax
    n = args.devices or len(jax.devices())
    run_bench(n, args.particles, args.steps)


if __name__ == "__main__":
    main()
