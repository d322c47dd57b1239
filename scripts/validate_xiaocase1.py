"""xiaocase1 golden validation: fluidized-pipe probe pressure drop.

Reference: cases/auto-testing/test-cases/xiaocase1 — 2,160 1.5 mm glass
particles in a 4 x 20 cm air column; the inlet ramps 0 -> 1.5 m/s over
15 s and back. The validation metric is the pressure drop between probes
at y=0.002 and y=0.16 (postprocessing.py:12-20) against data/p_bench.dat.

Run:  python scripts/validate_xiaocase1.py [--t-end 2.0] [--f64] [--case DIR]
Prints one JSON line with the comparison summary.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=2.0)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--case", default="/root/reference/cases/auto-testing/"
                    "test-cases/xiaocase1")
    ap.add_argument("--out", default="")
    ap.add_argument("--ckpt-split", type=float, default=0.0, metavar="T",
                    help="checkpoint at t=T, tear the session down, and "
                    "resume from the checkpoint into a FRESH Simulation "
                    "(as a restarted process would) before continuing to "
                    "t_end — the end-to-end `startFrom latestTime` path; "
                    "all physics gates must pass exactly as in a "
                    "straight run")
    args = ap.parse_args()

    import jax
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.runtime.runner import Simulation
    from sedifoam_tpu.solver import initialize

    dtype = jnp.float64 if args.f64 else jnp.float32
    cfg, fluid, particles, controls = load_case(args.case, backend="binned",
                                                dtype=dtype)
    state = initialize(fluid, particles, cfg)

    # probe locations from xiaocase1/system/controlDict functions block
    probes = [(0.02, 0.002, 0.003), (0.02, 0.16, 0.003)]
    sim = Simulation(cfg, state, probe_locations=probes,
                     steps_per_host_visit=20, )
    resumed_at = None
    if 0.0 < args.ckpt_split < args.t_end:
        sim.run(args.ckpt_split, probe_every=5)
        import tempfile
        ckpt = os.path.join(tempfile.mkdtemp(prefix="xc1_ckpt_"),
                            "checkpoint.npz")
        sim.save_checkpoint(ckpt)
        resumed_at = sim.t
        wall_before = sim.wall_time
        del sim, state
        # fresh session, as a restarted process: re-load, re-init,
        # restore everything (incl. contact history + probe series)
        cfg, fluid, particles, controls = load_case(
            args.case, backend="binned", dtype=dtype)
        state = initialize(fluid, particles, cfg)
        sim = Simulation(cfg, state, probe_locations=probes,
                         steps_per_host_visit=20)
        sim.resume(ckpt)
        sim.wall_time = wall_before
        assert abs(sim.t - resumed_at) < 1e-9
    sim.run(args.t_end, probe_every=5)

    times, p = sim.probes.series("p")
    dp = p[:, 0] - p[:, 1]

    bench = np.loadtxt(os.path.join(args.case, "data", "p_bench.dat"))

    # physically meaningful comparison: the fixed-bed ramp (t < 8 s) is
    # deterministic -> pointwise; the bubbling-bed plateau (9-23 s) is
    # chaotic -> compare the mean level (the bed-weight support)
    result = {"t_end": args.t_end, "n_samples": int(len(times)),
              "wall_time_s": round(sim.wall_time, 2)}
    if resumed_at is not None:
        result["resumed_at"] = round(resumed_at, 6)
    ramp = (times >= bench[0, 0]) & (times < min(8.0, args.t_end))
    if ramp.any():
        b = np.interp(times[ramp], bench[:, 0], bench[:, 1])
        result["ramp_max_rel_err"] = float(
            np.abs(dp[ramp] - b).max() / np.abs(b).max())
    plateau = (times > 9.0) & (times < 23.0)
    if plateau.any():
        bm = (bench[:, 0] > 9.0) & (bench[:, 0] < 23.0)
        result["plateau_mean"] = float(dp[plateau].mean())
        result["plateau_mean_bench"] = float(bench[bm, 1].mean())
        result["plateau_rel_err"] = abs(
            result["plateau_mean"] / result["plateau_mean_bench"] - 1.0)
    # end-state audits incl. f32-vs-compensated accumulation drift
    diag = {k: float(v) for k, v in sim.diag_fn(sim.state).items()}
    for k in ("continuity_err", "audit_drift_asrc_y", "alpha_min"):
        result[k] = diag[k]
    # per-phase wall split (writeCPUTime.H analogue) for the perf record
    result["timing_split_ms"] = {
        k: round(v * 1e3, 2) for k, v in sim.timing_split().items()}
    print(json.dumps(result))
    if args.out:
        np.savez(args.out, times=times, dp=dp)


if __name__ == "__main__":
    main()
