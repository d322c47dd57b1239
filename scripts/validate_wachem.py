"""expWachem_PCM golden-free validation: fluidized-bed pressure signal.

Reference: cases/auto-testing/test-cases/expWachem_PCM — the van Wachem
bubbling-bed validation. The reference ships NO benchmark curve (data/
README: "Pressure signal at some points for comparison"), so the gates
are physical invariants + regression against our recorded baseline:

1. the time-mean probe pressure drop over the fluidized phase supports
   the bed weight: dp ~= (1 - rhob/rhoa) * M_bed * g / A  (buoyant weight
   per column area),
2. continuity residual stays small (this caught the round-1 bf16
   preconditioner bug: continuity_err was 85 /s, now ~3e-3),
3. alpha stays in [0, maxPossibleAlpha],
4. dp mean within tolerance of results/expWachem_PCM_baseline.npz when
   that file exists (regression), else the run records it.

Run:  python scripts/validate_wachem.py [--t-end 3.0] [--out PREFIX]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=3.0)
    ap.add_argument("--case", default="/root/reference/cases/auto-testing/"
                    "test-cases/expWachem_PCM")
    ap.add_argument("--out", default="")
    ap.add_argument("--baseline",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "results",
                                         "expWachem_PCM_baseline.npz"))
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.runtime.runner import Simulation
    from sedifoam_tpu.solver import initialize
    from scripts.run_case import probe_locations_from_controldict

    cfg, fluid, particles, controls = load_case(args.case, backend="binned",
                                                dtype=jnp.float32)
    # stiff gas-solid drag: the explicit coupling gain exceeds 1 at this
    # density ratio; use the reference's (dormant) semi-implicit branch
    cfg = dataclasses.replace(cfg, cloud=dataclasses.replace(
        cfg.cloud, semi_implicit_drag=True))
    state = initialize(fluid, particles, cfg)

    probes = probe_locations_from_controldict(args.case) or \
        [(0.045, 0.005, 0.004), (0.045, 0.4, 0.004)]
    sim = Simulation(cfg, state, probe_locations=probes,
                     steps_per_host_visit=25)

    from sedifoam_tpu.utils.postprocess import TimeAverager
    avg = TimeAverager()
    t_fluid = min(1.0, 0.5 * args.t_end)

    def on_sample(s):
        if s.t > t_fluid:
            np_alpha = np.asarray(s.state.fluid.alpha)
            avg.add(alpha=np_alpha)

    sim.run(args.t_end, probe_every=1, log_every=40, on_sample=on_sample)

    times, p = sim.probes.series("p")
    # probe pair bracketing the largest height span (controlDict probes
    # sit at y=0.005 and y=0.045 — INSIDE the ~0.085 m bed, so the
    # physical balance is against the bed mass BETWEEN those heights)
    ys = [loc[1] for loc in probes]
    i_lo, i_hi = int(np.argmin(ys)), int(np.argmax(ys))
    y_lo, y_hi = ys[i_lo], ys[i_hi]
    dp = p[:, i_lo] - p[:, i_hi]
    fluidized = times > min(1.0, 0.5 * args.t_end)
    dp_mean = float(dp[fluidized].mean())

    # buoyant weight per column cross-section of the suspension between
    # the probe heights, from the TIME-AVERAGED alpha field over the same
    # fluidized window the dp mean uses (bubbles move mass through the
    # span, so an instantaneous snapshot is inconsistent with <dp>)
    ps = sim.state.particles
    act = np.asarray(ps.active)
    rho_p = float(np.asarray(ps.density)[act].mean())
    g = abs(cfg.fluid.gravity[1])
    alpha_mean = avg.mean("alpha")
    yc = cfg.grid.axis_centers(1)
    wy = cfg.grid.axis_widths(1)
    in_span = (yc >= y_lo) & (yc <= y_hi)
    alpha_y = alpha_mean.mean(axis=(0, 2))      # column-averaged profile
    dp_bed = float((rho_p - cfg.fluid.rhob) * g
                   * np.sum(alpha_y[in_span] * wy[in_span]))

    diag = {k: float(v) for k, v in sim.diag_fn(sim.state).items()}
    result = {
        "case": "expWachem_PCM", "t_end": args.t_end,
        "n_particles": int(act.sum()),
        "wall_time_s": round(sim.wall_time, 2),
        "dp_mean": dp_mean, "dp_bed_weight": dp_bed,
        "dp_vs_bed_weight_rel_err": abs(dp_mean / dp_bed - 1.0),
        "continuity_err": diag["continuity_err"],
        "alpha_min": diag["alpha_min"], "alpha_max": diag["alpha_max"],
        "audit_drift_asrc_y": diag["audit_drift_asrc_y"],
    }
    if os.path.exists(args.baseline):
        base = np.load(args.baseline)
        result["baseline_dp_mean"] = float(base["dp_mean"])
        result["dp_vs_baseline_rel_err"] = abs(
            dp_mean / float(base["dp_mean"]) - 1.0)
    elif args.out:
        np.savez(args.baseline, times=times, dp=dp, dp_mean=dp_mean)
        # a run that creates its own baseline has nothing to regress
        # against — report it as a distinct status so the battery judge
        # can refuse to count it as a pass (ADVICE r3)
        result["baseline_created"] = True
        result["status"] = "baseline"

    # per-phase wall split (writeCPUTime.H analogue) for the perf record
    result["timing_split_ms"] = {
        k: round(v * 1e3, 2) for k, v in sim.timing_split().items()}
    print(json.dumps(result))
    if args.out:
        np.savez(args.out + "_probes.npz", times=times, p=p, dp=dp)
        with open(args.out + "_summary.json", "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
