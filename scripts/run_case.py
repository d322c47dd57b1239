"""Generic case runner — the reference's per-case Allrun.sh analogue.

Runs any sediFoam-format case directory end to end: loads it unmodified,
steps to endTime (or --t-end), samples the probes declared in the case's
own system/controlDict functions block, writes time directories at
writeInterval, and emits a JSON summary.

  python scripts/run_case.py CASE_DIR [--t-end T] [--out-dir DIR]
        [--backend dense|binned] [--f64] [--dump snapshot.dump]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def probe_locations_from_controldict(case_dir):
    from sedifoam_tpu.io import foamdict
    cd = foamdict.parse_file(os.path.join(case_dir, "system", "controlDict"))
    funcs = cd.get("functions", {})
    if not isinstance(funcs, dict):
        return []
    for spec in funcs.values():
        if isinstance(spec, dict) and spec.get("type") == "probes":
            locs = spec.get("probeLocations", [])
            return [tuple(float(x) for x in p) for p in locs
                    if isinstance(p, list) and len(p) == 3]
    return []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("case_dir")
    ap.add_argument("--t-end", type=float, default=None)
    ap.add_argument("--out-dir", default="")
    ap.add_argument("--backend", default="binned")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--dump", default="")
    ap.add_argument("--dump-every", type=int, default=50)
    ap.add_argument("--semi-implicit-drag", action="store_true",
                    help="enable the semi-implicit fluid-side drag "
                         "(stiff gas-solid beds, e.g. expWachem_PCM)")
    ap.add_argument("--foam-output", action="store_true",
                    help="also write OpenFOAM-ASCII field files into the "
                         "time directories (readable by the reference's "
                         "own post-processing)")
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
    cfg, fluid, particles, controls = load_case(args.case_dir,
                                                backend=args.backend,
                                                dtype=dtype)
    if args.semi_implicit_drag:
        import dataclasses
        cfg = dataclasses.replace(cfg, cloud=dataclasses.replace(
            cfg.cloud, semi_implicit_drag=True))
    state = initialize(fluid, particles, cfg)

    probes = probe_locations_from_controldict(args.case_dir)
    sim = Simulation(cfg, state, probe_locations=probes or None,
                     steps_per_host_visit=20)
    sim.foam_output = args.foam_output

    dump = None
    if args.dump:
        from sedifoam_tpu.io.dump import DumpWriter
        box = (cfg.dem.domain_lo[0], cfg.dem.domain_hi[0],
               cfg.dem.domain_lo[1], cfg.dem.domain_hi[1],
               cfg.dem.domain_lo[2], cfg.dem.domain_hi[2])
        dump = DumpWriter(args.dump, box=box)
        visits = [0]

        def on_sample(s):
            visits[0] += 1
            if visits[0] % args.dump_every == 0:
                dump.write(int(s.state.fluid.step), s.state.particles)
    else:
        on_sample = None

    t_end = args.t_end if args.t_end is not None else controls.end_time
    sim.run(t_end, probe_every=1, log_every=50,
            write_dir=args.out_dir or None,
            write_interval=controls.write_interval if args.out_dir else None,
            on_sample=on_sample)
    if dump is not None:
        dump.close()

    summary = {
        "case": os.path.basename(os.path.normpath(args.case_dir)),
        "t_end": t_end,
        "n_particles": int(jnp.sum(sim.state.particles.active)),
        "wall_time_s": round(sim.wall_time, 2),
        "steps_per_s": round(t_end / cfg.fluid.dt / max(sim.wall_time, 1e-9),
                             2),
    }
    if sim.log:
        summary["final_diagnostics"] = sim.log[-1]
    if sim.probes is not None and args.out_dir:
        t, p = sim.probes.series("p")
        np.savez(os.path.join(args.out_dir, "probes.npz"), times=t, p=p)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
