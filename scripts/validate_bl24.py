"""BL24-TH1 example-case validation: the current-induced dune-formation
pipe (Case 1a of arXiv:1510.07201) run END-TO-END from its own shipped
files — the only example-case with a real In_initial.in (9341 spheres,
d = 0.5 mm, frozen type-2 bottom layer), a 3-block y-graded 16x100x4
channel (constant/polyMesh/blockMeshDict:47-51), kEqn LES, and
Ubar-feedback channel forcing at 0.167 m/s
(constant/transportProperties:43).

Unlike transport-bedload (synthetic bed), nothing is synthesized here:
mesh, BCs, LES model, DEM pair law (gran/hooke/history, in.lammps:17)
and the particle IC all come from the reference case directory.

Gates (the reference ships no golden curve; dune growth needs minutes
of simulated time, far beyond a validator):
- frozen bed immobile (type-2 displacement exactly 0 — `group active
  subtract all bottom` + `fix nve/sphere` semantics, in.lammps:23-26);
- Ubar controller locks the bulk fluid velocity to 0.167 m/s (late
  beta-weighted mean within 5% — chPressureGrad full-correction
  semantics);
- everything finite, no particle escapes, alpha in bounds;
- bed load q* recorded (plus the x-resolved bed-height profile in
  --out, the dune-precursor observable).

Run: python scripts/validate_bl24.py [--t-end 2.0] [--quick]
Prints one JSON line.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/cases/example-cases/BL24-TH1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=2.0)
    ap.add_argument("--t-avg-start", type=float, default=1.0)
    ap.add_argument("--quick", action="store_true",
                    help="0.05 s, smoke gates only")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.quick:
        args.t_end = 0.05

    import jax.numpy as jnp
    import numpy as np

    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.runtime.runner import Simulation
    from sedifoam_tpu.solver import initialize

    cfg, fluid, particles, controls = load_case(
        REF, backend="binned", dtype=jnp.float32, capacity=16384)
    # water + a dense sand bed: explicit fluid-side drag reaction has
    # coupling gain dt*Omega/(rhob*beta) >> 2 (tests/test_wachem_explicit
    # quantifies it) — the Ubar kick through the bed needs the
    # semi-implicit branch, as in validate_bedload.py
    cfg = dataclasses.replace(cfg, cloud=dataclasses.replace(
        cfg.cloud, semi_implicit_drag=True))
    state = initialize(fluid, particles, cfg)

    ps0 = state.particles
    frozen_mask = np.asarray(ps0.ptype == 2)
    n_part = int(np.asarray(ps0.active).sum())
    frozen0 = np.asarray(ps0.pos)[frozen_mask]
    d = 2.0 * float(np.asarray(ps0.radius)[np.asarray(ps0.active)].max())

    g = cfg.grid
    xf = np.asarray(g.axis_faces(0))
    Lx = float(xf[-1] - xf[0])
    zf = np.asarray(g.axis_faces(2))
    Lz = float(zf[-1] - zf[0])
    rhob = cfg.fluid.rhob
    rhoa = 2500.0
    grav = 9.8
    ubar = cfg.fluid.forcing.mag_ubar
    cellV = np.asarray(cfg.grid.cell_volume)

    samples = {"t": [], "q": [], "ub": [], "gp": []}

    def on_sample(sim):
        ps = sim.state.particles
        fs = sim.state.fluid
        mob = ps.active & (ps.ptype == 1)
        vp = (4.0 / 3.0) * np.pi * np.asarray(ps.radius) ** 3
        qx = float(jnp.sum(jnp.where(mob, ps.vel[:, 0], 0.0)
                           * jnp.asarray(vp))) / (Lx * Lz)
        beta = 1.0 - fs.alpha
        ub_bulk = float(jnp.sum(fs.Ub[0] * beta * jnp.asarray(cellV))
                        / jnp.sum(beta * jnp.asarray(cellV)))
        samples["t"].append(sim.t)
        samples["q"].append(qx)
        samples["ub"].append(ub_bulk)
        samples["gp"].append(float(fs.grad_p_value))

    sim = Simulation(cfg, state, steps_per_host_visit=25)
    sim.run(args.t_end, on_sample=on_sample)

    t = np.asarray(samples["t"])
    q = np.asarray(samples["q"])
    ub = np.asarray(samples["ub"])
    late = t >= (args.t_avg_start if not args.quick else 0.0)

    s = rhoa / rhob
    q_star = float(q[late].mean()) / np.sqrt((s - 1.0) * grav * d ** 3)
    ub_late = float(ub[late].mean())

    ps = sim.state.particles
    fs = sim.state.fluid
    frozen1 = np.asarray(ps.pos)[frozen_mask]
    act = np.asarray(ps.active)
    pos = np.asarray(ps.pos)[act]

    # x-resolved bed height: per x-bin 95th percentile of mobile-bed
    # particle height (the dune-precursor observable the arXiv case
    # tracks as the bedform profile)
    nxb = 16
    xb = np.clip(((pos[:, 0] - xf[0]) / Lx * nxb).astype(int), 0, nxb - 1)
    bed_h = np.array([
        np.percentile(pos[xb == i, 1], 95) if (xb == i).any() else np.nan
        for i in range(nxb)])

    result = {
        "quick": bool(args.quick),
        "case": "BL24-TH1",
        "grid": list(cfg.grid.shape),
        "n_particles": n_part,
        "t_end": args.t_end,
        "wall_time_s": round(sim.wall_time, 2),
        "ub_bulk_late": round(ub_late, 5),
        "ubar_target": ubar,
        "ubar_rel_err": round(abs(ub_late - ubar) / ubar, 5),
        "gradP_late_mean": float(np.asarray(samples["gp"])[late].mean()),
        "q_star": round(q_star, 5),
        "frozen_max_disp": float(np.abs(frozen1 - frozen0).max()),
        "alpha_min": float(jnp.min(fs.alpha)),
        "alpha_max": float(jnp.max(fs.alpha)),
        "finite": bool(np.isfinite(np.asarray(fs.p)).all()
                       and np.isfinite(np.asarray(ps.vel)).all()),
        "n_active": int(act.sum()),
        "timing_split_ms": {k: round(v * 1e3, 2)
                            for k, v in sim.timing_split().items()},
    }
    gates = {
        "finite": result["finite"],
        "frozen_immobile": result["frozen_max_disp"] == 0.0,
        "no_escapes": result["n_active"] == n_part,
        # the case's own settled In_initial.in bed packs to 0.715 when
        # diffusion-smoothed onto 0.5 mm-particles/1 mm-cells; gate at
        # the HCP bound (nothing physical can exceed it)
        "alpha_bounds": (result["alpha_min"] > -1e-4
                         and result["alpha_max"] < 0.74),
    }
    if not args.quick:
        gates["ubar_locked"] = result["ubar_rel_err"] < 0.05
    result["gates"] = gates
    result["passed"] = all(gates.values())
    print(json.dumps(result))
    if args.out:
        np.savez(args.out, t=t, q=q, ub=ub,
                 gp=np.asarray(samples["gp"]), bed_h=bed_h,
                 x_bins=(np.arange(nxb) + 0.5) * Lx / nxb + xf[0])


if __name__ == "__main__":
    main()
