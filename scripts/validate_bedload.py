"""transport-bedload example-case validation: sheet-flow bed-load rate
vs the Meyer-Peter & Mueller (1948) law.

Reference: cases/example-cases/transport-bedload — the sediment-transport
case the SediFoam paper (Sun & Xiao 2016, arXiv:1601.03801) headlines:
d = 2.5 mm sand (rhoa 2650) in a 0.121 x 0.04 x 0.06 m channel, x/z
cyclic, top slip, kEqn LES, Ubar-feedback channel forcing (0.8 m/s),
hooke/history DEM with a frozen bottom layer (type 2). The case ships no
particle IC (Allrun.sh expects a user-generated In_initial.in), so a
jittered simple-cubic bed is synthesized at the case's own box extents —
one frozen layer + mobile layers above.

Physics gates (the reference ships no golden curve for this case):
- Shields number from the measured equilibrium channel forcing:
  tau_b = rhob * <gradP> * V_fluid / A_bed  (top is slip: all driving
  momentum lands on the bed), theta = tau_b / ((rhoa-rhob) g d);
- dimensionless transport rate q* = sum(m_vel_x * V_p)/(Lx Lz) /
  sqrt((s-1) g d^3) time-averaged over the developed window;
- gate: q* within a factor-3 band of MPM q*_mpm = 8 (theta - 0.047)^1.5
  (DEM/experiment scatter around MPM is classically ~2x; the SediFoam
  paper's own Fig. comparison sits within ~50%);
- frozen bed immobile, everything finite, no particle escapes.

Run: python scripts/validate_bedload.py [--t-end 3.0] [--quick]
Prints one JSON line.
"""

import argparse
import dataclasses
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/cases/example-cases/transport-bedload"
BOX = (0.0, 0.121250, 0.0, 0.04, 0.0, 0.06001)


def synth_bed(path, d, n_layers, frozen_layers=1, seed=7):
    """Jittered simple-cubic bed over the full x-z extent; bottom
    `frozen_layers` are type 2 (the case's immobilized bed)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    r = 0.5 * d
    pitch = 2.05 * r
    nx = int((BOX[1] - BOX[0] - d) / pitch)
    nz = int((BOX[5] - BOX[4] - d) / pitch)
    rows = []
    tag = 1
    for layer in range(n_layers):
        y = BOX[2] + r + layer * pitch
        for i in range(nx):
            for k in range(nz):
                x = BOX[0] + r + (i + 0.5) * (BOX[1] - BOX[0] - d) / nx
                z = BOX[4] + r + (k + 0.5) * (BOX[5] - BOX[4] - d) / nz
                jx, jz = rng.uniform(-0.02 * r, 0.02 * r, 2)
                t = 2 if layer < frozen_layers else 1
                rows.append(f"{tag} {t} {d} 2650.0 "
                            f"{x + jx:.8f} {y:.8f} {z + jz:.8f}")
                tag += 1
    with open(path, "w") as f:
        f.write("synthetic bedload IC\n\n")
        f.write(f"{len(rows)} atoms\n2 atom types\n\n")
        f.write(f"{BOX[0]} {BOX[1]} xlo xhi\n")
        f.write(f"{BOX[2]} {BOX[3]} ylo yhi\n")
        f.write(f"{BOX[4]} {BOX[5]} zlo zhi\n\n")
        f.write("Atoms\n\n")
        f.write("\n".join(rows) + "\n")
    return len(rows)


def assemble(tmp, d, n_layers):
    case = os.path.join(tmp, "bedload")
    os.makedirs(case)
    for sub in ("0", "system"):
        os.symlink(os.path.join(REF, sub), os.path.join(case, sub))
    os.makedirs(os.path.join(case, "constant", "polyMesh"))
    for f in os.listdir(os.path.join(REF, "constant")):
        src = os.path.join(REF, "constant", f)
        if f == "polyMesh":
            shutil.copy(os.path.join(src, "blockMeshDict"),
                        os.path.join(case, "constant", "polyMesh"))
        else:
            os.symlink(src, os.path.join(case, "constant", f))
    shutil.copy(os.path.join(REF, "in.lammps"), case)
    n = synth_bed(os.path.join(case, "In_initial.in"), d, n_layers)
    return case, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=3.0)
    ap.add_argument("--t-avg-start", type=float, default=1.5)
    ap.add_argument("--t-settle", type=float, default=0.3,
                    help="DEM settling phase with the channel forcing off "
                    "— the reference expects a user-generated settled "
                    "In_initial.in (Allrun.sh); this generates it in situ")
    ap.add_argument("--coarsen", type=int, default=2)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--quick", action="store_true",
                    help="4x-coarsened mesh, 0.05 s, smoke gates only")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.quick:
        args.t_end, args.coarsen, args.t_settle = 0.05, 4, 0.1

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sedifoam_tpu.fluid.state import init_fluid
    from sedifoam_tpu.grid import Grid
    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.runtime.runner import Simulation
    from sedifoam_tpu.solver import initialize
    from sedifoam_tpu.utils.postprocess import coarsen_faces

    d = 2.5e-3
    tmp = tempfile.mkdtemp(prefix="bedload_")
    case, n_part = assemble(tmp, d, args.layers)
    cfg, fluid, particles, controls = load_case(
        case, backend="binned", dtype=jnp.float32, capacity=8192)
    # water + a dense sand bed: the explicit fluid-side drag reaction has
    # coupling gain dt*Omega/(rhob*beta) >> 2 (same regime as
    # expWachem_PCM; quantified in tests/test_wachem_explicit.py) — the
    # Ubar kick through the bed diverges in a few steps without the
    # semi-implicit branch
    cfg = dataclasses.replace(cfg, cloud=dataclasses.replace(
        cfg.cloud, semi_implicit_drag=True))
    if args.coarsen > 1:
        g = cfg.grid
        grid = Grid.from_faces(*(coarsen_faces(np.asarray(g.axis_faces(a)),
                                               args.coarsen)
                                 for a in range(3)))
        cfg = dataclasses.replace(cfg, grid=grid)
        fluid = init_fluid(grid, dtype=jnp.float32)
    state = initialize(fluid, particles, cfg)
    frozen_mask = np.asarray(state.particles.ptype == 2)

    if args.t_settle > 0:
        # settle the loose synthetic bed in quiescent water before the
        # Ubar controller kicks in (the controller applies the full
        # velocity correction in one step, reference chPressureGrad
        # semantics — a loose suspended bed under that kick diverges;
        # the reference runs from a pre-settled In_initial.in)
        from sedifoam_tpu.config import ChannelForcing
        cfg_settle = dataclasses.replace(
            cfg, fluid=dataclasses.replace(
                cfg.fluid, forcing=ChannelForcing(mode="none")))
        sim0 = Simulation(cfg_settle, state, steps_per_host_visit=25)
        sim0.run(args.t_settle)
        state = sim0.state
        state = state._replace(fluid=state.fluid._replace(
            time=jnp.zeros_like(state.fluid.time)))

    frozen0 = np.asarray(state.particles.pos)[frozen_mask]

    rhoa, rhob, g = 2650.0, cfg.fluid.rhob, 9.81
    s = rhoa / rhob
    Lx = BOX[1] - BOX[0]
    Lz = BOX[5] - BOX[4]
    cellV = np.asarray(cfg.grid.cell_volume)

    samples = {"t": [], "q": [], "gp": [], "Vb": []}

    def on_sample(sim):
        ps = sim.state.particles
        fsl = sim.state.fluid
        mob = ps.active & (ps.ptype == 1)
        vp = (4.0 / 3.0) * np.pi * np.asarray(ps.radius) ** 3
        qx = float(jnp.sum(jnp.where(mob, ps.vel[:, 0], 0.0)
                           * jnp.asarray(vp))) / (Lx * Lz)
        samples["t"].append(sim.t)
        samples["q"].append(qx)
        samples["gp"].append(float(fsl.grad_p_value))
        samples["Vb"].append(float(jnp.sum((1.0 - fsl.alpha) * cellV)))

    sim = Simulation(cfg, state, steps_per_host_visit=25)
    sim.run(args.t_end, on_sample=on_sample)

    t = np.asarray(samples["t"])
    q = np.asarray(samples["q"])
    gp = np.asarray(samples["gp"])
    Vb = np.asarray(samples["Vb"])
    late = t >= (args.t_avg_start if not args.quick else 0.0)

    q_mean = float(q[late].mean())
    gp_mean = float(gp[late].mean())
    tau_b = rhob * gp_mean * float(Vb[late].mean()) / (Lx * Lz)
    theta = tau_b / ((rhoa - rhob) * g * d)
    q_star = q_mean / np.sqrt((s - 1.0) * g * d ** 3)
    theta_c = 0.047
    q_mpm = 8.0 * max(theta - theta_c, 0.0) ** 1.5

    ps = sim.state.particles
    frozen1 = np.asarray(ps.pos)[frozen_mask]
    fs = sim.state.fluid
    result = {
        "quick": bool(args.quick),
        "grid": list(cfg.grid.shape),
        "n_particles": int(n_part),
        "t_end": args.t_end,
        "wall_time_s": round(sim.wall_time, 2),
        "Ub_bulk": float(jnp.mean(fs.Ub[0])),
        "gradP_mean": gp_mean,
        "tau_b": round(float(tau_b), 4),
        "shields_theta": round(float(theta), 4),
        "q_star": round(float(q_star), 4),
        "q_star_mpm": round(float(q_mpm), 4),
        "q_ratio_vs_mpm": round(float(q_star / q_mpm), 3)
        if q_mpm > 0 else None,
        "frozen_max_disp": float(np.abs(frozen1 - frozen0).max()),
        "finite": bool(np.isfinite(np.asarray(fs.p)).all()
                       and np.isfinite(np.asarray(ps.vel)).all()),
        "n_active": int(np.asarray(ps.active).sum()),
        "timing_split_ms": {k: round(v * 1e3, 2)
                            for k, v in sim.timing_split().items()},
    }
    gates = {
        "finite": result["finite"],
        "frozen_immobile": result["frozen_max_disp"] == 0.0,
        "no_escapes": result["n_active"] == n_part,
    }
    if not args.quick:
        gates["transporting"] = theta > theta_c and q_star > 0.1
        gates["mpm_band"] = (q_mpm > 0
                             and q_mpm / 3.0 < q_star < q_mpm * 3.0)
    result["gates"] = gates
    result["passed"] = all(gates.values())
    print(json.dumps(result))
    if args.out:
        np.savez(args.out, t=t, q_star=q / np.sqrt((s - 1) * g * d ** 3),
                 gp=gp, theta=float(theta), q_star_mean=float(q_star),
                 q_star_mpm=float(q_mpm))


if __name__ == "__main__":
    main()
