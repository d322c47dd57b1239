"""transport-suspended example-case validation: suspension regime gate.

Reference: cases/example-cases/transport-suspended — the suspended
sediment-transport case of the SediFoam paper (Sun & Xiao 2016,
arXiv:1601.03801): a periodic channel 0.12125 x 0.04 x 0.06 m (x/z
cyclic, ff walls in y), Ubar-feedback forcing (0.8 m/s,
transportProperties:43), SyamlalOBrien drag, hooke/history DEM with a
frozen type-2 bottom layer (in.lammps:21-28). The case ships no particle
IC (in.lammps:9 reads an absent In_initial.in), so a jittered
simple-cubic sand bed (d = 0.5 mm, rhoa 2650) is synthesized at the
case's box extents — one frozen layer + mobile layers above.

Physics gates (the reference ships no golden curve for this case):
- the flow must be in the SUSPENSION regime: Rouse number
  P = w_s / (kappa u*) < 2.5, with u* measured from the equilibrium
  channel forcing (tau_b = rhob <gradP> V_fluid / A_bed; the top is a
  wall here too, so the bed takes ~half — use the full-bed convention
  consistently with validate_bedload.py) and w_s from Ferguson &
  Church (2004) for natural sand;
- measured suspension: the mobile particles' center of mass must rise
  well above the initial bed (> 2x the initial mobile CoM height) and
  a non-trivial fraction of mobile mass must travel above 25% of the
  water depth;
- positive streamwise transport; frozen bed immobile; everything
  finite; no escapes.

Run: python scripts/validate_suspended.py [--t-end 3.0] [--quick]
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

REF = "/root/reference/cases/example-cases/transport-suspended"
BOX = (0.0, 0.121250, 0.0, 0.04, 0.0, 0.06001)


def synth_bed(path, d, n_layers, frozen_layers=1, seed=11):
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
        frozen = layer < frozen_layers
        # frozen roughness layer is dense; mobile layers are sparse
        # (pitch 2d) — the suspension gates measure regime, not bed
        # stock, and the sparse layer keeps the run tractable
        mx, mz = (nx, nz) if frozen else (nx // 2, nz // 2)
        for i in range(mx):
            for k in range(mz):
                x = BOX[0] + r + (i + 0.5) * (BOX[1] - BOX[0] - d) / mx
                z = BOX[4] + r + (k + 0.5) * (BOX[5] - BOX[4] - d) / mz
                jx, jz = rng.uniform(-0.02 * r, 0.02 * r, 2)
                t = 2 if frozen else 1
                rows.append(f"{tag} {t} {d} 2650.0 "
                            f"{x + jx:.8f} {y:.8f} {z + jz:.8f}")
                tag += 1
    with open(path, "w") as f:
        f.write("synthetic suspended-transport IC\n\n")
        f.write(f"{len(rows)} atoms\n2 atom types\n\n")
        f.write(f"{BOX[0]} {BOX[1]} xlo xhi\n")
        f.write(f"{BOX[2]} {BOX[3]} ylo yhi\n")
        f.write(f"{BOX[4]} {BOX[5]} zlo zhi\n\n")
        f.write("Atoms\n\n")
        f.write("\n".join(rows) + "\n")
    return len(rows)


def assemble(tmp, d, n_layers):
    case = os.path.join(tmp, "suspended")
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


def settling_velocity_fc(d, s=2.65, g=9.81, nu=1e-6):
    """Ferguson & Church (2004) natural-sand settling velocity."""
    import numpy as np
    C1, C2 = 18.0, 1.0
    return ((s - 1.0) * g * d ** 2
            / (C1 * nu + np.sqrt(0.75 * C2 * (s - 1.0) * g * d ** 3)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=1.5)
    ap.add_argument("--t-avg-start", type=float, default=0.75)
    ap.add_argument("--t-settle", type=float, default=0.2,
                    help="DEM settling phase with the channel forcing "
                    "off before the Ubar controller kicks in")
    ap.add_argument("--coarsen", type=int, default=2)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--quick", action="store_true",
                    help="4x-coarsened mesh, 0.05 s, smoke gates only")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.quick:
        args.t_end, args.coarsen, args.t_settle = 0.02, 4, 0.02

    import jax.numpy as jnp
    import numpy as np

    from sedifoam_tpu.config import ChannelForcing
    from sedifoam_tpu.fluid.state import init_fluid
    from sedifoam_tpu.grid import Grid
    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.runtime.runner import Simulation
    from sedifoam_tpu.solver import initialize
    from sedifoam_tpu.utils.postprocess import coarsen_faces

    d = 0.5e-3
    tmp = tempfile.mkdtemp(prefix="suspended_")
    case, n_part = assemble(tmp, d, args.layers)
    cfg, fluid, particles, controls = load_case(
        case, backend="binned", neighbor_k=8, dtype=jnp.float32,
        capacity=65536)
    # water + dense sand: the explicit drag reaction's coupling gain
    # dt*Omega/(rhob*beta) >> 2 here (tests/test_wachem_explicit.py) —
    # the Ubar kick through the bed diverges without the semi-implicit
    # branch
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
    mobile_mask = np.asarray(state.particles.active
                             & (state.particles.ptype == 1))

    if args.t_settle > 0:
        cfg_settle = dataclasses.replace(
            cfg, fluid=dataclasses.replace(
                cfg.fluid, forcing=ChannelForcing(mode="none")))
        sim0 = Simulation(cfg_settle, state, steps_per_host_visit=25)
        sim0.run(args.t_settle)
        state = sim0.state
        state = state._replace(fluid=state.fluid._replace(
            time=jnp.zeros_like(state.fluid.time)))

    frozen0 = np.asarray(state.particles.pos)[frozen_mask]
    y_com0 = float(np.asarray(state.particles.pos)[mobile_mask, 1].mean())

    rhoa, rhob, g = 2650.0, cfg.fluid.rhob, 9.81
    s = rhoa / rhob
    H = BOX[3] - BOX[2]
    Lx, Lz = BOX[1] - BOX[0], BOX[5] - BOX[4]
    cellV = np.asarray(cfg.grid.cell_volume)

    samples = {"t": [], "q": [], "gp": [], "Vb": [], "ycom": [],
               "frac_hi": []}

    def on_sample(sim):
        ps = sim.state.particles
        fsl = sim.state.fluid
        mob = np.asarray(ps.active) & (np.asarray(ps.ptype) == 1)
        pos = np.asarray(ps.pos)
        vp = (4.0 / 3.0) * np.pi * np.asarray(ps.radius) ** 3
        qx = float((np.asarray(ps.vel)[mob, 0] * vp[mob]).sum()) / (Lx * Lz)
        samples["t"].append(sim.t)
        samples["q"].append(qx)
        samples["gp"].append(float(fsl.grad_p_value))
        samples["Vb"].append(float(jnp.sum((1.0 - fsl.alpha) * cellV)))
        samples["ycom"].append(float(pos[mob, 1].mean()))
        samples["frac_hi"].append(float((pos[mob, 1] > 0.25 * H).mean()))

    sim = Simulation(cfg, state, steps_per_host_visit=25)
    sim.run(args.t_end, on_sample=on_sample)

    t = np.asarray(samples["t"])
    gp = np.asarray(samples["gp"])
    Vb = np.asarray(samples["Vb"])
    late = t >= (args.t_avg_start if not args.quick else 0.0)

    gp_mean = float(gp[late].mean())
    tau_b = rhob * gp_mean * float(Vb[late].mean()) / (Lx * Lz)
    u_star = float(np.sqrt(max(tau_b, 0.0) / rhob))
    w_s = float(settling_velocity_fc(d, s=s, g=g, nu=cfg.fluid.nub))
    rouse = w_s / (0.41 * u_star) if u_star > 0 else float("inf")
    q_mean = float(np.asarray(samples["q"])[late].mean())
    q_star = q_mean / np.sqrt((s - 1.0) * g * d ** 3)
    ycom_late = float(np.asarray(samples["ycom"])[late].mean())
    frac_hi = float(np.asarray(samples["frac_hi"])[late].mean())

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
        "u_star": round(u_star, 4),
        "w_s_ferguson_church": round(w_s, 4),
        "rouse_number": round(float(rouse), 3),
        "q_star": round(float(q_star), 4),
        "y_com_initial": round(y_com0, 5),
        "y_com_late": round(ycom_late, 5),
        "frac_above_quarter_depth": round(frac_hi, 3),
        "frozen_max_disp": float(np.abs(frozen1 - frozen0).max()),
        "finite": bool(np.isfinite(np.asarray(fs.p)).all()
                       and np.isfinite(np.asarray(ps.vel)).all()),
        "n_active": int(np.asarray(ps.active).sum()),
        "nbr_dropped": int(np.asarray(ps.nbr_dropped)),
        "timing_split_ms": {k: round(v * 1e3, 2)
                            for k, v in sim.timing_split().items()},
    }
    gates = {
        "finite": result["finite"],
        "frozen_immobile": result["frozen_max_disp"] == 0.0,
        "no_escapes": result["n_active"] == n_part,
        "k_audit": result["nbr_dropped"] == 0,
    }
    if not args.quick:
        gates["suspension_regime"] = rouse < 2.5
        gates["suspended_mass"] = (ycom_late > 2.0 * y_com0
                                   and frac_hi > 0.10)
        gates["transporting"] = q_star > 0.1
    result["gates"] = gates
    result["passed"] = all(gates.values())
    print(json.dumps(result))
    if args.out:
        np.savez(args.out, t=t, q=np.asarray(samples["q"]), gp=gp,
                 ycom=np.asarray(samples["ycom"]),
                 frac_hi=np.asarray(samples["frac_hi"]),
                 rouse=float(rouse), u_star=u_star, w_s=w_s)


if __name__ == "__main__":
    main()
