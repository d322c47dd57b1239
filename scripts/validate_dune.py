"""transport-vortex-dune example-case validation: dune-migration smoke.

Reference: cases/example-cases/transport-vortex-dune — the
current-induced dune case of Sun & Xiao (arXiv:1510.07201): a shallow
periodic channel 0.155885 x 0.0167 x 0.04 m (x/z cyclic), Ubar-feedback
forcing 0.34 m/s (transportProperties:43), SyamlalOBrien drag,
subCycles 5, hooke/history DEM (kn 200, xmu 0.4, in.lammps:15) with a
frozen type-2 base layer. The case ships no particle IC (in.lammps:9
reads an absent In_initial.in), so a synthetic DUNE is built: a frozen
base layer plus a mobile Gaussian hump of sand (d = 0.5 mm) centered in
the channel.

Physics gates (the full morphological evolution runs 50 s in the
reference controlDict — far beyond a validation budget; this is the
migration SMOKE the round-3 review asked for):
- the dune must migrate DOWNSTREAM: the mass-weighted streamwise
  center of the mobile hump moves in +x over the run (crest cells
  erode on the stoss side and deposit on the lee);
- streamwise transport is positive;
- the frozen base stays immobile, no particle escapes, all finite.

Run: python scripts/validate_dune.py [--t-end 2.0] [--quick]
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

REF = "/root/reference/cases/example-cases/transport-vortex-dune"
BOX = (0.0, 0.155885, 0.0, 0.0167, 0.0, 0.040001)


def synth_dune(path, d, crest_layers=6, sigma_frac=0.10, seed=13):
    """Frozen base layer over the whole channel + a mobile Gaussian
    dune centered at 0.4 Lx (asymmetric placement keeps the periodic
    image from interfering over a short run)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    r = 0.5 * d
    pitch = 2.05 * r
    Lx = BOX[1] - BOX[0]
    nx = int((Lx - d) / pitch)
    nz = int((BOX[5] - BOX[4] - d) / pitch)
    x0 = BOX[0] + 0.4 * Lx
    sigma = sigma_frac * Lx
    rows = []
    tag = 1
    for i in range(nx):
        x = BOX[0] + r + (i + 0.5) * (Lx - d) / nx
        n_here = 1 + int(round(crest_layers
                               * np.exp(-0.5 * ((x - x0) / sigma) ** 2)))
        for layer in range(n_here):
            y = BOX[2] + r + layer * pitch
            t = 2 if layer == 0 else 1
            for k in range(nz):
                z = BOX[4] + r + (k + 0.5) * (BOX[5] - BOX[4] - d) / nz
                jx, jz = rng.uniform(-0.02 * r, 0.02 * r, 2)
                rows.append(f"{tag} {t} {d} 2650.0 "
                            f"{x + jx:.8f} {y:.8f} {z + jz:.8f}")
                tag += 1
    with open(path, "w") as f:
        f.write("synthetic vortex-dune IC\n\n")
        f.write(f"{len(rows)} atoms\n2 atom types\n\n")
        f.write(f"{BOX[0]} {BOX[1]} xlo xhi\n")
        f.write(f"{BOX[2]} {BOX[3]} ylo yhi\n")
        f.write(f"{BOX[4]} {BOX[5]} zlo zhi\n\n")
        f.write("Atoms\n\n")
        f.write("\n".join(rows) + "\n")
    return len(rows), x0


def assemble(tmp, d, crest_layers):
    case = os.path.join(tmp, "dune")
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
    n, x0 = synth_dune(os.path.join(case, "In_initial.in"), d,
                       crest_layers)
    return case, n, x0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=1.5)
    ap.add_argument("--t-settle", type=float, default=0.2)
    ap.add_argument("--coarsen", type=int, default=2)
    ap.add_argument("--crest-layers", type=int, default=6)
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
    tmp = tempfile.mkdtemp(prefix="dune_")
    case, n_part, x_crest0 = assemble(tmp, d, args.crest_layers)
    cfg, fluid, particles, controls = load_case(
        case, backend="binned", neighbor_k=8, dtype=jnp.float32,
        capacity=65536)
    # same stiff water+sand coupling regime as bedload/Wachem
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
    Lx, Lz = BOX[1] - BOX[0], BOX[5] - BOX[4]

    def hump_center(ps):
        """Mass-weighted streamwise center of the MOBILE particles,
        computed relative to the initial crest via the periodic minimum
        image so a crest crossing the x boundary doesn't wrap the mean."""
        mob = np.asarray(ps.active) & (np.asarray(ps.ptype) == 1)
        x = np.asarray(ps.pos)[mob, 0]
        dx = x - x_crest0
        dx -= Lx * np.round(dx / Lx)
        return x_crest0 + float(dx.mean())

    x_com0 = hump_center(state.particles)

    samples = {"t": [], "q": [], "xcom": []}

    def on_sample(sim):
        ps = sim.state.particles
        mob = np.asarray(ps.active) & (np.asarray(ps.ptype) == 1)
        vp = (4.0 / 3.0) * np.pi * np.asarray(ps.radius) ** 3
        qx = float((np.asarray(ps.vel)[mob, 0] * vp[mob]).sum()) / (Lx * Lz)
        samples["t"].append(sim.t)
        samples["q"].append(qx)
        samples["xcom"].append(hump_center(ps))

    sim = Simulation(cfg, state, steps_per_host_visit=25)
    sim.run(args.t_end, on_sample=on_sample)

    t = np.asarray(samples["t"])
    q = np.asarray(samples["q"])
    xcom = np.asarray(samples["xcom"])
    late = t >= 0.5 * args.t_end

    q_mean = float(q[late].mean())
    q_star = q_mean / np.sqrt((s - 1.0) * g * d ** 3)
    migration = float(xcom[-1] - x_com0)

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
        "q_star": round(float(q_star), 4),
        "x_crest_initial": round(x_com0, 5),
        "dune_migration_m": round(migration, 6),
        "migration_celerity_mm_s": round(1e3 * migration / args.t_end, 4),
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
        gates["transporting"] = q_star > 0.01
        gates["migrates_downstream"] = migration > 0.0
    result["gates"] = gates
    result["passed"] = all(gates.values())
    print(json.dumps(result))
    if args.out:
        np.savez(args.out, t=t, q=q, xcom=xcom,
                 migration=migration, q_star=float(q_star))


if __name__ == "__main__":
    main()
