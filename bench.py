"""Headline benchmark: coupled CFD-DEM throughput on one TPU chip.

Runs a 3D fluidized-bed-style coupled case (dense-contact DEM + PISO
fluid + diffusion-smoothed coupling, bfloat-free f32 path) and reports
particle DEM substeps per second — the north-star throughput metric from
BASELINE.md.

vs_baseline: the reference publishes no in-repo throughput numbers and
cannot be built here (OpenFOAM + LAMMPS are external, no network), so
the denominator is MEASURED on this host: native/dem_baseline.cpp
reimplements the reference's DEM hot loop exactly (cell-list neighbors,
Verlet skin, hertzFix/history pair math, nve/sphere;
pair_gran_hertzFix_history.cpp:109-287) in -O3 C++ on the same
just-touching 131k-particle bed and measures 4.57e6
particle-substeps/s/core (Intel Xeon 2.1 GHz, one core — this VM has
one). vs_baseline is therefore a PER-CORE comparison of our full
COUPLED step against the reference's DEM-only inner loop; see
BASELINE.md for the node-level framing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Regression gate: BENCH_floor.json records the performance floor (0.85 x
best recorded). After printing the JSON line, a full-size TPU run that
lands under the floor exits nonzero with a loud report — the class of
silent 3x cliff that shipped in round 3 (c28bb68) can no longer pass a
bench run. Run `python bench.py` after any commit touching dem/ or
coupling/.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# measured: native/dem_baseline.cpp, 100 steps, this host (see BASELINE.md)
REFERENCE_MEASURED_PSTEPS_PER_CORE = 4.57e6


def build_case(n_particles=2048, nx=32, ny=64, nz=32, sub_steps=10,
               backend="dense", sort_on_rebuild=False):
    from sedifoam_tpu import bc
    from sedifoam_tpu.dem import lattice as _lat
    from sedifoam_tpu.config import (CloudConfig, DEMConfig, FluidConfig,
                                     PISOConfig, PairParams, WallSpec)
    from sedifoam_tpu.dem.state import make_particles
    from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
    from sedifoam_tpu.grid import Grid
    from sedifoam_tpu.solver import SimConfig, initialize

    dx = 2e-3
    grid = Grid(nx=nx, ny=ny, nz=nz, dx=dx, dy=dx, dz=dx)
    zg3 = bc.PatchBC(bc.ZERO_GRADIENT, (0.0, 0.0, 0.0))
    vin = 0.1
    bcs = FluidBCs(
        alpha=bc.make_field_bc({
            "ym": bc.PatchBC(bc.FIXED_VALUE, (0.0,)),
            "yp": bc.PatchBC(bc.INLET_OUTLET, (0.0,))}),
        p=bc.make_field_bc({"yp": bc.PatchBC(bc.FIXED_VALUE, (0.0,))}),
        Ub=bc.make_field_bc({
            "ym": bc.PatchBC(bc.FIXED_VALUE, (0.0, vin, 0.0)),
            "yp": bc.PatchBC(bc.INLET_OUTLET, (0.0, 0.0, 0.0))},
            default=bc.PatchBC(bc.FIXED_VALUE, (0.0, 0.0, 0.0))),
        Ua=bc.make_field_bc({}, default=zg3),
    )
    dt = 5e-5
    fluid_cfg = FluidConfig(
        dt=dt, rhob=1000.0, nub=1e-6, gravity=(0.0, -9.81, 0.0),
        piso=PISOConfig(n_correctors=2, p_tol=1e-6, p_max_iter=150),
    )
    cloud_cfg = CloudConfig(
        drag_model="ErgunWenYu", sub_cycles=1, sub_steps=sub_steps,
        diffusion_band_width=3 * dx, diffusion_steps=4,
        particle_buoyancy=True,
    )
    pair = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.3)
    L = (nx * dx, ny * dx, nz * dx)
    walls = (
        WallSpec(style="xplane", lo=0.0, hi=L[0], params=pair),
        WallSpec(style="yplane", lo=0.0, hi=L[1], params=pair),
        WallSpec(style="zplane", lo=0.0, hi=L[2], params=pair),
    )
    r = 5e-4
    # K sizing: correctness needs every partner within the Verlet ring
    # 2r + skin = 1.3 d in the table. The geometric worst case is ~12
    # (random close packing of the ring), but the MEASURED ring
    # occupancy of this bed is 6 (jittered simple-cubic at 2.02r: six
    # touching neighbors; the next shell sits at 1.43 d > 1.3 d). K=8
    # gives 33% headroom over that, and audit_ring arms the rebuild-time
    # truncation audit (state.nbr_dropped, LAMMPS dangerous-builds
    # analogue) — main() hard-fails if any rebuild ever dropped an
    # in-ring partner, so the density-sized K is verified, not assumed.
    # Each K is ~0.4 ms of partner row gather per substep at 131k.
    nbr_k = 8
    dem_cfg = DEMConfig(dt=dt / sub_steps, pair=pair, walls=walls,
                        gravity=(0.0, -9.81, 0.0),
                        backend=backend, nbr_k=nbr_k, max_per_bin=10,
                        cutoff=2 * r * 1.6, skin=0.6 * r,
                        audit_ring=2 * r + 0.6 * r,
                        domain_lo=(0.0, 0.0, 0.0), domain_hi=L,
                        # multi-chip callers (the production-scale dryrun)
                        # need bin-sorted slab alignment; single-chip bench
                        # keeps it off (costs ~11%, no locality reward)
                        sort_on_rebuild=sort_on_rebuild)
    lat_geom = _lat.make_geom(dem_cfg) if backend == "lattice" else None
    cfg = SimConfig(grid=grid, bcs=bcs, fluid=fluid_cfg, cloud=cloud_cfg,
                    dem=dem_cfg)

    # overlap-free jittered lattice in the lower part of the bed (random
    # placement would overlap and detonate the initial contact forces);
    # 2.02*r = just touching, so the kernel is measured at REAL contact
    # density (a loose 2.2*r bed has no contacts and flatters everyone)
    rng = np.random.RandomState(42)
    pitch = 2.02 * r
    nxp = int((L[0] - 2 * r) / pitch)
    nzp = int((L[2] - 2 * r) / pitch)
    nyp = int(np.ceil(n_particles / (nxp * nzp)))
    ii = np.arange(n_particles)
    ix, iz, iy = ii % nxp, (ii // nxp) % nzp, ii // (nxp * nzp)
    pos = np.stack([2 * r + ix * pitch, 2 * r + iy * pitch,
                    2 * r + iz * pitch], axis=1)
    pos += rng.uniform(-0.05 * r, 0.05 * r, pos.shape)
    particles = make_particles(pos=pos, radius=r, density=2500.0,
                               capacity=n_particles, n_walls=len(walls),
                               neighbor_k=(dem_cfg.nbr_k
                                           if backend == "binned" else None),
                               lattice_geom=lat_geom,
                               dtype=jnp.float32)
    fluid = init_fluid(grid, Ub=jnp.zeros((3,) + grid.shape, jnp.float32
                                          ).at[1].set(vin),
                       dtype=jnp.float32)
    state = initialize(fluid, particles, cfg)
    return cfg, state


def main():
    small = "--small" in sys.argv
    n_particles = 256 if small else 131072
    nx, ny, nz = (8, 16, 8) if small else (32, 64, 32)
    sub_steps = 10
    backend = "dense" if small else "binned"
    for a in sys.argv:
        if a.startswith("--backend="):
            backend = a.split("=", 1)[1]

    from sedifoam_tpu.solver import make_step_fn

    cfg, state = build_case(n_particles=n_particles, nx=nx, ny=ny, nz=nz,
                            sub_steps=sub_steps, backend=backend)
    step = make_step_fn(cfg)

    def sync(s):
        # force a real device->host fetch: block_until_ready can return
        # before execution completes on tunnelled backends
        return float(jnp.sum(s.particles.vel[:, 1]))

    # warmup / compile
    state = step(state)
    sync(state)

    n_timed = 3 if small else 10
    t0 = time.perf_counter()
    for _ in range(n_timed):
        state = step(state)
    sync(state)
    dt_wall = time.perf_counter() - t0

    dropped = int(state.particles.nbr_dropped)
    if dropped:
        raise SystemExit(
            f"NEIGHBOR AUDIT FAILED: {dropped} in-ring partners dropped "
            f"by the K={cfg.dem.nbr_k} table — benchmark result invalid")

    psteps = n_particles * sub_steps * n_timed / dt_wall
    print(json.dumps({
        "metric": "particle_dem_substeps_per_sec_coupled",
        "value": round(psteps, 1),
        "unit": "particle-substeps/s",
        "vs_baseline": round(
            psteps / REFERENCE_MEASURED_PSTEPS_PER_CORE, 4),
    }))

    # perf regression gate (full-size TPU runs only: the floor is a
    # real-chip number; CPU/small runs measure nothing comparable)
    floor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_floor.json")
    if (not small and backend == "binned"
            and jax.default_backend() != "cpu"
            and os.path.exists(floor_path)):
        with open(floor_path) as f:
            gate = json.load(f)
        if psteps < gate["floor"]:
            print(f"BENCH REGRESSION: {psteps / 1e6:.2f}M < floor "
                  f"{gate['floor'] / 1e6:.2f}M (= 0.85 x best recorded "
                  f"{gate['best'] / 1e6:.2f}M at {gate['best_commit']}). "
                  "A commit cost >15% of the headline benchmark — find "
                  "it before shipping.", file=sys.stderr)
            raise SystemExit(1)


if __name__ == "__main__":
    main()
