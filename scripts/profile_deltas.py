"""In-context MARGINAL cost of the non-DEM pieces of the coupled step.

Two failure modes make naive sub-phase timing lie here:
  - standalone sub-ops are dispatch-floor-bound through the tunnel
    (~3.5-4 ms/program — STATUS.md platform quirks);
  - TOGGLING a piece off changes the trajectory, hence the neighbor
    rebuild cadence, hence the DEM cost (measured: a no-P2G variant ran
    +25 ms/step from rebuild churn alone).

So each piece is costed by ADDITION, not removal: the full step runs
unchanged, plus ONE perturbed duplicate of the piece whose output feeds
a dead-weight accumulator (the 1e-30-scaled perturbation defeats CSE,
the accumulator defeats DCE, and the trajectory stays bit-identical
across variants). delta(variant - full) = the piece's marginal cost in
context.

Run: python scripts/profile_deltas.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_case
    from sedifoam_tpu import bc as _bc
    from sedifoam_tpu import ops
    from sedifoam_tpu.coupling import cloud as _cloud
    from sedifoam_tpu.coupling import transfer as _transfer
    from sedifoam_tpu.fluid.step import advance_time, fluid_step
    from sedifoam_tpu.solver import coupled_step

    cfg, state0 = build_case(n_particles=131072, nx=32, ny=64, nz=32,
                             sub_steps=10, backend="binned")
    grid, bcs, ccfg, fcfg = cfg.grid, cfg.bcs, cfg.cloud, cfg.fluid
    smooth = _cloud._smooth_fn(grid, ccfg)

    def sync(x):
        return float(jax.tree.leaves(x)[0].ravel()[0])

    def make(extra=None):
        @jax.jit
        def run10(st, acc):
            def body(carry, _):
                s, a = carry
                s2 = coupled_step(s, cfg)
                if extra is not None:
                    a = a + extra(s2, a) * 1e-30
                return (s2, a), None
            (st, acc), _ = jax.lax.scan(body, (st, acc), None, length=10)
            return st, acc
        return run10

    p0 = state0.particles

    def eps(a):
        return 1.0 + a * 1e-30

    def x_scatter4(s, a):
        # particle_to_eulerian-shaped: one (N,4) segment_sum
        p = s.particles
        cells = _transfer.particle_cells(p, grid)
        g, ue = _transfer.scatter_fields(
            cells, p.active, grid, p.volume * eps(a),
            p.volume[:, None] * p.vel)
        return jnp.sum(g) + jnp.sum(ue)

    def x_scatter3(s, a):
        p = s.particles
        cells = _transfer.particle_cells(p, grid)
        out = _transfer.scatter_to_grid(p.vel * eps(a), cells, p.active,
                                        grid)
        return jnp.sum(out)

    def x_gather(s, a):
        # forces-shaped packed gather: alpha + 3 vector fields = 10 cols
        p = s.particles
        cells = _transfer.particle_cells(p, grid)
        g = _transfer.gather_fields(cells, s.fluid.alpha * eps(a),
                                    s.fluid.Ub, s.fluid.Ua, s.fluid.DDtUb)
        return sum(jnp.sum(x) for x in g)

    def x_smooth3(s, a):
        return jnp.sum(smooth(s.fluid.Asrc * eps(a)))

    def x_smooth4(s, a):
        packed = jnp.concatenate([s.fluid.alpha[None] * eps(a),
                                  s.fluid.Ua], axis=0)
        return jnp.sum(smooth(packed))

    def x_curl(s, a):
        U_mix = s.fluid.alpha[None] * s.fluid.Ua * eps(a) \
            + (1.0 - s.fluid.alpha)[None] * s.fluid.Ub
        c = ops.curl(U_mix, grid, _bc.uniform_bc(_bc.ZERO_GRADIENT,
                                                 (0.0, 0.0, 0.0)))
        return jnp.sum(c)

    def x_fluid(s, a):
        fs = advance_time(s.fluid, fcfg)
        fs = fs._replace(Ub=fs.Ub * eps(a))
        fs = fluid_step(fs, grid, bcs, fcfg, advance=False)
        return jnp.sum(fs.p) + jnp.sum(fs.Ub)

    def x_locate(s, a):
        p = s.particles
        cells = _transfer.particle_cells(
            p._replace(pos=p.pos * eps(a)), grid)
        return jnp.sum(cells.astype(jnp.float32))

    variants = {
        "full": None,
        "x_scatter4_p2g": x_scatter4,
        "x_scatter3_asrc": x_scatter3,
        "x_gather10col": x_gather,
        "x_smooth3": x_smooth3,
        "x_smooth4": x_smooth4,
        "x_curl": x_curl,
        "x_fluid_step": x_fluid,
        "x_locate": x_locate,
    }

    out = {}
    base = None
    for name, extra in variants.items():
        fn = make(extra)
        acc = jnp.zeros((), jnp.float32)
        st, acc = fn(state0, acc)      # warm from the SAME state0
        sync(st)
        t0 = time.perf_counter()
        n = 4
        for _ in range(n):
            st, acc = fn(st, acc)
        sync(st)
        ms = (time.perf_counter() - t0) / (10 * n) * 1e3
        out[name] = round(ms, 3)
        if base is None:
            base = ms
            print(f"{name:18s} {ms:8.3f} ms/step", flush=True)
        else:
            print(f"{name:18s} {ms:8.3f} ms/step   marginal "
                  f"{ms - base:+7.3f}", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
