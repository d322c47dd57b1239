"""Sub-phase profile of the coupling source + fluid step on the chip.

Breaks lift_drag_coeffs (7.3 ms standalone at the bench config) and the
PISO into their constituent device programs, each timed with real syncs
and threaded inputs (tunnel dedupe — see STATUS.md platform quirks).

Run: python scripts/profile_source.py [--n 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_case
    from sedifoam_tpu import bc as _bc
    from sedifoam_tpu import ops
    from sedifoam_tpu.coupling import cloud as _cloud
    from sedifoam_tpu.coupling import drag as _drag
    from sedifoam_tpu.coupling import transfer as _transfer

    cfg, state = build_case(n_particles=131072, nx=32, ny=64, nz=32,
                            sub_steps=10, backend="binned")
    grid, bcs, ccfg, fcfg = cfg.grid, cfg.bcs, cfg.cloud, cfg.fluid
    smooth = _cloud._smooth_fn(grid, ccfg)

    def sync(x):
        return float(jax.tree.leaves(x)[0].ravel()[0])

    out = {}

    def timed(name, fn, x0, thread=None):
        fn = jax.jit(fn)
        y = fn(x0)
        sync(y)
        x = thread(x0, y) if thread else x0
        t0 = time.perf_counter()
        for i in range(args.n):
            y = fn(x)
            x = thread(x, y) if thread else x0
        sync(y)
        out[name] = round((time.perf_counter() - t0) / args.n * 1e3, 3)
        print(f"{name:22s} {out[name]:9.3f} ms", flush=True)
        return y

    p = state.particles
    fl = state.fluid
    ufs = state.uf_smoothed

    # --- source sub-phases ---------------------------------------------
    alpha_c = jnp.minimum(fl.alpha, fcfg.max_possible_alpha)

    def f_cells(pos):
        st = p._replace(pos=pos)
        return _transfer.particle_cells(st, grid)

    cells = timed("cells(locate)", f_cells, p.pos,
                  lambda x, y: x * (1.0 + 1e-7))
    cells = jax.jit(f_cells)(p.pos)

    def f_gather(c):
        pa, ufp = _transfer.gather_fields(c, alpha_c, ufs)
        return pa, ufp

    timed("gather(alpha,uf)", f_gather, cells,
          lambda x, y: (x + 1) % grid.n_cells)

    p_alpha, uf_at_p = jax.jit(f_gather)(cells)
    uri = uf_at_p - p.vel
    mag_uri = jnp.sqrt(jnp.sum(uri * uri, axis=-1))
    d = jnp.maximum(2.0 * p.radius, 1e-300)
    jd_vals = _drag.jd(ccfg.drag_model, mag_uri, p_alpha, d,
                       fcfg.nub, fcfg.rhob)
    jd_vals = jax.block_until_ready(jd_vals)

    omg = p.volume * jd_vals / grid.cell_volume
    contrib = omg[:, None] * (p.vel - uf_at_p)

    def f_scatter(c):
        return _transfer.scatter_to_grid(contrib, c, p.active, grid)

    timed("scatter(asrc)", f_scatter, cells,
          lambda x, y: (x + 1) % grid.n_cells)

    asrc0 = jax.jit(f_scatter)(cells)

    def f_smooth(a):
        return smooth(a)

    timed("smooth(asrc 3comp)", f_smooth, asrc0,
          lambda x, y: y)

    def f_curl(fluid_Ua):
        beta = 1.0 - alpha_c
        U_mix = alpha_c[None] * fluid_Ua + beta[None] * fl.Ub
        return ops.curl(U_mix, grid, _bc.uniform_bc(_bc.ZERO_GRADIENT,
                                                    (0.0, 0.0, 0.0)))

    timed("curl(Umix)+lift", f_curl, fl.Ua, lambda x, y: x + y * 1e-9)

    def f_source(s):
        return _cloud.lift_drag_coeffs(s.fluid, s.particles, s.uf_smoothed,
                                       grid, bcs, ccfg, fcfg)

    timed("source(full)", f_source, state,
          lambda x, y: x._replace(fluid=y))

    # --- fluid sub-phases ----------------------------------------------
    from sedifoam_tpu.fluid import piso as _piso
    from sedifoam_tpu.fluid import turbulence as _turb
    from sedifoam_tpu.fluid.step import advance_time

    def f_assemble(s):
        fs = advance_time(s.fluid, fcfg)
        fs = fs._replace(beta=1.0 - fs.alpha)
        nu_eff = jnp.full(grid.shape, fcfg.nub, fs.p.dtype)
        eqn = _piso.assemble_ub_eqn(fs, grid, bcs, fcfg, nu_eff)
        return eqn.terms[0].diag + eqn.terms[1].rhs

    timed("assemble(UbEqn)", f_assemble, state,
          lambda x, y: x)

    def f_piso_iters(s):
        fs = advance_time(s.fluid, fcfg)
        fs = fs._replace(beta=1.0 - fs.alpha)
        nu_eff = jnp.full(grid.shape, fcfg.nub, fs.p.dtype)
        eqn = _piso.assemble_ub_eqn(fs, grid, bcs, fcfg, nu_eff)
        fs2 = _piso.piso(fs, eqn, grid, bcs, fcfg)
        return fs2

    timed("assemble+piso", f_piso_iters, state,
          lambda x, y: x._replace(fluid=y))

    # PCG iteration counts for the pressure solves
    from sedifoam_tpu import linsolve

    orig_pcg = linsolve.pcg
    iters = []

    def spy_pcg(*a, **k):
        sol = orig_pcg(*a, **k)
        iters.append(sol.n_iterations)
        return sol

    _piso.linsolve.pcg = spy_pcg
    fs = advance_time(fl, fcfg)
    fs = fs._replace(beta=1.0 - fs.alpha)
    nu_eff = jnp.full(grid.shape, fcfg.nub, fs.p.dtype)
    eqn = _piso.assemble_ub_eqn(fs, grid, bcs, fcfg, nu_eff)
    _ = _piso.piso(fs, eqn, grid, bcs, fcfg)
    _piso.linsolve.pcg = orig_pcg
    out["pcg_iters"] = [int(i) for i in iters]
    print("pcg iters per solve:", out["pcg_iters"], flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
