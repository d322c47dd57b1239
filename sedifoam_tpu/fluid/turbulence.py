"""Turbulence models for the continuous phase.

Reference: lammpsFoamTurbulenceModels/ — RAS kEpsilon, LES Smagorinsky /
kEqn, and the custom beta-weighted mySmagorinsky. The momentum coupling is
entirely through nuEff (divDevReff is assembled in piso.py with whatever
nuEff the model returns) plus the transported k/epsilon fields.

Laminar + Smagorinsky + mySmagorinsky are implemented; the RAS kEpsilon
transport solve follows the standard incompressible model with upwind
convection and BiCGStab solves.
"""

from __future__ import annotations

import jax.numpy as jnp

from sedifoam_tpu import bc as _bc
from sedifoam_tpu import linop, linsolve, ops
from sedifoam_tpu.config import FluidConfig, TurbulenceConfig
from sedifoam_tpu.fluid.state import FluidBCs, FluidState
from sedifoam_tpu.grid import FaceField, Grid


def reynolds_stress(fs: FluidState, grid: Grid, bcs: FluidBCs,
                    cfg: FluidConfig):
    """B = (2/3) k I - nuEff * twoSymm(grad(Ub)) — exactly the
    Reynolds-stress export of the reference (pEqn.H:100).

    Returns (6, nx, ny, nz): xx, xy, xz, yy, yz, zz.
    """
    g = ops.grad_vec(fs.Ub, grid, bcs.Ub)   # g[j, i] = dU_j/dx_i
    nueff = cfg.nub + fs.nut
    k = fs.k

    def comp(i, j):
        s = nueff * (g[i, j] + g[j, i])
        return ((2.0 / 3.0) * k - s) if i == j else -s

    return jnp.stack([comp(0, 0), comp(0, 1), comp(0, 2),
                      comp(1, 1), comp(1, 2), comp(2, 2)])


def nu_eff(fs: FluidState, grid: Grid, cfg: FluidConfig):
    """Effective viscosity field for the momentum equation."""
    t = cfg.turbulence
    base = jnp.full(grid.shape, cfg.nub, fs.p.dtype)
    if t.model == "laminar":
        return base
    return base + fs.nut


def _strain_rate_sq(U, grid: Grid, vbc):
    """2*magSqr(symm(grad(U))) — used by Smagorinsky and kEpsilon G."""
    g = ops.grad_vec(U, grid, vbc)  # g[j, i] = dU_j/dx_i
    S2 = jnp.zeros(grid.shape, U.dtype)
    for i in range(3):
        for j in range(3):
            sij = 0.5 * (g[i, j] + g[j, i])
            S2 = S2 + 2.0 * sij * sij
    return S2


def correct(fs: FluidState, grid: Grid, bcs: FluidBCs, cfg: FluidConfig
            ) -> FluidState:
    """turbulence->correct(): update nut (and k/epsilon for RAS)."""
    t = cfg.turbulence
    if t.model == "laminar":
        return fs

    # cubeRootVol LES delta: cellwise on graded grids
    delta = grid.cell_volume ** (1.0 / 3.0)
    if not grid.uniform:
        delta = jnp.asarray(delta, fs.p.dtype)

    if t.model in ("Smagorinsky", "mySmagorinsky"):
        # local-equilibrium Smagorinsky: k_sgs = (2 Ck/Ce) delta^2 |symm(grad U)|^2,
        # nut = Ck sqrt(k) delta  (OpenFOAM Smagorinsky.C closed form for
        # incompressible flow, trace term dropped)
        S2 = _strain_rate_sq(fs.Ub, grid, bcs.Ub)   # = 2|symm(grad U)|^2
        k = (2.0 * t.Ck / t.Ce) * delta ** 2 * (S2 / 2.0)
        nut = t.Ck * jnp.sqrt(k) * delta
        if t.model == "mySmagorinsky":
            # beta-weighted variant (LES/mySmagorinsky/mySmagorinsky.C)
            nut = fs.beta * nut
        return fs._replace(nut=nut, k=k)

    if t.model == "kEqn":
        # one-equation eddy-viscosity LES: transport k_sgs with
        # production nut*|S|^2, dissipation Ce k^1.5/delta; nut=Ck sqrt(k) delta
        dt = cfg.dt
        kbc = _bc.zero_gradient()
        k = jnp.maximum(fs.k, 1e-12)
        nut = jnp.maximum(fs.nut, 0.0)
        S2 = _strain_rate_sq(fs.Ub, grid, bcs.Ub)
        G = nut * S2
        w_up = FaceField(*(jnp.where(p >= 0, 1.0, 0.0) for p in fs.phib))
        nu_k_f = ops.face_interp(cfg.nub + nut, grid, kbc)
        term_k = (linop.ddt(k, dt, grid)
                  + linop.div(fs.phib, k, grid, kbc, w_up)
                  - linop.laplacian(nu_k_f, grid, kbc)
                  + linop.Sp(t.Ce * jnp.sqrt(k) / delta, grid)
                  + linop.source(G, grid))  # production on the RHS
        sol = linsolve.bicgstab(term_k.apply, term_k.rhs, k, term_k.diag,
                                tol=1e-8, max_iter=500)
        k_new = jnp.maximum(sol.x, 1e-12)
        return fs._replace(k=k_new, nut=t.Ck * jnp.sqrt(k_new) * delta)

    if t.model == "kEpsilon":
        return _k_epsilon(fs, grid, bcs, cfg)

    raise ValueError(f"unknown turbulence model {t.model}")


def _is_noslip(patch) -> bool:
    """True only for fixedValue (0,0,0): velocity INLETS are fixedValue
    too and must not get wall functions."""
    if patch.kind != _bc.FIXED_VALUE:
        return False
    v = patch.value
    if isinstance(v, _bc.TimeTable):
        return all(all(x == 0.0 for x in knot) for knot in v.values)
    return all(x == 0.0 for x in v)


def _wall_layers(grid: Grid, bcs: FluidBCs):
    """(mask (nx,ny,nz), y_half (nx,ny,nz)) of cells adjacent to no-slip
    walls, with their wall distance (half cell width)."""
    import numpy as np
    mask = np.zeros(grid.shape, bool)
    yh = np.ones(grid.shape)
    for a in range(3):
        lo_p, hi_p = bcs.Ub.axis(a)
        w = grid.axis_widths(a)
        for is_lo, patch in ((True, lo_p), (False, hi_p)):
            if not _is_noslip(patch):
                continue
            sl = [slice(None)] * 3
            sl[a] = slice(0, 1) if is_lo else slice(-1, None)
            mask[tuple(sl)] = True
            yh[tuple(sl)] = 0.5 * (w[0] if is_lo else w[-1])
    return mask, yh


def _k_epsilon(fs: FluidState, grid: Grid, bcs: FluidBCs, cfg: FluidConfig
               ) -> FluidState:
    """Standard incompressible kEpsilon with upwind convection and
    (optionally) high-Re wall functions on no-slip patches:
    nutkWallFunction nut_w = nu*(y+ kappa/ln(E y+) - 1),
    epsilonWallFunction eps_w = Cmu^3/4 k^3/2/(kappa y),
    wall-cell production G_w = (nut_w+nu)*|Up|/y * Cmu^1/4 sqrt(k)/(kappa y).
    """
    t = cfg.turbulence
    dt = cfg.dt
    kbc = _bc.zero_gradient()
    ebc = _bc.zero_gradient()

    k = jnp.maximum(fs.k, 1e-12)
    eps = jnp.maximum(fs.epsilon, 1e-12)
    nut = jnp.maximum(fs.nut, 0.0)

    S2 = _strain_rate_sq(fs.Ub, grid, bcs.Ub)
    G = nut * S2

    wall = None
    if t.wall_functions:
        import numpy as np
        wall_np, yh_np = _wall_layers(grid, bcs)
        if wall_np.any():
            wall = jnp.asarray(wall_np)
            y = jnp.asarray(yh_np, k.dtype)
            cmu14 = t.Cmu ** 0.25
            u_tau_k = cmu14 * jnp.sqrt(k)
            yplus = u_tau_k * y / cfg.nub
            yplus_lam = 11.53
            nut_w = cfg.nub * jnp.maximum(
                yplus * t.kappa / jnp.log(jnp.maximum(t.E_wall * yplus,
                                                      1.001)) - 1.0, 0.0)
            nut_w = jnp.where(yplus > yplus_lam, nut_w, 0.0)
            mag_up = jnp.sqrt(sum(fs.Ub[c] ** 2 for c in range(3)))
            G_w = (nut_w + cfg.nub) * mag_up / y * u_tau_k / (t.kappa * y)
            eps_w = t.Cmu ** 0.75 * k ** 1.5 / (t.kappa * y)
            G = jnp.where(wall, G_w, G)
            eps = jnp.where(wall, eps_w, eps)

    phi = fs.phib
    w_up = FaceField(*(jnp.where(p >= 0, 1.0, 0.0) for p in phi))

    # epsilon equation
    nu_eps_f = ops.face_interp(cfg.nub + nut / t.sigma_eps, grid, kbc)
    term_e = (linop.ddt(eps, dt, grid)
              + linop.div(phi, eps, grid, ebc, w_up)
              - linop.laplacian(nu_eps_f, grid, ebc)
              + linop.Sp(t.C2 * eps / k, grid)
              + linop.source(t.C1 * G * eps / k, grid))  # production RHS
    sol_e = linsolve.bicgstab(term_e.apply, term_e.rhs, eps, term_e.diag,
                              tol=1e-8, max_iter=500)
    eps_new = jnp.maximum(sol_e.x, 1e-12)
    if wall is not None:
        # epsilonWallFunction pins the wall-cell value
        eps_new = jnp.where(wall, eps, eps_new)

    # k equation
    nu_k_f = ops.face_interp(cfg.nub + nut / t.sigma_k, grid, kbc)
    term_k = (linop.ddt(k, dt, grid)
              + linop.div(phi, k, grid, kbc, w_up)
              - linop.laplacian(nu_k_f, grid, kbc)
              + linop.Sp(eps_new / k, grid)
              + linop.source(G, grid))  # production on the RHS
    sol_k = linsolve.bicgstab(term_k.apply, term_k.rhs, k, term_k.diag,
                              tol=1e-8, max_iter=500)
    k_new = jnp.maximum(sol_k.x, 1e-12)

    nut_new = t.Cmu * k_new ** 2 / eps_new
    if wall is not None:
        # nutkWallFunction overrides the wall-cell eddy viscosity
        cmu14 = t.Cmu ** 0.25
        yplus = cmu14 * jnp.sqrt(k_new) * y / cfg.nub
        nut_w = cfg.nub * jnp.maximum(
            yplus * t.kappa / jnp.log(jnp.maximum(t.E_wall * yplus,
                                                  1.001)) - 1.0, 0.0)
        nut_w = jnp.where(yplus > 11.53, nut_w, 0.0)
        nut_new = jnp.where(wall, nut_w, nut_new)
    return fs._replace(k=k_new, epsilon=eps_new, nut=nut_new)
