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
                  - linop.source(G, grid))
        sol = linsolve.bicgstab(term_k.apply, term_k.rhs, k, term_k.diag,
                                tol=1e-8, max_iter=500)
        k_new = jnp.maximum(sol.x, 1e-12)
        return fs._replace(k=k_new, nut=t.Ck * jnp.sqrt(k_new) * delta)

    if t.model == "kEpsilon":
        return _k_epsilon(fs, grid, bcs, cfg)

    raise ValueError(f"unknown turbulence model {t.model}")


def _k_epsilon(fs: FluidState, grid: Grid, bcs: FluidBCs, cfg: FluidConfig
               ) -> FluidState:
    """Standard incompressible kEpsilon with upwind convection."""
    t = cfg.turbulence
    dt = cfg.dt
    kbc = _bc.zero_gradient()
    ebc = _bc.zero_gradient()

    k = jnp.maximum(fs.k, 1e-12)
    eps = jnp.maximum(fs.epsilon, 1e-12)
    nut = jnp.maximum(fs.nut, 0.0)

    S2 = _strain_rate_sq(fs.Ub, grid, bcs.Ub)
    G = nut * S2

    phi = fs.phib
    w_up = FaceField(*(jnp.where(p >= 0, 1.0, 0.0) for p in phi))

    # epsilon equation
    nu_eps_f = ops.face_interp(cfg.nub + nut / t.sigma_eps, grid, kbc)
    term_e = (linop.ddt(eps, dt, grid)
              + linop.div(phi, eps, grid, ebc, w_up)
              - linop.laplacian(nu_eps_f, grid, ebc)
              + linop.Sp(t.C2 * eps / k, grid)
              - linop.source(t.C1 * G * eps / k, grid))
    sol_e = linsolve.bicgstab(term_e.apply, term_e.rhs, eps, term_e.diag,
                              tol=1e-8, max_iter=500)
    eps_new = jnp.maximum(sol_e.x, 1e-12)

    # k equation
    nu_k_f = ops.face_interp(cfg.nub + nut / t.sigma_k, grid, kbc)
    term_k = (linop.ddt(k, dt, grid)
              + linop.div(phi, k, grid, kbc, w_up)
              - linop.laplacian(nu_k_f, grid, kbc)
              + linop.Sp(eps_new / k, grid)
              - linop.source(G, grid))
    sol_k = linsolve.bicgstab(term_k.apply, term_k.rhs, k, term_k.diag,
                              tol=1e-8, max_iter=500)
    k_new = jnp.maximum(sol_k.x, 1e-12)

    nut_new = t.Cmu * k_new ** 2 / eps_new
    return fs._replace(k=k_new, epsilon=eps_new, nut=nut_new)
