"""Analytic LES validations (Smagorinsky closed form, kEqn decay law).

- Smagorinsky: for uniform shear dU/dy = S, nut = Ck*sqrt(k)*delta with
  k = (2Ck/Ce)*delta^2*|symm|^2 exactly (OpenFOAM Smagorinsky.C closed
  form) -> hand-computable.
- kEqn: with no shear, dk/dt = -Ce*k^1.5/delta (production = diffusion
  = convection = 0) -> k(t) = k0 / (1 + Ce*sqrt(k0)*t/(2*delta))^2.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.config import FluidConfig, PISOConfig, TurbulenceConfig
from sedifoam_tpu.fluid import turbulence as _turb
from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
from sedifoam_tpu.grid import Grid


def _cyc_box(n=8, L=1.0):
    grid = Grid(nx=n, ny=n, nz=n, dx=L / n, dy=L / n, dz=L / n)
    cyc = _bc.PatchBC(_bc.CYCLIC)
    cyc3 = _bc.PatchBC(_bc.CYCLIC, (0.0, 0.0, 0.0))
    bcs = FluidBCs(alpha=_bc.FieldBC(*(cyc,) * 6),
                   p=_bc.FieldBC(*(cyc,) * 6),
                   Ub=_bc.FieldBC(*(cyc3,) * 6),
                   Ua=_bc.FieldBC(*(cyc3,) * 6))
    return grid, bcs


def test_smagorinsky_closed_form():
    grid, bcs = _cyc_box()
    t = TurbulenceConfig(model="Smagorinsky")
    cfg = FluidConfig(dt=1e-3, nub=1e-6, turbulence=t)
    S = 7.5  # uniform shear rate
    y = grid.cell_centers(jnp.float64)[1]
    fs = init_fluid(grid)
    fs = fs._replace(Ub=jnp.stack([S * y, 0 * y, 0 * y]))

    out = _turb.correct(fs, grid, bcs, cfg)
    delta = grid.cell_volume ** (1.0 / 3.0)
    # |symm(grad U)|^2 = S^2/2 for pure shear; S2 = 2|symm|^2 = S^2
    k_exact = (2.0 * t.Ck / t.Ce) * delta ** 2 * (S ** 2 / 2.0)
    nut_exact = t.Ck * np.sqrt(k_exact) * delta
    # interior cells see the exact uniform gradient (cyclic wrap of a
    # linear profile breaks at the seam slab; exclude it)
    nut = np.asarray(out.nut)[:, 2:-2, :]
    k = np.asarray(out.k)[:, 2:-2, :]
    np.testing.assert_allclose(k, k_exact, rtol=1e-9)
    np.testing.assert_allclose(nut, nut_exact, rtol=1e-9)


def test_keqn_decay_law():
    grid, bcs = _cyc_box()
    t = TurbulenceConfig(model="kEqn")
    dt = 2e-3
    cfg = FluidConfig(dt=dt, nub=1e-6,
                      piso=PISOConfig(n_correctors=1), turbulence=t)
    k0 = 2.0
    fs = init_fluid(grid)
    fs = fs._replace(k=jnp.full(grid.shape, k0, jnp.float64))

    correct = jax.jit(lambda f: _turb.correct(f, grid, bcs, cfg))
    n_steps = 200
    for _ in range(n_steps):
        fs = correct(fs)

    delta = grid.cell_volume ** (1.0 / 3.0)
    t_end = n_steps * dt
    k_exact = k0 / (1.0 + t.Ce * np.sqrt(k0) * t_end / (2.0 * delta)) ** 2
    k = float(fs.k.mean())
    # implicit Euler at finite dt: a few % discretization error
    assert abs(k / k_exact - 1.0) < 0.05, (k, k_exact)
    # spatially uniform (no spurious gradients)
    assert float(fs.k.std() / fs.k.mean()) < 1e-8
