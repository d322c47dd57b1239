"""Unit tests for the FV operator layer (ops.py / linop.py / linsolve.py).

The reference has no unit tests (SURVEY.md §4); these are the per-kernel
tests the rebuild adds: exactness on linear/quadratic fields, operator
consistency between the explicit (fvc) and implicit (fvm) paths, and
manufactured-solution Poisson solves.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu import bc, linop, linsolve, ops
from sedifoam_tpu.grid import FaceField, Grid


@pytest.fixture
def grid():
    return Grid(nx=8, ny=6, nz=4, dx=0.1, dy=0.2, dz=0.25)


def linear_field(grid, a=1.0, b=2.0, c=3.0, d=0.5):
    X = grid.cell_centers()
    return a * X[0] + b * X[1] + c * X[2] + d


def test_grad_linear_exact(grid):
    f = linear_field(grid, 1.5, -2.0, 0.7)
    fbc = bc.uniform_bc(bc.ZERO_GRADIENT)
    g = ops.grad(f, grid, fbc)
    # interior cells exact; boundary cells polluted by zeroGradient
    interior = (slice(1, -1),) * 3
    np.testing.assert_allclose(g[0][interior], 1.5, rtol=1e-12)
    np.testing.assert_allclose(g[1][interior], -2.0, rtol=1e-12)
    np.testing.assert_allclose(g[2][interior], 0.7, rtol=1e-12)


def test_div_uniform_flux_zero(grid):
    area = grid.face_area
    phi = FaceField(
        jnp.full((grid.nx + 1, grid.ny, grid.nz), 2.0 * area[0]),
        jnp.full((grid.nx, grid.ny + 1, grid.nz), -1.0 * area[1]),
        jnp.full((grid.nx, grid.ny, grid.nz + 1), 0.5 * area[2]),
    )
    d = ops.div_flux(phi, grid)
    np.testing.assert_allclose(d, 0.0, atol=1e-12)


def test_laplacian_quadratic(grid):
    X = grid.cell_centers()
    f = X[0] ** 2 + 2.0 * X[1] ** 2  # laplacian = 2 + 4 = 6
    fbc = bc.uniform_bc(bc.ZERO_GRADIENT)
    lap = ops.laplacian(1.0, f, grid, fbc)
    interior = (slice(1, -1),) * 3
    np.testing.assert_allclose(lap[interior], 6.0, rtol=1e-10)


def test_curl_of_rigid_rotation(grid):
    X = grid.cell_centers()
    # U = omega x r with omega = (0,0,1): U = (-y, x, 0); curl = (0,0,2)
    U = jnp.stack([-X[1], X[0], jnp.zeros_like(X[0])])
    vbc = bc.uniform_bc(bc.ZERO_GRADIENT, (0.0, 0.0, 0.0))
    c = ops.curl(U, grid, vbc)
    interior = (slice(1, -1),) * 3
    np.testing.assert_allclose(c[0][interior], 0.0, atol=1e-12)
    np.testing.assert_allclose(c[1][interior], 0.0, atol=1e-12)
    np.testing.assert_allclose(c[2][interior], 2.0, rtol=1e-12)


def test_fixed_value_interp_and_sngrad(grid):
    f = jnp.full(grid.shape, 3.0)
    fbc = bc.make_field_bc({"xm": bc.PatchBC(bc.FIXED_VALUE, (5.0,))})
    fv = ops.face_interp(f, grid, fbc)
    np.testing.assert_allclose(fv.x[0], 5.0)
    np.testing.assert_allclose(fv.x[1:], 3.0)
    g = ops.sn_grad(f, grid, fbc)
    # at the xm face, d f/dx = (cell - value)/(dx/2) = (3-5)/0.05 = -40
    np.testing.assert_allclose(g.x[0], (3.0 - 5.0) / (grid.dx / 2))
    np.testing.assert_allclose(g.x[1:], 0.0, atol=1e-14)


def test_cyclic_wraps(grid):
    X = grid.cell_centers()
    f = jnp.sin(2 * jnp.pi * X[0] / grid.lengths[0])
    fbc = bc.make_field_bc({
        "xm": bc.PatchBC(bc.CYCLIC),
        "xp": bc.PatchBC(bc.CYCLIC),
    })
    fv = ops.face_interp(f, grid, fbc)
    np.testing.assert_allclose(fv.x[0], fv.x[-1], rtol=1e-12)
    g = ops.sn_grad(f, grid, fbc)
    np.testing.assert_allclose(g.x[0], g.x[-1], rtol=1e-12)


def test_limited_weights_uniform_is_central(grid):
    f = jnp.full(grid.shape, 2.0)
    fbc = bc.uniform_bc(bc.ZERO_GRADIENT)
    area = grid.face_area
    phi = FaceField(
        jnp.full((grid.nx + 1, grid.ny, grid.nz), area[0]),
        jnp.full((grid.nx, grid.ny + 1, grid.nz), area[1]),
        jnp.full((grid.nx, grid.ny, grid.nz + 1), area[2]),
    )
    w = ops.limited_weights(f, grid, fbc, phi)
    # uniform field -> the 1000x guard branch -> limiter=1 -> central
    np.testing.assert_allclose(w.x[1:-1], 0.5)


def test_limited_weights_step_is_upwind(grid):
    # sharp step: limiter should hit 0 (pure upwind) at the discontinuity
    f = jnp.zeros(grid.shape).at[: grid.nx // 2].set(1.0)
    fbc = bc.uniform_bc(bc.ZERO_GRADIENT)
    phi = FaceField(
        jnp.full((grid.nx + 1, grid.ny, grid.nz), 1.0),
        jnp.zeros((grid.nx, grid.ny + 1, grid.nz)),
        jnp.zeros((grid.nx, grid.ny, grid.nz + 1)),
    )
    w = ops.limited_weights(f, grid, fbc, phi)
    i = grid.nx // 2  # face at the step
    assert w.x[i, 0, 0] == pytest.approx(1.0)  # upwind (flux > 0 -> owner)


# ---------------------------------------------------------------------------
# implicit terms
# ---------------------------------------------------------------------------


def test_fvm_laplacian_matches_explicit(grid):
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(*grid.shape))
    fbc = bc.make_field_bc({
        "xm": bc.PatchBC(bc.FIXED_VALUE, (1.0,)),
        "yp": bc.PatchBC(bc.FIXED_VALUE, (-2.0,)),
    })
    term = linop.laplacian(0.7, grid, fbc)
    # full operator = apply(x) - rhs  must equal V * explicit laplacian
    lhs = term.apply(f) - term.rhs
    expl = ops.laplacian(0.7, f, grid, fbc) * grid.cell_volume
    np.testing.assert_allclose(lhs, expl, rtol=1e-10, atol=1e-12)


def test_fvm_div_matches_explicit(grid):
    rng = np.random.RandomState(1)
    f = jnp.asarray(rng.rand(*grid.shape))
    fbc = bc.make_field_bc({
        "xm": bc.PatchBC(bc.FIXED_VALUE, (0.3,)),
        "xp": bc.PatchBC(bc.INLET_OUTLET, (0.1,)),
    })
    phi = FaceField(
        jnp.asarray(rng.randn(grid.nx + 1, grid.ny, grid.nz)),
        jnp.asarray(rng.randn(grid.nx, grid.ny + 1, grid.nz)),
        jnp.asarray(rng.randn(grid.nx, grid.ny, grid.nz + 1)),
    )
    w = ops.limited_weights(f, grid, fbc, phi)
    term = linop.div(phi, f, grid, fbc, w)
    fv = ops.weighted_face_value(f, w, grid, fbc, phi)
    expl = ops.div_flux_field(phi, fv, grid) * grid.cell_volume
    np.testing.assert_allclose(term.apply(f) - term.rhs, expl,
                               rtol=1e-10, atol=1e-12)


def test_fvm_diag_is_true_diagonal(grid):
    """diag must equal the actual matrix diagonal of apply (probe basis)."""
    fbc = bc.make_field_bc({
        "xm": bc.PatchBC(bc.FIXED_VALUE, (1.0,)),
        "zm": bc.PatchBC(bc.CYCLIC),
        "zp": bc.PatchBC(bc.CYCLIC),
    })
    term = linop.laplacian(1.3, grid, fbc)
    e = jnp.zeros(grid.shape).at[2, 3, 1].set(1.0)
    assert term.apply(e)[2, 3, 1] == pytest.approx(float(term.diag[2, 3, 1]))
    # boundary cell
    e0 = jnp.zeros(grid.shape).at[0, 0, 0].set(1.0)
    assert term.apply(e0)[0, 0, 0] == pytest.approx(float(term.diag[0, 0, 0]))


def test_ddt_and_H(grid):
    f_old = jnp.full(grid.shape, 2.0)
    term = linop.ddt(f_old, dt=0.1, grid=grid)
    x = jnp.full(grid.shape, 3.0)
    # pure diagonal: H == rhs/V, A == 1/dt
    np.testing.assert_allclose(term.A(grid), 1.0 / 0.1)
    np.testing.assert_allclose(term.H(x, grid), 2.0 / 0.1)


def test_pcg_poisson_manufactured(grid):
    """Solve laplacian(p) = f with Dirichlet BCs; compare to dense solve."""
    fbc = bc.make_field_bc({
        "xm": bc.PatchBC(bc.FIXED_VALUE, (0.0,)),
        "xp": bc.PatchBC(bc.FIXED_VALUE, (1.0,)),
    })
    term = linop.laplacian(1.0, grid, fbc)
    rng = np.random.RandomState(2)
    b = term.rhs + jnp.asarray(rng.randn(*grid.shape)) * grid.cell_volume

    res = linsolve.pcg(term.apply, b, jnp.zeros(grid.shape), term.diag,
                       tol=1e-12, max_iter=2000)
    assert float(res.final_residual) < 1e-12
    # verify against a dense numpy solve
    n = grid.n_cells
    A = np.zeros((n, n))
    for k in range(n):
        e = np.zeros(n)
        e[k] = 1.0
        A[:, k] = np.asarray(term.apply(jnp.asarray(e.reshape(grid.shape)))
                             ).ravel()
    x_dense = np.linalg.solve(A, np.asarray(b).ravel())
    np.testing.assert_allclose(np.asarray(res.x).ravel(), x_dense,
                               rtol=1e-8, atol=1e-10)


def test_bicgstab_convection_diffusion(grid):
    fbc = bc.make_field_bc({
        "xm": bc.PatchBC(bc.FIXED_VALUE, (1.0,)),
        "xp": bc.PatchBC(bc.ZERO_GRADIENT),
    })
    area = grid.face_area
    phi = FaceField(
        jnp.full((grid.nx + 1, grid.ny, grid.nz), 0.3 * area[0]),
        jnp.zeros((grid.nx, grid.ny + 1, grid.nz)),
        jnp.zeros((grid.nx, grid.ny, grid.nz + 1)),
    )
    f0 = jnp.zeros(grid.shape)
    w = FaceField(*(jnp.where(p >= 0, 1.0, 0.0) for p in phi))  # upwind
    term = linop.div(phi, f0, grid, fbc, w) - linop.laplacian(0.05, grid, fbc)
    res = linsolve.bicgstab(term.apply, term.rhs, f0, term.diag, tol=1e-12,
                            max_iter=2000)
    assert float(res.final_residual) < 1e-12
    r = term.rhs - term.apply(res.x)
    assert float(jnp.max(jnp.abs(r))) < 1e-9
