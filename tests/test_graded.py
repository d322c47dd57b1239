"""Graded / multi-block tensor-product meshes.

Covers: blockMesh simpleGrading + stacked-hex parsing (transport-bedload,
transport-vortex-dune geometries), the generalized fast-diagonalization
solver on graded axes, FV operator consistency, and a graded-mesh
Poiseuille channel against the analytic profile.
"""

import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu import bc as _bc
from sedifoam_tpu import linop, ops
from sedifoam_tpu.grid import Grid

BMD_HEADER = textwrap.dedent("""
    FoamFile { version 2.0; format ascii; class dictionary;
               object blockMeshDict; }
    convertToMeters 1;
""")


def _write(tmp_path, body):
    p = tmp_path / "blockMeshDict"
    p.write_text(BMD_HEADER + body)
    return str(p)


def test_parse_simple_grading(tmp_path):
    """transport-bedload-style: one hex, simpleGrading (1 10 1)."""
    from sedifoam_tpu.io.case import read_block_mesh
    path = _write(tmp_path, """
        vertices ( (0 0 0) (1.2 0 0) (1.2 0.4 0) (0 0.4 0)
                   (0 0 0.6) (1.2 0 0.6) (1.2 0.4 0.6) (0 0.4 0.6) );
        blocks ( hex (0 1 2 3 4 5 6 7) (12 10 6) simpleGrading (1 10 1) );
        boundary ( walls { type wall;
                           faces ( (1 5 4 0) (3 7 6 2) ); } );
    """)
    grid, patches = read_block_mesh(path)
    assert grid.shape == (12, 10, 6)
    assert not grid.uniform
    w = grid.axis_widths(1)
    np.testing.assert_allclose(w[-1] / w[0], 10.0, rtol=1e-9)
    np.testing.assert_allclose(w.sum(), 0.4, rtol=1e-12)
    # x and z remain uniform
    assert np.allclose(np.diff(grid.axis_widths(0)), 0.0)
    assert patches["walls"] == [2, 3]


def test_parse_stacked_blocks(tmp_path):
    """transport-vortex-dune-style: two hexes stacked along y."""
    from sedifoam_tpu.io.case import read_block_mesh
    path = _write(tmp_path, """
        vertices ( (0 0 0) (3 0 0) (3 0.1 0) (0 0.1 0)
                   (0 0 1) (3 0 1) (3 0.1 1) (0 0.1 1)
                   (0 1.5 0) (3 1.5 0) (0 1.5 1) (3 1.5 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) (12 4 4) simpleGrading (1 0.5 1)
                 hex (3 2 9 8 7 6 11 10) (12 13 4) simpleGrading (1 2.2 1) );
        boundary ();
    """)
    grid, _ = read_block_mesh(path)
    assert grid.shape == (12, 17, 4)
    f = grid.axis_faces(1)
    assert abs(f[0]) < 1e-12 and abs(f[-1] - 1.5) < 1e-12
    assert abs(f[4] - 0.1) < 1e-12  # block joint is a mesh face
    w = grid.axis_widths(1)
    np.testing.assert_allclose(w[3] / w[0], 0.5, rtol=1e-9)
    np.testing.assert_allclose(w[-1] / w[4], 2.2, rtol=1e-9)


def _graded_grid():
    yf = np.concatenate([[0.0], np.cumsum(
        0.01 * 1.15 ** np.arange(12))])
    return Grid.from_faces(np.linspace(0, 0.06, 7), yf,
                           np.linspace(0, 0.03, 4))


def test_fastsolve_graded_matches_operator():
    """FastDiag on a graded grid inverts the volume-normalized operator."""
    from sedifoam_tpu import fastsolve
    grid = _graded_grid()
    kinds = ((fastsolve.NEUMANN, fastsolve.NEUMANN),
             (fastsolve.DIRICHLET, fastsolve.NEUMANN),
             (fastsolve.PERIODIC, fastsolve.PERIODIC))
    solver = fastsolve.FastDiag(grid, (1.0, 1.0, 1.0), kinds, jnp.float64)

    bcs = _bc.FieldBC(
        xm=_bc.PatchBC(_bc.ZERO_GRADIENT), xp=_bc.PatchBC(_bc.ZERO_GRADIENT),
        ym=_bc.PatchBC(_bc.FIXED_VALUE, (0.0,)),
        yp=_bc.PatchBC(_bc.ZERO_GRADIENT),
        zm=_bc.PatchBC(_bc.CYCLIC), zp=_bc.PatchBC(_bc.CYCLIC))
    lap = linop.laplacian(1.0, grid, bcs, dtype=jnp.float64)

    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.randn(*grid.shape))
    c0 = 37.0
    x = solver.solve(b, c0)
    # residual of (c0*V*x - L x) vs V*b  (volume-integrated form)
    V = grid.cell_volume
    res = c0 * V * x - lap.apply(x) - V * b
    assert float(jnp.max(jnp.abs(res))) < 1e-8 * float(jnp.max(jnp.abs(b)))


def test_smoothing_conserves_and_positive_graded():
    from sedifoam_tpu.coupling.smoothing import smooth
    grid = _graded_grid()
    rng = np.random.RandomState(1)
    f = jnp.asarray(np.abs(rng.rand(*grid.shape)))
    f = f.at[3, 5, 1].set(50.0)  # sharp spike
    out = smooth(f, grid, bandwidth=0.02, steps=3)
    V = jnp.asarray(grid.cell_volume)
    # conservation of the volume integral + maximum principle
    np.testing.assert_allclose(float(jnp.sum(out * V)),
                               float(jnp.sum(f * V)), rtol=1e-10)
    assert float(out.min()) > -1e-12
    assert float(out.max()) < 50.0


def test_gauss_divergence_graded():
    """div of a linear field is exact on the graded grid interior."""
    grid = _graded_grid()
    X = grid.cell_centers(jnp.float64)
    zg = _bc.zero_gradient()
    # U = (x, 2y, 3z) -> div = 6; use fixedValue-free interior check
    U = jnp.stack([X[0], 2.0 * X[1], 3.0 * X[2]])
    phi = ops.flux_of(U, grid, _bc.uniform_bc(_bc.ZERO_GRADIENT,
                                              (0.0, 0.0, 0.0)))
    div = ops.div_flux(phi, grid)
    interior = np.asarray(div)[1:-1, 1:-1, 1:-1]
    np.testing.assert_allclose(interior, 6.0, rtol=1e-9)
    # gradient of a linear scalar is exact in the interior too
    s = X[0] + 2.0 * X[1] + 3.0 * X[2]
    g = np.asarray(ops.grad(s, grid, zg))
    for c, v in enumerate((1.0, 2.0, 3.0)):
        np.testing.assert_allclose(g[c][1:-1, 1:-1, 1:-1], v, rtol=1e-9)


@pytest.mark.slow
def test_poiseuille_on_graded_mesh():
    """Steady laminar channel driven by gradPbar on a y-graded mesh matches
    the analytic parabola (the chPressureGrad + graded-mesh pipeline of
    transport-bedload, without particles)."""
    import dataclasses

    from sedifoam_tpu.config import (ChannelForcing, FluidConfig, PISOConfig)
    from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
    from sedifoam_tpu.fluid.step import fluid_step

    H = 0.01      # channel height
    nu = 1e-4
    gp = 0.02     # pressure gradient / rho  [m/s^2]
    yf = H * (np.linspace(0.0, 1.0, 17)) ** 1.5  # graded toward y=0
    grid = Grid.from_faces(np.linspace(0, 0.02, 4), yf,
                           np.linspace(0, 0.005, 2))
    assert not grid.uniform

    zg3 = _bc.PatchBC(_bc.ZERO_GRADIENT, (0.0, 0.0, 0.0))
    noslip = _bc.PatchBC(_bc.FIXED_VALUE, (0.0, 0.0, 0.0))
    bcs = FluidBCs(
        alpha=_bc.make_field_bc({}),
        p=_bc.make_field_bc({
            "xm": _bc.PatchBC(_bc.CYCLIC), "xp": _bc.PatchBC(_bc.CYCLIC),
            "zm": _bc.PatchBC(_bc.EMPTY), "zp": _bc.PatchBC(_bc.EMPTY)}),
        Ub=_bc.make_field_bc({
            "xm": _bc.PatchBC(_bc.CYCLIC), "xp": _bc.PatchBC(_bc.CYCLIC),
            "ym": noslip, "yp": noslip,
            "zm": _bc.PatchBC(_bc.EMPTY, (0.0, 0.0, 0.0)),
            "zp": _bc.PatchBC(_bc.EMPTY, (0.0, 0.0, 0.0))}, default=zg3),
        Ua=_bc.make_field_bc({}, default=zg3))
    cfg = FluidConfig(
        dt=2e-3, rhob=1000.0, nub=nu, gravity=(0.0, 0.0, 0.0),
        piso=PISOConfig(n_correctors=2, p_tol=1e-9, p_max_iter=400),
        forcing=ChannelForcing(mode="gradPbar",
                               flow_direction=(1.0, 0.0, 0.0),
                               grad_pbar=gp))
    fs = init_fluid(grid, dtype=jnp.float64)
    fs = fs._replace(grad_p_value=jnp.asarray(gp, jnp.float64))

    import jax

    @jax.jit
    def step(fs):
        return fluid_step(fs, grid, bcs, cfg)

    for _ in range(600):
        fs = step(fs)

    y = grid.axis_centers(1)
    u_exact = gp / (2.0 * nu) * y * (H - y)
    u = np.asarray(fs.Ub[0][1, :, 0])
    err = np.abs(u - u_exact).max() / u_exact.max()
    assert err < 0.02, (err, u, u_exact)


def test_smoothing_pow_collapse_equals_sequential():
    """FastDiag.solve_pow (the k implicit-Euler steps collapsed into one
    transform pair) must agree with k sequential solves to roundoff —
    it is the same diagonal operator applied in the same eigenbasis."""
    from sedifoam_tpu import fastsolve
    grid = _graded_grid()
    rng = np.random.RandomState(7)
    f = jnp.asarray(rng.rand(*grid.shape))
    solver = fastsolve.smoothing_solver(grid, (1.0, 0.5, 2.0), f.dtype)
    k, c0 = 6, 1.0 / ((0.02 ** 2 / 4.0) / 6)
    seq = f
    for _ in range(k):
        seq = solver.solve(c0 * seq, c0)
    pw = solver.solve_pow(f, c0, k)
    np.testing.assert_allclose(np.asarray(pw), np.asarray(seq),
                               rtol=1e-11, atol=1e-13)
