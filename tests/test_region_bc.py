"""RegionPatchBC: mixed per-face-cell boundary conditions.

jetFlow's embedded-Cartesian bottom boundary carries a fixedValue inlet
disc inside a slip annulus on ONE box face (the O-grid's separate
`inlet`/`bottom` patches, cases/example-cases/jetFlow/constant/polyMesh/
blockMeshDict:84-110). These tests pin the blending semantics: every
operator's response to a region patch must equal the coverage-weighted
blend of its responses to the two uniform sub-BCs, and a disc inlet must
drive a mass-conserving jet through a duct with the disc's true flux.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sedifoam_tpu import bc, linop, ops
from sedifoam_tpu.config import FluidConfig, PISOConfig
from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
from sedifoam_tpu.fluid.step import fluid_step
from sedifoam_tpu.grid import FaceField, Grid


def _setup():
    grid = Grid(nx=6, ny=8, nz=6, dx=1.0 / 6, dy=1.0 / 8, dz=1.0 / 6)
    region = bc.DiscRegion(axis=1, c0=0.5, c1=0.5, radius=0.3)
    inside = bc.PatchBC(bc.FIXED_VALUE, (2.0,))
    outside = bc.PatchBC(bc.ZERO_GRADIENT, (0.0,))
    mixed = bc.RegionPatchBC(inside, outside, region)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=grid.shape))
    return grid, region, inside, outside, mixed, c


def _fbc(patch):
    return bc.make_field_bc({"ym": patch})


def test_mask_geometry():
    """Coverage fractions: 1 deep inside, 0 far outside, fractional at the
    rim, and the summed covered area matches pi r^2 to the subsampling."""
    grid, region, *_ = _setup()
    m = np.asarray(region.mask(grid))[0]
    assert m.shape == (6, 6)
    assert m.max() == 1.0 and m.min() == 0.0
    assert ((m > 0) & (m < 1)).any()
    area = m.sum() * (1.0 / 6) * (1.0 / 6)
    np.testing.assert_allclose(area, np.pi * 0.3 ** 2, rtol=2e-2)


def test_face_ops_blend():
    grid, region, inside, outside, mixed, c = _setup()
    m = np.asarray(region.mask(grid))  # (1, nx, nz)
    for op in (ops.face_interp, ops.sn_grad):
        fi = op(c, grid, _fbc(inside))
        fo = op(c, grid, _fbc(outside))
        fm = op(c, grid, _fbc(mixed))
        # ym boundary faces blend; everything else identical to both
        np.testing.assert_allclose(
            np.asarray(fm.y[:, 0]),
            m[0] * np.asarray(fi.y[:, 0])
            + (1 - m[0]) * np.asarray(fo.y[:, 0]), atol=1e-13)
        np.testing.assert_allclose(np.asarray(fm.y[:, 1:]),
                                   np.asarray(fi.y[:, 1:]))
        for a in ("x", "z"):
            np.testing.assert_allclose(np.asarray(getattr(fm, a)),
                                       np.asarray(getattr(fi, a)))


def test_linop_blend():
    grid, region, inside, outside, mixed, c = _setup()
    m = jnp.moveaxis(jnp.asarray(region.mask(grid)), 0, 1)  # (nx, 1, nz)
    mask_cells = jnp.concatenate(
        [m, jnp.zeros((grid.nx, grid.ny - 1, grid.nz))], axis=1)
    rng = np.random.default_rng(1)
    phi = FaceField(
        jnp.asarray(rng.normal(size=(grid.nx + 1, grid.ny, grid.nz))),
        jnp.asarray(rng.normal(size=(grid.nx, grid.ny + 1, grid.nz))),
        jnp.asarray(rng.normal(size=(grid.nx, grid.ny, grid.nz + 1))))
    x = jnp.asarray(rng.normal(size=grid.shape))

    def check(make):
        ti, to, tm = make(inside), make(outside), make(mixed)
        for attr in ("diag", "rhs"):
            vi, vo, vm = (getattr(t, attr) for t in (ti, to, tm))
            np.testing.assert_allclose(
                np.asarray(vm),
                np.asarray(mask_cells * vi + (1 - mask_cells) * vo),
                atol=1e-13)
        ai, ao, am = ti.apply(x), to.apply(x), tm.apply(x)
        np.testing.assert_allclose(
            np.asarray(am),
            np.asarray(mask_cells * ai + (1 - mask_cells) * ao), atol=1e-13)

    check(lambda p: linop.div(phi, c, grid, _fbc(p)))
    check(lambda p: linop.laplacian(0.7, grid, _fbc(p), dtype=x.dtype))


def test_degenerate_region_equals_uniform():
    grid, region, inside, _, _, c = _setup()
    same = bc.RegionPatchBC(inside, inside, region)
    fi = ops.face_interp(c, grid, _fbc(inside))
    fm = ops.face_interp(c, grid, _fbc(same))
    for a in range(3):
        np.testing.assert_allclose(np.asarray(fm[a]), np.asarray(fi[a]),
                                   atol=1e-14)


def test_slip_normal_component_blocks_flux():
    """SLIP is OpenFOAM's symmetry transform: zero wall-normal velocity,
    zeroGradient tangential — a slip-walled box admits no boundary flux."""
    grid = Grid(nx=4, ny=4, nz=4, dx=0.25, dy=0.25, dz=0.25)
    slip3 = bc.PatchBC(bc.SLIP, (0.0, 0.0, 0.0))
    vbc = bc.make_field_bc({}, default=slip3)
    rng = np.random.default_rng(2)
    U = jnp.asarray(rng.normal(size=(3,) + grid.shape))
    phi = ops.flux_of(U, grid, vbc)
    for a, f in enumerate((phi.x, phi.y, phi.z)):
        fm = ops._mv(f, a)
        assert float(jnp.abs(fm[0]).max()) == 0.0
        assert float(jnp.abs(fm[-1]).max()) == 0.0
    # tangential components still extrapolate (zeroGradient)
    fy_of_ux = ops.face_interp(U[0], grid, vbc.component(0)).y
    np.testing.assert_allclose(np.asarray(fy_of_ux[:, 0]),
                               np.asarray(U[0][:, 0]))


def test_disc_inlet_jet_conserves_mass():
    """A disc inlet in a slip bottom drives a jet through a duct: inflow
    flux equals the coverage-weighted disc area times vin (~pi r^2 vin),
    equals outflow."""
    n = 8
    grid = Grid(nx=n, ny=12, nz=n, dx=1.0 / n, dy=1.5 / 12, dz=1.0 / n)
    vin = 0.3
    region = bc.DiscRegion(axis=1, c0=0.5, c1=0.5, radius=0.27)
    inlet = bc.PatchBC(bc.FIXED_VALUE, (0.0, vin, 0.0))
    slip3 = bc.PatchBC(bc.SLIP, (0.0, 0.0, 0.0))
    mixed = bc.RegionPatchBC(inlet, slip3, region)
    outlet_u = bc.PatchBC(bc.INLET_OUTLET, (0.0, 0.0, 0.0))
    bcs = FluidBCs(
        alpha=bc.make_field_bc({}),
        p=bc.make_field_bc({"yp": bc.PatchBC(bc.FIXED_VALUE, (0.0,))}),
        Ub=bc.make_field_bc({"ym": mixed, "yp": outlet_u}, default=slip3),
        Ua=bc.make_field_bc({}, default=slip3),
    )
    cfg = FluidConfig(dt=5e-3, rhob=1000.0, nub=1e-4,
                      piso=PISOConfig(n_correctors=2, p_tol=1e-12))
    fs = init_fluid(grid)
    step = jax.jit(lambda s: fluid_step(s, grid, bcs, cfg))
    for _ in range(40):
        fs = step(fs)

    m = np.asarray(region.mask(grid))[0]
    q_exact = vin * m.sum() * grid.dx * grid.dz
    np.testing.assert_allclose(q_exact, vin * np.pi * 0.27 ** 2, rtol=2e-2)
    qin = float(jnp.sum(fs.phib.y[:, 0]))
    qout = float(jnp.sum(fs.phib.y[:, -1]))
    np.testing.assert_allclose(qin, q_exact, rtol=1e-10)
    np.testing.assert_allclose(qout, qin, rtol=1e-6)
    # the jet core above the disc moves; the pressure field stays finite
    u = np.asarray(fs.Ub[1])
    assert u[n // 2, 6, n // 2] > 0.05 * vin
    assert np.isfinite(np.asarray(fs.p)).all()
    # continuity
    assert float(jnp.abs(ops.div_flux(fs.phib, grid)).max()) < 1e-8


def test_one_sided_region_spec_blends_against_default(tmp_path):
    """A mixed O-grid face whose 0/<field> file names only one of its two
    patches must blend that spec against zeroGradient over its own
    region (with a warning), NOT paint it across the whole face
    (io/case.py _read_field_bc)."""
    import warnings

    from sedifoam_tpu.io.case import _read_field_bc

    f = tmp_path / "Ubad"
    f.write_text("""
FoamFile { version 2.0; format ascii; class volVectorField; object Ub; }
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0 0 0);
boundaryField
{
    inlet { type fixedValue; value uniform (0 1.72 0); }
    top   { type zeroGradient; }
}
""")
    region = bc.DiscRegion(axis=1, c0=0.0, c1=0.0, radius=0.0025)
    regions = {2: ("inlet", "bottom", region)}   # `bottom` spec missing
    patch_faces = {"inlet": [2], "bottom": [2], "top": [3]}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fbc, _ = _read_field_bc(str(f), patch_faces, 3, regions)
    assert any("bottom" in str(x.message) for x in w)
    ym = fbc.ym
    assert isinstance(ym, bc.RegionPatchBC)
    assert ym.inside.kind == bc.FIXED_VALUE
    assert ym.outside.kind == bc.ZERO_GRADIENT   # default, not the inlet
