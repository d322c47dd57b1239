"""jetFlow example case via the O-grid Cartesian embedding.

The reference's one non-tensor mesh (4 arc-edged side blocks around a jet
column, cases/example-cases/jetFlow/constant/polyMesh/blockMeshDict:52-80)
loads through read_block_mesh_embedded: the vertex bounding box becomes
the fluid domain (identical to the case's own DEM wall box,
jetFlow/in.lammps:30-32), the column's separate `inlet` patch becomes a
disc-region BC inside the `bottom` annulus, and the side blocks' radial
grading (fine at the jet) maps onto the cross axes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu import bc
from sedifoam_tpu.io.case import (UnsupportedMeshError, load_case,
                                  read_block_mesh_embedded)

CASE = "/root/reference/cases/example-cases/jetFlow"

pytestmark = pytest.mark.skipif(not os.path.isdir(CASE),
                                reason="jetFlow case not mounted")


def test_refused_without_opt_in():
    with pytest.raises(UnsupportedMeshError, match="embed_ogrid"):
        load_case(CASE)


def test_embedded_mesh_geometry():
    grid, patch_faces, regions = read_block_mesh_embedded(
        os.path.join(CASE, "constant", "polyMesh", "blockMeshDict"))
    # 24 (side, graded) + 8 (column) + 24 per cross axis; 120 axial
    assert grid.shape == (56, 120, 56)
    xf = np.asarray(grid.axis_faces(0))
    np.testing.assert_allclose([xf[0], xf[-1]], [-0.05, 0.05], atol=1e-12)
    # grading 0.06 outer->inner: cells shrink toward the jet column
    w = np.diff(xf)
    assert w[0] > 5 * w[23]            # side segment fine end at the column
    np.testing.assert_allclose(w[:24], w[::-1][:24])   # mirrored sides
    np.testing.assert_allclose(w[24:32], 0.0044 / 8)   # uniform column
    # bottom face carries the inlet disc region (arc radius 2.5 mm)
    assert set(regions) == {2}
    inner, outer, disc = regions[2]
    assert (inner, outer) == ("inlet", "bottom")
    assert disc.axis == 1 and disc.radius == pytest.approx(0.0025)
    assert patch_faces["top"] == [3]
    assert sorted(patch_faces["outer"]) == [0, 1, 4, 5]


def test_case_loads_with_region_bcs():
    cfg, fluid, particles, controls = load_case(CASE, embed_ogrid=True,
                                                capacity=512)
    ub_ym = cfg.bcs.Ub.ym
    assert isinstance(ub_ym, bc.RegionPatchBC)
    assert ub_ym.inside.kind == bc.FIXED_VALUE
    assert ub_ym.inside.value == (0.0, 1.72, 0.0)
    assert ub_ym.outside.kind == bc.SLIP
    assert cfg.bcs.Ub.yp.kind == bc.INLET_OUTLET
    assert cfg.bcs.p.yp.kind == bc.FIXED_VALUE
    # scalar slip collapses to zeroGradient; Ua inlet slip == bottom slip
    assert cfg.bcs.alpha.ym.kind == bc.ZERO_GRADIENT
    assert cfg.bcs.Ua.ym.kind == bc.SLIP
    # the LES subdict of turbulenceProperties (the file the OF-4-based
    # reference reads) selects kEqn; LESProperties is the stale 1.4-era
    # duplicate naming Smagorinsky
    assert cfg.fluid.turbulence.model == "kEqn"
    # type-2 `bottom` group is excluded from fix nve/sphere -> frozen
    assert cfg.dem.frozen_types == (2,)
    # particle injection near the inlet, deletion near the outlet
    assert cfg.cloud.add_particle == 1 and cfg.cloud.delete_particle == 1
    assert cfg.cloud.add_velocity == (0.0, 1.72, 0.0)
    # inlet disc flux: coverage-weighted area matches pi r^2
    m = np.asarray(ub_ym.region.mask(cfg.grid))[0]
    xf = np.asarray(cfg.grid.axis_faces(0))
    zf = np.asarray(cfg.grid.axis_faces(2))
    areas = np.diff(xf)[:, None] * np.diff(zf)[None, :]
    np.testing.assert_allclose((m * areas).sum(), np.pi * 0.0025 ** 2,
                               rtol=2e-2)


def test_embedded_case_steps():
    """One coupled step on a coarsened embedded jetFlow: finite fields and
    the inlet admits the disc flux. (The full 56x120x56 mesh is exercised
    by scripts/validate_jetflow.py on the TPU.)"""
    from sedifoam_tpu.solver import initialize, make_step_fn

    cfg, fluid, particles, controls = load_case(CASE, embed_ogrid=True,
                                                capacity=64)
    # coarsen 4x per axis for the CPU smoke test: rebuild the grid from
    # every 4th face coordinate
    from sedifoam_tpu.grid import Grid
    import dataclasses
    g = cfg.grid
    from sedifoam_tpu.utils.postprocess import coarsen_faces
    grid = Grid.from_faces(*(coarsen_faces(np.asarray(g.axis_faces(a)), 4)
                             for a in range(3)))
    cfg = dataclasses.replace(cfg, grid=grid)
    from sedifoam_tpu.fluid.state import init_fluid
    fluid = init_fluid(grid, dtype=jnp.float64)

    state = initialize(fluid, particles, cfg)
    step = make_step_fn(cfg)
    for _ in range(2):
        state = step(state)
    f2, p2 = state.fluid, state.particles
    assert bool(jnp.isfinite(f2.p).all())
    assert bool(jnp.isfinite(f2.Ub).all())
    assert bool(jnp.isfinite(p2.pos).all())
    qin = float(jnp.sum(f2.phib.y[:, 0]))
    m = np.asarray(cfg.bcs.Ub.ym.region.mask(grid))[0]
    xf = np.asarray(grid.axis_faces(0))
    zf = np.asarray(grid.axis_faces(2))
    areas = np.diff(xf)[:, None] * np.diff(zf)[None, :]
    np.testing.assert_allclose(qin, 1.72 * (m * areas).sum(), rtol=1e-8)
