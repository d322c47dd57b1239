"""IBM relaxation zone + DNS spectral forcing: case wiring and behavior.

Reference: lammpsFoam/createIBMForce.H (addIBMForce/ibmRelaxTime +
0/ibmIndicator), createTurbulence.H:29-49 + calcDNSForce.H (addDNSForce,
UOprocess), UEqns.H:38-41 (implicit relaxation term).
"""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.config import FluidConfig, PISOConfig
from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
from sedifoam_tpu.fluid.step import fluid_step
from sedifoam_tpu.grid import Grid

REF3 = "/root/reference/cases/auto-testing/test-cases/xiaocase3"


def test_case_wiring(tmp_path):
    """addIBMForce/ibmRelaxTime/addDNSForce/UO* parsed from
    transportProperties; 0/ibmIndicator read (nonuniform list)."""
    case = tmp_path / "case"
    shutil.copytree(REF3, case, symlinks=False)
    tp = case / "constant" / "transportProperties"
    tp.write_text(tp.read_text() + "\n"
                  "addIBMForce on;\n"
                  "ibmRelaxTime ibmRelaxTime [0 0 1 0 0 0 0] 0.002;\n"
                  "addDNSForce on;\n"
                  "UOsigma 0.25;\nUOalpha 0.8;\nUOKupper 10;\nUOKlower 2;\n")
    from sedifoam_tpu.io.case import read_block_mesh
    grid, _ = read_block_mesh(str(case / "constant" / "polyMesh" /
                                  "blockMeshDict"))
    n = grid.n_cells
    vals = np.zeros(n)
    # mark cell (i,j,k)=(2,3,0) in OpenFOAM cell order (x fastest)
    mark = (2, 3 % grid.ny, 0)
    vals[mark[0] + mark[1] * grid.nx + mark[2] * grid.nx * grid.ny] = 1.0
    (case / "0" / "ibmIndicator").write_text(
        "FoamFile { version 2.0; format ascii; class volScalarField;"
        " object ibmIndicator; }\n"
        "dimensions [0 0 0 0 0 0 0];\n"
        "internalField nonuniform List<scalar> %d ( %s );\n"
        "boundaryField { }\n" % (n, " ".join("%g" % v for v in vals)))

    from sedifoam_tpu.io.case import load_case
    cfg, fluid, particles, controls = load_case(str(case))
    assert cfg.fluid.add_ibm_force
    assert abs(cfg.fluid.ibm_relax_time - 0.002) < 1e-12
    assert cfg.fluid.add_dns_force
    assert cfg.fluid.dns_sigma == 0.25
    assert cfg.fluid.dns_k_upper == 10
    ind = np.asarray(fluid.ibm_indicator)
    assert ind[mark] == 1.0
    assert ind.sum() == 1.0


def _box(nx=8, ny=8, nz=8, L=0.08):
    grid = Grid(nx=nx, ny=ny, nz=nz, dx=L / nx, dy=L / ny, dz=L / nz)
    cyc = _bc.PatchBC(_bc.CYCLIC)
    cyc3 = _bc.PatchBC(_bc.CYCLIC, (0.0, 0.0, 0.0))
    bcs = FluidBCs(
        alpha=_bc.FieldBC(*(cyc for _ in range(6))),
        p=_bc.FieldBC(*(cyc for _ in range(6))),
        Ub=_bc.FieldBC(*(cyc3 for _ in range(6))),
        Ua=_bc.FieldBC(*(cyc3 for _ in range(6))))
    return grid, bcs


def test_ibm_zone_damps_velocity():
    grid, bcs = _box()
    cfg = FluidConfig(dt=1e-3, rhob=1000.0, nub=1e-6,
                      piso=PISOConfig(n_correctors=1, p_tol=1e-9),
                      add_ibm_force=True, ibm_relax_time=2e-3)
    fs = init_fluid(grid, Ub=jnp.zeros((3,) + grid.shape,
                                       jnp.float64).at[0].set(0.1))
    ind = jnp.zeros(grid.shape, jnp.float64).at[2:6, 2:6, 2:6].set(1.0)
    fs = fs._replace(ibm_indicator=ind)

    step = jax.jit(lambda f: fluid_step(f, grid, bcs, cfg))
    for _ in range(10):
        fs = step(fs)
    inside = float(jnp.abs(fs.Ub[0] * ind).sum() / ind.sum())
    outside = float(jnp.abs(fs.Ub[0] * (1 - ind)).sum() / (1 - ind).sum())
    # 10 steps at dt/tau = 0.5 -> zone velocity strongly relaxed to zero
    assert inside < 0.2 * outside, (inside, outside)


def test_dns_forcing_injects_energy():
    grid, bcs = _box()
    cfg = FluidConfig(dt=1e-3, rhob=1000.0, nub=1e-6,
                      piso=PISOConfig(n_correctors=1, p_tol=1e-9),
                      add_dns_force=True, dns_alpha=1.0, dns_sigma=0.5,
                      dns_k_upper=600.0, dns_k_lower=0.0)
    fs = init_fluid(grid)
    step = jax.jit(lambda f: fluid_step(f, grid, bcs, cfg))
    for _ in range(10):
        fs = step(fs)
    ke = float(jnp.sum(fs.Ub ** 2))
    assert bool(jnp.isfinite(fs.Ub).all())
    assert float(jnp.abs(fs.turbulence_force).max()) > 0.0
    assert ke > 0.0
