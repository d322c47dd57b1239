"""transport-bedload loads and steps: graded mesh + cyclic fluid patches +
periodic DEM + frozen bed + Ubar channel forcing, end to end.

The reference case ships no particle IC (In_initial.in is user-generated,
cases/example-cases/transport-bedload/Allrun.sh), so a small synthetic bed
is written in the same format. The full 140x65x60 mesh is too large for a
CPU unit test; the load test uses the real case files verbatim and the
step test swaps in a coarsened copy of the same geometry.
"""

import os
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/cases/example-cases/transport-bedload"


def _synth_bed(path, box, d=0.0025, nx=8, nz=6, n_layers=3):
    """Two frozen bottom layers (type 2) + mobile layers above (type 1)."""
    rows = []
    tag = 1
    for layer in range(n_layers):
        for i in range(nx):
            for k in range(nz):
                x = box[0] + (i + 0.5) * (box[1] - box[0]) / nx
                z = box[4] + (k + 0.5) * (box[5] - box[4]) / nz
                y = box[2] + (layer + 0.5) * d
                t = 2 if layer == 0 else 1
                rows.append(f"{tag} {t} {d} 2650.0 {x:.6f} {y:.6f} {z:.6f}")
                tag += 1
    with open(path, "w") as f:
        f.write("synthetic bedload IC\n\n")
        f.write(f"{len(rows)} atoms\n2 atom types\n\n")
        f.write(f"{box[0]} {box[1]} xlo xhi\n")
        f.write(f"{box[2]} {box[3]} ylo yhi\n")
        f.write(f"{box[4]} {box[5]} zlo zhi\n\n")
        f.write("Atoms\n\n")
        f.write("\n".join(rows) + "\n")
    return len(rows)


def _assemble(tmp_path, blockmesh_override=None):
    case = tmp_path / "bedload"
    case.mkdir()
    for sub in ("0", "system"):
        os.symlink(os.path.join(REF, sub), case / sub)
    (case / "constant").mkdir()
    for f in os.listdir(os.path.join(REF, "constant")):
        src = os.path.join(REF, "constant", f)
        if f == "polyMesh":
            (case / "constant" / "polyMesh").mkdir()
            bmd = os.path.join(src, "blockMeshDict")
            if blockmesh_override:
                (case / "constant" / "polyMesh" /
                 "blockMeshDict").write_text(blockmesh_override)
            else:
                shutil.copy(bmd, case / "constant" / "polyMesh")
        else:
            os.symlink(src, case / "constant" / f)
    shutil.copy(os.path.join(REF, "in.lammps"), case)
    _synth_bed(case / "In_initial.in",
               (0.0, 0.121250, 0.0, 0.04, 0.0, 0.06001))
    return str(case)


def test_bedload_loads_full_mesh(tmp_path):
    from sedifoam_tpu.io.case import load_case
    cfg, fluid, particles, controls = load_case(_assemble(tmp_path),
                                                backend="binned",
                                                dtype=jnp.float32)
    assert cfg.grid.shape == (140, 65, 60)
    assert not cfg.grid.uniform
    w = cfg.grid.axis_widths(1)
    np.testing.assert_allclose(w[-1] / w[0], 10.0, rtol=1e-6)
    # cyclic fluid patches on x and z
    from sedifoam_tpu import bc as _bc
    assert cfg.bcs.p.xm.kind == _bc.CYCLIC
    assert cfg.bcs.p.zm.kind == _bc.CYCLIC
    # periodic DEM on x/z, walls on y, frozen bottom type
    assert cfg.dem.periodic == (True, False, True)
    assert cfg.dem.frozen_types == (2,)
    assert cfg.dem.pair.style == "hooke_history"
    # Ubar channel forcing from transportProperties
    assert cfg.fluid.forcing.mode == "Ubar"
    np.testing.assert_allclose(cfg.fluid.forcing.mag_ubar, 0.8)
    assert int(particles.n_active) == 144


COARSE_BMD = """
FoamFile { version 2.0; format ascii; class dictionary;
           object blockMeshDict; }
convertToMeters 1;
vertices ( (0.00 0.00 0.00) (0.121250 0.00 0.00)
           (0.121250 0.04 0.00) (0.00 0.04 0.00)
           (0.00 0.00 0.06001) (0.121250 0.00 0.06001)
           (0.121250 0.04 0.06001) (0.00 0.04 0.06001) );
blocks ( hex (0 1 2 3 4 5 6 7) (14 13 6) simpleGrading (1 10 1) );
boundary (
  bottom { type wall; faces ( (1 5 4 0) ); }
  top    { type wall; faces ( (3 7 6 2) ); }
  left   { type cyclic; neighbourPatch right; faces ( (0 4 7 3) ); }
  right  { type cyclic; neighbourPatch left;  faces ( (2 6 5 1) ); }
  front  { type cyclic; neighbourPatch back;  faces ( (0 1 2 3) ); }
  back   { type cyclic; neighbourPatch front; faces ( (4 5 6 7) ); }
);
"""


@pytest.mark.slow
def test_bedload_steps_coarse(tmp_path):
    """Coarsened bedload: several coupled steps stay finite, Ubar forcing
    accelerates the stream, frozen bed stays put, mobile grains wrap."""
    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.solver import coupled_step, initialize

    case = _assemble(tmp_path, blockmesh_override=COARSE_BMD)
    cfg, fluid, particles, controls = load_case(case, backend="dense",
                                                dtype=jnp.float64)
    state = initialize(fluid, particles, cfg)
    frozen0 = np.asarray(state.particles.pos[state.particles.ptype == 2])

    import jax
    step = jax.jit(lambda s: coupled_step(s, cfg))
    for _ in range(10):
        state = step(state)

    assert bool(jnp.all(jnp.isfinite(state.fluid.p)))
    assert bool(jnp.all(jnp.isfinite(state.particles.pos)))
    # Ubar feedback drives the fluid toward the 0.8 m/s target
    assert float(state.fluid.Ub[0].mean()) > 0.01
    assert float(state.fluid.grad_p_value) > 0.0
    # frozen bed has not moved
    frozen1 = np.asarray(state.particles.pos[state.particles.ptype == 2])
    np.testing.assert_allclose(frozen0, frozen1, atol=0.0)
    # nothing was deleted (periodic x/z, bounded y)
    assert int(state.particles.n_active) == 144
