"""Native async dump writer tests (build + roundtrip + format)."""

import os

import numpy as np

from sedifoam_tpu.dem.state import make_particles
from sedifoam_tpu.io.dump import DumpWriter


def test_native_dump_roundtrip(tmp_path):
    st = make_particles(pos=[[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]],
                        vel=[[1.0, 0.0, 0.0], [0.0, -1.0, 0.0]],
                        radius=[0.01, 0.02], density=2000.0, n_walls=0)
    path = str(tmp_path / "snapshot.dump")
    with DumpWriter(path, box=(0, 1, 0, 1, 0, 1)) as dw:
        assert dw.native, "native writer should build with g++"
        for step in range(5):
            dw.write(step * 100, st)

    text = open(path).read()
    frames = text.count("ITEM: TIMESTEP")
    assert frames == 5
    assert "ITEM: ATOMS id type diameter mass x y z vx vy vz" in text
    # first atom line: id=1 type=1 d=0.02 then mass, position, velocity
    line = [ln for ln in text.splitlines()
            if ln.startswith("1 1 ")][0].split()
    np.testing.assert_allclose(float(line[2]), 0.02)
    np.testing.assert_allclose([float(x) for x in line[4:7]],
                               [0.1, 0.2, 0.3])
    np.testing.assert_allclose([float(x) for x in line[7:10]],
                               [1.0, 0.0, 0.0])


def test_binary_dump(tmp_path):
    st = make_particles(pos=np.random.rand(16, 3), radius=0.01,
                        density=1000.0, n_walls=0)
    path = str(tmp_path / "traj.bin")
    with DumpWriter(path, binary=True) as dw:
        dw.write(7, st)
    raw = open(path, "rb").read()
    step, n = np.frombuffer(raw[:16], np.int64)
    assert (step, n) == (7, 16)
    ids = np.frombuffer(raw[16:16 + 64], np.int32)
    assert list(ids[:3]) == [1, 2, 3]


def test_openfoam_field_roundtrip(tmp_path):
    """OpenFOAM-ASCII export (C12): fields written in blockMesh cell order
    parse back bit-equal through our own OpenFOAM dict reader."""
    import numpy as np

    from sedifoam_tpu.grid import Grid
    from sedifoam_tpu.io import foamwrite

    grid = Grid(nx=4, ny=3, nz=2, dx=0.1, dy=0.1, dz=0.1)
    rng = np.random.RandomState(0)
    p = rng.randn(4, 3, 2)
    U = rng.randn(3, 4, 3, 2)
    tdir = foamwrite.write_time_dir(str(tmp_path), "0.5", grid,
                                    patch_names=["walls", "inlet"],
                                    p=p, Ub=U)
    p2 = foamwrite.read_field(f"{tdir}/p", grid)
    U2 = foamwrite.read_field(f"{tdir}/Ub", grid)
    np.testing.assert_allclose(p2, p, rtol=1e-7)
    np.testing.assert_allclose(U2, U, rtol=1e-7)
    # header sanity: class + dimensions lines present
    text = open(f"{tdir}/p").read()
    assert "volScalarField" in text and "[1 -1 -2 0 0 0 0]" in text
    assert "nonuniform List<scalar>" in text
