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
