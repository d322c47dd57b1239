"""postSediment/sample/fieldAverage/findFaceOnPatch utility analogues.

References: utilities/postSediment/postChannel.C:46-97 (channel profile
collapse), the OpenFOAM `sample` sets used by expMueller postprocessing,
and utilities/findFaceOnPatch/findFaceOnPatch.C:57-86 (patch face
locator with the component-wise (c-start)*(c-end) <= 0 sign test).
"""

import numpy as np

from sedifoam_tpu.grid import Grid
from sedifoam_tpu.utils.postprocess import (TimeAverager, channel_collapse,
                                            find_faces_on_patch, line_sample)


def test_channel_collapse_means_homogeneous_axes():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(4, 6, 5))
    prof = channel_collapse(f, axis=1)
    np.testing.assert_allclose(prof, f.mean(axis=(0, 2)))
    vec = rng.normal(size=(3, 4, 6, 5))
    np.testing.assert_allclose(channel_collapse(vec, axis=1),
                               vec.mean(axis=(1, 3)))


def test_line_sample_nearest_cell_on_graded_grid():
    xf = np.array([0.0, 0.1, 0.3, 0.7, 1.5])          # graded x faces
    g = Grid.from_faces(xf, np.linspace(0, 1, 4), np.linspace(0, 1, 3))
    f = np.arange(g.shape[0] * g.shape[1] * g.shape[2],
                  dtype=float).reshape(g.shape)
    pts, vals = line_sample(f, g, (0.05, 0.5, 0.25), (1.4, 0.5, 0.25), n=4)
    # x samples 0.05, 0.5, 0.95, 1.4 -> cells 0, 2, 3, 3
    xc = [0, 2, 3, 3]
    j = np.searchsorted(g.axis_faces(1), 0.5, side="right") - 1
    k = np.searchsorted(g.axis_faces(2), 0.25, side="right") - 1
    np.testing.assert_allclose(vals, [f[i, j, k] for i in xc])


def test_time_averager_running_mean():
    ta = TimeAverager()
    for v in (1.0, 3.0, 5.0):
        ta.add(u=np.full((2, 2), v))
    np.testing.assert_allclose(ta.mean("u"), 3.0)


def test_find_faces_on_patch_box_and_line():
    g = Grid(nx=4, ny=6, nz=4, dx=0.25, dy=0.1, dz=0.25)
    # ym patch, box covering x in [0, 0.5] and all z: 2 x-columns x 4 z
    ids, centers = find_faces_on_patch(
        g, 2, [((0.0, 0.0, 0.0), (0.5, 0.0, 1.0))])
    assert ids.shape == (8, 2)
    assert set(ids[:, 0]) == {0, 1}
    np.testing.assert_allclose(centers[:, 1], 0.0)    # on the y=0 plane
    assert np.all(centers[:, 0] < 0.5)
    # degenerate box = a line of faces (the reference's common use)
    ids_line, _ = find_faces_on_patch(
        g, 2, [((0.375, 0.0, 0.0), (0.375, 0.0, 1.0))])
    assert ids_line.shape == (4, 2)
    assert set(ids_line[:, 0]) == {1}
    # two boxes union
    ids_two, _ = find_faces_on_patch(
        g, 2, [((0.375, 0.0, 0.0), (0.375, 0.0, 1.0)),
               ((0.875, 0.0, 0.0), (0.875, 0.0, 1.0))])
    assert ids_two.shape == (8, 2)
    # xp patch: plane sits at x = hi
    ids_xp, c_xp = find_faces_on_patch(
        g, 1, [((1.0, 0.0, 0.0), (1.0, 1.0, 1.0))])
    np.testing.assert_allclose(c_xp[:, 0], g.hi[0])
    assert ids_xp.shape == (24, 2)
