"""Post-processing utilities.

- channel_collapse: the postSediment/channelIndex profile collapse
  (utilities/postSediment/postChannel.C:46-97): average fields over the
  homogeneous directions to produce wall-normal line profiles.
- line_sample: the OpenFOAM `sample` sets analogue used by the Mueller
  validation cases (expMueller06/postprocessing.py).
- time_average: running mean of fields (the UaMean the Mueller cases
  compare against experiment).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from sedifoam_tpu.grid import Grid


def channel_collapse(field, axis: int = 1):
    """Collapse a (nx,ny,nz) or (3,nx,ny,nz) field to a profile along
    `axis` by averaging over the other two (homogeneous) directions."""
    f = np.asarray(field)
    spatial_axes = tuple(range(f.ndim - 3, f.ndim))
    keep = spatial_axes[axis]
    reduce_axes = tuple(a for a in spatial_axes if a != keep)
    return f.mean(axis=reduce_axes)


def line_sample(field, grid: Grid, start, end, n: int = 100):
    """Sample a field along a straight line (nearest-cell)."""
    f = np.asarray(field)
    pts = np.linspace(np.asarray(start, float), np.asarray(end, float), n)
    ijk = np.stack([
        np.clip(np.searchsorted(grid.axis_faces(a), pts[:, a],
                                side="right") - 1, 0, grid.shape[a] - 1)
        for a in range(3)], axis=-1)
    vals = f[..., ijk[:, 0], ijk[:, 1], ijk[:, 2]]
    return pts, np.moveaxis(vals, -1, 0) if vals.ndim > 1 else vals


class TimeAverager:
    """Running time average of named fields (fieldAverage analogue)."""

    def __init__(self):
        self.n = 0
        self.sums = {}

    def add(self, **fields):
        self.n += 1
        for name, f in fields.items():
            f = np.asarray(f)
            if name in self.sums:
                self.sums[name] = self.sums[name] + f
            else:
                self.sums[name] = f.copy()

    def mean(self, name: str):
        return self.sums[name] / max(self.n, 1)
