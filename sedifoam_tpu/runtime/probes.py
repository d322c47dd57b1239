"""Point probes (the OpenFOAM `probes` function object the reference's
validation harness depends on — e.g. xiaocase1 probes p at two heights and
compares the drop against data/p_bench.dat)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from sedifoam_tpu.grid import Grid


class Probes:
    """Samples cell values at fixed locations (host-side accumulation)."""

    def __init__(self, grid: Grid, locations: Sequence[Tuple[float, ...]]):
        self.grid = grid
        pts = np.asarray(locations, np.float64)
        import jax

        ijk = np.clip(((pts - np.array([grid.x0, grid.y0, grid.z0]))
                       / np.array(grid.spacing)).astype(int),
                      0, np.array([grid.nx - 1, grid.ny - 1, grid.nz - 1]))
        cells = (ijk[:, 0] * grid.ny + ijk[:, 1]) * grid.nz + ijk[:, 2]
        self.cells = jnp.asarray(cells)
        # jitted extraction: eager gathers are pathologically slow on
        # remote-compile backends (every op is a compile round trip)
        self._extract = jax.jit(
            lambda f: f.reshape(f.shape[:-3] + (-1,))[..., self.cells])
        self.times = []
        self.samples = {}

    def sample(self, t: float, **fields):
        """fields: name -> (nx,ny,nz) or (3,nx,ny,nz) arrays."""
        self.times.append(float(t))
        for name, f in fields.items():
            vals = np.asarray(self._extract(f))
            self.samples.setdefault(name, []).append(vals)

    def series(self, name: str):
        """(times (T,), values (T, [3,] n_probes))."""
        return (np.asarray(self.times),
                np.stack(self.samples[name], axis=0))
