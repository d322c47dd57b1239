"""Point probes (the OpenFOAM `probes` function object the reference's
validation harness depends on — e.g. xiaocase1 probes p at two heights and
compares the drop against data/p_bench.dat)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax

import jax.numpy as jnp
import numpy as np

from sedifoam_tpu.grid import Grid


class Probes:
    """Samples cell values at fixed locations (host-side accumulation)."""

    def __init__(self, grid: Grid, locations: Sequence[Tuple[float, ...]]):
        self.grid = grid
        pts = np.asarray(locations, np.float64)
        ijk = np.stack([
            np.clip(np.searchsorted(grid.axis_faces(a), pts[:, a],
                                    side="right") - 1,
                    0, grid.shape[a] - 1)
            for a in range(3)], axis=-1)
        cells = (ijk[:, 0] * grid.ny + ijk[:, 1]) * grid.nz + ijk[:, 2]
        self.cells = jnp.asarray(cells)
        # ONE jitted extraction for all fields (eager gathers are compile
        # round trips on remote backends; per-field fetches pay the tunnel
        # latency several times over)
        self._extract = jax.jit(lambda fields: {
            k: f.reshape(f.shape[:-3] + (-1,))[..., self.cells]
            for k, f in fields.items()})
        self.times = []
        self.samples = {}

    def sample(self, t: float, **fields):
        """fields: name -> (nx,ny,nz) or (3,nx,ny,nz) arrays."""
        self.times.append(float(t))
        out = jax.device_get(self._extract(fields))
        for name, vals in out.items():
            self.samples.setdefault(name, []).append(np.asarray(vals))

    def series(self, name: str):
        """(times (T,), values (T, [3,] n_probes))."""
        return (np.asarray(self.times),
                np.stack(self.samples[name], axis=0))

    def save(self, path: str) -> None:
        """Persist the accumulated series (for checkpoint/resume: the
        reference's probe function object appends to its file across
        restarts; here the series rides the checkpoint sidecar)."""
        arrays = {f"s_{k}": np.stack(v, axis=0)
                  for k, v in self.samples.items()}
        np.savez_compressed(path, times=np.asarray(self.times, np.float64),
                            **arrays)

    def load(self, path: str) -> None:
        with np.load(path) as d:
            self.times = [float(t) for t in d["times"]]
            self.samples = {k[2:]: [np.asarray(a) for a in d[k]]
                            for k in d.files if k.startswith("s_")}
