"""Structured uniform finite-volume grid.

The reference (sediFoam) runs on OpenFOAM meshes, but every validation case
is a uniform blockMesh box (e.g. cases/auto-testing/test-cases/xiaocase3/
constant/polyMesh/blockMeshDict).  A uniform structured grid maps directly
onto dense XLA arrays: cell fields are (nx, ny, nz) tensors, fluxes live on
the three face arrays, and every FV operator is a shift-and-add stencil the
compiler can fuse.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


class FaceField(NamedTuple):
    """A quantity stored on cell faces (e.g. a volumetric flux phi).

    ``x`` has shape (nx+1, ny, nz): face i separates cell i-1 (owner/lower)
    from cell i; positive values point along +x.  Same convention for y/z.
    """

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, other):
        return FaceField(self.x + other.x, self.y + other.y, self.z + other.z)

    def __sub__(self, other):
        return FaceField(self.x - other.x, self.y - other.y, self.z - other.z)

    def __mul__(self, other):
        if isinstance(other, FaceField):
            return FaceField(self.x * other.x, self.y * other.y, self.z * other.z)
        return FaceField(self.x * other, self.y * other, self.z * other)

    __rmul__ = __mul__

    def __neg__(self):
        return FaceField(-self.x, -self.y, -self.z)


@dataclasses.dataclass(frozen=True)
class Grid:
    """Uniform box grid. Static (hashable) — safe to close over under jit."""

    nx: int
    ny: int
    nz: int
    dx: float
    dy: float
    dz: float
    x0: float = 0.0
    y0: float = 0.0
    z0: float = 0.0

    @property
    def shape(self):
        return (self.nx, self.ny, self.nz)

    @property
    def n_cells(self):
        return self.nx * self.ny * self.nz

    @property
    def cell_volume(self):
        return self.dx * self.dy * self.dz

    @property
    def spacing(self):
        return (self.dx, self.dy, self.dz)

    @property
    def face_area(self):
        """Areas of x/y/z faces."""
        return (self.dy * self.dz, self.dx * self.dz, self.dx * self.dy)

    @property
    def lengths(self):
        return (self.nx * self.dx, self.ny * self.dy, self.nz * self.dz)

    @property
    def hi(self):
        return (
            self.x0 + self.nx * self.dx,
            self.y0 + self.ny * self.dy,
            self.z0 + self.nz * self.dz,
        )

    def cell_centers(self, dtype=jnp.float64):
        """(3, nx, ny, nz) cell-center coordinates."""
        xs = self.x0 + (jnp.arange(self.nx, dtype=dtype) + 0.5) * self.dx
        ys = self.y0 + (jnp.arange(self.ny, dtype=dtype) + 0.5) * self.dy
        zs = self.z0 + (jnp.arange(self.nz, dtype=dtype) + 0.5) * self.dz
        X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
        return jnp.stack([X, Y, Z])

    def locate(self, pos):
        """Map particle positions (N, 3) -> integer cell indices (N, 3).

        Clamps to the box (a particle outside the domain is assigned its
        nearest boundary cell; callers mask with in-domain checks).
        """
        lo = jnp.array([self.x0, self.y0, self.z0], dtype=pos.dtype)
        d = jnp.array([self.dx, self.dy, self.dz], dtype=pos.dtype)
        n = jnp.array([self.nx, self.ny, self.nz])
        idx = jnp.floor((pos - lo) / d).astype(jnp.int32)
        return jnp.clip(idx, 0, n - 1)

    def flat_index(self, ijk):
        """(N, 3) integer cell indices -> flat (N,) indices."""
        return (ijk[:, 0] * self.ny + ijk[:, 1]) * self.nz + ijk[:, 2]

    def zeros(self, dtype=jnp.float64):
        return jnp.zeros(self.shape, dtype)

    def zeros_vec(self, dtype=jnp.float64):
        return jnp.zeros((3,) + self.shape, dtype)

    def zeros_faces(self, dtype=jnp.float64):
        return FaceField(
            jnp.zeros((self.nx + 1, self.ny, self.nz), dtype),
            jnp.zeros((self.nx, self.ny + 1, self.nz), dtype),
            jnp.zeros((self.nx, self.ny, self.nz + 1), dtype),
        )
