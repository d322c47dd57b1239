"""Tensor-product fast diagonalization for separable constant-coefficient
operators on the box grid.

For an operator  c0*I - sum_a D_a * L_a  (L_a = per-axis 1D volume-
integrated Laplacian with the patch BCs), the eigendecomposition
L_a = V_a diag(lam_a) V_a^T gives the EXACT inverse as six dense matmuls:

    x = V @ [ (V^T b) / (c0 - lam_x - lam_y - lam_z) ]

applied axis-by-axis — pure MXU work, no iterative loop. This replaces:
- the diffusion-smoothing CG entirely (the smoothing operator is constant
  per config -> exact solve, matching the reference's tol-1e-10 implicit
  solves better than any iteration), and
- Jacobi preconditioning of the pressure Poisson (the true face
  coefficient Dp varies mildly around its mean; the exact constant-
  coefficient inverse as a preconditioner takes PCG to a handful of
  iterations at any grid size).

Eigendecompositions are built once per (grid, BCs) in numpy at trace time.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.grid import Grid

# BC kind per axis side for the 1D operators
DIRICHLET = "dirichlet"
NEUMANN = "neumann"
PERIODIC = "periodic"


def bc_kind_1d(patch_kind: str) -> str:
    if patch_kind in (_bc.FIXED_VALUE, _bc.INLET_OUTLET):
        return DIRICHLET
    if patch_kind == _bc.CYCLIC:
        return PERIODIC
    return NEUMANN  # zeroGradient / empty / slip


@lru_cache(maxsize=64)
def _axis_eig(faces: Tuple[float, ...], d_coef: float, lo: str, hi: str):
    """Eigendecomposition of the 1D volume-NORMALIZED Laplacian
    A = diag(1/w) L on the (possibly graded) axis with face coordinates
    `faces`: L is the symmetric tridiagonal with internal coefficients
    1/dist (center-to-center), Dirichlet boundary 1/(w/2), periodic seam
    1/((w0+wn)/2); w are cell widths.

    Solved as the generalized symmetric problem L v = lam diag(w) v via
    the similarity M = W^-1/2 L W^-1/2. Returns (fwd (n,n), bwd (n,n),
    lam (n,)) numpy with  A = bwd @ diag(lam) @ fwd  and fwd @ bwd = I.
    """
    f = np.asarray(faces)
    w = np.diff(f)
    n = len(w)
    c = 0.5 * (f[:-1] + f[1:])
    dist = np.diff(c)
    L = np.zeros((n, n))
    for k in range(n - 1):
        coef = d_coef / dist[k]
        L[k, k] -= coef
        L[k + 1, k + 1] -= coef
        L[k, k + 1] += coef
        L[k + 1, k] += coef
    if lo == PERIODIC or hi == PERIODIC:
        coef = d_coef / (0.5 * (w[0] + w[-1]))
        L[0, 0] -= coef
        L[-1, -1] -= coef
        L[0, -1] += coef
        L[-1, 0] += coef
    else:
        if lo == DIRICHLET:
            L[0, 0] -= d_coef * 2.0 / w[0]
        if hi == DIRICHLET:
            L[-1, -1] -= d_coef * 2.0 / w[-1]
    s = np.sqrt(w)
    M = L / s[:, None] / s[None, :]
    lam, U = np.linalg.eigh(M)
    bwd = U / s[:, None]            # W = D^-1/2 U  (eigenvectors of A)
    fwd = (U * s[:, None]).T        # W^-1 = U^T D^1/2
    return fwd, bwd, lam


@lru_cache(maxsize=32)
def _fastdiag_arrays(grid: Grid, d_coefs: Tuple[float, float, float],
                     kinds: Tuple[Tuple[str, str], ...]):
    """Per-axis transforms + the 3D eigenvalue sum (numpy)."""
    fwds, bwds, lams = [], [], []
    for a in range(3):
        faces = tuple(float(v) for v in grid.axis_faces(a))
        fwd, bwd, lam = _axis_eig(faces, float(d_coefs[a]), *kinds[a])
        fwds.append(fwd)
        bwds.append(bwd)
        lams.append(lam)
    lam3 = (lams[0][:, None, None] + lams[1][None, :, None]
            + lams[2][None, None, :])
    return tuple(fwds), tuple(bwds), lam3


class FastDiag:
    """Callable inverse of  c0*I - sum_a D_a A_a  where A_a is the
    volume-normalized per-axis 1D Laplacian (A = V^-1 L in 3D)."""

    def __init__(self, grid: Grid, d_coefs, kinds, dtype):
        fwds, bwds, lam3 = _fastdiag_arrays(
            grid, tuple(float(d) for d in d_coefs), tuple(kinds))
        self.fwd = [jnp.asarray(v, dtype) for v in fwds]
        self.bwd = [jnp.asarray(v, dtype) for v in bwds]
        self.lam3 = jnp.asarray(lam3, dtype)
        # singular (all-Neumann) operators have one ~0 eigenvalue at c0=0;
        # flag it so callers can project it out
        self.null_tol = float(np.abs(lam3).max()) * 1e-12 + 1e-300

    def _to_eig(self, b):
        # precision=HIGHEST: TPU f32 matmuls default to bfloat16 passes,
        # whose ~1e-3 relative error destroys the maximum principle of the
        # smoothing solve (alpha undershoots to -1e-2 at bed edges)
        off = b.ndim - 3
        for a in range(3):
            b = jnp.moveaxis(
                jnp.tensordot(self.fwd[a], b, axes=(1, off + a),
                              precision=jax.lax.Precision.HIGHEST),
                0, off + a)
        return b

    def _from_eig(self, y):
        off = y.ndim - 3
        for a in range(3):
            y = jnp.moveaxis(
                jnp.tensordot(self.bwd[a], y, axes=(1, off + a),
                              precision=jax.lax.Precision.HIGHEST),
                0, off + a)
        return y

    def solve_pow(self, b, c0, k: int):
        """x = [(c0*I - sum D_a L_a)^-1 c0]^k b — k repeated implicit-
        Euler steps collapsed into ONE transform pair: in the eigenbasis
        each step multiplies by c0/(c0 - lam), so k steps multiply by
        that ratio to the k-th power (lam <= 0 keeps the ratio in (0,1],
        numerically stable; the lam=0 constant mode is preserved exactly,
        as in the sequential form). Replaces k full solves (6k tensordots)
        with 6 tensordots + one elementwise power — the diffusion
        smoothing (enhancedCloud.C:825-845 loops diffusionSteps implicit
        solves) uses this."""
        bh = self._to_eig(b)
        ratio = c0 / (c0 - self.lam3)
        bh = bh * ratio ** k
        return self._from_eig(bh)

    def solve(self, b, c0, project_null: bool = False):
        """x with (c0*I - sum D_a L_a) x = b; leading batch dims allowed;
        c0 may be a traced scalar."""
        bh = self._to_eig(b)
        denom = c0 - self.lam3
        if project_null:
            # zero the (near-)null mode instead of dividing by ~0
            safe = jnp.abs(denom) > self.null_tol
            bh = jnp.where(safe, bh / jnp.where(safe, denom, 1.0), 0.0)
        else:
            bh = bh / denom
        return self._from_eig(bh)


def smoothing_solver(grid: Grid, direction, dtype) -> FastDiag:
    """Exact per-step inverse for the diffusion smoothing (zeroGradient)."""
    kinds = ((NEUMANN, NEUMANN),) * 3
    return FastDiag(grid, direction, kinds, dtype)


def pressure_preconditioner(grid: Grid, pbc: _bc.FieldBC, dtype) -> FastDiag:
    """Constant-coefficient Poisson inverse with the p-field BCs."""
    kinds = []
    for a in range(3):
        lo, hi = pbc.axis(a)
        kinds.append((bc_kind_1d(lo.kind), bc_kind_1d(hi.kind)))
    return FastDiag(grid, (1.0, 1.0, 1.0), tuple(kinds), dtype)
