"""Finite-volume operators on the uniform structured grid.

These are the TPU-native equivalents of OpenFOAM's fvc:: namespace as used
by the reference solver (lammpsFoam/{UEqns.H,pEqn.H,DDtU.H}): Gauss-linear
interpolation/gradient/divergence, corrected snGrad laplacians, curl, and
the limitedLinear/limitedLinearV TVD convection weights from the cases'
fvSchemes (e.g. xiaocase3/system/fvSchemes: div(phib,Ub) Gauss
limitedLinearV 1).

Everything is a shift-and-add dense stencil: XLA fuses these into a handful
of elementwise kernels, which is the fast path on TPU for small/medium
grids. All functions are pure and jit-safe; boundary conditions are static
(`bc.FieldBC`) so there is no traced control flow.

Layout: scalar cell fields are (nx, ny, nz); vector fields are
(3, nx, ny, nz) with component leading so ops vmap over it; face fields are
`grid.FaceField` with the +axis orientation convention.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.grid import FaceField, Grid

# OpenFOAM's SMALL/ROOTVSMALL analogues.
SMALL = 1e-15
ROOTVSMALL = 1e-18


import numpy as np


def _const(x, like):
    """Cast a numpy geometry constant to the field dtype (graded grids
    carry np.float64 volume/area/distance arrays; mixing them with f32
    fields under enable_x64 would silently promote everything to f64)."""
    if isinstance(x, np.ndarray):
        return jnp.asarray(x, like.dtype)
    return x


def _mv(a, axis):
    return jnp.moveaxis(a, axis, 0)


def _mvback(a, axis):
    return jnp.moveaxis(a, 0, axis)


def _sign(x):
    """OpenFOAM sign(): +1 for x >= 0 else -1."""
    return jnp.where(x >= 0, 1.0, -1.0)


# ---------------------------------------------------------------------------
# boundary face values / gradients (per axis, per side)
# ---------------------------------------------------------------------------


def _boundary_face_value(cell_slab, patch: _bc.PatchBC, lo: bool,
                         other_slab=None, phi_slab=None, t=0.0):
    """Face value on a boundary patch given the adjacent cell slab.

    cell_slab: values of the cells adjacent to this patch, shape (1, ...).
    other_slab: cells adjacent to the OPPOSITE patch (for cyclic).
    phi_slab: boundary face flux (for inletOutlet switching).
    """
    k = patch.kind
    if k == _bc.FIXED_VALUE:
        return jnp.zeros_like(cell_slab) + patch.value_at(t)
    if k in (_bc.ZERO_GRADIENT, _bc.SLIP):
        return cell_slab
    if k == _bc.EMPTY:
        return jnp.zeros_like(cell_slab)
    if k == _bc.CYCLIC:
        return 0.5 * (cell_slab + other_slab)
    if k == _bc.INLET_OUTLET:
        if phi_slab is None:
            # no flux context (explicit gradient ops): fall back to the
            # zeroGradient branch, like OpenFOAM's stale boundary values
            return cell_slab
        outflow = (phi_slab < 0) if lo else (phi_slab > 0)
        inlet = jnp.zeros_like(cell_slab) + patch.value_at(t)
        return jnp.where(outflow, cell_slab, inlet)
    raise ValueError(f"unknown BC kind {k}")


def _boundary_sngrad(cell_slab, patch: _bc.PatchBC, lo: bool, d: float,
                     other_slab=None, phi_slab=None, t=0.0,
                     d_cyc: Optional[float] = None):
    """d(field)/d(axis) on a boundary face, along the +axis direction.

    d: adjacent-cell width (boundary delta = d/2); d_cyc: center-to-center
    distance across the cyclic seam (defaults to d on uniform axes).
    """
    k = patch.kind
    if d_cyc is None:
        d_cyc = d
    if k == _bc.FIXED_VALUE:
        v = jnp.zeros_like(cell_slab) + patch.value_at(t)
        # delta coeff at a boundary face is 1/(d/2), signed along +axis
        return (cell_slab - v) * (2.0 / d) if lo else (v - cell_slab) * (2.0 / d)
    if k in (_bc.ZERO_GRADIENT, _bc.EMPTY, _bc.SLIP):
        return jnp.zeros_like(cell_slab)
    if k == _bc.CYCLIC:
        # wrap: gradient between last and first cell across the seam
        return ((cell_slab - other_slab) / d_cyc) if lo \
            else ((other_slab - cell_slab) / d_cyc)
    if k == _bc.INLET_OUTLET:
        if phi_slab is None:
            return jnp.zeros_like(cell_slab)
        outflow = (phi_slab < 0) if lo else (phi_slab > 0)
        v = jnp.zeros_like(cell_slab) + patch.value_at(t)
        g_fix = (cell_slab - v) * (2.0 / d) if lo else (v - cell_slab) * (2.0 / d)
        return jnp.where(outflow, jnp.zeros_like(cell_slab), g_fix)
    raise ValueError(f"unknown BC kind {k}")


def _axis_geom(grid: Grid, axis: int, dtype):
    """(w_lin (n-1,1,1) owner weights, inv_d (n-1,1,1) internal inverse
    deltas, d_lo, d_hi, d_cyc) for one axis; scalars on uniform axes."""
    if grid.uniform:
        d = grid.spacing[axis]
        return 0.5, 1.0 / d, d, d, d
    w = grid.axis_widths(axis)
    dists = grid.axis_dists(axis)
    wl = jnp.asarray(grid.axis_weights(axis), dtype)[:, None, None]
    inv_d = jnp.asarray(1.0 / dists[1:-1], dtype)[:, None, None]
    d_cyc = 0.5 * (w[0] + w[-1])
    return wl, inv_d, float(w[0]), float(w[-1]), float(d_cyc)


def _axis_faces(c, axis: int, grid: Grid, fbc: _bc.FieldBC,
                phi: Optional[FaceField], mode: str, t=0.0):
    """Face values ('interp') or face +axis-gradients ('sngrad') along axis."""
    cm = _mv(c, axis)
    lo_patch, hi_patch = fbc.axis(axis)
    phi_ax = None if phi is None else _mv(phi[axis], axis)
    w_lin, inv_d, d_lo, d_hi, d_cyc = _axis_geom(grid, axis, cm.dtype)

    def bval(slab, patch, lo, other, phis):
        if isinstance(patch, _bc.RegionPatchBC):
            m = jnp.asarray(patch.region.mask(grid), slab.dtype)
            return m * bval(slab, patch.inside, lo, other, phis) \
                + (1.0 - m) * bval(slab, patch.outside, lo, other, phis)
        return _boundary_face_value(slab, patch, lo, other, phis, t)

    def bgrad(slab, patch, lo, d, other, phis):
        if isinstance(patch, _bc.RegionPatchBC):
            m = jnp.asarray(patch.region.mask(grid), slab.dtype)
            return m * bgrad(slab, patch.inside, lo, d, other, phis) \
                + (1.0 - m) * bgrad(slab, patch.outside, lo, d, other, phis)
        return _boundary_sngrad(slab, patch, lo, d, other, phis, t,
                                d_cyc=d_cyc)

    if mode == "interp":
        inner = w_lin * cm[:-1] + (1.0 - w_lin) * cm[1:]
        lo = bval(cm[:1], lo_patch, True, cm[-1:],
                  None if phi_ax is None else phi_ax[:1])
        hi = bval(cm[-1:], hi_patch, False, cm[:1],
                  None if phi_ax is None else phi_ax[-1:])
    else:
        inner = (cm[1:] - cm[:-1]) * inv_d
        lo = bgrad(cm[:1], lo_patch, True, d_lo, cm[-1:],
                   None if phi_ax is None else phi_ax[:1])
        hi = bgrad(cm[-1:], hi_patch, False, d_hi, cm[:1],
                   None if phi_ax is None else phi_ax[-1:])
    return _mvback(jnp.concatenate([lo, inner, hi], axis=0), axis)


def face_interp(c, grid: Grid, fbc: _bc.FieldBC,
                phi: Optional[FaceField] = None, t=0.0) -> FaceField:
    """Linear (central) interpolation of a scalar cell field to faces."""
    return FaceField(*(_axis_faces(c, a, grid, fbc, phi, "interp", t)
                       for a in range(3)))


def sn_grad(c, grid: Grid, fbc: _bc.FieldBC,
            phi: Optional[FaceField] = None, t=0.0) -> FaceField:
    """Face-normal gradient (along +axis) of a scalar cell field."""
    return FaceField(*(_axis_faces(c, a, grid, fbc, phi, "sngrad", t)
                       for a in range(3)))


def _face_diff(fa, axis):
    """owner-neighbor difference of a face array along its axis -> cells."""
    fm = _mv(fa, axis)
    return _mvback(fm[1:] - fm[:-1], axis)


def div_flux(phi: FaceField, grid: Grid):
    """fvc::div(phi) for a face flux phi [m^3/s] -> cells [1/s]."""
    out = sum(_face_diff(phi[a], a) for a in range(3))
    return out / _const(grid.cell_volume, out)


def div_flux_field(phi: FaceField, fv: FaceField, grid: Grid):
    """fvc::div(phi, psi) given precomputed face values of psi."""
    out = sum(_face_diff(phi[a] * fv[a], a) for a in range(3))
    return out / _const(grid.cell_volume, out)


def grad(c, grid: Grid, fbc: _bc.FieldBC, phi: Optional[FaceField] = None,
         t=0.0):
    """Gauss-linear cell gradient of a scalar -> (3, nx, ny, nz)."""
    fv = face_interp(c, grid, fbc, phi, t)
    area = grid.face_area
    comps = [_face_diff(fv[a], a) * _const(area[a] / grid.cell_volume, c)
             for a in range(3)]
    return jnp.stack(comps)


def grad_vec(v, grid: Grid, vbc: _bc.FieldBC, phi: Optional[FaceField] = None,
             t=0.0):
    """Gradient of a vector field -> (3 comp, 3 deriv, nx, ny, nz).

    out[j, i] = d v_j / d x_i  (component leading to match vmap layout).
    """
    return jnp.stack([grad(v[j], grid, vbc.component(j), phi, t)
                      for j in range(3)])


def curl(v, grid: Grid, vbc: _bc.FieldBC, t=0.0):
    """fvc::curl(U) -> (3, nx, ny, nz)."""
    g = grad_vec(v, grid, vbc, t=t)  # g[j, i] = d v_j / d x_i
    return jnp.stack([
        g[2, 1] - g[1, 2],
        g[0, 2] - g[2, 0],
        g[1, 0] - g[0, 1],
    ])


def laplacian(gamma_face, c, grid: Grid, fbc: _bc.FieldBC,
              phi: Optional[FaceField] = None, t=0.0):
    """Explicit fvc::laplacian(gamma, c); gamma_face is a FaceField or scalar."""
    g = sn_grad(c, grid, fbc, phi, t)
    if not isinstance(gamma_face, FaceField):
        gamma_face = FaceField(gamma_face, gamma_face, gamma_face)
    area = grid.face_area
    out = sum(_face_diff(gamma_face[a] * g[a], a) * _const(area[a], c)
              for a in range(3))
    return out / _const(grid.cell_volume, c)


def flux_of(v, grid: Grid, vbc: _bc.FieldBC,
            phi: Optional[FaceField] = None, t=0.0) -> FaceField:
    """(interp(U) & Sf): volumetric flux of a vector field -> FaceField."""
    area = grid.face_area
    return FaceField(*(
        _axis_faces(v[a], a, grid, vbc.component(a), phi, "interp", t)
        * _const(area[a], v)
        for a in range(3)
    ))


def average_to_cells(fv: FaceField, grid: Grid,
                     fbc: Optional[_bc.FieldBC] = None):
    """fvc::average analogue: mean of a cell's face values.

    Empty patches contribute no faces (a 2D OpenFOAM mesh has no faces on
    empty patches), so both the sum and the count skip them.
    """
    total = jnp.zeros(grid.shape, fv.x.dtype)
    count = jnp.zeros(grid.shape, fv.x.dtype)
    for a in range(3):
        fm = _mv(fv[a], a)
        ones = jnp.ones_like(fm)
        if fbc is not None:
            lo_p, hi_p = fbc.axis(a)
            if lo_p.kind == _bc.EMPTY:
                fm = fm.at[:1].set(0.0)
                ones = ones.at[:1].set(0.0)
            if hi_p.kind == _bc.EMPTY:
                fm = fm.at[-1:].set(0.0)
                ones = ones.at[-1:].set(0.0)
        total = total + _mvback(0.5 * (fm[1:] + fm[:-1]), a)
        count = count + _mvback(0.5 * (ones[1:] + ones[:-1]), a)
    return total / jnp.maximum(count, 0.5)


# ---------------------------------------------------------------------------
# TVD limited convection weights (limitedLinear / limitedLinearV)
# ---------------------------------------------------------------------------


def _limited_weights_axis(c, gradc, axis, grid, fbc, phi, k):
    """Owner-side interpolation weights on the internal faces of `axis`.

    c: scalar cell field; gradc: (3,...) its Gauss gradient (or, for the V
    scheme, pass vector field + tensor gradient through `limited_weights_vec`).
    Returns full (n+1,...) face array; boundary faces get weight 1 (unused —
    boundary convection is handled by the BC coefficient path).
    """
    cm = _mv(c, axis)
    gm = _mv(gradc[axis], axis)  # d c/d x_axis at cells
    phim = _mv(phi[axis], axis)[1:-1]  # internal faces
    w_lin, inv_d, _, _, _ = _axis_geom(grid, axis, cm.dtype)

    phiP, phiN = cm[:-1], cm[1:]  # owner (lower), neighbor (upper)
    gradf = phiN - phiP
    # d is owner->neighbor = +axis * center distance; upwind by flux sign
    gradcf = jnp.where(phim > 0, gm[:-1], gm[1:]) / inv_d

    big = jnp.abs(gradcf) >= 1000.0 * jnp.abs(gradf)
    r = jnp.where(
        big,
        2.0 * 1000.0 * _sign(gradcf) * _sign(gradf) - 1.0,
        2.0 * (gradcf / jnp.where(gradf == 0.0, 1.0, gradf)) - 1.0,
    )
    limiter = jnp.clip((2.0 / k) * r, 0.0, 1.0)
    w_up = jnp.where(phim >= 0, 1.0, 0.0)
    w = limiter * w_lin + (1.0 - limiter) * w_up

    pad = jnp.ones_like(cm[:1])
    return _mvback(jnp.concatenate([pad, w, pad], axis=0), axis)


def limited_weights(c, grid: Grid, fbc: _bc.FieldBC, phi: FaceField,
                    k: float = 1.0, t=0.0) -> FaceField:
    """limitedLinear-k owner weights for fvm::div(phi, c) (scalar field)."""
    gradc = grad(c, grid, fbc, phi, t)
    return FaceField(*(_limited_weights_axis(c, gradc, a, grid, fbc, phi, k)
                       for a in range(3)))


def _limited_weights_axis_vec(v, gradv, axis, grid, phi, k):
    d = grid.spacing[axis]
    vm = jnp.stack([_mv(v[j], axis) for j in range(3)])          # (3, n, ...)
    gm = jnp.stack([_mv(gradv[j, axis], axis) for j in range(3)])  # d v_j/d x_axis
    phim = _mv(phi[axis], axis)[1:-1]

    dV = vm[:, 1:] - vm[:, :-1]                    # phiN - phiP (3, n-1, ...)
    gradf = jnp.sum(dV * dV, axis=0)               # magSqr
    dgc = d * jnp.where(phim > 0, gm[:, :-1], gm[:, 1:])
    gradcf = jnp.sum(dV * dgc, axis=0)

    big = jnp.abs(gradcf) >= 1000.0 * jnp.abs(gradf)
    r = jnp.where(
        big,
        2.0 * 1000.0 * _sign(gradcf) * _sign(gradf) - 1.0,
        2.0 * (gradcf / jnp.where(gradf == 0.0, 1.0, gradf)) - 1.0,
    )
    limiter = jnp.clip((2.0 / k) * r, 0.0, 1.0)
    w_up = jnp.where(phim >= 0, 1.0, 0.0)
    w = limiter * 0.5 + (1.0 - limiter) * w_up

    pad = jnp.ones_like(vm[0, :1])
    return _mvback(jnp.concatenate([pad, w, pad], axis=0), axis)


def limited_weights_vec(v, grid: Grid, vbc: _bc.FieldBC, phi: FaceField,
                        k: float = 1.0, t=0.0) -> FaceField:
    """limitedLinearV-k owner weights for fvm::div(phi, U) (vector field)."""
    gradv = grad_vec(v, grid, vbc, phi, t)
    return FaceField(*(_limited_weights_axis_vec(v, gradv, a, grid, phi, k)
                       for a in range(3)))


def weighted_face_value(c, w: FaceField, grid: Grid, fbc: _bc.FieldBC,
                        phi: Optional[FaceField] = None, t=0.0) -> FaceField:
    """Face values using owner weights w on internal faces, BCs on boundary."""
    lin = face_interp(c, grid, fbc, phi, t)  # supplies boundary values

    def _axis(a):
        cm = _mv(c, a)
        wm = _mv(w[a], a)[1:-1]
        inner = wm * cm[:-1] + (1.0 - wm) * cm[1:]
        lm = _mv(lin[a], a)
        return _mvback(jnp.concatenate([lm[:1], inner, lm[-1:]], axis=0), a)

    return FaceField(*(_axis(a) for a in range(3)))
