"""Matrix-free implicit FV operators (the fvm:: namespace, TPU-style).

OpenFOAM assembles sparse LDU matrices; on TPU we never materialize them.
Each implicit term contributes (diag, apply, rhs) where ``apply`` evaluates
the full volume-integrated operator on a trial field via dense stencils.
The discretized equation is  sum(apply)(x) == sum(rhs).

This gives us exactly what the reference solver needs:
- UbEqn (lammpsFoam/UEqns.H) is assembled but never solved — PISO only
  consumes A() = diag/V and H() = (rhs - (apply(x) - diag*x))/V
  (lammpsFoam/pEqn.H:1,16);
- the pressure Poisson and the diffusion-smoothing equations are solved
  with the matrix-free PCG in linsolve.py.

Sign convention: terms appear with the sign they carry on the equation LHS.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from sedifoam_tpu import bc as _bc
from sedifoam_tpu import ops
from sedifoam_tpu.grid import FaceField, Grid


@dataclasses.dataclass
class LinTerm:
    """One volume-integrated implicit term: equation LHS piece."""

    diag: jnp.ndarray                      # diagonal coefficient field
    apply: Callable[[jnp.ndarray], jnp.ndarray]  # full operator incl. diag
    rhs: jnp.ndarray                       # explicit RHS contribution

    def __add__(self, other: "LinTerm") -> "LinTerm":
        sapply, oapply = self.apply, other.apply
        return LinTerm(
            self.diag + other.diag,
            lambda x: sapply(x) + oapply(x),
            self.rhs + other.rhs,
        )

    def __sub__(self, other: "LinTerm") -> "LinTerm":
        sapply, oapply = self.apply, other.apply
        return LinTerm(
            self.diag - other.diag,
            lambda x: sapply(x) - oapply(x),
            self.rhs - other.rhs,
        )

    def __mul__(self, field):
        """Row-scaling by a cell field (volScalarField * fvMatrix)."""
        sapply = self.apply
        return LinTerm(field * self.diag, lambda x: field * sapply(x),
                       field * self.rhs)

    __rmul__ = __mul__

    def __neg__(self):
        sapply = self.apply
        return LinTerm(-self.diag, lambda x: -sapply(x), -self.rhs)

    # --- the two quantities PISO consumes -----------------------------
    def A(self, grid: Grid):
        """Diagonal per unit volume (OpenFOAM fvMatrix::A)."""
        return self.diag / ops._const(grid.cell_volume, self.diag)

    def H(self, x, grid: Grid):
        """(rhs - offdiag*x)/V (OpenFOAM fvMatrix::H)."""
        return (self.rhs - (self.apply(x) - self.diag * x)) \
            / ops._const(grid.cell_volume, x)

    def relax(self, x, alpha: float) -> "LinTerm":
        """fvMatrix::relax(alpha): D /= alpha; rhs += (D' - D) * x_current."""
        if alpha >= 1.0:
            return self
        new_diag = self.diag / alpha
        delta = new_diag - self.diag
        sapply = self.apply
        return LinTerm(new_diag, lambda v: sapply(v) + delta * v,
                       self.rhs + delta * x)

    def residual(self, x):
        return self.rhs - self.apply(x)


def zero_term(grid: Grid, dtype=jnp.float64) -> LinTerm:
    z = jnp.zeros(grid.shape, dtype)
    return LinTerm(z, lambda x: jnp.zeros_like(x), z)


def _hom_patch(p):
    if isinstance(p, _bc.RegionPatchBC):
        return _bc.RegionPatchBC(_hom_patch(p.inside), _hom_patch(p.outside),
                                 p.region)
    v = p.value
    n = v.n_comp if isinstance(v, _bc.TimeTable) else len(v)
    return _bc.PatchBC(p.kind, (0.0,) * n)


def _homogeneous(fbc: _bc.FieldBC) -> _bc.FieldBC:
    """Same BC kinds with zeroed values — the linear part of the operator."""
    return _bc.FieldBC(*(_hom_patch(fbc.patch(p)) for p in _bc.PATCHES))


# ---------------------------------------------------------------------------
# fvm::ddt
# ---------------------------------------------------------------------------


def ddt(field_old, dt: float, grid: Grid, coeff=None, coeff_old=None) -> LinTerm:
    """fvm::ddt(c) or fvm::ddt(coeff, c) with Euler scheme.

    diag = V*coeff/dt; rhs = V*coeff_old/dt*c_old (old coeff with old field,
    matching OpenFOAM EulerDdtScheme::fvmDdt).
    """
    V = ops._const(grid.cell_volume, field_old)
    if coeff is None:
        coeff = jnp.ones(grid.shape, field_old.dtype)
        coeff_old = coeff
    if coeff_old is None:
        coeff_old = coeff
    diag = V / dt * coeff
    rhs = V / dt * coeff_old * field_old
    return LinTerm(diag, lambda x: diag * x, rhs)


# ---------------------------------------------------------------------------
# fvm::Sp  (implicit source)
# ---------------------------------------------------------------------------


def Sp(s, grid: Grid) -> LinTerm:
    """fvm::Sp(s, c): appears on LHS as +s*V*c."""
    V = ops._const(grid.cell_volume, s)
    diag = s * V
    return LinTerm(diag, lambda x: diag * x, jnp.zeros(grid.shape, diag.dtype))


def source(src, grid: Grid) -> LinTerm:
    """Explicit source on the RHS (volume-integrated): ... == src."""
    V = ops._const(grid.cell_volume, src)
    z = jnp.zeros(grid.shape, src.dtype)
    return LinTerm(z, lambda x: jnp.zeros_like(x), src * V)


# ---------------------------------------------------------------------------
# fvm::div(phi, c)
# ---------------------------------------------------------------------------


def _bc_conv_coeffs(patch: _bc.PatchBC, lo: bool, phi_slab, dtype, t=0.0):
    """(internal_coeff, boundary_value) for a convected boundary face."""
    k = patch.kind
    zero = jnp.zeros_like(phi_slab)
    one = jnp.ones_like(phi_slab)
    if k == _bc.FIXED_VALUE:
        return zero, zero + patch.value_at(t)
    if k in (_bc.ZERO_GRADIENT, _bc.SLIP):
        return one, zero
    if k == _bc.EMPTY:
        return zero, zero
    if k == _bc.INLET_OUTLET:
        outflow = (phi_slab < 0) if lo else (phi_slab > 0)
        ic = jnp.where(outflow, 1.0, 0.0)
        bv = jnp.where(outflow, 0.0, patch.value_at(t))
        return ic, bv
    if k == _bc.CYCLIC:
        # handled as an internal (wrapping) face in div(); marker only
        return None, None
    raise ValueError(f"unknown BC kind {k}")


def _conv_coeffs(patch, lo: bool, phi_slab, grid, dtype, t=0.0):
    """_bc_conv_coeffs with RegionPatchBC blending (mask over the face)."""
    if isinstance(patch, _bc.RegionPatchBC):
        m = jnp.asarray(patch.region.mask(grid), dtype)
        ic_i, bv_i = _conv_coeffs(patch.inside, lo, phi_slab, grid, dtype, t)
        ic_o, bv_o = _conv_coeffs(patch.outside, lo, phi_slab, grid, dtype, t)
        return (m * ic_i + (1.0 - m) * ic_o,
                m * bv_i + (1.0 - m) * bv_o)
    return _bc_conv_coeffs(patch, lo, phi_slab, dtype, t)


def div(phi: FaceField, field, grid: Grid, fbc: _bc.FieldBC,
        weights: Optional[FaceField] = None, t=0.0) -> LinTerm:
    """fvm::div(phi, c) with owner-side face weights (from ops.limited_weights
    or 0.5 for pure linear). Cyclic patches are wrap-around internal faces
    with central weighting.
    """
    if weights is None:
        weights = FaceField(*(jnp.full_like(phi[a], 0.5) for a in range(3)))

    def apply_fn(x):
        out = jnp.zeros_like(x)
        for a in range(3):
            pm = ops._mv(phi[a], a)
            wm = ops._mv(weights[a], a)
            xm = ops._mv(x, a)
            lo_p, hi_p = fbc.axis(a)
            # internal faces
            fval = wm[1:-1] * xm[:-1] + (1.0 - wm[1:-1]) * xm[1:]
            Fint = pm[1:-1] * fval
            if lo_p.kind == _bc.CYCLIC:
                wrapval = 0.5 * (xm[-1:] + xm[:1])
                Flo = pm[:1] * wrapval
                Fhi = pm[-1:] * wrapval
            else:
                # linear part only: boundary-value contributions live in rhs
                ic_lo, _ = _conv_coeffs(lo_p, True, pm[:1], grid, x.dtype, t)
                ic_hi, _ = _conv_coeffs(hi_p, False, pm[-1:], grid, x.dtype, t)
                Flo = pm[:1] * ic_lo * xm[:1]
                Fhi = pm[-1:] * ic_hi * xm[-1:]
            F = jnp.concatenate([Flo, Fint, Fhi], axis=0)
            out = out + ops._mvback(F[1:] - F[:-1], a)
        return out

    # diagonal: contribution of x_j to its own cells' divergence
    diag = jnp.zeros(grid.shape, phi.x.dtype)
    rhs = jnp.zeros(grid.shape, phi.x.dtype)
    for a in range(3):
        pm = ops._mv(phi[a], a)
        wm = ops._mv(weights[a], a)
        dm = jnp.zeros_like(ops._mv(diag, a))
        rm = jnp.zeros_like(dm)
        # internal faces: owner j gets +phi*w (its hi face), neighbor j+1
        # gets -phi*(1-w) (its lo face)
        dm = dm.at[:-1].add(pm[1:-1] * wm[1:-1])
        dm = dm.at[1:].add(-pm[1:-1] * (1.0 - wm[1:-1]))
        lo_p, hi_p = fbc.axis(a)
        if lo_p.kind == _bc.CYCLIC:
            # wrap face value 0.5*(x_first + x_last); lo face of cell 0
            # contributes -phi_lo*0.5*x_0 to cell 0 diag (x_last part offdiag)
            dm = dm.at[:1].add(-pm[:1] * 0.5)
            dm = dm.at[-1:].add(pm[-1:] * 0.5)
        else:
            ic_lo, bv_lo = _conv_coeffs(lo_p, True, pm[:1], grid, diag.dtype, t)
            ic_hi, bv_hi = _conv_coeffs(hi_p, False, pm[-1:], grid,
                                        diag.dtype, t)
            dm = dm.at[:1].add(-pm[:1] * ic_lo)
            dm = dm.at[-1:].add(pm[-1:] * ic_hi)
            rm = rm.at[:1].add(pm[:1] * bv_lo)
            rm = rm.at[-1:].add(-pm[-1:] * bv_hi)
        diag = diag + ops._mvback(dm, a)
        rhs = rhs + ops._mvback(rm, a)

    return LinTerm(diag, apply_fn, rhs)


# ---------------------------------------------------------------------------
# fvm::laplacian(gamma, c)
# ---------------------------------------------------------------------------


def laplacian(gamma_face, grid: Grid, fbc: _bc.FieldBC,
              phi: Optional[FaceField] = None,
              dtype=None, t=0.0) -> LinTerm:
    """fvm::laplacian(gamma, c): LHS apply(x) = sum_f gamma_f A_f snGrad(x).

    gamma_face: FaceField or scalar diffusion coefficient.
    phi: flux for inletOutlet BC switching (rarely needed for laplacians).
    """
    if isinstance(gamma_face, FaceField):
        dtype = dtype or gamma_face.x.dtype
    else:
        dtype = dtype or jnp.result_type(gamma_face, float)
        g = gamma_face
        gamma_face = FaceField(
            jnp.full((grid.nx + 1, grid.ny, grid.nz), g, dtype),
            jnp.full((grid.nx, grid.ny + 1, grid.nz), g, dtype),
            jnp.full((grid.nx, grid.ny, grid.nz + 1), g, dtype),
        )
    import numpy as np
    area = grid.face_area
    hom = _homogeneous(fbc)

    def apply_fn(x):
        g = ops.sn_grad(x, grid, hom, phi)
        out = jnp.zeros_like(x)
        for a in range(3):
            F = gamma_face[a] * g[a] * ops._const(area[a], x)
            Fm = ops._mv(F, a)
            out = out + ops._mvback(Fm[1:] - Fm[:-1], a)
        return out

    diag = jnp.zeros(grid.shape, dtype)
    rhs = jnp.zeros(grid.shape, dtype)
    for a in range(3):
        gm = ops._mv(gamma_face[a], a)
        if grid.uniform:
            area_m = area[a]
            d = grid.spacing[a]
            inv_int = 1.0 / d
            inv_lo = inv_hi = 2.0 / d   # boundary delta = d/2
            inv_cyc = 1.0 / d
        else:
            area_m = jnp.asarray(np.moveaxis(area[a], a, 0), dtype)
            dists = grid.axis_dists(a)
            inv_int = jnp.asarray((1.0 / dists[1:-1]).reshape(-1, 1, 1),
                                  dtype)
            inv_lo = 1.0 / dists[0]
            inv_hi = 1.0 / dists[-1]
            w = grid.axis_widths(a)
            inv_cyc = 1.0 / (0.5 * (w[0] + w[-1]))
        coef_int = gm[1:-1] * area_m * inv_int
        dm = jnp.zeros_like(ops._mv(diag, a))
        rm = jnp.zeros_like(dm)
        dm = dm.at[:-1].add(-coef_int)
        dm = dm.at[1:].add(-coef_int)
        lo_p, hi_p = fbc.axis(a)

        def _bnd(patch, is_lo, gslab, inv_b, idx):
            """(diag_add, rhs_add) slabs for one boundary patch."""
            zero = jnp.zeros_like(gslab * area_m)
            if isinstance(patch, _bc.RegionPatchBC):
                m = jnp.asarray(patch.region.mask(grid), dtype)
                di, ri = _bnd(patch.inside, is_lo, gslab, inv_b, idx)
                do, ro = _bnd(patch.outside, is_lo, gslab, inv_b, idx)
                return (m * di + (1.0 - m) * do,
                        m * ri + (1.0 - m) * ro)
            if patch.kind == _bc.FIXED_VALUE:
                c = gslab * area_m * inv_b
                return -c, -c * patch.value_at(t)
            if patch.kind == _bc.CYCLIC:
                return -(gslab * area_m * inv_cyc), zero
            if patch.kind == _bc.INLET_OUTLET and phi is not None:
                pslab = ops._mv(phi[a], a)[idx]
                outflow = (pslab < 0) if is_lo else (pslab > 0)
                c = jnp.where(outflow, 0.0, gslab * area_m * inv_b)
                return -c, -c * patch.value_at(t)
            # zeroGradient/empty/slip (and inletOutlet w/o flux context):
            # zero flux, nothing to add
            return zero, zero

        for is_lo, patch, gslab, inv_b in ((True, lo_p, gm[:1], inv_lo),
                                           (False, hi_p, gm[-1:], inv_hi)):
            idx = slice(0, 1) if is_lo else slice(-1, None)
            d_add, r_add = _bnd(patch, is_lo, gslab, inv_b, idx)
            dm = dm.at[idx].add(d_add)
            rm = rm.at[idx].add(r_add)
        diag = diag + ops._mvback(dm, a)
        rhs = rhs + ops._mvback(rm, a)

    # equation convention: apply(x) == rhs; the boundary-value pieces were
    # accumulated with the sign they need on the RHS already.
    return LinTerm(diag, apply_fn, rhs)


def laplacian_flux(gamma_face, x, grid: Grid, fbc: _bc.FieldBC,
                   phi: Optional[FaceField] = None, t=0.0) -> FaceField:
    """fvMatrix::flux() of a laplacian matrix: gamma_f A_f snGrad(x) per face."""
    g = ops.sn_grad(x, grid, fbc, phi, t)
    if not isinstance(gamma_face, FaceField):
        gamma_face = FaceField(gamma_face, gamma_face, gamma_face)
    area = grid.face_area
    return FaceField(*(gamma_face[a] * g[a] * ops._const(area[a], g[a])
                       for a in range(3)))
