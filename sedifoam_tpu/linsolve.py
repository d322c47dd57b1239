"""Matrix-free preconditioned linear solvers (jit-safe, fixed shapes).

TPU-native replacement for OpenFOAM's PCG/PBiCG (used for the pressure
Poisson at tol 1e-10 and the diffusion-smoothing solves — see
cases/auto-testing/test-cases/xiaocase3/system/fvSolution).  Convergence
uses OpenFOAM's residual normalisation so tolerance-based termination gives
comparable answers:

    normFactor = sum(|A x - A xRef| + |b - A xRef|),  xRef = mean(x) * ones

Jacobi (diagonal) preconditioning instead of DIC/DILU: more iterations,
but each iteration is a fused dense stencil sweep — the right trade on TPU
where sequential triangular solves would serialize the vector units.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_SMALL = 1e-300  # solverPerformance::small_ analogue (f64)


class SolveResult(NamedTuple):
    x: jnp.ndarray
    initial_residual: jnp.ndarray
    final_residual: jnp.ndarray
    n_iterations: jnp.ndarray


def norm_factor(apply_fn: Callable, x, b):
    """OpenFOAM lduMatrix::normFactor."""
    xref = jnp.mean(x)
    Aref = apply_fn(jnp.full_like(x, xref))
    Ax = apply_fn(x)
    return jnp.sum(jnp.abs(Ax - Aref) + jnp.abs(b - Aref)) + _SMALL


def _dtype_tol_floor(dtype) -> float:
    """Smallest meaningful normalized residual for a dtype (~50 eps)."""
    return float(50 * jnp.finfo(dtype).eps)


def _safe_ratio(num, den):
    """num/den with a hard guard against denominators that would overflow
    or NaN the ratio at round-off stagnation. The guard must be scaled to
    the dtype: a fixed 1e-290 cutoff lets f32 denormals (>=1.4e-45)
    through, and num/denormal -> inf -> NaN downstream (seen in f32
    kEqn/epsilon solves whose RHS sits at the 1e-15 scale)."""
    fi = jnp.finfo(jnp.result_type(den))
    bad = jnp.abs(den) < jnp.abs(num) * (4.0 / fi.max) + fi.tiny
    return jnp.where(bad, 0.0, num / jnp.where(bad, 1.0, den))


def pcg(apply_fn: Callable, b, x0, diag, tol: float = 1e-10,
        rel_tol: float = 0.0, max_iter: int = 1000,
        precond: Callable = None) -> SolveResult:
    """Preconditioned conjugate gradient with Jacobi preconditioner.

    apply_fn must be LINEAR and symmetric (positive or negative) definite
    in the flattened cell space. Operates on fields of any shape.

    OpenFOAM-style normalized tolerances can be unreachable in f64 when the
    RHS is nearly zero (the true residual hits the round-off floor first);
    a stagnation detector stops the loop once the residual stops improving,
    which both matches the achievable answer and avoids burning max_iter.
    The tolerance is also floored at the dtype's round-off scale (the
    f32 fast path would otherwise stall-loop on every f64-era tolerance
    like the cases' 1e-10).
    """
    tol = max(tol, _dtype_tol_floor(x0.dtype))
    inv_diag = 1.0 / jnp.where(diag == 0.0, 1.0, diag)
    if precond is None:
        precond = lambda r: inv_diag * r  # noqa: E731 (Jacobi default)

    nf = norm_factor(apply_fn, x0, b)
    r0 = b - apply_fn(x0)
    res0 = jnp.sum(jnp.abs(r0)) / nf

    def cond(state):
        x, r, p, rz, it, res, best, stall = state
        not_conv = (res > tol) & (res > rel_tol * res0)
        return not_conv & (it < max_iter) & (stall < 8) & jnp.isfinite(res)

    def body(state):
        x, r, p, rz_old, it, _, best, stall = state
        z = precond(r)
        rz = jnp.sum(r * z)
        beta = jnp.where(it == 0, 0.0, _safe_ratio(rz, rz_old))
        p = z + beta * p
        Ap = apply_fn(p)
        pAp = jnp.sum(p * Ap)
        alpha = _safe_ratio(rz, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        res = jnp.sum(jnp.abs(r)) / nf
        improved = res < 0.999 * best
        stall = jnp.where(improved, 0, stall + 1)
        best = jnp.minimum(best, res)
        return (x, r, p, rz, it + 1, res, best, stall)

    init = (x0, r0, jnp.zeros_like(x0), jnp.array(1.0, x0.dtype),
            jnp.array(0, jnp.int32), res0, res0, jnp.array(0, jnp.int32))
    x, r, p, rz, it, res, best, stall = jax.lax.while_loop(cond, body, init)
    return SolveResult(x, res0, res, it)


def pcg_multi(apply_fn: Callable, b, x0, diag, tol: float = 1e-10,
              rel_tol: float = 0.0, max_iter: int = 1000) -> SolveResult:
    """PCG for a batch of systems sharing one SPD operator.

    b, x0: (B, ...) with the batch axis leading; apply_fn acts on a single
    (...)-shaped field (it is vmapped here). One while_loop drives all B
    systems with per-system step sizes — B times fewer sequential solves
    (used for the 3-component diffusion-smoothing solves).
    """
    tol = max(tol, _dtype_tol_floor(x0.dtype))
    inv_diag = 1.0 / jnp.where(diag == 0.0, 1.0, diag)
    vapply = jax.vmap(apply_fn)
    axes = tuple(range(1, x0.ndim))

    def dot(a, c):
        return jnp.sum(a * c, axis=axes)

    nf = jnp.stack([norm_factor(apply_fn, x0[i], b[i])
                    for i in range(x0.shape[0])])
    r0 = b - vapply(x0)
    res0 = jnp.sum(jnp.abs(r0), axis=axes) / nf

    def cond(state):
        x, r, p, rz, it, res, best, stall = state
        not_conv = jnp.any((res > tol) & (res > rel_tol * res0))
        return not_conv & (it < max_iter) & (stall < 10) & \
            jnp.all(jnp.isfinite(res))

    def body(state):
        x, r, p, rz_old, it, _, best, stall = state
        z = inv_diag[None] * r
        rz = dot(r, z)
        beta = jnp.where(it == 0, 0.0, _safe_ratio(rz, rz_old))
        p = z + beta.reshape((-1,) + (1,) * (x0.ndim - 1)) * p
        Ap = vapply(p)
        alpha = _safe_ratio(rz, dot(p, Ap))
        al = alpha.reshape((-1,) + (1,) * (x0.ndim - 1))
        x = x + al * p
        r = r - al * Ap
        res = jnp.sum(jnp.abs(r), axis=axes) / nf
        worst = jnp.max(res)
        improved = worst < 0.999 * best
        stall = jnp.where(improved, 0, stall + 1)
        best = jnp.minimum(best, worst)
        return (x, r, p, rz, it + 1, res, best, stall)

    init = (x0, r0, jnp.zeros_like(x0), jnp.ones_like(res0),
            jnp.array(0, jnp.int32), res0, jnp.max(res0),
            jnp.array(0, jnp.int32))
    x, r, p, rz, it, res, best, stall = jax.lax.while_loop(cond, body, init)
    return SolveResult(x, res0, res, it)


def bicgstab(apply_fn: Callable, b, x0, diag, tol: float = 1e-10,
             rel_tol: float = 0.0, max_iter: int = 1000) -> SolveResult:
    """Jacobi-preconditioned BiCGStab for nonsymmetric operators
    (convection-diffusion: the k/epsilon transport equations)."""
    tol = max(tol, _dtype_tol_floor(x0.dtype))
    inv_diag = 1.0 / jnp.where(diag == 0.0, 1.0, diag)

    def prec_apply(v):
        return apply_fn(inv_diag * v)

    # right preconditioning: solve A M^-1 y = b, x = M^-1 y
    nf = norm_factor(apply_fn, x0, b)
    y0 = diag * x0
    r0 = b - prec_apply(y0)
    rhat = r0
    res0 = jnp.sum(jnp.abs(r0)) / nf

    def cond(state):
        y, r, p, v, rho, alpha, omega, it, res, best, stall = state
        not_conv = (res > tol) & (res > rel_tol * res0)
        return not_conv & (it < max_iter) & (stall < 10) & jnp.isfinite(res)

    def body(state):
        y, r, p, v, rho_old, alpha, omega, it, _, best, stall = state
        rho = jnp.sum(rhat * r)
        beta = _safe_ratio(rho, rho_old) * _safe_ratio(alpha, omega)
        beta = jnp.where(it == 0, 0.0, beta)
        p = r + beta * (p - omega * v)
        v = prec_apply(p)
        alpha = _safe_ratio(rho, jnp.sum(rhat * v))
        s = r - alpha * v
        t = prec_apply(s)
        omega = _safe_ratio(jnp.sum(t * s), jnp.sum(t * t))
        y = y + alpha * p + omega * s
        r = s - omega * t
        res = jnp.sum(jnp.abs(r)) / nf
        improved = res < 0.999 * best
        stall = jnp.where(improved, 0, stall + 1)
        best = jnp.minimum(best, res)
        return (y, r, p, v, rho, alpha, omega, it + 1, res, best, stall)

    one = jnp.array(1.0, x0.dtype)
    init = (y0, r0, jnp.zeros_like(x0), jnp.zeros_like(x0),
            one, one, one, jnp.array(0, jnp.int32), res0, res0,
            jnp.array(0, jnp.int32))
    y, r, p, v, rho, alpha, omega, it, res, best, stall = jax.lax.while_loop(
        cond, body, init)
    return SolveResult(inv_diag * y, res0, res, it)
