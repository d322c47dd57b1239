"""Fused Pallas contact chain for the binned (K, N) neighbor table.

The binned backend's substep splits into (a) the partner row gather —
an HBM pointer-chase XLA must own — and (b) the ~120-op Hertz-history
force chain (pair_gran_hertzFix_history.cpp:109-287). In XLA, (b)
materializes a dozen (K, N) f32 intermediates through HBM; measured
on the chip that costs several ms at 131k. This kernel runs the whole
chain per (K, L)-lane tile in VMEM/registers: the gathered partner
block streams in once, forces/torques/shear stream out once, nothing
else touches HBM.

Same math as neighbor.pair_forces_binned (shared forcelaws.contact_force);
an equivalence test (tests/test_fused.py) asserts both paths agree on
TPU and in Pallas interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sedifoam_tpu.config import PairParams
from sedifoam_tpu.dem.forcelaws import contact_force
from sedifoam_tpu.dem.state import ParticleState

_LANES = 2048      # lane-block width (multiple of 128)


def _kernel(params: PairParams, dt: float, shearupdate: bool, plen,
            wspecs, own_ref, part_ref, sh_ref, wsh_ref,
            out_ref, sh_out_ref, wsh_out_ref):
    """One lane tile: own (12, L), partners (12, K, L), shear (3, K, L),
    wall shear (3, W, L).

    own rows:  x,y,z, vx,vy,vz, wx,wy,wz, rad, mass, active
    part rows: x,y,z, vx,vy,vz, wx,wy,wz, rad, mass, has
    wspecs: static tuple of (axis, wlo, whi, PairParams) plane walls.
    """
    own = own_ref[...]
    pg = part_ref[...]
    sh = sh_ref[...]

    def orow(c):
        return own[c][None, :]            # (1, L) broadcasts over K

    delta = []
    for c in range(3):
        d = orow(c) - pg[c]
        if plen[c] is not None:
            d = d - plen[c] * jnp.round(d / plen[c])
        delta.append(d)
    rsq = delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2

    radj = pg[9]
    radsum = orow(9) + radj
    touch = (pg[11] > 0.5) & (orow(11) > 0.5) & (rsq < radsum * radsum)

    rsq_safe = jnp.where(touch, rsq, 1.0)
    r = jnp.sqrt(rsq_safe)
    rinv = 1.0 / r
    rsqinv = 1.0 / rsq_safe

    vr = tuple(orow(3 + c) - pg[3 + c] for c in range(3))
    vnnr = sum(vr[c] * delta[c] for c in range(3))
    vn = tuple(delta[c] * vnnr * rsqinv for c in range(3))
    vt = tuple(vr[c] - vn[c] for c in range(3))
    wr = tuple((orow(9) * orow(6 + c) + radj * pg[6 + c]) * rinv
               for c in range(3))
    vtr = (vt[0] - (delta[2] * wr[1] - delta[1] * wr[2]),
           vt[1] - (delta[0] * wr[2] - delta[2] * wr[0]),
           vt[2] - (delta[1] * wr[0] - delta[0] * wr[1]))

    mj = pg[10]
    meff = orow(10) * mj / jnp.maximum(orow(10) + mj, 1e-30)
    overlap = radsum - r
    poly_arg = overlap * orow(9) * radj / jnp.maximum(radsum, 1e-30)

    force_pair, fs_vec, new_shear = contact_force(
        params, dt, touch, overlap, r, rinv, rsqinv, tuple(delta),
        vnnr, vtr, (sh[0], sh[1], sh[2]), meff, poly_arg, shearupdate)

    tor = (delta[1] * fs_vec[2] - delta[2] * fs_vec[1],
           delta[2] * fs_vec[0] - delta[0] * fs_vec[2],
           delta[0] * fs_vec[1] - delta[1] * fs_vec[0])
    facc = [jnp.sum(force_pair[c], axis=0) for c in range(3)]
    tacc = [-own[9] * jnp.sum(tor[c] * rinv, axis=0) for c in range(3)]

    # ---- static plane walls (fix wall/granFix), fused in ---------------
    rad1 = own[9]
    act1 = own[11] > 0.5
    wsh_new = []
    for wi, (axis, wlo, whi, wp) in enumerate(wspecs):
        del1 = own[axis] - wlo
        del2 = whi - own[axis]
        da = jnp.where(del1 < del2, del1, -del2)
        wdelta = tuple(da if c == axis else jnp.zeros_like(da)
                       for c in range(3))
        wrsq = da * da
        wtouch = act1 & (wrsq <= rad1 * rad1) & (wrsq > 0.0)
        wrsq_s = jnp.where(wtouch, wrsq, 1.0)
        wrr = jnp.sqrt(wrsq_s)
        wrinv = 1.0 / wrr
        wrsqinv = 1.0 / wrsq_s
        wvr = (own[3], own[4], own[5])
        wvnnr = wvr[axis] * da
        wvn = tuple(wdelta[c] * wvnnr * wrsqinv for c in range(3))
        wvt = tuple(wvr[c] - wvn[c] for c in range(3))
        wwr = tuple(rad1 * own[6 + c] * wrinv for c in range(3))
        wvtr = (wvt[0] - (wdelta[2] * wwr[1] - wdelta[1] * wwr[2]),
                wvt[1] - (wdelta[0] * wwr[2] - wdelta[2] * wwr[0]),
                wvt[2] - (wdelta[1] * wwr[0] - wdelta[0] * wwr[1]))
        woverlap = rad1 - wrr
        wsh = (wsh_ref[0, wi], wsh_ref[1, wi], wsh_ref[2, wi])
        f_w, wfs, wns = contact_force(
            wp, dt, wtouch, woverlap, wrr, wrinv, wrsqinv, wdelta,
            wvnnr, wvtr, wsh, own[10], woverlap * rad1, shearupdate)
        wtor = (wdelta[1] * wfs[2] - wdelta[2] * wfs[1],
                wdelta[2] * wfs[0] - wdelta[0] * wfs[2],
                wdelta[0] * wfs[1] - wdelta[1] * wfs[0])
        for c in range(3):
            facc[c] = facc[c] + f_w[c]
            tacc[c] = tacc[c] - rad1 * wtor[c] * wrinv
        wsh_new.append(jnp.stack(wns))
    if wspecs:
        wsh_out_ref[...] = jnp.stack(wsh_new, axis=1)
    else:
        wsh_out_ref[...] = wsh_ref[...]

    out_ref[...] = jnp.stack(facc + tacc)
    sh_out_ref[...] = jnp.stack(new_shear)


def chain_forces(params: PairParams, dt: float, own, part, shear, wshear,
                 wspecs=(), shearupdate: bool = True, periodic_len=None,
                 interpret: bool = False, donate: bool = True):
    """Run the fused chain. own (12, N), part (12, K, N), shear (3, K, N),
    wshear (3, W, N) — N must be a multiple of _LANES (pad with inactive
    lanes). wspecs: static ((axis, wlo, whi, PairParams), ...).
    Returns (out (6, N) force+torque rows, new_shear, new_wall_shear).

    donate=True aliases the shear inputs to their outputs (saves two
    (3,K,N) HBM buffers). CAUTION: when called at a jit boundary (or
    eagerly) this DONATES the caller's shear buffers — reusing them
    afterwards raises FailedPrecondition and can wedge the axon chip.
    The production path threads state through, so this is safe there;
    standalone/test callers should pass donate=False."""
    K, n = part.shape[1], part.shape[2]
    W = wshear.shape[1]
    assert n % _LANES == 0, n
    T = n // _LANES
    plen = tuple(periodic_len) if periodic_len is not None \
        else (None, None, None)
    kern = functools.partial(_kernel, params, dt, shearupdate, plen, wspecs)
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((12, _LANES), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, K, _LANES), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K, _LANES), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, W, _LANES), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((6, _LANES), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K, _LANES), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, W, _LANES), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((3, K, n), jnp.float32),
            jax.ShapeDtypeStruct((3, W, n), jnp.float32),
        ],
        input_output_aliases={2: 1, 3: 2} if donate else {},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(own, part, shear, wshear)


def walls_fusible(walls) -> bool:
    """Static plane walls only — wiggle/shear/cylinder walls take the
    XLA path (their trig on traced time doesn't belong in the kernel)."""
    from sedifoam_tpu.config import WALL_ZCYLINDER
    return all(w.style != WALL_ZCYLINDER and not w.wiggle
               and w.vshear == 0.0 for w in walls)


def pair_forces_binned_fused(state: ParticleState, params: PairParams,
                             dt: float, idx, shearupdate: bool = True,
                             periodic_len=None, interpret: bool = False,
                             walls=(), donate: bool = True):
    """Drop-in for neighbor.pair_forces_binned with the chain in Pallas.

    The (N, 12) partner row gather stays in XLA (it must run where the
    gather unit is); everything downstream runs in VMEM. When `walls`
    is non-empty (static plane walls, see walls_fusible) the wall pass
    fuses into the same kernel and the returned tuple carries the new
    wall shear; otherwise wall_shear is returned None and the caller
    runs the XLA wall path.
    """
    n = state.n_capacity
    x, v, w = state.pos, state.vel, state.omega
    rad, m = state.radius, state.mass
    f32 = jnp.float32

    has = idx < n
    j = jnp.clip(idx, 0, n - 1)
    packed = jnp.stack([x[:, 0], x[:, 1], x[:, 2],
                        v[:, 0], v[:, 1], v[:, 2],
                        w[:, 0], w[:, 1], w[:, 2],
                        rad, m, jnp.zeros_like(rad)], axis=-1).astype(f32)
    pg = packed[j]                                # (K, N, 12) ONE row gather
    part = jnp.moveaxis(pg, -1, 0)                # (12, K, N)
    # slot-valid flag only: deactivated partners are scrubbed out of the
    # TABLE at the delete event (neighbor.scrub_dead_partners) — a live
    # gathered activity column here measured a 3x substep cliff
    part = part.at[11].set(has.astype(f32))

    own = jnp.stack([x[:, 0], x[:, 1], x[:, 2],
                     v[:, 0], v[:, 1], v[:, 2],
                     w[:, 0], w[:, 1], w[:, 2],
                     rad, m,
                     state.active.astype(x.dtype)]).astype(f32)

    _BIG = 1e30
    wspecs = tuple((w.axis,
                    float(w.lo) if w.lo is not None else -_BIG,
                    float(w.hi) if w.hi is not None else _BIG,
                    w.params) for w in walls)

    wsh = state.wall_shear
    if wsh.shape[1] == 0:          # no walls: dummy row for block shapes
        wsh = jnp.zeros((3, 1, n), wsh.dtype)

    pad = (-n) % _LANES
    if pad:
        own = jnp.pad(own, ((0, 0), (0, pad)))
        part = jnp.pad(part, ((0, 0), (0, 0), (0, pad)))
        sh_in = jnp.pad(state.shear.astype(f32),
                        ((0, 0), (0, 0), (0, pad)))
        wsh_in = jnp.pad(wsh.astype(f32), ((0, 0), (0, 0), (0, pad)))
    else:
        sh_in = state.shear.astype(f32)
        wsh_in = wsh.astype(f32)

    out, new_shear, new_wshear = chain_forces(
        params, dt, own, part, sh_in, wsh_in, wspecs,
        shearupdate, periodic_len, interpret, donate)
    dtype = x.dtype
    force = out[0:3, :n].T.astype(dtype)
    torque = out[3:6, :n].T.astype(dtype)
    wall_shear = (new_wshear[:, :, :n].astype(state.wall_shear.dtype)
                  if wspecs else None)
    return (force, torque, new_shear[:, :, :n].astype(state.shear.dtype),
            wall_shear)
