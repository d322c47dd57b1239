"""Optional body-force subsystems (SURVEY.md C11).

- IBM relaxation zone (createIBMForce.H, UEqns.H:38-41): an indicator
  field marks cells where the fluid velocity is implicitly relaxed to
  zero with time scale ibmRelaxTime — used to emulate internal walls.
- DNS spectral forcing (createTurbulence.H:29-49, calcDNSForce.H): a
  UO-process random force in Fourier space, projected solenoidal with
  K x f / |K|, driving box turbulence.

TPU note: complex dtypes are not supported on all TPU backends, so the
spectral state is stored as a real (2, 3, nx, ny, nz) (re, im) tensor and
the inverse transform is evaluated as per-axis DFT matmuls — which for
the <=64^3 forcing grids this is used on also puts the work on the MXU
instead of a host FFT.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sedifoam_tpu.grid import Grid


class UOForcingState(NamedTuple):
    """Spectral force modes (re, im) + RNG key (carried in FluidState)."""

    f_hat: jnp.ndarray   # (2, 3, nx, ny, nz) real
    key: jnp.ndarray


def init_uo_state(grid: Grid, key=None, dtype=jnp.float32) -> UOForcingState:
    return UOForcingState(
        f_hat=jnp.zeros((2, 3) + grid.shape, dtype),
        key=key if key is not None else jax.random.PRNGKey(7),
    )


def _wavevectors(grid: Grid, dtype):
    ks = [2.0 * np.pi * np.fft.fftfreq(n, d)
          for n, d in zip(grid.shape, grid.spacing)]
    KX, KY, KZ = np.meshgrid(*ks, indexing="ij")
    return jnp.asarray(np.stack([KX, KY, KZ]), dtype)


@lru_cache(maxsize=8)
def _idft_mats(n: int):
    """Inverse-DFT matrix W[j,k] = exp(2 pi i j k / n)/n as (cos, sin).

    Cached as NUMPY: caching device arrays would leak tracers between
    jit contexts (UnexpectedTracerError on the second trace)."""
    j = np.arange(n)
    phase = 2.0 * np.pi * np.outer(j, j) / n
    return np.cos(phase) / n, np.sin(phase) / n


def _ifftn_real(re, im, grid: Grid):
    """Real part of ifftn over the 3 trailing axes, via matmul DFTs."""
    dt = re.dtype
    for axis_len, axis in ((grid.nx, 1), (grid.ny, 2), (grid.nz, 3)):
        Cn, Sn = _idft_mats(axis_len)
        C, S = jnp.asarray(Cn, dt), jnp.asarray(Sn, dt)
        # contract the spatial axis with the DFT matrix: out_j = W_jk x_k
        hi = jax.lax.Precision.HIGHEST  # avoid TPU bf16 default on f32
        re_new = (jnp.tensordot(re, C, axes=(axis, 1), precision=hi)
                  - jnp.tensordot(im, S, axes=(axis, 1), precision=hi))
        im_new = (jnp.tensordot(im, C, axes=(axis, 1), precision=hi)
                  + jnp.tensordot(re, S, axes=(axis, 1), precision=hi))
        # tensordot moves the contracted axis to the end; rotate it back
        re = jnp.moveaxis(re_new, -1, axis)
        im = jnp.moveaxis(im_new, -1, axis)
    return re


def uo_forcing_step(state: UOForcingState, grid: Grid, dt: float,
                    alpha: float, sigma: float, k_upper: float,
                    k_lower: float = 0.0):
    """Advance the UO process and return (new_state, force (3,nx,ny,nz)).

    f_hat' = (1 - alpha dt) f_hat + sigma sqrt(dt) xi, restricted to the
    [k_lower, k_upper] shell; physical force = Re(ifft(K x f_hat / |K|)).
    """
    key, sub = jax.random.split(state.key)
    dtype = state.f_hat.dtype
    xi = jax.random.normal(sub, state.f_hat.shape, dtype)
    f_hat = (1.0 - alpha * dt) * state.f_hat + sigma * jnp.sqrt(
        jnp.asarray(dt, dtype)) * xi

    K = _wavevectors(grid, dtype)
    k_mag = jnp.sqrt(jnp.sum(K * K, axis=0))
    shell = ((k_mag <= k_upper) & (k_mag >= k_lower))[None, None]
    f_hat = jnp.where(shell, f_hat, 0.0)

    # solenoidal projection: K/(|K|+eps) x f_hat  (calcDNSForce.H:31-37)
    kn = K / (k_mag + 1e-6)[None]

    def cross(f):
        return jnp.stack([
            kn[1] * f[2] - kn[2] * f[1],
            kn[2] * f[0] - kn[0] * f[2],
            kn[0] * f[1] - kn[1] * f[0],
        ])

    re = cross(f_hat[0])
    im = cross(f_hat[1])
    force = _ifftn_real(re, im, grid)
    return UOForcingState(f_hat, key), force


def ibm_relaxation_diag(indicator, relax_time: float):
    """UbEqn -= Sp(-indicator/ibmRelaxTime, Ub): implicit damping
    coefficient field for the momentum diagonal."""
    return indicator / relax_time
