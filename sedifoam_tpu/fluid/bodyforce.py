"""Optional body-force subsystems (SURVEY.md C11).

- IBM relaxation zone (createIBMForce.H, UEqns.H:38-41): an indicator
  field marks cells where the fluid velocity is implicitly relaxed to
  zero with time scale ibmRelaxTime — used to emulate internal walls.
- DNS spectral forcing (createTurbulence.H:29-49, calcDNSForce.H): a
  UO-process random force in Fourier space, projected solenoidal with
  K x f / |K|, driving box turbulence. TPU-native via jnp.fft (batched
  3D FFTs run on the MXU-adjacent transpose units).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sedifoam_tpu.grid import Grid


class UOForcingState(NamedTuple):
    """Complex spectral force modes + RNG key (carried in SimState)."""

    f_hat: jnp.ndarray   # (3, nx, ny, nz) complex
    key: jnp.ndarray


def init_uo_state(grid: Grid, key=None, dtype=jnp.complex64) -> UOForcingState:
    return UOForcingState(
        f_hat=jnp.zeros((3,) + grid.shape, dtype),
        key=key if key is not None else jax.random.PRNGKey(7),
    )


def _wavevectors(grid: Grid, dtype):
    ks = [2.0 * jnp.pi * jnp.fft.fftfreq(n, d).astype(dtype)
          for n, d in zip(grid.shape, grid.spacing)]
    KX, KY, KZ = jnp.meshgrid(*ks, indexing="ij")
    return jnp.stack([KX, KY, KZ])


def uo_forcing_step(state: UOForcingState, grid: Grid, dt: float,
                    alpha: float, sigma: float, k_upper: float,
                    k_lower: float = 0.0):
    """Advance the UO process and return (new_state, force (3,nx,ny,nz)).

    f_hat' = (1 - alpha dt) f_hat + sigma sqrt(dt) xi, restricted to the
    [k_lower, k_upper] shell; physical force = Re(ifft(K x f_hat / |K|)).
    """
    key, sub = jax.random.split(state.key)
    shape = (3,) + grid.shape
    real_dtype = jnp.float32 if state.f_hat.dtype == jnp.complex64 \
        else jnp.float64
    xi = (jax.random.normal(sub, shape, real_dtype)
          + 1j * jax.random.normal(jax.random.fold_in(sub, 1), shape,
                                   real_dtype))
    f_hat = (1.0 - alpha * dt) * state.f_hat + sigma * jnp.sqrt(dt) * xi

    K = _wavevectors(grid, real_dtype)
    k_mag = jnp.sqrt(jnp.sum(K * K, axis=0))
    shell = ((k_mag <= k_upper) & (k_mag >= k_lower))[None]
    f_hat = jnp.where(shell, f_hat, 0.0)

    # solenoidal projection: K/(|K|+eps) x f_hat  (calcDNSForce.H:31-37)
    kn = K / (k_mag + 1e-6)[None]
    cross = jnp.stack([
        kn[1] * f_hat[2] - kn[2] * f_hat[1],
        kn[2] * f_hat[0] - kn[0] * f_hat[2],
        kn[0] * f_hat[1] - kn[1] * f_hat[0],
    ])
    force = jnp.real(jnp.fft.ifftn(cross, axes=(1, 2, 3)))
    return UOForcingState(f_hat, key), force


def ibm_relaxation_diag(indicator, relax_time: float):
    """UbEqn -= Sp(-indicator/ibmRelaxTime, Ub): implicit damping
    coefficient field for the momentum diagonal."""
    return indicator / relax_time
