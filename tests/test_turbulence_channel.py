"""kEpsilon validation with teeth: fully-developed turbulent channel.

Re_tau = 590 channel driven by a constant pressure gradient dp/dx =
u_tau^2/h. Steady high-Re kEpsilon with wall functions must reproduce
(a) the wall-law velocity profile in the log region and (b) the bulk
velocity of Moser, Kim & Mansour (1999) DNS (U_b+ ~ 17.5) within
engineering-model accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.config import (ChannelForcing, FluidConfig, PISOConfig,
                                 TurbulenceConfig)
from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
from sedifoam_tpu.fluid.step import fluid_step
from sedifoam_tpu.grid import Grid

RE_TAU = 590.0
H = 1.0          # half height; channel height 2
NU = 1.0 / RE_TAU  # u_tau = 1


@pytest.mark.slow
def test_keps_channel_loglaw():
    ny = 20
    grid = Grid(nx=3, ny=ny, nz=1, dx=1.0, dy=2.0 * H / ny, dz=1.0)

    cyc = _bc.PatchBC(_bc.CYCLIC)
    cyc3 = _bc.PatchBC(_bc.CYCLIC, (0.0, 0.0, 0.0))
    emp = _bc.PatchBC(_bc.EMPTY)
    emp3 = _bc.PatchBC(_bc.EMPTY, (0.0, 0.0, 0.0))
    noslip = _bc.PatchBC(_bc.FIXED_VALUE, (0.0, 0.0, 0.0))
    zg = _bc.PatchBC(_bc.ZERO_GRADIENT)
    bcs = FluidBCs(
        alpha=_bc.FieldBC(cyc, cyc, zg, zg, emp, emp),
        p=_bc.FieldBC(cyc, cyc, zg, zg, emp, emp),
        Ub=_bc.FieldBC(cyc3, cyc3, noslip, noslip, emp3, emp3),
        Ua=_bc.FieldBC(cyc3, cyc3, zg, zg, emp3, emp3))

    cfg = FluidConfig(
        dt=0.05, rhob=1.0, nub=NU,
        piso=PISOConfig(n_correctors=1, p_tol=1e-8, p_max_iter=300),
        forcing=ChannelForcing(mode="gradPbar",
                               flow_direction=(1.0, 0.0, 0.0),
                               grad_pbar=1.0 / H),  # u_tau = 1
        turbulence=TurbulenceConfig(model="kEpsilon"))

    fs = init_fluid(grid, Ub=jnp.zeros((3, 3, ny, 1),
                                       jnp.float64).at[0].set(15.0))
    fs = fs._replace(grad_p_value=jnp.asarray(1.0 / H, jnp.float64),
                     k=jnp.full(grid.shape, 0.5, jnp.float64),
                     epsilon=jnp.full(grid.shape, 0.5, jnp.float64),
                     nut=jnp.full(grid.shape, 50.0 * NU, jnp.float64))

    step = jax.jit(lambda f: fluid_step(f, grid, bcs, cfg))
    for _ in range(1200):
        fs = step(fs)

    u = np.asarray(fs.Ub[0][1, :, 0])       # U+ since u_tau = 1
    y = np.asarray(grid.axis_centers(1))
    yp = np.minimum(y, 2.0 * H - y) * RE_TAU  # y+

    assert bool(np.isfinite(u).all())
    # (a) log-law in the log region (y+ > 30, y/h < 0.5):
    # U+ = ln(y+)/kappa + B, B ~ 5.2
    log_r = (yp > 30) & (np.minimum(y, 2 * H - y) < 0.5 * H)
    u_log = np.log(yp[log_r]) / 0.41 + 5.2
    rel = np.abs(u[log_r] - u_log) / u_log
    assert rel.max() < 0.10, (u[log_r], u_log)

    # (b) bulk velocity vs DNS (Moser et al. 1999: U_b+ = 17.54)
    ub = u.mean()
    assert abs(ub / 17.54 - 1.0) < 0.10, ub

    # (c) momentum balance: total shear stress at the wall supports the
    # imposed gradient -> u_tau == 1 (nut_w * dU/dy at the wall cell)
    # implied by (a)+(b); sanity: centerline faster than log-region edge
    assert u[ny // 2] > u[2]
