"""Why expWachem_PCM runs the semi-implicit drag branch.

The reference's live scheme zeroes Omega (fully explicit drag,
enhancedCloud.C:391) and its dormant branch keeps Omega on the momentum
diagonal (:338-360). For water-particle cases the explicit gain
dt*Omega/(rhob*beta) is small and the battery runs them explicit
(xiaocase1/Mueller). For the van Wachem GAS-solid bed the density ratio
makes that gain far exceed the explicit-Euler stability bound of 2 —
quantified here — so the validated battery run uses the reference's own
semi-implicit branch. This test documents the bound and demonstrates it
biting: a short explicit run blows up while the semi-implicit one stays
bounded from identical initial state.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

CASE = "/root/reference/cases/auto-testing/test-cases/expWachem_PCM"

pytestmark = pytest.mark.skipif(not os.path.isdir(CASE),
                                reason="reference cases not mounted")


@pytest.fixture(scope="module")
def wachem():
    from sedifoam_tpu.solver import make_step_fn
    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.solver import initialize
    cfg, fluid, particles, controls = load_case(CASE, backend="binned")
    state = initialize(fluid, particles, cfg)
    # one stable (semi-implicit) step so the inlet gas is flowing:
    # SyamlalOBrien's Jd is Re-based and exactly zero at rest, so the
    # drag gain only shows once u_rel != 0
    c = dataclasses.replace(cfg, cloud=dataclasses.replace(
        cfg.cloud, semi_implicit_drag=True))
    state = make_step_fn(c)(state)
    return cfg, state


def _explicit_gain(cfg, state):
    """Max over cells of dt*Omega/(rhob*beta): the amplification rate of
    explicit drag in the Ub momentum equation (explicit Euler on
    du/dt = -k*u is unstable for dt*k > 2)."""
    from sedifoam_tpu.coupling import drag as _drag
    from sedifoam_tpu.coupling import transfer as _transfer
    ps, fl = state.particles, state.fluid
    cells = _transfer.particle_cells(ps, cfg.grid)
    p_alpha = _transfer.gather_from_grid(fl.alpha, cells)
    uf_at_p = _transfer.gather_from_grid(fl.Ub, cells)
    uri = uf_at_p - ps.vel
    mag_uri = jnp.sqrt(jnp.sum(uri * uri, axis=-1))
    d = 2.0 * ps.radius
    jd_vals = _drag.jd(cfg.cloud.drag_model, mag_uri, p_alpha, d,
                      cfg.fluid.nub, cfg.fluid.rhob)
    omega, _ = _transfer.calc_omega_asrc_semi(ps, jd_vals, cfg.grid)
    beta = jnp.maximum(1.0 - fl.alpha, 0.01)
    gain = cfg.fluid.dt * omega / (cfg.fluid.rhob * beta)
    return float(jnp.max(gain))


def test_explicit_drag_gain_exceeds_stability_bound(wachem):
    cfg, state = wachem
    gain = _explicit_gain(cfg, state)
    # the documented bound: gas-solid Wachem sits far above dt*k = 2
    assert gain > 2.0, gain
    print(f"explicit drag gain dt*Omega/(rhob*beta) = {gain:.1f}")


def test_explicit_run_diverges_semi_implicit_bounded(wachem):
    from sedifoam_tpu.solver import make_step_fn
    cfg, state = wachem
    n_steps = 10

    def umax_after(semi):
        c = dataclasses.replace(cfg, cloud=dataclasses.replace(
            cfg.cloud, semi_implicit_drag=semi))
        step = make_step_fn(c)
        s = state
        for _ in range(n_steps):
            s = step(s)
        ub = np.asarray(s.fluid.Ub)
        return np.abs(ub).max() if np.isfinite(ub).all() else np.inf

    u_semi = umax_after(True)
    u_expl = umax_after(False)
    # gas fluidization velocities are O(1) m/s; the explicit branch must
    # have amplified far beyond any physical velocity (or gone non-finite)
    assert u_semi < 10.0, u_semi
    assert u_expl > 10.0 * u_semi, (u_expl, u_semi)
