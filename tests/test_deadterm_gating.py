"""Dead-term gating is numerics-identical (commit 8161dc7).

With Cvm=0, particle_added_mass off, carrier_rho=0 and Cl=0, the
coupled step skips DDtU.H, the DDtUb gather, the Cvm RHS term, and the
mixture-curl lift pass. These tests pin the contract: the gated step
must produce BITWISE-identical physics to a step that computes the dead
terms anyway (the terms are exact zeros / unconsumed), and the gates
must stay out of the way when the switches are on.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bench import build_case
from sedifoam_tpu.fluid.step import advance_time, fluid_step
from sedifoam_tpu.solver import coupled_step, need_ddtu


@pytest.fixture(scope="module")
def small_case():
    return build_case(n_particles=64, nx=8, ny=12, nz=8, sub_steps=4,
                      backend="dense")


def test_need_ddtu_derivation(small_case):
    cfg, _ = small_case
    # bench config: Cvm=0, added-mass off, carrier_rho=0 -> dead
    assert not need_ddtu(cfg)
    assert need_ddtu(dataclasses.replace(
        cfg, fluid=dataclasses.replace(cfg.fluid, Cvm=0.5)))
    assert need_ddtu(dataclasses.replace(
        cfg, cloud=dataclasses.replace(cfg.cloud,
                                       particle_added_mass=True)))
    assert need_ddtu(dataclasses.replace(
        cfg, dem=dataclasses.replace(cfg.dem, carrier_rho=1000.0)))


def test_gated_step_bitwise_matches_ungated(small_case):
    """coupled_step (gated) vs the same step with DDtU forced on: every
    field that feeds physics must be BITWISE identical; only the DDtU
    diagnostics themselves (and the zero-by-construction dudt/lift
    carriers) may differ."""
    cfg, state = small_case
    assert not need_ddtu(cfg) and cfg.fluid.Cl == 0.0

    def step_ungated(st):
        # identical to coupled_step but with the dead terms computed
        from sedifoam_tpu.coupling import cloud as _cloud
        fluid, particles = st.fluid, st.particles
        fluid = advance_time(fluid, cfg.fluid)
        fluid = fluid_step(fluid, cfg.grid, cfg.bcs, cfg.fluid,
                           advance=False, need_ddtu=True)
        fluid, particles, ufs = _cloud.evolve(
            fluid, particles, st.uf_smoothed, cfg.grid, cfg.bcs,
            cfg.cloud, cfg.dem, cfg.fluid)
        fluid = _cloud.lift_drag_coeffs(fluid, particles, ufs, cfg.grid,
                                        cfg.bcs, cfg.cloud, cfg.fluid)
        return st._replace(fluid=fluid, particles=particles,
                           uf_smoothed=ufs,
                           uf_smoothed_old=st.uf_smoothed)

    s_gated = jax.jit(lambda s: coupled_step(s, cfg))(state)
    s_full = jax.jit(step_ungated)(state)

    skip = {"DDtUa", "DDtUb"}  # legitimately stale under the gate

    def assert_same(owner, name, a, b):
        # fields may be arrays or FaceField namedtuples of 3 different
        # shapes — compare leaf by leaf
        for i, (la, lb) in enumerate(zip(jax.tree.leaves(a),
                                         jax.tree.leaves(b))):
            np.testing.assert_array_equal(
                np.asarray(la), np.asarray(lb),
                err_msg=f"{owner}.{name}[leaf {i}] diverged under "
                        "dead-term gating")

    for name in s_gated.fluid._fields:
        if name in skip:
            continue
        assert_same("fluid", name, getattr(s_gated.fluid, name),
                    getattr(s_full.fluid, name))
    for name in s_gated.particles._fields:
        assert_same("particles", name, getattr(s_gated.particles, name),
                    getattr(s_full.particles, name))
    # the gated lift/dudt carriers are exact zeros by construction
    assert not np.asarray(s_gated.fluid.lift_coeff).any()
    assert not np.asarray(s_gated.particles.dudt).any()


def test_added_mass_config_still_gathers_dudt(small_case):
    """With added-mass on, p_dudt must be the gathered DDtUb again
    (nonzero once the material derivative is nonzero)."""
    cfg, state = small_case
    cfg_am = dataclasses.replace(
        cfg, cloud=dataclasses.replace(cfg.cloud,
                                       particle_added_mass=True))
    assert need_ddtu(cfg_am)
    s1 = jax.jit(lambda s: coupled_step(s, cfg_am))(state)
    s2 = jax.jit(lambda s: coupled_step(s, cfg_am))(s1)
    # after two steps of an accelerating inflow bed, DDtUb is nonzero
    # and so is the per-particle gather of it
    assert np.asarray(s2.fluid.DDtUb).any()
    assert np.asarray(s2.particles.dudt).any()
