"""Development-testing cases (cases/development-testing/): exercise the
particle injection/deletion options end-to-end through the case reader
(the reference's addDeleteParticles case drives C14's add/delete)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.io.case import load_case
from sedifoam_tpu.solver import initialize, make_step_fn

DEV = "/root/reference/cases/development-testing"

pytestmark = pytest.mark.skipif(not os.path.isdir(DEV),
                                reason="reference cases not mounted")


@pytest.mark.slow
def test_add_delete_particles_case():
    case = os.path.join(DEV, "addDeleteParticles")
    # capacity headroom so injections have slots to activate
    cfg, fluid, particles, controls = load_case(case, capacity=4096,
                                                backend="binned")
    assert cfg.cloud.add_particle == 1
    assert cfg.cloud.delete_particle == 1
    assert cfg.cloud.add_interval == 0.04
    assert cfg.cloud.add_info[0] == 0.005

    state = initialize(fluid, particles, cfg)
    n0 = int(state.particles.active.sum())
    step = make_step_fn(cfg)
    # run past one injection interval
    n_steps = int(cfg.cloud.add_interval / cfg.fluid.dt) + 3
    for _ in range(n_steps):
        state = step(state)
    n1 = int(state.particles.active.sum())
    assert n1 > n0, "injection region should have added particles"
    assert bool(jnp.isfinite(state.particles.vel).all())
    # injected tags continue beyond the initial population
    assert int(state.particles.tag.max()) > n0


@pytest.mark.slow
def test_wachem_semi_implicit_drag_stable():
    """expWachem_PCM (17,562-particle gas bed, no smoothing) requires the
    semi-implicit drag: the explicit coupling gain dt*omg/(rho_b*beta) > 1
    diverges (in the reference too — its semiImplicit branch is dormant);
    with Omega on the momentum diagonal the bed is stable."""
    import dataclasses
    case = os.path.join(os.path.dirname(DEV), "auto-testing", "test-cases",
                        "expWachem_PCM")
    if not os.path.isdir(case):
        pytest.skip("case missing")
    cfg, fluid, particles, controls = load_case(case, backend="binned")
    cfg = dataclasses.replace(cfg, cloud=dataclasses.replace(
        cfg.cloud, semi_implicit_drag=True))
    state = initialize(fluid, particles, cfg)
    step = make_step_fn(cfg)
    # the explicit scheme diverges by step ~8 (gain ~6/step); a handful of
    # stable steps demonstrates the implicit diagonal works
    for _ in range(8):
        state = step(state)
    assert int(state.particles.active.sum()) == 17562
    assert bool(jnp.isfinite(state.fluid.Ub).all())
    assert float(jnp.abs(state.fluid.Ub).max()) < 10.0
