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
