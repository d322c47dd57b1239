"""Runtime services: runner, probes, diagnostics, checkpoint/resume."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.io.case import load_case
from sedifoam_tpu.runtime import checkpoint
from sedifoam_tpu.runtime.runner import Simulation
from sedifoam_tpu.solver import initialize

REF = "/root/reference/cases/auto-testing/test-cases/xiaocase3"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference cases not mounted")


def _sim():
    cfg, fluid, particles, controls = load_case(REF)
    state = initialize(fluid, particles, cfg)
    return Simulation(cfg, state,
                      probe_locations=[(2e-3, 2e-3, 2.5e-4)]), controls


def test_runner_probes_diagnostics(tmp_path):
    sim, controls = _sim()
    sim.run(10 * controls.dt, log_every=5, write_dir=str(tmp_path),
            write_interval=5 * controls.dt)
    # probes collected a p time-series
    t, p = sim.probes.series("p")
    assert len(t) == 10 and np.isfinite(p).all()
    # diagnostics logged physical quantities
    assert len(sim.log) == 2
    d = sim.log[-1]
    assert 0 <= d["alpha_max"] <= 0.7
    assert d["n_particles"] == 1
    assert d["courant"] < 1.0
    # time directories written with fields + particles + checkpoint
    tdirs = sorted(os.listdir(tmp_path))
    assert len(tdirs) == 2
    files = os.listdir(os.path.join(tmp_path, tdirs[0]))
    assert {"fields.npz", "particles.npz", "checkpoint.npz",
            "diagnostics.jsonl"} <= set(files)


def test_checkpoint_resume_bitwise(tmp_path):
    """Full-state resume (incl. contact shear history) reproduces the
    run exactly — strictly better than the reference (SURVEY.md §5.4)."""
    sim, controls = _sim()
    sim.run(5 * controls.dt)
    ckpt = str(tmp_path / "ck.npz")
    checkpoint.save(ckpt, sim.state)
    sim.run(10 * controls.dt)
    final_a = np.asarray(sim.state.particles.vel)

    sim2, _ = _sim()
    sim2.resume(ckpt)
    assert abs(sim2.t - 5 * controls.dt) < 1e-12
    sim2.run(10 * controls.dt)
    final_b = np.asarray(sim2.state.particles.vel)
    np.testing.assert_array_equal(final_a, final_b)


def test_case_level_resume_probes_bitwise(tmp_path):
    """The CASE-level resume path (VERDICT r4 #6): Simulation.
    save_checkpoint carries the probe series in a sidecar, and a FRESH
    Simulation (new load_case + initialize, as a restarted process)
    resumed from it reproduces the straight run's probe series and
    final state bitwise."""
    sim, controls = _sim()
    sim.run(10 * controls.dt, probe_every=2)
    t_a, p_a = sim.probes.series("p")
    final_a = np.asarray(sim.state.particles.vel)

    sim2, _ = _sim()
    sim2.run(4 * controls.dt, probe_every=2)
    ckpt = str(tmp_path / "case_ck.npz")
    sim2.save_checkpoint(ckpt)
    del sim2
    sim3, _ = _sim()                      # fresh session from the case dir
    sim3.resume(ckpt)
    assert len(sim3.probes.times) == 2    # series restored from sidecar
    sim3.run(10 * controls.dt, probe_every=2)
    t_b, p_b = sim3.probes.series("p")
    np.testing.assert_array_equal(t_a, t_b)
    np.testing.assert_array_equal(p_a, p_b)
    np.testing.assert_array_equal(final_a,
                                  np.asarray(sim3.state.particles.vel))


def test_timing_split():
    sim, controls = _sim()
    sim.run(2 * controls.dt)
    split = sim.timing_split(n=2)
    assert set(split) == {"fluid", "evolve", "coupling_source"}
    assert all(v > 0 for v in split.values())
