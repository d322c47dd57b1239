"""Golden test: multiParticlesCollideDia — settling + collision of
unequal-diameter particles (drafting/kissing/tumbling style).

Reference: cases/auto-testing/test-cases/multiParticlesCollideDia — four
sand particles (2.0-3.5 mm, 2650 kg/m^3) settle in water in a 0.2 x 0.1 m
quasi-2D tank; per-particle position/velocity traces are validated
against data/origin/p*.dat (particlePosition.py / particleVelocity.py).
"""

import os

import numpy as np
import pytest

from sedifoam_tpu.io.case import load_case
from sedifoam_tpu.solver import initialize, make_step_fn

REF_BASE = "/root/reference/cases/auto-testing/test-cases"
DATA_BASE = os.path.join(os.path.dirname(__file__), "golden_data")

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_BASE),
                                reason="reference cases not mounted")


@pytest.mark.slow
@pytest.mark.parametrize("case", ["multiParticlesCollideDia",
                                  "multiParticlesCollideRho"])
def test_collide_trajectories(case):
    REF = os.path.join(REF_BASE, case)
    DATA = os.path.join(DATA_BASE, case)
    cfg, fluid, particles, controls = load_case(REF)
    state = initialize(fluid, particles, cfg)
    step = make_step_fn(cfg)

    # dump cadence: every 0.01 s (in.lammps dump 1000 x dt 1e-5)
    n_steps = int(round(controls.end_time / controls.dt))       # 200
    frames_pos = []
    frames_vel = []
    times = []
    frames_pos.append(np.asarray(state.particles.pos).copy())
    frames_vel.append(np.asarray(state.particles.vel).copy())
    times.append(0.0)
    per_frame = int(round(0.01 / controls.dt))                  # 10
    for i in range(n_steps):
        state = step(state)
        if (i + 1) % per_frame == 0:
            frames_pos.append(np.asarray(state.particles.pos).copy())
            frames_vel.append(np.asarray(state.particles.vel).copy())
            times.append((i + 1) * controls.dt)

    pos = np.stack(frames_pos)   # (T, 4, 3)
    vel = np.stack(frames_vel)

    for pi in range(4):
        bench = np.loadtxt(os.path.join(DATA, f"p{pi + 1}.dat"))
        nt = min(len(bench), len(pos))
        # columns: id type d m x y z vx vy vz
        y_b = bench[:nt, 5]
        vy_b = bench[:nt, 8]
        y = pos[:nt, pi, 1]
        vy = vel[:nt, pi, 1]
        # settling trajectories within 4 mm over the 0.1 m tank and
        # velocities within 0.03 m/s of the benchmark traces
        assert np.max(np.abs(y - y_b)) < 4e-3, \
            f"p{pi+1} y-trace deviates {np.max(np.abs(y - y_b)):.4g} m"
        assert np.max(np.abs(vy - vy_b)) < 0.03, \
            f"p{pi+1} vy-trace deviates {np.max(np.abs(vy - vy_b)):.4g} m/s"
