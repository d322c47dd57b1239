"""Probe: where does alpha go negative in expMueller09?"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: F401

import jax.numpy as jnp  # noqa: E402

from sedifoam_tpu.coupling import cloud as _cloud  # noqa: E402
from sedifoam_tpu.coupling import transfer as _transfer  # noqa: E402
from sedifoam_tpu.io.case import load_case  # noqa: E402
from sedifoam_tpu.runtime.runner import Simulation  # noqa: E402
from sedifoam_tpu.solver import initialize  # noqa: E402

case = "/root/reference/cases/auto-testing/test-cases/expMueller09"
cfg, fluid, particles, controls = load_case(case, backend="binned",
                                            dtype=jnp.float32)
state = initialize(fluid, particles, cfg)
sim = Simulation(cfg, state, steps_per_host_visit=20)

smooth = _cloud._smooth_fn(cfg.grid, cfg.cloud)

for k in range(15):
    sim.run(sim.t + 20 * cfg.fluid.dt)
    st = sim.state
    cells = _transfer.particle_cells(st.particles, cfg.grid)
    raw = _transfer.scatter_to_grid(st.particles.volume, cells,
                                    st.particles.active, cfg.grid) \
        / cfg.grid.cell_volume
    sm = smooth(raw)
    print(f"t={float(st.fluid.time):.4f} raw_min={float(raw.min()):.3e} "
          f"raw_max={float(raw.max()):.3f} smooth_min={float(sm.min()):.3e} "
          f"alpha_min={float(st.fluid.alpha.min()):.3e} "
          f"alpha_max={float(st.fluid.alpha.max()):.3f}", flush=True)
