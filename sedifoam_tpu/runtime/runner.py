"""Simulation runner: the time loop around the jitted coupled step.

The lammpsFoam main-loop services (lammpsFoam.C:74-129): stepping to
endTime, probe sampling, periodic field/checkpoint writes, per-phase
timing splits (writeCPUTime.H analogue), and diagnostics logging.
Steps are batched through lax.scan between host visits so the device
never waits on Python.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional, Sequence

import jax
import numpy as np

from sedifoam_tpu.runtime import checkpoint as _ckpt
from sedifoam_tpu.runtime import diagnostics as _diag
from sedifoam_tpu.runtime.probes import Probes
from sedifoam_tpu.solver import SimConfig, SimState, initialize, make_step_fn


class Simulation:
    def __init__(self, cfg: SimConfig, state: SimState,
                 probe_locations: Optional[Sequence] = None,
                 steps_per_host_visit: int = 1,
                 active_window: Optional[bool] = None):
        self.cfg = cfg
        self.state = state
        # NOTE: chained single-step jit calls outperform a scan-of-N-steps
        # program by ~100x on the axon TPU backend; keep n_sub=1 and batch
        # host visits in the Python loop instead.
        self.step_fn = make_step_fn(cfg, n_sub=1)
        self.steps_per_visit = steps_per_host_visit
        # Active-window stepping (runtime/window.py): injection cases
        # start near-empty but pay full-capacity DEM tables from step 0
        # (the round-4 jetFlow stall). Auto-on for binned injection
        # cases without rigid clumps; every per-substep cost then
        # scales with the live population, with a handful of retraces
        # as the window regrows. jax.jit retraces per window shape, so
        # the same step_fn serves every window.
        if active_window is None:
            active_window = (cfg.cloud.add_particle > 0
                             and cfg.dem.backend == "binned"
                             and state.particles.rigid is None)
        self.full_capacity = state.particles.n_capacity
        self.windowed = bool(active_window
                             and cfg.dem.backend == "binned"
                             and state.particles.rigid is None
                             and state.particles.nbr_idx.shape[0] > 0)
        if self.windowed:
            self._apply_window(first=True)
        self.probes = (Probes(cfg.grid, probe_locations)
                       if probe_locations else None)
        self.diag_fn = jax.jit(
            lambda s: _diag.compute(s, cfg.grid, cfg.fluid, cfg.dem))
        self.wall_time = 0.0
        self.log = []

    @classmethod
    def from_case(cls, case_dir: str, **kw):
        from sedifoam_tpu.io.case import load_case
        cfg, fluid, particles, controls = load_case(case_dir)
        state = initialize(fluid, particles, cfg)
        probes = kw.pop("probe_locations", None)
        sim = cls(cfg, state, probe_locations=probes, **kw)
        sim.controls = controls
        return sim

    @property
    def t(self) -> float:
        return float(self.state.fluid.time)

    def _apply_window(self, first: bool = False) -> None:
        """Grow (or on first call, shrink) the particle window so the
        live population keeps >= 50% headroom — injection between host
        visits must never saturate the table (window.py soundness)."""
        from sedifoam_tpu.runtime import window as _win
        ps = self.state.particles
        n_hi = int(_win.high_water(ps))
        w = _win.next_window(n_hi, 0 if first else ps.n_capacity,
                             self.full_capacity)
        if first and w < ps.n_capacity:
            ps = _win.window_slice(ps, w)
        elif w > ps.n_capacity:
            ps = _win.window_grow(ps, w)
        else:
            return
        print(f"[window] t={float(self.state.fluid.time):.4g}s "
              f"active<={n_hi} table {ps.n_capacity} "
              f"(capacity {self.full_capacity})", flush=True)
        self.state = self.state._replace(particles=ps)

    def run(self, t_end: float,
            probe_every: int = 1,
            log_every: int = 0,
            write_dir: Optional[str] = None,
            write_interval: Optional[float] = None,
            on_sample: Optional[Callable] = None) -> SimState:
        dt_visit = self.cfg.fluid.dt * self.steps_per_visit
        next_write = (self.t + write_interval) if write_interval else None
        visit = 0
        t0 = time.perf_counter()
        while self.t < t_end - 1e-12:
            for _ in range(self.steps_per_visit):
                self.state = self.step_fn(self.state)
            visit += 1
            if self.windowed:
                self._apply_window()
            if self.probes is not None and visit % probe_every == 0:
                fs = self.state.fluid
                self.probes.sample(self.t, p=fs.p, Ub=fs.Ub,
                                   alpha=fs.alpha, Ua=fs.Ua)
            if on_sample is not None:
                on_sample(self)
            if log_every and visit % log_every == 0:
                d = {k: float(v) for k, v in self.diag_fn(self.state).items()}
                d["t"] = self.t
                self.log.append(d)
            if write_dir and next_write is not None and \
                    self.t >= next_write - 1e-12:
                self.write(write_dir)
                next_write += write_interval
        jax.block_until_ready(self.state)
        self.wall_time += time.perf_counter() - t0
        return self.state

    def write(self, out_dir: str) -> str:
        """Write a time directory: fields + full checkpoint."""
        tdir = os.path.join(out_dir, f"{self.t:.6g}")
        os.makedirs(tdir, exist_ok=True)
        fs, ps = self.state.fluid, self.state.particles
        from sedifoam_tpu.fluid import turbulence as _turb
        B = _turb.reynolds_stress(fs, self.cfg.grid, self.cfg.bcs,
                                  self.cfg.fluid)
        np.savez_compressed(
            os.path.join(tdir, "fields.npz"),
            alpha=np.asarray(fs.alpha), p=np.asarray(fs.p),
            Ub=np.asarray(fs.Ub), Ua=np.asarray(fs.Ua),
            Asrc=np.asarray(fs.Asrc),
            k=np.asarray(fs.k), nut=np.asarray(fs.nut),
            B=np.asarray(B))
        np.savez_compressed(
            os.path.join(tdir, "particles.npz"),
            pos=np.asarray(ps.pos), vel=np.asarray(ps.vel),
            omega=np.asarray(ps.omega), radius=np.asarray(ps.radius),
            tag=np.asarray(ps.tag), active=np.asarray(ps.active))
        _ckpt.save(os.path.join(tdir, "checkpoint.npz"),
                   self._full_capacity_state())
        if getattr(self, "foam_output", False):
            # OpenFOAM-ASCII export (C12): readable by the reference's
            # own post-processing tools
            from sedifoam_tpu.io import foamwrite
            foamwrite.write_time_dir(
                out_dir, f"{self.t:.6g}", self.cfg.grid,
                p=np.asarray(fs.p), alpha=np.asarray(fs.alpha),
                Ub=np.asarray(fs.Ub), Ua=np.asarray(fs.Ua),
                k=np.asarray(fs.k), nut=np.asarray(fs.nut))
        if self.log:
            with open(os.path.join(tdir, "diagnostics.jsonl"), "w") as f:
                for d in self.log:
                    f.write(json.dumps(d) + "\n")
        return tdir

    def _full_capacity_state(self) -> SimState:
        """The state at full capacity (checkpoints are always written
        window-independent so any session can resume them)."""
        ps = self.state.particles
        if ps.n_capacity >= self.full_capacity:
            return self.state
        from sedifoam_tpu.runtime import window as _win
        return self.state._replace(
            particles=_win.window_grow(ps, self.full_capacity))

    def save_checkpoint(self, path: str) -> str:
        """Atomic full-state checkpoint + probe-series sidecar.

        `startFrom latestTime` semantics (xiaocase1/system/controlDict;
        cloud IO softParticleIO.C:110-170) — but strictly better: the
        DEM contact history rides the state pytree, and the probe
        series (which OpenFOAM appends to a file across restarts)
        rides a sidecar so a resumed validator sees one continuous
        series."""
        _ckpt.save(path, self._full_capacity_state())
        if self.probes is not None:
            self.probes.save(path + ".probes.npz")
        return path

    def resume(self, checkpoint_path: str) -> None:
        full = self._full_capacity_state()
        self.state = _ckpt.load(checkpoint_path, full)
        if self.windowed:
            self._apply_window(first=True)
        sidecar = checkpoint_path + ".probes.npz"
        if self.probes is not None and os.path.exists(sidecar):
            self.probes.load(sidecar)

    def timing_split(self, n: int = 5) -> dict:
        """Per-phase wall-time split (the writeCPUTime.H instrumentation:
        fluid solve / particle evolve / coupling source), measured by
        running the phases as separate device programs with real syncs."""
        from sedifoam_tpu.coupling import cloud as _cloud
        from sedifoam_tpu.fluid.step import advance_time, fluid_step

        cfg = self.cfg

        def sync(x):
            return float(jax.tree.leaves(x)[0].ravel()[0])

        f_fluid = jax.jit(lambda fs: fluid_step(
            advance_time(fs, cfg.fluid), cfg.grid, cfg.bcs, cfg.fluid,
            advance=False))
        f_evolve = jax.jit(lambda s: _cloud.evolve(
            s.fluid, s.particles, s.uf_smoothed, cfg.grid, cfg.bcs,
            cfg.cloud, cfg.dem, cfg.fluid))
        f_source = jax.jit(lambda s: _cloud.lift_drag_coeffs(
            s.fluid, s.particles, s.uf_smoothed, cfg.grid, cfg.bcs,
            cfg.cloud, cfg.fluid))

        # warm up compiles
        sync(f_fluid(self.state.fluid))
        sync(f_evolve(self.state))
        sync(f_source(self.state))

        split = {"fluid": 0.0, "evolve": 0.0, "coupling_source": 0.0}
        for _ in range(n):
            t0 = time.perf_counter()
            out = f_fluid(self.state.fluid)
            sync(out)
            split["fluid"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            out = f_evolve(self.state)
            sync(out)
            split["evolve"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            out = f_source(self.state)
            sync(out)
            split["coupling_source"] += time.perf_counter() - t0
        return {k: v / n for k, v in split.items()}
