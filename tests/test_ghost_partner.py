"""A particle deactivated BETWEEN rebuilds must stop exerting forces.

Deactivation without an immediate table rebuild happens on two live
paths: the per-step outside-the-domain delete (coupling/cloud.py
_delete_outside) and delete regions (inject.maybe_add_delete). The
reference removes the atom from LAMMPS outright (library.cpp:492-621),
so a stale-slot ghost force would be a real physics divergence.

Invariant under test: every delete path SCRUBS the neighbor/slot tables
(integrate.scrub_deactivated -> neighbor.scrub_dead_partners) instead
of masking activity inside the per-substep gathers — a live gathered
activity column measured a 3x substep cliff on the fused chain
(round-3 regression c28bb68: 31.9M -> 10.4M coupled psteps/s).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.config import CohesionParams, DEMConfig, PairParams
from sedifoam_tpu.dem import integrate as I
from sedifoam_tpu.dem.state import make_particles


def _touching_pair(backend, k=8):
    pair = PairParams(style="hertz_history", kn=1e5, gamman=0.5, xmu=0.3)
    d = 1e-3
    cfg = DEMConfig(dt=1e-6, pair=pair, walls=(),
                    gravity=(0.0, 0.0, 0.0), backend=backend,
                    nbr_k=k, max_per_bin=8, cutoff=2.5 * d, skin=0.5 * d,
                    domain_lo=(0.0, 0.0, 0.0),
                    domain_hi=(16 * d, 16 * d, 16 * d))
    # overlapping pair in the middle + a far bystander
    pos = np.array([[8e-3, 8e-3, 8e-3],
                    [8e-3 + 0.9 * d, 8e-3, 8e-3],
                    [2e-3, 2e-3, 2e-3]])
    st = make_particles(pos=pos, radius=0.5 * d, density=2500.0,
                        capacity=4, n_walls=0,
                        neighbor_k=k if backend == "binned" else None,
                        dtype=jnp.float64)
    return st, cfg


def _deactivate(st, cfg, i):
    """Flip one particle off the way the delete paths do: mask flip +
    table scrub (no rebuild)."""
    st = st._replace(active=st.active.at[i].set(False))
    return I.scrub_deactivated(st, cfg)


@pytest.mark.parametrize("backend", ["binned", "dense"])
def test_deactivated_partner_exerts_no_force(backend):
    st, cfg = _touching_pair(backend)
    st = I.setup_forces(st, cfg)
    f0 = np.asarray(st.force)
    assert np.abs(f0[0]).max() > 0.0          # in contact

    # deactivate particle 1 WITHOUT a rebuild (stale table entry)
    st2 = _deactivate(st, cfg, 1)
    st2 = I.compute_forces(st2, cfg, shearupdate=True)
    f2 = np.asarray(st2.force)
    assert np.abs(f2[0]).max() == 0.0, \
        f"ghost partner still pushes: {f2[0]}"
    assert np.abs(f2[1]).max() == 0.0          # inactive row zeroed


def test_deactivated_partner_no_cohesion_or_lubrication():
    st, cfg = _touching_pair("binned")
    cfg = dataclasses.replace(
        cfg, cohesion=CohesionParams(ah=1e-19, lam=100e-9,
                                     smin=1e-9, smax=1e-4, model=0))
    st = I.setup_forces(st, cfg)
    assert np.abs(np.asarray(st.force)[0]).max() > 0.0
    st2 = _deactivate(st, cfg, 1)
    st2 = I.compute_forces(st2, cfg, shearupdate=True)
    assert np.abs(np.asarray(st2.force)[0]).max() == 0.0


def test_deactivated_partner_lattice():
    from sedifoam_tpu.dem import lattice as _lat
    st, cfg = _touching_pair("lattice", k=16)
    geom = _lat.make_geom(cfg)
    lat_geom = geom
    st = make_particles(pos=np.asarray(st.pos), radius=5e-4,
                        density=2500.0, capacity=4, n_walls=0,
                        lattice_geom=lat_geom, dtype=jnp.float64)
    st = I.setup_forces(st, cfg)
    assert np.abs(np.asarray(st.force)[0]).max() > 0.0
    st2 = _deactivate(st, cfg, 1)
    st2 = I.compute_forces(st2, cfg, shearupdate=True)
    assert np.abs(np.asarray(st2.force)[0]).max() == 0.0


def test_delete_outside_scrubs_table():
    """The live outside-the-domain delete path must scrub: after a
    contact partner drifts out of the domain, the survivor feels no
    force from its stale table row."""
    from sedifoam_tpu.coupling.cloud import _delete_outside
    from sedifoam_tpu.grid import Grid

    st, cfg = _touching_pair("binned")
    st = I.setup_forces(st, cfg)
    assert np.abs(np.asarray(st.force)[0]).max() > 0.0

    grid = Grid(nx=16, ny=16, nz=16, dx=1e-3, dy=1e-3, dz=1e-3)
    # move particle 1 outside the domain (as the DEM substep would)
    st = st._replace(pos=st.pos.at[1, 0].set(17e-3))
    st2 = _delete_outside(st, grid, cfg)
    assert not bool(st2.active[1])
    n = st2.n_capacity
    idx = np.asarray(st2.nbr_idx)
    assert not (idx[:, 0] == 1).any(), "table still points at the ghost"
    st2 = I.compute_forces(st2, cfg, shearupdate=True)
    assert np.abs(np.asarray(st2.force)[0]).max() == 0.0


def test_delete_box_scrubs_table():
    """The delete-region path (inject.maybe_add_delete) reports the
    deletion so the caller scrubs; the evolve wiring does this under
    lax.cond — here we exercise the flag + scrub pair directly."""
    from sedifoam_tpu.config import CloudConfig
    from sedifoam_tpu.dem import inject as _inject
    from sedifoam_tpu.grid import Grid

    st, cfg = _touching_pair("binned")
    st = st._replace(time_to_add=jnp.asarray(1e9),
                     rng_key=jax.random.PRNGKey(0))
    st = I.setup_forces(st, cfg)
    assert np.abs(np.asarray(st.force)[0]).max() > 0.0

    grid = Grid(nx=16, ny=16, nz=16, dx=1e-3, dy=1e-3, dz=1e-3)
    d = 1e-3
    ccfg = CloudConfig(delete_particle=1,
                       delete_box=(8e-3 + 0.5 * d, 16e-3,
                                   0.0, 16e-3, 0.0, 16e-3))
    st2, _, _, added, deleted = _inject.maybe_add_delete(
        st, st.time_to_add, st.rng_key, jnp.zeros((0, 3)), grid, ccfg,
        dt_fluid=1e-4)
    assert bool(deleted) and not bool(added)
    assert not bool(st2.active[1])
    st2 = I.scrub_deactivated(st2, cfg)
    st2 = I.compute_forces(st2, cfg, shearupdate=True)
    assert np.abs(np.asarray(st2.force)[0]).max() == 0.0
