"""A particle deactivated BETWEEN rebuilds must stop exerting forces.

Deactivation without an immediate table rebuild happens on two live
paths: the per-step outside-the-domain delete (coupling/cloud.py
_delete_outside) and delete regions when the forced setup is skipped.
The reference removes the atom from LAMMPS outright
(library.cpp:492-621), so a stale-slot ghost force would be a real
physics divergence. All binned consumers share gather_partners'
partner-activity mask; the lattice backend masks in pack_fields.
"""

import dataclasses

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


@pytest.mark.parametrize("backend", ["binned", "dense"])
def test_deactivated_partner_exerts_no_force(backend):
    st, cfg = _touching_pair(backend)
    st = I.setup_forces(st, cfg)
    f0 = np.asarray(st.force)
    assert np.abs(f0[0]).max() > 0.0          # in contact

    # deactivate particle 1 WITHOUT a rebuild (stale table entry)
    st2 = st._replace(active=st.active.at[1].set(False))
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
    st2 = st._replace(active=st.active.at[1].set(False))
    st2 = I.compute_forces(st2, cfg, shearupdate=True)
    assert np.abs(np.asarray(st2.force)[0]).max() == 0.0


def test_deactivated_partner_lattice():
    from sedifoam_tpu.dem import lattice as _lat
    st, cfg = _touching_pair("lattice", k=16)
    geom = _lat.make_geom(cfg)
    st, cfg2 = st, cfg
    lat_geom = geom
    st = make_particles(pos=np.asarray(st.pos), radius=5e-4,
                        density=2500.0, capacity=4, n_walls=0,
                        lattice_geom=lat_geom, dtype=jnp.float64)
    st = I.setup_forces(st, cfg)
    assert np.abs(np.asarray(st.force)[0]).max() > 0.0
    st2 = st._replace(active=st.active.at[1].set(False))
    st2 = I.compute_forces(st2, cfg, shearupdate=True)
    assert np.abs(np.asarray(st2.force)[0]).max() == 0.0
