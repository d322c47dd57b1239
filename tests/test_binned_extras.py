"""Binned-backend parity for cohesion, lubrication, and the contact/
cohesion observables (VERDICT: fix_cohesive.cpp:92-96 has its own
neighbor list; pair_lubricate_poly.cpp:65-210; compute_cohe_local.cpp).
"""

import numpy as np
import pytest

from sedifoam_tpu.config import CohesionParams, DEMConfig, PairParams
from sedifoam_tpu.dem import integrate as _dem
from sedifoam_tpu.dem.lubrication import LubricationParams
from sedifoam_tpu.dem.state import make_particles

L = 1.0e-2
R = 5e-4
PAIR = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.5)


def _packing(n=30, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0.05 * L, 0.95 * L, size=(n, 3))
    vel = rng.uniform(-0.02, 0.02, size=(n, 3))
    rad = rng.uniform(0.8 * R, 1.2 * R, size=n)  # polydisperse
    return pos, vel, rad


def _cfg(backend, **kw):
    args = dict(dt=1e-6, pair=PAIR, gravity=(0.0, 0.0, 0.0),
                backend=backend, nbr_k=16, max_per_bin=8,
                cutoff=4.2e-3, skin=5e-4,
                domain_lo=(0.0, 0.0, 0.0), domain_hi=(L, L, L))
    args.update(kw)
    return DEMConfig(**args)


def _make(backend, cfg, pos, vel, rad):
    return make_particles(pos=pos, radius=rad, density=2500.0, vel=vel,
                          n_walls=0,
                          neighbor_k=cfg.nbr_k if backend == "binned"
                          else None)


COHE = CohesionParams(ah=1e-17, lam=1e-7, smin=1e-7, smax=3e-3, model=0)
LUB = LubricationParams(mu=1e-3, flaglog=1, flagfld=1, cut_inner=1.05e-3,
                        cut=4e-3, flag_hi=1, flag_vf=1, box_volume=L ** 3)


@pytest.mark.parametrize("extra", ["cohesion", "cohesion_m1", "lubrication"])
def test_dense_binned_force_parity(extra):
    pos, vel, rad = _packing()
    out = {}
    for backend in ("dense", "binned"):
        kw = {}
        if extra.startswith("cohesion"):
            kw["cohesion"] = CohesionParams(
                ah=COHE.ah, lam=COHE.lam, smin=COHE.smin, smax=COHE.smax,
                model=1 if extra.endswith("m1") else 0)
        else:
            kw["lubrication"] = LUB
        cfg = _cfg(backend, **kw)
        parts = _make(backend, cfg, pos, vel, rad)
        parts = _dem.setup_forces(parts, cfg)
        from tagsort import by_tag
        out[backend] = tuple(by_tag(parts, "force", "torque"))
    scale = np.abs(out["dense"][0]).max() + 1e-30
    np.testing.assert_allclose(out["binned"][0], out["dense"][0],
                               atol=1e-10 * scale)
    np.testing.assert_allclose(out["binned"][1], out["dense"][1],
                               atol=1e-10 * (np.abs(out["dense"][1]).max()
                                             + 1e-30))


def test_contact_table_binned_matches_dense():
    from sedifoam_tpu.dem.observables import contact_table
    pos, vel, rad = _packing(n=40, seed=2)
    # compress into contact: scale positions down
    pos = 0.35 * (pos - L / 2) + L / 2
    tables = {}
    for backend in ("dense", "binned"):
        cfg = _cfg(backend)
        parts = _make(backend, cfg, pos, vel, rad)
        parts = _dem.setup_forces(parts, cfg)
        tab = {k: np.asarray(v) for k, v in contact_table(parts, cfg).items()}
        mask = tab["touching"]
        pairs = {}
        for a, b, fn, fx in zip(tab["tag_i"][mask], tab["tag_j"][mask],
                                tab["fn"][mask], tab["fx"][mask]):
            pairs[(int(a), int(b))] = (float(fn), float(fx))
        tables[backend] = pairs
    assert tables["dense"].keys() == tables["binned"].keys()
    assert len(tables["dense"]) > 0, "no contacts in fixture"
    for k in tables["dense"]:
        np.testing.assert_allclose(tables["dense"][k], tables["binned"][k],
                                   rtol=1e-9)


def test_cohesion_table_both_backends():
    from sedifoam_tpu.dem.observables import cohesion_table
    pos, vel, rad = _packing(n=25, seed=3)
    tables = {}
    for backend in ("dense", "binned"):
        cfg = _cfg(backend, cohesion=COHE)
        parts = _make(backend, cfg, pos, vel, rad)
        parts = _dem.setup_forces(parts, cfg)
        tab = {k: np.asarray(v) for k, v in cohesion_table(parts, cfg).items()}
        mask = tab["touching"]
        pairs = {(int(a), int(b)): (float(f), float(fx)) for a, b, f, fx in
                 zip(tab["tag_i"][mask], tab["tag_j"][mask],
                     tab["force"][mask], tab["fx"][mask])}
        tables[backend] = pairs
    assert len(tables["dense"]) > 0, "no cohesive pairs in fixture"
    assert tables["dense"].keys() == tables["binned"].keys()
    for k in tables["dense"]:
        np.testing.assert_allclose(tables["dense"][k], tables["binned"][k],
                                   rtol=1e-9)
    # attraction: force on the center line pulls pairs together
    any_pair = next(iter(tables["dense"]))
    assert tables["dense"][any_pair][0] > 0.0
