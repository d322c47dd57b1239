"""Pencil-backend tests: equivalence with the dense backend (CPU, XLA path).

The Pallas kernel itself is asserted equal to the XLA path by a
TPU-gated test (skipped on CPU) plus the live bench; everything here
exercises the identical enumeration/carry logic through
pair_forces_pencil_xla in float64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.config import DEMConfig, PairParams, WallSpec
from sedifoam_tpu.dem import pencil as pen
from sedifoam_tpu.dem.integrate import run_dem, setup_forces
from sedifoam_tpu.dem.state import make_particles

BOX = (0.0, 0.0, 0.0), (8e-3, 16e-3, 8e-3)
R = 5e-4


def _random_packing(n=64, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(2 * R, np.asarray(BOX[1]) - 2 * R, size=(n, 3))
    vel = rng.randn(n, 3) * 0.05
    return pos, vel


def _geom(n=64):
    return pen.make_pencil_geom(BOX[0], BOX[1], ring=2 * R * 1.6, d_max=2 * R,
                                n_particles=n)


def _configs(backend, geom=None):
    pair = PairParams(style="hertz_history", kn=1e5, gamman=0.7, xmu=0.4)
    walls = tuple(WallSpec(style=s, lo=0.0, hi=h, params=pair)
                  for s, h in (("xplane", BOX[1][0]), ("yplane", BOX[1][1]),
                               ("zplane", BOX[1][2])))
    return DEMConfig(
        dt=1e-6, pair=pair, walls=walls, gravity=(0.0, -9.81, 0.0),
        backend=backend, nbr_k=32, max_per_bin=8,
        cutoff=2 * R * 1.6, skin=0.6 * R,
        domain_lo=BOX[0], domain_hi=BOX[1], pencil=geom)


def _states(n, seed):
    pos, vel = _random_packing(n, seed)
    geom = _geom(n)
    st_d = make_particles(pos, R, 2500.0, vel=vel, n_walls=3)
    st_p = make_particles(pos, R, 2500.0, vel=vel, n_walls=3,
                          pencil_geom=geom)
    return st_d, st_p, geom


def test_geom_derivation():
    g = _geom()
    assert g.NP % 128 == 0 and g.P % g.TS == 0 and g.W <= g.TS
    assert g.pitch_x >= g.ring and g.pitch_z >= g.ring
    assert g.capacity >= 64


def test_assign_slots_roundtrip():
    pos, vel = _random_packing(96, seed=2)
    geom = _geom(96)
    st = make_particles(pos, R, 2500.0, vel=vel, n_walls=3,
                        pencil_geom=geom)
    order, slotted, overflow = pen.assign_slots(
        geom, st.pos, st.active, BOX[0][1], BOX[1][1])
    order = np.asarray(order)
    assert int(overflow) == 0
    # bijection over capacity rows
    assert sorted(order.tolist()) == list(range(geom.capacity))
    # slotted actives sit in their own pencil, y-sorted
    posn = np.asarray(st.pos)[order].reshape(geom.P, geom.NP, 3)
    act = np.asarray(st.active)[order].reshape(geom.P, geom.NP)
    lane = np.arange(geom.NP)
    for l in range(geom.n_real):
        ys = posn[act[:, l], l, 1]
        assert np.all(np.diff(ys) >= 0)
        if act[:, l].any():
            px = (posn[act[:, l], l, 0] - geom.x0) // geom.pitch_x
            pz = (posn[act[:, l], l, 2] - geom.z0) // geom.pitch_z
            np.testing.assert_array_equal(
                np.clip(px, 0, geom.npx - 1) * geom.npz
                + np.clip(pz, 0, geom.npz - 1), lane[l])


def test_pencil_matches_dense_forces():
    st_d, st_p, geom = _states(64, 0)
    cfg_d, cfg_p = _configs("dense"), _configs("pencil", geom)
    st_d = setup_forces(st_d, cfg_d)
    st_p = setup_forces(st_p, cfg_p)
    from tagsort import by_tag
    np.testing.assert_allclose(by_tag(st_p, "force"), by_tag(st_d, "force"),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(by_tag(st_p, "torque"),
                               by_tag(st_d, "torque"), rtol=1e-9, atol=1e-12)


def test_enumeration_covers_all_ring_pairs():
    """Every 3D-in-ring pair of actives must be reachable by exactly one
    owner-side (dir, shift) config — the deterministic coverage proof
    (trajectory equality can't give this: grazing contacts amplify
    benign summation-order rounding)."""
    for seed, nsteps in ((5, 0), (5, 500), (9, 800)):
        st_d, st_p, geom = _states(96, seed)
        cfg_p = _configs("pencil", geom)
        st_p = setup_forces(st_p, cfg_p)
        if nsteps:
            st_p = run_dem(st_p, cfg_p, nsteps)
            st_p = pen.rebuild_state(geom, st_p, BOX[0][1], BOX[1][1])
        pos = np.asarray(st_p.pos)
        act = np.asarray(st_p.active)
        rows = np.where(act)[0]
        r, l = rows // geom.NP, rows % geom.NP
        d = np.linalg.norm(pos[rows][:, None] - pos[rows][None], axis=-1)
        np.fill_diagonal(d, 1e9)
        half = set()
        for k, o in enumerate(geom.half_dirs):
            for _, dd in geom.configs_of_group(k):
                half.add((o, dd))
        cover = half | {(-o, -dd) for (o, dd) in half}
        ii, jj = np.where(d < geom.ring)
        assert len(ii) > 0
        for a, b in zip(ii, jj):
            dl = (int(l[b]) - int(l[a]))
            dr = int(r[b]) - int(r[a])
            assert (dl, dr) in cover, (seed, nsteps, dl, dr)


def test_pencil_matches_dense_trajectory():
    """Settling pile across several rebuilds. Tolerances are loose-ish by
    necessity: the pencil backend sums pair forces in a different order
    (per-config vs per-row), and the ~1e-18 rounding difference gets
    amplified by grazing-contact on/off flips — the same reason two MPI
    layouts of the reference diverge. Exactness is covered by the
    coverage, setup-force, and bitwise rebuild-identity tests."""
    st_d, st_p, geom = _states(48, 7)
    cfg_d, cfg_p = _configs("dense"), _configs("pencil", geom)
    st_d = setup_forces(st_d, cfg_d)
    st_p = setup_forces(st_p, cfg_p)
    st_d = run_dem(st_d, cfg_d, 800)
    st_p = run_dem(st_p, cfg_p, 800)
    from tagsort import by_tag
    np.testing.assert_allclose(by_tag(st_p, "pos"), by_tag(st_d, "pos"),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(by_tag(st_p, "vel"), by_tag(st_d, "vel"),
                               rtol=0, atol=1e-4)


def test_carry_preserves_contacting_shear():
    """Force a rebuild mid-contact; accumulated shear must survive it."""
    st_d, st_p, geom = _states(48, 11)
    cfg_d, cfg_p = _configs("dense"), _configs("pencil", geom)
    st_p = setup_forces(st_p, cfg_p)
    st_p = run_dem(st_p, cfg_p, 400)
    pre = float(jnp.sum(st_p.shear ** 2))
    assert pre > 0.0  # contacts have accumulated history
    from sedifoam_tpu.dem.integrate import maybe_rebuild_neighbors
    st_r = maybe_rebuild_neighbors(st_p, cfg_p, force=True)
    post = float(jnp.sum(st_r.shear ** 2))
    np.testing.assert_allclose(post, pre, rtol=1e-9)
    # and the forces after the forced rebuild are unchanged
    from sedifoam_tpu.dem.integrate import compute_forces
    f0 = compute_forces(st_p, cfg_p, 0.0, False)
    f1 = compute_forces(st_r, cfg_p, 0.0, False)
    from tagsort import by_tag
    np.testing.assert_allclose(by_tag(f1, "force"), by_tag(f0, "force"),
                               rtol=1e-9, atol=1e-12)


def test_audit_detects_undersized_window():
    """With W forced to 1 the exact audit scan must find real misses."""
    import dataclasses
    pos, vel = _random_packing(96, seed=5)
    geom = dataclasses.replace(_geom(96), W=1)
    st = make_particles(pos, R, 2500.0, vel=vel, n_walls=3,
                        pencil_geom=geom)
    cfg = _configs("pencil", geom)
    st = setup_forces(st, cfg)
    st = run_dem(st, cfg, 500)  # settle into columns
    st = pen.rebuild_state(geom, st, BOX[0][1], BOX[1][1])
    _, missed, _tail = pen.diagnostics(geom, st, geom.ring,
                                       BOX[0][1], BOX[1][1])
    assert int(missed) > 0


def test_audit_clean_at_derived_window():
    st_d, st_p, geom = _states(96, 5)
    cfg_p = _configs("pencil", geom)
    st_p = setup_forces(st_p, cfg_p)
    st_p = run_dem(st_p, cfg_p, 500)
    st_p = pen.rebuild_state(geom, st_p, BOX[0][1], BOX[1][1])
    uns, missed, tail = pen.diagnostics(geom, st_p, geom.ring,
                                        BOX[0][1], BOX[1][1])
    assert int(uns) == 0 and int(missed) == 0
    # the conservative tail ignores x/z separation, so it may be
    # nonzero on gas-like states; it must at least be rare
    assert int(tail) <= 96 // 10


def test_inactive_rows_do_not_interact():
    st_d, st_p, geom = _states(32, 3)
    cfg_p = _configs("pencil", geom)
    # deactivate half
    st_half = st_p._replace(active=st_p.active & (st_p.tag % 2 == 0))
    st_half = setup_forces(st_half, cfg_p)
    f = np.asarray(st_half.force)
    act = np.asarray(st_half.active)
    assert np.all(f[~act] == 0.0)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel needs a TPU")
def test_kernel_matches_xla_path():
    st_d, st_p, geom = _states(64, 0)
    cfg_p = _configs("pencil", geom)
    st32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if x.dtype in (jnp.float64,) else x, st_p)
    fields = pen.pack_fields(geom, st32, dtype=jnp.float32)
    sh = st32.shear.astype(jnp.float32)
    f1, t1, s1 = jax.jit(lambda a, b: pen.pair_forces_pencil(
        geom, cfg_p.pair, cfg_p.dt, a, b))(fields, sh)
    f2, t2, s2 = jax.jit(lambda a, b: pen.pair_forces_pencil_xla(
        geom, cfg_p.pair, cfg_p.dt, a, b))(fields, sh)
    for a, b in ((f1, f2), (t1, t2), (s1, s2)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.max(np.abs(b)) + 1e-30
        assert np.max(np.abs(a - b)) / denom < 1e-5
