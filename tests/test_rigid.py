"""Multisphere rigid-clump DEM tests (dem/rigid.py).

The reference drives non-spherical grains as rigid sphere clumps via
LAMMPS `fix rigid/small molecule` (cases/example-cases/irregular/
in.lammps:13,36; RIGID package per Allwmake.sh:43). The reference repo
itself ships no runnable IC for that case, so these are the per-kernel
physics checks: quaternion algebra, conservation laws, rigidity under
contact, dense-vs-binned backend equivalence, and the irregular-case
parsing path end to end.
"""

import os
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu.config import DEMConfig, PairParams, WallSpec
from sedifoam_tpu.dem import rigid
from sedifoam_tpu.dem.integrate import run_dem, setup_forces
from sedifoam_tpu.dem.state import make_particles

IRREGULAR = "/root/reference/cases/example-cases/irregular"


def test_quaternion_algebra():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(5, 3))
    q, v = jnp.asarray(q), jnp.asarray(v)
    # rotate/rotate_inv round trip
    np.testing.assert_allclose(
        np.asarray(rigid.quat_rotate_inv(q, rigid.quat_rotate(q, v))),
        np.asarray(v), atol=1e-12)
    # rotation preserves length
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rigid.quat_rotate(q, v)), axis=-1),
        np.linalg.norm(np.asarray(v), axis=-1), rtol=1e-12)
    # advance by zero omega is identity
    np.testing.assert_allclose(
        np.asarray(rigid.quat_advance(q, jnp.zeros((5, 3)), 1e-3)),
        np.asarray(q), atol=1e-12)


def _dimer(offset=(0.0, 0.0, 0.0), vel=(0.0, 0.0, 0.0), mol_id=1, n=2,
           r=0.005, spacing=2.0):
    """n collinear spheres along x, just touching at spacing*r."""
    pos = [[offset[0] + i * spacing * r, offset[1], offset[2]]
           for i in range(n)]
    return pos, [list(vel)] * n, [mol_id] * n


def test_body_setup_and_consistency():
    """Body mass/COM/inertia from members; Σ m_i v_i == M vcm after init."""
    pos, _, mol = _dimer()
    st = make_particles(pos=pos, radius=0.005, density=2000.0, mol=mol,
                        n_walls=0)
    rb = st.rigid
    assert rb is not None and bool(rb.valid[0])
    m_sphere = 2000.0 * (4 / 3) * np.pi * 0.005 ** 3
    np.testing.assert_allclose(float(rb.mass[0]), 2 * m_sphere, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rb.xcm[0]),
                               [0.005, 0.0, 0.0], atol=1e-15)
    # dimer principal inertia: axial = 2*(2/5 m r^2); transverse adds m d^2
    i_ax = 2 * 0.4 * m_sphere * 0.005 ** 2
    i_tr = i_ax + 2 * m_sphere * 0.005 ** 2
    w = np.sort(np.asarray(rb.inertia[0]))
    np.testing.assert_allclose(w, [i_ax, i_tr, i_tr], rtol=1e-12)
    # displace in the principal frame reproduces the member layout
    rw = np.asarray(rigid.quat_rotate(rb.quat[0], st.displace[:2]))
    np.testing.assert_allclose(np.sort(rw[:, 0]), [-0.005, 0.005],
                               atol=1e-12)


def test_rigid_free_fall_matches_sphere():
    """A clump in free fall translates exactly like a point mass."""
    pos, _, mol = _dimer(offset=(0.0, 1.0, 0.0))
    st = make_particles(pos=pos, radius=0.005, density=2000.0, mol=mol,
                        n_walls=0)
    cfg = DEMConfig(dt=1e-4, gravity=(0.0, -9.81, 0.0))
    st = setup_forces(st, cfg)
    n = 200
    st = run_dem(st, cfg, n)
    t = n * cfg.dt
    np.testing.assert_allclose(float(st.rigid.vcm[0, 1]), -9.81 * t,
                               rtol=1e-12)
    np.testing.assert_allclose(float(st.rigid.xcm[0, 1]),
                               1.0 - 0.5 * 9.81 * t * t, rtol=1e-10)
    # members moved rigidly with the body, no rotation picked up
    np.testing.assert_allclose(np.asarray(st.pos[1] - st.pos[0]),
                               [0.01, 0.0, 0.0], atol=1e-14)
    np.testing.assert_allclose(np.asarray(st.vel[:2]),
                               np.asarray(st.rigid.vcm[0])[None].repeat(
                                   2, 0), atol=1e-12)


def test_torque_free_rotation_conserves_L_and_energy():
    """Asymmetric clump tumbling freely: L exactly constant (no torque),
    rotational energy constant to integrator accuracy, |quat| = 1."""
    # 3-sphere L-shape: distinct principal moments
    r = 0.005
    pos = [[0.0, 0.0, 0.0], [2 * r, 0.0, 0.0], [0.0, 2 * r, 0.0]]
    st = make_particles(pos=pos, radius=r, density=2000.0, mol=[1, 1, 1],
                        n_walls=0)
    L0 = jnp.asarray([2e-7, 3e-7, 5e-7])
    st = st._replace(rigid=st.rigid._replace(angmom=st.rigid.angmom.at[0]
                                             .set(L0)))
    cfg = DEMConfig(dt=1e-5, gravity=(0.0, 0.0, 0.0))
    st = setup_forces(st, cfg)

    def energy(rb):
        om = rigid.omega_from_angmom(rb)
        return 0.5 * float(jnp.sum(om[0] * rb.angmom[0]))

    e0 = energy(st.rigid)
    st = run_dem(st, cfg, 2000)
    np.testing.assert_allclose(np.asarray(st.rigid.angmom[0]),
                               np.asarray(L0), rtol=1e-12)
    np.testing.assert_allclose(float(jnp.linalg.norm(st.rigid.quat[0])),
                               1.0, rtol=1e-12)
    assert abs(energy(st.rigid) - e0) / e0 < 1e-4
    # rigidity: member distances unchanged
    d01 = float(jnp.linalg.norm(st.pos[1] - st.pos[0]))
    np.testing.assert_allclose(d01, 2 * r, rtol=1e-9)


def _collide_dimers(backend="dense", offset_y=0.004, v0=0.2):
    # kn sized so the impact overlap stays ~2% of r: the granular torque
    # model's angular-momentum slip is O(delta/r)
    r = 0.005
    pos1, vel1, mol1 = _dimer(offset=(-0.013, 0.0, 0.0), vel=(v0, 0.0, 0.0))
    pos2, vel2, mol2 = _dimer(offset=(0.013, offset_y, 0.0),
                              vel=(-v0, 0.0, 0.0), mol_id=2)
    pair = PairParams(style="hertz_history", kn=1e7, gamman=1.0, xmu=0.3)
    kw = {}
    if backend == "binned":
        kw["neighbor_k"] = 8
    st = make_particles(pos=pos1 + pos2, vel=vel1 + vel2, radius=r,
                        density=2500.0, mol=mol1 + mol2, n_walls=0, **kw)
    cfg = DEMConfig(dt=2e-7, pair=pair, backend=backend, nbr_k=8,
                    max_per_bin=8, cutoff=3 * r, skin=r,
                    domain_lo=(-0.06, -0.06, -0.06),
                    domain_hi=(0.06, 0.06, 0.06))
    st = setup_forces(st, cfg)
    st = run_dem(st, cfg, 120000)
    return st


def test_dimer_collision_conserves_momentum():
    st = _collide_dimers()
    p = np.asarray(st.vel[:4] * st.mass[:4, None]).sum(axis=0)
    np.testing.assert_allclose(p, 0.0, atol=1e-14)  # symmetric => zero
    # bodies separated and bounced
    assert float(st.rigid.vcm[0, 0]) < 0 < float(st.rigid.vcm[1, 0])
    # off-center hit spun both bodies up
    assert float(jnp.abs(st.rigid.angmom[:2, 2]).min()) > 0.0
    # total angular momentum about the origin: conserved up to the
    # overlap-scale asymmetry of the granular torque model (the same
    # O(delta/r) slip LAMMPS gran pairs have)
    x, v, m = (np.asarray(st.pos[:4]), np.asarray(st.vel[:4]),
               np.asarray(st.mass[:4]))
    iner = 0.4 * m * np.asarray(st.radius[:4]) ** 2
    L = (np.cross(x, m[:, None] * v)
         + iner[:, None] * np.asarray(st.omega[:4])).sum(axis=0)
    # initial L about origin: only body 2 rides an offset lane
    m1 = float(m[0])
    L_init = 2 * m1 * 0.004 * 0.2
    np.testing.assert_allclose(L[2], L_init, rtol=0.05)


def test_dimer_collision_binned_matches_dense():
    sd = _collide_dimers("dense")
    sb = _collide_dimers("binned")
    np.testing.assert_allclose(np.asarray(sb.pos[:4]),
                               np.asarray(sd.pos[:4]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(sb.rigid.angmom[:2]),
                               np.asarray(sd.rigid.angmom[:2]),
                               rtol=1e-8, atol=1e-12)


def test_clump_settles_onto_wall():
    """Clump-settling with a momentum audit (VERDICT r3 next #6): a dimer
    dropped on the y-wall dissipates, ends at rest lying flat, and the
    member momenta always sum to the body momentum."""
    r = 0.005
    pair = PairParams(style="hertz_history", kn=1e7, gamman=0.3, xmu=0.3)
    walls = (WallSpec(style="yplane", lo=0.0, hi=None, params=pair),)
    # slightly tilted so it must also rotate to settle
    pos = [[0.02, 2.2 * r, 0.0], [0.02 + 2 * r * 0.995, 2.2 * r + 0.001, 0.0]]
    st = make_particles(pos=pos, radius=r, density=2000.0, mol=[1, 1],
                        n_walls=1)
    d0 = float(jnp.linalg.norm(st.pos[1] - st.pos[0]))
    cfg = DEMConfig(dt=2e-6, pair=pair, walls=walls,
                    gravity=(0.0, -9.81, 0.0))
    st = setup_forces(st, cfg)
    for _ in range(10):
        st = run_dem(st, cfg, 10000)
        # momentum audit: member momentum == body momentum at every visit
        p_members = np.asarray(st.vel[:2] * st.mass[:2, None]).sum(axis=0)
        p_body = np.asarray(st.rigid.vcm[0]) * float(st.rigid.mass[0])
        np.testing.assert_allclose(p_members, p_body, atol=1e-12)
        # rigidity throughout
        np.testing.assert_allclose(
            float(jnp.linalg.norm(st.pos[1] - st.pos[0])), d0, rtol=1e-9)
    assert float(jnp.abs(st.rigid.vcm[0]).max()) < 1e-4
    assert float(jnp.abs(rigid.omega_from_angmom(st.rigid)[0]).max()) < 0.05
    # lying flat on the wall: both members at height ~r
    y = np.asarray(st.pos[:2, 1])
    np.testing.assert_allclose(y, r, rtol=0.05)


def test_intra_body_contacts_excluded():
    """Overlapping members of one body exert no contact forces."""
    r = 0.005
    pair = PairParams(style="hertz_history", kn=1e6, gamman=0.5, xmu=0.3)
    pos = [[0.0, 0.0, 0.0], [1.2 * r, 0.0, 0.0]]  # deep permanent overlap
    st = make_particles(pos=pos, radius=r, density=2000.0, mol=[1, 1],
                        n_walls=0)
    cfg = DEMConfig(dt=1e-6, pair=pair, gravity=(0.0, 0.0, 0.0))
    st = setup_forces(st, cfg)
    st = run_dem(st, cfg, 100)
    assert float(jnp.abs(st.vel[:2]).max()) == 0.0
    assert float(jnp.abs(st.force[:2]).max()) == 0.0


def _synth_irregular_case(tmp_path):
    """irregular/in.lammps verbatim + a synthesized In_initial.in built
    from the case's own molecule templates (in.pairA/B), with the
    Molecules section the script's `fix molprop` read_data expects."""
    case = tmp_path / "irregular"
    shutil.copytree(IRREGULAR, case,
                    ignore=shutil.ignore_patterns("log.*"))
    from sedifoam_tpu.io.lammps import parse_molecule_template
    tA = parse_molecule_template(str(case / "in.pairA"))
    tB = parse_molecule_template(str(case / "in.pairB"))
    rows, mols, tag, mol_id = [], [], 1, 1
    rng = np.random.default_rng(5)
    for tpl, n_copies in ((tA, 2), (tB, 2)):
        for _ in range(n_copies):
            org = rng.uniform(0.002, 0.008, 3)
            for i in range(tpl["n_atoms"]):
                x = org + tpl["coords"][i]
                dens = tpl["masses"][i] / (
                    (4 / 3) * np.pi * (tpl["diameters"][i] / 2) ** 3)
                rows.append(
                    f"{tag} {tpl['types'][i]} {tpl['diameters'][i]:.6g} "
                    f"{dens:.8g} {x[0]:.8f} {x[1]:.8f} {x[2]:.8f}")
                mols.append(f"{tag} {mol_id}")
                tag += 1
            mol_id += 1
    with open(case / "In_initial.in", "w") as f:
        f.write("synthetic irregular IC\n\n")
        f.write(f"{len(rows)} atoms\n11 atom types\n\n")
        f.write("0.0 0.01 xlo xhi\n0.0 0.01 ylo yhi\n0.0 0.01 zlo zhi\n\n")
        f.write("Atoms\n\n" + "\n".join(rows) + "\n\n")
        f.write("Molecules\n\n" + "\n".join(mols) + "\n")
    return case


@pytest.mark.skipif(not os.path.isdir(IRREGULAR),
                    reason="irregular case not mounted")
def test_irregular_case_parses_and_loads(tmp_path):
    from sedifoam_tpu.io.case import load_case
    from sedifoam_tpu.io.lammps import parse_input_script
    case = _synth_irregular_case(tmp_path)
    lmp = parse_input_script(str(case / "in.lammps"))
    assert lmp.rigid
    assert set(lmp.molecule_templates) == {"object1", "object2",
                                           "object3", "object4"}
    assert lmp.molecule_templates["object1"]["n_atoms"] == 3
    assert lmp.molecule_templates["object2"]["n_atoms"] == 6
    assert lmp.mol is not None and lmp.mol.max() == 4
    # hooke/history pair from in.lammps:31 with kn=38200 analog
    assert lmp.pair.style == "hooke_history"

    cfg, fluid, particles, controls = load_case(str(case), backend="dense")
    rb = particles.rigid
    assert rb is not None
    assert int(np.asarray(rb.valid).sum()) == 4
    assert int(np.asarray(particles.mol).max()) == 4
    # body masses match the template member masses
    mA = 3 * 0.000000608
    mB = 6 * 0.0000000221
    got = np.sort(np.asarray(rb.mass)[np.asarray(rb.valid)])
    np.testing.assert_allclose(
        got, np.sort([mA, mA, mB, mB]), rtol=1e-3)
