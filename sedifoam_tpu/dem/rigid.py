"""Multisphere rigid-clump DEM (LAMMPS `fix rigid/small molecule`).

The reference's `irregular` example-case drives non-spherical sediment
grains as rigid clumps of bonded spheres (cases/example-cases/irregular/
in.lammps:13 `read_data In_initial.in fix molprop NULL Molecules`,
in.lammps:36 `fix 5 big rigid/small molecule`; RIGID/MOLECULE packages
enabled at Allwmake.sh:40-47; physics per Sun & Xiao arXiv:1608.01049).

TPU-native design: bodies are a second fixed-capacity SoA (B bodies).
Member spheres carry the contacts exactly as free spheres do — the pair
kernels never see bodies. Each DEM substep:

  accumulate   fcm_b  = segment_sum(f_i,  mol_i)           (MXU-free VPU op)
               tcm_b  = segment_sum(r_i x f_i + tq_i, mol_i)
  integrate    velocity-Verlet on body DOFs: vcm/xcm, angular momentum
               L += dt/2 * tcm, omega = R I^-1 R^T L (quaternion rotate),
               quaternion advanced by the exponential map
  set members  x_i = xcm + R d_i ; v_i = vcm + omega x (R d_i) ;
               omega_i = omega   (finite-size spheres spin with the body)

This mirrors FixRigidSmall's initial/final_integrate split (LAMMPS
fix_rigid_small.cpp); the quaternion update uses the exponential map
instead of LAMMPS's Richardson iteration — same O(dt^2) accuracy, no
inner loop to unroll under jit.

Intra-body contacts are EXCLUDED (slot-table scrub at rebuild /
same-mol mask in the dense kernel): members at fixed overlap have zero
relative surface velocity, so their granular forces are central,
equal-opposite and cancel in both fcm and tcm — dropping them changes
no physics and keeps the K-slot table free for real neighbors.

Member offsets `displace` live in the BODY frame (computed once at
setup against the principal axes); world offsets are recomputed from
the quaternion every substep, so bodies crossing periodic boundaries
never see wrap artifacts.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class RigidBodies(NamedTuple):
    """Fixed-capacity body SoA. Padding rows have valid=False, mass=1."""
    xcm: jnp.ndarray      # (B, 3) center of mass (world)
    vcm: jnp.ndarray      # (B, 3)
    angmom: jnp.ndarray   # (B, 3) angular momentum (world frame)
    quat: jnp.ndarray     # (B, 4) body->world rotation, (w, x, y, z)
    inertia: jnp.ndarray  # (B, 3) principal moments (body frame)
    mass: jnp.ndarray     # (B,)
    valid: jnp.ndarray    # (B,) bool

    @property
    def n_capacity(self):
        return self.xcm.shape[0]


# ---------------------------------------------------------------------------
# quaternion algebra (w, x, y, z) — batched over the leading axis


def quat_mul(a, b):
    aw, av = a[..., :1], a[..., 1:]
    bw, bv = b[..., :1], b[..., 1:]
    w = aw * bw - jnp.sum(av * bv, axis=-1, keepdims=True)
    v = aw * bv + bw * av + jnp.cross(av, bv)
    return jnp.concatenate([w, v], axis=-1)


def quat_rotate(q, v):
    """Rotate vectors v (.., 3) by quaternions q (.., 4): body->world."""
    qw, qv = q[..., :1], q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q, v):
    """World->body: rotate by the conjugate."""
    qw, qv = q[..., :1], q[..., 1:]
    t = 2.0 * jnp.cross(-qv, v)
    return v + qw * t + jnp.cross(-qv, t)


def quat_advance(q, omega, dt):
    """q(t+dt) = exp(dt/2 * omega) (x) q, renormalized.

    omega is the world-frame angular velocity. The safe-norm guard keeps
    the derivative finite at omega = 0 under jit.
    """
    wmag = jnp.sqrt(jnp.sum(omega * omega, axis=-1, keepdims=True))
    half = 0.5 * dt * wmag
    # sin(x)/x, safe at 0
    sinc = jnp.where(wmag > 1e-30, jnp.sin(half) / jnp.maximum(wmag, 1e-30),
                     0.5 * dt)
    dq = jnp.concatenate([jnp.cos(half), omega * sinc], axis=-1)
    out = quat_mul(dq, q)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def omega_from_angmom(rb: RigidBodies):
    """World angular velocity: omega = R diag(1/I) R^T L."""
    l_body = quat_rotate_inv(rb.quat, rb.angmom)
    iinv = jnp.where(rb.inertia > 0.0, 1.0 / jnp.maximum(rb.inertia, 1e-300),
                     0.0)
    return quat_rotate(rb.quat, l_body * iinv)


# ---------------------------------------------------------------------------
# setup (host-side, numpy): bodies from per-particle molecule ids


def make_rigid_bodies(pos, mass, radius, mol, vel=None, omega=None,
                      capacity_bodies=None, dtype=jnp.float64
                      ) -> Tuple[RigidBodies, np.ndarray, np.ndarray]:
    """Group particles by 1-based molecule id into rigid bodies.

    Returns (bodies, mol_compact (n,), displace (n, 3)): mol ids are
    compacted to 1..B (0 = free sphere); displace holds each member's
    offset in its body's PRINCIPAL-AXIS frame. Body inertia includes the
    spheres' own 2/5 m r^2 plus the parallel-axis term, matching LAMMPS
    rigid with finite-size (omega-carrying) sphere members. Body vcm and
    angular momentum come from the member velocities/spins (the rigid
    projection of whatever motion the IC carries, as FixRigid's setup
    computes them from atom v/omega).
    """
    pos = np.asarray(pos, np.float64).reshape(-1, 3)
    n = pos.shape[0]
    mass = np.broadcast_to(np.asarray(mass, np.float64), (n,))
    radius = np.broadcast_to(np.asarray(radius, np.float64), (n,))
    vel = np.zeros((n, 3)) if vel is None else \
        np.asarray(vel, np.float64).reshape(-1, 3)
    omega = np.zeros((n, 3)) if omega is None else \
        np.asarray(omega, np.float64).reshape(-1, 3)
    mol = np.asarray(mol, np.int64).ravel()
    ids = np.unique(mol[mol > 0])
    B = capacity_bodies or max(len(ids), 1)
    assert B >= len(ids)

    xcm = np.zeros((B, 3))
    vcm = np.zeros((B, 3))
    angmom = np.zeros((B, 3))
    quat = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (B, 1))
    inertia = np.zeros((B, 3))
    mtot = np.ones(B)
    valid = np.zeros(B, bool)
    mol_compact = np.zeros(len(mol), np.int32)
    displace = np.zeros_like(pos)

    for b, mid in enumerate(ids):
        sel = mol == mid
        mol_compact[sel] = b + 1
        m = mass[sel]
        x = pos[sel]
        r = radius[sel]
        M = m.sum()
        com = (m[:, None] * x).sum(axis=0) / M
        d = x - com
        # inertia tensor about com: sphere self term + parallel axis
        eye = np.eye(3)
        I = np.zeros((3, 3))
        for mi, di, ri in zip(m, d, r):
            I += 0.4 * mi * ri * ri * eye
            I += mi * ((di @ di) * eye - np.outer(di, di))
        w, R = np.linalg.eigh(I)          # columns of R = principal axes
        if np.linalg.det(R) < 0:          # keep it a rotation, not a flip
            R[:, 2] = -R[:, 2]
        xcm[b] = com
        vcm[b] = (m[:, None] * vel[sel]).sum(axis=0) / M
        angmom[b] = (np.cross(d, m[:, None] * vel[sel])
                     + (0.4 * m * r * r)[:, None] * omega[sel]).sum(axis=0)
        inertia[b] = w
        mtot[b] = M
        valid[b] = True
        quat[b] = _quat_from_matrix(R)
        displace[sel] = d @ R             # R^T d, row-wise

    bodies = RigidBodies(
        xcm=jnp.asarray(xcm, dtype),
        vcm=jnp.asarray(vcm, dtype),
        angmom=jnp.asarray(angmom, dtype),
        quat=jnp.asarray(quat, dtype),
        inertia=jnp.asarray(inertia, dtype),
        mass=jnp.asarray(mtot, dtype),
        valid=jnp.asarray(valid),
    )
    return bodies, mol_compact, displace


def _quat_from_matrix(R: np.ndarray) -> np.ndarray:
    """Rotation matrix (body->world, columns = body axes) to (w,x,y,z)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 0.0)) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q / np.linalg.norm(q)


# ---------------------------------------------------------------------------
# per-substep integration (jit)


def _accumulate(ps) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sum member forces/torques into body frame counts.

    Returns (fcm (B,3), tcm (B,3), rw (N,3) member world offsets). The
    member offset comes from the quaternion + body-frame displace, never
    from wrapped positions, so periodic images are a non-issue.
    """
    rb = ps.rigid
    B = rb.n_capacity
    member = ps.mol > 0
    seg = jnp.where(member, ps.mol - 1, B)    # free spheres -> drop row
    rw = quat_rotate(rb.quat[jnp.clip(seg, 0, B - 1)], ps.displace)
    rw = jnp.where(member[:, None], rw, 0.0)
    fcm = jnp.zeros((B + 1, 3), ps.force.dtype
                    ).at[seg].add(ps.force)[:B]
    tq = jnp.cross(rw, ps.force) + ps.torque
    tcm = jnp.zeros((B + 1, 3), ps.force.dtype).at[seg].add(tq)[:B]
    return fcm, tcm, rw


def _set_members(ps, rw, domain_lo=None, domain_hi=None, periodic=None):
    """Write body motion into member pos/vel/omega."""
    rb = ps.rigid
    B = rb.n_capacity
    member = ps.mol > 0
    b = jnp.clip(jnp.where(member, ps.mol - 1, 0), 0, B - 1)
    omega_b = omega_from_angmom(rb)
    pos = rb.xcm[b] + rw
    if periodic is not None:
        for a in range(3):
            if periodic[a]:
                lo, L = domain_lo[a], domain_hi[a] - domain_lo[a]
                pos = pos.at[:, a].set(lo + jnp.mod(pos[:, a] - lo, L))
    vel = rb.vcm[b] + jnp.cross(omega_b[b], rw)
    mm = member[:, None]
    return ps._replace(
        pos=jnp.where(mm, pos, ps.pos),
        vel=jnp.where(mm, vel, ps.vel),
        omega=jnp.where(mm, omega_b[b], ps.omega),
    )


def initial_integrate(ps, dt, domain_lo, domain_hi, periodic):
    """Body half-kick + drift + member placement (before forces)."""
    rb = ps.rigid
    dtf = 0.5 * dt
    fcm, tcm, _ = _accumulate(ps)
    minv = jnp.where(rb.valid, 1.0 / rb.mass, 0.0)[:, None]
    vcm = rb.vcm + dtf * fcm * minv
    xcm = rb.xcm + dt * vcm * rb.valid[:, None]
    for a in range(3):
        if periodic[a]:
            lo, L = domain_lo[a], domain_hi[a] - domain_lo[a]
            xcm = xcm.at[:, a].set(lo + jnp.mod(xcm[:, a] - lo, L))
    angmom = rb.angmom + dtf * tcm * rb.valid[:, None]
    rb = rb._replace(vcm=vcm, xcm=xcm, angmom=angmom)
    omega_b = omega_from_angmom(rb)
    rb = rb._replace(quat=quat_advance(rb.quat, omega_b, dt))
    ps = ps._replace(rigid=rb)
    # fresh world offsets from the advanced quaternion
    B = rb.n_capacity
    member = ps.mol > 0
    b = jnp.clip(jnp.where(member, ps.mol - 1, 0), 0, B - 1)
    rw = jnp.where(member[:, None],
                   quat_rotate(rb.quat[b], ps.displace), 0.0)
    return _set_members(ps, rw, domain_lo, domain_hi, periodic)


def final_integrate(ps, dt):
    """Body half-kick from the new forces + member velocity update."""
    rb = ps.rigid
    dtf = 0.5 * dt
    fcm, tcm, rw = _accumulate(ps)
    minv = jnp.where(rb.valid, 1.0 / rb.mass, 0.0)[:, None]
    rb = rb._replace(vcm=rb.vcm + dtf * fcm * minv,
                     angmom=rb.angmom + dtf * tcm * rb.valid[:, None])
    ps = ps._replace(rigid=rb)
    return _set_members(ps, rw)   # positions unchanged: rw from same quat


def scrub_same_mol(idx: jnp.ndarray, mol: jnp.ndarray) -> jnp.ndarray:
    """Rewrite table slots pointing at same-body partners to the empty
    sentinel (rebuild-time only — the per-substep gathers stay 11-column;
    see the round-3 c28bb68 postmortem in dem/neighbor.py)."""
    n = mol.shape[0]
    j = jnp.clip(idx, 0, n - 1)
    col_mol = mol[None, :] if idx.ndim == 2 else mol
    same = (mol[j] == col_mol) & (col_mol > 0) & (idx < n)
    return jnp.where(same, n, idx).astype(idx.dtype)
