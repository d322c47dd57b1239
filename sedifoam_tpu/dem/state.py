"""Fixed-capacity struct-of-arrays particle state.

The reference keeps particles in two places at once (OpenFOAM Cloud +
LAMMPS Atom, reconciled over MPI: lammpsFoam/softParticleCloud.C). Here a
single pytree owns everything; adding/deleting particles flips `active`
mask bits (no recompiles, no migration).

Per-particle fields mirror softParticle.H:63-107 plus the LAMMPS atom
state; the dense contact-history tensors replace LAMMPS's per-neighbor
shear storage.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class ParticleState(NamedTuple):
    pos: jnp.ndarray        # (N, 3)
    vel: jnp.ndarray        # (N, 3)
    omega: jnp.ndarray      # (N, 3) angular velocity
    radius: jnp.ndarray     # (N,)
    mass: jnp.ndarray       # (N,)
    density: jnp.ndarray    # (N,)
    ptype: jnp.ndarray      # (N,) int32
    tag: jnp.ndarray        # (N,) int32, 1-based like LAMMPS; 0 = empty slot
    active: jnp.ndarray     # (N,) bool
    force: jnp.ndarray      # (N, 3) current total force (velocity-Verlet carry)
    torque: jnp.ndarray     # (N, 3)
    # contact shear history, component-leading so nothing tiles a length-3
    # axis onto 128 TPU lanes: dense backend (3, N, N) ordered-pair tensor
    # (antisymmetric by construction: shear[:, i, j] accumulates vtr_ij*dt);
    # binned backend (3, K, N) per neighbor slot
    shear: jnp.ndarray
    wall_shear: jnp.ndarray  # (3, W, N); W = number of wall fixes
    # binned-backend neighbor table ((0, N) dummy when dense)
    nbr_idx: jnp.ndarray       # (K, N) int32; == N means empty slot
    pos_at_build: jnp.ndarray  # (N, 3) positions at last rebuild
    # fix fdrag state (interfaceToLammps/fix_fluid_drag.cpp): constant
    # fluid force over a subcycle + per-substep added-mass bookkeeping
    fdrag: jnp.ndarray      # (N, 3)
    dudt: jnp.ndarray       # (N, 3) fluid DDtU at the particle
    v_old: jnp.ndarray      # (N, 3) velocity at previous substep
    # history-force (Basset) reduced-order state (enhancedCloud.C:197-234)
    n0: jnp.ndarray         # (N,)
    sum_delta_fb: jnp.ndarray  # (N, 3)
    # coupling bookkeeping: velocity at the start of the fluid step
    # (p.UOld() in enhancedCloud.C) used by added-mass/history forces
    vel_fluid_old: jnp.ndarray  # (N, 3)
    # particle injection state (addAndDeleteParticle)
    time_to_add: jnp.ndarray    # scalar countdown
    rng_key: jnp.ndarray        # (2,) uint32 for position perturbation
    # neighbor-table safety audit (binned backend): worst count of
    # in-ring partners dropped by the K-nearest truncation at any
    # rebuild so far. Nonzero means nbr_k is too small for the observed
    # packing — the LAMMPS "dangerous builds" analogue
    # (neighbor.cpp ndanger). 0 when audit_ring is unset.
    nbr_dropped: jnp.ndarray    # scalar int32
    # multisphere rigid clumps (fix rigid/small molecule; dem/rigid.py):
    # mol = compacted 1-based body id (0 = free sphere); displace = the
    # member's offset in its body's principal-axis frame; rigid = the
    # body SoA, or None when the case has no clumps (the integrator
    # branches statically on the pytree structure — no config flag)
    mol: jnp.ndarray = None         # (N,) int32
    displace: jnp.ndarray = None    # (N, 3)
    rigid: object = None            # Optional[dem.rigid.RigidBodies]

    @property
    def n_capacity(self):
        return self.pos.shape[0]

    @property
    def n_active(self):
        return jnp.sum(self.active)

    @property
    def volume(self):
        return (4.0 / 3.0) * jnp.pi * self.radius ** 3

    @property
    def inertia(self):
        """Moment of inertia of a solid sphere: 0.4*m*r^2 (LAMMPS INERTIA)."""
        return 0.4 * self.mass * self.radius ** 2


def _n_lattice_offsets(geom) -> int:
    from sedifoam_tpu.dem.lattice import geom_offsets
    return len(geom_offsets(geom))


def make_particles(pos, radius, density, vel=None, omega=None, ptype=None,
                   tag=None, capacity: Optional[int] = None, n_walls: int = 6,
                   neighbor_k: Optional[int] = None,
                   lattice_geom=None, mol=None,
                   dtype=jnp.float64) -> ParticleState:
    """Build a ParticleState from numpy/array inputs, padded to capacity.

    neighbor_k: (K, N) binned-backend table; lattice_geom: lattice
    backend (dem/lattice.LatticeGeom) — shear and the slot table take the
    lattice shapes instead.

    mol: per-particle molecule ids (any positive labels; 0/None = free
    sphere). Any id > 0 groups particles into rigid clumps (dem/rigid.py)
    — supported on the dense and binned backends only."""
    pos = np.asarray(pos, dtype=np.float64).reshape(-1, 3)
    n = pos.shape[0]
    capacity = capacity or n
    assert capacity >= n

    def pad2(a, fill=0.0):
        out = np.full((capacity, 3), fill, dtype=np.float64)
        out[:n] = a
        return jnp.asarray(out, dtype)

    def pad1(a, fill=0.0, dt=None):
        out = np.full((capacity,), fill, dtype=np.float64)
        out[:n] = a
        return jnp.asarray(out, dt or dtype)

    radius = np.broadcast_to(np.asarray(radius, np.float64), (n,))
    density = np.broadcast_to(np.asarray(density, np.float64), (n,))
    mass = density * (4.0 / 3.0) * np.pi * radius ** 3
    vel = np.zeros((n, 3)) if vel is None else np.asarray(vel).reshape(-1, 3)
    omega = np.zeros((n, 3)) if omega is None else np.asarray(omega).reshape(-1, 3)
    ptype = np.ones(n) if ptype is None else np.asarray(ptype)
    tag = np.arange(1, n + 1) if tag is None else np.asarray(tag)

    active = np.zeros(capacity, bool)
    active[:n] = True

    rigid = None
    mol_arr = np.zeros(n, np.int64) if mol is None else \
        np.asarray(mol, np.int64).ravel()
    displace = np.zeros((n, 3))
    if (mol_arr > 0).any():
        if lattice_geom is not None:
            raise NotImplementedError(
                "rigid clumps (mol ids) are supported on the dense and "
                "binned backends only")
        from sedifoam_tpu.dem.rigid import make_rigid_bodies
        rigid, mol_arr, displace = make_rigid_bodies(
            pos, mass, radius, mol_arr, vel=vel, omega=omega, dtype=dtype)

    return ParticleState(
        pos=pad2(pos),
        vel=pad2(vel),
        omega=pad2(omega),
        radius=pad1(radius),
        mass=pad1(mass),
        density=pad1(density),
        ptype=pad1(ptype, 0, jnp.int32),
        tag=pad1(tag, 0, jnp.int32),
        active=jnp.asarray(active),
        force=jnp.zeros((capacity, 3), dtype),
        torque=jnp.zeros((capacity, 3), dtype),
        shear=(
            jnp.zeros((3, _n_lattice_offsets(lattice_geom),
                            lattice_geom.M, lattice_geom.M,
                            lattice_geom.S), dtype)
            if lattice_geom is not None
            else jnp.zeros((3, capacity, capacity), dtype)
            if neighbor_k is None
            else jnp.zeros((3, neighbor_k, capacity), dtype)),
        wall_shear=jnp.zeros((3, n_walls, capacity), dtype),
        nbr_idx=(
            jnp.full((lattice_geom.M, lattice_geom.S), capacity, jnp.int32)
            if lattice_geom is not None
            else jnp.full((neighbor_k or 0, capacity), capacity,
                          jnp.int32)),
        pos_at_build=pad2(pos),
        fdrag=jnp.zeros((capacity, 3), dtype),
        dudt=jnp.zeros((capacity, 3), dtype),
        v_old=pad2(vel),
        n0=pad1(np.zeros(n)),
        sum_delta_fb=jnp.zeros((capacity, 3), dtype),
        vel_fluid_old=pad2(vel),
        time_to_add=jnp.asarray(1e30, dtype),
        rng_key=jnp.zeros(2, jnp.uint32),
        nbr_dropped=jnp.zeros((), jnp.int32),
        mol=pad1(mol_arr, 0, jnp.int32),
        displace=pad2(displace),
        rigid=rigid,
    )
