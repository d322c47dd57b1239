"""Fluid solver state pytree (the fields of lammpsFoam/createFields.H)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.grid import FaceField, Grid


class FluidBCs(NamedTuple):
    """Static boundary conditions per solved field (hashable)."""

    alpha: _bc.FieldBC
    p: _bc.FieldBC
    Ub: _bc.FieldBC
    Ua: _bc.FieldBC


class FluidState(NamedTuple):
    # primary fields
    alpha: jnp.ndarray      # solid volume fraction (gamma, set by particles)
    p: jnp.ndarray          # pressure (p/rho-scaled as in the reference? no:
                            # reference p carries [1 -1 -2] — true pressure)
    Ua: jnp.ndarray         # (3,...) solid ensemble velocity (from particles)
    Ub: jnp.ndarray         # (3,...) fluid velocity
    phia: FaceField         # solid-phase volumetric face flux
    phib: FaceField         # fluid-phase volumetric face flux
    phi: FaceField          # mixture flux alphaf*phia + betaf*phib
    # previous-timestep copies (Euler ddt + ddtCorr)
    alpha_old: jnp.ndarray
    Ua_old: jnp.ndarray
    Ub_old: jnp.ndarray
    phia_old: FaceField
    phib_old: FaceField
    # material derivatives (DDtU.H), consumed by added-mass/drag coupling
    DDtUa: jnp.ndarray
    DDtUb: jnp.ndarray
    # particle->fluid explicit momentum source (enhancedCloud::Asrc)
    Asrc: jnp.ndarray       # (3,...)
    # implicit drag coefficient field (enhancedCloud::Omega; zeroed in the
    # reference — coupling is fully explicit — kept for parity)
    drag_coef: jnp.ndarray
    lift_coeff: jnp.ndarray  # (3,...) Cl*beta*rhob*(Ur x curl U)
    # channel forcing accumulator (chPressureGrad value_)
    grad_p_value: jnp.ndarray  # scalar
    # turbulence state (zeros when laminar)
    k: jnp.ndarray
    epsilon: jnp.ndarray
    nut: jnp.ndarray
    # optional body-force state (zeros when unused)
    ibm_indicator: jnp.ndarray    # IBM relaxation zone marker
    turbulence_force: jnp.ndarray  # (3,...) DNS forcing field
    dns_f_hat: jnp.ndarray        # (2,3,...) UO spectral state (re, im)
    dns_key: jnp.ndarray          # (2,) uint32
    time: jnp.ndarray       # scalar simulation time
    step: jnp.ndarray       # scalar int32 time index

    @property
    def beta(self):
        return 1.0 - self.alpha

    @property
    def U(self):
        """Mixture velocity U = alpha*Ua + beta*Ub."""
        return self.alpha[None] * self.Ua + self.beta[None] * self.Ub

    @property
    def Uc(self):
        """Sediment flux Uc = alpha*Ua."""
        return self.alpha[None] * self.Ua


def init_fluid(grid: Grid, alpha=None, Ub=None, p=None, dtype=jnp.float64
               ) -> FluidState:
    z = grid.zeros(dtype)
    zv = grid.zeros_vec(dtype)
    zf = grid.zeros_faces(dtype)
    alpha = z if alpha is None else jnp.asarray(alpha, dtype)
    Ub = zv if Ub is None else jnp.asarray(Ub, dtype)
    p = z if p is None else jnp.asarray(p, dtype)
    return FluidState(
        alpha=alpha, p=p, Ua=zv, Ub=Ub,
        phia=zf, phib=zf, phi=zf,
        alpha_old=alpha, Ua_old=zv, Ub_old=Ub,
        phia_old=zf, phib_old=zf,
        DDtUa=zv, DDtUb=zv,
        Asrc=zv, drag_coef=z, lift_coeff=zv,
        grad_p_value=jnp.zeros((), dtype),
        k=z, epsilon=z, nut=z,
        ibm_indicator=z,
        turbulence_force=zv,
        dns_f_hat=jnp.zeros((2, 3) + grid.shape, dtype),
        dns_key=jnp.zeros(2, jnp.uint32),
        time=jnp.zeros((), dtype),
        step=jnp.zeros((), jnp.int32),
    )
