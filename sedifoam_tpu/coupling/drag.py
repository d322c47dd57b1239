"""Per-particle drag correlations Jd(|Ur|) [kg/(m^3 s)].

Matches lammpsFoam/dragModels/: ErgunWenYu (ErgunWenYu.C:86-145),
SyamlalOBrien (SyamlalOBrien.C:86-145), NoCorrection
(NoCorrection.C:86-146). The drag force on a particle is then
Jd * (1-alpha) * Vol * Ur (enhancedCloud.C:159-162).

All vectorized over the particle capacity axis.
"""

from __future__ import annotations

import jax.numpy as jnp

ROOTVSMALL = 1e-18

DRAG_MODELS = ("ErgunWenYu", "SyamlalOBrien", "NoCorrection")


def ergun_wen_yu(ur_mag, alpha, d, nuf: float, rhof: float):
    beta = jnp.maximum(1.0 - alpha, ROOTVSMALL)
    bp = beta ** (-2.65)
    Re = jnp.maximum(beta * ur_mag * d / nuf, ROOTVSMALL)
    Cds = jnp.where(Re > 1000.0, 0.44,
                    24.0 * (1.0 + 0.15 * Re ** 0.687) / Re)
    k_wen_yu = 0.75 * Cds * rhof * ur_mag * bp / d
    k_ergun = (150.0 * alpha * nuf * rhof / (beta * d) ** 2
               + 1.75 * rhof * ur_mag / (beta * d))
    return jnp.where(beta <= 0.8, k_ergun, k_wen_yu)


def _syamlal_vr(ur_mag, alpha, d, nuf: float, re_floor: float):
    beta = jnp.maximum(1.0 - alpha, re_floor if re_floor > 1e-7 else ROOTVSMALL)
    Ai = beta ** 4.14
    Bi = jnp.where(beta > 0.85, beta ** 2.65, 0.8 * beta ** 1.28)
    Re = jnp.maximum(ur_mag * d / nuf, re_floor)
    Vr = 0.5 * (Ai - 0.06 * Re + jnp.sqrt(
        (0.06 * Re) ** 2 + 0.12 * Re * (2.0 * Bi - Ai) + Ai ** 2))
    return Re, Vr


def syamlal_obrien(ur_mag, alpha, d, nuf: float, rhof: float):
    Re, Vr = _syamlal_vr(ur_mag, alpha, d, nuf, ROOTVSMALL)
    Cds = (0.63 + 4.8 * jnp.sqrt(Vr / Re)) ** 2
    return 0.75 * Cds * rhof * ur_mag / (d * Vr ** 2)


def no_correction(ur_mag, alpha, d, nuf: float, rhof: float):
    # NoCorrection.C uses floors 1e-6 (beta) and 1e-3 (Re)
    beta = jnp.maximum(1.0 - alpha, 1e-6)
    Ai = beta ** 4.14
    Bi = jnp.where(beta > 0.85, beta ** 2.65, 0.8 * beta ** 1.28)
    Re = jnp.maximum(ur_mag * d / nuf, 1e-3)
    Vr = 0.5 * (Ai - 0.06 * Re + jnp.sqrt(
        (0.06 * Re) ** 2 + 0.12 * Re * (2.0 * Bi - Ai) + Ai ** 2))
    Cds = 24.0 / Re + 4.0 * Re ** (-0.5) + 0.4
    return 0.75 * Cds * rhof * ur_mag / (d * Vr ** 2)


_TABLE = {
    "ErgunWenYu": ergun_wen_yu,
    "SyamlalOBrien": syamlal_obrien,
    "NoCorrection": no_correction,
}


def jd(model: str, ur_mag, alpha, d, nuf: float, rhof: float):
    """Runtime-selectable drag model (dragModel::New analogue)."""
    try:
        return _TABLE[model](ur_mag, alpha, d, nuf, rhof)
    except KeyError:
        raise ValueError(
            f"unknown dragModel '{model}'; valid: {sorted(_TABLE)}")
