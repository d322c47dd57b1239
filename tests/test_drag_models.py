"""Drag-correlation unit tests: hand-computed values + regime behavior.

The reference only checks array sizes (ErgunWenYu.C:92-102); these verify
the actual correlation math (SURVEY.md §4 'proper unit tests the
reference lacks').
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sedifoam_tpu.coupling import drag

NUF, RHOF = 1e-6, 1000.0


def _jd(model, ur, alpha, d):
    return float(drag.jd(model, jnp.asarray([ur]), jnp.asarray([alpha]),
                         jnp.asarray([d]), NUF, RHOF)[0])


def test_wen_yu_stokes_limit():
    """Dilute, low Re: Jd*Vol*Ur -> 3*pi*mu*d*Ur (Stokes drag)."""
    d, ur = 1e-4, 1e-4
    alpha = 0.0
    jd = _jd("ErgunWenYu", ur, alpha, d)
    vol = np.pi / 6 * d ** 3
    f = jd * (1 - alpha) * vol * ur
    stokes = 3 * np.pi * (NUF * RHOF) * d * ur
    np.testing.assert_allclose(f, stokes, rtol=0.02)  # Re ~ 0.01


def test_wen_yu_newton_regime_cap():
    """Re > 1000: Cds = 0.44 exactly."""
    d, ur, alpha = 1e-3, 2.0, 0.1
    beta = 1 - alpha
    Re = beta * ur * d / NUF
    assert Re > 1000
    jd = _jd("ErgunWenYu", ur, alpha, d)
    expect = 0.75 * 0.44 * RHOF * ur * beta ** (-2.65) / d
    np.testing.assert_allclose(jd, expect, rtol=1e-12)


def test_ergun_branch_dense():
    """beta <= 0.8 switches to the Ergun packed-bed correlation."""
    d, ur, alpha = 1e-3, 0.1, 0.5
    beta = 1 - alpha
    jd = _jd("ErgunWenYu", ur, alpha, d)
    expect = (150.0 * alpha * NUF * RHOF / (beta * d) ** 2
              + 1.75 * RHOF * ur / (beta * d))
    np.testing.assert_allclose(jd, expect, rtol=1e-12)


def test_syamlal_obrien_dilute_terminal_velocity():
    """At alpha->0 the Syamlal-O'Brien Vr -> 1 and Cds -> (0.63+4.8/sqrt(Re))^2."""
    d, ur, alpha = 1e-4, 0.01, 0.0
    Re = ur * d / NUF
    jd = _jd("SyamlalOBrien", ur, alpha, d)
    cds = (0.63 + 4.8 / np.sqrt(Re)) ** 2
    np.testing.assert_allclose(jd, 0.75 * cds * RHOF * ur / d, rtol=1e-6)


def test_no_correction_formula():
    d, ur, alpha = 1e-4, 0.01, 0.0
    Re = ur * d / NUF
    jd = _jd("NoCorrection", ur, alpha, d)
    cds = 24.0 / Re + 4.0 * Re ** -0.5 + 0.4
    np.testing.assert_allclose(jd, 0.75 * cds * RHOF * ur / d, rtol=1e-6)


def test_all_models_monotone_in_ur():
    for model in drag.DRAG_MODELS:
        j1 = _jd(model, 0.01, 0.2, 1e-3)
        j2 = _jd(model, 0.1, 0.2, 1e-3)
        assert j2 > j1 > 0, model


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        drag.jd("Gidaspow", jnp.zeros(1), jnp.zeros(1), jnp.ones(1),
                NUF, RHOF)
