"""Compensated accumulation (utils/accum.py) vs f64 ground truth.

The audits it feeds are the Ftotal/Utotal momentum sums of
enhancedCloud.C:395-435, which the reference accumulates in C++ doubles;
on the f32 TPU path the compensated scheme must recover (near-)f64
accuracy where a plain f32 tree-sum loses digits.
"""

import jax.numpy as jnp
import numpy as np

from sedifoam_tpu.utils.accum import stable_dot, stable_mean, stable_sum


def _cases():
    rng = np.random.RandomState(3)
    n = 1 << 18
    # benign, wide-magnitude, and near-cancelling (the audit killer:
    # Asrc totals are up-drag minus gravity-scale terms)
    benign = rng.randn(n)
    wide = rng.randn(n) * np.logspace(-6, 6, n)
    half = rng.randn(n // 2) * 1e4
    cancel = np.concatenate([half, -half]) + rng.randn(n) * 1e-3
    rng.shuffle(cancel)
    return {"benign": benign, "wide": wide, "cancel": cancel}


def test_stable_sum_beats_native_f32():
    for name, x in _cases().items():
        truth = float(np.sum(x.astype(np.float64)))
        x32 = jnp.asarray(x, jnp.float32)
        comp = float(stable_sum(x32))
        native = float(jnp.sum(x32))
        scale = float(np.sum(np.abs(x))) + 1e-30
        # compensated error must be tiny relative to the magnitude scale
        assert abs(comp - truth) / scale < 1e-7, (name, comp, truth)
        # and no worse than the plain tree-sum (deterministic seeds)
        assert abs(comp - truth) <= abs(native - truth) + 1e-7 * scale, name


def test_stable_sum_f64_passthrough():
    x = np.random.RandomState(0).randn(4096)
    assert float(stable_sum(jnp.asarray(x))) == \
        float(jnp.sum(jnp.asarray(x)))


def test_policy_native_matches_plain():
    x = jnp.asarray(np.random.RandomState(1).randn(70000), jnp.float32)
    assert float(stable_sum(x, policy="native")) == float(jnp.sum(x))


def test_stable_dot_and_mean():
    rng = np.random.RandomState(2)
    a, w = rng.randn(50000), rng.rand(50000)
    truth = float(np.dot(a, w) / np.sum(w))
    got = float(stable_mean(jnp.asarray(a, jnp.float32),
                            jnp.asarray(w, jnp.float32)))
    assert abs(got - truth) / abs(truth) < 1e-5
    td = float(np.dot(a, w))
    gd = float(stable_dot(jnp.asarray(a, jnp.float32),
                          jnp.asarray(w, jnp.float32)))
    assert abs(gd - td) / (np.sum(np.abs(a * w)) + 1e-30) < 1e-6
