"""Compensated global reductions for the f32 TPU path.

The reference accumulates its conservation audits in C++ doubles
(enhancedCloud.C:395-435 Ftotal/Utotal, chPressureGrad.C:242-257 the
beta*V-weighted Ubar mean). TPUs have no native f64, and a plain
`jnp.sum` over f32 is an XLA tree reduction whose rounding error grows
with depth and with magnitude spread — the same class of issue as the
bf16-matmul defaults that produced round 1's recorded anomalies.

`stable_sum` reduces in two stages:

1. block partial sums (vectorized, error ~ eps * log2(block) within a
   narrow magnitude band);
2. a Neumaier two-sum scan over the ~n/block partials carrying an
   explicit compensation term, so the sequential combine is exact to
   one final rounding.

End-to-end error is comparable to an f64 accumulator for n <= 1e8 when
the data isn't adversarial. When the input already is f64 (CPU x64
paths) a plain sum is used — it is already tighter than f32
compensation.

The policy knob (`SimConfig.dtype_policy` / the `policy=` argument):
  "compensated" (default)  — the scheme above on the native dtype
  "native"                 — plain jnp.sum (the round-2 behavior)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 1024


def stable_sum(x, policy: str = "compensated"):
    """Scalar sum of all elements of `x` with compensated accumulation."""
    x = jnp.ravel(jnp.asarray(x))
    if policy == "native" or x.dtype in (jnp.float64,) or x.size <= _BLOCK:
        return jnp.sum(x)
    n = x.shape[0]
    pad = (-n) % _BLOCK
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    partials = jnp.sum(x.reshape(-1, _BLOCK), axis=1)

    def two_sum(carry, v):
        s, c = carry
        t = s + v
        # Neumaier: recover the rounding error of s+v exactly
        c = c + jnp.where(jnp.abs(s) >= jnp.abs(v),
                          (s - t) + v, (v - t) + s)
        return (t, c), None

    (s, c), _ = jax.lax.scan(
        two_sum, (jnp.zeros((), x.dtype), jnp.zeros((), x.dtype)), partials)
    return s + c


def stable_dot(a, b, policy: str = "compensated"):
    """Compensated sum(a*b) — the weighted means of chPressureGrad and
    the V-weighted audit totals."""
    return stable_sum(jnp.ravel(a) * jnp.ravel(b), policy)


def stable_mean(x, w, policy: str = "compensated"):
    """Compensated weighted mean sum(x*w)/sum(w)."""
    return stable_dot(x, w, policy) / stable_sum(w, policy)
