"""Microbenchmark: partner-field access strategies for the binned contact
kernel at production scale (131k particles, K=32 slots).

Times, on the real chip:
  A. packed row gather (K,N)->(K,N,11)   [current kernel]
  B. per-field 1-D gathers x11           [round-1 rejected; re-measure]
  C. packed row gather, 8 fields
  D. sorted take_along_axis window       [bin-sorted locality]
  E. roll-based bin-dense enumeration    [no gather at all]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 131072
K = 32
M = 4           # slots per bin for the roll layout
NB = (64, 32, 16)  # bin grid for the roll layout (64*32*16*4 = 131072)


def sync(x):
    return float(jax.tree.leaves(x)[0].ravel()[0])


def timeit(fn, *args, n=20):
    out = jax.jit(fn)(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.jit(fn)(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


rng = np.random.RandomState(0)
packed = jnp.asarray(rng.randn(N, 11), jnp.float32)
packedT = jnp.asarray(np.ascontiguousarray(packed.T))
idx = jnp.asarray(rng.randint(0, N, size=(K, N)), jnp.int32)
idx_sorted_local = jnp.asarray(
    np.clip(np.arange(N)[None, :] + rng.randint(-2048, 2048, size=(K, N)),
            0, N - 1), jnp.int32)


def variant_a(packed, idx):
    pg = packed[idx]                       # (K,N,11)
    return sum(pg[..., c] for c in range(11))


def variant_b(packedT, idx):
    return sum(packedT[c][idx] for c in range(11))


def variant_c(packed, idx):
    pg = packed[:, :8][idx]
    return sum(pg[..., c] for c in range(8))


def variant_d(packedT, idx):
    # same-shape take_along_axis per field (bin-sorted locality layout)
    return sum(jnp.take_along_axis(
        jnp.broadcast_to(packedT[c][None, :], idx.shape), idx, axis=1)
        for c in range(11))


def variant_e(lattice):
    # 27 static rolls of an (nbx,nby,nbz,M,F) lattice; M x M pair block
    nbx, nby, nbz = NB
    acc = jnp.zeros((nbx, nby, nbz, M), jnp.float32)
    me = lattice  # (nbx,nby,nbz,M,F)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nb = jnp.roll(lattice, (dx, dy, dz), axis=(0, 1, 2))
                # pair sums over the M' axis for each field combination
                d = (me[..., :, None, 0] - nb[..., None, :, 0]) ** 2 \
                    + (me[..., :, None, 1] - nb[..., None, :, 1]) ** 2 \
                    + (me[..., :, None, 2] - nb[..., None, :, 2]) ** 2
                w = jnp.where(d < 0.01, 1.0, 0.0)
                for f in range(3, 11):
                    acc = acc + jnp.sum(
                        w * nb[..., None, :, f], axis=-1)
    return acc


lattice = jnp.asarray(rng.randn(*NB, M, 11), jnp.float32)

print(f"devices: {jax.devices()}", flush=True)
for name, fn, args in [
    ("A packed row gather 11f", variant_a, (packed, idx)),
    ("B per-field 1-D gathers", variant_b, (packedT, idx)),
    ("C packed row gather 8f", variant_c, (packed, idx)),
    ("D take_along_axis local", variant_d, (packedT, idx_sorted_local)),
    ("E 27-roll bin lattice", variant_e, (lattice,)),
]:
    try:
        ms = timeit(fn, *args)
        print(f"{name}: {ms:.2f} ms", flush=True)
    except Exception as e:  # noqa
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
