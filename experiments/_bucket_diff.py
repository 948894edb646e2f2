"""One-window bucket-level differential of bucket_accumulate vs the XLA
capped bucket loop, ON the TPU, at real scale. Prints the count and indices
of mismatching buckets — failure pattern localises the bug (tail buckets →
DMA clipping; everywhere → transpose/mask; block-periodic → lane mapping).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_generator_device
from kzg_tpu.msm.pippenger import _digits

LOG_N = int(os.environ.get("BD_LOGN", "18"))
C = int(os.environ.get("BD_C", "14"))
n = 1 << LOG_N
buckets = 1 << C
rng = np.random.default_rng(7)

gn = 1 << 14
ks = rng.integers(1, 1 << 30, size=gn, dtype=np.int64)
bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
pts = G1.to_affine(G1.scalar_mul_bits(g1_generator_device(gn), jnp.asarray(bits)))
pts = tuple(jnp.tile(p, (1,) * (p.ndim - 1) + (n // gn,)) for p in pts)
xa, ya, inf = pts
K = 24
W_pad = 64

limbs = rng.integers(0, 1 << 16, size=(FR.L, n), dtype=np.uint32)
limbs[-1] &= 0x3FFF
scalars = jax.jit(FR.to_mont)(jnp.asarray(limbs))
dw = np.asarray(_digits(jax.jit(FR.from_mont)(scalars), C))[0]  # window 0

order = np.argsort(dw)
ds = dw[order]
start = np.searchsorted(ds, np.arange(buckets), side="left").astype(np.int32)
end = np.searchsorted(ds, np.arange(buckets), side="right").astype(np.int32)
count = (end - start).astype(np.int32)
count[0] = 0
cap = int(count.max()) + 1
print(f"n=2^{LOG_N} c={C} maxcount={count.max()}", flush=True)

rows = np.concatenate(
    [np.asarray(xa).reshape(K, n), np.asarray(ya).reshape(K, n)], axis=0
).T[order]
rows = np.pad(rows, ((0, 0), (0, W_pad - rows.shape[1])))
spm = jnp.asarray(
    np.pad(rows.reshape(n * W_pad // 128, 128), ((0, 4), (0, 0)))
)

acc0 = G1.infinity((buckets,))
got = G1.bucket_accumulate(
    acc0, spm, jnp.asarray(start), jnp.asarray(count), cap
)
jax.block_until_ready(got)
print("kernel done", flush=True)

# XLA oracle: capped bucket loop over the same sorted rows
spx = jnp.asarray(rows[:, :K].T)
spy = jnp.asarray(rows[:, K : 2 * K].T)
startj = jnp.asarray(start)
countj = jnp.asarray(count)


@jax.jit
def oracle():
    def step(k, acc):
        idx = jnp.clip(startj + k, 0, n - 1)
        valid = k < countj
        qx = jnp.take(spx, idx, axis=-1)
        qy = jnp.take(spy, idx, axis=-1)
        return G1.madd(acc, (qx, qy), ~valid)

    return jax.lax.fori_loop(0, int(count.max()), step, acc0)


want = oracle()
jax.block_until_ready(want)
print("oracle done", flush=True)

eq = np.asarray(G1.eq(got, want))
bad = np.nonzero(~eq)[0]
print(f"mismatching buckets: {bad.size}/{buckets}")
if bad.size:
    print("first 40:", bad[:40].tolist())
    print("lane (b%128):", sorted(set((bad % 128).tolist()))[:20])
    print("sub (b//128%8):", sorted(set(((bad // 128) % 8).tolist())))
    print("blk (b//1024):", sorted(set((bad // 1024).tolist())))
    cnts = count[bad]
    print("counts of bad buckets:", cnts[:20].tolist(), "max", cnts.max())
