"""Micro-profile of the v1 MSM's per-window components at 2^20 on TPU.

Times, per window: argsort, the full permutation take of the stacked point
array, the searchsorted bucket bounds, the chunked gather, and the
madd_multi kernel — to find where the 4.4s (MFU 0.12) actually goes.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_generator_device
from kzg_tpu.config import get_config

LOG_N = 20
n = 1 << LOG_N
c = 14
B = 1 << c
rng = np.random.default_rng(42)


def t(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return dt


limbs = rng.integers(0, 1 << 16, size=(FR.L, n), dtype=np.uint32)
limbs[-1] &= 0x3FFF
scalars = jax.jit(FR.to_mont)(jnp.asarray(limbs))

# point batch (tiled 2^17 to keep generation fast; workload-neutral)
gn = 1 << 17
ks = rng.integers(1, 1 << 30, size=gn, dtype=np.int64)
bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
pts = G1.to_affine(G1.scalar_mul_bits(g1_generator_device(gn), jnp.asarray(bits)))
reps = n // gn
pts = tuple(jnp.tile(p, (1,) * (p.ndim - 1) + (reps,)) for p in pts)
xa, ya, inf = pts
K = FR.L + 8  # FP has 24 limbs; G1 elem_shape = (24,)
print("K(elem limbs) =", xa.shape)

stacked = jnp.concatenate(
    [xa.reshape(xa.shape[0], n), ya.reshape(ya.shape[0], n),
     inf[None].astype(xa.dtype)], axis=0)
print("stacked", stacked.shape)

from kzg_tpu.msm.pippenger import _digits

digits = jax.jit(lambda s: _digits(FR.from_mont(s), c))(scalars)
dw = digits[0]

# --- per-window pieces ---
argsort = jax.jit(lambda d: jnp.argsort(d))
order = argsort(dw)
t("argsort (2^20 i32)", argsort, dw)

perm = jax.jit(lambda sp, o: jnp.take(sp, o, axis=-1))
sp = perm(stacked, order)
t("permute stacked (49, 2^20)", perm, stacked, order)

bucket_ids = jnp.arange(B, dtype=jnp.int32)
ss = jax.jit(lambda ds: (jnp.searchsorted(ds, bucket_ids, side="left"),
                         jnp.searchsorted(ds, bucket_ids, side="right")))
ds = jnp.take(dw, order)
t("searchsorted x2", ss, ds)

start, end = ss(ds)
start = start.astype(jnp.int32)
count = (end - start).at[0].set(0).astype(jnp.int32)

S = get_config().msm_fuse_steps
print("fuse steps:", S)


def one_chunk(sp, start, count, j):
    ksv = j * S + jnp.arange(S, dtype=jnp.int32)
    pos = jnp.clip(start[None, :] + ksv[:, None], 0, n - 1)
    valid = ksv[:, None] < count[None, :]
    g = jnp.take(sp, pos.reshape(-1), axis=-1)
    return g, valid


gather = jax.jit(lambda sp, start, count: one_chunk(sp, start, count, 0)[0])
t("chunk gather (49, S*B)", gather, sp, start, count)

# madd_multi kernel alone
elem_shape = (xa.shape[0],)
acc0 = G1.infinity((B,))
g, valid = jax.jit(lambda sp, s, c_: one_chunk(sp, s, c_, 0))(sp, start, count)
qx = g[:xa.shape[0]].reshape(elem_shape + (S, B))
qy = g[xa.shape[0]:2 * xa.shape[0]].reshape(elem_shape + (S, B))
skip = jnp.logical_or(~valid, g[2 * xa.shape[0]].reshape(S, B) != 0)
mm = jax.jit(lambda a, x, y, sk: G1.madd_multi(a, (x, y), sk))
dt_mm = t("madd_multi (S steps, B lanes)", mm, acc0, qx, qy, skip)
muls = S * B * 11
print(f"  kernel mul rate: {muls/dt_mm/1e6:.1f} M Fp-muls/s")

# single fused madd for comparison
md = jax.jit(lambda a, x, y, sk: G1.madd(a, (x, y), sk[0]))
dt_md = t("single madd (B lanes)", md, acc0, qx[:, 0], qy[:, 0], skip)
print(f"  kernel mul rate: {B*11/dt_md/1e6:.1f} M Fp-muls/s")

# full window via the real code path, for reference
from kzg_tpu.msm.pippenger import msm as msm_public
dt_full = t("FULL msm 2^20 (all windows)", lambda s: msm_public(G1, pts, s, c),
            scalars, iters=1)
w_count = -(-255 // c)
print(f"per-window budget: {dt_full/w_count*1e3:.1f} ms over {w_count} windows")
