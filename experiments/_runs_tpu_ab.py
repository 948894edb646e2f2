"""Round-4 focused TPU check for the contiguous-run MSM impl.

1. Row-permute microbench with FORCED materialization (sum-reduce the
   gathered rows and fetch the scalar): the earlier take_rows_pad128
   reading (17 TB/s) was impossible and presumably an artifact of the
   remote tunnel; this one cannot be faked.
2. The 'runs' MSM at 2^20, c=14, against the v1 reference output.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_generator_device
from kzg_tpu.msm.pippenger import msm as msm_public
from kzg_tpu.config import configure

LOG_N = int(os.environ.get("AB_LOGN", "20"))
n = 1 << LOG_N
rng = np.random.default_rng(42)

# --- 1. row-permute microbench -------------------------------------------
N = n
for W in (64, 128):
    sp = jnp.asarray(rng.integers(0, 1 << 32, size=(N, W), dtype=np.uint32))
    idxs = [jnp.asarray(rng.permutation(N).astype(np.int32)) for _ in range(4)]
    f = jax.jit(lambda s, i: jnp.take(s, i, axis=0).sum(dtype=jnp.uint32))
    print(float(f(sp, idxs[-1])), flush=True)  # compile + materialize
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        float(f(sp, idxs[i]))
        best = min(best, time.perf_counter() - t0)
    print(
        f"[perm] take W={W:3d} ({W*4}B rows)  {best*1e3:8.2f} ms"
        f"  {N/best/1e6:7.1f} M rows/s  {N*W*4/best/1e9:6.1f} GB/s",
        flush=True,
    )
    del sp, idxs

# --- 2. runs MSM A/B ------------------------------------------------------
limbs = rng.integers(0, 1 << 16, size=(FR.L, n), dtype=np.uint32)
limbs[-1] &= 0x3FFF
scalars = jax.jit(FR.to_mont)(jnp.asarray(limbs))
svars = [jnp.roll(scalars, i + 1, axis=-1) for i in range(3)] + [scalars]

gn = 1 << 17
ks = rng.integers(1, 1 << 30, size=gn, dtype=np.int64)
bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
pts = G1.to_affine(G1.scalar_mul_bits(g1_generator_device(gn), jnp.asarray(bits)))
pts = tuple(jnp.tile(p, (1,) * (p.ndim - 1) + (n // gn,)) for p in pts)
jax.block_until_ready((pts, svars))
print("[ab] inputs ready", flush=True)


def fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


ref = None
for name, conf, c in [
    ("v1 c=14", dict(msm_impl="v1"), 14),
    ("runs c=14", dict(msm_impl="runs"), 14),
]:
    configure(**{"msm_fuse_steps": 16, **conf})
    try:
        t0 = time.perf_counter()
        out = msm_public(G1, pts, svars[-1], c)
        fetch(out)
        compile_s = time.perf_counter() - t0
        if ref is None:
            ref = out
            match = True
        else:
            match = bool(np.asarray(G1.eq(out, ref)))
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            fetch(msm_public(G1, pts, svars[i], c))
            best = min(best, time.perf_counter() - t0)
        print(
            f"[ab] {name:24s} {best:7.3f} s   {n/best/1e3:8.1f} k pts/s"
            f"   match={match}   (first call {compile_s:.1f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"[ab] {name:24s} FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
configure(msm_impl="v1", msm_fuse_steps=16)
