"""Round-4 MSM A/B on the real chip: v1 (with the new fused Horner-join
kernel) vs the new contiguous-run DMA impl ("runs"), plus a window sweep.
One process, incremental prints, cache-safe input rotation."""
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
    ("v1 c=14 (join-kernel)", dict(msm_impl="v1"), 14),
    ("runs c=14", dict(msm_impl="runs"), 14),
    ("runs c=15", dict(msm_impl="runs"), 15),
    ("runs c=16", dict(msm_impl="runs"), 16),
    ("runs c=14 fuse32", dict(msm_impl="runs", msm_fuse_steps=32), 14),
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
        print(f"[ab] {name:24s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
configure(msm_impl="v1", msm_fuse_steps=16)
