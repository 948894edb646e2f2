"""runs-impl window sweep + G2 check + device trace (round 4).

Outputs: per-c timing at 2^20 (G1), a G2 2^16 runs-vs-v1 match + timing,
and a profiler trace of the best G1 config under /tmp/runstrace.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, G2, g1_generator_device, g2_generator_device
from kzg_tpu.msm.pippenger import msm as msm_public
from kzg_tpu.config import configure

LOG_N = 20
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
print("[sweep] G1 inputs ready", flush=True)


def fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


ref = None
best = (None, 1e9)
for c in (14, 15, 16):
    configure(msm_impl="runs", msm_fuse_steps=16)
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
        bt = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            fetch(msm_public(G1, pts, svars[i], c))
            bt = min(bt, time.perf_counter() - t0)
        if bt < best[1]:
            best = (c, bt)
        print(
            f"[sweep] runs c={c:2d}  {bt:7.3f} s  {n/bt/1e3:8.1f} k pts/s"
            f"  match={match}  (first {compile_s:.1f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"[sweep] runs c={c} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

# ---- G2 check at 2^16 ----------------------------------------------------
n2 = 1 << 16
g2n = 1 << 13
ks2 = rng.integers(1, 1 << 30, size=g2n, dtype=np.int64)
bits2 = ((ks2[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
pts2 = G2.to_affine(
    G2.scalar_mul_bits(g2_generator_device(g2n), jnp.asarray(bits2))
)
pts2 = tuple(jnp.tile(p, (1,) * (p.ndim - 1) + (n2 // g2n,)) for p in pts2)
s2 = scalars[..., :n2]
s2v = [jnp.roll(s2, i + 1, axis=-1) for i in range(2)] + [s2]
jax.block_until_ready((pts2, s2v))
print("[sweep] G2 inputs ready", flush=True)

ref2 = None
for name, impl in (("v1", "v1"), ("runs", "runs")):
    configure(msm_impl=impl, msm_fuse_steps=16)
    try:
        t0 = time.perf_counter()
        out = msm_public(G2, pts2, s2v[-1], 12)
        fetch(out)
        compile_s = time.perf_counter() - t0
        if ref2 is None:
            ref2 = out
            match = True
        else:
            match = bool(np.asarray(G2.eq(out, ref2)))
        bt = 1e9
        for i in range(2):
            t0 = time.perf_counter()
            fetch(msm_public(G2, pts2, s2v[i], 12))
            bt = min(bt, time.perf_counter() - t0)
        print(
            f"[sweep] G2 {name:5s} c=12  {bt:7.3f} s  {n2/bt/1e3:8.1f} k pts/s"
            f"  match={match}  (first {compile_s:.1f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"[sweep] G2 {name} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

# ---- trace the best G1 config -------------------------------------------
c = best[0] or 14
configure(msm_impl="runs", msm_fuse_steps=16)
fetch(msm_public(G1, pts, svars[0], c))
with jax.profiler.trace("/tmp/runstrace"):
    fetch(msm_public(G1, pts, svars[1], c))
print(f"[sweep] traced runs c={c} -> /tmp/runstrace", flush=True)
