"""G2 MSM window/impl A/B at the bench shape (2^16, bench.py's generator
seed), chasing the r4 G2 delta: BENCH r3 g2 = 186.0k pts/s (v1, c=10) vs
r4 = 178.3k (runs, c=11 via the bumped heuristic)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.fields import FR
from kzg_tpu.curve import G2, g2_generator_device
from kzg_tpu.msm.pippenger import msm as msm_public
from kzg_tpu.config import configure

n2 = 1 << 16
rng = np.random.default_rng(42)
ks2 = rng.integers(1, 1 << 30, size=n2, dtype=np.int64)
bits2 = ((ks2[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
pts2 = G2.to_affine(
    G2.scalar_mul_bits(g2_generator_device(n2), jnp.asarray(bits2))
)
limbs = rng.integers(0, 1 << 16, size=(FR.L, n2), dtype=np.uint32)
limbs[-1] &= 0x3FFF
s2 = jax.jit(FR.to_mont)(jnp.asarray(limbs))
s2v = [jnp.roll(s2, i + 1, axis=-1) for i in range(3)] + [s2]
jax.block_until_ready((pts2, s2v))
print("[g2ab] inputs ready", flush=True)


def fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


ref = None
for name, impl, c in [
    ("v1   c=10", "v1", 10),
    ("runs c=10", "runs", 10),
    ("runs c=11", "runs", 11),
    ("runs c=12", "runs", 12),
]:
    configure(msm_impl=impl, msm_fuse_steps=16)
    try:
        t0 = time.perf_counter()
        out = msm_public(G2, pts2, s2v[-1], c)
        fetch(out)
        compile_s = time.perf_counter() - t0
        if ref is None:
            ref = out
            match = True
        else:
            match = bool(np.asarray(G2.eq(out, ref)))
        bt = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            fetch(msm_public(G2, pts2, s2v[i], c))
            bt = min(bt, time.perf_counter() - t0)
        print(
            f"[g2ab] {name}  {bt:7.3f} s  {n2/bt/1e3:8.1f} k pts/s"
            f"  match={match}  (first {compile_s:.1f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"[g2ab] {name} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
configure(msm_impl="runs", msm_fuse_steps=16)
