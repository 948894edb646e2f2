"""Quick A/B of the count-rank bucket permutation (runs c=15, 2^20)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_generator_device
from kzg_tpu.msm.pippenger import msm as msm_public, _msm_impl
from kzg_tpu.config import configure

n = 1 << 20
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
print("[rank] inputs ready", flush=True)

def fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])

configure(msm_impl="runs", msm_fuse_steps=16)
t0 = time.perf_counter()
out = msm_public(G1, pts, svars[-1], 15)
fetch(out)
print(f"[rank] first call {time.perf_counter()-t0:.1f}s", flush=True)
# correctness vs the v1 XLA impl
configure(msm_impl="v1")
want = msm_public(G1, pts, svars[-1], 15)
match = bool(np.asarray(G1.eq(out, want)))
configure(msm_impl="runs")
best = 1e9
for i in range(3):
    t0 = time.perf_counter()
    fetch(msm_public(G1, pts, svars[i], 15))
    best = min(best, time.perf_counter() - t0)
print(f"[rank] runs c=15 rank-permuted  {best:.3f} s  {n/best/1e3:.1f} k pts/s  match={match}", flush=True)
