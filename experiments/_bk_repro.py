import os, time; os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np, jax.numpy as jnp, random
from kzg_tpu.curve.ops import CurveOps
from kzg_tpu.curve import FPA, g1_generator_device
from kzg_tpu.curve.pallas_ops import _PointKernels, LANES
from kzg_tpu.fields import FP

rng = random.Random(0)
ref = CurveOps(FPA, name="G1ref")
B = LANES
n = 2048
t0=time.time()
gd = g1_generator_device(n)
# cheap distinct points: k*G for k = 1..n via ladder of small bit-length
ks = np.arange(1, n+1, dtype=np.int64)
bits = ((ks[None,:] >> np.arange(12)[:,None]) & 1).astype(np.uint32)
p = ref.scalar_mul_bits(gd, jnp.asarray(bits))
px, py, _ = ref.to_affine(p)
jax.block_until_ready((px, py))
print(f"points {time.time()-t0:.1f}s", flush=True)

digits = np.asarray([rng.randrange(B) for _ in range(n)], dtype=np.int32)
digits[:16] = 0
order = np.argsort(digits, kind="stable")
ds = digits[order]
start = np.searchsorted(ds, np.arange(B), side="left").astype(np.int32)
end = np.searchsorted(ds, np.arange(B), side="right").astype(np.int32)
count = (end - start).astype(np.int32); count[0] = 0
cap = int(count.max()) + 3
print("cap", cap, flush=True)
rows = np.concatenate([np.asarray(px), np.asarray(py)], axis=0).T[order]
rows = np.pad(rows, ((0,0),(0,64-rows.shape[1])))
spm = jnp.asarray(rows.reshape(n*64//128, 128))

kern = _PointKernels(FP, ncomp=1, interpret=True)
acc0 = ref.infinity((B,))
t0=time.time()
got = kern.bucket_accumulate(acc0, spm, jnp.asarray(start), jnp.asarray(count), cap)
jax.block_until_ready(got)
print(f"kernel {time.time()-t0:.1f}s", flush=True)
