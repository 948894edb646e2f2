"""On-TPU NTT correctness + timing at KZG_BENCH-style sizes (LOGN env)."""
import os, time, sys
import numpy as np, jax, jax.numpy as jnp
from kzg_tpu.fields import FR
from kzg_tpu.ntt import Domain

LOG_N = int(os.environ.get("LOGN", "20"))
n = 1 << LOG_N
dom = Domain(LOG_N)
rng = np.random.default_rng(42)
limbs = rng.integers(0, 1 << 16, size=(FR.L, n), dtype=np.uint32)
limbs[-1] &= 0x3FFF
x = jax.jit(FR.to_mont)(jnp.asarray(limbs))
del limbs
# correctness: roundtrip at full size on TPU
ev = dom.ntt(x)
back = dom.intt(ev)
ok = bool(np.asarray(jax.jit(lambda a, b: (a == b).all())(back, x)))
print("roundtrip_ok", ok, file=sys.stderr, flush=True)
del ev, back
# timing (cache-safe: distinct inputs each iteration, every result fetched)
nv = 2
xv = [jnp.roll(x, i + 1, axis=-1) for i in range(nv)] + [x]
jax.block_until_ready(xv)
out = dom.ntt(xv[-1]); np.asarray(out[(0,) * out.ndim]); del out
t0 = time.perf_counter()
for i in range(3):
    o = dom.ntt(xv[i % (nv + 1)])
    np.asarray(o[(0,) * o.ndim])
    del o
dt = (time.perf_counter() - t0) / 3
bfs = (n // 2) * LOG_N
print({"ntt_seconds": round(dt, 4), "butterflies_per_sec": round(bfs / dt, 1),
       "roundtrip_ok": ok})
