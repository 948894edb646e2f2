"""A/B: gather layouts/patterns for the MSM bucket loop on TPU.

Distinct indices per iteration defeat the axon tunnel's identical-execution
cache; arrays are passed as jit ARGUMENTS (a closure capture bakes them into
the HLO as a giant literal and blows the remote-compile transport).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

n = 1 << 20
rows = 49
SB = 16 * 16384  # fuse * buckets at c=14

rng = np.random.default_rng(0)
col_np = rng.integers(0, 1 << 16, size=(rows, n), dtype=np.uint32)
col = jnp.asarray(col_np)
posv = [jnp.asarray(rng.integers(0, n, size=SB, dtype=np.int32))
        for _ in range(4)]
# the MSM's ACTUAL pattern: for step k, lane b reads start[b] + k where
# start is sorted (bucket starts ascend); consecutive lanes hit nearly
# consecutive columns
startv = []
for _ in range(4):
    s = np.sort(rng.integers(0, n, size=16384, dtype=np.int32))
    ks = np.arange(16, dtype=np.int32)
    startv.append(jnp.asarray(
        np.clip(s[None, :] + ks[:, None], 0, n - 1).reshape(-1)))
jax.block_until_ready((col, posv, startv))


def t(name, fn, arr, variants, iters=6):
    out = fn(arr, variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(arr, variants[i % len(variants)])
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    gb = out.size * 4 / 1e9
    print(f"{name:46s} {dt*1e3:8.2f} ms   out {gb*1e3:6.1f} MB  {gb/dt:6.1f} GB/s",
          flush=True)
    return dt


cg = jax.jit(lambda a, p: jnp.take(a, p, axis=-1))
t("col gather (49,n) random idx", cg, col, posv)
t("col gather (49,n) MSM near-sorted idx", cg, col, startv)

rg = jax.jit(lambda a, p: jnp.take(a, p, axis=0))
for pad in (64, 128):
    rowm = jnp.asarray(np.ascontiguousarray(
        np.pad(col_np, ((0, pad - rows), (0, 0))).T))
    jax.block_until_ready(rowm)
    t(f"row gather (n,{pad}) random idx", rg, rowm, posv)
    t(f"row gather (n,{pad}) MSM near-sorted idx", rg, rowm, startv)

# one-hot matmul alternative for comparison at small scale is skipped
# (O(n*SB) flops — hopeless at 2^20).

# dynamic-slice streaming bound: what pure sequential reads of the same
# volume cost (the speed-of-light for any gather formulation)
sl = jax.jit(lambda a, o: jax.lax.dynamic_slice_in_dim(a, o[0], SB, axis=1))
offs = [jnp.asarray([i * 1024], jnp.int32) for i in range(4)]
t("contiguous slice (49, SB) [bound]", sl, col, offs)
