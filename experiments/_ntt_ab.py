"""NTT A/B on the real chip: VPU butterfly path vs MXU matmul-DFT path.

Also cross-checks the two paths produce identical results, and reports
butterfly-equivalent throughput for each. Usage:
    python _ntt_ab.py [log_n ...]   (default 20)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.fields import FR
from kzg_tpu.config import configure
from kzg_tpu.ntt import Domain

logs = [int(a) for a in sys.argv[1:]] or [20]
rng = np.random.default_rng(42)


def fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, variants, iters=3):
    fetch(fn(variants[0]))
    t0 = time.perf_counter()
    outs = [fn(variants[1 + (i % (len(variants) - 1))]) for i in range(iters)]
    for o in outs:
        fetch(o)
    return (time.perf_counter() - t0) / iters


for LOG_N in logs:
    n = 1 << LOG_N
    limbs = rng.integers(0, 1 << 16, size=(FR.L, n), dtype=np.uint32)
    limbs[-1] &= 0x3FFF
    x = jax.jit(FR.to_mont)(jnp.asarray(limbs))
    xv = [jnp.roll(x, i + 1, axis=-1) for i in range(3)] + [x]
    jax.block_until_ready(xv)
    bf = (n // 2) * LOG_N

    results = {}
    for mode in ("off", "auto"):
        configure(ntt_mxu=mode)
        Domain._cache.clear()  # jitted transforms bake the mode in
        dom = Domain(LOG_N)
        t_c = time.perf_counter()
        out0 = dom.ntt(xv[-1])
        fetch(out0)
        compile_s = time.perf_counter() - t_c
        dt = timeit(dom.ntt, xv)
        results[mode] = (dt, np.asarray(out0[:, :4]))
        print(f"2^{LOG_N} ntt_mxu={mode:4s}: {dt*1e3:8.2f} ms  "
              f"{bf/dt/1e6:8.1f} M butterflies/s  (compile {compile_s:.0f}s)",
              flush=True)
    same = np.array_equal(results["off"][1], results["auto"][1])
    print(f"2^{LOG_N} spot outputs equal: {same}", flush=True)
    assert same
