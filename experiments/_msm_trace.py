"""Capture a jax.profiler device trace of one full 2^20 MSM, then summarize
per-op device time from the perfetto trace.json.gz."""
import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_generator_device
from kzg_tpu.msm.pippenger import msm as msm_public

LOG_N = 20
n = 1 << LOG_N
rng = np.random.default_rng(42)

limbs = rng.integers(0, 1 << 16, size=(FR.L, n), dtype=np.uint32)
limbs[-1] &= 0x3FFF
scalars = jax.jit(FR.to_mont)(jnp.asarray(limbs))
s2 = jnp.roll(scalars, 1, axis=-1)

gn = 1 << 17
ks = rng.integers(1, 1 << 30, size=gn, dtype=np.int64)
bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
pts = G1.to_affine(G1.scalar_mul_bits(g1_generator_device(gn), jnp.asarray(bits)))
pts = tuple(jnp.tile(p, (1,) * (p.ndim - 1) + (n // gn,)) for p in pts)
jax.block_until_ready((pts, scalars, s2))


def fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


# warm compile
fetch(msm_public(G1, pts, scalars, 14))

jax.profiler.start_trace("/tmp/msmtrace")
t0 = time.perf_counter()
fetch(msm_public(G1, pts, s2, 14))
wall = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f"traced msm wall: {wall:.3f}s", flush=True)

files = glob.glob("/tmp/msmtrace/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # find device-side complete events (ph == 'X') grouped by name
    per_op = defaultdict(float)
    cnt = defaultdict(int)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname and "/device" not in pname:
            continue
        name = e.get("name", "?")
        per_op[name] += e.get("dur", 0) / 1e6
        cnt[name] += 1
    if not per_op:
        # fall back: take all X events
        for e in events:
            if e.get("ph") == "X":
                per_op[e.get("name", "?")] += e.get("dur", 0) / 1e6
                cnt[e.get("name", "?")] += 1
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:30]
    tot = sum(per_op.values())
    print(f"\n{f}: total op-seconds {tot:.2f}")
    for name, sec in top:
        print(f"  {sec:8.3f}s  x{cnt[name]:5d}  {name[:90]}")
