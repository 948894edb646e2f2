"""Full-MSM config sweep at 2^20 on the real chip (cache-safe timing).

Usage: python _msm_sweep.py "v1,14,32" "v1,16,16" ...
Each spec = impl,window,fuse_steps. Prints one line per config and appends
to _msm_sweep.jsonl.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_generator_device
from kzg_tpu.config import configure

LOG_N = 20
n = 1 << LOG_N
rng = np.random.default_rng(42)

limbs = rng.integers(0, 1 << 16, size=(FR.L, n), dtype=np.uint32)
limbs[-1] &= 0x3FFF
scalars = jax.jit(FR.to_mont)(jnp.asarray(limbs))
svars = [jnp.roll(scalars, i + 1, axis=-1) for i in range(2)] + [scalars]

gn = 1 << 17
ks = rng.integers(1, 1 << 30, size=gn, dtype=np.int64)
bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
pts = G1.to_affine(G1.scalar_mul_bits(g1_generator_device(gn), jnp.asarray(bits)))
reps = n // gn
pts = tuple(jnp.tile(p, (1,) * (p.ndim - 1) + (reps,)) for p in pts)
jax.block_until_ready((pts, svars))

from kzg_tpu.msm.pippenger import msm as msm_public

def fetch(out):
    """block_until_ready returns early through the axon tunnel; only a
    host fetch of real bytes proves completion (bench.py _fetch_scalar)."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


for spec in sys.argv[1:]:
    parts = spec.split(",")
    impl, c, fuse = parts[0], int(parts[1]), int(parts[2])
    F = int(parts[3]) if len(parts) > 3 else 1
    gate = bool(int(parts[4])) if len(parts) > 4 else True
    configure(msm_impl=impl, msm_fuse_steps=fuse,
              msm_blocks_per_program=F, msm_gate_rare_dbl=gate)
    t_c0 = time.perf_counter()
    warm = msm_public(G1, pts, svars[0], c)
    fetch(warm)
    compile_s = time.perf_counter() - t_c0
    # cross-config correctness: every config computes the same MSM
    aff = G1.to_affine(tuple(t[..., None] for t in warm))
    got = tuple(np.asarray(t).tolist() for t in aff[:2]) + (
        bool(np.asarray(aff[2])[0]),
    )
    if "expect" not in globals():
        expect = got
    assert got == expect, f"{spec} result mismatch vs first config"
    t0 = time.perf_counter()
    outs = [msm_public(G1, pts, svars[1 + i], c) for i in range(2)]
    for out in outs:
        fetch(out)
    dt = (time.perf_counter() - t0) / 2
    rec = {"impl": impl, "window": c, "fuse": fuse, "blocks": F,
           "gate_dbl": gate, "msm_seconds": round(dt, 3),
           "points_per_sec": round(n / dt, 1),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    with open("_msm_sweep.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
