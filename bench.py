"""Headline benchmark: single-chip G1 Pippenger MSM throughput.

The MSM is the reference's single hottest primitive (every commit, witness,
and batched verify is one `multi_exp` call — SURVEY.md §2.2); points/sec on
one chip is therefore the framework's headline number. Prints ONE JSON line.

The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
as 1.0 by convention; the value itself is tracked round over round by the
driver in BENCH_r{N}.json.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from kzg_tpu.constants import R
    from kzg_tpu.fields import FR
    from kzg_tpu.curve import G1, g1_generator_device
    from kzg_tpu.msm.pippenger import _msm_impl, pick_window

    n = 1 << 16
    c = pick_window(n)

    # point batch: k*G for random 30-bit k via the batched ladder
    rng = np.random.default_rng(42)
    ks = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
    pts = G1.to_affine(
        G1.scalar_mul_bits(g1_generator_device(n), jnp.asarray(bits))
    )
    # full-range 255-bit scalars (uniform mod r) — the real workload; small
    # scalars would leave most windows empty and overstate throughput
    words = rng.integers(0, 1 << 62, size=(n, 5), dtype=np.int64)
    scalars_int = [
        (int(w[0]) | int(w[1]) << 62 | int(w[2]) << 124 | int(w[3]) << 186
         | int(w[4]) << 248) % R
        for w in words
    ]
    scalars = jnp.asarray(FR.encode(scalars_int))

    run = jax.jit(
        lambda x, y, inf, s: _msm_impl(G1, x, y, inf, FR.from_mont(s), c)
    )

    # warmup/compile
    out = run(pts[0], pts[1], pts[2], scalars)
    jax.block_until_ready(out)

    # Each iteration uses DISTINCT scalars and every result is fetched to
    # host: identical repeated executions can be served from a cache by the
    # remote-device tunnel, which makes same-input timing loops report
    # physically impossible rates.
    iters = 5
    variants = [jnp.roll(scalars, i + 1, axis=-1) for i in range(iters)]
    jax.block_until_ready(variants)
    t0 = time.perf_counter()
    outs = [run(pts[0], pts[1], pts[2], s) for s in variants]
    for o in outs:
        np.asarray(o[0])
    dt = (time.perf_counter() - t0) / iters

    pps = n / dt
    print(json.dumps({
        "metric": "g1_msm_points_per_sec_2e16",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
