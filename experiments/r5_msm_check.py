"""Quick on-TPU differential for the u16-packed run-DMA bucket kernel:
runs-impl MSM vs the batched-ladder small-MSM oracle (compile-cheap: no v1
graph needed) for G1 at 2^13 (c=10) and G2 at 2^12 (c=10)."""
import random

import numpy as np
import jax.numpy as jnp

from kzg_tpu.constants import R
from kzg_tpu.fields import FR
from kzg_tpu.config import configure, get_config
from kzg_tpu.curve import G1, G2, g1_generator_device, g2_generator_device
from kzg_tpu.msm.pippenger import msm as msm_public

rng = random.Random(5150)

for curve, genfn, logn in ((G1, g1_generator_device, 13),
                           (G2, g2_generator_device, 12)):
    n = 1 << logn
    ks = np.array([rng.randrange(1, 1 << 30) for _ in range(n)])
    bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
    pts = curve.to_affine(
        curve.scalar_mul_bits(genfn(n), jnp.asarray(bits))
    )
    s = jnp.asarray(FR.encode([rng.randrange(R) for _ in range(n)]))
    old_thr = get_config().small_msm_threshold
    try:
        configure(small_msm_threshold=n + 1)  # force the ladder oracle
        want = msm_public(curve, pts, s, 10)
        configure(small_msm_threshold=old_thr, msm_impl="runs")
        got = msm_public(curve, pts, s, 10)
    finally:
        configure(small_msm_threshold=old_thr)
    ok = bool(np.asarray(curve.eq(got, want)))
    print(f"{curve.name} 2^{logn} runs == ladder oracle: {ok}", flush=True)
    assert ok
print("ALL OK")
