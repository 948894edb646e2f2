"""Multi-device MSM scaling-efficiency sweep (BASELINE.md: >= 80% at N >= 2).

    python -m kzg_tpu.bench.scaling                  # 1/2/4/8 virtual CPU devs
    python -m kzg_tpu.bench.scaling --log-n 16       # bigger problem
    KZG_SCALING_BACKEND=tpu python -m kzg_tpu.bench.scaling --devices 1,4

Times `parallel.msm.make_sharded_msm` (the DP-sharded Pippenger: local
bucket MSM per device + all_gather join, SURVEY.md §5.8) at a FIXED total
problem size across device counts — strong scaling, the BASELINE.md
methodology. On this single-chip environment the sweep runs on a virtual
CPU mesh (xla_force_host_platform_device_count), so the ABSOLUTE numbers
are meaningless — virtual devices share one core — but the harness is the
measurement methodology VERDICT r2 #7 asked to rehearse: on a real pod
slice the same command produces the real efficiency curve (the collective
join is O(1) in N, so the curve measures local-kernel + ICI overhead only).

Emits ONE JSON line:
  {"metric": "msm_scaling_sweep", "sweep": [{"devices": N,
    "seconds": t, "points_per_sec": r, "efficiency_vs_1dev": e}, ...]}
"""

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--log-n", type=int, default=14)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    dev_counts = [int(d) for d in args.devices.split(",")]

    backend = os.environ.get("KZG_SCALING_BACKEND", "cpu")
    if backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={max(dev_counts)}"
            ).strip()
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from kzg_tpu.fields import FR
    from kzg_tpu.curve import G1, g1_generator_device
    from kzg_tpu.parallel.msm import make_sharded_msm

    n = 1 << args.log_n
    avail = len(jax.devices())
    rng = np.random.default_rng(42)

    print(
        f"[scaling] backend={jax.default_backend()} devices={avail} "
        f"n=2^{args.log_n}",
        file=sys.stderr, flush=True,
    )

    # point batch: k*G for random 20-bit k (one batched ladder)
    ks = rng.integers(1, 1 << 20, size=n, dtype=np.int64)
    bits = ((ks[None, :] >> np.arange(20)[:, None]) & 1).astype(np.uint32)
    pts = G1.to_affine(
        G1.scalar_mul_bits(g1_generator_device(n), jnp.asarray(bits))
    )
    limbs = rng.integers(0, 1 << 16, size=(FR.L, n), dtype=np.uint32)
    limbs[-1] &= 0x3FFF
    scalars = jax.jit(FR.to_mont)(jnp.asarray(limbs))
    jax.block_until_ready((pts, scalars))

    sweep = []
    base_rate = None
    for nd in dev_counts:
        if nd > avail:
            print(f"[scaling] skip {nd} devices (only {avail})",
                  file=sys.stderr, flush=True)
            continue
        mesh = Mesh(np.array(jax.devices()[:nd]), ("shard",))
        run = make_sharded_msm(mesh, "shard")
        p = tuple(jax.device_put(t, s)
                  for t, s in zip(pts, run.sharding_points))
        s = jax.device_put(scalars, run.sharding_scalars)
        variants = [jnp.roll(s, i, axis=-1) for i in range(3)]
        out = run(p, variants[0])  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [run(p, variants[1 + i % 2]) for i in range(args.iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters
        rate = n / dt
        if base_rate is None:
            base_rate = rate
            eff = 1.0
        else:
            eff = rate / (base_rate * nd / dev_counts[0])
        sweep.append({
            "devices": nd,
            "seconds": round(dt, 4),
            "points_per_sec": round(rate, 1),
            "points_per_sec_per_device": round(rate / nd, 1),
            "efficiency_vs_1dev": round(eff, 4),
        })
        print(f"[scaling] {nd} dev: {dt:.3f}s  {rate:,.0f} pts/s  "
              f"eff={eff:.2%}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "msm_scaling_sweep",
        "value": sweep[-1]["efficiency_vs_1dev"] if sweep else None,
        "unit": "efficiency_vs_1dev",
        "backend": jax.default_backend(),
        "log_n": args.log_n,
        "virtual_mesh": backend == "cpu",
        "sweep": sweep,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
