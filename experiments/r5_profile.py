"""Round-5 stage profile: where does the 2^20 runs-MSM spend its 1.3s, and
how much of the G2-MSM / Lagrange-SRS sections is compile vs device time.

Usage: python experiments/r5_profile.py [msm|g2|lag]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_generator_device
from kzg_tpu.msm.pippenger import (
    _digits, effective_window, msm as msm_public, weighted_bucket_sum,
)

SECTION = sys.argv[1] if len(sys.argv) > 1 else "msm"
rng = np.random.default_rng(7)


def fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


def t(name, fn, variants, iters=3):
    out = fn(variants[0])
    fetch(out)
    t0 = time.perf_counter()
    for i in range(iters):
        fetch(fn(variants[1 + i % (len(variants) - 1)]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def rand_mont(field, count):
    limbs = rng.integers(0, 1 << 16, size=(field.L, count), dtype=np.uint32)
    limbs[-1] &= 0x3FFF
    return jax.jit(field.to_mont)(jnp.asarray(limbs))


def gen_points(curve, genfn, n, gen_log=17):
    gn = min(n, 1 << gen_log)
    ks = rng.integers(1, 1 << 30, size=gn, dtype=np.int64)
    bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
    pts = curve.to_affine(
        curve.scalar_mul_bits(genfn(gn), jnp.asarray(bits))
    )
    if gn < n:
        pts = tuple(
            jnp.tile(p, (1,) * (p.ndim - 1) + (n // gn,)) for p in pts
        )
    return pts


if SECTION == "msm":
    LOG_N = 20
    n = 1 << LOG_N
    c = effective_window(n)
    B = 1 << c
    print(f"n=2^{LOG_N} c={c} B={B}", flush=True)
    pts = gen_points(G1, g1_generator_device, n)
    scalars = rand_mont(FR, n)
    svars = [jnp.roll(scalars, i, axis=-1) for i in range(4)]
    jax.block_until_ready((pts, svars))

    digits_fn = jax.jit(lambda s: _digits(FR.from_mont(s), c))
    dig = digits_fn(svars[0])
    dvars = [digits_fn(s) for s in svars]
    jax.block_until_ready(dvars)
    t("digits (all windows)", digits_fn, svars)

    xa, ya, inf = pts
    K = 24

    def _mk_rows(xa, ya):
        allw = jnp.concatenate(
            [xa.reshape(K, n), ya.reshape(K, n)], axis=0
        )
        return jnp.pad(
            (allw[0::2] | (allw[1::2] << 16)).T, ((0, 0), (0, 32 - K))
        )

    rows = jax.jit(_mk_rows)(xa, ya)
    jax.block_until_ready(rows)

    sort_fn = jax.jit(lambda dw: jnp.argsort(dw))
    w0 = [d[0] for d in dvars]
    t("argsort (1 window)", sort_fn, w0)
    order = sort_fn(w0[0])
    ovars = [sort_fn(w) for w in w0]
    jax.block_until_ready(ovars)

    take_fn = jax.jit(lambda o: jnp.take(rows, o, axis=0))
    t("row permute take (1 window)", take_fn, ovars)

    ds_fn = jax.jit(lambda dw, o: jnp.take(dw, o))
    bounds_fn = jax.jit(
        lambda ds: (
            jnp.searchsorted(
                ds, jnp.arange(B, dtype=jnp.int32), side="left"
            ).astype(jnp.int32),
            jnp.searchsorted(
                ds, jnp.arange(B, dtype=jnp.int32), side="right"
            ).astype(jnp.int32),
        )
    )
    dss = [ds_fn(w, o) for w, o in zip(w0, ovars)]
    t("searchsorted bounds (1 window)", bounds_fn, dss)

    # kernel alone: permuted rows + bounds precomputed
    cap = 4 * (n // B + 1) + 64

    def kernel_only(args):
        spm, start, count = args
        rank = jnp.argsort(count).astype(jnp.int32)
        acc0 = G1.infinity((B,))
        acc = G1.bucket_accumulate(
            acc0, spm, jnp.take(start, rank), jnp.take(count, rank), cap
        )
        inv = jnp.argsort(rank).astype(jnp.int32)
        return tuple(jnp.take(t_, inv, axis=-1) for t_ in acc)

    kj = jax.jit(kernel_only)
    kvars = []
    for w, o in zip(w0, ovars):
        ds = ds_fn(w, o)
        start, end = bounds_fn(ds)
        count = (end - start).at[0].set(0)
        sp = take_fn(o)
        spm = jnp.pad(sp.reshape(n * 32 // 128, 128), ((0, 4), (0, 0)))
        kvars.append((spm, start, count))
    jax.block_until_ready(kvars)
    t("bucket kernel+rank (1 window)", kj, kvars)

    # weighted bucket sum on (W, B) jacobian batch
    W = dig.shape[0]
    accs = kj(kvars[0])
    accW = tuple(
        jnp.broadcast_to(t_[:, None, :], (K, W, B)) for t_ in accs
    )
    wsum_fn = jax.jit(lambda a: weighted_bucket_sum(G1, a))
    avars = [
        tuple(jnp.roll(t_, i, axis=-1) for t_ in accW) for i in range(3)
    ]
    jax.block_until_ready(avars)
    t(f"weighted_bucket_sum (W={W} x B)", wsum_fn, avars)

    s_all = wsum_fn(avars[0])
    join_fn = jax.jit(lambda s: G1.window_join(s, c))
    jvars = [tuple(jnp.roll(t_, i, axis=-1) for t_ in s_all) for i in range(3)]
    jax.block_until_ready(jvars)
    t("window_join", join_fn, jvars)

    t("FULL msm (warm)", lambda s: msm_public(G1, pts, s, c), svars)

elif SECTION == "g2":
    from kzg_tpu.curve import G2, g2_generator_device

    n = 1 << 16
    pts = gen_points(G2, g2_generator_device, n, gen_log=16)
    scalars = rand_mont(FR, n)
    svars = [jnp.roll(scalars, i, axis=-1) for i in range(3)]
    jax.block_until_ready((pts, svars))
    print("g2 inputs ready", flush=True)
    t0 = time.perf_counter()
    fetch(msm_public(G2, pts, svars[0]))
    print(f"g2 msm compile+first-run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t("g2 msm 2^16 (warm)", lambda s: msm_public(G2, pts, s), svars, iters=2)

elif SECTION == "lag":
    from kzg_tpu.kzg.srs import setup_device
    from kzg_tpu.kzg.eval_form import compute_lagrange_basis

    exp = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    nev = 1 << exp
    t0 = time.perf_counter()
    params = setup_device(0x5EED1DEAF00D, nev, g2_count=nev)
    jax.block_until_ready((params.gs, params.hs))
    print(f"setup 2^{exp}: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    lag = compute_lagrange_basis(params, exp)
    jax.block_until_ready((lag.lg, lag.lh))
    print(f"lagrange cold (compile+run): {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    lag = compute_lagrange_basis(params, exp)
    jax.block_until_ready((lag.lg, lag.lh))
    print(f"lagrange warm: {time.perf_counter()-t0:.1f}s", flush=True)
