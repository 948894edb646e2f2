"""Pippenger multi-scalar multiplication, TPU-native.

Replaces blst's `multi_exp` (the reference's single hottest primitive —
SURVEY.md §2.2: every commit/witness/verify calls it, e.g. reference
coeff_form.rs:61,78,102). The GPU/CPU bucket method is scatter-shaped; here
it is reformulated for a vector machine:

  * scalars are sliced into c-bit windows (static digit extraction from the
    16-bit limb representation);
  * per window, points are SORTED by digit (one XLA sort) so each bucket's
    points are contiguous; all 2^c buckets then accumulate IN PARALLEL
    across lanes — iteration k adds the k-th point of every bucket at once
    (masked mixed-add), so the sequential depth is the max bucket load
    (~N/2^c for random scalars) while the vector width is 2^c;
  * bucket reduction sum_b b*B_b uses two log-depth suffix scans of point
    adds (the classic running-sum trick, parallelised);
  * windows joined by Horner: c doublings + 1 add per window.

Everything is branch-free (masked selects), static-shaped, and generic over
the curve (G1 or G2), so the same code serves commits (G1) and the batched
verifier's h^Z (G2, reference coeff_form.rs:161-166).
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import LIMB_BITS
from ..fields import FR
from ..curve import G1, G2


def pick_window(n: int) -> int:
    """Window size heuristic: bucket count ~ N/64, clamped to [2, 16].

    Swept on the bench chip at 2^16 (BENCH_r02 A/B runs): points/s peaked
    at c = log2(n) - 6 (254k at c=10 vs 189k at the round-1 heuristic's
    c=13 and 80k at c=16) — deeper bucket loops but far cheaper weighted
    reductions and wider mean bucket occupancy."""
    if n <= 16:
        return 2
    return max(2, min(16, int(math.log2(n)) - 6))


def effective_window(n: int) -> int:
    """The window msm() uses when the caller passes c=None: the configured
    override, else pick_window — bumped one up for the run-DMA impl, which
    amortises bucket-count costs better than the XLA bucket loop (bucket
    state stays in VMEM; the sorted permute is per-window). Swept on the
    bench chip at 2^20, round 4: 648k pts/s at c=15 vs 531k at v1's
    heuristic c=14 and 564k at c=16."""
    from ..config import get_config

    cfg = get_config()
    c = cfg.msm_window or pick_window(n)
    if cfg.msm_impl == "runs" and cfg.msm_window is None:
        c = min(16, c + 1)
    return c


# Below this size the bucket method's fixed costs (per-window sort + digit
# bookkeeping, ~ceil(255/c) windows) dominate: a batched double-and-add over
# the scalar bits plus one tree sum is both less work and a single compiled
# loop body.
SMALL_MSM_THRESHOLD = 512


def _scalar_bits(scalars_std):
    """(16L, N) 0/1 uint32 rows, LSB first, from (L, N) 16-bit limbs."""
    rows = []
    for limb in range(scalars_std.shape[0]):
        for b in range(LIMB_BITS):
            rows.append((scalars_std[limb] >> b) & 1)
    return jnp.stack(rows).astype(jnp.uint32)


def _msm_small(curve, xa, ya, inf, scalars_std):
    """MSM for small batches: every point multiplied by its own scalar with
    one batched ladder (one fori body), then a tree sum."""
    bits = _scalar_bits(scalars_std)
    base = (xa, ya, curve.fa.one(inf.shape))
    base = curve.select(inf, curve.infinity(inf.shape), base)
    prods = curve.scalar_mul_bits(base, bits)
    return point_sum(curve, prods)


def _digits(scalars_std, c: int):
    """(W, N) int32 window digits from (16, N) standard-form 16-bit limbs."""
    nbits = FR.L * LIMB_BITS
    w_count = -(-nbits // c)
    mask = (1 << c) - 1
    rows = []
    for w in range(w_count):
        bit = w * c
        limb, off = bit // LIMB_BITS, bit % LIMB_BITS
        d = scalars_std[limb] >> off
        if off + c > LIMB_BITS and limb + 1 < FR.L:
            d = d | (scalars_std[limb + 1] << (LIMB_BITS - off))
        rows.append(d & mask)
    return jnp.stack(rows).astype(jnp.int32)


def _signed_digits(scalars_std, c: int):
    """Signed window recoding: returns (mag, neg) of shapes (W+1, N).

    Window digits d_w in [0, 2^c) become e_w in [-2^(c-1), 2^(c-1)-1] by
    borrowing: e = d + carry - 2^c*(d + carry >= 2^(c-1)); one extra
    window absorbs the final carry. mag = |e| in [0, 2^(c-1)], neg = e < 0.
    Halves the bucket count per window (the point is cheaply negated on
    gather: -P = (x, -y)) — SURVEY §7's signed-digit recommendation."""
    digits = _digits(scalars_std, c)  # (W, N) in [0, 2^c)
    half = 1 << (c - 1)
    full = 1 << c
    mags = []
    negs = []
    carry = jnp.zeros_like(digits[0])
    for w in range(digits.shape[0]):
        e = digits[w] + carry
        borrow = e >= half  # includes e == 2^c (-> e' = 0, carry 1)
        e = jnp.where(borrow, e - full, e)
        carry = borrow.astype(digits.dtype)
        mags.append(jnp.abs(e))
        negs.append(e < 0)
    mags.append(carry)  # top window: digit 0/1, never negative
    negs.append(jnp.zeros_like(negs[0]))
    return jnp.stack(mags), jnp.stack(negs)


def _point_suffix_scan(curve, p):
    """suf[b] = sum_{j >= b} p[j] along the last axis via a roll-based
    doubling scan. O(n log n) point work but ONE traced loop body — the
    compile-compact formulation used when point ops are plain XLA (CPU):
    unrolling the group law there costs ~10^3 HLOs per op and a few dozen
    unrolled ops are enough to stall XLA's compiler."""
    n = p[0].shape[-1]
    if n == 1:
        return p
    rounds = max(1, (n - 1).bit_length())
    idx = jnp.arange(n)

    def body(r, acc):
        s = jnp.left_shift(1, r)
        shifted = tuple(jnp.roll(t, -s, axis=-1) for t in acc)
        added = curve.add(acc, shifted)
        return curve.select(idx < n - s, added, acc)

    return jax.lax.fori_loop(0, rounds, body, p)


def _kernels_available(curve) -> bool:
    from ..fields.pallas_field import pallas_enabled

    return pallas_enabled() and getattr(curve, "_kernels", None) is not None


def point_sum(curve, p):
    """Sum of a batch of points along the last axis -> batch-() point.

    With Pallas point kernels: pairwise halving tree — n-1 point adds total
    (each level one batched kernel), log-depth. Without them (CPU), the
    roll-based scan keeps the compiled graph small instead."""
    if not _kernels_available(curve):
        suf = _point_suffix_scan(curve, p)
        return tuple(t[..., 0] for t in suf)
    n = p[0].shape[-1]
    while n > 1:
        if n % 2:
            tail = tuple(t[..., -1:] for t in p)
            p = tuple(t[..., :-1] for t in p)
            lo = tuple(t[..., : n // 2] for t in p)
            hi = tuple(t[..., n // 2:] for t in p)
            s = curve.add(lo, hi)
            p = tuple(
                jnp.concatenate([a, b], axis=-1) for a, b in zip(s, tail)
            )
            n = n // 2 + 1
        else:
            lo = tuple(t[..., : n // 2] for t in p)
            hi = tuple(t[..., n // 2:] for t in p)
            p = curve.add(lo, hi)
            n //= 2
    return tuple(t[..., 0] for t in p)


def weighted_bucket_sum(curve, buckets):
    """S = sum_b b * B_b over the last axis (bucket index = weight).

    Pairwise fold: with T_i = B_{2i} + B_{2i+1} and O_i = B_{2i+1},
        S(B) = 2 * S(T) + sum(O),
    unrolled:     S = sum_l 2^l * sum(O_l).
    The upward pass builds T per level (n/2 + n/4 + ... adds); the odd
    elements of every level are CONCATENATED (level-ascending) into one
    width-(n-1) array whose tail (level >= l) is doubled l times by slicing
    — then a single tree sum finishes. Total ~3n point adds in ~3 log n
    batched kernel launches: log n times less work than a suffix-scan
    formulation and without per-level mini-reductions.

    On the XLA-formula path (CPU) the suffix-scan form is used instead:
    same result, one traced loop body (see _point_suffix_scan)."""
    n = buckets[0].shape[-1]
    assert n & (n - 1) == 0, "bucket count must be a power of two"
    if not _kernels_available(curve):
        # S = sum_{b>=1} suffix_sum(B)[b]
        suf = _point_suffix_scan(curve, buckets)
        return point_sum(curve, tuple(t[..., 1:] for t in suf))
    parts = []   # odd-indexed buckets per level, level-ascending
    widths = []
    p = buckets
    while n > 1:
        even = tuple(t[..., 0::2] for t in p)
        odd = tuple(t[..., 1::2] for t in p)
        parts.append(odd)
        widths.append(n // 2)
        p = curve.add(even, odd)
        n //= 2
    q = tuple(
        jnp.concatenate([pt[i] for pt in parts], axis=-1) for i in range(3)
    )
    offs = np.cumsum(widths)
    # element weights: 2^l for level l -> double the (level >= l) suffix
    for l in range(1, len(widths)):
        off = int(offs[l - 1])
        head = tuple(t[..., :off] for t in q)
        tail = curve.dbl(tuple(t[..., off:] for t in q))
        q = tuple(
            jnp.concatenate([h, t_], axis=-1) for h, t_ in zip(head, tail)
        )
    return point_sum(curve, q)


def _msm_impl(curve, xa, ya, inf, scalars_std, c: int):
    from ..config import get_config

    n = xa.shape[-1]
    if n < get_config().small_msm_threshold:
        return _msm_small(curve, xa, ya, inf, scalars_std)
    elem_shape = xa.shape[:-1]  # (L,) for G1, (L, 2) for G2
    digits = _digits(scalars_std, c)  # (W, N)
    w_count = digits.shape[0]
    buckets = 1 << c
    bucket_ids = jnp.arange(buckets, dtype=jnp.int32)
    # x/y/inf interleaved ROW-MAJOR — (N, 2K+1), one point per row — so
    # every bucket-loop gather reads each point as ONE contiguous ~200B
    # run instead of 2K+1 strided 4B reads. The column-major layout made
    # the chunk gathers the dominant MSM cost (device trace: 1.87s of a
    # 4.4s 2^20 MSM in gathers at ~3.4GB/s effective, vs 0.50s in the
    # madd kernels).
    K = int(np.prod(elem_shape))
    stacked = jnp.concatenate(
        [xa.reshape(K, n), ya.reshape(K, n), inf[None].astype(xa.dtype)],
        axis=0,
    ).T  # (N, 2K+1)

    # static trip cap for the data-dependent bucket loop: ~4x the mean load
    # + slack. Random digit histograms stay far below it; adversarially
    # skewed digits (e.g. all-equal scalars) would otherwise degrade to
    # O(N) sequential adds, so past the cap the window falls back to a
    # segmented-scan bucket sum with guaranteed O(log N) depth.
    cap = 4 * (n // buckets + 1) + 64
    idx_n = jnp.arange(n)

    def window(carry, dw):
        order = jnp.argsort(dw)
        ds = jnp.take(dw, order)
        sp = jnp.take(stacked, order, axis=0)  # (N, 2K+1) row permute
        start = jnp.searchsorted(ds, bucket_ids, side="left").astype(jnp.int32)
        end = jnp.searchsorted(ds, bucket_ids, side="right").astype(jnp.int32)
        count = (end - start).at[0].set(0)  # bucket 0 contributes nothing
        maxc = jnp.max(count)
        acc0 = curve.infinity((buckets,))

        def kbody(k, acc):
            idx = jnp.clip(start + k, 0, n - 1)
            valid = k < count
            g = jnp.take(sp, idx, axis=0).T  # (2K+1, B)
            qx = g[:K].reshape(elem_shape + (buckets,))
            qy = g[K: 2 * K].reshape(elem_shape + (buckets,))
            qinf = g[2 * K] != 0
            skip = jnp.logical_or(~valid, qinf)
            return curve.madd(acc, (qx, qy), skip)

        # fused accumulation: gather S steps' points in ONE take, then run
        # all S madds in ONE Pallas launch with the bucket state resident in
        # VMEM (curve.madd_multi) — removes the per-step gather + launch +
        # bucket HBM round-trip that bounded round 2 at msm_mfu 0.11
        fuse = get_config().msm_fuse_steps if _kernels_available(curve) else 1

        def chunk_body(j, acc):
            ks = j * fuse + jnp.arange(fuse, dtype=jnp.int32)  # (S,)
            pos = jnp.clip(start[None, :] + ks[:, None], 0, n - 1)
            valid = ks[:, None] < count[None, :]  # (S, B)
            g = jnp.take(sp, pos.reshape(-1), axis=0).T  # (2K+1, S*B)
            qx = g[:K].reshape(elem_shape + (fuse, buckets))
            qy = g[K: 2 * K].reshape(elem_shape + (fuse, buckets))
            qinf = g[2 * K].reshape(fuse, buckets) != 0
            skip = jnp.logical_or(~valid, qinf)
            return curve.madd_multi(acc, (qx, qy), skip)

        def bucket_loop(_):
            if fuse > 1:
                return jax.lax.fori_loop(
                    0, (maxc + fuse - 1) // fuse, chunk_body, acc0
                )
            return jax.lax.fori_loop(0, maxc, kbody, acc0)

        def segscan(_):
            spc = sp.T  # (2K+1, N) — the rare fallback pays one transpose
            px = spc[:K].reshape(elem_shape + (n,))
            py = spc[K: 2 * K].reshape(elem_shape + (n,))
            live = jnp.logical_and(ds > 0, spc[2 * K] == 0)
            z = jnp.where(
                curve.fa.expand(live), curve.fa.one((n,)), curve.fa.zeros((n,))
            )
            p = (px, py, z)
            rounds = max(1, (n - 1).bit_length())

            def rbody(r, p):
                s = jnp.left_shift(1, r)
                shifted = tuple(jnp.roll(t, -s, axis=-1) for t in p)
                same = jnp.logical_and(ds == jnp.roll(ds, -s), idx_n < n - s)
                return curve.select(same, curve.add(p, shifted), p)

            p = jax.lax.fori_loop(0, rounds, rbody, p)
            safe_start = jnp.clip(start, 0, n - 1)
            out = tuple(jnp.take(t, safe_start, axis=-1) for t in p)
            # empty buckets must be infinity
            zfix = jnp.where(
                curve.fa.expand(count == 0),
                curve.fa.zeros((buckets,)),
                out[2],
            )
            return (out[0], out[1], zfix)

        # buckets are NOT reduced here: the scan returns all windows'
        # bucket arrays so the (launch-heavy) weighted reduction runs ONCE,
        # batched across the window axis
        return carry, jax.lax.cond(maxc <= cap, bucket_loop, segscan, None)

    _, acc_all = jax.lax.scan(window, None, digits)  # leaves: (W, *elem, B)
    acc_b = tuple(jnp.moveaxis(t, 0, -2) for t in acc_all)  # (*elem, W, B)
    s_all = weighted_bucket_sum(curve, acc_b)  # (*elem, W) points
    return curve.window_join(s_all, c)


def _msm_impl_signed(curve, xa, ya, inf, scalars_std, c: int):
    """v1 window-sequential accumulation with SIGNED digit windows: bucket
    count per window halves (2^(c-1)+1 vs 2^c) at the cost of one extra
    window for the final borrow — less weighted-reduction work and denser
    buckets. Point negation is a masked y-negate on gather (-P = (x, -y)).
    Same capped loop + segmented-scan worst-case fallback as v1."""
    n = xa.shape[-1]
    from ..config import get_config

    if n < get_config().small_msm_threshold:
        return _msm_small(curve, xa, ya, inf, scalars_std)
    elem_shape = xa.shape[:-1]
    mags, negs = _signed_digits(scalars_std, c)  # (W+1, N)
    w_count = mags.shape[0]
    half = 1 << (c - 1)
    # bucket b holds magnitude b+1 (magnitude 0 contributes nothing), so
    # the accumulator stays an exact power of two — a 2^(c-1)+1 layout
    # would pad to the next full lane block and waste ~half the vector
    nb = half
    bucket_ids = jnp.arange(1, half + 1, dtype=jnp.int32)
    K = int(np.prod(elem_shape))
    # row-major, one point per row (see _msm_impl layout note)
    stacked = jnp.concatenate(
        [xa.reshape(K, n), ya.reshape(K, n), inf[None].astype(xa.dtype)],
        axis=0,
    ).T  # (N, 2K+1)
    cap = 4 * (n // nb + 1) + 64
    idx_n = jnp.arange(n)

    def window(carry, mn):
        dw, ng = mn
        order = jnp.argsort(dw)
        ds = jnp.take(dw, order)
        ns = jnp.take(ng, order)
        sp = jnp.take(stacked, order, axis=0)  # (N, 2K+1)
        start = jnp.searchsorted(ds, bucket_ids, side="left").astype(jnp.int32)
        end = jnp.searchsorted(ds, bucket_ids, side="right").astype(jnp.int32)
        count = end - start
        maxc = jnp.max(count)
        acc0 = curve.infinity((nb,))

        def kbody(k, acc):
            idx = jnp.clip(start + k, 0, n - 1)
            valid = k < count
            g = jnp.take(sp, idx, axis=0).T  # (2K+1, nb)
            qx = g[:K].reshape(elem_shape + (nb,))
            qy = g[K: 2 * K].reshape(elem_shape + (nb,))
            qneg = jnp.take(ns, idx)
            qy = jnp.where(curve.fa.expand(qneg), curve.fa.neg(qy), qy)
            qinf = g[2 * K] != 0
            skip = jnp.logical_or(~valid, qinf)
            return curve.madd(acc, (qx, qy), skip)

        # fused S-step accumulation (see _msm_impl); the signed path's
        # point negation rides the kernel's neg mask (negate-on-gather)
        fuse = get_config().msm_fuse_steps if _kernels_available(curve) else 1

        def chunk_body(j, acc):
            ks = j * fuse + jnp.arange(fuse, dtype=jnp.int32)
            pos = jnp.clip(start[None, :] + ks[:, None], 0, n - 1)
            valid = ks[:, None] < count[None, :]
            g = jnp.take(sp, pos.reshape(-1), axis=0).T  # (2K+1, S*nb)
            qx = g[:K].reshape(elem_shape + (fuse, nb))
            qy = g[K: 2 * K].reshape(elem_shape + (fuse, nb))
            qneg = jnp.take(ns, pos.reshape(-1)).reshape(fuse, nb)
            qinf = g[2 * K].reshape(fuse, nb) != 0
            skip = jnp.logical_or(~valid, qinf)
            return curve.madd_multi(acc, (qx, qy), skip, qneg)

        def bucket_loop(_):
            if fuse > 1:
                return jax.lax.fori_loop(
                    0, (maxc + fuse - 1) // fuse, chunk_body, acc0
                )
            return jax.lax.fori_loop(0, maxc, kbody, acc0)

        def segscan(_):
            spc = sp.T  # (2K+1, N)
            px = spc[:K].reshape(elem_shape + (n,))
            py = spc[K: 2 * K].reshape(elem_shape + (n,))
            py = jnp.where(curve.fa.expand(ns), curve.fa.neg(py), py)
            live = jnp.logical_and(ds > 0, spc[2 * K] == 0)
            z = jnp.where(
                curve.fa.expand(live), curve.fa.one((n,)), curve.fa.zeros((n,))
            )
            p = (px, py, z)
            rounds = max(1, (n - 1).bit_length())

            def rbody(r, p):
                s = jnp.left_shift(1, r)
                shifted = tuple(jnp.roll(t, -s, axis=-1) for t in p)
                same = jnp.logical_and(ds == jnp.roll(ds, -s), idx_n < n - s)
                return curve.select(same, curve.add(p, shifted), p)

            p = jax.lax.fori_loop(0, rounds, rbody, p)
            safe_start = jnp.clip(start, 0, n - 1)
            out = tuple(jnp.take(t, safe_start, axis=-1) for t in p)
            zfix = jnp.where(
                curve.fa.expand(count == 0), curve.fa.zeros((nb,)), out[2]
            )
            return (out[0], out[1], zfix)

        return carry, jax.lax.cond(maxc <= cap, bucket_loop, segscan, None)

    _, acc_all = jax.lax.scan(window, None, (mags, negs))
    acc_b = tuple(jnp.moveaxis(t, 0, -2) for t in acc_all)  # (*elem, W+1, nb)
    # sum_b (b+1) * B_b = (weighted-by-index sum) + (plain sum)
    s_w = weighted_bucket_sum(curve, acc_b)  # (*elem, W+1)
    s_p = point_sum(curve, acc_b)            # (*elem, W+1)... reduces last
    s_all = curve.add(s_w, s_p)
    return curve.window_join(s_all, c)


def _msm_impl_runs(curve, xa, ya, inf, scalars_std, c: int):
    """v1 structure with the bucket accumulation done by the contiguous-run
    DMA kernel (curve.bucket_accumulate): per window, one argsort + one XLA
    row permute of the packed point rows, then ONE kernel launch that
    DMA-fetches each bucket's sorted run in 16-point aligned chunks
    (double-buffered against the madds, bucket state resident in VMEM).

    Kills the r4-trace dominators: the per-step XLA chunk gathers (1.87s
    of the 4.4s 2^20 MSM — random 132B rows at ~70ns each) and the
    per-step launch round trips. The row permute (one sorted-row gather
    per window) remains the cost floor. Worst-case digit skew falls back
    to the segmented scan per window, exactly like v1."""
    from ..config import get_config

    n0 = xa.shape[-1]
    if n0 < get_config().small_msm_threshold:
        return _msm_small(curve, xa, ya, inf, scalars_std)
    # the kernel wants at least one whole 1024-lane bucket block; smaller
    # windows (or no TPU kernels) use the XLA bucket loop
    if not _kernels_available(curve) or (1 << c) < 1024:
        return _msm_impl(curve, xa, ya, inf, scalars_std, c)
    elem_shape = xa.shape[:-1]
    K = int(np.prod(elem_shape))  # limb words per coordinate (G1: 24, G2: 48)
    W_pad = 32 * (K // 24)  # packed row width: 32 (G1) / 64 (G2)
    ppm = 128 // W_pad  # points per 128-word memref row: 4 (G1) / 2 (G2)
    # pad the batch to a whole number of 128-word memref rows; padded
    # points get digit 0 (bucket 0 is skipped)
    n = -(-n0 // ppm) * ppm
    if n != n0:
        padw = ((0, 0),) * (xa.ndim - 1) + ((0, n - n0),)
        xa = jnp.pad(xa, padw)
        ya = jnp.pad(ya, padw)
        inf = jnp.pad(inf, (0, n - n0), constant_values=True)
        scalars_std = jnp.pad(scalars_std, ((0, 0), (0, n - n0)))
    digits = _digits(scalars_std, c)  # (W, N)
    digits = jnp.where(inf[None], 0, digits)
    w_count = digits.shape[0]
    buckets = 1 << c
    bucket_ids = jnp.arange(buckets, dtype=jnp.int32)
    # u16-PACKED rows: each 16-bit limb pair rides one u32 word, so a row
    # is (N, K) u32 (x then y limbs, matching the kernel's interleaved
    # unpack), zero-padded to W_pad words and viewed as (N*W_pad//128,
    # 128) inside the window fn. Packing halves the per-window row-permute
    # traffic — the #2 MSM cost in the r4 trace (~0.32s of 1.32s at 2^20).
    allw = jnp.concatenate([xa.reshape(K, n), ya.reshape(K, n)], axis=0)
    rows = (allw[0::2] | (allw[1::2] << 16)).T  # (N, K)
    rows = jnp.pad(rows, ((0, 0), (0, W_pad - K)))
    cap = 4 * (n // buckets + 1) + 64
    idx_n = jnp.arange(n)

    def window(carry, dw):
        order = jnp.argsort(dw)
        ds = jnp.take(dw, order)
        sp = jnp.take(rows, order, axis=0)  # (N, W_pad) sorted rows
        # +4 zero memref rows so a run's last (4, 128) DMA chunk never
        # needs the end-of-array clip (a clipped chunk would read rows
        # SHIFTED from the lane's absolute point index r while the
        # [start, start+count) mask still reads valid — wrong points)
        spm = jnp.pad(
            sp.reshape(n * W_pad // 128, 128), ((0, 4), (0, 0))
        )
        start = jnp.searchsorted(ds, bucket_ids, side="left").astype(jnp.int32)
        end = jnp.searchsorted(ds, bucket_ids, side="right").astype(jnp.int32)
        count = (end - start).at[0].set(0)  # bucket 0 contributes nothing
        maxc = jnp.max(count)
        acc0 = curve.infinity((buckets,))

        def run_kernel(_):
            # rank buckets by occupancy before the kernel: each grid block
            # runs to the MAX trip count of its 1024 buckets, and with
            # random digits (Poisson counts) that max is ~1.6x the mean —
            # grouping like-sized buckets makes every block's max ~ its
            # mean, cutting the skew waste to ~1.1x. Kernel unchanged; the
            # bucket axis is unpermuted afterwards.
            rank = jnp.argsort(count).astype(jnp.int32)
            acc_p = curve.bucket_accumulate(
                acc0,
                spm,
                jnp.take(start, rank),
                jnp.take(count, rank),
                cap,
            )
            inv = jnp.argsort(rank).astype(jnp.int32)
            return tuple(jnp.take(t, inv, axis=-1) for t in acc_p)

        def segscan(_):
            spc = sp.T  # (W_pad, N) u16-packed; rows beyond K are padding
            pk = spc[:K]
            unp = jnp.stack([pk & 0xFFFF, pk >> 16], axis=1).reshape(2 * K, n)
            px = unp[:K].reshape(elem_shape + (n,))
            py = unp[K:].reshape(elem_shape + (n,))
            live = ds > 0
            z = jnp.where(
                curve.fa.expand(live), curve.fa.one((n,)), curve.fa.zeros((n,))
            )
            p = (px, py, z)
            rounds = max(1, (n - 1).bit_length())

            def rbody(r, p):
                s = jnp.left_shift(1, r)
                shifted = tuple(jnp.roll(t, -s, axis=-1) for t in p)
                same = jnp.logical_and(ds == jnp.roll(ds, -s), idx_n < n - s)
                return curve.select(same, curve.add(p, shifted), p)

            p = jax.lax.fori_loop(0, rounds, rbody, p)
            safe_start = jnp.clip(start, 0, n - 1)
            out = tuple(jnp.take(t, safe_start, axis=-1) for t in p)
            zfix = jnp.where(
                curve.fa.expand(count == 0), curve.fa.zeros((buckets,)), out[2]
            )
            return (out[0], out[1], zfix)

        return carry, jax.lax.cond(maxc <= cap, run_kernel, segscan, None)

    _, acc_all = jax.lax.scan(window, None, digits)  # leaves: (W, *elem, B)
    acc_b = tuple(jnp.moveaxis(t, 0, -2) for t in acc_all)  # (*elem, W, B)
    s_all = weighted_bucket_sum(curve, acc_b)
    return curve.window_join(s_all, c)


# ---------------------------------------------------------------------------
# v2 bucket accumulation: all windows in lanes + batched-affine adds
# ---------------------------------------------------------------------------


def _affine_madd_batch(curve, acc, pt, skip):
    """Batched-affine accumulate acc += pt over arbitrary lanes.

    acc = (x, y, inf) affine accumulator; pt = (x, y) affine points
    (callers mask infinity/padding via `skip`). ONE batched inversion (tree
    form, fields.batch_inv) serves every lane: slope denominators are
    inverted together, so a lane costs ~6 field muls vs the Jacobian mixed
    add's 11 — the classic batch-affine Pippenger trick, SIMD-shaped.
    Doubling (acc == pt) takes the tangent slope via selects; opposite
    points yield infinity. (No 2-torsion on BLS12-381 — |E| is odd — so
    y == 0 tangents cannot occur.)"""
    f = curve.fa
    ax, ay, ainf = acc
    px, py = pt
    e = f.expand
    dx = f.sub(px, ax)
    dy = f.sub(py, ay)
    dx0 = f.is_zero(dx)
    dbl = jnp.logical_and(dx0, f.is_zero(dy))
    opp = jnp.logical_and(dx0, ~dbl)
    x2 = f.sqr(ax)
    num = jnp.where(e(dbl), f.add(f.add(x2, x2), x2), dy)  # 3x^2 | dy
    den = jnp.where(e(dbl), f.add(ay, ay), dx)             # 2y   | dx
    degenerate = jnp.logical_or(jnp.logical_or(skip, ainf), opp)
    den_safe = jnp.where(e(degenerate), f.one(skip.shape), den)
    dinv = f.batch_inv(den_safe)
    lam = f.mul(num, dinv)
    x3 = f.sub(f.sub(f.sqr(lam), ax), px)
    y3 = f.sub(f.mul(lam, f.sub(ax, x3)), ay)
    out_x = jnp.where(e(skip), ax, jnp.where(e(ainf), px, x3))
    out_y = jnp.where(e(skip), ay, jnp.where(e(ainf), py, y3))
    out_inf = jnp.where(skip, ainf, jnp.where(ainf, False, opp))
    return (out_x, out_y, out_inf)


def _affine_to_jac(curve, acc):
    """(x, y, inf) affine batch -> Jacobian tuple (z = 0 at infinity)."""
    f = curve.fa
    x, y, inf = acc
    z = jnp.where(f.expand(inf), f.zeros(inf.shape), f.one(inf.shape))
    return (x, y, z)


def _msm_impl_v2(curve, xa, ya, inf, scalars_std, c: int,
                 affine: bool = False):
    """v2 bucket accumulation. Differences from _msm_impl:

      * ALL windows live in lanes (one (W, B) bucket matrix) instead of a
        sequential lax.scan over windows — W x fewer sequential steps, each
        W x wider (launch/dispatch-bound hardware loves this);
      * the data-dependent inner trip count is CAPPED: if the fullest
        bucket exceeds cap (adversarially skewed digits; random scalars
        stay well under it), the whole accumulation falls back to a
        segmented-scan formulation with guaranteed O(log n) depth per
        window — the worst case is bounded, not O(n) serial;
      * affine=True accumulates buckets in AFFINE form with one batched
        tree inversion per step (~6 field muls/lane vs 11 for Jacobian
        mixed adds). Less arithmetic, but each step becomes ~2 log B
        dependent kernel launches for the inversion tree — measured SLOWER
        on the launch-bound bench chip, kept selectable (config
        msm_impl="affine") for hardware where fusion amortises launches.
    """
    n = xa.shape[-1]
    from ..config import get_config

    if n < get_config().small_msm_threshold:
        return _msm_small(curve, xa, ya, inf, scalars_std)
    elem_shape = xa.shape[:-1]
    K = int(np.prod(elem_shape))
    digits = _digits(scalars_std, c)  # (W, N)
    w_count = digits.shape[0]
    buckets = 1 << c
    # infinity points contribute nothing: force their digits to bucket 0
    digits = jnp.where(inf[None], 0, digits)
    order = jnp.argsort(digits, axis=-1)
    ds = jnp.take_along_axis(digits, order, axis=-1)
    bucket_ids = jnp.arange(buckets, dtype=jnp.int32)
    start = jax.vmap(
        lambda row: jnp.searchsorted(row, bucket_ids, side="left")
    )(ds).astype(jnp.int32)
    end = jax.vmap(
        lambda row: jnp.searchsorted(row, bucket_ids, side="right")
    )(ds).astype(jnp.int32)
    count = (end - start).at[:, 0].set(0)  # bucket 0 contributes nothing
    maxc = jnp.max(count)
    # row-major, one point per row (see _msm_impl layout note)
    stacked = jnp.concatenate(
        [xa.reshape(K, n), ya.reshape(K, n)], axis=0
    ).T  # (N, 2K)

    wb = (w_count, buckets)

    def gather_step(k):
        pos = jnp.clip(start + k, 0, n - 1)  # (W, B)
        valid = k < count
        oi = jnp.take_along_axis(order, pos, axis=-1)  # (W, B) original idx
        g = jnp.take(stacked, oi.reshape(-1), axis=0).T  # (2K, W*B)
        qx = g[:K].reshape(elem_shape + wb)
        qy = g[K:].reshape(elem_shape + wb)
        return (qx, qy), ~valid

    if affine:
        acc0 = (curve.fa.zeros(wb), curve.fa.zeros(wb), jnp.ones(wb, bool))

        def kbody(k, acc):
            q, skip = gather_step(k)
            return _affine_madd_batch(curve, acc, q, skip)
    else:
        acc0 = curve.infinity(wb)

        def kbody(k, acc):
            q, skip = gather_step(k)
            return curve.madd(acc, q, skip)  # fused Pallas mixed add

    # static trip cap: ~4x the mean load + slack; random digit histograms
    # stay far below it (mean n/B, max ~ mean + O(sqrt(mean log B)))
    cap = 4 * (n // buckets + 1) + 64

    # fused S-step accumulation over the flattened (W*B) lane space (see
    # _msm_impl); Jacobian path only — the affine variant's batched
    # inversion is a different kernel shape
    fuse = (
        get_config().msm_fuse_steps
        if (_kernels_available(curve) and not affine)
        else 1
    )
    wb_flat = w_count * buckets

    def chunk_body(j, acc):
        ks = j * fuse + jnp.arange(fuse, dtype=jnp.int32)  # (S,)
        pos = jnp.clip(start[None] + ks[:, None, None], 0, n - 1)  # (S,W,B)
        valid = ks[:, None, None] < count[None]
        oi = jnp.take_along_axis(
            jnp.broadcast_to(order[None], (fuse,) + order.shape), pos, axis=-1
        )
        g = jnp.take(stacked, oi.reshape(-1), axis=0).T  # (2K, S*W*B)
        qx = g[:K].reshape(elem_shape + (fuse, wb_flat))
        qy = g[K:].reshape(elem_shape + (fuse, wb_flat))
        skip = ~valid.reshape(fuse, wb_flat)
        return curve.madd_multi(acc, (qx, qy), skip)

    def bucket_path(_):
        if fuse > 1:
            flat_acc = tuple(
                t.reshape(elem_shape + (wb_flat,)) for t in acc0
            )
            out = jax.lax.fori_loop(
                0, (maxc + fuse - 1) // fuse, chunk_body, flat_acc
            )
            return tuple(t.reshape(elem_shape + wb) for t in out)
        acc = jax.lax.fori_loop(0, maxc, kbody, acc0)
        return _affine_to_jac(curve, acc) if affine else acc

    def segscan_path(_):
        # robust fallback: per window (sequential scan over W), a segmented
        # suffix sum over the sorted point sequence — log2(n) rounds of
        # masked Jacobian adds, immune to bucket skew
        idx = jnp.arange(n)

        def wbody(carry, inputs):
            ds_w, order_w = inputs
            sp = jnp.take(stacked, order_w, axis=0).T  # (2K, N) sorted pts
            px = sp[:K].reshape(elem_shape + (n,))
            py = sp[K:].reshape(elem_shape + (n,))
            z = jnp.where(
                curve.fa.expand(ds_w > 0),
                curve.fa.one((n,)),
                curve.fa.zeros((n,)),
            )
            p = (px, py, z)
            rounds = max(1, (n - 1).bit_length())

            def rbody(r, p):
                s = jnp.left_shift(1, r)
                shifted = tuple(jnp.roll(t, -s, axis=-1) for t in p)
                same = jnp.logical_and(
                    ds_w == jnp.roll(ds_w, -s), idx < n - s
                )
                added = curve.add(p, shifted)
                return curve.select(same, added, p)

            p = jax.lax.fori_loop(0, rounds, rbody, p)
            # bucket sums sit at each bucket's start position
            return carry, p

        # start positions differ per window; gather after the scan
        _, summed = jax.lax.scan(wbody, None, (ds, order))
        # summed leaves: (W, *elem, N); gather each window's bucket starts
        def gather_buckets(t):
            t = jnp.moveaxis(t, 0, -2)  # (*elem, W, N)
            return jnp.take_along_axis(
                t,
                jnp.broadcast_to(
                    jnp.clip(start, 0, n - 1), t.shape[:-1] + (buckets,)
                ),
                axis=-1,
            )

        jac = tuple(gather_buckets(t) for t in summed)
        # empty buckets (count == 0) must be infinity
        emptym = count == 0
        zfix = jnp.where(
            curve.fa.expand(emptym), curve.fa.zeros(wb), jac[2]
        )
        return (jac[0], jac[1], zfix)

    acc_jac = jax.lax.cond(maxc <= cap, bucket_path, segscan_path, None)
    # acc_jac: (*elem, W, B) Jacobian buckets
    s_all = weighted_bucket_sum(curve, acc_jac)  # (*elem, W) points
    return curve.window_join(s_all, c)


_jitted = {}
_adders = {}


def _add_jitted(curve):
    """Cached jitted Jacobian add for combining chunked-MSM partials."""
    if curve.name not in _adders:
        cur = curve
        _adders[curve.name] = jax.jit(lambda p, q: cur.add(p, q))
    return _adders[curve.name]


def msm(curve, points, scalars_mont, c: int | None = None):
    """MSM over a generic curve: points = (x, y, inf_mask) affine batch,
    scalars in Montgomery form (converted to standard form internally).
    Returns a single Jacobian point (batch shape ())."""
    from ..config import get_config

    cfg = get_config()
    n = points[0].shape[-1]
    chunk = 1 << cfg.msm_chunk_log
    if n > chunk:
        # memory-bounded streaming: full Pippenger per 2^msm_chunk_log-point
        # chunk, Jacobian-add the partials (one tiny add per chunk). Same
        # decomposition as the sharded multi-chip MSM (parallel/msm.py),
        # run sequentially on one chip.
        acc = None
        for off in range(0, n, chunk):
            part = msm(
                curve,
                tuple(t[..., off: off + chunk] for t in points),
                scalars_mont[..., off: off + chunk],
                c,
            )
            acc = part if acc is None else _add_jitted(curve)(acc, part)
        return acc
    if c is None:
        c = effective_window(n)
    if cfg.msm_impl == "v1":
        impl = _msm_impl
    elif cfg.msm_impl == "v1s":
        impl = _msm_impl_signed
    elif cfg.msm_impl == "runs":
        impl = _msm_impl_runs
    elif cfg.msm_impl == "affine":
        impl = partial(_msm_impl_v2, affine=True)
    else:
        impl = _msm_impl_v2
    # key by curve NAME, not id(): id() of a collected object can be reused,
    # which would be a latent wrong-curve cache hit. The threshold, fuse
    # depth and kernel-shape knobs are part of the key because they are
    # baked in at trace time.
    key = (
        curve.name, c, cfg.msm_impl, cfg.small_msm_threshold,
        cfg.msm_fuse_steps, cfg.msm_blocks_per_program,
        cfg.msm_gate_rare_dbl,
    )
    if key not in _jitted:
        cur = curve

        @partial(jax.jit, static_argnums=4)
        def run(xa, ya, inf, s_mont, cc):
            return impl(cur, xa, ya, inf, FR.from_mont(s_mont), cc)

        _jitted[key] = run
    return _jitted[key](points[0], points[1], points[2], scalars_mont, c)


def msm_g1(points, scalars_mont, c: int | None = None):
    return msm(G1, points, scalars_mont, c)


def msm_g2(points, scalars_mont, c: int | None = None):
    return msm(G2, points, scalars_mont, c)
