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
    """Window size heuristic: bucket count ~ N/8, clamped to [2, 16]."""
    if n <= 16:
        return 2
    return max(2, min(16, int(math.log2(n)) - 3))


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
    n = xa.shape[-1]
    if n < SMALL_MSM_THRESHOLD:
        return _msm_small(curve, xa, ya, inf, scalars_std)
    elem_shape = xa.shape[:-1]  # (L,) for G1, (L, 2) for G2
    digits = _digits(scalars_std, c)  # (W, N)
    w_count = digits.shape[0]
    buckets = 1 << c
    bucket_ids = jnp.arange(buckets, dtype=jnp.int32)
    # x/y/inf interleaved so the inner loop issues ONE gather per step
    K = int(np.prod(elem_shape))
    stacked = jnp.concatenate(
        [xa.reshape(K, n), ya.reshape(K, n), inf[None].astype(xa.dtype)],
        axis=0,
    )

    def window(carry, dw):
        order = jnp.argsort(dw)
        ds = jnp.take(dw, order)
        sp = jnp.take(stacked, order, axis=-1)
        start = jnp.searchsorted(ds, bucket_ids, side="left").astype(jnp.int32)
        end = jnp.searchsorted(ds, bucket_ids, side="right").astype(jnp.int32)
        count = (end - start).at[0].set(0)  # bucket 0 contributes nothing
        maxc = jnp.max(count)
        acc0 = curve.infinity((buckets,))

        def kbody(k, acc):
            idx = jnp.clip(start + k, 0, n - 1)
            valid = k < count
            g = jnp.take(sp, idx, axis=-1)
            qx = g[:K].reshape(elem_shape + (buckets,))
            qy = g[K: 2 * K].reshape(elem_shape + (buckets,))
            qinf = g[2 * K] != 0
            skip = jnp.logical_or(~valid, qinf)
            return curve.madd(acc, (qx, qy), skip)

        # buckets are NOT reduced here: the scan returns all windows'
        # bucket arrays so the (launch-heavy) weighted reduction runs ONCE,
        # batched across the window axis
        return carry, jax.lax.fori_loop(0, maxc, kbody, acc0)

    _, acc_all = jax.lax.scan(window, None, digits)  # leaves: (W, *elem, B)
    acc_b = tuple(jnp.moveaxis(t, 0, -2) for t in acc_all)  # (*elem, W, B)
    s_all = weighted_bucket_sum(curve, acc_b)  # (*elem, W) points

    def join(i, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, a: curve.dbl(a), acc)
        s_w = tuple(t[..., w_count - 1 - i] for t in s_all)
        return curve.add(acc, s_w)

    return jax.lax.fori_loop(0, w_count, join, curve.infinity(()))


_jitted = {}


def msm(curve, points, scalars_mont, c: int | None = None):
    """MSM over a generic curve: points = (x, y, inf_mask) affine batch,
    scalars in Montgomery form (converted to standard form internally).
    Returns a single Jacobian point (batch shape ())."""
    n = points[0].shape[-1]
    if c is None:
        c = pick_window(n)
    key = (id(curve), c)
    if key not in _jitted:
        cur = curve

        @partial(jax.jit, static_argnums=4)
        def run(xa, ya, inf, s_mont, cc):
            return _msm_impl(cur, xa, ya, inf, FR.from_mont(s_mont), cc)

        _jitted[key] = run
    return _jitted[key](points[0], points[1], points[2], scalars_mont, c)


def msm_g1(points, scalars_mont, c: int | None = None):
    return msm(G1, points, scalars_mont, c)


def msm_g2(points, scalars_mont, c: int | None = None):
    return msm(G2, points, scalars_mont, c)
