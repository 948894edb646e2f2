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
    """suf[b] = sum_{j >= b} p[j] along the last (bucket) axis, log-depth."""
    n = p[0].shape[-1]
    if n == 1:
        return p
    rounds = max(1, (n - 1).bit_length())
    bdim = curve._bdim()
    idx = jnp.arange(n)

    def body(r, acc):
        s = jnp.left_shift(1, r)
        shifted = tuple(jnp.roll(t, -s, axis=-1) for t in acc)
        added = curve.add(acc, shifted)
        return curve.select(idx < n - s, added, acc)

    return jax.lax.fori_loop(0, rounds, body, p)


def point_sum(curve, p):
    """Sum of a batch of points along the last axis -> batch-() point."""
    suf = _point_suffix_scan(curve, p)
    return tuple(t[..., 0] for t in suf)


def _msm_impl(curve, xa, ya, inf, scalars_std, c: int):
    n = xa.shape[-1]
    digits = _digits(scalars_std, c)  # (W, N)
    w_count = digits.shape[0]
    buckets = 1 << c
    bucket_ids = jnp.arange(buckets, dtype=jnp.int32)

    def window(carry, dw):
        order = jnp.argsort(dw)
        ds = jnp.take(dw, order)
        px = jnp.take(xa, order, axis=-1)
        py = jnp.take(ya, order, axis=-1)
        pinf = jnp.take(inf, order)
        start = jnp.searchsorted(ds, bucket_ids, side="left").astype(jnp.int32)
        end = jnp.searchsorted(ds, bucket_ids, side="right").astype(jnp.int32)
        count = (end - start).at[0].set(0)  # bucket 0 contributes nothing
        maxc = jnp.max(count)
        acc0 = curve.infinity((buckets,))

        def kbody(k, acc):
            idx = jnp.clip(start + k, 0, n - 1)
            valid = k < count
            qx = jnp.take(px, idx, axis=-1)
            qy = jnp.take(py, idx, axis=-1)
            qinf = jnp.take(pinf, idx)
            skip = jnp.logical_or(~valid, qinf)
            return curve.madd(acc, (qx, qy), skip)

        acc = jax.lax.fori_loop(0, maxc, kbody, acc0)
        # S_w = sum_b b * B_b  ==  sum_{b>=1} suffix_sum(B)[b]
        suf = _point_suffix_scan(curve, acc)
        s_w = point_sum(curve, tuple(t[..., 1:] for t in suf))
        return carry, s_w

    _, s_all = jax.lax.scan(window, None, digits)  # leaves: (W, ...) stacked

    def join(i, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, a: curve.dbl(a), acc)
        s_w = tuple(t[w_count - 1 - i] for t in s_all)
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
