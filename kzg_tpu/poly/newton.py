"""Fast polynomial division and tree-remaindering multipoint evaluation.

TPU-native O(M(n)) replacements for the reference's quadratic hot paths
(SURVEY.md §7 "hard parts"):

  * general long division (reference polynomial.rs:193-227 is O((n-k)·k)
    schoolbook): here reversal + Newton-iteration power-series inverse —
    O(M(n)) NTT work, log-depth, no sequential scan over the quotient;
  * multipoint evaluation (reference polynomial.rs:329-348 remainders down
    the subproduct tree node by node): here the same remainder-tree
    algorithm but LEVEL-SYNCHRONOUS — every level is one batched Newton
    division over all nodes at once, so a k-point evaluation of a degree-n
    polynomial costs O(M(n) + M(k) log k) instead of O(n·k).

All helpers operate on (L, ..., n) Montgomery limb arrays (limb axis
leading, coefficient index on the lanes) and are shape-static per call.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import FR
from .polynomial import _mul_ntt, _pad_to

_JIT_CACHE = {}


def newton_divmod_jit(f, d, nf: int, nd: int):
    """Jitted newton_divmod, cached per (nf, nd, shapes) so the glue ops
    (pads, reverses, concats) never dispatch op-by-op on the device."""
    key = ("divmod", nf, nd, f.shape, d.shape)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(partial(newton_divmod, nf=nf, nd=nd))
    return _JIT_CACHE[key](f, d)


def eval_points_tree_jit(coeffs, levels, nf: int):
    key = ("evaltree", nf, coeffs.shape, tuple(l.shape for l in levels))
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(partial(eval_points_tree, nf=nf))
    return _JIT_CACHE[key](coeffs, levels)


def _trunc_mul(a, b, m: int):
    """(a * b) mod X^m for coefficient arrays (any matching leading batch
    dims). Full NTT product truncated — the product domain is sized for the
    full out_len so no wraparound aliases into [0, m)."""
    out_len = a.shape[-1] + b.shape[-1] - 1
    return _mul_ntt(a, b, out_len)[..., :m]


def inv_series(d, m: int):
    """Power-series inverse: g with d * g == 1 (mod X^m).

    Newton iteration g_{2t} = g_t * (2 - d * g_t) mod X^{2t}, starting from
    g_1 = 1/d_0 — log2(m) doubling steps, each two truncated NTT products.
    d[..., 0] must be invertible (a nonzero constant term).
    """
    g = FR.inv(d[..., :1])  # (L, ..., 1)
    t = 1
    while t < m:
        t = min(2 * t, m)
        dg = _trunc_mul(d[..., : min(t, d.shape[-1])], g, t)
        # e = 2 - d*g:  negate everything, then add 2 at coefficient 0
        e = FR.neg(dg)
        two = FR.add(FR.one(e.shape[1:-1] + (1,)), FR.one(e.shape[1:-1] + (1,)))
        e = jnp.concatenate([FR.add(e[..., :1], two), e[..., 1:]], axis=-1)
        g = _trunc_mul(g, e, t)
    return g


def _reverse(c, n: int):
    """rev_n: reverse the first n coefficients (c padded/truncated to n)."""
    return _pad_to(c, n)[..., ::-1]


def newton_divmod(f, d, nf: int, nd: int, d_inv_rev=None):
    """Quotient and remainder of f / d via the reversal trick.

    f: (L, ..., >=nf) with true length nf; d: (L, ..., >=nd) with true length
    nd and an invertible leading coefficient. Returns (q, r) with
    q: (L, ..., nf-nd+1), r: (L, ..., max(nd-1, 1)).

    q = rev(rev(f) * rev(d)^{-1} mod X^{nf-nd+1});  r = f - q*d.
    d_inv_rev: optional precomputed inv_series(rev(d), nf-nd+1) — callers
    dividing many polynomials by the same divisor (the remainder tree) pass
    it to amortise the Newton iteration.
    """
    f = f[..., :nf]
    d = d[..., :nd]
    steps = nf - nd + 1
    if steps <= 0:
        return FR.zeros(f.shape[1:-1] + (1,)), f
    fr = _reverse(f, nf)
    if d_inv_rev is None:
        d_inv_rev = inv_series(_reverse(d, nd), steps)
    qr = _trunc_mul(fr, d_inv_rev[..., :steps], steps)
    q = qr[..., ::-1]
    qd = _mul_ntt(q, d, nf)
    r = FR.sub(f, qd)[..., : max(nd - 1, 1)]
    return q, r


# ---------------------------------------------------------------------------
# level-synchronous remainder tree (fast multipoint evaluation)
# ---------------------------------------------------------------------------


def eval_points_tree(coeffs, levels, nf: int):
    """Evaluate one polynomial at all k points of a subproduct tree by
    remaindering down the tree (reference polynomial.rs:329-348 semantics),
    one batched Newton division per level.

    coeffs: (L, n) with true length nf; levels: the SubProductTree level
    list — levels[j] is (L, k/2^j, 2^j + 1) monic node polynomials.
    Returns (L, k) values in point order.
    """
    k = levels[0].shape[1]
    # step 1: f mod root  (degree < k) — one big division
    root = levels[-1][:, 0, :]
    if nf >= k + 1:
        _, r = newton_divmod(coeffs, root, nf, k + 1)
        r = _pad_to(r, k)  # (L, k) remainder, degree < k
    else:
        r = _pad_to(coeffs[..., :nf], k)
    # step 2: walk levels root-1 .. leaves; at each level every current
    # remainder (deg < 2m) is reduced mod BOTH children (deg-m monic) in one
    # batched division over the (nodes, child) axes
    cur = r[:, None, :]  # (L, 1, k)
    for j in range(len(levels) - 2, -1, -1):
        nodes = levels[j]  # (L, k/2^j, 2^j + 1) — the children at this level
        m = nodes.shape[-1] - 1  # child degree
        nf_cur = cur.shape[-1]
        # pair children under their parent: (L, parents, 2, m+1)
        ch = nodes.reshape(FR.L, -1, 2, m + 1)
        par = jnp.broadcast_to(
            cur[:, :, None, :], (FR.L, ch.shape[1], 2, nf_cur)
        )
        _, r2 = newton_divmod(par, ch, nf_cur, m + 1)
        cur = r2.reshape(FR.L, -1, max(m, 1))
    return cur[..., 0]  # leaves: remainder mod (X - x_i) = f(x_i)
