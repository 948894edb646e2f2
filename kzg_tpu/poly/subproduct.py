"""SubProductTree, vanishing polynomials, and Lagrange interpolation.

TPU-native redesign of reference components #5/#6 (polynomial.rs:229-392):
the tree is built level-synchronously — every level is ONE batched NTT
multiplication over all node pairs at once (the reference recurses node by
node, polynomial.rs:310-327) — and interpolation uses the same
derivative-of-product construction (polynomial.rs:237-293) but with all k
quotients Z/(X - x_i) produced by one batched suffix-scan division and
combined with a single sum reduction.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import R
from ..fields import FR
from .polynomial import Polynomial, _div_by_linear, _eval_many, _pad_to, _mul_ntt


def _build_levels(xs):
    """xs: (L, k) points. Returns list of levels; level j is an
    (L, k/2^j, 2^j + 1) array of monic node polynomials (padded batch must
    be a power of two — pad with (X - 0) = X and discard via slicing? No:
    we require k to be a power of two and make callers pad; see
    SubProductTree.from_points)."""
    k = xs.shape[-1]
    assert k & (k - 1) == 0, "point count must be a power of two"
    # leaves: (X - x_i) -> coeffs [-x_i, 1]
    negx = FR.neg(xs)  # (L, k)
    ones = FR.one((k,))
    level = jnp.stack([negx, ones], axis=-1)  # (L, k, 2)
    levels = [level]
    while level.shape[1] > 1:
        b = level.shape[1]
        left = level[:, 0::2, :]
        right = level[:, 1::2, :]
        out_len = 2 * level.shape[-1] - 1
        level = _mul_ntt(left, right, out_len)
        levels.append(level)
    return levels


class SubProductTree:
    """Binary tree of products prod(X - x_i), built level-synchronously.

    Mirrors the reference's SubProductTree (polynomial.rs:303-327): exposes
    `product` (the root), structural left/right access via the level arrays,
    fast multipoint evaluation, and linear-mod-combination for interpolation.
    """

    def __init__(self, xs, levels):
        self.xs = xs
        self.levels = levels

    @classmethod
    def from_points(cls, xs):
        """xs: (L, k) device array of points, k a power of two (callers with
        other sizes should use `vanishing_poly`/`lagrange_interpolation`,
        which handle any k)."""
        return cls(xs, _build_levels(xs))

    @property
    def product(self) -> Polynomial:
        root = self.levels[-1][:, 0, :]
        return Polynomial(root, root.shape[-1] - 1)

    def eval_points(self, poly: Polynomial):
        """Fast multipoint evaluation of `poly` at the tree's points.

        Remainders down the tree level-synchronously (reference
        polynomial.rs:329-348 semantics; one batched Newton division per
        level) for large point counts; small batches use direct vectorised
        evaluation, which is both simpler and faster there."""
        from ..config import get_config

        k = self.xs.shape[-1]
        thr = get_config().tree_eval_threshold
        if k < thr and poly.num_coeffs() * k < (1 << 22):
            return poly.eval_many(self.xs)
        from .newton import eval_points_tree_jit

        return eval_points_tree_jit(poly.trimmed(), self.levels, poly.num_coeffs())

    def linear_mod_combination(self, cs):
        """sum_i cs_i * Z(X)/(X - x_i)  (polynomial.rs:350-364 semantics),
        via one batched linear division + one reduction."""
        z = self.product
        q, _ = _div_by_linear(z.trimmed(), self.xs)  # (L, k, deg)
        weighted = FR.mul(q, cs[..., None])
        summed = FR.sum_last(jnp.moveaxis(weighted, 1, -1))  # sum over k
        return Polynomial(summed, z.degree - 1)


def lagrange_interpolation_with_tree(xs, ys, tree: "SubProductTree") -> Polynomial:
    """Interpolation reusing a prebuilt SubProductTree (reference
    polynomial.rs:237-264): weights c_i = y_i / m'(x_i) with m = tree
    root, then one linear-mod-combination. Amortises the tree across
    repeated interpolations at the same points (the batched-witness path
    builds the tree once for remainder + vanishing use).

    Single-point quirk preserved for reference parity, matching
    lagrange_interpolation: returns the degree-1 polynomial X + (y0 - x0)
    rather than the constant y0 (polynomial.rs:244-247, 269-272)."""
    if xs.shape[-1] == 1:
        c = jnp.concatenate(
            [FR.sub(ys[..., 0:1], xs[..., 0:1]), FR.one((1,))], axis=-1
        )
        return Polynomial(c, 1)
    mp = poly_derivative(tree.product)
    w = mp.eval_many(xs)  # m'(x_i)  (L, k)
    cs = FR.mul(ys, FR.batch_inv(w))
    return tree.linear_mod_combination(cs)


def multi_eval_tree(poly: Polynomial, xs):
    """Evaluate `poly` at any (L, k) point batch via the remainder tree
    (k padded to a power of two with copies of x_0 — the padded lanes are
    computed and discarded). O(M(n) + M(k) log k) vs direct O(n·k); use for
    large k on large polynomials (polynomial.rs:329-348 parity at scale)."""
    k = xs.shape[-1]
    kp = 1 << max(1, (k - 1).bit_length())
    if kp != k:
        pad = jnp.broadcast_to(xs[..., :1], (FR.L, kp - k))
        xs = jnp.concatenate([xs, pad], axis=-1)
    tree = SubProductTree.from_points(xs)
    from .newton import eval_points_tree_jit

    vals = eval_points_tree_jit(poly.trimmed(), tree.levels, poly.num_coeffs())
    return vals[..., :k]


def vanishing_poly(xs) -> Polynomial:
    """Z(X) = prod (X - x_i) for any point count: level-synchronous batched
    products with odd nodes set aside and folded back in at the end. This is
    the TPU shape of the reference's op_tree-built Z (coeff_form.rs:150-159
    uses op_tree over naive muls)."""
    k = xs.shape[-1]
    level = jnp.stack([FR.neg(xs), FR.one((k,))], axis=-1)  # (L, k, 2) leaves
    spare = []  # odd nodes (L, len_j), at most one per level
    while level.shape[1] > 1:
        if level.shape[1] % 2 == 1:
            spare.append(level[:, -1, :])
            level = level[:, :-1, :]
        out_len = 2 * level.shape[-1] - 1
        level = _mul_ntt(level[:, 0::2, :], level[:, 1::2, :], out_len)
    root = level[:, 0, :]
    for s in spare:
        root = _mul_ntt(root, s, root.shape[-1] + s.shape[-1] - 1)
    return Polynomial(root, root.shape[-1] - 1)


def poly_derivative(p: Polynomial) -> Polynomial:
    """Formal derivative (used for the interpolation weights m'(x_i),
    polynomial.rs:249-254)."""
    n = p.num_coeffs()
    if n <= 1:
        return Polynomial.new_zero()
    idx = jnp.asarray(FR.encode(list(range(1, n))))  # (L, n-1): constants 1..n-1
    c = FR.mul(p.trimmed()[..., 1:], idx)
    return Polynomial(c, p.degree - 1)


def lagrange_interpolation(xs, ys) -> Polynomial:
    """Unique degree-<k interpolant through (x_i, y_i), via the
    derivative-of-product construction (polynomial.rs:237-293):
        m(X) = prod (X - x_i);  c_i = y_i / m'(x_i)
        r(X) = sum_i c_i * m(X)/(X - x_i)

    Single-point quirk preserved for reference parity: returns the degree-1
    polynomial X + (y0 - x0) rather than the constant y0
    (polynomial.rs:244-247)."""
    k = xs.shape[-1]
    if k == 1:
        y0 = ys[..., 0:1]
        x0 = xs[..., 0:1]
        c = jnp.concatenate([FR.sub(y0, x0), FR.one((1,))], axis=-1)
        return Polynomial(c, 1)
    z = vanishing_poly(xs)
    mp = poly_derivative(z)
    w = _eval_many(mp.trimmed(), xs)  # m'(x_i)  (L, k)
    cs = FR.mul(ys, FR.batch_inv(w))
    q, _ = _div_by_linear(z.trimmed(), xs)  # (L, k, k)
    weighted = FR.mul(q, cs[..., None])
    summed = FR.sum_last(jnp.moveaxis(weighted, 1, -1))
    return Polynomial(summed, k - 1)
