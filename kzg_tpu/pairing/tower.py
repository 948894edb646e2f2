"""On-device Fp2/Fp6/Fp12 tower arithmetic over the limb field.

TPU-native replacement for blst's extension-field tower (the reference gets
Gt arithmetic from blstrs — SURVEY.md §2.2 'Fp/Fp2/Fp6/Fp12 tower'). The
tower matches the oracle (oracle/field.py) and zkcrypto conventions:

    Fp2  = Fp[u]  / (u^2 + 1)
    Fp6  = Fp2[v] / (v^3 - xi),  xi = u + 1
    Fp12 = Fp6[w] / (w^2 - v)

Representation: an Fp12 element is one (L, 12, *batch) uint32 array; the
second axis is [c0.c0.a, c0.c0.b, c0.c1.a, c0.c1.b, c0.c2.a, c0.c2.b,
c1.c0.a, ...] — i.e. index 2*(3*i + j) + k = w^i v^j u^k coefficient. Fp6 is
(L, 6, *batch) and Fp2 is (L, 2, *batch). Keeping the tower inside ONE array
makes Fp12 values legal lax.scan carries, which the pow ladders and the
Miller loop rely on.

All Frobenius constants are derived from Python ints at import time (no
magic constants), mirroring constants.py's policy.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import P
from ..fields import FP

# ---------------------------------------------------------------------------
# Fp2: (L, 2, *batch), u^2 = -1
# ---------------------------------------------------------------------------


def f2_add(x, y):
    return FP.add(x, y)


def f2_sub(x, y):
    return FP.sub(x, y)


def f2_neg(x):
    return FP.neg(x)


def f2_mul(x, y):
    a, b = x[:, 0], x[:, 1]
    c, d = y[:, 0], y[:, 1]
    ac = FP.mul(a, c)
    bd = FP.mul(b, d)
    t = FP.mul(FP.add(a, b), FP.add(c, d))
    return jnp.stack([FP.sub(ac, bd), FP.sub(FP.sub(t, ac), bd)], axis=1)


def f2_sqr(x):
    a, b = x[:, 0], x[:, 1]
    re = FP.mul(FP.add(a, b), FP.sub(a, b))
    ab = FP.mul(a, b)
    return jnp.stack([re, FP.add(ab, ab)], axis=1)


def f2_conj(x):
    return jnp.stack([x[:, 0], FP.neg(x[:, 1])], axis=1)


def f2_mul_xi(x):
    """Multiply by xi = 1 + u: (a+bu)(1+u) = (a-b) + (a+b)u."""
    a, b = x[:, 0], x[:, 1]
    return jnp.stack([FP.sub(a, b), FP.add(a, b)], axis=1)


def f2_mul_fp(x, s):
    """Multiply by an Fp element s of shape (L, *batch)."""
    return FP.mul(x, s[:, None])


def f2_inv(x):
    a, b = x[:, 0], x[:, 1]
    norm = FP.add(FP.sqr(a), FP.sqr(b))
    ninv = FP.inv(norm)
    return jnp.stack([FP.mul(a, ninv), FP.neg(FP.mul(b, ninv))], axis=1)


def f2_zero(batch=()):
    return jnp.zeros((FP.L, 2) + tuple(batch), jnp.uint32)


def f2_one(batch=()):
    return jnp.stack([FP.one(batch), FP.zeros(batch)], axis=1)


def f2_is_zero(x):
    return jnp.all(x == 0, axis=(0, 1))


def f2_encode(c0: int, c1: int):
    """Host: (c0 + c1 u) -> (L, 2) Montgomery constant (no batch dims; use
    _match_rank to broadcast against batched elements)."""
    return jnp.stack(
        [jnp.asarray(FP.encode([c0]))[:, 0], jnp.asarray(FP.encode([c1]))[:, 0]],
        axis=1,
    )


def _match_rank(const, x):
    """Reshape an (L, k) constant to (L, k, 1, ..., 1) matching x's rank so
    limb-level broadcasting lines up (a rank mismatch would silently outer-
    broadcast (L,) against (L, 1) into (L, L))."""
    return const.reshape(const.shape + (1,) * (x.ndim - const.ndim))


# ---------------------------------------------------------------------------
# Fp6: (L, 6, *batch) = 3 x Fp2, v^3 = xi
# ---------------------------------------------------------------------------


def _c6(x, i):
    return x[:, 2 * i: 2 * i + 2]


def _pack6(c0, c1, c2):
    return jnp.concatenate([c0, c1, c2], axis=1)


def f6_add(x, y):
    return FP.add(x, y)


def f6_sub(x, y):
    return FP.sub(x, y)


def f6_neg(x):
    return FP.neg(x)


def f6_mul(x, y):
    a0, a1, a2 = _c6(x, 0), _c6(x, 1), _c6(x, 2)
    b0, b1, b2 = _c6(y, 0), _c6(y, 1), _c6(y, 2)
    t0 = f2_mul(a0, b0)
    t1 = f2_mul(a1, b1)
    t2 = f2_mul(a2, b2)
    c0 = f2_add(t0, f2_mul_xi(f2_sub(f2_sub(f2_mul(f2_add(a1, a2), f2_add(b1, b2)), t1), t2)))
    c1 = f2_add(f2_sub(f2_sub(f2_mul(f2_add(a0, a1), f2_add(b0, b1)), t0), t1), f2_mul_xi(t2))
    c2 = f2_add(f2_sub(f2_sub(f2_mul(f2_add(a0, a2), f2_add(b0, b2)), t0), t2), t1)
    return _pack6(c0, c1, c2)


def f6_sqr(x):
    return f6_mul(x, x)


def f6_mul_v(x):
    """(c0 + c1 v + c2 v^2) * v = c2*xi + c0 v + c1 v^2."""
    return _pack6(f2_mul_xi(_c6(x, 2)), _c6(x, 0), _c6(x, 1))


def f6_mul_f2(x, s):
    c0 = f2_mul(_c6(x, 0), s)
    c1 = f2_mul(_c6(x, 1), s)
    c2 = f2_mul(_c6(x, 2), s)
    return _pack6(c0, c1, c2)


def f6_inv(x):
    a, b, c = _c6(x, 0), _c6(x, 1), _c6(x, 2)
    t0 = f2_sub(f2_sqr(a), f2_mul_xi(f2_mul(b, c)))
    t1 = f2_sub(f2_mul_xi(f2_sqr(c)), f2_mul(a, b))
    t2 = f2_sub(f2_sqr(b), f2_mul(a, c))
    denom = f2_add(f2_mul(a, t0), f2_mul_xi(f2_add(f2_mul(c, t1), f2_mul(b, t2))))
    dinv = f2_inv(denom)
    return _pack6(f2_mul(t0, dinv), f2_mul(t1, dinv), f2_mul(t2, dinv))


def f6_zero(batch=()):
    return jnp.zeros((FP.L, 6) + tuple(batch), jnp.uint32)


def f6_one(batch=()):
    return _pack6(f2_one(batch), f2_zero(batch), f2_zero(batch))


# ---------------------------------------------------------------------------
# Fp12: (L, 12, *batch) = 2 x Fp6, w^2 = v
# ---------------------------------------------------------------------------


def _c12(x, i):
    return x[:, 6 * i: 6 * i + 6]


def _pack12(c0, c1):
    return jnp.concatenate([c0, c1], axis=1)


def f12_add(x, y):
    return FP.add(x, y)


def f12_mul(x, y):
    a0, a1 = _c12(x, 0), _c12(x, 1)
    b0, b1 = _c12(y, 0), _c12(y, 1)
    t0 = f6_mul(a0, b0)
    t1 = f6_mul(a1, b1)
    c0 = f6_add(t0, f6_mul_v(t1))
    c1 = f6_sub(f6_sub(f6_mul(f6_add(a0, a1), f6_add(b0, b1)), t0), t1)
    return _pack12(c0, c1)


def f12_sqr(x):
    """Complex squaring: (a0 + a1 w)^2 with w^2 = v."""
    a0, a1 = _c12(x, 0), _c12(x, 1)
    t = f6_mul(a0, a1)
    c0 = f6_sub(
        f6_mul(f6_add(a0, a1), f6_add(a0, f6_mul_v(a1))),
        f6_add(t, f6_mul_v(t)),
    )
    c1 = f6_add(t, t)
    return _pack12(c0, c1)


def f12_conj(x):
    """x^(p^6): negate the odd part."""
    return _pack12(_c12(x, 0), f6_neg(_c12(x, 1)))


def f12_inv(x):
    a0, a1 = _c12(x, 0), _c12(x, 1)
    denom = f6_sub(f6_sqr(a0), f6_mul_v(f6_sqr(a1)))
    dinv = f6_inv(denom)
    return _pack12(f6_mul(a0, dinv), f6_neg(f6_mul(a1, dinv)))


def f12_zero(batch=()):
    return jnp.zeros((FP.L, 12) + tuple(batch), jnp.uint32)


def f12_one(batch=()):
    return _pack12(f6_one(batch), f6_zero(batch))


def f12_is_one(x):
    return jnp.all(x == f12_one(x.shape[2:]), axis=(0, 1))


def f12_eq(x, y):
    return jnp.all(x == y, axis=(0, 1))


def f12_select(cond, x, y):
    return jnp.where(cond[None, None], x, y)


# ---- Frobenius ------------------------------------------------------------
# gamma constants: xi^((p-1) * k / 6) for k = 1..5 (Fp2 values), derived at
# import from Python ints (mirrors oracle/field.py _xi_pow).


def _xi_pow_int(num: int, den: int):
    """(a, b) ints with (1+u)^((p-1)*num/den) = a + b u."""
    e = (P - 1) * num // den
    a, b = 1, 0
    ba, bb = 1, 1  # base = 1 + u
    while e:
        if e & 1:
            a, b = (a * ba - b * bb) % P, (a * bb + b * ba) % P
        ba, bb = (ba * ba - bb * bb) % P, (2 * ba * bb) % P
        e >>= 1
    return a, b


_G6_1 = _xi_pow_int(1, 3)  # for Fp6 frobenius c1
_G6_2 = _xi_pow_int(2, 3)  # for Fp6 frobenius c2
_G12_1 = _xi_pow_int(1, 6)  # for Fp12 frobenius c1

_G6_1_DEV = None
_G6_2_DEV = None
_G12_1_DEV = None


def _frob_consts():
    global _G6_1_DEV, _G6_2_DEV, _G12_1_DEV
    if _G6_1_DEV is None:
        _G6_1_DEV = f2_encode(*_G6_1)
        _G6_2_DEV = f2_encode(*_G6_2)
        _G12_1_DEV = f2_encode(*_G12_1)
    return _G6_1_DEV, _G6_2_DEV, _G12_1_DEV


def f6_frobenius(x):
    g1, g2, _ = _frob_consts()
    c0 = f2_conj(_c6(x, 0))
    c1 = f2_mul(f2_conj(_c6(x, 1)), _match_rank(g1, x))
    c2 = f2_mul(f2_conj(_c6(x, 2)), _match_rank(g2, x))
    return _pack6(c0, c1, c2)


def f12_frobenius(x):
    _, _, g12 = _frob_consts()
    c0 = f6_frobenius(_c12(x, 0))
    c1 = f6_mul_f2(f6_frobenius(_c12(x, 1)), _match_rank(g12, x))
    return _pack12(c0, c1)


# ---- cyclotomic arithmetic -------------------------------------------------
# For f in the cyclotomic subgroup (f^(p^4 - p^2 + 1) = 1, i.e. anything
# after the easy part of the final exponentiation) squaring compresses to
# three Fp4 squarings (Granger–Scott), ~2.3x cheaper than generic f12_sqr.
# Differentially tested against f12_sqr on cyclotomic elements
# (tests/test_pairing.py).


def _fp4_sqr(a, b):
    """(a + b s)^2 in Fp4 = Fp2[s]/(s^2 - xi): returns (c0, c1)."""
    t0 = f2_sqr(a)
    t1 = f2_sqr(b)
    c0 = f2_add(f2_mul_xi(t1), t0)
    c1 = f2_sub(f2_sub(f2_sqr(f2_add(a, b)), t0), t1)
    return c0, c1


def f12_cyclotomic_sqr(x):
    """Granger–Scott compressed squaring, valid ONLY in the cyclotomic
    subgroup. Component naming follows the standard (z0..z5) formulation
    over three Fp4 pairs (z0,z1), (z2,z3), (z4,z5)."""
    c0, c1 = _c12(x, 0), _c12(x, 1)
    z0, z4, z3 = _c6(c0, 0), _c6(c0, 1), _c6(c0, 2)
    z2, z1, z5 = _c6(c1, 0), _c6(c1, 1), _c6(c1, 2)
    t0, t1 = _fp4_sqr(z0, z1)
    z0 = f2_add(f2_add(f2_sub(t0, z0), f2_sub(t0, z0)), t0)
    z1 = f2_add(f2_add(f2_add(t1, z1), f2_add(t1, z1)), t1)
    t0, t1 = _fp4_sqr(z2, z3)
    t2, t3 = _fp4_sqr(z4, z5)
    z4 = f2_add(f2_add(f2_sub(t0, z4), f2_sub(t0, z4)), t0)
    z5 = f2_add(f2_add(f2_add(t1, z5), f2_add(t1, z5)), t1)
    t0 = f2_mul_xi(t3)
    z2 = f2_add(f2_add(f2_add(t0, z2), f2_add(t0, z2)), t0)
    z3 = f2_add(f2_add(f2_sub(t2, z3), f2_sub(t2, z3)), t2)
    return _pack12(_pack6(z0, z4, z3), _pack6(z2, z1, z5))


def f12_joint_pow_frobenius(f, exps, use_cyclotomic=True):
    """prod_i (f^(p^i))^(exps[i]) for static integer exponents, via one
    Shamir joint ladder: max-bitlength squarings (cyclotomic when f is in
    the cyclotomic subgroup) with one table-lookup multiply per bit.
    Used by the final exponentiation's hard part (the base-p decomposition
    of (p^4 - p^2 + 1)/r needs 4 Frobenius powers)."""
    k = len(exps)
    assert 1 <= k <= 6
    batch = f.shape[2:]
    # Frobenius powers f^(p^i)
    fs = [f]
    for _ in range(k - 1):
        fs.append(f12_frobenius(fs[-1]))
    # subset-product table T[mask] = prod_{i in mask} fs[i]
    table = [f12_one(batch)]
    for m in range(1, 1 << k):
        low = m & -m
        rest = m ^ low
        t = fs[low.bit_length() - 1]
        table.append(t if rest == 0 else f12_mul(table[rest], t))
    tstack = jnp.stack(table)  # (2^k, L, 12, *batch)
    nbits = max(e.bit_length() for e in exps)
    if nbits == 0:
        return f12_one(batch)
    masks = np.zeros(nbits, dtype=np.int32)
    for i, e in enumerate(exps):
        for j in range(nbits):  # MSB-first
            masks[j] |= ((e >> (nbits - 1 - j)) & 1) << i
    sqr = f12_cyclotomic_sqr if use_cyclotomic else f12_sqr

    def body(acc, mask):
        acc = sqr(acc)
        acc = f12_mul(acc, jnp.take(tstack, mask, axis=0))
        return acc, None

    # first bit: start from T[mask0] (avoids squaring the identity)
    acc0 = jnp.take(tstack, jnp.int32(int(masks[0])), axis=0)
    acc, _ = jax.lax.scan(body, acc0, jnp.asarray(masks[1:]))
    return acc


# ---- powers ----------------------------------------------------------------


def f12_pow_static(x, e: int):
    """x^e for a Python-int exponent via lax.scan over the bits (one
    compiled mul+sqr body — the graph stays small even for the ~1500-bit
    final-exponentiation exponent)."""
    if e == 0:
        return f12_one(x.shape[2:])
    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32)
    )

    def body(carry, bit):
        acc, base = carry
        acc = f12_select(bit != 0, f12_mul(acc, base), acc)
        base = f12_sqr(base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (f12_one(x.shape[2:]), x), bits)
    return acc


# ---- host converters -------------------------------------------------------


def f12_decode(x):
    """(L, 12, *batch) Montgomery -> nested int tuples (host)."""
    vals = FP.decode(x.reshape(FP.L, -1))
    batch = int(np.prod(x.shape[2:])) if x.ndim > 2 else 1
    out = np.array(vals, dtype=object).reshape(12, batch)
    return out


def f12_from_oracle(o, batch=()):
    """Oracle Fp12 -> device array (L, 12) (+ broadcast to batch)."""
    cs = []
    for c6 in (o.c0, o.c1):
        for c2 in (c6.c0, c6.c1, c6.c2):
            cs += [c2.a.n, c2.b.n]
    arr = jnp.asarray(FP.encode(cs))  # (L, 12)
    arr = arr.reshape(FP.L, 12)
    if batch:
        arr = jnp.broadcast_to(arr.reshape(FP.L, 12, *([1] * len(batch))),
                               (FP.L, 12) + tuple(batch))
    return arr


def f12_to_oracle(x):
    """Device (L, 12) -> oracle Fp12 (host)."""
    from ..oracle.field import Fp, Fp2, Fp6, Fp12

    vals = FP.decode(x.reshape(FP.L, 12))
    f2s = [Fp2(Fp(vals[2 * i]), Fp(vals[2 * i + 1])) for i in range(6)]
    return Fp12(Fp6(*f2s[0:3]), Fp6(*f2s[3:6]))
