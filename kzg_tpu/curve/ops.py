"""Branch-free Jacobian elliptic-curve arithmetic, generic over the field.

TPU-native replacement for blst's G1/G2 point ops (reference SURVEY.md §2.2:
the Rust crate gets these from blstrs assembly). One generic implementation
serves G1 (over Fp) and G2 (over Fp2): the curve has a = 0 in both cases and
the group-law formulas never reference b.

Every exceptional case (identity operands, doubling, inverses) is resolved
with vectorised selects — no data-dependent control flow, so the same code
runs under jit/vmap/shard_map on batches of points. Points are (X, Y, Z)
Jacobian triples; Z == 0 encodes infinity.

Formulas: dbl-2009-l and add-2007-bl / madd-2007-bl (EFD), chosen for low
multiplication counts with a = 0.
"""

import numpy as np
import jax
import jax.numpy as jnp


class FpAdapter:
    """Field adapter over a LimbField: element shape (L, *batch)."""

    def __init__(self, field):
        self.f = field

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def mul(self, a, b):
        return self.f.mul(a, b)

    def sqr(self, a):
        return self.f.sqr(a)

    def neg(self, a):
        return self.f.neg(a)

    def is_zero(self, a):
        return self.f.is_zero(a)

    def eq(self, a, b):
        return self.f.eq(a, b)

    def expand(self, cond):
        return cond[None]

    def zeros(self, batch_shape=()):
        return self.f.zeros(batch_shape)

    def one(self, batch_shape=()):
        return self.f.one(batch_shape)

    def batch_inv(self, a):
        return self.f.batch_inv(a)

    # host conversions
    def encode(self, xs):
        """list of ints -> (L, n) Montgomery."""
        return jnp.asarray(self.f.encode(xs))

    def decode(self, arr):
        return self.f.decode(arr)


class Fp2Adapter:
    """Quadratic extension Fp[u]/(u^2+1): element shape (L, 2, *batch)."""

    def __init__(self, field):
        self.f = field

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def neg(self, a):
        return self.f.neg(a)

    def mul(self, x, y):
        a, b = x[:, 0], x[:, 1]
        c, d = y[:, 0], y[:, 1]
        ac = self.f.mul(a, c)
        bd = self.f.mul(b, d)
        t = self.f.mul(self.f.add(a, b), self.f.add(c, d))
        re = self.f.sub(ac, bd)
        im = self.f.sub(self.f.sub(t, ac), bd)
        return jnp.stack([re, im], axis=1)

    def sqr(self, x):
        a, b = x[:, 0], x[:, 1]
        re = self.f.mul(self.f.add(a, b), self.f.sub(a, b))
        ab = self.f.mul(a, b)
        im = self.f.add(ab, ab)
        return jnp.stack([re, im], axis=1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(0, 1))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(0, 1))

    def expand(self, cond):
        return cond[None, None]

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.f.L, 2) + tuple(batch_shape), jnp.uint32)

    def one(self, batch_shape=()):
        return jnp.stack(
            [self.f.one(batch_shape), self.f.zeros(batch_shape)], axis=1
        )

    def batch_inv(self, x):
        # (a+bu)^-1 = (a-bu)/(a^2+b^2)
        a, b = x[:, 0], x[:, 1]
        norm = self.f.add(self.f.sqr(a), self.f.sqr(b))
        ninv = self.f.batch_inv(norm)
        return jnp.stack(
            [self.f.mul(a, ninv), self.f.neg(self.f.mul(b, ninv))], axis=1
        )

    def encode(self, xs):
        """list of (c0, c1) int pairs -> (L, 2, n) Montgomery."""
        c0 = self.f.encode([x[0] for x in xs])
        c1 = self.f.encode([x[1] for x in xs])
        return jnp.stack([jnp.asarray(c0), jnp.asarray(c1)], axis=1)

    def decode(self, arr):
        c0 = self.f.decode(arr[:, 0])
        c1 = self.f.decode(arr[:, 1])
        return list(zip(c0, c1))


class CurveOps:
    """Jacobian group law on y^2 = x^3 + b over the adapter field."""

    def __init__(self, fa, name="G"):
        self.fa = fa
        self.name = name
        self.dbl = jax.jit(self.dbl)
        self.add = jax.jit(self.add)
        self.madd = jax.jit(self.madd)
        self.neg = jax.jit(self.neg)

    # ---- constructors -------------------------------------------------------

    def infinity(self, batch_shape=()):
        z = self.fa.zeros(batch_shape)
        one = self.fa.one(batch_shape)
        return (one, one, z)

    def from_affine(self, x, y):
        return (x, y, self.fa.one(x.shape[self._bdim():]))

    def _bdim(self):
        """Number of leading non-batch axes of a field element."""
        return 2 if isinstance(self.fa, Fp2Adapter) else 1

    # ---- predicates -----------------------------------------------------------

    def is_inf(self, p):
        return self.fa.is_zero(p[2])

    def select(self, cond, p, q):
        e = self.fa.expand(cond)
        return tuple(jnp.where(e, a, b) for a, b in zip(p, q))

    def eq(self, p, q):
        """Projective equality: X1 Z2^2 == X2 Z1^2 and Y1 Z2^3 == Y2 Z1^3,
        with infinity handled."""
        f = self.fa
        z1z1 = f.sqr(p[2])
        z2z2 = f.sqr(q[2])
        xe = f.eq(f.mul(p[0], z2z2), f.mul(q[0], z1z1))
        ye = f.eq(
            f.mul(p[1], f.mul(q[2], z2z2)), f.mul(q[1], f.mul(p[2], z1z1))
        )
        both_inf = jnp.logical_and(self.is_inf(p), self.is_inf(q))
        one_inf = jnp.logical_xor(self.is_inf(p), self.is_inf(q))
        return jnp.logical_or(
            both_inf, jnp.logical_and(~one_inf, jnp.logical_and(xe, ye))
        )

    # ---- group law ---------------------------------------------------------------

    def neg(self, p):
        return (p[0], self.fa.neg(p[1]), p[2])

    def dbl(self, p):
        """dbl-2009-l (a = 0): 2M + 5S."""
        f = self.fa
        x, y, z = p
        a = f.sqr(x)
        b = f.sqr(y)
        c = f.sqr(b)
        t = f.sqr(f.add(x, b))
        d = f.sub(f.sub(t, a), c)
        d = f.add(d, d)
        e = f.add(f.add(a, a), a)
        ff = f.sqr(e)
        x3 = f.sub(ff, f.add(d, d))
        c8 = f.add(c, c)
        c8 = f.add(c8, c8)
        c8 = f.add(c8, c8)
        y3 = f.sub(f.mul(e, f.sub(d, x3)), c8)
        yz = f.mul(y, z)
        z3 = f.add(yz, yz)
        return (x3, y3, z3)

    def add(self, p, q):
        """add-2007-bl with full exceptional-case handling via selects."""
        f = self.fa
        x1, y1, z1 = p
        x2, y2, z2 = q
        z1z1 = f.sqr(z1)
        z2z2 = f.sqr(z2)
        u1 = f.mul(x1, z2z2)
        u2 = f.mul(x2, z1z1)
        s1 = f.mul(y1, f.mul(z2, z2z2))
        s2 = f.mul(y2, f.mul(z1, z1z1))
        h = f.sub(u2, u1)
        i = f.sqr(f.add(h, h))
        j = f.mul(h, i)
        r = f.sub(s2, s1)
        r = f.add(r, r)
        v = f.mul(u1, i)
        x3 = f.sub(f.sub(f.sqr(r), j), f.add(v, v))
        s1j = f.mul(s1, j)
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.add(s1j, s1j))
        zz = f.sub(f.sub(f.sqr(f.add(z1, z2)), z1z1), z2z2)
        z3 = f.mul(zz, h)
        out = (x3, y3, z3)
        # exceptional cases
        h0 = f.is_zero(h)
        r0 = f.is_zero(r)
        same = jnp.logical_and(h0, r0)
        opposite = jnp.logical_and(h0, ~r0)
        out = self.select(same, self.dbl(p), out)
        out = self.select(opposite, self.infinity(h0.shape), out)
        out = self.select(self.is_inf(q), p, out)
        out = self.select(self.is_inf(p), q, out)
        return out

    def madd(self, p, q_affine, q_inf):
        """Mixed add (q affine with explicit infinity mask): madd-2007-bl,
        7M + 4S — the bucket-accumulation workhorse."""
        f = self.fa
        x1, y1, z1 = p
        x2, y2 = q_affine
        z1z1 = f.sqr(z1)
        u2 = f.mul(x2, z1z1)
        s2 = f.mul(y2, f.mul(z1, z1z1))
        h = f.sub(u2, x1)
        hh = f.sqr(h)
        i = f.add(hh, hh)
        i = f.add(i, i)
        j = f.mul(h, i)
        r = f.sub(s2, y1)
        r = f.add(r, r)
        v = f.mul(x1, i)
        x3 = f.sub(f.sub(f.sqr(r), j), f.add(v, v))
        y1j = f.mul(y1, j)
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.add(y1j, y1j))
        z3 = f.sub(f.sub(f.sqr(f.add(z1, h)), z1z1), hh)
        out = (x3, y3, z3)
        h0 = f.is_zero(h)
        r0 = f.is_zero(r)
        same = jnp.logical_and(h0, r0)
        opposite = jnp.logical_and(h0, ~r0)
        out = self.select(same, self.dbl(p), out)
        out = self.select(opposite, self.infinity(h0.shape), out)
        q_jac = (x2, y2, f.one(h0.shape))
        out = self.select(self.is_inf(p), q_jac, out)
        out = self.select(q_inf, p, out)
        return out

    # ---- scalar multiplication -----------------------------------------------------

    def scalar_mul_bits(self, p, bits):
        """p * k where bits is (nbits, *batch) of 0/1 (LSB first).
        Double-and-add with one fori-compiled body; batched over points."""
        nbits = bits.shape[0]

        def body(i, carry):
            acc, base = carry
            bit = bits[i]
            added = self.add(acc, base)
            acc = self.select(bit != 0, added, acc)
            base = self.dbl(base)
            return (acc, base)

        batch = bits.shape[1:]
        acc0 = self.infinity(batch)
        acc, _ = jax.lax.fori_loop(0, nbits, body, (acc0, p))
        return acc

    def window_join(self, s_all, c: int):
        """Pippenger Horner join sum_w 2^(c*w) * s_all[..., w] over the
        last axis -> batch-() Jacobian point. (PallasCurveOps overrides
        with a single fused kernel.)"""
        w_count = s_all[0].shape[-1]

        def join(i, acc):
            acc = jax.lax.fori_loop(0, c, lambda _, a: self.dbl(a), acc)
            s_w = tuple(t[..., w_count - 1 - i] for t in s_all)
            return self.add(acc, s_w)

        return jax.lax.fori_loop(0, w_count, join, self.infinity(()))

    def scalar_mul_digits(self, p, digits, c: int):
        """p * k via a windowed MSB-first ladder: digits (W, *batch) int32
        in [0, 2^c), digits[0] = MOST significant window.

        Builds the 2^c - 1 multiples of p once (2^c - 2 adds + one batched
        affine normalisation), then W iterations of (c doublings + one
        masked table-madd). For 255-bit scalars at c = 4 this is ~2x fewer
        field muls than the 255-step bit ladder (`scalar_mul_bits`): 256
        dbls + 64 madds + a 14-add table vs 255 (dbl + full add). Table
        memory is (2^c - 1) x 3 coords x batch — callers pick c to fit
        (the Lagrange-SRS group-iNTT uses config.group_ladder_window)."""
        assert c >= 1
        T = (1 << c) - 1
        bd = self._bdim()
        # table of multiples 1..T of p, built with a fori_loop so the trace
        # holds ONE add (an unrolled chain of T-1 Jacobian adds is ~50k HLOs
        # at c=4 and made the CPU-backend compile of the group-iNTT pass the
        # 20-minute alarm)
        tab0 = tuple(
            jnp.zeros(t.shape[:bd] + (T,) + t.shape[bd:], t.dtype) for t in p
        )
        tab0 = tuple(
            jax.lax.dynamic_update_index_in_dim(tb, t, 0, axis=bd)
            for tb, t in zip(tab0, p)
        )

        def build(i, carry):
            cur, tb = carry
            cur = self.add(cur, p)
            tb = tuple(
                jax.lax.dynamic_update_index_in_dim(t, u, i, axis=bd)
                for t, u in zip(tb, cur)
            )
            return cur, tb

        _, stacked = jax.lax.fori_loop(1, T, build, (p, tab0))
        tx, ty, _ = self.to_affine(stacked)  # (L[,2], T, *batch)
        p_inf = self.is_inf(p)  # every multiple of infinity is infinity

        def sel(tab, idx):
            # idx in [1, T] selects multiple idx (one gather over the table
            # axis); idx == 0 lanes are skip-masked in the madd, so the
            # clamped entry serves there
            i0 = jnp.clip(idx - 1, 0, T - 1)
            ie = jnp.expand_dims(self.fa.expand(i0), axis=bd)
            return jnp.take_along_axis(tab, ie, axis=bd).squeeze(axis=bd)

        W = digits.shape[0]

        def body(w, acc):
            acc = jax.lax.fori_loop(0, c, lambda _, a: self.dbl(a), acc)
            d = digits[w]
            qx = sel(tx, d)
            qy = sel(ty, d)
            skip = jnp.logical_or(d == 0, p_inf)
            return self.madd(acc, (qx, qy), skip)

        acc0 = self.infinity(digits.shape[1:])
        return jax.lax.fori_loop(0, W, body, acc0)

    # ---- affine conversion ------------------------------------------------------------

    def to_affine(self, p):
        """Batch normalise: returns (x, y, inf_mask)."""
        f = self.fa
        x, y, z = p
        inf = self.is_inf(p)
        zsafe = jnp.where(f.expand(inf), f.one(inf.shape), z)
        # batch_inv works along the last axis; flatten batch dims
        zinv = f.batch_inv(zsafe) if hasattr(f, "batch_inv") else None
        zi2 = f.sqr(zinv)
        zi3 = f.mul(zinv, zi2)
        return (f.mul(x, zi2), f.mul(y, zi3), inf)

    def on_curve(self, p, b_const):
        """y^2 == x^3 + b*z^6 (projective form of the curve equation)."""
        f = self.fa
        x, y, z = p
        lhs = f.sqr(y)
        z2 = f.sqr(z)
        z6 = f.mul(f.sqr(z2), z2)
        rhs = f.add(f.mul(f.sqr(x), x), f.mul(b_const, z6))
        return jnp.logical_or(self.is_inf(p), f.eq(lhs, rhs))
