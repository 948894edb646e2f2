"""Multi-limb modular arithmetic over JAX arrays — the TPU compute core.

Every field element is a little-endian vector of 16-bit limbs stored in
uint32 lanes, shape ``(L, *batch)`` — limbs on the leading axis so the batch
dimensions land on the TPU's 8x128 vector lanes and every limb op is a full
vector op. Elements are kept in Montgomery form (radix 2^(16*L)) and always
normalised to ``[0, modulus)``.

Why 16-bit limbs: the TPU VPU has no 64-bit integer multiply; 16x16-bit
products fit exactly in a uint32 lane, and column sums of <= 24 partial
products fit after a lo/hi split, so the schoolbook product is exact with no
carry surprises. (The Rust reference delegates all of this to blst's 64-bit
assembly — SURVEY.md §2.2; this module is its TPU-native replacement.)

Design notes for the compiler:
  * carries/borrows are resolved with a Kogge-Stone generate/propagate scan
    (log-depth, whole-array ops) rather than a sequential ripple, keeping the
    HLO count per field-mul small and the ops wide;
  * the schoolbook product is ONE broadcast multiply (La, Lb, batch) plus a
    static anti-diagonal accumulation;
  * everything is jit/vmap/shard_map-compatible with static shapes and no
    data-dependent control flow.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import LIMB_BITS, LIMB_MASK

DTYPE = jnp.uint32
_MASK = jnp.uint32(LIMB_MASK)


def _np_limbs(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)], dtype=np.uint32)


def _shift_up(arr, k: int = 1):
    """Shift limbs toward higher significance along axis 0 (drop the top)."""
    pad = ((k, 0),) + ((0, 0),) * (arr.ndim - 1)
    return jnp.pad(arr, pad)[: arr.shape[0]]


def _carry_scan_op(a, b):
    """Kogge-Stone combine for (generate, propagate) carry pairs."""
    g1, p1 = a
    g2, p2 = b
    return g2 | (p2 & g1), p2 & p1


def _resolve_carries(digits):
    """Exact carry resolution for digit arrays with values < 2^31.

    Returns (normalised limbs in [0, 2^16), carry_out) where carry_out is the
    value carried out of the top limb (0 or 1 after pass A guarantees)."""
    # Pass A: fold multi-bit carries one position up. After this every digit
    # is <= 0xffff + (max_digit >> 16), so generates are 0/1.
    lo = digits & _MASK
    hi = digits >> LIMB_BITS
    top = hi[-1]
    d = lo + _shift_up(hi)
    # Pass B: 0/1 carries via log-depth generate/propagate prefix scan.
    g = (d >> LIMB_BITS).astype(DTYPE)
    p = (d & _MASK) == _MASK
    gpfx, _ = jax.lax.associative_scan(_carry_scan_op, (g.astype(bool), p), axis=0)
    carry_in = _shift_up(gpfx.astype(DTYPE))
    out = (d + carry_in) & _MASK
    carry_out = top + gpfx[-1].astype(DTYPE)
    return out, carry_out


class LimbField:
    """Modular arithmetic for one prime field at a fixed limb count."""

    def __init__(self, modulus: int, n_limbs: int, name: str = "F"):
        assert modulus < (1 << (LIMB_BITS * n_limbs))
        self.modulus = modulus
        self.L = n_limbs
        self.name = name
        self.mont_r = 1 << (LIMB_BITS * n_limbs)
        self.r2_int = self.mont_r * self.mont_r % modulus
        # n' = -modulus^-1 mod 2^(16L)  (for the separated Montgomery reduce)
        self.nprime_int = (-pow(modulus, -1, self.mont_r)) % self.mont_r
        self.mod_np = _np_limbs(modulus, n_limbs)
        self.r2_np = _np_limbs(self.r2_int, n_limbs)
        self.one_mont_np = _np_limbs(self.mont_r % modulus, n_limbs)
        self.nprime_np = _np_limbs(self.nprime_int, n_limbs)
        self.one_std_np = _np_limbs(1, n_limbs)
        self._pk = None  # lazy Pallas kernel cache (FieldKernels)
        # jit the public entry points: each op expands to many limb HLOs, so
        # eager dispatch would dominate. One compile per batch shape.
        for meth in ("add", "sub", "neg", "mul", "sqr", "inv", "batch_inv",
                     "to_mont", "from_mont", "sum_last", "dot"):
            setattr(self, meth, jax.jit(getattr(self, meth)))
        self.pow_static = jax.jit(self.pow_static, static_argnums=1)

    # ---- shape helpers ---------------------------------------------------

    def _const(self, np_arr: np.ndarray, batch_ndim: int) -> jnp.ndarray:
        """Broadcastable constant: (L,) -> (L, 1, ..., 1)."""
        return jnp.asarray(np_arr.reshape(np_arr.shape + (1,) * batch_ndim))

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.L,) + tuple(batch_shape), DTYPE)

    def one(self, batch_shape=()):
        """Montgomery one, broadcast to a batch shape."""
        return jnp.broadcast_to(
            self._const(self.one_mont_np, len(batch_shape)),
            (self.L,) + tuple(batch_shape),
        )

    # ---- host converters ---------------------------------------------------

    def from_int(self, x: int) -> np.ndarray:
        """Standard-form little-endian limbs (NOT Montgomery), shape (L,)."""
        return _np_limbs(x % self.modulus, self.L)

    def from_ints(self, xs) -> np.ndarray:
        """(L, n) standard-form limbs from a list of ints."""
        return np.stack([self.from_int(x) for x in xs], axis=1)

    def to_int(self, limbs) -> int:
        limbs = np.asarray(limbs)
        acc = 0
        for i in range(self.L):
            acc |= int(limbs[i]) << (LIMB_BITS * i)
        return acc

    def to_ints(self, arr):
        """(L, n) -> list of ints."""
        arr = np.asarray(arr)
        flat = arr.reshape(self.L, -1)
        return [self.to_int(flat[:, j]) for j in range(flat.shape[1])]

    def encode(self, xs) -> np.ndarray:
        """ints -> Montgomery-form (L, n) numpy array. Pure host arithmetic
        (no device call), so it is safe under an outer jit trace, where the
        result becomes a compile-time constant."""
        return np.stack(
            [_np_limbs((x % self.modulus) * self.mont_r % self.modulus, self.L)
             for x in xs],
            axis=1,
        )

    def decode(self, arr):
        """Montgomery-form (L, ...) -> list of ints. Host-side."""
        return self.to_ints(np.asarray(self.from_mont(jnp.asarray(arr))))

    # ---- add/sub plumbing ----------------------------------------------------

    def _sub_borrow(self, a, b):
        """a - b limbwise via base-2^16 complement add.

        Returns (diff limbs, borrow_out in {0,1})."""
        comp = _MASK - b  # digit-wise complement, no borrow possible
        digits = a + comp
        one0 = jnp.zeros(a.shape, DTYPE).at[0].set(1)
        out, carry = _resolve_carries(digits + one0)
        return out, jnp.uint32(1) - carry

    def _cond_sub_mod(self, limbs, extra_carry=None):
        """Reduce a value < 2*modulus (with optional 2^(16L) carry bit)."""
        m = self._const(self.mod_np, limbs.ndim - 1)
        diff, borrow = self._sub_borrow(limbs, jnp.broadcast_to(m, limbs.shape))
        ge = borrow == 0
        if extra_carry is not None:
            ge = jnp.logical_or(ge, extra_carry != 0)
        return jnp.where(ge[None], diff, limbs)

    # ---- Pallas dispatch -----------------------------------------------------
    #
    # On accelerator backends the hot elementwise ops run as fused Pallas
    # kernels (fields/pallas_field.py) whenever the flattened batch maps onto
    # whole 1024-lane blocks; otherwise (CPU tests, tiny batches) the XLA limb
    # formulas below are used. Both paths are bit-identical.

    def _pallas(self):
        if self._pk is None:
            from .pallas_field import FieldKernels

            self._pk = FieldKernels(self)
        return self._pk

    # ---- ring ops ------------------------------------------------------------

    def add(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        out = self._pallas().try_binary("add", a, b)
        if out is not None:
            return out
        s, carry = _resolve_carries(a + b)
        return self._cond_sub_mod(s, carry)

    def sub(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        out = self._pallas().try_binary("sub", a, b)
        if out is not None:
            return out
        diff, borrow = self._sub_borrow(a, b)
        m = jnp.broadcast_to(self._const(self.mod_np, diff.ndim - 1), diff.shape)
        plus_m, _ = _resolve_carries(diff + m)
        return jnp.where((borrow != 0)[None], plus_m, diff)

    def neg(self, a):
        m = jnp.broadcast_to(self._const(self.mod_np, a.ndim - 1), a.shape)
        diff, _ = self._sub_borrow(m, a)
        return jnp.where(self.is_zero(a)[None], a, diff)

    @staticmethod
    def _conv_digits(a, b, n_out: int):
        """Anti-diagonal digit sums of the schoolbook product, lo/hi split so
        every partial sum stays < 2^22 (exact in uint32).

        Uses a skew-reshape (pad rows to width W, reshape to width W-1) so
        row i lands shifted by i — the whole anti-diagonal accumulation is a
        handful of whole-array ops instead of O(L) pads."""
        La = a.shape[0]
        Lb = b.shape[0]
        p = a[:, None] * b[None]  # (La, Lb, *batch) exact 32-bit products
        batch_pad = ((0, 0),) * (p.ndim - 2)
        # lo goes to column i+j, hi to column i+j+1
        d3 = (
            jnp.pad(p & _MASK, ((0, 0), (0, 1)) + batch_pad)
            + jnp.pad(p >> LIMB_BITS, ((0, 0), (1, 0)) + batch_pad)
        )  # (La, Lb+1, *batch)
        w = Lb + 1 + La
        d3 = jnp.pad(d3, ((0, 0), (0, La)) + batch_pad)  # (La, w, *batch)
        flat = d3.reshape((La * w,) + p.shape[2:])
        skew = flat[: La * (w - 1)].reshape((La, w - 1) + p.shape[2:])
        digits = skew.sum(axis=0)  # (La+Lb, *batch), each < La*2^17 << 2^31
        return digits[:n_out]

    def _mul_full(self, a, b):
        """Exact (La+Lb)-limb product, normalised."""
        digits = self._conv_digits(a, b, a.shape[0] + b.shape[0])
        limbs, _ = _resolve_carries(digits)  # exact product: no carry out
        return limbs

    def _mul_low(self, a, b_np: np.ndarray):
        """Low L limbs of a * const(b) mod 2^(16L)."""
        bb = jnp.broadcast_to(self._const(b_np, a.ndim - 1), a.shape)
        digits = self._conv_digits(a, bb, self.L)
        limbs, _ = _resolve_carries(digits)
        return limbs

    def _mont_reduce(self, t):
        """Montgomery reduction of a 2L-limb value t < modulus * 2^(16L)."""
        L = self.L
        m_ = self._mul_low(t[:L], self.nprime_np)
        mn = self._mul_full(m_, jnp.broadcast_to(self._const(self.mod_np, t.ndim - 1),
                                                 (L,) + t.shape[1:]))
        u, carry = _resolve_carries(t + mn)
        return self._cond_sub_mod(u[L:], carry)

    def mul(self, a, b):
        """Montgomery multiply: (a * b * R^-1) mod m."""
        a, b = jnp.broadcast_arrays(a, b)
        out = self._pallas().try_binary("mul", a, b)
        if out is not None:
            return out
        return self._mont_reduce(self._mul_full(a, b))

    def sqr(self, a):
        out = self._pallas().try_binary("mul", a, a)
        if out is not None:
            return out
        return self._mont_reduce(self._mul_full(a, a))

    def mul_const(self, a, c_np: np.ndarray):
        """Montgomery multiply by a precomputed (L,) numpy constant."""
        out = self._pallas().try_mul_const(a, c_np)
        if out is not None:
            return out
        return self.mul(a, self._const(c_np, a.ndim - 1))

    def to_mont(self, a):
        return self.mul_const(a, self.r2_np)

    def from_mont(self, a):
        out = self._pallas().try_mul_const(a, self.one_std_np)
        if out is not None:
            return out
        L = self.L
        pad = ((0, L),) + ((0, 0),) * (a.ndim - 1)
        return self._mont_reduce(jnp.pad(a, pad))

    # ---- predicates ----------------------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, cond, a, b):
        """cond: batch-shaped bool; picks a where true."""
        return jnp.where(cond[None], a, b)

    # ---- powers and inverses ---------------------------------------------------

    def pow_static(self, a, e: int):
        """a^e for a Python-int exponent, via lax.scan over the bits."""
        if e == 0:
            return self.one(a.shape[1:])
        nbits = e.bit_length()
        bits = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32)
        )

        def body(carry, bit):
            acc, base = carry
            acc = self.select(bit != 0, self.mul(acc, base), acc)
            base = self.sqr(base)
            return (acc, base), None

        (acc, _), _ = jax.lax.scan(body, (self.one(a.shape[1:]), a), bits)
        return acc

    def pow_dynamic(self, a, e_bits):
        """a^e where e_bits is a traced (nbits,) 0/1 array (LSB first)."""

        def body(carry, bit):
            acc, base = carry
            acc = self.select(bit != 0, self.mul(acc, base), acc)
            base = self.sqr(base)
            return (acc, base), None

        (acc, _), _ = jax.lax.scan(body, (self.one(a.shape[1:]), a), e_bits)
        return acc

    def inv(self, a):
        """Fermat inverse a^(m-2); inv(0) = 0 by convention."""
        return self.pow_static(a, self.modulus - 2)

    def _prefix_scan(self, op, x, reverse: bool = False):
        """Inclusive running fold of `op` along the last axis, log-depth.

        Implemented as a fori_loop doubling scan (one compiled body) rather
        than lax.associative_scan, which would inline O(log n) copies of the
        operator and blow up compile time."""
        n = x.shape[-1]
        if n == 1:
            return x
        rounds = max(1, (n - 1).bit_length())
        if reverse:
            x = jnp.flip(x, -1)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).reshape(
            (1,) * (x.ndim - 1) + (n,)
        )

        def body(r, acc):
            s = jnp.left_shift(jnp.int32(1), r)
            shifted = jnp.roll(acc, s, axis=-1)
            prod = op(acc, shifted)
            return jnp.where(idx >= s, prod, acc)

        x = jax.lax.fori_loop(0, rounds, body, x)
        if reverse:
            x = jnp.flip(x, -1)
        return x

    def prefix_mul(self, x, reverse: bool = False):
        """Inclusive running product along the last axis, log-depth."""
        return self._prefix_scan(self.mul, x, reverse)

    def prefix_add(self, x, reverse: bool = False):
        """Inclusive running sum along the last axis, log-depth."""
        return self._prefix_scan(self.add, x, reverse)

    def _renorm_sum(self, digits):
        """Reduce an un-normalised digit array (values < 2^27, i.e. a raw
        uint32 limb-wise sum of < 2^11 field elements) to a field element."""
        L = self.L
        limbs, carry = _resolve_carries(digits)
        t = jnp.concatenate(
            [limbs, carry[None], jnp.zeros((L - 1,) + limbs.shape[1:], DTYPE)],
            axis=0,
        )
        # mont_reduce gives V*R^-1; to_mont multiplies back by R -> V mod m,
        # which is the Montgomery form of the sum of the (Montgomery) inputs.
        return self.to_mont(self._mont_reduce(t))

    def sum_last(self, a):
        """Sum of field elements along the last axis: raw uint32 limb sums in
        chunks of 2^11 (no overflow) + one Montgomery renormalisation per
        level. O(1) field-mul depth — this is the TPU-native reduction that
        replaces the reference's sequential fold loops."""
        chunk = 1 << 11
        while a.shape[-1] > 1:
            n = a.shape[-1]
            c = min(chunk, n)
            npad = -(-n // c) * c
            if npad != n:
                pad = ((0, 0),) * (a.ndim - 1) + ((0, npad - n),)
                a = jnp.pad(a, pad)
            raw = jnp.sum(a.reshape(a.shape[:-1] + (npad // c, c)), axis=-1)
            a = self._renorm_sum(raw)
        return a[..., 0]

    def dot(self, a, b):
        """Inner product along the last axis."""
        return self.sum_last(self.mul(a, b))

    def batch_inv(self, a):
        """Vectorised inversion along the LAST axis via a pairwise product
        tree (Montgomery's trick in tree form): up-sweep of pairwise
        products (n mul-lanes), ONE Fermat inverse at the root, down-sweep
        distributing inverses to children (2n mul-lanes). Total ~3n muls at
        2·log n depth — vs 2n·log n for a prefix/suffix-scan formulation.
        inv(0) = 0 elementwise.

        Replaces the reference's per-element blst `invert` calls (e.g.
        eval_form.rs:58-84 does O(d) scalar inversions per witness)."""
        zero_mask = self.is_zero(a)
        one = self.one(a.shape[1:])
        x = jnp.where(zero_mask[None], one, a)
        n = x.shape[-1]
        npow = 1 << max(0, (n - 1).bit_length())
        if npow != n:
            padshape = a.shape[:-1] + (npow - n,)
            x = jnp.concatenate([x, self.one(padshape[1:])], axis=-1)
        levels = [x]
        while x.shape[-1] > 1:
            x = self.mul(x[..., 0::2], x[..., 1::2])
            levels.append(x)
        inv = self.inv(x)  # root: (L, ..., 1)
        for lev in levels[-2::-1]:
            left = lev[..., 0::2]
            right = lev[..., 1::2]
            inv_left = self.mul(inv, right)
            inv_right = self.mul(inv, left)
            # interleave children back to this level's layout
            stacked = jnp.stack([inv_left, inv_right], axis=-1)
            inv = stacked.reshape(lev.shape)
        inv = inv[..., :n]
        return jnp.where(zero_mask[None], self.zeros(a.shape[1:]), inv)
