"""Pallas TPU kernels for multi-limb Montgomery field arithmetic.

The plain-XLA limb path (fields/limb.py) is correct but HBM-bound: every
field multiply materialises O(L^2)-sized partial-product intermediates in
HBM, so a 24-limb Fp multiply moves ~100x more bytes than its inputs
(measured ~2-4 M muls/s on one chip — ~500x below the VPU roofline). These
kernels keep the entire schoolbook product + Montgomery reduction resident
in VMEM/vector registers: HBM traffic collapses to inputs + outputs.

Layout contract
---------------
A field-element batch enters a kernel as a ``(L, S, 128)`` uint32 block —
limb index on the leading (untiled) axis, a native ``(S, 128)`` vector tile
per limb (S = 8 sublanes). Host arrays ``(L, B)`` are reshaped to
``(L, B/1024, 8, 128)`` and the grid runs over the 1024-lane blocks.
All in-kernel ops are whole-tile VPU ops; carry chains ripple across the
(static) limb axis with ``fori_loop`` + dynamic slices on the leading dim.

Replaces what blst's x86-64 assembly does for the Rust reference
(SURVEY.md §2.2) — here the "assembly" is Mosaic-compiled vector code.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LIMB_BITS, LIMB_MASK

MASK = np.uint32(LIMB_MASK)
LANES = 1024  # 8 sublanes x 128 lanes per block
_TILE = (8, 128)


class PallasFieldOps:
    """Value-level field ops usable INSIDE a Pallas kernel body.

    Elements are (L, 8, 128) uint32 arrays (one vreg tile per limb). All
    indexing is STATIC (Mosaic cannot dynamically slice values), so every
    limb loop is unrolled at trace time; per-op trace size is ~1k
    primitives, compiled once per batch shape.
    """

    def __init__(self, field):
        self.f = field
        self.L = field.L
        self.mod = [int(x) for x in field.mod_np]
        self.nprime = [int(x) for x in field.nprime_np]

    # ---- helpers -----------------------------------------------------------

    def _pad_rows(self, x, lo, hi):
        """Zero-pad along the leading (limb) axis."""
        return jnp.pad(x, ((lo, hi),) + ((0, 0),) * (x.ndim - 1))

    def _ripple(self, dig):
        """Resolve carries across a digit array (rows < 2^32 - 2^16).
        Returns (normalised (n,8,128), carry-out tile)."""
        n = dig.shape[0]
        rows = []
        carry = jnp.zeros(dig.shape[1:], jnp.uint32)
        for k in range(n):
            t = dig[k] + carry
            rows.append(t & MASK)
            carry = t >> LIMB_BITS
        return jnp.stack(rows), carry

    # ---- multiplication core -----------------------------------------------

    def _conv(self, a, b):
        """Digit sums of a * b (b has L rows): (2L,8,128), rows < L*2^17.

        The zero-padded full-height accumulate looks wasteful (~half the
        add rows are zeros) but Mosaic schedules these large uniform vector
        ops well; a per-digit Python-list formulation that issues only the
        useful tile-adds was MEASURED WORSE on the bench chip: 230k vs 236k
        MSM points/s at 2^20 AND 4x the Mosaic compile time (43 min vs 10
        for the fused MSM kernel). Keep the padded form."""
        L = self.L
        dig = jnp.zeros((2 * L,) + a.shape[1:], jnp.uint32)
        for i in range(L):
            p = a[i] * b  # (L,8,128)
            lo = p & MASK
            hi = p >> LIMB_BITS
            upd = self._pad_rows(lo, i, L - i) + self._pad_rows(hi, i + 1, L - i - 1)
            dig = dig + upd
        return dig

    def _conv_const(self, a, c_limbs, nout):
        """Digit sums of a * const (python-int limbs), truncated to nout."""
        L = self.L
        na = a.shape[0]
        dig = jnp.zeros((nout,) + a.shape[1:], jnp.uint32)
        for j, cj in enumerate(c_limbs):
            if cj == 0 or j >= nout:
                continue
            p = a * np.uint32(cj)  # (na,8,128)
            lo = p & MASK
            hi = p >> LIMB_BITS
            # lo lands at rows j..j+na, hi at j+1..j+na+1, clipped to nout
            nlo = min(na, nout - j)
            upd = self._pad_rows(lo[:nlo], j, nout - j - nlo)
            nhi = min(na, nout - j - 1)
            if nhi > 0:
                upd = upd + self._pad_rows(hi[:nhi], j + 1, nout - j - 1 - nhi)
            dig = dig + upd
        return dig

    def _sub_ripple(self, a_rows, b_rows):
        """Row lists a - b with borrow; returns (rows list, borrow tile)."""
        rows = []
        borrow = None
        for i in range(len(a_rows)):
            if borrow is None:
                t = a_rows[i] + (MASK - b_rows[i]) + np.uint32(1)
            else:
                t = a_rows[i] + (MASK - b_rows[i]) + (np.uint32(1) - borrow)
            rows.append(t & MASK)
            borrow = np.uint32(1) - (t >> LIMB_BITS)
        return rows, borrow

    def _cond_sub_mod(self, limbs, extra=None):
        """Subtract the modulus from a (L,8,128) value < 2*modulus (with
        optional carry tile at weight 2^(16L))."""
        mod_rows = [np.uint32(m) for m in self.mod]
        diff, borrow = self._sub_ripple([limbs[i] for i in range(self.L)], mod_rows)
        ge = borrow == 0
        if extra is not None:
            ge = jnp.logical_or(ge, extra > 0)
        return jnp.where(ge[None], jnp.stack(diff), limbs)

    def mont_reduce(self, t):
        """Montgomery reduction of a normalised (2L,8,128) value."""
        L = self.L
        m_dig = self._conv_const(t[:L], self.nprime, L)
        m, _ = self._ripple(m_dig)
        mn = self._conv_const(m, self.mod, 2 * L)
        u, carry = self._ripple(t + mn)
        return self._cond_sub_mod(u[L:], carry)

    def mul(self, a, b):
        """Montgomery multiply (operands in Montgomery form)."""
        t, _ = self._ripple(self._conv(a, b))
        return self.mont_reduce(t)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_const(self, a, c_np):
        """Multiply by a Montgomery-form (L,) numpy constant."""
        dig = self._conv_const(a, [int(x) for x in c_np], 2 * self.L)
        t, _ = self._ripple(dig)
        return self.mont_reduce(t)

    # ---- add/sub -----------------------------------------------------------

    def add(self, a, b):
        s, carry = self._ripple(a + b)
        return self._cond_sub_mod(s, carry)

    def sub(self, a, b):
        diff, borrow = self._sub_ripple(
            [a[i] for i in range(self.L)], [b[i] for i in range(self.L)]
        )
        # underflow -> add the modulus back
        plus = []
        carry = None
        for i in range(self.L):
            t = diff[i] + np.uint32(self.mod[i]) + (carry if carry is not None else np.uint32(0))
            plus.append(t & MASK)
            carry = t >> LIMB_BITS
        return jnp.where((borrow != 0)[None], jnp.stack(plus), jnp.stack(diff))

    def neg(self, a):
        zero = jnp.zeros_like(a)
        is_zero = jnp.all(a == 0, axis=0)
        m = jnp.stack(
            [jnp.full(a.shape[1:], m_, jnp.uint32) for m_ in self.mod]
        )
        return jnp.where(is_zero[None], zero, self.sub(m, a))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def select(self, cond, a, b):
        return jnp.where(cond[None], a, b)


class PallasFp2Ops:
    """Value-level Fp2 = Fp[u]/(u^2+1) ops usable INSIDE a Pallas kernel.

    Elements are (L, 2, 8, 128) uint32 arrays — the c0/c1 components on axis
    1, one vreg tile per (limb, component). Mirrors curve/ops.py Fp2Adapter
    algebra (Karatsuba mul, (a+b)(a-b) square) over the in-kernel limb ALU,
    so the generic point-kernel formulas in curve/pallas_ops.py serve G2
    unchanged. Replaces blst's fp2 assembly for the reference's G2 ops
    (SURVEY.md §2.2: G2 MSM behind verify_eval_batched, coeff_form.rs:161-166)."""

    def __init__(self, field):
        self.base = PallasFieldOps(field)
        self.L = field.L

    def _join(self, c0, c1):
        return jnp.stack([c0, c1], axis=1)

    def add(self, a, b):
        return self._join(
            self.base.add(a[:, 0], b[:, 0]), self.base.add(a[:, 1], b[:, 1])
        )

    def sub(self, a, b):
        return self._join(
            self.base.sub(a[:, 0], b[:, 0]), self.base.sub(a[:, 1], b[:, 1])
        )

    def neg(self, a):
        return self._join(self.base.neg(a[:, 0]), self.base.neg(a[:, 1]))

    def mul(self, x, y):
        a, b = x[:, 0], x[:, 1]
        c, d = y[:, 0], y[:, 1]
        ac = self.base.mul(a, c)
        bd = self.base.mul(b, d)
        t = self.base.mul(self.base.add(a, b), self.base.add(c, d))
        re = self.base.sub(ac, bd)
        im = self.base.sub(self.base.sub(t, ac), bd)
        return self._join(re, im)

    def sqr(self, x):
        a, b = x[:, 0], x[:, 1]
        re = self.base.mul(self.base.add(a, b), self.base.sub(a, b))
        ab = self.base.mul(a, b)
        return self._join(re, self.base.add(ab, ab))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(0, 1))

    def select(self, cond, a, b):
        return jnp.where(cond[None, None], a, b)


# ---------------------------------------------------------------------------
# host-side shape plumbing
# ---------------------------------------------------------------------------

def _to_blocks(x, L):
    """(L, B) -> (L, nblk, 8, 128); B must be a multiple of 1024."""
    B = x.shape[-1]
    return x.reshape(L, B // LANES, 8, 128)


def _from_blocks(x, L):
    return x.reshape(L, -1)


def pallas_batch_ok(batch: int) -> bool:
    return batch >= LANES and batch % LANES == 0


def _elem_spec(L):
    return pl.BlockSpec(
        (L, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )


def _mask_spec():
    return pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _run_elementwise(field, body, inputs, n_out, interpret=False):
    """Launch `body` (list of (L,8,128) values -> list of values) over
    (L, B) arrays. All inputs/outputs share the same (L, B) shape."""
    L = field.L
    B = inputs[0].shape[-1]
    nblk = B // LANES
    specs = [_elem_spec(L)] * len(inputs)
    out_specs = [_elem_spec(L)] * n_out
    out_shape = [
        jax.ShapeDtypeStruct((L, nblk, 8, 128), jnp.uint32) for _ in range(n_out)
    ]

    def kernel(*refs):
        in_refs = refs[: len(inputs)]
        out_refs = refs[len(inputs):]
        vals = [r[:, 0] for r in in_refs]
        outs = body(*vals)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        for oref, oval in zip(out_refs, outs):
            oref[:, 0] = oval

    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=specs,
        out_specs=out_specs if n_out > 1 else out_specs[0],
        out_shape=out_shape if n_out > 1 else out_shape[0],
        interpret=interpret,
    )(*[_to_blocks(x, L) for x in inputs])
    if n_out == 1:
        return _from_blocks(outs, L)
    return tuple(_from_blocks(o, L) for o in outs)


# ---------------------------------------------------------------------------
# public kernels
# ---------------------------------------------------------------------------

def make_mul(field, interpret=False):
    """Fused elementwise Montgomery multiply over (L, B), B % 1024 == 0."""
    ops = PallasFieldOps(field)

    @jax.jit
    def mul(a, b):
        return _run_elementwise(field, ops.mul, [a, b], 1, interpret)

    return mul


def make_mul_chain(field, k, interpret=False):
    """k back-to-back dependent Montgomery multiplies in ONE kernel launch.

    Speed-of-light probe for the bench roofline: timing two chain lengths
    and differencing cancels every fixed cost (kernel launch, dispatch,
    host round-trip), leaving the pure in-VMEM mul rate. A single-mul
    timing is launch-overhead-bound on this device and understates the
    peak several-fold (round-1 'MFU 3.8' artifact)."""
    ops = PallasFieldOps(field)

    def body(a, b):
        acc = a
        for _ in range(k):
            acc = ops.mul(acc, b)
        return acc

    @jax.jit
    def mul_chain(a, b):
        return _run_elementwise(field, body, [a, b], 1, interpret)

    return mul_chain


def make_ntt_stage(field, interpret=False):
    """Fused DIF butterfly stage kernel: (a, b, w) of (L, B) ->
    (u, v) = (a + b, (a - b) * w), both (L, B).

    One Pallas launch per stage — butterfly and Montgomery multiply stay in
    VMEM. (An element-interleaving single-output variant was tried and
    rejected: Mosaic cannot lower the (8,128,2)->(16,128) lane shape cast
    — "infer-vector-layout: unsupported shape cast"; the inter-stage data
    movement is instead minimised by the four-step layout in ntt/domain.)"""
    ops = PallasFieldOps(field)

    def body(a, b, w):
        return ops.add(a, b), ops.mul(ops.sub(a, b), w)

    @jax.jit
    def stage(a, b, w):
        return _run_elementwise(field, body, [a, b, w], 2, interpret)

    return stage


def make_add(field, interpret=False):
    ops = PallasFieldOps(field)

    @jax.jit
    def add(a, b):
        return _run_elementwise(field, ops.add, [a, b], 1, interpret)

    return add


def make_sub(field, interpret=False):
    ops = PallasFieldOps(field)

    @jax.jit
    def sub(a, b):
        return _run_elementwise(field, ops.sub, [a, b], 1, interpret)

    return sub


def pallas_enabled() -> bool:
    """Use Pallas kernels on real accelerators; XLA formulas on CPU.

    Override with KZG_TPU_NO_PALLAS=1 (force off everywhere)."""
    import os

    if os.environ.get("KZG_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001 - backend init failure
        return False


class FieldKernels:
    """Per-field cache of fused elementwise kernels, with shape dispatch.

    `try_*` methods return None when the (flattened) batch doesn't map onto
    whole 1024-lane blocks — callers fall back to the XLA limb path."""

    def __init__(self, field):
        self.field = field
        self.ops = PallasFieldOps(field)
        self._const_kernels = {}

    def _eligible(self, a):
        # Any nonempty batch: sub-block batches are PADDED to one 1024-lane
        # block. Crucially this keeps small/odd-width ops on the kernel path
        # too — the XLA limb formulas expand to ~10^3 HLOs per op, and a
        # handful of them in an unrolled reduction is enough to blow up XLA
        # compile memory (observed as compile-helper SIGKILL).
        if not pallas_enabled():
            return False
        n = 1
        for d in a.shape[1:]:
            n *= d
        return n > 0

    def _flat_pad(self, a):
        f = a.reshape(self.field.L, -1)
        n = f.shape[1]
        rem = (-n) % LANES
        if rem:
            f = jnp.pad(f, ((0, 0), (0, rem)))
        return f, n

    def try_binary(self, op_name, a, b):
        if a.shape != b.shape or not self._eligible(a):
            return None
        body = getattr(self.ops, op_name)
        fa, n = self._flat_pad(a)
        fb, _ = self._flat_pad(b)
        out = _run_elementwise(self.field, body, [fa, fb], 1)
        return out[:, :n].reshape(a.shape)

    def try_mul_const(self, a, c_np):
        if not self._eligible(a):
            return None
        key = c_np.tobytes()
        if key not in self._const_kernels:
            ops = self.ops

            def body(x, c=c_np):
                return ops.mul_const(x, c)

            self._const_kernels[key] = body
        fa, n = self._flat_pad(a)
        out = _run_elementwise(self.field, self._const_kernels[key], [fa], 1)
        return out[:, :n].reshape(a.shape)
