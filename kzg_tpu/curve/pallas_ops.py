"""Fused Pallas kernels for G1 Jacobian point arithmetic.

One pallas_call per POINT operation (madd / dbl / add): all ~25 field
multiplies of the group law stay resident in VMEM, so HBM traffic per point
op collapses from ~25 round-trips of limb intermediates to just the point
coordinates in/out (~100x less). This is the bucket-accumulation workhorse
of the Pippenger MSM (SURVEY.md §2.2: blst's assembly inner loop is the
analog in the reference's stack).

The kernels implement exactly the branch-free formulas of curve/ops.py
(dbl-2009-l, add-2007-bl, madd-2007-bl + exceptional-case selects) over the
PallasFieldOps limb ALU; differential tests pin them against the XLA path.

`PallasCurveOps` subclasses CurveOps and dispatches to the fused kernels
when the (flattened) batch is a multiple of 1024 lanes on TPU, falling back
to the XLA formulas otherwise (tiny batches, CPU tests).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.pallas_field import (
    LANES,
    PallasFieldOps,
    _elem_spec,
    _from_blocks,
    _to_blocks,
)
from .ops import CurveOps, FpAdapter


def _mask_spec():
    return pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


class _G1Kernels:
    """Fused point-op kernels over a (Fp) limb field."""

    def __init__(self, field, interpret=False):
        self.field = field
        self.L = field.L
        self.ops = PallasFieldOps(field)
        self.one_np = field.one_mont_np
        self.interpret = interpret
        self._calls = {}

    # ---- in-kernel value-level helpers -------------------------------------

    def _one(self, shape_tail):
        return jnp.stack(
            [jnp.full(shape_tail, np.uint32(v), jnp.uint32) for v in self.one_np]
        )

    def _dbl_vals(self, x, y, z):
        f = self.ops
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
        return x3, y3, f.add(yz, yz)

    def _sel3(self, cond, p, q):
        f = self.ops
        return tuple(f.select(cond, a, b) for a, b in zip(p, q))

    def _madd_vals(self, x1, y1, z1, x2, y2, skip):
        """madd-2007-bl + full exceptional handling; skip: (8,128) nonzero
        means 'leave accumulator unchanged' (invalid lane or q at infinity)."""
        f = self.ops
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
        yj = f.mul(y1, j)
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.add(yj, yj))
        z3 = f.sub(f.sub(f.sqr(f.add(z1, h)), z1z1), hh)
        out = (x3, y3, z3)
        h0 = f.is_zero(h)
        r0 = f.is_zero(r)
        same = jnp.logical_and(h0, r0)
        opposite = jnp.logical_and(h0, jnp.logical_not(r0))
        out = self._sel3(same, self._dbl_vals(x1, y1, z1), out)
        one = self._one(x1.shape[1:])
        zero = jnp.zeros_like(x1)
        out = self._sel3(opposite, (one, one, zero), out)
        pinf = f.is_zero(z1)
        out = self._sel3(pinf, (x2, y2, one), out)
        out = self._sel3(skip != 0, (x1, y1, z1), out)
        return out

    def _add_vals(self, p, q):
        """add-2007-bl with full exceptional handling (both Jacobian)."""
        f = self.ops
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
        h0 = f.is_zero(h)
        r0 = f.is_zero(r)
        same = jnp.logical_and(h0, r0)
        opposite = jnp.logical_and(h0, jnp.logical_not(r0))
        out = self._sel3(same, self._dbl_vals(x1, y1, z1), out)
        one = self._one(x1.shape[1:])
        zero = jnp.zeros_like(x1)
        out = self._sel3(opposite, (one, one, zero), out)
        out = self._sel3(f.is_zero(z2), p, out)
        out = self._sel3(f.is_zero(z1), q, out)
        return out

    # ---- pallas_call wrappers ----------------------------------------------

    def _launch(self, name, body, elem_ins, mask_ins, n_out):
        """Launch a fused kernel: elem_ins are (L, B), mask_ins are (B,)."""
        L = self.L
        B = elem_ins[0].shape[-1]
        nblk = B // LANES
        key = (name, B)
        if key not in self._calls:
            n_elem = len(elem_ins)
            n_mask = len(mask_ins)
            specs = [_elem_spec(L)] * n_elem + [_mask_spec()] * n_mask
            out_shape = [
                jax.ShapeDtypeStruct((L, nblk, 8, 128), jnp.uint32)
                for _ in range(n_out)
            ]

            def kernel(*refs):
                ins = refs[: n_elem + n_mask]
                outs = refs[n_elem + n_mask:]
                vals = [r[:, 0] for r in ins[:n_elem]] + [
                    r[0] for r in ins[n_elem:]
                ]
                res = body(*vals)
                for oref, oval in zip(outs, res):
                    oref[:, 0] = oval

            self._calls[key] = pl.pallas_call(
                kernel,
                grid=(nblk,),
                in_specs=specs,
                out_specs=[_elem_spec(L)] * n_out,
                out_shape=out_shape,
                interpret=self.interpret,
            )
        blocks = [_to_blocks(x, L) for x in elem_ins] + [
            m.reshape(B // LANES, 8, 128) for m in mask_ins
        ]
        outs = self._calls[key](*blocks)
        return tuple(_from_blocks(o, L) for o in outs)

    def madd(self, x1, y1, z1, x2, y2, skip_u32):
        return self._launch(
            "madd", self._madd_vals, [x1, y1, z1, x2, y2], [skip_u32], 3
        )

    def dbl(self, x, y, z):
        return self._launch(
            "dbl", lambda a, b, c: self._dbl_vals(a, b, c), [x, y, z], [], 3
        )

    def add(self, p, q):
        return self._launch(
            "add",
            lambda x1, y1, z1, x2, y2, z2: self._add_vals(
                (x1, y1, z1), (x2, y2, z2)
            ),
            [p[0], p[1], p[2], q[0], q[1], q[2]],
            [],
            3,
        )


class PallasCurveOps(CurveOps):
    """CurveOps whose hot batch ops run as fused Pallas kernels on TPU.

    Dispatch rule: the flattened batch must be a positive multiple of 1024
    lanes; anything else falls back to the (identical-semantics) XLA
    formulas. Only G1 (plain Fp adapter) is accelerated — G2 batches in
    this protocol are small (batched-verify h^Z only)."""

    def __init__(self, fa, name="G", interpret=False):
        self._kernels = _G1Kernels(fa.f, interpret=interpret) if isinstance(
            fa, FpAdapter
        ) else None
        super().__init__(fa, name=name)

    def _batch_shape(self, t):
        return t.shape[self._bdim():]

    def _flat_ok(self, t):
        # Every nonempty batch goes through the kernels (sub-block batches
        # are padded to one 1024-lane block): the XLA point formulas expand
        # to thousands of HLOs per op, which blows up compile memory when
        # many point ops are unrolled (bucket reduction, window join).
        if self._kernels is None:
            return False
        n = 1
        for d in self._batch_shape(t):
            n *= d
        return n > 0

    def _flat_pad(self, t):
        L = self.fa.f.L
        f = t.reshape(L, -1)
        n = f.shape[1]
        rem = (-n) % LANES
        if rem:
            f = jnp.pad(f, ((0, 0), (0, rem)))
        return f, n

    def madd(self, p, q_affine, q_inf):
        if not self._flat_ok(p[0]):
            return super().madd(p, q_affine, q_inf)
        L = self.fa.f.L
        sh = self._batch_shape(p[0])
        ins = [self._flat_pad(t) for t in (p[0], p[1], p[2], q_affine[0], q_affine[1])]
        n = ins[0][1]
        skip = q_inf.reshape(-1).astype(jnp.uint32)
        rem = (-n) % LANES
        if rem:
            # padded lanes carry garbage coordinates; mark them skipped
            skip = jnp.pad(skip, (0, rem), constant_values=1)
        x3, y3, z3 = self._kernels.madd(*(f for f, _ in ins), skip)
        un = lambda t: t[:, :n].reshape((L,) + sh)
        return (un(x3), un(y3), un(z3))

    def dbl(self, p):
        if not self._flat_ok(p[0]):
            return super().dbl(p)
        L = self.fa.f.L
        sh = self._batch_shape(p[0])
        ins = [self._flat_pad(t) for t in p]
        n = ins[0][1]
        x3, y3, z3 = self._kernels.dbl(*(f for f, _ in ins))
        un = lambda t: t[:, :n].reshape((L,) + sh)
        return (un(x3), un(y3), un(z3))

    def add(self, p, q):
        if not self._flat_ok(p[0]) or p[0].shape != q[0].shape:
            return super().add(p, q)
        L = self.fa.f.L
        sh = self._batch_shape(p[0])
        pf = [self._flat_pad(t) for t in p]
        qf = [self._flat_pad(t) for t in q]
        n = pf[0][1]
        x3, y3, z3 = self._kernels.add(
            tuple(f for f, _ in pf), tuple(f for f, _ in qf)
        )
        un = lambda t: t[:, :n].reshape((L,) + sh)
        return (un(x3), un(y3), un(z3))
