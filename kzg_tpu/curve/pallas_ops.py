"""Fused Pallas kernels for Jacobian point arithmetic — G1 (Fp) and G2 (Fp2).

One pallas_call per POINT operation (madd / dbl / add): all ~25 field
multiplies of the group law stay resident in VMEM, so HBM traffic per point
op collapses from ~25 round-trips of limb intermediates to just the point
coordinates in/out (~100x less). This is the bucket-accumulation workhorse
of the Pippenger MSM (SURVEY.md §2.2: blst's assembly inner loop is the
analog in the reference's stack). The SAME generic group-law code serves G1
over `PallasFieldOps` and G2 over `PallasFp2Ops` (one limb component vs two
— reference G2 surface: coeff_form.rs:161-166 h^Z MSM, eval_form.rs:271-276
Lagrange G2 basis).

The kernels implement exactly the branch-free formulas of curve/ops.py
(dbl-2009-l, add-2007-bl, madd-2007-bl + exceptional-case selects) over the
in-kernel limb ALU; differential tests pin them against the XLA path.

Exceptional-case economics: the doubling path (operands equal as group
elements) costs ~7 extra field muls per lane and is cryptographically rare
in MSM bucket accumulation — it fires only when a bucket's running sum
exactly equals the incoming point. It is therefore gated behind a
`lax.cond` on `any(lane needs doubling)`: the whole tile skips the dbl
arithmetic unless some lane actually needs it (identical results either
way; measured ~1.5x faster madd on random workloads). The infinity/opposite
cases are pure selects (no extra muls) and stay unconditional.

`PallasCurveOps` subclasses CurveOps and dispatches to the fused kernels
when the batch is nonempty on TPU (sub-block batches are padded to one
1024-lane block), falling back to the XLA formulas on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.pallas_field import (
    LANES,
    PallasFieldOps,
    PallasFp2Ops,
)
from .ops import CurveOps, FpAdapter, Fp2Adapter


def _mask_spec():
    return pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _log2(x: int) -> int:
    assert x & (x - 1) == 0
    return x.bit_length() - 1


class _PointKernels:
    """Fused point-op kernels, generic over the coordinate field.

    ncomp = 1: coordinates are (L, 8, 128) Fp values (G1).
    ncomp = 2: coordinates are (L, 2, 8, 128) Fp2 values (G2).
    Host-side arrays are (L, B) / (L, 2, B); blocks add an 8x128 tiling of
    the 1024-lane batch axis."""

    def __init__(self, field, ncomp: int = 1, interpret=False):
        self.field = field
        self.L = field.L
        self.ncomp = ncomp
        self.ops = PallasFieldOps(field) if ncomp == 1 else PallasFp2Ops(field)
        self.one_np = field.one_mont_np
        self.interpret = interpret
        self._calls = {}

    # ---- in-kernel value-level helpers -------------------------------------

    def _one(self, shape_tail):
        c0 = jnp.stack(
            [jnp.full(shape_tail, np.uint32(v), jnp.uint32) for v in self.one_np]
        )
        if self.ncomp == 1:
            return c0
        return jnp.stack([c0, jnp.zeros_like(c0)], axis=1)

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

    def _rare_dbl(self, need, out, x1, y1, z1):
        """Select the doubling result into `out` on `need` lanes, computing
        it only when some lane actually needs it (see module docstring).
        config.msm_gate_rare_dbl=False computes the doubling
        unconditionally — ~7 more field muls per lane but no any() scalar
        reduction + branch, which can serialize the Mosaic pipeline."""
        from ..config import get_config

        if not get_config().msm_gate_rare_dbl:
            return self._sel3(need, self._dbl_vals(x1, y1, z1), out)

        def with_dbl():
            return self._sel3(need, self._dbl_vals(x1, y1, z1), out)

        def without():
            return out

        return jax.lax.cond(jnp.any(need), with_dbl, without)

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
        pinf = f.is_zero(z1)
        live = jnp.logical_and(skip == 0, jnp.logical_not(pinf))
        out = self._rare_dbl(
            jnp.logical_and(same, live), out, x1, y1, z1
        )
        one = self._one(skip.shape)
        zero = jnp.zeros_like(x1)
        out = self._sel3(opposite, (one, one, zero), out)
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
        inf1 = f.is_zero(z1)
        inf2 = f.is_zero(z2)
        live = jnp.logical_not(jnp.logical_or(inf1, inf2))
        out = self._rare_dbl(
            jnp.logical_and(same, live), out, x1, y1, z1
        )
        one = self._one(h0.shape)
        zero = jnp.zeros_like(x1)
        out = self._sel3(opposite, (one, one, zero), out)
        out = self._sel3(inf2, p, out)
        out = self._sel3(inf1, q, out)
        return out

    # ---- pallas_call wrappers ----------------------------------------------

    def _elem_spec(self):
        if self.ncomp == 1:
            return pl.BlockSpec(
                (self.L, 1, 8, 128), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (self.L, 2, 1, 8, 128), lambda i: (0, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def _to_blocks(self, x):
        B = x.shape[-1]
        if self.ncomp == 1:
            return x.reshape(self.L, B // LANES, 8, 128)
        return x.reshape(self.L, 2, B // LANES, 8, 128)

    def _read(self, ref):
        """Block -> in-kernel value: strip the grid axis."""
        return ref[:, 0] if self.ncomp == 1 else ref[:, :, 0]

    def _write(self, ref, val):
        if self.ncomp == 1:
            ref[:, 0] = val
        else:
            ref[:, :, 0] = val

    def _launch(self, name, body, elem_ins, mask_ins, n_out):
        """Launch a fused kernel: elem_ins are (L, [2,] B), masks are (B,)."""
        B = elem_ins[0].shape[-1]
        nblk = B // LANES
        key = (name, B)
        if key not in self._calls:
            n_elem = len(elem_ins)
            n_mask = len(mask_ins)
            specs = [self._elem_spec()] * n_elem + [_mask_spec()] * n_mask
            blk = (
                (self.L, nblk, 8, 128)
                if self.ncomp == 1
                else (self.L, 2, nblk, 8, 128)
            )
            out_shape = [
                jax.ShapeDtypeStruct(blk, jnp.uint32) for _ in range(n_out)
            ]

            def kernel(*refs):
                ins = refs[: n_elem + n_mask]
                outs = refs[n_elem + n_mask:]
                vals = [self._read(r) for r in ins[:n_elem]] + [
                    r[0] for r in ins[n_elem:]
                ]
                res = body(*vals)
                for oref, oval in zip(outs, res):
                    self._write(oref, oval)

            self._calls[key] = pl.pallas_call(
                kernel,
                grid=(nblk,),
                in_specs=specs,
                out_specs=[self._elem_spec()] * n_out,
                out_shape=out_shape,
                interpret=self.interpret,
            )
        blocks = [self._to_blocks(x) for x in elem_ins] + [
            m.reshape(B // LANES, 8, 128) for m in mask_ins
        ]
        outs = self._calls[key](*blocks)
        flat = (self.L, -1) if self.ncomp == 1 else (self.L, 2, -1)
        return tuple(o.reshape(flat) for o in outs)

    def madd(self, x1, y1, z1, x2, y2, skip_u32):
        return self._launch(
            "madd", self._madd_vals, [x1, y1, z1, x2, y2], [skip_u32], 3
        )

    def madd_multi(self, acc, qx, qy, skip_u32, neg_u32):
        """S sequential bucket-accumulation madd steps in ONE pallas_call.

        acc: 3x (L[,2], B) Jacobian bucket state; qx/qy: (L[,2], S, B)
        pre-gathered affine points for steps k..k+S-1; skip/neg: (S, B)
        uint32 masks (skip = leave lane unchanged; neg = add -q = (x, -y),
        the signed-digit path's cheap negate-on-gather).

        Grid = (nblk, S) with the step axis MINOR: for each 1024-lane
        block the S steps run back-to-back with the accumulator resident
        in VMEM (constant index_map -> the block is loaded once, revisited
        across steps, written back once). This removes the per-step HBM
        round-trip of the bucket state AND amortises one kernel launch
        over S steps — the VERDICT r2 #2 fusion (the reference's analog
        loop is inside blst's multi_exp assembly)."""
        from ..config import get_config

        cfg = get_config()
        L = self.L
        S = skip_u32.shape[0]
        B = acc[0].shape[-1]
        nblk = B // LANES
        # F whole 1024-lane blocks per program: tile sublanes grow to F*8,
        # the grid's block axis shrinks to nblk/F (host wrapper pads B to a
        # multiple of F*LANES). Amortizes per-program fixed costs.
        F = min(cfg.msm_blocks_per_program, nblk)
        while nblk % F:
            F -= 1
        sub = F * 8
        nb2 = nblk // F
        key = ("madd_multi", S, B, F, cfg.msm_gate_rare_dbl)
        if key not in self._calls:
            if self.ncomp == 1:
                acc_spec = pl.BlockSpec(
                    (L, 1, sub, 128), lambda i, s: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                pt_spec = pl.BlockSpec(
                    (L, 1, 1, sub, 128), lambda i, s: (0, s, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            else:
                acc_spec = pl.BlockSpec(
                    (L, 2, 1, sub, 128), lambda i, s: (0, 0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                pt_spec = pl.BlockSpec(
                    (L, 2, 1, 1, sub, 128), lambda i, s: (0, 0, s, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            mask_spec = pl.BlockSpec(
                (1, 1, sub, 128), lambda i, s: (s, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            blk = (
                (L, nb2, sub, 128) if self.ncomp == 1
                else (L, 2, nb2, sub, 128)
            )

            def kernel(ax, ay, az, px, py, skip, neg, ox, oy, oz):
                s = pl.program_id(1)

                @pl.when(s == 0)
                def _():
                    ox[...] = ax[...]
                    oy[...] = ay[...]
                    oz[...] = az[...]

                if self.ncomp == 1:
                    x1, y1, z1 = ox[:, 0], oy[:, 0], oz[:, 0]
                    x2, y2 = px[:, 0, 0], py[:, 0, 0]
                else:
                    x1, y1, z1 = ox[:, :, 0], oy[:, :, 0], oz[:, :, 0]
                    x2, y2 = px[:, :, 0, 0], py[:, :, 0, 0]
                sk = skip[0, 0]
                ng = neg[0, 0]
                y2 = self.ops.select(ng != 0, self._neg_val(y2), y2)
                x3, y3, z3 = self._madd_vals(x1, y1, z1, x2, y2, sk)
                if self.ncomp == 1:
                    ox[:, 0] = x3
                    oy[:, 0] = y3
                    oz[:, 0] = z3
                else:
                    ox[:, :, 0] = x3
                    oy[:, :, 0] = y3
                    oz[:, :, 0] = z3

            self._calls[key] = pl.pallas_call(
                kernel,
                grid=(nb2, S),
                in_specs=[acc_spec] * 3 + [pt_spec] * 2 + [mask_spec] * 2,
                out_specs=[acc_spec] * 3,
                out_shape=[
                    jax.ShapeDtypeStruct(blk, jnp.uint32) for _ in range(3)
                ],
                interpret=self.interpret,
            )
        if self.ncomp == 1:
            accb = [t.reshape(L, nb2, sub, 128) for t in acc]
            ptb = [t.reshape(L, S, nb2, sub, 128) for t in (qx, qy)]
            flat = (L, -1)
        else:
            accb = [t.reshape(L, 2, nb2, sub, 128) for t in acc]
            ptb = [t.reshape(L, 2, S, nb2, sub, 128) for t in (qx, qy)]
            flat = (L, 2, -1)
        maskb = [m.reshape(S, nb2, sub, 128) for m in (skip_u32, neg_u32)]
        outs = self._calls[key](*accb, *ptb, *maskb)
        return tuple(o.reshape(flat) for o in outs)

    def _neg_val(self, y):
        """In-kernel field negation (zero-safe): -y = mod - y, 0 -> 0."""
        return self.ops.neg(y)

    def bucket_accumulate(self, acc, sp_rows, start, count, cap: int):
        """Whole-window Pippenger bucket accumulation in ONE launch, with
        the point fetch done by in-kernel DMA over CONTIGUOUS sorted runs.

        The r4 device trace put the per-step XLA chunk gathers at 1.87s of
        a 4.4s 2^20 MSM (~70ns per 132B row — latency/descriptor-bound
        random-row fetch). After the per-window sort-permute, bucket b's
        points occupy the contiguous sorted rows [start[b], start[b]+
        count[b]) — so the fetch can be 8-point ALIGNED RUN chunks (1KB
        DMAs), double-buffered against the madd compute, with the bucket
        state resident in VMEM the whole window.

        sp_rows: (N*W_pad//128, 128) uint32 — the PERMUTED points in
        u16-PACKED form: each 16-bit limb pair rides one u32 word
        (lo | hi << 16), so a point is L*ncomp = 24*ncomp useful words
        (x then y; no infinity word — callers zero the digits of infinity
        points so they land in the skipped bucket 0), zero-padded to
        W_pad = 32*ncomp words so ppm = 128 // W_pad points tile each
        memref row exactly. The r5 u16 packing HALVES both the per-window
        XLA row-permute traffic (the #2 cost in the r4 trace) and the
        kernel's DMA bytes; the in-kernel unpack is ~2 vector ops per
        word — noise against the ~600-op field muls. Mosaic tiling admits
        arbitrary-offset sublane slices, so a run chunk starting at the
        chunk-row-aligned floor of start[b] is one (8*W_pad/128, 128)
        DMA; the <= 7 points of misalignment slop are skip-masked
        (start/count in POINT units).

        acc: 3 x (L[,2], B) Jacobian buckets; start/count: (B,) int32;
        cap: static per-bucket trip bound (callers fall back to the
        segmented scan when any count exceeds it, as in the XLA impls).
        Returns the accumulated buckets."""
        L = self.L  # Fp limb count (24)
        W_p = L * self.ncomp       # packed words per point (G1: 24, G2: 48)
        W_pad = 32 * self.ncomp    # padded row width (G1: 32, G2: 64)
        ppm = 128 // W_pad  # points per 128-word memref row (G1: 4, G2: 2)
        # points per DMA chunk: 8 (G1) / 4 (G2) — G2's unrolled madds are
        # ~3x the field work each; 4 keeps the kernel body (and its Mosaic
        # compile time) the same as G1's
        pc = 8 // self.ncomp
        crows = pc // ppm   # memref rows per chunk (2 for both)
        B = acc[0].shape[-1]
        nblk = B // LANES
        n_rows = sp_rows.shape[0]
        key = ("bucket_accumulate", B, n_rows, cap, self.ncomp)
        if key not in self._calls:
            if self.ncomp == 1:
                acc_spec = pl.BlockSpec(
                    (L, 1, 8, 128), lambda i: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            else:
                acc_spec = pl.BlockSpec(
                    (L, 2, 1, 8, 128), lambda i: (0, 0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            # start/count for the vector masks ride VMEM as (8, 128) tiles;
            # the DMA descriptors (base memref row per bucket) ride SMEM —
            # dynamic scalar indexing must come from SMEM, and every block
            # spec (SMEM included) obeys the (8k, 128) tiling rule, so the
            # SMEM copy is shaped (1, 8, 128) and indexed (b >> 7, b & 127)
            iv_spec = pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
            base_spec = pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            )
            rows_spec = pl.BlockSpec(memory_space=pltpu.ANY)

            def kernel(start_ref, cnt_ref, base_ref, rows_ref,
                       ax, ay, az, ox, oy, oz, buf, sems):
                ox[...] = ax[...]
                oy[...] = ay[...]
                oz[...] = az[...]
                startm = start_ref[0]  # (8, 128) point units
                cntm = cnt_ref[0]
                basem = (
                    jnp.right_shift(startm, _log2(ppm)) * ppm
                    if ppm > 1 else startm
                )
                # per-block trip bound: max over buckets of
                # ceil((count + slop) / pc), empty buckets taking none
                tripm = jnp.where(
                    cntm > 0,
                    jnp.right_shift(
                        cntm + (startm - basem) + (pc - 1), _log2(pc)
                    ),
                    0,
                )
                tmax = jnp.max(tripm)
                max_mrow = n_rows - crows

                def issue(j, slot):
                    def ibody(b, _):
                        g0 = jnp.minimum(
                            base_ref[0, jax.lax.shift_right_logical(b, 7),
                                     jax.lax.bitwise_and(b, 127)] + crows * j,
                            max_mrow,
                        )
                        pltpu.make_async_copy(
                            rows_ref.at[pl.ds(g0, crows), :],
                            buf.at[slot, b],
                            sems.at[slot],
                        ).start()
                        return 0

                    jax.lax.fori_loop(0, LANES, ibody, 0)

                def wait(slot):
                    def wbody(b, _):
                        pltpu.make_async_copy(
                            rows_ref.at[pl.ds(0, crows), :],
                            buf.at[slot, b],
                            sems.at[slot],
                        ).wait()
                        return 0

                    jax.lax.fori_loop(0, LANES, wbody, 0)

                # guard: with every bucket in this block empty (tmax == 0)
                # the loop never runs, so the warm-up DMAs must not be
                # issued either (they would still be in flight at return)
                @pl.when(tmax > 0)
                def _():
                    issue(0, 0)

                def body(j, _):
                    slot = jax.lax.rem(j, 2)

                    @pl.when(j + 1 < tmax)
                    def _():
                        issue(j + 1, jax.lax.rem(j + 1, 2))

                    wait(slot)
                    data = buf[slot]  # (1024, crows, 128)
                    flat = data.reshape(LANES, crows * 128)
                    for s in range(pc):
                        off = s * W_pad
                        q16 = jnp.transpose(
                            flat[:, off : off + W_p]
                        )  # (W_p, 1024) u16-packed limb pairs
                        q = jnp.stack(
                            [q16 & 0xFFFF, q16 >> 16], axis=1
                        ).reshape(2 * W_p, LANES)  # planar 16-bit limbs
                        if self.ncomp == 1:
                            qx = q[:L].reshape(L, 8, 128)
                            qy = q[L:].reshape(L, 8, 128)
                        else:
                            qx = q[: 2 * L].reshape(L, 2, 8, 128)
                            qy = q[2 * L :].reshape(L, 2, 8, 128)
                        r = basem + pc * j + s  # absolute point index
                        valid = jnp.logical_and(
                            r >= startm, r < startm + cntm
                        )
                        skip = (~valid).astype(jnp.uint32)
                        if self.ncomp == 1:
                            x1, y1, z1 = ox[:, 0], oy[:, 0], oz[:, 0]
                        else:
                            x1, y1, z1 = ox[:, :, 0], oy[:, :, 0], oz[:, :, 0]
                        x3, y3, z3 = self._madd_vals(x1, y1, z1, qx, qy, skip)
                        if self.ncomp == 1:
                            ox[:, 0] = x3
                            oy[:, 0] = y3
                            oz[:, 0] = z3
                        else:
                            ox[:, :, 0] = x3
                            oy[:, :, 0] = y3
                            oz[:, :, 0] = z3
                    return 0

                jax.lax.fori_loop(0, tmax, body, 0)

            self._calls[key] = pl.pallas_call(
                kernel,
                grid=(nblk,),
                in_specs=[iv_spec, iv_spec, base_spec, rows_spec]
                + [acc_spec] * 3,
                out_specs=[acc_spec] * 3,
                out_shape=[
                    jax.ShapeDtypeStruct(
                        (L, nblk, 8, 128) if self.ncomp == 1
                        else (L, 2, nblk, 8, 128),
                        jnp.uint32,
                    )
                    for _ in range(3)
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, LANES, crows, 128), jnp.uint32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=self.interpret,
            )
        accb = [self._to_blocks(t) for t in acc]
        outs = self._calls[key](
            start.reshape(nblk, 8, 128),
            count.reshape(nblk, 8, 128),
            (start // ppm).reshape(nblk, 8, 128),
            sp_rows,
            *accb,
        )
        flat = (L, -1) if self.ncomp == 1 else (L, 2, -1)
        return tuple(o.reshape(flat) for o in outs)

    def horner_join(self, s_points, c: int):
        """Pippenger window join S = sum_w 2^(c*w) * S_w in ONE launch.

        s_points: 3x (L[,2], W) Jacobian window sums. The r3 trace showed
        the XLA-loop join costing 0.53s of a 4.4s 2^20 MSM — W*(c+1)
        single-point kernel launches at ~23ms each (while.139/add.509 in
        the trace). Here the whole Horner chain (c doublings + one full
        Jacobian add per window, MSB window first) runs inside one
        pallas_call with the accumulator resident in the output VMEM block
        across grid steps; every lane of the 1024-lane tile computes the
        same values (the op is sequential by nature — wasted lanes, but
        ~W*(c+1)*25 field muls total is microseconds).

        The grid is (W*(c+1),) MINI-STEPS — each body holds ONE doubling
        and ONE add behind pl.when predicates instead of c unrolled
        doublings: ~8x smaller Mosaic body (the unrolled G2 variant was a
        multi-minute compile — the r4 'G2 compile pathology', VERDICT r4
        weak #2) at ~milliseconds more grid-step overhead.
        Returns a batch-() Jacobian point."""
        L = self.L
        W = s_points[0].shape[-1]
        steps = c + 1
        key = ("horner_join", W, c)
        if key not in self._calls:
            if self.ncomp == 1:
                pt_spec = pl.BlockSpec(
                    (L, 1, 8, 128), lambda s: (0, W - 1 - s // steps, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                acc_spec = pl.BlockSpec(
                    (L, 1, 8, 128), lambda s: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                blk = (L, 1, 8, 128)
            else:
                pt_spec = pl.BlockSpec(
                    (L, 2, 1, 8, 128),
                    lambda s: (0, 0, W - 1 - s // steps, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                acc_spec = pl.BlockSpec(
                    (L, 2, 1, 8, 128), lambda s: (0, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                blk = (L, 2, 1, 8, 128)

            def kernel(px, py, pz, ox, oy, oz):
                s = pl.program_id(0)
                k = jax.lax.rem(s, steps)  # phase: 0..c-1 dbl, c add
                if self.ncomp == 1:
                    rd = lambda r: r[:, 0]

                    def wr(r, v):
                        r[:, 0] = v
                else:
                    rd = lambda r: r[:, :, 0]

                    def wr(r, v):
                        r[:, :, 0] = v

                zero = jnp.zeros_like(rd(px))
                one = self._one(rd(px).shape[-2:])

                @pl.when(s == 0)
                def _():
                    # acc = infinity
                    wr(ox, one)
                    wr(oy, one)
                    wr(oz, zero)

                @pl.when(k < c)
                def _():
                    acc = (rd(ox), rd(oy), rd(oz))
                    d = self._dbl_vals(*acc)
                    # dbl formulas break on z == 0: keep infinity fixed
                    inf = self.ops.is_zero(acc[2])
                    out = self._sel3(inf, acc, d)
                    wr(ox, out[0])
                    wr(oy, out[1])
                    wr(oz, out[2])

                @pl.when(k == c)
                def _():
                    acc = (rd(ox), rd(oy), rd(oz))
                    q = (rd(px), rd(py), rd(pz))
                    out = self._add_vals(acc, q)
                    wr(ox, out[0])
                    wr(oy, out[1])
                    wr(oz, out[2])

            self._calls[key] = pl.pallas_call(
                kernel,
                grid=(W * steps,),
                in_specs=[pt_spec] * 3,
                out_specs=[acc_spec] * 3,
                out_shape=[
                    jax.ShapeDtypeStruct(blk, jnp.uint32) for _ in range(3)
                ],
                interpret=self.interpret,
            )
        # broadcast each window's point across one (8, 128) tile
        if self.ncomp == 1:
            ins = [
                jnp.broadcast_to(t[:, :, None, None], (L, W, 8, 128))
                for t in s_points
            ]
        else:
            ins = [
                jnp.broadcast_to(t[:, :, :, None, None], (L, 2, W, 8, 128))
                for t in s_points
            ]
        outs = self._calls[key](*ins)
        # all lanes agree; take lane (0, 0)
        if self.ncomp == 1:
            return tuple(o[:, 0, 0, 0] for o in outs)
        return tuple(o[:, :, 0, 0, 0] for o in outs)

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


# backward-compat alias (round-2 name; G1-only then)
_G1Kernels = _PointKernels


class PallasCurveOps(CurveOps):
    """CurveOps whose hot batch ops run as fused Pallas kernels on TPU.

    Dispatch rule: any nonempty flattened batch goes through the kernels
    (sub-block batches are padded to one 1024-lane block); empty batches and
    CPU backends fall back to the (identical-semantics) XLA formulas. Both
    G1 (Fp) and G2 (Fp2) are accelerated — G2 powers the batched verifier's
    h^Z MSM (coeff_form.rs:161-166) and the Lagrange-SRS G2 group-iNTT."""

    def __init__(self, fa, name="G", interpret=False):
        if isinstance(fa, Fp2Adapter):
            self._kernels = _PointKernels(fa.f, ncomp=2, interpret=interpret)
            self._nc = 2
        elif isinstance(fa, FpAdapter):
            self._kernels = _PointKernels(fa.f, ncomp=1, interpret=interpret)
            self._nc = 1
        else:
            self._kernels = None
            self._nc = 1
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
        lead = (L,) if self._nc == 1 else (L, 2)
        f = t.reshape(lead + (-1,))
        n = f.shape[-1]
        rem = (-n) % LANES
        if rem:
            f = jnp.pad(f, ((0, 0),) * len(lead) + ((0, rem),))
        return f, n

    def _unflatten(self, t, n, sh):
        L = self.fa.f.L
        lead = (L,) if self._nc == 1 else (L, 2)
        return t[..., :n].reshape(lead + sh)

    def madd(self, p, q_affine, q_inf):
        if not self._flat_ok(p[0]):
            return super().madd(p, q_affine, q_inf)
        sh = self._batch_shape(p[0])
        ins = [self._flat_pad(t) for t in (p[0], p[1], p[2], q_affine[0], q_affine[1])]
        n = ins[0][1]
        skip = q_inf.reshape(-1).astype(jnp.uint32)
        rem = (-n) % LANES
        if rem:
            # padded lanes carry garbage coordinates; mark them skipped
            skip = jnp.pad(skip, (0, rem), constant_values=1)
        x3, y3, z3 = self._kernels.madd(*(f for f, _ in ins), skip)
        return tuple(self._unflatten(t, n, sh) for t in (x3, y3, z3))

    def dbl(self, p):
        if not self._flat_ok(p[0]):
            return super().dbl(p)
        sh = self._batch_shape(p[0])
        ins = [self._flat_pad(t) for t in p]
        n = ins[0][1]
        x3, y3, z3 = self._kernels.dbl(*(f for f, _ in ins))
        return tuple(self._unflatten(t, n, sh) for t in (x3, y3, z3))

    def add(self, p, q):
        if not self._flat_ok(p[0]) or p[0].shape != q[0].shape:
            return super().add(p, q)
        sh = self._batch_shape(p[0])
        pf = [self._flat_pad(t) for t in p]
        qf = [self._flat_pad(t) for t in q]
        n = pf[0][1]
        x3, y3, z3 = self._kernels.add(
            tuple(f for f, _ in pf), tuple(f for f, _ in qf)
        )
        return tuple(self._unflatten(t, n, sh) for t in (x3, y3, z3))

    def bucket_accumulate(self, acc, sp_rows, start, count, cap: int):
        """Whole-window bucket accumulation with in-kernel contiguous-run
        DMA point fetch (see _PointKernels.bucket_accumulate). TPU-only:
        callers guard on kernel availability and fall back to the XLA
        bucket loop."""
        assert self._kernels is not None
        return self._kernels.bucket_accumulate(acc, sp_rows, start, count, cap)

    def window_join(self, s_all, c: int):
        """Horner window join sum_w 2^(c*w) * s_all[..., w] -> batch-()
        Jacobian point. One fused kernel on TPU (see
        _PointKernels.horner_join); the XLA fallback is the plain
        fori_loop of doublings + adds."""
        if self._flat_ok(s_all[0]) and s_all[0].shape[-1] > 1:
            return self._kernels.horner_join(s_all, c)
        w_count = s_all[0].shape[-1]

        def join(i, acc):
            acc = jax.lax.fori_loop(0, c, lambda _, a: self.dbl(a), acc)
            s_w = tuple(t[..., w_count - 1 - i] for t in s_all)
            return self.add(acc, s_w)

        return jax.lax.fori_loop(0, w_count, join, self.infinity(()))

    def madd_multi(self, acc, q_affine, skip, neg=None):
        """S fused bucket-accumulation steps: acc (Jacobian (B,) batch)
        += q_affine[s] for s = 0..S-1 sequentially, with per-(s, lane)
        skip/neg masks. q_affine = (qx, qy) of shape (L[,2], S, B);
        skip/neg: (S, B) bool. One Pallas launch, bucket state resident in
        VMEM across the step axis (see _PointKernels.madd_multi)."""
        S, B = skip.shape
        if neg is None:
            neg = jnp.zeros_like(skip)
        if not self._flat_ok(acc[0]):
            # XLA fallback: a plain step loop (identical semantics)
            def body(s, a):
                y2 = jnp.where(
                    self.fa.expand(neg[s]),
                    self.fa.neg(q_affine[1][..., s, :]),
                    q_affine[1][..., s, :],
                )
                return super(PallasCurveOps, self).madd(
                    a, (q_affine[0][..., s, :], y2), skip[s]
                )

            return jax.lax.fori_loop(0, S, body, acc)
        rem = (-B) % LANES
        if rem:
            pad_last = ((0, 0),) * (acc[0].ndim - 1) + ((0, rem),)
            acc = tuple(jnp.pad(t, pad_last) for t in acc)
            pad_pt = ((0, 0),) * (q_affine[0].ndim - 1) + ((0, rem),)
            q_affine = tuple(jnp.pad(t, pad_pt) for t in q_affine)
            skip = jnp.pad(skip, ((0, 0), (0, rem)), constant_values=True)
            neg = jnp.pad(neg, ((0, 0), (0, rem)))
        x3, y3, z3 = self._kernels.madd_multi(
            acc,
            q_affine[0],
            q_affine[1],
            skip.astype(jnp.uint32),
            neg.astype(jnp.uint32),
        )
        if rem:
            return tuple(t[..., :B] for t in (x3, y3, z3))
        return (x3, y3, z3)
