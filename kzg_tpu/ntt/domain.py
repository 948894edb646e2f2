"""Radix-2 NTT over Fr and the evaluation-domain bookkeeping.

TPU-native replacement for the reference's EvaluationDomain + serial/parallel
FFT (reference src/ft.rs:17-25, 55-76, 111-178, 291-387). Design:

  * decimation-in-frequency butterflies expressed as reshape/slice/concat on
    a (16, n) limb array — no gathers inside the stage loop, everything
    vectorised across n/2 lanes per stage;
  * one precomputed forward/inverse twiddle table (omega^j, j < n/2); stage s
    reads it with a static stride slice;
  * bit-reversal is a single static gather at the boundary;
  * the inverse transform is the forward transform with the inverse table
    plus a final 1/n Montgomery scale (mirrors ft.rs:111-140 semantics);
  * coset transforms distribute generator powers before/after
    (ft.rs:142-178 semantics), with g = 7 (Fr's multiplicative generator).

Omega derivation matches the reference: omega = ROOT_OF_UNITY^(2^(S - exp))
with S = 32, and exp >= S is a PolynomialDegreeTooLarge error (ft.rs:55-76).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import R, FR_ROOT_OF_UNITY, FR_TWO_ADICITY, FR_GENERATOR
from ..fields import FR
from ..fields.pallas_field import pallas_enabled
from ..kzg.errors import PolynomialDegreeTooLarge

_ntt_stage = None


def _get_ntt_stage():
    """Fused DIF butterfly stage kernel (pallas_field.make_ntt_stage):
    (a, b, w) of (L, B) -> (u, v) = (a + b, (a - b) * w). One Pallas
    launch per stage; butterfly and Montgomery multiply stay in VMEM."""
    global _ntt_stage
    if _ntt_stage is None:
        from ..fields.pallas_field import make_ntt_stage

        _ntt_stage = make_ntt_stage(FR)
    return _ntt_stage


# Above this exponent no O(n)-sized numpy table is ever built or baked into
# a traced graph: XLA inlines every non-splat numpy constant as an MLIR
# dense literal (measured: the NTT module is 67MB at 2^20 and 269MB at
# 2^22, nearly all of it one twiddle literal), which blows both compile
# memory and the remote-compile transport. Big domains instead use
# SPLIT tables: any needed length-n geometric/twiddle vector factors as
# v[i] = HI[i >> s] * LO[i & (2^s - 1)] with two O(sqrt(n)) tables and one
# extra elementwise multiply. 17 (not 16) so that the four-step
# subdomains of every legal exp (<= 31 -> sub-exp <= 16) still have their
# dense stage tables.
_BIG_TABLE_EXP = 17


def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def compute_omega(num_coeffs: int):
    """(omega, d, exp) for the smallest power-of-two domain >= num_coeffs.

    Mirrors reference ft.rs:55-76: omega = ROOT_OF_UNITY^(2^(S-exp)), error
    when the domain exceeds Fr's two-adic subgroup."""
    exp = max(1, (num_coeffs - 1).bit_length()) if num_coeffs > 1 else 0
    if exp >= FR_TWO_ADICITY:
        raise PolynomialDegreeTooLarge(
            f"domain 2^{exp} exceeds Fr two-adicity 2^{FR_TWO_ADICITY}"
        )
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - exp), R)
    return omega, 1 << exp, exp


class Domain:
    """A 2^exp evaluation domain over Fr with cached twiddles.

    Holds Montgomery-form device arrays; all transforms are jitted once per
    domain size. Input/output: (16, d) Montgomery Fr limb arrays.
    """

    _cache = {}

    def __new__(cls, exp: int):
        if exp in cls._cache:
            return cls._cache[exp]
        self = super().__new__(cls)
        cls._cache[exp] = self
        return self

    def __init__(self, exp: int):
        if getattr(self, "_ready", False):
            return
        if exp >= FR_TWO_ADICITY:
            raise PolynomialDegreeTooLarge(
                f"domain 2^{exp} exceeds Fr two-adicity 2^{FR_TWO_ADICITY}"
            )
        self.exp = exp
        self.d = 1 << exp
        self.omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - exp), R)
        self.omega_inv = pow(self.omega, -1, R)
        self.d_inv = pow(self.d, -1, R)
        self.gen = FR_GENERATOR
        self.gen_inv = pow(FR_GENERATOR, -1, R)
        # twiddle tables are built AND CACHED host-side as numpy arrays so
        # they are concrete even when the Domain singleton is first
        # constructed inside a jit trace (e.g. under the jitted
        # Newton-division wrappers) — any jnp result created under a trace
        # is a tracer, and caching one in the singleton poisons every later
        # trace (UnexpectedTracerError). numpy constants are safe in both
        # eager and traced contexts (baked in as compile-time constants).
        self.bitrev = _bitrev_perm(exp) if exp < _BIG_TABLE_EXP else None
        half = max(1, self.d // 2)
        if exp < _BIG_TABLE_EXP:
            self.tw_fwd = self._powers(self.omega, half)
            self.tw_inv = self._powers(self.omega_inv, half)
            self.coset_pow = self._powers(self.gen, self.d)
            self.coset_ipow = self._powers(self.gen_inv, self.d)
        else:
            # big domain: O(n) tables are never materialised (see
            # _BIG_TABLE_EXP). The Pease loop is unreachable (the four-step
            # gate is forced on) and coset multiplies use split tables.
            self.tw_fwd = self.tw_inv = None
            self.coset_pow = self.coset_ipow = None
        self._dinv_np = np.asarray(FR.encode([self.d_inv]))[:, 0].reshape(FR.L, 1)
        self._ntt_fwd = jax.jit(partial(self._ntt, inverse=False))
        self._ntt_inv = jax.jit(partial(self._ntt, inverse=True))

        # coset tables are CLOSED OVER (compile-time constants), not passed
        # as arguments: a numpy argument to a jitted fn would re-upload the
        # whole table on every call
        def _mul_by(table):
            t = table  # numpy; becomes a baked constant inside the jit
            return jax.jit(
                lambda x: FR.mul(
                    x, t.reshape((FR.L,) + (1,) * (x.ndim - 2) + (t.shape[-1],))
                )
            )

        def _mul_split(sc, hi, lo):
            # elementwise multiply by the geometric vector
            # v[i] = hi[i >> sc] * lo[i & (2^sc - 1)]: two O(sqrt(n))
            # tables + one extra multiply instead of one O(n) literal
            # (see _BIG_TABLE_EXP)
            def f(x):
                nb = x.ndim - 2
                n = x.shape[-1]
                xs = x.reshape(x.shape[:-1] + (n >> sc, 1 << sc))
                xs = FR.mul(
                    xs, hi.reshape((FR.L,) + (1,) * nb + (n >> sc, 1))
                )
                xs = FR.mul(
                    xs, lo.reshape((FR.L,) + (1,) * nb + (1, 1 << sc))
                )
                return xs.reshape(x.shape)

            return jax.jit(f)

        if exp < _BIG_TABLE_EXP:
            self._mul_coset_fwd = _mul_by(self.coset_pow)
            self._mul_coset_inv = _mul_by(self.coset_ipow)
        else:
            sc = exp // 2
            step = 1 << sc
            self._mul_coset_fwd = _mul_split(
                sc,
                self._powers_step(self.gen, step, self.d >> sc),
                self._powers(self.gen, step),
            )
            self._mul_coset_inv = _mul_split(
                sc,
                self._powers_step(self.gen_inv, step, self.d >> sc),
                self._powers(self.gen_inv, step),
            )
        self._ready = True

    @staticmethod
    def _powers(base: int, count: int):
        """(16, count) Montgomery NUMPY array of base^0 .. base^(count-1),
        computed with host integers (no device/jnp ops — see __init__ note)."""
        ints = []
        cur = 1
        for _ in range(count):
            ints.append(cur)
            cur = cur * base % R
        return FR.encode(ints)

    @staticmethod
    def _powers_step(base: int, step: int, count: int):
        """(16, count) Montgomery numpy array of base^(step*i), i < count."""
        return Domain._powers(pow(base, step, R), count)

    # ---- four-step (Bailey) decomposition ------------------------------------

    def _fs_split(self):
        """(exp_r, exp_c) four-step factorization. Balanced by default; on
        the MXU path the second factor is pinned to <= 2^7 (the matmul-DFT
        block edge) so deep sizes recurse in the fewest levels (2^20 ->
        (7, 13) -> (7, 6): three matmul passes instead of four)."""
        from .mxu import mxu_available, _MAX_EXP

        if mxu_available() and self.exp > 2 * _MAX_EXP:
            exp_r = _MAX_EXP
        else:
            exp_r = self.exp // 2
        return exp_r, self.exp - exp_r

    def _four_step_consts(self, inverse: bool):
        """(expR, expC, s, WH, WL) for one transform direction: the twiddle
        matrix W[k2, j1] = omega^(+-j1*k2) in SPLIT form,

            W[k2, j1] = WH[k2, j1 >> s] * WL[k2, j1 & (2^s - 1)],

        two O(n^(3/4))-entry numpy tables instead of one O(n) literal
        (see _BIG_TABLE_EXP). Built lazily per (direction, split)."""
        exp_r, exp_c = self._fs_split()
        key = ("_fs_inv" if inverse else "_fs_fwd") + f"_{exp_r}"
        if getattr(self, key, None) is None:
            rn, cn = 1 << exp_r, 1 << exp_c
            s = exp_r // 2
            base = self.omega_inv if inverse else self.omega
            hi_ints, lo_ints = [], []
            for k2 in range(cn):
                q = pow(base, k2, R)
                qs = pow(q, 1 << s, R)
                cur = 1
                for _ in range(rn >> s):  # WH row: powers of base^(k2<<s)
                    hi_ints.append(cur)
                    cur = cur * qs % R
                cur = 1
                for _ in range(1 << s):  # WL row: powers of base^k2
                    lo_ints.append(cur)
                    cur = cur * q % R
            wh = FR.encode(hi_ints).reshape(FR.L, cn, rn >> s)
            wl = FR.encode(lo_ints).reshape(FR.L, cn, 1 << s)
            setattr(self, key, (exp_r, exp_c, s, wh, wl))
        return getattr(self, key)

    def _ntt_four_step(self, x, inverse: bool):
        """n = R*C NTT as C-point NTTs + twiddle + transpose + R-point NTTs
        (Bailey; the in-device analog of the distributed four-step NTT in
        parallel/ntt.py, and of the reference's parallel_fft decomposition,
        ft.rs:336-387). With j = j1 + R*j2 and k = k2 + C*k1:

            Y[k2, j1] = NTT_C over j2 of x[j1 + R*j2]     (axis -2)
            Z[k2, j1] = Y[k2, j1] * omega^(j1*k2)
            X[k2 + C*k1] = NTT_R over j1 of Z[., k2]      (axis -2 after
                                                           one transpose)

        Every butterfly stage moves >= min(R, C)-element contiguous chunks
        (vs the Pease stage's element-granularity perfect shuffle), the
        result lands in natural order with no extra permutation, and the
        sub-NTTs' own 1/C and 1/R inverse scalings compose to 1/n."""
        exp_r, exp_c, s, wh, wl = self._four_step_consts(inverse)
        rn, cn = 1 << exp_r, 1 << exp_c
        nl = len(x.shape[1:-1])
        x = x.reshape(x.shape[:-1] + (cn, rn))  # [j2, j1]
        x = Domain(exp_c)._ntt_axis2(x, inverse)  # -> [k2, j1]
        # twiddle multiply in split form: view j1 as (jhi, jlo) and apply
        # WH[k2, jhi] then WL[k2, jlo]
        xs = x.reshape(x.shape[:-1] + (rn >> s, 1 << s))
        xs = FR.mul(xs, wh.reshape((FR.L,) + (1,) * nl + (cn, rn >> s, 1)))
        xs = FR.mul(xs, wl.reshape((FR.L,) + (1,) * nl + (cn, 1, 1 << s)))
        x = xs.reshape(x.shape)
        x = jnp.swapaxes(x, -1, -2)  # [j1, k2]
        x = Domain(exp_r)._ntt_axis2(x, inverse)  # -> [k1, k2]
        return x.reshape(x.shape[:-2] + (self.d,))

    def _four_step_axis2(self, x, inverse: bool):
        """Four-step recursion ALONG AXIS -2 of (L, *lead, m, bt): the same
        j = j1 + R*j2 / k = k2 + C*k1 factorization as _ntt_four_step with
        bt riding along as a trailing batch axis (merged into each
        sub-NTT's Bt). Used on the MXU path to reduce any block to
        <= 2^7-point matmul-DFT leaves (ntt/mxu.py)."""
        exp_r, exp_c, s, wh, wl = self._four_step_consts(inverse)
        rn, cn = 1 << exp_r, 1 << exp_c
        bt = x.shape[-1]
        lead = x.shape[1:-2]
        nl = len(lead)
        x = x.reshape(x.shape[:-2] + (cn, rn * bt))  # [j2, (j1, bt)]
        x = Domain(exp_c)._ntt_axis2(x, inverse)  # -> [k2, (j1, bt)]
        x = x.reshape(x.shape[:-1] + (rn >> s, (1 << s) * bt))
        x = FR.mul(x, wh.reshape((FR.L,) + (1,) * nl + (cn, rn >> s, 1)))
        x = x.reshape(x.shape[:-1] + (1 << s, bt))
        x = FR.mul(x, wl.reshape((FR.L,) + (1,) * nl + (cn, 1, 1 << s, 1)))
        x = x.reshape(x.shape[:-3] + (rn, bt))  # [k2, j1, bt]
        x = jnp.swapaxes(x, -3, -2)  # [j1, k2, bt]
        x = x.reshape(x.shape[:-2] + (cn * bt,))
        x = Domain(exp_r)._ntt_axis2(x, inverse)  # -> [k1, (k2, bt)]
        return x.reshape(x.shape[:-1] + (cn, bt)).reshape(
            (FR.L,) + tuple(lead) + (self.d, bt)
        )

    def _ntt_axis2(self, x, inverse: bool):
        """The _ntt stage loop transforming axis -2 of (L, *lead, m, Bt):
        identical algorithm, but every slice/interleave/bit-reversal moves
        whole Bt-element rows (contiguous chunks) instead of single
        elements."""
        m = self.d
        if m == 1:
            return x
        from .mxu import mxu_available, dft_axis2, _MAX_EXP

        if mxu_available():
            if self.exp <= _MAX_EXP:
                return dft_axis2(self.exp, inverse, x)
            return self._four_step_axis2(x, inverse)
        tw = self.tw_inv if inverse else self.tw_fwd  # numpy (L, m/2)
        h = m // 2
        lead = x.shape[1:-2]
        bt = x.shape[-1]
        nl = len(lead)
        flat = h * bt
        for d_ in lead:
            flat *= d_
        use_kernel = pallas_enabled() and flat % 1024 == 0
        stage = _get_ntt_stage() if use_kernel else None
        full = (FR.L,) + tuple(lead) + (h, bt)
        for s in range(self.exp):
            a = x[..., :h, :]
            b = x[..., h:, :]
            step = 1 << s
            w_np = np.repeat(tw[:, ::step][:, : h // step], step, axis=1)
            w = w_np.reshape((FR.L,) + (1,) * nl + (h, 1))
            if use_kernel:
                wb = jnp.broadcast_to(jnp.asarray(w), full)
                u, v = stage(
                    a.reshape(FR.L, -1),
                    b.reshape(FR.L, -1),
                    wb.reshape(FR.L, -1),
                )
                u = u.reshape(full)
                v = v.reshape(full)
            else:
                u = FR.add(a, b)
                v = FR.mul(FR.sub(a, b), w)
            x = jnp.stack([u, v], axis=-2).reshape(x.shape)
        x = jnp.take(x, self.bitrev, axis=-2)
        if inverse:
            dinv = self._dinv_np.reshape((FR.L,) + (1,) * nl + (1, 1))
            x = FR.mul(x, dinv)
        return x

    # ---- core transform -----------------------------------------------------

    def _ntt(self, x, inverse: bool):
        """Pease constant-geometry DIF: every stage splits the array into
        halves, butterflies, and interleaves — identical shapes each stage,
        so the whole stage loop is ONE compiled fori_loop body. Stage s of a
        2^s-way interleaved layout needs twiddle omega^(2^s * (j >> s)),
        fetched from the power table with a masked-index gather."""
        n = self.d
        if n == 1:
            return x
        from ..config import get_config

        # config can lower the four-step gate (tests force it small) but
        # not raise it past _BIG_TABLE_EXP: big domains have no dense
        # stage tables, so the Pease loop is not an option there. On the
        # MXU path everything above the matmul-DFT block edge four-steps
        # down to matmul leaves.
        from .mxu import mxu_available, _MAX_EXP

        gate = max(4, min(get_config().ntt_four_step_min_exp, _BIG_TABLE_EXP))
        if mxu_available():
            gate = min(gate, _MAX_EXP + 1)
        if self.exp >= gate:
            return self._ntt_four_step(x, inverse)
        tw = self.tw_inv if inverse else self.tw_fwd
        logn = self.exp
        h = n // 2
        jidx = jnp.arange(h, dtype=jnp.int32)
        bshape = x.shape[1:-1]  # arbitrary batch dims between limbs and n
        wshape = (FR.L,) + (1,) * len(bshape) + (h,)

        flat_h = h
        for d in bshape:
            flat_h *= d
        if pallas_enabled() and flat_h % 1024 == 0:
            # unrolled stage loop, one fused butterfly kernel per stage;
            # the stage-s twiddle table (tw[k * 2^s] each repeated 2^s
            # times) comes from a strided slice + broadcast instead of an
            # arbitrary-index gather on the scalar core
            stage = _get_ntt_stage()
            full = (FR.L,) + bshape + (h,)
            for s in range(logn):
                a = x[..., :h]
                b = x[..., h:]
                step = 1 << s
                wk = jax.lax.slice_in_dim(tw, 0, h, stride=step, axis=1)
                w = jnp.broadcast_to(
                    wk[:, :, None], (FR.L, h // step, step)
                ).reshape(wshape)
                wb = jnp.broadcast_to(w, full)
                u, v = stage(
                    a.reshape(FR.L, -1),
                    b.reshape(FR.L, -1),
                    wb.reshape(FR.L, -1),
                )
                x = jnp.stack(
                    [u.reshape(full), v.reshape(full)], axis=-1
                ).reshape(x.shape)
        else:

            def body(s, x):
                a = x[..., :h]
                b = x[..., h:]
                u = FR.add(a, b)
                t = FR.sub(a, b)
                low = jnp.left_shift(jnp.int32(1), s) - 1
                w = jnp.take(tw, jidx & ~low, axis=1).reshape(wshape)
                v = FR.mul(t, w)
                return jnp.stack([u, v], axis=-1).reshape(x.shape)

            x = jax.lax.fori_loop(0, logn, body, x)
        x = jnp.take(x, self.bitrev, axis=-1)
        if inverse:
            dinv = jnp.asarray(self._dinv_np).reshape((FR.L,) + (1,) * len(bshape) + (1,))
            x = FR.mul(x, dinv)
        return x

    # ---- public API (reference ft.rs:111-178 parity) --------------------------

    def ntt(self, coeffs):
        """Coefficients -> evaluations over the omega-domain."""
        return self._ntt_fwd(coeffs)

    def intt(self, evals):
        """Evaluations -> coefficients (scaled by 1/d)."""
        return self._ntt_inv(evals)

    def coset_ntt(self, coeffs):
        """Evaluate over the coset g*<omega> (ft.rs:158-166 semantics)."""
        return self._ntt_fwd(self._mul_coset_fwd(coeffs))

    def coset_intt(self, evals):
        """Inverse of coset_ntt (ft.rs:168-178 semantics)."""
        return self._mul_coset_inv(self._ntt_inv(evals))

    # ---- vanishing polynomial helpers (ft.rs:182-217 parity) -------------------

    def z_at(self, tau_int: int) -> int:
        """Evaluate Z(tau) = tau^d - 1 (host-side scalar)."""
        return (pow(tau_int, self.d, R) - 1) % R

    def divide_by_z_on_coset(self, coset_evals):
        """Divide coset evaluations by Z(g*omega^i) = g^d - 1 (constant on
        the coset), matching ft.rs:194-217."""
        zinv = pow(pow(self.gen, self.d, R) - 1, -1, R)
        c = jnp.asarray(FR.encode([zinv]))
        return FR.mul(coset_evals, c)
