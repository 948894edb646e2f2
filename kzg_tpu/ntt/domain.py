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
from ..fields.pallas_field import (
    PallasFieldOps,
    _run_elementwise,
    pallas_enabled,
)
from ..kzg.errors import PolynomialDegreeTooLarge

_butterfly = None


def _get_butterfly():
    """Fused DIF butterfly kernel: (a, b, w) -> (a + b, (a - b) * w).

    One Pallas kernel per stage instead of three separate limb ops — the
    whole butterfly (including the Montgomery multiply) stays in VMEM."""
    global _butterfly
    if _butterfly is None:
        ops = PallasFieldOps(FR)

        def body(a, b, w):
            return ops.add(a, b), ops.mul(ops.sub(a, b), w)

        def bf(a, b, w):
            return _run_elementwise(FR, body, [a, b, w], 2)

        _butterfly = bf
    return _butterfly


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
        self.bitrev = _bitrev_perm(exp)
        half = max(1, self.d // 2)
        self.tw_fwd = self._powers(self.omega, half)
        self.tw_inv = self._powers(self.omega_inv, half)
        self.coset_pow = self._powers(self.gen, self.d)
        self.coset_ipow = self._powers(self.gen_inv, self.d)
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

        self._mul_coset_fwd = _mul_by(self.coset_pow)
        self._mul_coset_inv = _mul_by(self.coset_ipow)
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
            # unrolled stage loop with one fused butterfly kernel per stage
            # (the per-stage twiddle gather stays in XLA)
            bf = _get_butterfly()
            full = (FR.L,) + bshape + (h,)
            for s in range(logn):
                a = x[..., :h]
                b = x[..., h:]
                low = (1 << s) - 1
                w = jnp.take(tw, jidx & ~low, axis=1).reshape(wshape)
                wb = jnp.broadcast_to(w, full)
                u, v = bf(
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
