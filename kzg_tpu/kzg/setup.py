"""Trusted setup: the SRS power ladders g^(s^i), h^(s^i).

The reference builds these with a serial chain of scalar multiplications
(lib.rs:38-55: curr = curr * s, inherently sequential). TPU-native design:

  1. powers s^0..s^(n-1) via a log-depth prefix product over Fr;
  2. one fixed-base windowed multi-scalar table per group: T[w][d] =
     (d * 2^(cw)) * G, built with batched prefix point-scans;
  3. every SRS element is then W-1 vectorised point additions of table
     gathers — total depth O(W + log n) instead of O(n).

Params are stored as affine coordinate batches (the form the MSM consumes)
and can be persisted with save/load (the checkpoint-subsystem analog of the
reference's serde_support feature, SURVEY.md §5.4).
"""

import os
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import R, LIMB_BITS
from ..fields import FR
from ..curve import G1, G2, g1_generator_device, g2_generator_device
from ..msm.pippenger import _digits

FIXED_BASE_WINDOW = 8


@dataclass
class KZGParams:
    """SRS: gs = (x, y, inf) G1 affine batch of g^(s^i), i < n;
    hs = same over G2 (reference KZGParams, lib.rs:14-19)."""

    gs: tuple
    hs: tuple
    n: int

    def save(self, path: str):
        np.savez(
            path,
            g_x=np.asarray(self.gs[0]), g_y=np.asarray(self.gs[1]), g_i=np.asarray(self.gs[2]),
            h_x=np.asarray(self.hs[0]), h_y=np.asarray(self.hs[1]), h_i=np.asarray(self.hs[2]),
            n=self.n,
        )

    @classmethod
    def load(cls, path: str):
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        gs = tuple(jnp.asarray(z[k]) for k in ("g_x", "g_y", "g_i"))
        hs = tuple(jnp.asarray(z[k]) for k in ("h_x", "h_y", "h_i"))
        return cls(gs=gs, hs=hs, n=int(z["n"]))


def _fixed_base_table(curve, gen_point, c: int, w_count: int):
    """T[w][d] = (d << (c*w)) * G as an affine (x, y, inf) batch of
    shape (..., w_count, 2^c)."""
    b = 1 << c

    # bases g_w = 2^(cw) * G, built by c*w_count sequential doublings (cheap,
    # one lane) collected every c steps.
    pt = gen_point  # batch shape (1,)
    bases = []
    for w in range(w_count):
        bases.append(pt)
        for _ in range(c):
            pt = curve.dbl(pt)
    base_batch = tuple(jnp.concatenate([bb[i] for bb in bases], axis=-1)
                       for i in range(3))  # (..., w_count)

    # row for base B: [inf, B, 2B, ..., (b-1)B] via prefix point scan of a
    # constant-B batch
    rep = tuple(jnp.repeat(t[..., :, None], b - 1, axis=-1) for t in base_batch)
    # prefix scan: pre[j] = (j+1) * B
    n = b - 1
    idx = jnp.arange(n)

    def body(r, acc):
        s = jnp.left_shift(1, r)
        shifted = tuple(jnp.roll(t, s, axis=-1) for t in acc)
        added = curve.add(acc, shifted)
        return curve.select(idx >= s, added, acc)

    rounds = max(1, (n - 1).bit_length())
    pre = jax.lax.fori_loop(0, rounds, body, rep)
    inf_col = curve.infinity((w_count, 1))
    table = tuple(
        jnp.concatenate([ic, t], axis=-1) for ic, t in zip(inf_col, pre)
    )  # (..., w_count, b) jacobian
    return table


def _ladder_from_table(curve, table, digits):
    """SRS points: sum_w T[w][digit_w(s^i)] for every i, via W gathers+adds.
    digits: (W, n) int32."""
    w_count = digits.shape[0]
    n = digits.shape[-1]

    def body(w, acc):
        row = tuple(t[..., w, :] for t in table)
        d = digits[w]
        q = tuple(jnp.take(t, d, axis=-1) for t in row)
        return curve.add(acc, q)

    return jax.lax.fori_loop(0, w_count, body, curve.infinity((n,)))


@partial(jax.jit, static_argnums=0)
def _ladders_jit(c: int, digits):
    """Both fixed-base ladders (G1 and G2) for a (W, n) digit array,
    returned in affine form. Shared by setup() and the Lagrange-SRS
    fast path."""
    w_count = digits.shape[0]
    t1 = _fixed_base_table(G1, g1_generator_device(1), c, w_count)
    t2 = _fixed_base_table(G2, g2_generator_device(1), c, w_count)
    gs = _ladder_from_table(G1, t1, digits)
    hs = _ladder_from_table(G2, t2, digits)
    return G1.to_affine(gs), G2.to_affine(hs)


@partial(jax.jit, static_argnums=(0, 1))
def _setup_digits_jit(n: int, c: int, s_mont):
    """Window digits of the powers s^0 .. s^(n-1)."""
    sb = jnp.broadcast_to(s_mont, (FR.L, n))
    pw = FR.prefix_mul(sb)
    powers = jnp.concatenate([FR.one((1,)), pw[:, : n - 1]], axis=1)
    return _digits(FR.from_mont(powers), c)


def setup(s: int, num_coeffs: int) -> KZGParams:
    """Build an SRS for polynomials with up to num_coeffs coefficients from
    the secret s (reference setup(), lib.rs:38-55)."""
    s_mont = jnp.asarray(FR.encode([s % R]))
    digits = _setup_digits_jit(num_coeffs, FIXED_BASE_WINDOW, s_mont)
    gs, hs = _ladders_jit(FIXED_BASE_WINDOW, digits)
    return KZGParams(gs=gs, hs=hs, n=num_coeffs)


def csprng_setup(num_coeffs: int) -> KZGParams:
    """Random setup from OS entropy (reference csprng_setup, lib.rs:60-64)."""
    s = int.from_bytes(os.urandom(48), "little") % R
    return setup(s, num_coeffs)
