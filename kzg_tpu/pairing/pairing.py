"""On-device optimal ate pairing over BLS12-381.

Replaces the host-side oracle pairing in the verifiers (the reference calls
blstrs `pairing()` — coeff_form.rs:132-141, eval_form.rs:181-190). Structure
mirrors the oracle (oracle/curve.py): untwist G2 to E(Fp12), affine Miller
loop f_{|x|,Q}(P) with the BLS x<0 conjugation fixup, then the final
exponentiation (easy part by conj/inv/Frobenius, hard part as one
static-exponent scan ladder).

The Miller loop is a lax.scan over the 63 loop bits with branch-free
conditional adds, so the compiled graph is ONE doubling+addition body.
Everything is batched: pairing_check([(P_i, Q_i)]) runs all Miller loops in
lanes and shares a single final exponentiation (same trick the oracle's
multi_pairing_check uses).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import P, R, BLS_X
from ..fields import FP
from . import tower as tw


# ---------------------------------------------------------------------------
# untwist constants: w^-2, w^-3 as Fp12 device constants (derived via the
# oracle tower at import time — host ints only)
# ---------------------------------------------------------------------------

_W_CONSTS = None


def _w_consts(batch=()):
    global _W_CONSTS
    if _W_CONSTS is None:
        from ..oracle.curve import _w_inv_powers

        w_m2, w_m3 = _w_inv_powers()
        _W_CONSTS = (tw.f12_from_oracle(w_m2), tw.f12_from_oracle(w_m3))
    if batch:
        return tuple(
            jnp.broadcast_to(
                c.reshape(FP.L, 12, *([1] * len(batch))),
                (FP.L, 12) + tuple(batch),
            )
            for c in _W_CONSTS
        )
    return _W_CONSTS


def _fp_to_f12(x):
    """Embed an Fp element (L, *batch) into Fp12 (L, 12, *batch)."""
    batch = x.shape[1:]
    out = tw.f12_zero(batch)
    return out.at[:, 0].set(x)


def _fp2_to_f12(x):
    """Embed an Fp2 element (L, 2, *batch) into Fp12."""
    batch = x.shape[2:]
    out = tw.f12_zero(batch)
    return out.at[:, 0:2].set(x)


def untwist_device(xq, yq):
    """E'(Fp2) affine -> E(Fp12) affine: (x/w^2, y/w^3)."""
    batch = xq.shape[2:]
    w_m2, w_m3 = _w_consts(batch)
    return (
        tw.f12_mul(_fp2_to_f12(xq), w_m2),
        tw.f12_mul(_fp2_to_f12(yq), w_m3),
    )


# ---------------------------------------------------------------------------
# Miller loop
# ---------------------------------------------------------------------------


def _line_tangent(t, p):
    """Line tangent at t, evaluated at p (both E(Fp12) affine)."""
    xt, yt = t
    xp, yp = p
    x2 = tw.f12_sqr(xt)
    three_x2 = tw.f12_add(tw.f12_add(x2, x2), x2)
    lam = tw.f12_mul(three_x2, tw.f12_inv(tw.f12_add(yt, yt)))
    ell = FP.sub(FP.sub(yp, yt), tw.f12_mul(lam, FP.sub(xp, xt)))
    return ell, lam


def _line_chord(t, q, p):
    xt, yt = t
    xq, yq = q
    xp, yp = p
    lam = tw.f12_mul(FP.sub(yq, yt), tw.f12_inv(FP.sub(xq, xt)))
    ell = FP.sub(FP.sub(yp, yt), tw.f12_mul(lam, FP.sub(xp, xt)))
    return ell, lam


def _ec_add_with_lambda(t, other_x, lam):
    """Affine add given the chord/tangent slope lam."""
    xt, yt = t
    x3 = FP.sub(FP.sub(tw.f12_sqr(lam), xt), other_x)
    y3 = FP.sub(tw.f12_mul(lam, FP.sub(xt, x3)), yt)
    return (x3, y3)


def miller_loop_device(p_aff, q_aff):
    """f_{|x|,Q}(P) conjugated for x < 0. p_aff = (xp, yp) Fp coords
    (L, *batch); q_aff = (xq, yq) Fp2 coords (L, 2, *batch). Points must be
    non-infinity (callers handle the degenerate fast paths)."""
    batch = p_aff[0].shape[1:]
    q = untwist_device(*q_aff)
    p = (_fp_to_f12(p_aff[0]), _fp_to_f12(p_aff[1]))
    n = -BLS_X
    nbits = n.bit_length()
    bits = jnp.asarray(
        np.array(
            [(n >> i) & 1 for i in range(nbits - 2, -1, -1)], dtype=np.uint32
        )
    )

    def body(carry, bit):
        f, tx, ty = carry
        t = (tx, ty)
        ell, lam = _line_tangent(t, p)
        f = tw.f12_mul(tw.f12_sqr(f), ell)
        t = _ec_add_with_lambda(t, tx, lam)
        # conditional addition step
        ell2, lam2 = _line_chord(t, q, p)
        t_add = _ec_add_with_lambda(t, q[0], lam2)
        cond = bit != 0
        f = tw.f12_select(cond, tw.f12_mul(f, ell2), f)
        tx2 = tw.f12_select(cond, t_add[0], t[0])
        ty2 = tw.f12_select(cond, t_add[1], t[1])
        return (f, tx2, ty2), None

    f0 = tw.f12_one(batch)
    (f, _, _), _ = jax.lax.scan(body, (f0, q[0], q[1]), bits)
    return tw.f12_conj(f)  # x < 0 fixup


# ---------------------------------------------------------------------------
# final exponentiation
# ---------------------------------------------------------------------------

_HARD_EXP = (P ** 4 - P ** 2 + 1) // R
# base-p decomposition of the hard exponent: hard = sum_i _HARD_BASE_P[i] p^i
# with each digit < p, so f^hard = prod (f^(p^i))^(h_i) — the Frobenius
# powers are nearly free and the joint Shamir ladder needs ~381 cyclotomic
# squarings instead of the ~2700-bit generic ladder (the reference's blst
# uses the equivalent cyclotomic + x-chain structure).
_HARD_BASE_P = []
_h = _HARD_EXP
while _h:
    _HARD_BASE_P.append(_h % P)
    _h //= P
assert len(_HARD_BASE_P) == 4
assert sum(h * P ** i for i, h in enumerate(_HARD_BASE_P)) == _HARD_EXP


def final_exp_device(f):
    """f^((p^12-1)/r): easy part conj*inv + p^2-Frobenius; hard part via the
    base-p Frobenius decomposition + joint ladder with Granger-Scott
    cyclotomic squarings (valid after the easy part)."""
    f = tw.f12_mul(tw.f12_conj(f), tw.f12_inv(f))  # f^(p^6 - 1)
    f = tw.f12_mul(tw.f12_frobenius(tw.f12_frobenius(f)), f)  # ^(p^2 + 1)
    return tw.f12_joint_pow_frobenius(f, _HARD_BASE_P)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@jax.jit
def _pairing_product_jit(xp, yp, p_inf, xq, yq, q_inf):
    """prod_i e_miller(P_i, Q_i) with infinity pairs contributing 1, then
    one final exponentiation. Inputs batched on the last axis."""
    f = miller_loop_device((xp, yp), (xq, yq))
    skip = jnp.logical_or(p_inf, q_inf)
    f = tw.f12_select(~skip, f, tw.f12_one(f.shape[2:]))
    # product over the batch axis (log-depth)
    n = f.shape[-1]
    rounds = max(1, (n - 1).bit_length()) if n > 1 else 0
    idx = jnp.arange(n)
    for r in range(rounds):
        s = 1 << r
        shifted = jnp.roll(f, -s, axis=-1)
        prod = tw.f12_mul(f, shifted)
        f = jnp.where((idx < n - s)[None, None], prod, f)
    return final_exp_device(f[..., 0])


def pairing_check_device(g1_points, g2_points) -> bool:
    """True iff prod e(P_i, Q_i) == 1. g1_points = (x, y, inf) Fp affine
    batch; g2_points = (x, y, inf) Fp2 affine batch (device arrays)."""
    out = _pairing_product_jit(
        g1_points[0], g1_points[1], g1_points[2],
        g2_points[0], g2_points[1], g2_points[2],
    )
    return bool(np.asarray(tw.f12_is_one(out)))


def pairing_device(p_aff, q_aff):
    """Single pairing e(P, Q) -> (L, 12) Gt element (batch-1 inputs)."""
    f = miller_loop_device(p_aff, q_aff)
    return final_exp_device(f)
