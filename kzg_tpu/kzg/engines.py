"""Pairing-check engines for the protocol verifiers.

The reference calls blst's pairing on the host (coeff_form.rs:126-142);
round 1 of this framework did the same through the C++ native engine. This
module adds the fully ON-DEVICE engine: the small G1/G2 scalar muls, the
Miller loops and the final exponentiation all run on the TPU
(pairing/pairing.py), so a verify costs one boolean fetch instead of four
point fetches + host pairing work. Select with config.pairing_engine
("auto"/"host" = native C++ or oracle; "device"; "oracle").

Differential tests pin the device engine to the host path over the protocol
suites (tests/test_kzg_coeff.py / test_kzg_eval.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import LIMB_BITS
from ..fields import FR
from ..curve import G1, G2
from ..pairing.pairing import _pairing_product_jit
from ..pairing import tower as tw


def _scalar_bits_255(mont):
    """(L, 1) Montgomery scalar -> (255, 1) 0/1 rows, LSB first (device)."""
    std = FR.from_mont(mont)
    rows = []
    for limb in range(FR.L):
        for b in range(LIMB_BITS):
            rows.append((std[limb] >> b) & 1)
    return jnp.stack(rows[:255]).astype(jnp.uint32)


@jax.jit
def _verify_eval_device_jit(x_mont, y_mont, c_jac, w_jac, g_aff, h_aff, hs1_aff):
    """Device evaluation-check: e(w, h^s / h^x) * e(g^y / C, h) == 1.

    g_aff: ((L,1), (L,1)) G1 affine; h_aff/hs1_aff: ((L,2,1), (L,2,1)) G2
    affine; c_jac/w_jac: G1 Jacobian batch-(1,) tuples. Returns a scalar
    bool array."""
    bits_x = _scalar_bits_255(x_mont)
    bits_y = _scalar_bits_255(y_mont)
    # s2 = h^s - x h   (G2)
    h_j = (h_aff[0], h_aff[1], G2.fa.one(h_aff[0].shape[2:]))
    hs1_j = (hs1_aff[0], hs1_aff[1], G2.fa.one(hs1_aff[0].shape[2:]))
    xh = G2.scalar_mul_bits(h_j, bits_x)
    s2 = G2.add(hs1_j, G2.neg(xh))
    # r1 = g^y - C     (G1; the negated e(C - g^y, h) side)
    g_j = (g_aff[0], g_aff[1], G1.fa.one(g_aff[0].shape[1:]))
    yg = G1.scalar_mul_bits(g_j, bits_y)
    r1 = G1.add(yg, G1.neg(c_jac))
    # affine forms for the Miller loop
    w_aff = G1.to_affine(w_jac)
    r1_aff = G1.to_affine(r1)
    s2_aff = G2.to_affine(s2)
    h_inf = jnp.zeros(h_aff[0].shape[2:], bool)
    # batch the two pairs on the last axis: (w, s2), (r1, h)
    g1x = jnp.concatenate([w_aff[0], r1_aff[0]], axis=-1)
    g1y = jnp.concatenate([w_aff[1], r1_aff[1]], axis=-1)
    g1i = jnp.concatenate([w_aff[2], r1_aff[2]], axis=-1)
    g2x = jnp.concatenate([s2_aff[0], h_aff[0]], axis=-1)
    g2y = jnp.concatenate([s2_aff[1], h_aff[1]], axis=-1)
    g2i = jnp.concatenate([s2_aff[2], h_inf], axis=-1)
    out = _pairing_product_jit(g1x, g1y, g1i, g2x, g2y, g2i)
    return tw.f12_is_one(out)


@jax.jit
def _verify_batched_device_jit(c_jac, w_jac, hz_jac, gr_jac, h_aff):
    """Device batched check: e(w, h^Z) * e(g^r / C, h) == 1 (hz/gr already
    computed on device by the caller's MSMs)."""
    r1 = G1.add(gr_jac, G1.neg(c_jac))
    w_aff = G1.to_affine(w_jac)
    r1_aff = G1.to_affine(r1)
    hz_aff = G2.to_affine(hz_jac)
    h_inf = jnp.zeros(h_aff[0].shape[2:], bool)
    g1x = jnp.concatenate([w_aff[0], r1_aff[0]], axis=-1)
    g1y = jnp.concatenate([w_aff[1], r1_aff[1]], axis=-1)
    g1i = jnp.concatenate([w_aff[2], r1_aff[2]], axis=-1)
    g2x = jnp.concatenate([hz_aff[0], h_aff[0]], axis=-1)
    g2y = jnp.concatenate([hz_aff[1], h_aff[1]], axis=-1)
    g2i = jnp.concatenate([hz_aff[2], h_inf], axis=-1)
    out = _pairing_product_jit(g1x, g1y, g1i, g2x, g2y, g2i)
    return tw.f12_is_one(out)


def _expand1(p):
    """batch-() Jacobian point -> batch-(1,) tuple."""
    return tuple(t[..., None] for t in p)


def verify_eval_device(params, x_int, y_int, commitment, witness) -> bool:
    """Fully on-device single-point evaluation check."""
    x_mont = jnp.asarray(FR.encode([x_int]))
    y_mont = jnp.asarray(FR.encode([y_int]))
    g_aff = (params.gs[0][..., 0:1], params.gs[1][..., 0:1])
    h_aff = (params.hs[0][..., 0:1], params.hs[1][..., 0:1])
    hs1_aff = (params.hs[0][..., 1:2], params.hs[1][..., 1:2])
    ok = _verify_eval_device_jit(
        x_mont, y_mont, _expand1(commitment), _expand1(witness),
        g_aff, h_aff, hs1_aff,
    )
    return bool(np.asarray(ok))


def verify_batched_device(params, commitment, w, hz, gr) -> bool:
    """Fully on-device batched evaluation check (hz, gr device points)."""
    h_aff = (params.hs[0][..., 0:1], params.hs[1][..., 0:1])
    ok = _verify_batched_device_jit(
        _expand1(commitment), _expand1(w), _expand1(hz), _expand1(gr), h_aff
    )
    return bool(np.asarray(ok))
