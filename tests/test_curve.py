"""Curve-op differential tests vs the Python oracle (double-and-add pinned
against oracle ec_add/ec_mul, exceptional cases exercised explicitly)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kzg_tpu.constants import R
from kzg_tpu.curve import (
    G1,
    G2,
    B1_CONST,
    B2_CONST,
    g1_to_device,
    g1_from_device,
    g2_to_device,
    g2_from_device,
    g1_generator_device,
    g2_generator_device,
)
from kzg_tpu.oracle import ec_add, ec_mul, ec_neg, g1_generator, g2_generator

# slow tier: XLA point-formula graphs (~10^3 HLOs/op) take >10 min to compile on a 1-core host;
# the fast tier (pytest -m 'not slow') must stay <10 min cold (VERDICT r2 #5)
pytestmark = pytest.mark.slow


def bits_of(k, n, batch=1):
    arr = np.array([[(k >> i) & 1] * batch for i in range(n)], dtype=np.uint32)
    return jnp.asarray(arr)


@pytest.fixture(scope="module")
def g1pts(rng=None):
    import random

    rng = random.Random(7)
    g = g1_generator()
    ks = [rng.randrange(1, R) for _ in range(4)]
    return ks, [ec_mul(g, k) for k in ks]


def test_g1_add_matches_oracle(g1pts):
    ks, pts = g1pts
    d = g1_to_device(pts)
    # pairwise adds: P[i] + P[(i+1)%4]
    rolled = tuple(jnp.roll(c, -1, axis=-1) for c in d)
    got = g1_from_device(G1.add(d, rolled))
    want = [ec_add(pts[i], pts[(i + 1) % 4]) for i in range(4)]
    assert got == want


def test_g1_dbl_matches_oracle(g1pts):
    _, pts = g1pts
    d = g1_to_device(pts)
    got = g1_from_device(G1.dbl(d))
    assert got == [ec_add(p, p) for p in pts]


def test_g1_exceptional_cases(g1pts):
    _, pts = g1pts
    p = pts[0]
    cases = [
        (p, p),               # doubling via add
        (p, ec_neg(p)),       # P + (-P) = inf
        (None, p),            # inf + P
        (p, None),            # P + inf
        (None, None),         # inf + inf
    ]
    a = g1_to_device([c[0] for c in cases])
    b = g1_to_device([c[1] for c in cases])
    got = g1_from_device(G1.add(a, b))
    want = [ec_add(x, y) for x, y in cases]
    assert got == want


def test_g1_madd(g1pts):
    _, pts = g1pts
    p = pts[0]
    jac = g1_to_device([p, p, None, pts[1]])
    aff_pts = [pts[1], ec_neg(p), pts[2], None]
    ax, ay, az = g1_to_device(aff_pts)
    inf_mask = jnp.asarray(np.array([pt is None for pt in aff_pts]))
    got = g1_from_device(G1.madd(jac, (ax, ay), inf_mask))
    want = [ec_add(a, b) for a, b in zip([p, p, None, pts[1]], aff_pts)]
    assert got == want


def test_g1_scalar_mul(g1pts):
    ks, pts = g1pts
    g = g1_generator()
    gd = g1_generator_device(1)
    k = ks[0] % (1 << 64)  # keep oracle fast
    got = g1_from_device(G1.scalar_mul_bits(gd, bits_of(k, 64)))
    assert got == [ec_mul(g, k)]


def test_g1_scalar_mul_digits(g1pts):
    """The windowed digit ladder (scalar_mul_digits — the Lagrange-SRS
    group-iNTT twiddle path) against the oracle, including a lane at
    infinity and a digit-0-heavy scalar."""
    ks, _ = g1pts
    g = g1_generator()
    c = 4
    scalars = [ks[0] % R, 0x1003000500070000, 0]
    gd = g1_generator_device(len(scalars))
    # lane at infinity
    z = np.asarray(gd[2]).copy()
    z[..., 2] = 0
    gd = (gd[0], gd[1], jnp.asarray(z))
    nbits = max(s.bit_length() for s in scalars)
    w_count = -(-nbits // c)
    digits = np.zeros((w_count, len(scalars)), dtype=np.int32)
    for j, s in enumerate(scalars):
        for w in range(w_count):
            digits[w, j] = (s >> (c * (w_count - 1 - w))) & ((1 << c) - 1)
    got = g1_from_device(G1.scalar_mul_digits(gd, jnp.asarray(digits), c))
    want = [ec_mul(g, scalars[0]), ec_mul(g, scalars[1]), None]
    assert got == want


def test_g1_on_curve_and_eq(g1pts):
    _, pts = g1pts
    d = g1_to_device(pts)
    assert bool(np.asarray(G1.on_curve(d, B1_CONST[..., None]).all()))
    assert bool(np.asarray(G1.eq(d, d).all()))
    assert not bool(np.asarray(G1.eq(d, G1.dbl(d)).any()))


def test_g2_ops(rng):
    g = g2_generator()
    ks = [rng.randrange(1, R) for _ in range(3)]
    pts = [ec_mul(g, k) for k in ks]
    d = g2_to_device(pts)
    rolled = tuple(jnp.roll(c, -1, axis=-1) for c in d)
    got = g2_from_device(G2.add(d, rolled))
    assert got == [ec_add(pts[i], pts[(i + 1) % 3]) for i in range(3)]
    assert g2_from_device(G2.dbl(d)) == [ec_add(p, p) for p in pts]
    assert bool(np.asarray(G2.on_curve(d, B2_CONST[..., None]).all()))
    k = ks[0] % (1 << 48)
    gd = g2_generator_device(1)
    got2 = g2_from_device(G2.scalar_mul_bits(gd, bits_of(k, 48)))
    assert got2 == [ec_mul(g, k)]


def test_g2_exceptional(rng):
    g = g2_generator()
    p = ec_mul(g, rng.randrange(1, R))
    cases = [(p, p), (p, ec_neg(p)), (None, p), (p, None)]
    a = g2_to_device([c[0] for c in cases])
    b = g2_to_device([c[1] for c in cases])
    got = g2_from_device(G2.add(a, b))
    assert got == [ec_add(x, y) for x, y in cases]
