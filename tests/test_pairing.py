"""On-device pairing differential tests against the pure-Python oracle
(reference surface: blstrs pairing(), coeff_form.rs:132-141)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kzg_tpu.constants import R
from kzg_tpu.fields import FP
from kzg_tpu.curve import FPA, FP2A
from kzg_tpu.oracle import (
    ec_mul,
    ec_neg,
    g1_generator,
    g2_generator,
    pairing as oracle_pairing,
)
from kzg_tpu.pairing import (
    f12_mul,
    f12_inv,
    f12_frobenius,
    f12_pow_static,
    f12_from_oracle,
    f12_to_oracle,
    f12_eq,
    pairing_device,
    pairing_check_device,
)

# slow tier: on-device tower/Miller-loop graphs are compile-bound on 1 core;
# the fast tier (pytest -m 'not slow') must stay <10 min cold (VERDICT r2 #5)
pytestmark = pytest.mark.slow


def _g1_dev(p):
    return (FPA.encode([p[0].n]), FPA.encode([p[1].n]))


def _g2_dev(q):
    return (
        FP2A.encode([(q[0].a.n, q[0].b.n)]),
        FP2A.encode([(q[1].a.n, q[1].b.n)]),
    )


def test_f12_ops_match_oracle(rng):
    from kzg_tpu.oracle.field import Fp, Fp2, Fp6, Fp12

    def rand_f12():
        def r2():
            return Fp2(Fp(rng.randrange(1, 2**380)), Fp(rng.randrange(1, 2**380)))
        return Fp12(Fp6(r2(), r2(), r2()), Fp6(r2(), r2(), r2()))

    a, b = rand_f12(), rand_f12()
    ad, bd = f12_from_oracle(a), f12_from_oracle(b)
    assert f12_to_oracle(f12_mul(ad, bd)) == a * b
    assert f12_to_oracle(f12_inv(ad)) == a.inv()
    assert f12_to_oracle(f12_frobenius(ad)) == a.frobenius()
    assert f12_to_oracle(f12_pow_static(ad, 12345)) == a.pow(12345)


@pytest.mark.slow
def test_pairing_matches_oracle(rng):
    g = g1_generator()
    h = g2_generator()
    a = rng.randrange(2, 1 << 40)
    b = rng.randrange(2, 1 << 40)
    p = ec_mul(g, a)
    q = ec_mul(h, b)
    want = oracle_pairing(p, q)
    got = pairing_device(_g1_dev(p), _g2_dev(q))
    assert f12_to_oracle(got[..., 0]) == want


@pytest.mark.slow
def test_pairing_check_bilinear(rng):
    """e(aG, bH) * e(-abG, H) == 1 via the batched device check."""
    g = g1_generator()
    h = g2_generator()
    a = rng.randrange(2, R)
    b = rng.randrange(2, R)
    p1 = ec_mul(g, a)
    q1 = ec_mul(h, b)
    p2 = ec_neg(ec_mul(g, a * b % R))
    xs = FPA.encode([p1[0].n, p2[0].n])
    ys = FPA.encode([p1[1].n, p2[1].n])
    inf1 = jnp.zeros(2, bool)
    xq = FP2A.encode([(q1[0].a.n, q1[0].b.n), (h[0].a.n, h[0].b.n)])
    yq = FP2A.encode([(q1[1].a.n, q1[1].b.n), (h[1].a.n, h[1].b.n)])
    assert pairing_check_device((xs, ys, inf1), (xq, yq, inf1))
    # tampered: flip one scalar
    p2_bad = ec_neg(ec_mul(g, (a * b + 1) % R))
    xs2 = FPA.encode([p1[0].n, p2_bad[0].n])
    ys2 = FPA.encode([p1[1].n, p2_bad[1].n])
    assert not pairing_check_device((xs2, ys2, inf1), (xq, yq, inf1))
