"""Sanity tests for the pure-Python oracle itself: curve constants, group
law, pairing bilinearity/non-degeneracy. If these hold, the oracle is a
trustworthy differential reference for the TPU kernels."""

import pytest

from kzg_tpu.constants import R, P, FR_ROOT_OF_UNITY, FR_TWO_ADICITY
from kzg_tpu.oracle import (
    ec_add,
    ec_mul,
    ec_neg,
    g1_generator,
    g2_generator,
    on_curve_g1,
    on_curve_g2,
    pairing,
    multi_pairing_check,
)
from kzg_tpu.oracle.field import Fp12


def test_generators_on_curve_and_order():
    g1, g2 = g1_generator(), g2_generator()
    assert on_curve_g1(g1)
    assert on_curve_g2(g2)
    assert ec_mul(g1, R) is None
    assert ec_mul(g2, R) is None


def test_group_law(rng):
    g1 = g1_generator()
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    pa, pb = ec_mul(g1, a), ec_mul(g1, b)
    assert ec_add(pa, pb) == ec_mul(g1, (a + b) % R)
    assert ec_add(pa, ec_neg(pa)) is None
    assert ec_add(pa, None) == pa
    assert on_curve_g1(ec_add(pa, pb))


def test_root_of_unity():
    w = FR_ROOT_OF_UNITY
    assert pow(w, 1 << FR_TWO_ADICITY, R) == 1
    assert pow(w, 1 << (FR_TWO_ADICITY - 1), R) == R - 1  # primitive


@pytest.mark.slow
def test_pairing_bilinear(rng):
    g1, g2 = g1_generator(), g2_generator()
    e = pairing(g1, g2)
    assert e != Fp12.one()
    assert e.pow(R) == Fp12.one()
    a, b = rng.randrange(1, 1000), rng.randrange(1, 1000)
    assert pairing(ec_mul(g1, a), ec_mul(g2, b)) == e.pow(a * b)


@pytest.mark.slow
def test_multi_pairing_check(rng):
    g1, g2 = g1_generator(), g2_generator()
    k = rng.randrange(2, 50)
    # e(G1, k*G2) * e(k*G1, -G2) == 1
    assert multi_pairing_check([(g1, ec_mul(g2, k)), (ec_mul(g1, k), ec_neg(g2))])
    assert not multi_pairing_check([(g1, ec_mul(g2, k)), (ec_mul(g1, k + 1), ec_neg(g2))])
