"""Differential tests: native C++ engine vs the pure-Python oracle.

Mirrors the reference's differential-oracle pattern (SURVEY.md §4): the fast
path (here native/kzg_native.cc, playing blst's role) is pinned against the
slow obviously-correct implementation on fixed-seed inputs.
"""

import pytest

from kzg_tpu import native
from kzg_tpu.constants import R, P
from kzg_tpu.oracle import curve as oc
from kzg_tpu.oracle.field import Fp
from kzg_tpu.compat import serialize as ser

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def g():
    return oc.g1_generator()


@pytest.fixture(scope="module")
def h():
    return oc.g2_generator()


def test_g1_scalar_mul_matches_oracle(rng, g):
    for _ in range(5):
        k = rng.randrange(R)
        assert native.g1_mul(g, k) == oc.ec_mul(g, k)
    assert native.g1_mul(g, 0) is None
    assert native.g1_mul(g, 1) == g


def test_g2_scalar_mul_matches_oracle(rng, h):
    for _ in range(3):
        k = rng.randrange(R)
        assert native.g2_mul(h, k) == oc.ec_mul(h, k)


def test_g1_add_edge_cases(g):
    p = native.g1_mul(g, 7)
    assert native.g1_add(p, None) == p
    assert native.g1_add(None, p) == p
    assert native.g1_add(p, oc.ec_neg(p)) is None
    assert native.g1_add(p, p) == oc.ec_add(p, p)  # doubling branch


def test_g1_msm_matches_oracle(rng, g):
    n = 16
    pts = [oc.ec_mul(g, rng.randrange(1, 1 << 30)) for _ in range(n)]
    pts[3] = None  # infinity input handled
    ks = [rng.randrange(R) for _ in range(n)]
    ks[5] = 0  # zero scalar handled
    expect = None
    for p, k in zip(pts, ks):
        expect = oc.ec_add(expect, oc.ec_mul(p, k) if p is not None else None)
    assert native.g1_msm(pts, ks) == expect


def test_g2_msm_matches_oracle(rng, h):
    n = 6
    pts = [oc.ec_mul(h, rng.randrange(1, 1 << 20)) for _ in range(n)]
    ks = [rng.randrange(R) for _ in range(n)]
    expect = None
    for p, k in zip(pts, ks):
        expect = oc.ec_add(expect, oc.ec_mul(p, k))
    assert native.g2_msm(pts, ks) == expect


def test_g1_powers_ladder(g):
    s = 987654321
    pows = native.g1_powers(g, s, 6)
    cur = g
    for i, p in enumerate(pows):
        assert p == cur, f"power {i}"
        cur = oc.ec_mul(cur, s)


def test_serialization_byte_parity(rng, g, h):
    """Native compressed bytes == compat (ZCash/blstrs) bytes, both ways."""
    for _ in range(4):
        p = oc.ec_mul(g, rng.randrange(1, R))
        b = native.g1_compress(p)
        assert b == ser.g1_compress(p)
        assert native.g1_decompress(b) == p
        assert ser.g1_decompress(b, subgroup_check=False) == p
    q = oc.ec_mul(h, rng.randrange(1, R))
    bq = native.g2_compress(q)
    assert bq == ser.g2_compress(q)
    assert native.g2_decompress(bq) == q
    # infinity encodings
    assert native.g1_compress(None) == ser.g1_compress(None)
    assert native.g1_decompress(native.g1_compress(None)) is None
    assert native.g2_decompress(native.g2_compress(None)) is None


def test_decompress_rejects_bad_encodings(g):
    b = bytearray(native.g1_compress(oc.ec_mul(g, 5)))
    b[0] &= 0x7F  # clear compression flag
    with pytest.raises(native.NativeError):
        native.g1_decompress(bytes(b))
    # x >= p
    bad = bytearray(48)
    bad[0] = 0x80 | 0x1F
    for i in range(1, 48):
        bad[i] = 0xFF
    with pytest.raises(native.NativeError):
        native.g1_decompress(bytes(bad))


def test_subgroup_check_rejects_non_torsion():
    # find a point on E(Fp) outside the r-torsion (cofactor > 1)
    x = 1
    while True:
        rhs = Fp(x) .square() * Fp(x) + Fp(4)
        y = rhs.sqrt()
        if y is not None:
            cand = (Fp(x), y)
            if not native.g1_in_subgroup(cand):
                break
        x += 1
    assert native.g1_on_curve(cand)
    b = native.g1_compress(cand)
    with pytest.raises(native.NativeError):
        native.g1_decompress(b, subgroup_check=True)
    assert native.g1_decompress(b, subgroup_check=False) == cand


def test_pairing_check_bilinearity(g, h):
    # e(6G, H) * e(-2G, 3H) == 1
    assert native.pairing_check(
        [(oc.ec_mul(g, 6), h), (oc.ec_neg(oc.ec_mul(g, 2)), oc.ec_mul(h, 3))]
    )
    assert not native.pairing_check(
        [(oc.ec_mul(g, 5), h), (oc.ec_neg(oc.ec_mul(g, 2)), oc.ec_mul(h, 3))]
    )
    # infinity inputs contribute the identity
    assert native.pairing_check([(None, h), (g, None)])


@pytest.mark.slow
def test_pairing_value_matches_oracle(g, h):
    """Full Gt element equality native vs oracle (slow: oracle final exp)."""
    p = oc.ec_mul(g, 3)
    q = oc.ec_mul(h, 5)
    assert native.pairing(p, q) == oc.pairing(p, q)
