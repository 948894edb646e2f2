"""Coefficient-form protocol tests, mirroring the reference's suite
(coeff_form.rs:185-399): accept/reject pairs for commit, single and batched
openings, tamper detection; setup cross-checked bit-exactly against the
pure-Python oracle ladder."""

import numpy as np
import jax.numpy as jnp
import pytest

from kzg_tpu.constants import R
from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_from_device
from kzg_tpu.kzg import (
    setup,
    KZGProver,
    KZGVerifier,
    PointNotOnPolynomial,
    BatchedPointsNotOnPolynomial,
)
from kzg_tpu.poly import Polynomial
from kzg_tpu.oracle import ec_mul, ec_add, g1_generator, g2_generator

# slow tier: protocol graphs (MSM + coset division) are compile-bound on 1 core;
# the fast tier (pytest -m 'not slow') must stay <10 min cold (VERDICT r2 #5)
pytestmark = pytest.mark.slow

N = 16
SECRET = 69696969  # fixed test secret, spirit of the reference's seeded rng


@pytest.fixture(scope="module")
def params():
    return setup(SECRET, N)


@pytest.fixture(scope="module")
def rngmod():
    import random

    return random.Random(69)


def rand_poly(rng, n):
    return Polynomial.from_ints([rng.randrange(R) for _ in range(n)])


def py_eval(cs, x):
    acc = 0
    for c in reversed(cs):
        acc = (acc * x + c) % R
    return acc


def test_setup_matches_oracle_ladder(params):
    g = g1_generator()
    want = [ec_mul(g, pow(SECRET, i, R)) for i in range(4)]
    got = g1_from_device(tuple(t[..., :4] for t in params.gs))
    assert got == want
    from kzg_tpu.curve import g2_from_device

    h = g2_generator()
    wanth = [ec_mul(h, pow(SECRET, i, R)) for i in range(3)]
    goth = g2_from_device(tuple(t[..., :3] for t in params.hs))
    assert goth == wanth


def test_commit_matches_oracle_msm(params, rngmod):
    cs = [rngmod.randrange(R) for _ in range(N)]
    c = KZGProver(params).commit(Polynomial.from_ints(cs))
    g = g1_generator()
    want = None
    for i, coeff in enumerate(cs):
        want = ec_add(want, ec_mul(g, coeff * pow(SECRET, i, R) % R))
    assert g1_from_device(tuple(t[..., None] for t in c))[0] == want


def test_verify_poly_accept_reject(params, rngmod):
    prover, verifier = KZGProver(params), KZGVerifier(params)
    p = rand_poly(rngmod, N)
    other = rand_poly(rngmod, N)
    c = prover.commit(p)
    assert verifier.verify_poly(c, p)
    assert not verifier.verify_poly(c, other)


def test_tampered_coefficient_rejected(params, rngmod):
    prover, verifier = KZGProver(params), KZGVerifier(params)
    cs = [rngmod.randrange(R) for _ in range(N)]
    c = prover.commit(Polynomial.from_ints(cs))
    cs[5] = (cs[5] + 1) % R
    assert not verifier.verify_poly(c, Polynomial.from_ints(cs))


def test_single_open_verify(params, rngmod):
    prover, verifier = KZGProver(params), KZGVerifier(params)
    cs = [rngmod.randrange(R) for _ in range(N)]
    p = Polynomial.from_ints(cs)
    c = prover.commit(p)
    x = rngmod.randrange(R)
    y = py_eval(cs, x)
    w = prover.create_witness(p, (x, y))
    assert verifier.verify_eval((x, y), c, w)
    assert not verifier.verify_eval((x, (y + 1) % R), c, w)
    # wrong y at witness creation raises
    with pytest.raises(PointNotOnPolynomial):
        prover.create_witness(p, (x, (y + 1) % R))


def test_degree_one_edge(params, rngmod):
    prover, verifier = KZGProver(params), KZGVerifier(params)
    cs = [rngmod.randrange(R) for _ in range(2)]
    p = Polynomial.from_ints(cs)
    c = prover.commit(p)
    x = rngmod.randrange(R)
    w = prover.create_witness(p, (x, py_eval(cs, x)))
    assert verifier.verify_eval((x, py_eval(cs, x)), c, w)


def test_streamed_witness_matches_direct(rngmod):
    """The chunk-streamed witness path (KZGProver._witness_streamed — the
    2^24 production path, normally active above 2^msm_chunk_log) produces
    the identical witness point to the one-shot division+MSM path, and the
    opening verifies. Forced on at tiny size via msm_chunk_log=4."""
    from kzg_tpu.config import configure, get_config

    n = 48  # deliberately NOT a multiple of the 2^4 chunk
    params48 = setup(SECRET, 64)
    prover, verifier = KZGProver(params48), KZGVerifier(params48)
    cs = [rngmod.randrange(R) for _ in range(n)]
    p = Polynomial.from_ints(cs)
    x = rngmod.randrange(R)
    y = py_eval(cs, x)
    w_direct = prover.create_witness(p, (x, y))
    old = get_config().msm_chunk_log
    try:
        configure(msm_chunk_log=4)
        w_stream = prover.create_witness(p, (x, y))
    finally:
        configure(msm_chunk_log=old)
    assert bool(np.asarray(G1.eq(w_stream, w_direct)))
    c = prover.commit(p)
    assert verifier.verify_eval((x, y), c, w_stream)


def test_batched_open_verify(params, rngmod):
    prover, verifier = KZGProver(params), KZGVerifier(params)
    cs = [rngmod.randrange(R) for _ in range(N)]
    p = Polynomial.from_ints(cs)
    c = prover.commit(p)
    xs = [rngmod.randrange(R) for _ in range(5)]
    ys = [py_eval(cs, x) for x in xs]
    bw = prover.create_witness_batched(p, xs, ys)
    assert verifier.verify_eval_batched(c, bw, xs)
    # different points -> reject
    xs2 = [rngmod.randrange(R) for _ in range(5)]
    assert not verifier.verify_eval_batched(c, bw, xs2)
    # wrong ys at creation raise
    ys_bad = list(ys)
    ys_bad[2] = (ys_bad[2] + 1) % R
    with pytest.raises(BatchedPointsNotOnPolynomial):
        prover.create_witness_batched(p, xs, ys_bad)


def test_batched_at_num_coeffs_points(params, rngmod):
    # reference coeff_form.rs:377-398 (test_eval_batched_all_points): open a
    # polynomial at ALL its num_coeffs points. The reference sizes the setup
    # one larger than the polynomial (test_setup::<15> with a 14-coeff
    # polynomial) because the vanishing poly of k points has k+1 coeffs and
    # must fit the G2 SRS — so the polynomial here has N-1 coeffs.
    prover, verifier = KZGProver(params), KZGVerifier(params)
    cs = [rngmod.randrange(R) for _ in range(N - 1)]
    p = Polynomial.from_ints(cs)
    c = prover.commit(p)
    xs = [rngmod.randrange(R) for _ in range(N - 1)]
    ys = [py_eval(cs, x) for x in xs]
    bw = prover.create_witness_batched(p, xs, ys)
    assert verifier.verify_eval_batched(c, bw, xs)
