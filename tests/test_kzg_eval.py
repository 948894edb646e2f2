"""Evaluation-form protocol tests, mirroring the reference suite
(eval_form.rs:282-484): div_by_omega_i vs the monomial-division oracle,
commit/verify accept+reject pairs, tamper rejection, single-index openings,
open-at-all-points with the identity witness, and Lagrange-SRS consistency
between the trusted (group-iNTT) and secret-aware fast paths."""

import numpy as np
import jax.numpy as jnp
import pytest

from kzg_tpu.constants import R
from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_from_device
from kzg_tpu.kzg import setup
from kzg_tpu.kzg.eval_form import (
    KZGProverEvalForm,
    KZGVerifierEvalForm,
    KZGBatchWitnessEvalForm,
    compute_lagrange_basis,
    compute_lagrange_basis_from_secret,
    _div_by_omega_i_jit,
)
from kzg_tpu.ntt import Domain
from kzg_tpu.poly import Polynomial
from kzg_tpu.oracle import ec_mul, g1_generator

# slow tier: protocol + Lagrange-SRS graphs are compile-bound on 1 core;
# the fast tier (pytest -m 'not slow') must stay <10 min cold (VERDICT r2 #5)
pytestmark = pytest.mark.slow

EXP = 3
D = 1 << EXP
SECRET = 69696969


@pytest.fixture(scope="module")
def params():
    return setup(SECRET, D)


@pytest.fixture(scope="module")
def lagrange(params):
    return compute_lagrange_basis(params, EXP)


@pytest.fixture(scope="module")
def rngmod():
    import random

    return random.Random(69)


def rand_evals(rng, d=D):
    return jnp.asarray(FR.encode([rng.randrange(R) for _ in range(d)]))


def test_lagrange_basis_trusted_vs_secret(params):
    """Group-iNTT construction == direct-from-secret construction ==
    oracle g^{L_i(s)} (the reference's explicit per-L_i construction,
    eval_form.rs:254-280, is the semantic target of both)."""
    lag1 = compute_lagrange_basis(params, EXP)
    lag2 = compute_lagrange_basis_from_secret(SECRET, EXP)
    got1 = g1_from_device(lag1.lg)
    got2 = g1_from_device(lag2.lg)
    assert got1 == got2
    # oracle: L_i(s) = prod_{j != i} (s - w^j)/(w^i - w^j)
    dom = Domain(EXP)
    w = dom.omega
    g = g1_generator()
    for i in range(D):
        num, den = 1, 1
        for j in range(D):
            if j == i:
                continue
            num = num * (SECRET - pow(w, j, R)) % R
            den = den * (pow(w, i, R) - pow(w, j, R)) % R
        li = num * pow(den, -1, R) % R
        assert got1[i] == ec_mul(g, li)


def test_group_intt_split_tables_match_dense(params):
    """The big-domain split-twiddle branch of _group_intt (omega^{-t} from
    two O(sqrt n) tables + on-device digit extraction; used for exp >=
    _BIG_TABLE_EXP where no dense table may be baked into the graph) ==
    the dense digit-table branch, forced on a small domain."""
    import jax

    from kzg_tpu.kzg.eval_form import _group_intt
    from kzg_tpu.ntt import Domain

    dom = Domain(EXP)
    gsl = tuple(t[..., :D] for t in params.gs)
    g_intt = jax.jit(_group_intt, static_argnums=(0, 2, 3))
    dense = G1.to_affine(g_intt(G1, gsl, dom, False))
    split = G1.to_affine(g_intt(G1, gsl, dom, True))
    assert g1_from_device(dense) == g1_from_device(split)


def test_div_by_omega_i_matches_monomial_division(rngmod):
    dom = Domain(EXP)
    evals = rand_evals(rngmod)
    m = 5
    # numerator in eval form: f - f(w^m)
    ym = evals[..., m : m + 1]
    numer = FR.sub(evals, ym)
    q_evals = _div_by_omega_i_jit(EXP, numer, jnp.int32(m))
    # oracle: interpolate f, long-divide by (X - w^m), evaluate quotient
    coeffs = dom.intt(evals)
    f = Polynomial(coeffs, D - 1)
    q, rem = f.div_by_linear(pow(dom.omega, m, R))
    got = FR.decode(q_evals)
    # evaluate oracle quotient over the domain
    want_evals = dom.ntt(jnp.pad(q.trimmed(), ((0, 0), (0, D - q.num_coeffs()))))
    assert got == FR.decode(want_evals)


def test_commit_and_verify_poly(params, lagrange, rngmod):
    prover = KZGProverEvalForm(params, lagrange)
    verifier = KZGVerifierEvalForm(params, lagrange)
    evals = rand_evals(rngmod)
    c = prover.commit(evals)
    assert verifier.verify_poly(c, evals)
    other = rand_evals(rngmod)
    assert not verifier.verify_poly(c, other)


def test_commit_matches_coeff_form_commit(params, lagrange, rngmod):
    """Committing evaluations over the Lagrange SRS == committing the
    interpolated coefficients over the monomial SRS."""
    from kzg_tpu.kzg import KZGProver

    dom = Domain(EXP)
    evals = rand_evals(rngmod)
    prover_e = KZGProverEvalForm(params, lagrange)
    c_eval = prover_e.commit(evals)
    coeffs = dom.intt(evals)
    c_coeff = KZGProver(params).commit(Polynomial(coeffs, D - 1))
    assert bool(np.asarray(G1.eq(c_eval, c_coeff)))


def test_tampered_evaluation_rejected(params, lagrange, rngmod):
    prover = KZGProverEvalForm(params, lagrange)
    verifier = KZGVerifierEvalForm(params, lagrange)
    evals = rand_evals(rngmod)
    c = prover.commit(evals)
    tampered = evals.at[:, 3].set(FR.one(()))
    assert not verifier.verify_poly(c, tampered)


def test_single_open_verify_and_reject(params, lagrange, rngmod):
    prover = KZGProverEvalForm(params, lagrange)
    verifier = KZGVerifierEvalForm(params, lagrange)
    evals = rand_evals(rngmod)
    c = prover.commit(evals)
    i = 5
    y = FR.decode(evals[..., i : i + 1])[0]
    w = prover.create_witness(evals, i)
    assert verifier.verify_eval((i, y), c, w)
    assert not verifier.verify_eval((i, (y + 1) % R), c, w)
    assert not verifier.verify_eval(((i + 1) % D, y), c, w)


def test_open_all_points(params, lagrange, rngmod):
    prover = KZGProverEvalForm(params, lagrange)
    verifier = KZGVerifierEvalForm(params, lagrange)
    evals = rand_evals(rngmod)
    c = prover.commit(evals)
    w = prover.create_witness_all()
    assert bool(np.asarray(G1.is_inf(w)))  # identity (eval_form.rs:142-146)
    bw = KZGBatchWitnessEvalForm(r=evals, w=w)
    assert verifier.verify_eval_all(c, bw)
    other = rand_evals(rngmod)
    assert not verifier.verify_eval_all(c, KZGBatchWitnessEvalForm(r=other, w=w))
