"""Mesh-parallel consistency tests on the virtual 8-device CPU mesh — the
mesh-level analog of the reference's parallel/serial FFT consistency test
(ft.rs:481-509): every sharded transform is pinned to its single-device
counterpart, and the sharded MSM to the local MSM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from kzg_tpu.constants import R
from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, g1_generator_device
from kzg_tpu.ntt import Domain
from kzg_tpu.msm import msm_g1
from kzg_tpu.parallel import (
    ShardedDomain,
    make_sharded_msm,
    make_commit_witness_step,
)

# slow tier: shard_map pipelines are the most compile-heavy graphs in the repo;
# the fast tier (pytest -m 'not slow') must stay <10 min cold (VERDICT r2 #5)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    return Mesh(np.array(devs[:8]), ("shard",))


def rand_fr(rng, n):
    return jnp.asarray(FR.encode([rng.randrange(R) for _ in range(n)]))


EXP = 7  # 128-point domain: >= 8^2, small enough to compile fast


def test_sharded_ntt_matches_local(mesh, rng):
    sd = ShardedDomain(mesh, "shard", EXP)
    dom = Domain(EXP)
    x = rand_fr(rng, sd.d)
    want = np.asarray(dom.ntt(x))
    got = np.asarray(sd.ntt(sd.shard(x)))
    assert (got == want).all()
    # inverse round-trip
    back = np.asarray(sd.intt(sd.shard(jnp.asarray(want))))
    assert (back == np.asarray(x)).all()


def test_sharded_coset_matches_local(mesh, rng):
    sd = ShardedDomain(mesh, "shard", EXP)
    dom = Domain(EXP)
    x = rand_fr(rng, sd.d)
    want = np.asarray(dom.coset_ntt(x))
    got = np.asarray(sd.coset_ntt(sd.shard(x)))
    assert (got == want).all()
    back = np.asarray(sd.coset_intt(sd.shard(jnp.asarray(want))))
    assert (back == np.asarray(x)).all()


def test_transposed_round_trip_and_permutation(mesh, rng):
    """ntt_t must be a fixed permutation of ntt, and intt_t its exact
    inverse (the DIT mirror)."""
    sd = ShardedDomain(mesh, "shard", EXP)
    x = rand_fr(rng, sd.d)
    xs = sd.shard(x)
    std = np.asarray(sd.ntt(xs))
    tr = np.asarray(sd.ntt_t(xs))
    # transposed order: tr[k1*C + k2] = std[k1 + R*k2]
    r_dev = 8
    c = sd.d // r_dev
    perm = np.asarray(
        [(k % r_dev) * c + (k // r_dev) for k in range(sd.d)]
    )  # position of std[k] inside tr
    assert (tr[:, perm] == std).all()
    back = np.asarray(sd.intt_t(sd.shard(jnp.asarray(tr))))
    assert (back == np.asarray(x)).all()


def test_sharded_msm_matches_local(mesh, rng):
    n = 64
    # points: multiples of the generator (cheap to build via the MSM itself
    # would be circular; use scalar ladder on device)
    ks = [rng.randrange(1, R) for _ in range(n)]
    gen = g1_generator_device(n)
    bits = np.zeros((64, n), dtype=np.uint32)
    for j, k in enumerate(ks):
        small = k % (1 << 64)
        for b in range(64):
            bits[b, j] = (small >> b) & 1
    pts_jac = G1.scalar_mul_bits(gen, jnp.asarray(bits))
    pts = G1.to_affine(pts_jac)
    scalars = rand_fr(rng, n)
    want = G1.to_affine(tuple(t[..., None] for t in msm_g1(pts, scalars)))
    smsm = make_sharded_msm(mesh, "shard", G1)
    got_jac = smsm(
        tuple(jax.device_put(t, s) for t, s in zip(pts, smsm.sharding_points)),
        jax.device_put(scalars, smsm.sharding_scalars),
    )
    got = G1.to_affine(tuple(t[..., None] for t in got_jac))
    assert (np.asarray(got[0]) == np.asarray(want[0])).all()
    assert (np.asarray(got[1]) == np.asarray(want[1])).all()
    assert (np.asarray(got[2]) == np.asarray(want[2])).all()


@pytest.mark.slow
def test_commit_witness_step(mesh, rng):
    """Full sharded step vs the single-device protocol layer."""
    from kzg_tpu.kzg import setup, KZGProver, KZGVerifier
    from kzg_tpu.poly import Polynomial

    n = 1 << EXP
    params = setup(12345, n)
    coeff_ints = [rng.randrange(R) for _ in range(n)]
    poly = Polynomial.from_ints(coeff_ints)
    x = rng.randrange(R)

    step = make_commit_witness_step(mesh, "shard", EXP)
    gx = jax.device_put(params.gs[0], step.point_sharding)
    gy = jax.device_put(params.gs[1], step.point_sharding)
    gi = jax.device_put(params.gs[2], step.inf_sharding)
    coeffs = jax.device_put(poly.coeffs, step.point_sharding)
    x_mont = jnp.asarray(FR.encode([x]))

    commit, y_mont, wit = step(gx, gy, gi, coeffs, x_mont)

    y = FR.decode(y_mont)[0]
    assert y == poly.eval(x)

    prover = KZGProver(params)
    want_c = prover.commit(poly)
    assert bool(np.asarray(G1.eq(commit, want_c)))
    want_w = prover.create_witness(poly, (x, y))
    assert bool(np.asarray(G1.eq(wit, want_w)))

    verifier = KZGVerifier(params)
    assert verifier.verify_eval((x, y), commit, wit)


@pytest.mark.slow
def test_batched_witness_step(mesh, rng):
    """Sharded batched opening vs the single-device protocol layer."""
    from kzg_tpu.kzg import setup, KZGProver, KZGVerifier
    from kzg_tpu.kzg.coeff_form import KZGBatchWitness
    from kzg_tpu.parallel import make_batched_witness_step
    from kzg_tpu.poly import Polynomial

    n = 1 << EXP
    k = 4
    params = setup(54321, n)
    coeff_ints = [rng.randrange(R) for _ in range(n)]
    poly = Polynomial.from_ints(coeff_ints)
    xs = [rng.randrange(R) for _ in range(k)]

    step = make_batched_witness_step(mesh, "shard", EXP, k)
    gx = jax.device_put(params.gs[0], step.point_sharding)
    gy = jax.device_put(params.gs[1], step.point_sharding)
    gi = jax.device_put(params.gs[2], step.inf_sharding)
    coeffs = jax.device_put(poly.coeffs, step.point_sharding)
    xs_mont = jnp.asarray(FR.encode(xs))

    commit, ys_mont, r_coeffs, wit = step(gx, gy, gi, coeffs, xs_mont)

    ys = FR.decode(ys_mont)
    assert ys == [poly.eval(x) for x in xs]

    prover = KZGProver(params)
    want = prover.create_witness_batched(poly, xs, ys)
    assert bool(np.asarray(G1.eq(wit, want.w)))
    assert FR.decode(r_coeffs) == want.r.to_ints()

    verifier = KZGVerifier(params)
    bw = KZGBatchWitness(r=want.r, w=wit)
    assert verifier.verify_eval_batched(commit, bw, xs)


@pytest.mark.slow
def test_eval_form_step(mesh, rng):
    """Sharded eval-form commit + witness vs the local eval-form prover."""
    from kzg_tpu.kzg import setup, compute_lagrange_basis_from_secret
    from kzg_tpu.kzg.eval_form import KZGProverEvalForm, KZGVerifierEvalForm
    from kzg_tpu.parallel import make_eval_form_step

    d = 1 << EXP
    secret = 98765
    params = setup(secret, d)
    lag = compute_lagrange_basis_from_secret(secret, EXP)
    prover = KZGProverEvalForm(params, lag)
    evals_ints = [rng.randrange(R) for _ in range(d)]
    evals = jnp.asarray(FR.encode(evals_ints))
    m = 5

    step = make_eval_form_step(mesh, "shard", EXP, m)
    lx = jax.device_put(lag.lg[0], step.point_sharding)
    ly = jax.device_put(lag.lg[1], step.point_sharding)
    li = jax.device_put(lag.lg[2], step.inf_sharding)
    ev = jax.device_put(evals, step.point_sharding)

    commit, y_mont, wit = step(lx, ly, li, ev)

    assert FR.decode(y_mont)[0] == evals_ints[m]
    want_c = prover.commit(evals)
    assert bool(np.asarray(G1.eq(commit, want_c)))
    want_w = prover.create_witness(evals, m)
    assert bool(np.asarray(G1.eq(wit, want_w)))

    verifier = KZGVerifierEvalForm(params, lag)
    assert verifier.verify_eval((m, evals_ints[m]), commit, wit)
