"""EvaluationDomain container parity tests (reference ft.rs:17-288 +
SerializableEvaluationDomain ft.rs:389-434) and the small Polynomial
accessors (polynomial.rs:56-133, 229-264)."""

import numpy as np
import jax.numpy as jnp

from kzg_tpu.constants import R
from kzg_tpu.fields import FR
from kzg_tpu.ntt import Domain, EvaluationDomain, compute_omega
from kzg_tpu.poly import (
    Polynomial,
    SubProductTree,
    lagrange_interpolation,
    lagrange_interpolation_with_tree,
)

rng = np.random.default_rng(1234)


def rand_ints(n):
    return [int(x) % R for x in rng.integers(1, 1 << 62, size=n)]


def test_from_coeffs_pads_to_power_of_two():
    ed = EvaluationDomain.from_ints(rand_ints(5))
    assert ed.d == 8 and ed.exp == 3 and len(ed) == 8
    omega, d, exp = compute_omega(5)
    assert (ed.omega, ed.d, ed.exp) == (omega, d, exp)


def test_fft_ifft_roundtrip_and_interpolate():
    xs = rand_ints(8)
    ed = EvaluationDomain.from_ints(xs)
    back = ed.fft().ifft()
    assert ed == back
    # evaluations match direct polynomial evaluation at omega^i
    p = Polynomial.from_ints(xs)
    evals = ed.fft().to_ints()
    for i in [0, 3, 7]:
        assert evals[i] == p.eval(pow(ed.omega, i, R))
    # interpolate() returns the coefficient polynomial
    assert ed.fft().interpolate() == p


def test_coset_fft_is_distribute_powers_then_fft():
    from kzg_tpu.constants import FR_GENERATOR

    ed = EvaluationDomain.from_ints(rand_ints(8))
    a = ed.coset_fft()
    b = ed.distribute_powers(FR_GENERATOR).fft()
    assert a == b
    assert a.icoset_fft() == ed


def test_pointwise_ops_and_z():
    xs, ys = rand_ints(8), rand_ints(8)
    a = EvaluationDomain.from_ints(xs)
    b = EvaluationDomain.from_ints(ys)
    assert a.mul_assign(b).to_ints() == [x * y % R for x, y in zip(xs, ys)]
    assert a.sub_assign(b).to_ints() == [(x - y) % R for x, y in zip(xs, ys)]
    assert a.add_assign(b).to_ints() == [(x + y) % R for x, y in zip(xs, ys)]
    tau = 987654321
    assert a.z(tau) == (pow(tau, 8, R) - 1) % R


def test_divide_by_z_on_coset_inverts_mul():
    from kzg_tpu.constants import FR_GENERATOR

    ed = EvaluationDomain.from_ints(rand_ints(8))
    z_const = (pow(FR_GENERATOR, 8, R) - 1) % R
    scaled = [v * z_const % R for v in ed.to_ints()]
    back = EvaluationDomain.from_ints(scaled).divide_by_z_on_coset()
    assert back == ed


def test_clone_and_save_load(tmp_path):
    ed = EvaluationDomain.from_ints(rand_ints(8))
    other = ed.clone_with_different_coeffs(jnp.asarray(FR.encode(rand_ints(8))))
    assert other.d == ed.d and other != ed
    path = str(tmp_path / "ed.npz")
    ed.save(path)
    loaded = EvaluationDomain.load(path)
    assert loaded == ed and loaded.omega == ed.omega


def test_polynomial_accessors():
    ints = rand_ints(6)
    p = Polynomial.from_ints(ints)
    assert p.lead() == ints[5]
    assert p.constant() == ints[0]
    assert Polynomial.from_scalar(42).to_ints() == [42]
    t = p.truncate(3)
    assert t.degree == 3 and t.to_ints() == ints[:4]
    rev = p.reverse()
    assert rev.to_ints()[::-1] == ints
    # shrink_degree scans at/below the tracked degree
    q = Polynomial.from_ints(ints[:3] + [0, 0], degree=4)
    assert q.shrink_degree().degree == 2
    # multi_eval parity name
    pts = jnp.asarray(FR.encode([2, 3]))
    assert FR.decode(p.multi_eval(pts)) == [p.eval(2), p.eval(3)]


def test_lagrange_interpolation_with_tree_matches_direct():
    xs, ys = rand_ints(8), rand_ints(8)
    xa = jnp.asarray(FR.encode(xs))
    ya = jnp.asarray(FR.encode(ys))
    tree = SubProductTree.from_points(xa)
    p1 = lagrange_interpolation_with_tree(xa, ya, tree)
    p2 = lagrange_interpolation(xa, ya)
    assert p1 == p2
    for x, y in zip(xs[:3], ys[:3]):
        assert p1.eval(x) == y


def test_eq_non_domain_returns_false_and_unhashable():
    ed = EvaluationDomain.from_ints(rand_ints(4))
    assert (ed == None) is False  # noqa: E711 — NotImplemented fallback
    assert (ed != 17) is True
    import pytest

    with pytest.raises(TypeError):
        hash(ed)  # __eq__ without identity semantics: explicitly unhashable


def test_from_polynomial_uses_tracked_degree():
    # backing storage larger than the tracked degree must not widen the
    # domain (the reference feeds truncated coeffs, eval_form.rs:271-315)
    ints = rand_ints(5)
    p = Polynomial.from_ints(ints + [0, 0, 0, 0, 0], degree=4)
    ed = EvaluationDomain.from_polynomial(p)
    assert ed.d == 8
    assert ed == EvaluationDomain.from_ints(ints)


def test_distribute_powers_split_table_matches_direct():
    import kzg_tpu.ntt.evaluation_domain as edm

    ints = rand_ints(16)
    g = rand_ints(1)[0]
    ed = EvaluationDomain.from_ints(ints)
    want = [(x * pow(g, i, R)) % R for i, x in enumerate(ints)]
    old = edm._SPLIT_POWERS_EXP
    try:
        edm._SPLIT_POWERS_EXP = 3  # force the hi/lo split path at d=16
        edm._POWER_TABLE_CACHE.clear()
        assert ed.distribute_powers(g).to_ints() == want
        assert (g % R, 16) in edm._POWER_TABLE_CACHE  # cached for reuse
        assert ed.distribute_powers(g).to_ints() == want  # cache hit path
    finally:
        edm._SPLIT_POWERS_EXP = old
        edm._POWER_TABLE_CACHE.clear()
    assert ed.distribute_powers(g).to_ints() == want  # direct path


def test_truncate_overlength_noop():
    ints = rand_ints(4)
    p = Polynomial.from_ints(ints)
    t = p.truncate(17)  # over-length: Vec::truncate no-ops on the storage
    assert t.degree == 3 and t.to_ints() == ints


def test_with_tree_single_point_quirk():
    # k == 1 returns X + (y0 - x0), matching lagrange_interpolation and the
    # reference (polynomial.rs:244-247, 269-272)
    (x0,), (y0,) = rand_ints(1), rand_ints(1)
    xa = jnp.asarray(FR.encode([x0]))
    ya = jnp.asarray(FR.encode([y0]))
    tree = SubProductTree.from_points(xa)
    p1 = lagrange_interpolation_with_tree(xa, ya, tree)
    assert p1 == lagrange_interpolation(xa, ya)
    assert p1.degree == 1 and p1.to_ints() == [(y0 - x0) % R, 1]
