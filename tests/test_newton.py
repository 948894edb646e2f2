"""Differential tests for the Newton-inverse division and remainder-tree
multipoint evaluation (poly/newton.py) against the scan schoolbook division
and direct evaluation — the every-fast-path-has-a-naive-oracle pattern of
the reference (ft.rs:481-509, polynomial.rs:639-664)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from kzg_tpu.constants import R
from kzg_tpu.fields import FR
from kzg_tpu.poly import Polynomial
from kzg_tpu.poly.polynomial import _long_division, _eval_many
from kzg_tpu.poly.newton import inv_series, newton_divmod_jit, eval_points_tree_jit
from kzg_tpu.poly.subproduct import SubProductTree, multi_eval_tree

# slow tier: Newton-inverse division compiles NTT graphs at many shapes (>10 min on 1 core);
# the fast tier (pytest -m 'not slow') must stay <10 min cold (VERDICT r2 #5)
pytestmark = pytest.mark.slow

rng = random.Random(1234)


def _rand(n):
    return jnp.asarray(FR.encode([rng.randrange(1, R) for _ in range(n)]))


def test_inv_series():
    m = 17
    d = _rand(9)
    g = inv_series(d, m)
    prod = Polynomial(d).best_mul(Polynomial(g)).coeffs[..., :m]
    got = FR.decode(prod)
    assert got[0] == 1
    assert all(v == 0 for v in got[1:m])


def test_newton_divmod_matches_scan():
    nf, nd = 64, 16
    f = _rand(nf)
    d = _rand(nd)
    q, r = newton_divmod_jit(f, d, nf, nd)
    q0, r0, _ = _long_division(f, d, nf, nd)
    assert FR.decode(q) == FR.decode(q0)
    assert FR.decode(r) == FR.decode(r0)


def test_newton_divmod_leading_zero_dividend():
    # dividend whose top stated coefficients are zero — the reversal
    # identity must still hold
    nf, nd = 48, 8
    f = np.asarray(_rand(nf)).copy()
    f[:, -3:] = 0
    f = jnp.asarray(f)
    d = _rand(nd)
    q, r = newton_divmod_jit(f, d, nf, nd)
    q0, r0, _ = _long_division(f, d, nf, nd)
    assert FR.decode(q) == FR.decode(q0)
    assert FR.decode(r) == FR.decode(r0)


def test_long_division_dispatch_exact():
    # exact product through the Newton path (steps > threshold): remainder None
    a = Polynomial(_rand(40))
    b = Polynomial(_rand(20))
    prod = a.best_mul(b)
    q, rem = prod.long_division(b)
    assert rem is None
    assert q == a


def test_eval_points_tree_matches_direct():
    k = 8
    n = 50
    xs = _rand(k)
    poly = Polynomial(_rand(n))
    tree = SubProductTree.from_points(xs)
    got = FR.decode(eval_points_tree_jit(poly.trimmed(), tree.levels, n))
    want = FR.decode(_eval_many(poly.trimmed(), xs))
    assert got == want


def test_eval_points_tree_low_degree_poly():
    # polynomial shorter than the point count (nf < k+1 fast path)
    k = 8
    xs = _rand(k)
    poly = Polynomial(_rand(3))
    tree = SubProductTree.from_points(xs)
    got = FR.decode(eval_points_tree_jit(poly.trimmed(), tree.levels, 3))
    want = FR.decode(_eval_many(poly.trimmed(), xs))
    assert got == want


def test_multi_eval_tree_non_power_of_two():
    k = 5
    xs = _rand(k)
    poly = Polynomial(_rand(33))
    got = FR.decode(multi_eval_tree(poly, xs))
    want = FR.decode(_eval_many(poly.trimmed(), xs))
    assert got == want
