"""Polynomial layer differential tests, mirroring the reference's strategy
(SURVEY.md §4): every fast path pinned to a naive oracle — NTT mul vs naive
mul vs Python-int convolution, scan division vs hand-checkable cases,
interpolation round-trips."""

import jax.numpy as jnp
import pytest

from kzg_tpu.constants import R
from kzg_tpu.fields import FR
from kzg_tpu.poly import (
    Polynomial,
    op_tree,
    SubProductTree,
    vanishing_poly,
    poly_derivative,
    lagrange_interpolation,
)

# slow tier: polynomial-algebra graphs (NTT mul, scan division) compile for ~6 min on a 1-core host;
# the fast tier (pytest -m 'not slow') must stay <10 min cold (VERDICT r2 #5)
pytestmark = pytest.mark.slow


def py_poly_mul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % R
    return out


def py_eval(cs, x):
    acc = 0
    for c in reversed(cs):
        acc = (acc * x + c) % R
    return acc


def test_add_sub(rng):
    a = [rng.randrange(R) for _ in range(7)]
    b = [rng.randrange(R) for _ in range(12)]
    pa, pb = Polynomial.from_ints(a), Polynomial.from_ints(b)
    want = [(x + y) % R for x, y in zip(a + [0] * 5, b)]
    assert (pa + pb).to_ints() == want
    diff = (pa - pb).to_ints()
    assert diff == [(x - y) % R for x, y in zip(a + [0] * 5, b)]


@pytest.mark.parametrize("na,nb", [(1, 1), (1, 5), (5, 1), (5, 10), (10, 50), (50, 50)])
def test_mul_matches_python(na, nb, rng):
    a = [rng.randrange(R) for _ in range(na)]
    b = [rng.randrange(R) for _ in range(nb)]
    pa, pb = Polynomial.from_ints(a), Polynomial.from_ints(b)
    want = py_poly_mul(a, b)
    assert (pa * pb).to_ints() == want
    assert pa.naive_mul(pb).to_ints() == want


def test_eval(rng):
    cs = [rng.randrange(R) for _ in range(33)]
    p = Polynomial.from_ints(cs)
    for x in [0, 1, rng.randrange(R)]:
        assert p.eval(x) == py_eval(cs, x)


def test_eval_many(rng):
    cs = [rng.randrange(R) for _ in range(700)]  # force chunked path
    p = Polynomial.from_ints(cs)
    pts = [rng.randrange(R) for _ in range(5)]
    got = FR.decode(p.eval_many(jnp.asarray(FR.encode(pts))))
    assert got == [py_eval(cs, x) for x in pts]


def test_long_division_textbook():
    # (X^2 - 1) / (X - 1) = (X + 1), no remainder
    f = Polynomial.from_ints([R - 1, 0, 1])
    d = Polynomial.from_ints([R - 1, 1])
    q, rem = f.long_division(d)
    assert rem is None
    assert q.to_ints() == [1, 1]
    # (X^2) / (X - 1) = (X + 1) remainder 1
    f2 = Polynomial.from_ints([0, 0, 1])
    q2, rem2 = f2.long_division(d)
    assert q2.to_ints() == [1, 1]
    assert rem2.to_ints() == [1]


def test_long_division_random(rng):
    # f = q*d + r round-trip
    q = [rng.randrange(R) for _ in range(9)]
    d = [rng.randrange(R) for _ in range(4)]
    r = [rng.randrange(R) for _ in range(3)]
    f = [(a + b) % R for a, b in zip(py_poly_mul(q, d) + [0], r + [0] * 9)]
    fq, frem = Polynomial.from_ints(f).long_division(Polynomial.from_ints(d))
    assert fq.to_ints() == q
    assert frem.to_ints() == r


def test_div_by_linear(rng):
    cs = [rng.randrange(R) for _ in range(40)]
    x = rng.randrange(R)
    p = Polynomial.from_ints(cs)
    q, rem = p.div_by_linear(x)
    assert rem == py_eval(cs, x)
    # q * (X - x) + rem == p
    recon = q * Polynomial.from_ints([(R - x) % R, 1]) + Polynomial.from_ints([rem])
    assert recon.to_ints() == cs
    # x = 0 edge
    q0, rem0 = p.div_by_linear(0)
    assert rem0 == cs[0] and q0.to_ints() == cs[1:]


def py_div_by_linear(cs, x):
    """Synthetic-division oracle: (quotient low-to-high, remainder)."""
    q = [0] * (len(cs) - 1)
    acc = 0
    for i in range(len(cs) - 1, 0, -1):
        acc = (acc * x + cs[i]) % R
        q[i - 1] = acc
    rem = (acc * x + cs[0]) % R
    return q, rem


@pytest.mark.parametrize("n", [500, 512, 513, 1025])
def test_div_by_linear_big_parity(n, rng):
    """The chunked Horner-carry division (`_div_by_linear_big`) — the
    production-size witness-quotient path, normally active only above
    2^(div_chunk_log+1) — pinned against the synthetic-division oracle at
    small sizes by forcing div_chunk_log down to 8 (ADVICE r3 item 1)."""
    from kzg_tpu.config import configure, get_config

    cs = [rng.randrange(R) for _ in range(n)]
    x = rng.randrange(R)
    p = Polynomial.from_ints(cs)
    old = get_config().div_chunk_log
    try:
        configure(div_chunk_log=8)  # chunked path activates above 512
        q, rem = p.div_by_linear(x)
        qw, remw = py_div_by_linear(cs, x)
        assert rem == remw
        assert q.to_ints() == qw
        # x = 0 edge: quotient is the coefficient shift
        q0, rem0 = p.div_by_linear(0)
        assert rem0 == cs[0] and q0.to_ints() == cs[1:]
    finally:
        configure(div_chunk_log=old)


def test_div_stream_chunk_parity(rng):
    """The streamed per-chunk division recurrence (_div_stream_consts /
    _div_stream_chunk — the 2^24 witness streaming path) reproduces the
    one-shot quotient chunk-by-chunk, including the final carry == f(x)."""
    import jax.numpy as jnp
    from kzg_tpu.poly.polynomial import (
        _div_stream_consts,
        _div_stream_chunk,
        _pad_to,
    )

    chunk_log, n = 4, 57  # n deliberately not a multiple of the chunk
    m = 1 << chunk_log
    cs = [rng.randrange(R) for _ in range(n)]
    x = rng.randrange(R)
    f = jnp.asarray(FR.encode(cs))
    consts = _div_stream_consts(jnp.asarray(FR.encode([x])), chunk_log)
    carry = FR.zeros(())
    nch = -(-n // m)
    got = [None] * nch
    for ci in range(nch - 1, -1, -1):
        fc = _pad_to(f[..., ci * m : (ci + 1) * m], m)
        qc, carry = _div_stream_chunk(fc, carry, *consts)
        got[ci] = qc
    q_ints = FR.decode(jnp.concatenate(got, axis=-1))
    qw, remw = py_div_by_linear(cs, x)
    assert FR.decode(carry[:, None])[0] == remw
    assert q_ints[: n - 1] == qw
    assert all(v == 0 for v in q_ints[n - 1 :])  # structural-zero tail


def test_vanishing_poly(rng):
    for k in [1, 2, 3, 5, 8]:
        xs = [rng.randrange(R) for _ in range(k)]
        z = vanishing_poly(jnp.asarray(FR.encode(xs)))
        assert z.degree == k
        cs = z.to_ints()
        for x in xs:
            assert py_eval(cs, x) == 0
        assert cs[-1] == 1  # monic


def test_subproduct_tree_structure(rng):
    xs = [rng.randrange(R) for _ in range(8)]
    tree = SubProductTree.from_points(jnp.asarray(FR.encode(xs)))
    # root == product of the two level-2 children
    l2 = tree.levels[-2]
    left = Polynomial(l2[:, 0, :])
    right = Polynomial(l2[:, 1, :])
    assert (left * right).to_ints() == tree.product.to_ints()
    # multipoint eval of a random poly matches pointwise eval
    p = Polynomial.from_ints([rng.randrange(R) for _ in range(8)])
    got = FR.decode(tree.eval_points(p))
    assert got == [p.eval(x) for x in xs]


def test_interpolation_roundtrip(rng):
    for k in [2, 3, 7, 8]:
        xs = [rng.randrange(R) for _ in range(k)]
        ys = [rng.randrange(R) for _ in range(k)]
        r = lagrange_interpolation(
            jnp.asarray(FR.encode(xs)), jnp.asarray(FR.encode(ys))
        )
        assert r.degree <= k - 1 or k == 1
        cs = r.to_ints()
        for x, y in zip(xs, ys):
            assert py_eval(cs, x) == y


def test_interpolation_single_point_quirk(rng):
    # reference parity: 1 point -> X + (y0 - x0)  (polynomial.rs:244-247)
    x0, y0 = rng.randrange(R), rng.randrange(R)
    r = lagrange_interpolation(
        jnp.asarray(FR.encode([x0])), jnp.asarray(FR.encode([y0]))
    )
    assert r.degree == 1
    assert r.to_ints() == [(y0 - x0) % R, 1]


def test_derivative():
    p = Polynomial.from_ints([5, 3, 2, 7])  # 5 + 3X + 2X^2 + 7X^3
    assert poly_derivative(p).to_ints() == [3, 4, 21]


def test_op_tree(rng):
    xs = [rng.randrange(R) for _ in range(6)]
    z = op_tree(
        len(xs),
        lambda i: Polynomial.from_ints([(R - xs[i]) % R, 1]),
        lambda a, b: a * b,
    )
    assert z.to_ints() == vanishing_poly(jnp.asarray(FR.encode(xs))).to_ints()


def test_constructors():
    assert Polynomial.new_monic_of_degree(3).to_ints() == [1, 1, 1, 1]
    assert Polynomial.new_single_term(2).to_ints() == [0, 0, 1]
    assert Polynomial.new_zero().is_zero()
    p = Polynomial.from_ints([1, 2, 0, 0])
    assert p.degree == 1  # trailing zeros trimmed at construction
