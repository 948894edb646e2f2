"""Differential tests: LimbField kernels vs the Python-int oracle.

Pattern from the reference test suite: every fast path is pinned to a naive
oracle (SURVEY.md §4; e.g. reference ft.rs:411-434 pins fft_mul to naive mul).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kzg_tpu.fields import FR, FP
from kzg_tpu.constants import R, P


FIELDS = [(FR, R), (FP, P)]


def _rand_elems(rng, mod, n):
    xs = [rng.randrange(mod) for _ in range(n - 3)]
    return xs + [0, 1, mod - 1]


@pytest.mark.parametrize("field,mod", FIELDS, ids=["Fr", "Fp"])
def test_roundtrip(field, mod, rng):
    xs = _rand_elems(rng, mod, 16)
    enc = field.encode(xs)
    assert field.decode(jnp.asarray(enc)) == xs


@pytest.mark.parametrize("field,mod", FIELDS, ids=["Fr", "Fp"])
def test_add_sub_neg(field, mod, rng):
    n = 32
    xs = _rand_elems(rng, mod, n)
    ys = list(reversed(_rand_elems(rng, mod, n)))
    a = jnp.asarray(field.encode(xs))
    b = jnp.asarray(field.encode(ys))
    assert field.decode(field.add(a, b)) == [(x + y) % mod for x, y in zip(xs, ys)]
    assert field.decode(field.sub(a, b)) == [(x - y) % mod for x, y in zip(xs, ys)]
    assert field.decode(field.neg(a)) == [(-x) % mod for x in xs]


@pytest.mark.parametrize("field,mod", FIELDS, ids=["Fr", "Fp"])
def test_mul(field, mod, rng):
    n = 32
    xs = _rand_elems(rng, mod, n)
    ys = list(reversed(_rand_elems(rng, mod, n)))
    a = jnp.asarray(field.encode(xs))
    b = jnp.asarray(field.encode(ys))
    assert field.decode(field.mul(a, b)) == [(x * y) % mod for x, y in zip(xs, ys)]
    assert field.decode(field.sqr(a)) == [(x * x) % mod for x in xs]


@pytest.mark.parametrize("field,mod", FIELDS, ids=["Fr", "Fp"])
def test_pow_and_inv(field, mod, rng):
    xs = [rng.randrange(1, mod) for _ in range(4)]
    a = jnp.asarray(field.encode(xs))
    e = rng.randrange(1 << 64)
    assert field.decode(field.pow_static(a, e)) == [pow(x, e, mod) for x in xs]
    assert field.decode(field.inv(a)) == [pow(x, -1, mod) for x in xs]


@pytest.mark.parametrize("field,mod", FIELDS, ids=["Fr", "Fp"])
def test_batch_inv(field, mod, rng):
    xs = [rng.randrange(mod) for _ in range(15)] + [0]  # include a zero
    a = jnp.asarray(field.encode(xs))
    got = field.decode(field.batch_inv(a))
    want = [pow(x, -1, mod) if x else 0 for x in xs]
    assert got == want


@pytest.mark.parametrize("field,mod", FIELDS, ids=["Fr", "Fp"])
def test_predicates(field, mod, rng):
    xs = [0, 1, mod - 1, 5]
    a = jnp.asarray(field.encode(xs))
    assert list(np.asarray(field.is_zero(a))) == [True, False, False, False]
    assert list(np.asarray(field.eq(a, a))) == [True] * 4


def test_broadcast_scalar_times_vector(rng):
    xs = [rng.randrange(R) for _ in range(8)]
    s = rng.randrange(R)
    a = jnp.asarray(FR.encode(xs))
    b = jnp.asarray(FR.encode([s]))  # (L, 1)
    assert FR.decode(FR.mul(a, b)) == [(x * s) % R for x in xs]
