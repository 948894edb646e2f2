"""Differential tests for the Pallas kernels (interpret mode on CPU).

On TPU these kernels are the production path (fields/pallas_field.py,
curve/pallas_ops.py); here they run under the Pallas interpreter and are
pinned against Python-int arithmetic and the XLA limb formulas — the same
differential-oracle pattern as the rest of the suite (SURVEY.md §4).

Interpret mode is slow, so the module is marked `slow`; the TPU-side parity
of the same kernels is exercised by every on-device benchmark run.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from kzg_tpu.fields import FR, FP
from kzg_tpu.fields import pallas_field as pf

pytestmark = pytest.mark.slow

B = 1024


def _pairs(F, rng, n=B):
    xs = [rng.randrange(F.modulus) for _ in range(n)]
    ys = [rng.randrange(F.modulus) for _ in range(n)]
    # exercise edge values in the first lanes
    edge = [0, 1, F.modulus - 1, F.modulus - 2]
    xs[: len(edge)] = edge
    ys[: len(edge)] = list(reversed(edge))
    return xs, ys


@pytest.mark.parametrize("field", [FR, FP], ids=["Fr", "Fp"])
def test_mul_matches_python_ints(field, rng):
    xs, ys = _pairs(field, rng)
    a = jnp.asarray(field.encode(xs))
    b = jnp.asarray(field.encode(ys))
    mul = pf.make_mul(field, interpret=True)
    assert field.decode(mul(a, b)) == [
        x * y % field.modulus for x, y in zip(xs, ys)
    ]


@pytest.mark.parametrize("field", [FR, FP], ids=["Fr", "Fp"])
def test_add_sub_match_python_ints(field, rng):
    xs, ys = _pairs(field, rng)
    a = jnp.asarray(field.encode(xs))
    b = jnp.asarray(field.encode(ys))
    add = pf.make_add(field, interpret=True)
    sub = pf.make_sub(field, interpret=True)
    assert field.decode(add(a, b)) == [
        (x + y) % field.modulus for x, y in zip(xs, ys)
    ]
    assert field.decode(sub(a, b)) == [
        (x - y) % field.modulus for x, y in zip(xs, ys)
    ]


def test_g1_madd_kernel_matches_xla(rng):
    """Fused madd kernel (incl. dbl/opposite/infinity/skip branches) against
    the XLA group-law formulas on the same inputs."""
    from kzg_tpu.curve.ops import CurveOps
    from kzg_tpu.curve import FPA, g1_generator_device
    from kzg_tpu.curve.pallas_ops import _G1Kernels

    ref = CurveOps(FPA, name="G1ref")
    n = B
    ks = np.array([rng.randrange(1, 1 << 20) for _ in range(n)])
    bits = ((ks[None, :] >> np.arange(20)[:, None]) & 1).astype(np.uint32)
    p = ref.scalar_mul_bits(g1_generator_device(n), jnp.asarray(bits))
    ks2 = np.array([rng.randrange(1, 1 << 20) for _ in range(n)])
    bits2 = ((ks2[None, :] >> np.arange(20)[:, None]) & 1).astype(np.uint32)
    q = ref.to_affine(ref.scalar_mul_bits(g1_generator_device(n), jnp.asarray(bits2)))

    # exceptional lanes: same point (doubling), opposite point, inf acc
    qx = np.asarray(q[0]).copy()
    qy = np.asarray(q[1]).copy()
    p_aff = ref.to_affine(p)
    qx[:, 0] = np.asarray(p_aff[0])[:, 0]
    qy[:, 0] = np.asarray(p_aff[1])[:, 0]  # lane 0: q == p
    qx[:, 1] = np.asarray(p_aff[0])[:, 1]
    qy[:, 1] = np.asarray(ref.fa.f.encode(
        [(-x) % FP.modulus for x in [FP.decode(p_aff[1])[1]]]))[:, 0]  # lane 1: q == -p
    pz = np.asarray(p[2]).copy()
    pz[:, 2] = 0  # lane 2: acc at infinity
    p = (p[0], p[1], jnp.asarray(pz))
    skip = np.zeros(n, bool)
    skip[3] = True
    q_t = (jnp.asarray(qx), jnp.asarray(qy))
    skip_j = jnp.asarray(skip)

    kern = _G1Kernels(FP, interpret=True)
    got = kern.madd(
        p[0].reshape(FP.L, -1), p[1].reshape(FP.L, -1), p[2].reshape(FP.L, -1),
        q_t[0].reshape(FP.L, -1), q_t[1].reshape(FP.L, -1),
        skip_j.astype(jnp.uint32),
    )
    exp = ref.madd(p, q_t, skip_j)
    for g_, e_ in zip(got, exp):
        assert np.array_equal(np.asarray(g_), np.asarray(e_))


def test_ntt_stage_kernel(rng):
    """Fused butterfly stage kernel (make_ntt_stage): u = a+b,
    v = (a-b)*w against Python-int arithmetic."""
    m = FR.modulus
    xs, ys = _pairs(FR, rng)
    ws = [rng.randrange(m) for _ in range(B)]
    a = jnp.asarray(FR.encode(xs))
    b = jnp.asarray(FR.encode(ys))
    w = jnp.asarray(FR.encode(ws))
    stage = pf.make_ntt_stage(FR, interpret=True)
    u, v = stage(a, b, w)
    assert FR.decode(u) == [(x + y) % m for x, y in zip(xs, ys)]
    assert FR.decode(v) == [(x - y) * t % m for x, y, t in zip(xs, ys, ws)]
