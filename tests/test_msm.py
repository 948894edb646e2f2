"""Pippenger MSM differential tests against the oracle double-and-add,
including the adversarial shapes the sort/bucket formulation must survive:
repeated points, zero scalars, infinity inputs, single-element batches, and
several window sizes (reference surface: blst multi_exp, used at
coeff_form.rs:61,78,102 and eval_form.rs:118,136)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kzg_tpu.constants import R
from kzg_tpu.fields import FR
from kzg_tpu.curve import G1, G2, g1_to_device, g2_to_device, g1_from_device, g2_from_device
from kzg_tpu.msm import msm_g1, msm_g2
from kzg_tpu.oracle import ec_add, ec_mul, g1_generator, g2_generator

# slow tier: differential MSM suites compile full Pippenger graphs (>5 min on 1 core);
# the fast tier (pytest -m 'not slow') must stay <10 min cold (VERDICT r2 #5)
pytestmark = pytest.mark.slow


def oracle_msm(points, scalars, mul=ec_mul):
    acc = None
    for p, s in zip(points, scalars):
        acc = ec_add(acc, mul(p, s))
    return acc


def run_g1(points, scalars, c=None):
    dev = g1_to_device(points)
    s = jnp.asarray(FR.encode([x % R for x in scalars]))
    got = msm_g1((dev[0], dev[1], np.asarray(FR.is_zero(dev[2]))), s, c)
    return g1_from_device(tuple(t[..., None] for t in got))[0]


@pytest.mark.parametrize("n,c", [(1, 2), (7, 3), (16, 4), (33, 5)])
def test_msm_g1_random(n, c, rng):
    g = g1_generator()
    pts = [ec_mul(g, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    assert run_g1(pts, scalars, c) == oracle_msm(pts, scalars)


def test_msm_g1_edge_cases(rng):
    g = g1_generator()
    pts = [g, g, None, ec_mul(g, 7), ec_mul(g, 7), ec_mul(g, 9), None, g]
    scalars = [0, 1, 5, R - 1, R - 1, 0, 0, 1]
    assert run_g1(pts, scalars, 4) == oracle_msm(pts, scalars)


def test_msm_g1_all_zero_scalars(rng):
    g = g1_generator()
    pts = [ec_mul(g, i + 1) for i in range(8)]
    assert run_g1(pts, [0] * 8, 3) is None


def test_msm_g2_random(rng):
    h = g2_generator()
    n = 6
    pts = [ec_mul(h, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    dev = g2_to_device(pts)
    inf = np.asarray(jnp.all(dev[2] == 0, axis=(0, 1)))
    s = jnp.asarray(FR.encode([x % R for x in scalars]))
    got = msm_g2((dev[0], dev[1], jnp.asarray(inf)), s, 4)
    got_pt = g2_from_device(tuple(t[..., None] for t in got))[0]
    assert got_pt == oracle_msm(pts, scalars)


def _with_config(**kw):
    """Context manager: temporarily override global config fields."""
    import contextlib
    from kzg_tpu.config import get_config, set_config, configure

    @contextlib.contextmanager
    def cm():
        old = get_config()
        try:
            yield configure(**kw)
        finally:
            set_config(old)

    return cm()


def test_msm_v2_bucket_path(rng):
    """Force the v2 windows-in-lanes + batched-affine bucket path at a
    CPU-compilable size (threshold lowered via config)."""
    g = g1_generator()
    n = 64
    pts = [ec_mul(g, rng.randrange(1, R)) for _ in range(n)]
    pts[3] = None  # infinity input must be skipped
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[5] = 0
    with _with_config(small_msm_threshold=16, msm_impl="v2"):
        got = run_g1(pts, scalars, 5)
    assert got == oracle_msm(pts, scalars)


def test_msm_v2_skewed_digits_fallback(rng):
    """All-equal scalars concentrate every window's digits in one bucket —
    the capped bucket loop must hand off to the segmented-scan fallback and
    still produce the exact sum (the VERDICT worst-case robustness item)."""
    g = g1_generator()
    n = 64
    pts = [ec_mul(g, i + 1) for i in range(n)]
    s = rng.randrange(1, R)
    scalars = [s] * n
    with _with_config(small_msm_threshold=16, msm_impl="v2"):
        got = run_g1(pts, scalars, 5)
    assert got == oracle_msm(pts, scalars)


def test_msm_v1_bucket_path(rng):
    """Round-1 window-sequential formulation kept as a baseline: same
    forced-threshold differential test."""
    g = g1_generator()
    n = 64
    pts = [ec_mul(g, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    with _with_config(small_msm_threshold=16, msm_impl="v1"):
        got = run_g1(pts, scalars, 5)
    assert got == oracle_msm(pts, scalars)


def test_msm_v2_g2_bucket_path(rng):
    h = g2_generator()
    n = 40
    pts = [ec_mul(h, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    dev = g2_to_device(pts)
    inf = np.asarray(jnp.all(dev[2] == 0, axis=(0, 1)))
    s = jnp.asarray(FR.encode([x % R for x in scalars]))
    with _with_config(small_msm_threshold=16, msm_impl="v2"):
        got = msm_g2((dev[0], dev[1], jnp.asarray(inf)), s, 5)
    got_pt = g2_from_device(tuple(t[..., None] for t in got))[0]
    assert got_pt == oracle_msm(pts, scalars)


def test_msm_v1_skewed_digits_fallback(rng):
    """v1's capped window loop must also hand off to its segmented-scan
    fallback on adversarially skewed digits."""
    g = g1_generator()
    n = 64
    pts = [ec_mul(g, i + 1) for i in range(n)]
    s = rng.randrange(1, R)
    scalars = [s] * n
    with _with_config(small_msm_threshold=16, msm_impl="v1"):
        got = run_g1(pts, scalars, 5)
    assert got == oracle_msm(pts, scalars)


def test_msm_v1s_signed_windows(rng):
    """Signed-digit window variant vs the oracle, incl. edge scalars that
    exercise the borrow chain (r-1 = all-ones windows)."""
    g = g1_generator()
    n = 48
    pts = [ec_mul(g, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = R - 1
    scalars[1] = 1
    scalars[2] = 0
    with _with_config(small_msm_threshold=16, msm_impl="v1s"):
        got = run_g1(pts, scalars, 5)
    assert got == oracle_msm(pts, scalars)


def test_msm_chunked_matches_unchunked(rng):
    """msm_chunk_log streaming: a 64-point MSM split into 16-point chunks
    (sequential Pippenger partials + Jacobian adds) == one-shot == oracle.
    Also a non-power-of-two tail chunk (n=40, chunk=16 -> 16+16+8)."""
    g = g1_generator()
    for n in (64, 40):
        pts = [ec_mul(g, rng.randrange(1, R)) for _ in range(n)]
        scalars = [rng.randrange(R) for _ in range(n)]
        scalars[0] = 0
        want = oracle_msm(pts, scalars)
        with _with_config(small_msm_threshold=4, msm_chunk_log=4):
            got = run_g1(pts, scalars, 4)
        assert got == want, f"chunked MSM mismatch at n={n}"
