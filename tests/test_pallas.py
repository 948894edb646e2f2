"""Differential tests for the Pallas kernels (interpret mode on CPU).

On TPU these kernels are the production path (fields/pallas_field.py,
curve/pallas_ops.py); here they run under the Pallas interpreter and are
pinned against Python-int arithmetic and the XLA limb formulas — the same
differential-oracle pattern as the rest of the suite (SURVEY.md §4).

Interpret mode is slow, so the module is marked `slow`; the TPU-side parity
of the same kernels is exercised by every on-device benchmark run.
"""

import os

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


def _ladder_points(ref, gen, n, rng, lo=1, hi=1 << 20):
    ks = np.array([rng.randrange(lo, hi) for _ in range(n)])
    bits = ((ks[None, :] >> np.arange(20)[:, None]) & 1).astype(np.uint32)
    return ref.scalar_mul_bits(gen, jnp.asarray(bits))


def test_g2_point_kernels_match_xla(rng):
    """The generic point kernels over Fp2 (PallasFp2Ops) against the XLA
    Fp2Adapter group law — the G2 acceleration VERDICT r2 #3 asked for."""
    from kzg_tpu.curve.ops import CurveOps
    from kzg_tpu.curve import FP2A, g2_generator_device
    from kzg_tpu.curve.pallas_ops import _PointKernels

    ref = CurveOps(FP2A, name="G2ref")
    n = B
    p = _ladder_points(ref, g2_generator_device(n), n, rng)
    q = _ladder_points(ref, g2_generator_device(n), n, rng)
    # exceptional lanes: doubling / opposite / infinity
    q = tuple(np.asarray(t).copy() for t in q)
    for t_i in range(3):
        q[t_i][..., 0] = np.asarray(p[t_i])[..., 0]  # lane 0: q == p
    q[0][..., 1] = np.asarray(p[0])[..., 1]
    q[1][..., 1] = np.asarray(FP2A.neg(p[1]))[..., 1]  # lane 1: q == -p
    q[2][..., 2] = 0  # lane 2: q at infinity
    q = tuple(jnp.asarray(t) for t in q)

    kern = _PointKernels(FP, ncomp=2, interpret=True)
    flat = lambda t: t.reshape(FP.L, 2, -1)
    got = kern.add(tuple(flat(t) for t in p), tuple(flat(t) for t in q))
    exp = ref.add(p, q)
    for g_, e_ in zip(got, exp):
        assert np.array_equal(np.asarray(g_).reshape(-1),
                              np.asarray(e_).reshape(-1))
    got_d = kern.dbl(*(flat(t) for t in p))
    exp_d = ref.dbl(p)
    for g_, e_ in zip(got_d, exp_d):
        assert np.array_equal(np.asarray(g_).reshape(-1),
                              np.asarray(e_).reshape(-1))


@pytest.mark.skipif(
    not os.environ.get("KZG_INTERPRET_KERNELS"),
    reason="interpret-mode compile of the DMA/grid-carried kernels takes "
    ">30 min on a 1-core host (structural — the unrolled madd body, not the "
    "test size); the authoritative differential runs on real hardware in "
    "tpu_selftest.py (msm_runs_vs_v1_32768). Set KZG_INTERPRET_KERNELS=1 "
    "to run here anyway.",
)
def test_horner_join_kernel_matches_xla(rng):
    """The fused window-join kernel (one launch, c doublings + Jacobian add
    per grid step) against the XLA fori-loop join, including empty
    (infinity) window sums."""
    from kzg_tpu.curve.ops import CurveOps
    from kzg_tpu.curve import FPA, FP2A, g1_generator_device, g2_generator_device
    from kzg_tpu.curve.pallas_ops import _PointKernels

    # SMALL W*c: interpret mode unrolls the whole grid into one XLA:CPU
    # program at ~1e3 HLOs per point op — W=3, c=2 keeps the compile
    # tractable on the 1-core host while covering MSB order, the dbl
    # chain, grid-carried accumulation, and infinity windows. (The TPU
    # path compiles per grid STEP, so the real W=19/c=14 shape is fine.)
    for ncomp, fa, gen in (
        (1, FPA, g1_generator_device),
        (2, FP2A, g2_generator_device),
    ):
        ref = CurveOps(fa, name=f"ref{ncomp}")
        W, c = 3, 2
        s = _ladder_points(ref, gen(W), W, rng)
        # window 1 empty: infinity
        z = np.asarray(s[2]).copy()
        z[..., 1] = 0
        s = (s[0], s[1], jnp.asarray(z))
        want = ref.window_join(s, c)
        kern = _PointKernels(FP, ncomp=ncomp, interpret=True)
        got = kern.horner_join(s, c)
        assert bool(np.asarray(ref.eq(got, want)))


@pytest.mark.skipif(
    not os.environ.get("KZG_INTERPRET_KERNELS"),
    reason="see test_horner_join_kernel_matches_xla — TPU selftest is the "
    "authoritative differential for the bucket kernel",
)
def test_bucket_accumulate_kernel_matches_xla(rng):
    """The contiguous-run DMA bucket-accumulation kernel (one launch per
    MSM window) against the XLA capped bucket loop: random digits plus
    forced empty buckets, a skipped bucket 0, and run misalignment slop."""
    from kzg_tpu.curve.ops import CurveOps
    from kzg_tpu.curve import FPA, g1_generator_device
    from kzg_tpu.curve.pallas_ops import _PointKernels, LANES

    ref = CurveOps(FPA, name="G1ref")
    B = LANES
    n = 4096
    p = _ladder_points(ref, g1_generator_device(n), n, rng)
    px, py, _ = ref.to_affine(p)
    digits = np.asarray(
        [rng.randrange(B) for _ in range(n)], dtype=np.int32
    )
    digits[:64] = 0          # bucket 0 must stay skipped
    digits[64:96] = 777      # one fat bucket
    order = np.argsort(digits, kind="stable")
    ds = digits[order]
    start = np.searchsorted(ds, np.arange(B), side="left").astype(np.int32)
    end = np.searchsorted(ds, np.arange(B), side="right").astype(np.int32)
    count = (end - start).astype(np.int32)
    count[0] = 0
    cap = int(count.max()) + 3
    # u16-packed sorted rows: (n, 24) padded to (n, 32) -> (n//4, 128)
    allw = np.concatenate([np.asarray(px), np.asarray(py)], axis=0)  # (48,n)
    rows = (allw[0::2] | (allw[1::2] << 16)).T[order]  # (n, 24)
    rows = np.pad(rows, ((0, 0), (0, 32 - rows.shape[1])))
    # + zero memref rows: end-of-array DMA chunks must never clip (the
    # production caller pads the same way, pippenger._msm_impl_runs)
    spm = jnp.asarray(
        np.pad(rows.reshape(n * 32 // 128, 128), ((0, 4), (0, 0)))
    )

    kern = _PointKernels(FP, ncomp=1, interpret=True)
    acc0 = ref.infinity((B,))
    got = kern.bucket_accumulate(
        acc0, spm, jnp.asarray(start), jnp.asarray(count), cap
    )

    # XLA oracle: the v1 capped bucket loop over the same sorted points
    sorted_all = allw[:, order]
    spx = jnp.asarray(sorted_all[:24])
    spy = jnp.asarray(sorted_all[24:48])
    acc = acc0
    startj = jnp.asarray(start)
    countj = jnp.asarray(count)
    for k in range(int(count.max())):
        idx = jnp.clip(startj + k, 0, n - 1)
        valid = k < countj
        qx = jnp.take(spx, idx, axis=-1)
        qy = jnp.take(spy, idx, axis=-1)
        acc = ref.madd(acc, (qx, qy), ~valid)
    assert bool(np.asarray(ref.eq(got, acc).all()))


def test_madd_multi_matches_step_loop(rng):
    """The fused S-step bucket-accumulation kernel against S sequential
    XLA madds with the same skip/neg masks (the MSM hot loop, VERDICT r2
    #2)."""
    from kzg_tpu.curve.ops import CurveOps
    from kzg_tpu.curve import FPA, g1_generator_device
    from kzg_tpu.curve.pallas_ops import _PointKernels

    ref = CurveOps(FPA, name="G1ref")
    n, S = B, 4
    acc = _ladder_points(ref, g1_generator_device(n), n, rng)
    qs = [
        ref.to_affine(_ladder_points(ref, g1_generator_device(n), n, rng))
        for _ in range(S)
    ]
    skip = np.asarray([[rng.random() < 0.3 for _ in range(n)] for _ in range(S)])
    neg = np.asarray([[rng.random() < 0.3 for _ in range(n)] for _ in range(S)])
    # a doubling collision in step 1: q == acc on an unskipped lane
    acc_aff = ref.to_affine(acc)
    q0 = tuple(np.asarray(t).copy() for t in qs[0][:2])
    q0[0][:, 5] = np.asarray(acc_aff[0])[:, 5]
    q0[1][:, 5] = np.asarray(acc_aff[1])[:, 5]
    skip[0][5] = False
    neg[0][5] = False
    qs[0] = (jnp.asarray(q0[0]), jnp.asarray(q0[1]), qs[0][2])

    expected = acc
    for s in range(S):
        qy = jnp.where(FPA.expand(jnp.asarray(neg[s])),
                       FPA.neg(qs[s][1]), qs[s][1])
        sk = jnp.asarray(skip[s]) | qs[s][2]
        expected = ref.madd(expected, (qs[s][0], qy), sk)

    kern = _PointKernels(FP, ncomp=1, interpret=True)
    qx = jnp.stack([q[0] for q in qs], axis=1)  # (L, S, n)
    qy = jnp.stack([q[1] for q in qs], axis=1)
    skip_all = jnp.asarray(skip) | jnp.stack([q[2] for q in qs])
    got = kern.madd_multi(
        tuple(t.reshape(FP.L, -1) for t in acc),
        qx.reshape(FP.L, S, -1), qy.reshape(FP.L, S, -1),
        skip_all.astype(jnp.uint32), jnp.asarray(neg).astype(jnp.uint32),
    )
    for g_, e_ in zip(got, expected):
        assert np.array_equal(np.asarray(g_), np.asarray(e_))


def test_madd_multi_blocks_per_program(rng):
    """madd_multi with multiple 1024-lane blocks per kernel program, and
    with the rare-doubling cond disabled, must be bit-identical to the
    default single-block gated configuration (config knobs
    msm_blocks_per_program / msm_gate_rare_dbl). Kernel-vs-kernel: the
    F=1 baseline is pinned against the XLA group law by
    test_madd_multi_matches_step_loop above."""
    from kzg_tpu.config import configure, get_config
    from kzg_tpu.curve.ops import CurveOps
    from kzg_tpu.curve import FPA, g1_generator_device
    from kzg_tpu.curve.pallas_ops import _PointKernels

    ref = CurveOps(FPA, name="G1ref")
    n, S = 2 * B, 2
    acc = _ladder_points(ref, g1_generator_device(n), n, rng)
    qs = [
        ref.to_affine(_ladder_points(ref, g1_generator_device(n), n, rng))
        for _ in range(S)
    ]
    skip = np.asarray([[rng.random() < 0.3 for _ in range(n)] for _ in range(S)])
    # a doubling collision on an unskipped lane (exercises the ungated path)
    acc_aff = ref.to_affine(acc)
    q0 = tuple(np.asarray(t).copy() for t in qs[0][:2])
    q0[0][:, 7] = np.asarray(acc_aff[0])[:, 7]
    q0[1][:, 7] = np.asarray(acc_aff[1])[:, 7]
    skip[0][7] = False
    qs[0] = (jnp.asarray(q0[0]), jnp.asarray(q0[1]), qs[0][2])

    qx = jnp.stack([q[0] for q in qs], axis=1).reshape(FP.L, S, -1)
    qy = jnp.stack([q[1] for q in qs], axis=1).reshape(FP.L, S, -1)
    skip_all = (jnp.asarray(skip) | jnp.stack([q[2] for q in qs])).astype(
        jnp.uint32
    )
    neg = jnp.zeros_like(skip_all)
    accf = tuple(t.reshape(FP.L, -1) for t in acc)

    old = get_config()
    results = {}
    try:
        for blocks, gate in ((1, True), (2, True), (2, False)):
            configure(msm_blocks_per_program=blocks, msm_gate_rare_dbl=gate)
            kern = _PointKernels(FP, ncomp=1, interpret=True)
            results[(blocks, gate)] = kern.madd_multi(
                accf, qx, qy, skip_all, neg
            )
    finally:
        configure(
            msm_blocks_per_program=old.msm_blocks_per_program,
            msm_gate_rare_dbl=old.msm_gate_rare_dbl,
        )
    base = results[(1, True)]
    for key in ((2, True), (2, False)):
        for g_, e_ in zip(results[key], base):
            assert np.array_equal(np.asarray(g_), np.asarray(e_)), key


def test_mxu_dft_matches_vpu_ntt(rng):
    """The matmul-DFT block (ntt/mxu.py, reduce epilogue in interpret mode)
    against the VPU butterfly path at a couple of block sizes."""
    from kzg_tpu.config import configure
    from kzg_tpu.ntt import Domain
    from kzg_tpu.ntt.mxu import dft_axis2

    for exp, bt in ((4, 8), (6, 4)):
        m = 1 << exp
        xs = [rng.randrange(FR.modulus) for _ in range(m * bt)]
        x = jnp.asarray(FR.encode(xs)).reshape(FR.L, bt, m)
        x = jnp.swapaxes(x, -1, -2)  # (L, m, bt): DFT along axis -2
        configure(ntt_mxu="off")
        try:
            ref = Domain(exp)._ntt_axis2(x, inverse=False)
            refi = Domain(exp)._ntt_axis2(x, inverse=True)
        finally:
            configure(ntt_mxu="auto")
        got = dft_axis2(exp, False, x)
        goti = dft_axis2(exp, True, x)
        assert np.array_equal(np.asarray(ref), np.asarray(got)), exp
        assert np.array_equal(np.asarray(refi), np.asarray(goti)), exp


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
