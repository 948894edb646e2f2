"""Headline benchmark: single-chip G1 Pippenger MSM at the north-star size,
roofline-normalized (BASELINE.md: MSM points/s + NTT butterflies/s at
2^20-2^24, judged against the chip's field-mul peak).

DRIVER-PROOF EMISSION (round-5 fix for BENCH_r04 rc=124/parsed=null): the
JSON result line is printed INCREMENTALLY — once as soon as the headline
G1-MSM number exists, then re-printed (enriched) after every completed
section, and once more from a SIGTERM/atexit handler. A parser taking either
the first or the last JSON line on stdout gets a valid result even if the
process is killed mid-section. Sections are ordered headline-first
(peaks -> G1 MSM -> 2^24 e2e -> NTT -> G2 -> eval form) and each optional
section is gated on a wall-clock budget (KZG_BENCH_BUDGET_S, default 3000s):
if the remaining budget is smaller than the section's cold-cost estimate the
section records "skipped_budget" instead of risking a driver timeout.

Headline value: MSM points/s at 2^20. `extras` carries the roofline
accounting that makes it interpretable:

  fp_mul_peak_per_sec   sustained fused-kernel Fp (381-bit) Montgomery-mul
                        rate: one Pallas launch amortized over a 65-deep
                        in-kernel mul chain — the speed-of-light unit for
                        curve work. (A 1-mul probe is launch-overhead-bound
                        on this device and understates the peak ~20x.)
  fr_mul_peak_per_sec   same for Fr (255-bit) — the NTT's unit
  msm_mfu               (useful Fp muls issued / second) / fp peak, with
                        useful = n*W*mul_cost(madd): how close the whole
                        MSM runs to pure-mul speed-of-light
  ntt_butterflies_per_sec, ntt_mfu: (n/2)*log2(n) butterflies, 1 Fr mul
                        each, against the Fr peak

The reference publishes no numbers (BASELINE.md) so vs_baseline is 1.0 by
convention; values are tracked round-over-round in BENCH_r{N}.json.

Timing is cache-safe: every iteration uses distinct inputs and every result
is fetched to host (identical repeated executions can be served from a
cache by the remote-device tunnel, reporting physically impossible rates).
"""

import atexit
import json
import os
import signal
import sys
import time

import numpy as np

_T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("KZG_BENCH_BUDGET_S", "3000"))


def _remaining():
    return BUDGET_S - (time.perf_counter() - _T_START)


def _note(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

LOG_N = int(os.environ.get("KZG_BENCH_LOGN", "20"))
ITERS = int(os.environ.get("KZG_BENCH_ITERS", "5"))
WINDOW = os.environ.get("KZG_BENCH_WINDOW")  # override MSM window size
MSM_IMPL = os.environ.get("KZG_BENCH_MSM_IMPL")  # v1 | v2 | affine | runs
SKIP_PEAKS = os.environ.get("KZG_BENCH_SKIP_PEAKS")  # msm-only quick A/B

# mutable result state shared with the emergency emitters
_STATE = {"metric": f"g1_msm_points_per_sec_2e{LOG_N}", "value": 0.0,
          "unit": "points/s", "vs_baseline": 1.0, "extras": {}}
_EMITTED = False


def emit(stage):
    """(Re-)print the result JSON line. Safe to call repeatedly — the last
    line printed always carries everything measured so far."""
    global _EMITTED
    _STATE["extras"]["stage"] = stage
    _STATE["extras"]["elapsed_s"] = round(time.perf_counter() - _T_START, 1)
    print(json.dumps(_STATE), flush=True)
    _EMITTED = True


def _on_sigterm(signum, frame):  # noqa: ARG001 - signal signature
    _note(f"signal {signum}: dumping partial result")
    emit("killed")
    # restore default + re-raise so the exit code still reflects the kill
    signal.signal(signum, signal.SIG_DFL)
    os.kill(os.getpid(), signum)


signal.signal(signal.SIGTERM, _on_sigterm)
signal.signal(signal.SIGINT, _on_sigterm)


@atexit.register
def _on_exit():
    if not _EMITTED:
        emit("atexit")


def _fetch_scalar(out):
    """Force completion without hauling buffers over the tunnel."""
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


def _timeit(fn, variants, iters=ITERS, samples_out=None):
    """Mean seconds/iteration over `iters` runs on rotating distinct
    inputs (cache-safe). With samples_out (a list), each iteration is
    timed individually — min/median/std statistics (criterion-style) — at
    the cost of one host sync per iteration instead of one at the end."""
    out = fn(variants[0])
    _fetch_scalar(out)
    if samples_out is None:
        t0 = time.perf_counter()
        outs = [fn(variants[1 + (i % (len(variants) - 1))]) for i in range(iters)]
        for o in outs:
            _fetch_scalar(o)
        return (time.perf_counter() - t0) / iters
    for i in range(iters):
        t0 = time.perf_counter()
        _fetch_scalar(fn(variants[1 + (i % (len(variants) - 1))]))
        samples_out.append(time.perf_counter() - t0)
    return sum(samples_out) / len(samples_out)


def _spread(extras, key, samples):
    ss = sorted(samples)
    n = len(ss)
    med = ss[n // 2] if n % 2 else 0.5 * (ss[n // 2 - 1] + ss[n // 2])
    mean = sum(ss) / n
    var = sum((s - mean) ** 2 for s in ss) / n
    extras[f"{key}_min"] = round(ss[0], 4)
    extras[f"{key}_median"] = round(med, 4)
    extras[f"{key}_std"] = round(var ** 0.5, 4)


def main():
    import jax
    import jax.numpy as jnp

    from kzg_tpu.fields import FR, FP
    from kzg_tpu.curve import G1, g1_generator_device
    from kzg_tpu.msm.pippenger import effective_window
    from kzg_tpu.config import get_config, configure

    extras = _STATE["extras"]

    if MSM_IMPL:
        configure(msm_impl=MSM_IMPL)
    n = 1 << LOG_N
    c = int(WINDOW) if WINDOW else effective_window(n)
    extras.update({"log_n": LOG_N, "window": c,
                   "msm_impl": get_config().msm_impl, "iters": ITERS,
                   "budget_s": BUDGET_S})

    rng = np.random.default_rng(42)

    def rand_mont(field, count):
        """Uniform-ish field elements in Montgomery form: limbs drawn in
        numpy (vectorized) + ONE on-device to_mont. The per-int Python
        encode loop costs minutes at 2^20 on this 1-core host. The top
        limb is masked so values stay < 2^(16L-2) (< modulus), keeping
        every downstream digit/window live except the top two bits."""
        limbs = rng.integers(
            0, 1 << 16, size=(field.L, count), dtype=np.uint32
        )
        limbs[-1] &= 0x3FFF
        return jax.jit(field.to_mont)(jnp.asarray(limbs))

    # ---- field-mul peaks (speed-of-light units) -------------------------
    def mul_peak(field, lanes):
        # Difference two in-kernel chain lengths so launch/dispatch/tunnel
        # fixed costs cancel: a single-mul timing is overhead-bound on this
        # device and understates the peak several-fold.
        from kzg_tpu.fields.pallas_field import make_mul_chain, pallas_enabled

        a = rand_mont(field, lanes)
        b = rand_mont(field, lanes)
        variants = [jnp.roll(a, i, axis=-1) for i in range(4)]
        jax.block_until_ready(variants)
        if pallas_enabled():
            k1, k2 = 1, 65
            run1 = make_mul_chain(field, k1)
            run2 = make_mul_chain(field, k2)
            dt1 = _timeit(lambda v: run1(v, b), variants, iters=3)
            dt2 = _timeit(lambda v: run2(v, b), variants, iters=3)
            name = "fr" if field is FR else "fp"
            extras[f"{name}_launch_overhead_ms"] = round(dt1 * 1e3, 2)
            extras[f"{name}_mul_marginal_per_sec"] = round(
                lanes * (k2 - k1) / max(dt2 - dt1, 1e-9), 1
            )
            return lanes * k2 / dt2
        run = jax.jit(lambda x, y: field.mul(x, y))
        dt = _timeit(lambda v: run(v, b), variants, iters=3)
        return lanes / dt

    fr_peak = fp_peak = None
    if not SKIP_PEAKS:
        _note("measuring Fr mul peak")
        fr_peak = mul_peak(FR, 1 << 19)
        _note("measuring Fp mul peak")
        fp_peak = mul_peak(FP, 1 << 19)
        extras["fr_mul_peak_per_sec"] = round(fr_peak, 1)
        extras["fp_mul_peak_per_sec"] = round(fp_peak, 1)

    # ---- G1 MSM at 2^LOG_N — THE HEADLINE, measured before everything
    # else so a mid-run kill still leaves a parsed result ------------------
    # point batch: k*G for random 30-bit k via the batched ladder. Above
    # 2^20 the batch is a TILED 2^20 generation: the ladder at full width
    # OOMs HBM, and tiling is workload-neutral for Pippenger — buckets are
    # keyed by scalar digits, never point identity.
    gen_log = min(LOG_N, 20)
    gn = 1 << gen_log
    _note(f"MSM 2^{LOG_N}: generating point batch (2^{gen_log} tiled)")
    ks = rng.integers(1, 1 << 30, size=gn, dtype=np.int64)
    bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
    pts = G1.to_affine(
        G1.scalar_mul_bits(g1_generator_device(gn), jnp.asarray(bits))
    )
    if gn < n:
        reps = n // gn
        pts = tuple(
            jnp.tile(t, (1,) * (t.ndim - 1) + (reps,)) for t in pts
        )
    # full-range (254-bit) scalars — the real workload
    _note("MSM: scalars encoded")
    scalars = rand_mont(FR, n)
    # the PUBLIC msm entry: impl selected by config, window by `c`; batches
    # > 2^msm_chunk_log stream as sequential chunked partials (bounds HBM)
    from kzg_tpu.msm.pippenger import msm as msm_public

    extras["chunk_log"] = min(get_config().msm_chunk_log, LOG_N)
    svars = [jnp.roll(scalars, i + 1, axis=-1) for i in range(ITERS)] + [scalars]
    jax.block_until_ready((pts, svars))
    _note("MSM: compiling + timing")
    msm_samples = []
    dt = _timeit(
        lambda s: msm_public(G1, pts, s, c), svars, samples_out=msm_samples
    )
    _spread(extras, "msm_seconds", msm_samples)
    pps = n / dt
    _STATE["value"] = round(pps, 1)

    # roofline accounting: useful work = every point enters one bucket add
    # per window. Jacobian mixed add (madd-2007-bl) = 7M + 4S = 11 Fp muls;
    # the batched-affine variant ~6.
    w_count = -(-255 // c)
    mul_cost_madd = 6 if get_config().msm_impl == "affine" else 11
    useful_muls = n * w_count * mul_cost_madd
    extras["msm_seconds"] = round(dt, 3)
    extras["msm_fp_muls_per_point"] = w_count * mul_cost_madd
    if fp_peak:
        extras["msm_mfu"] = round(useful_muls / dt / fp_peak, 4)
    _note(f"HEADLINE: {pps:,.0f} points/s at 2^{LOG_N}")
    emit("msm_done")

    # ---- end-to-end commit + witness + verify at the 2^24 north star -----
    # (BASELINE.md config 5, single-chip form.) Second in the order: it is
    # the other number BASELINE.md obligates and it has never appeared in a
    # parsed BENCH_r*.json (r3 OOM, r4 timeout-before-section).
    e2e_log = int(os.environ.get("KZG_BENCH_E2E_LOGN", "24"))
    if e2e_log and _remaining() < 900:
        extras["e2e_skipped_budget"] = round(_remaining(), 1)
        _note("e2e 2^24: skipped (budget)")
        e2e_log = 0
    if e2e_log:
        # free the MSM section's point/scalar batches (~8GB at 2^20 incl.
        # roll variants) — holding them through the 2^24 protocol run was
        # the RESOURCE_EXHAUSTED in r3's witness phase
        del pts, scalars, svars
        try:
            from kzg_tpu.kzg.srs import setup_device
            from kzg_tpu.kzg.coeff_form import KZGProver, KZGVerifier
            from kzg_tpu.poly import Polynomial

            ne = 1 << e2e_log
            _note(f"e2e 2^{e2e_log}: building SRS (chunked, G1 only)")
            t0 = time.perf_counter()
            params = setup_device(0x5EED1DEAF00D, ne, g2_count=2)
            jax.block_until_ready(params.gs)
            extras["e2e_setup_seconds"] = round(time.perf_counter() - t0, 2)
            prover = KZGProver(params)
            coeffs = rand_mont(FR, ne)
            poly = Polynomial(coeffs, ne - 1)
            _note("e2e: commit (compile + 1 warm)")
            cm = prover.commit(poly)
            jax.block_until_ready(cm)
            t0 = time.perf_counter()
            cm = prover.commit(Polynomial(jnp.roll(coeffs, 1, axis=-1), ne - 1))
            jax.block_until_ready(cm)
            commit_s = time.perf_counter() - t0
            extras[f"e2e_commit_seconds_2e{e2e_log}"] = round(commit_s, 3)
            emit("e2e_commit_done")
            _note(f"e2e: commit {commit_s:.2f}s; create_witness")
            x = 0xABCDEF0123456789
            w = prover.create_witness(poly, (x, 0), check=False)
            jax.block_until_ready(w)
            t0 = time.perf_counter()
            w = prover.create_witness(
                Polynomial(jnp.roll(coeffs, 1, axis=-1), ne - 1),
                (x, 0), check=False,
            )
            jax.block_until_ready(w)
            witness_s = time.perf_counter() - t0
            extras[f"e2e_witness_seconds_2e{e2e_log}"] = round(witness_s, 3)
            extras[f"commit_witness_seconds_2e{e2e_log}"] = round(
                commit_s + witness_s, 3
            )
            # decomposition: both phases are MSM-bound; the division is the
            # witness surplus over one commit-sized MSM
            extras["e2e_division_share"] = round(
                max(0.0, witness_s - commit_s) / max(witness_s, 1e-9), 3
            )
            emit("e2e_witness_done")
            # verify the opening (reference coeff_form.rs:126-142). The
            # witness above used check=False with a placeholder y, so
            # recompute the true y = f(x) first — verification latency is
            # degree-independent (2 pairings); recording it at the north
            # star demonstrates that it is.
            _note("e2e: verify_eval")
            poly2 = Polynomial(jnp.roll(coeffs, 1, axis=-1), ne - 1)
            y_true = poly2.eval(x)
            t0 = time.perf_counter()
            ok = KZGVerifier(params).verify_eval((x, y_true), cm, w)
            verify_s = time.perf_counter() - t0
            extras[f"e2e_verify_seconds_2e{e2e_log}"] = round(verify_s, 3)
            extras["e2e_verify_ok"] = bool(ok)
            del params, prover, coeffs, poly, poly2
        except Exception as e:  # noqa: BLE001 - record, don't kill the bench
            extras["e2e_error"] = f"{type(e).__name__}: {e}"[:300]
            _note(f"e2e FAILED: {extras['e2e_error']}")
        emit("e2e_done")

    # ---- NTT at 2^LOG_N: VPU butterflies vs MXU matmul-DFT A/B -----------
    if SKIP_PEAKS or _remaining() < 240:
        if not SKIP_PEAKS:
            extras["ntt_skipped_budget"] = round(_remaining(), 1)
            _note("NTT: skipped (budget)")
    else:
        from kzg_tpu.ntt import Domain

        _note(f"NTT 2^{LOG_N}: building domain + encoding input")
        x = rand_mont(FR, n)
        xvars = [jnp.roll(x, i + 1, axis=-1) for i in range(3)] + [x]
        jax.block_until_ready(xvars)
        butterflies = (n // 2) * LOG_N
        ntt_by_mode = {}
        for mode in ("off", "auto"):
            configure(ntt_mxu=mode)
            Domain._cache.clear()  # ntt jits bake the mode in at trace time
            dom = Domain(LOG_N)
            _note(f"NTT ({'VPU' if mode == 'off' else 'MXU'}): compile + time")
            try:
                ntt_by_mode[mode] = _timeit(lambda v: dom.ntt(v), xvars, iters=3)
            except Exception as e:  # noqa: BLE001 - record, keep benching
                extras[f"ntt_{mode}_error"] = f"{type(e).__name__}: {e}"[:200]
        configure(ntt_mxu="off")
        Domain._cache.clear()
        if "off" in ntt_by_mode:
            extras["ntt_vpu_seconds"] = round(ntt_by_mode["off"], 4)
        if "auto" in ntt_by_mode:
            extras["ntt_mxu_seconds"] = round(ntt_by_mode["auto"], 4)
        if ntt_by_mode:  # both modes can fail; min() on {} would crash
            ntt_dt = min(ntt_by_mode.values())
            extras["ntt_winner"] = (
                "mxu" if ntt_by_mode.get("auto") == ntt_dt else "vpu"
            )
            ntt_rate = butterflies / ntt_dt
            extras["ntt_butterflies_per_sec"] = round(ntt_rate, 1)
            if fr_peak:
                extras["ntt_mfu"] = round(ntt_rate / fr_peak, 4)
            extras["ntt_seconds"] = round(ntt_dt, 4)
        del x, xvars  # free ~5GB of HBM before later sections
        emit("ntt_done")

    # ---- G2 MSM (the batched verifier's h^Z + Lagrange G2 iNTT unit;
    # reference coeff_form.rs:161-166) — Fp2 Pallas point kernels ----------
    g2_log = int(os.environ.get("KZG_BENCH_G2_LOGN", "16"))
    if g2_log and _remaining() < 420:
        extras["g2_msm_skipped_budget"] = round(_remaining(), 1)
        _note("G2 MSM: skipped (budget)")
        g2_log = 0
    if g2_log:
        try:
            from kzg_tpu.curve import G2, g2_generator_device

            n2 = 1 << g2_log
            _note(f"G2 MSM 2^{g2_log}: generating point batch")
            ks2 = rng.integers(1, 1 << 30, size=n2, dtype=np.int64)
            bits2 = ((ks2[None, :] >> np.arange(30)[:, None]) & 1).astype(
                np.uint32
            )
            pts2 = G2.to_affine(
                G2.scalar_mul_bits(g2_generator_device(n2), jnp.asarray(bits2))
            )
            s2 = rand_mont(FR, n2)
            s2v = [jnp.roll(s2, i + 1, axis=-1) for i in range(2)] + [s2]
            jax.block_until_ready((pts2, s2v))
            _note("G2 MSM: compiling + timing")
            dt2 = _timeit(lambda s: msm_public(G2, pts2, s), s2v, iters=2)
            extras[f"g2_msm_points_per_sec_2e{g2_log}"] = round(n2 / dt2, 1)
            extras["g2_msm_seconds"] = round(dt2, 3)
            del pts2, s2, s2v
        except Exception as e:  # noqa: BLE001
            extras["g2_msm_error"] = f"{type(e).__name__}: {e}"[:300]
            _note(f"G2 MSM FAILED: {extras['g2_msm_error']}")
        emit("g2_done")

    # ---- eval form at scale: trusted-path Lagrange SRS (the O(d log d)
    # group iNTT replacing reference eval_form.rs:254-280's O(d^2 M(d)))
    # timed at 2^KZG_BENCH_EVAL_LOGN, then commit + single-index witness. --
    eval_log = int(os.environ.get("KZG_BENCH_EVAL_LOGN", "16"))
    if eval_log and _remaining() < 600:
        extras["eval_form_skipped_budget"] = round(_remaining(), 1)
        _note("eval form: skipped (budget)")
        eval_log = 0
    if eval_log:
        try:
            from kzg_tpu.kzg.srs import setup_device
            from kzg_tpu.kzg.eval_form import (
                KZGProverEvalForm,
                compute_lagrange_basis,
            )

            nev = 1 << eval_log
            _note(f"eval form 2^{eval_log}: building SRS (G1+G2 powers)")
            t0 = time.perf_counter()
            eparams = setup_device(0x5EED1DEAF00D, nev, g2_count=nev)
            jax.block_until_ready((eparams.gs, eparams.hs))
            extras["eval_setup_seconds"] = round(time.perf_counter() - t0, 2)
            _note("eval form: compute_lagrange_basis (trusted group-iNTT)")
            t0 = time.perf_counter()
            lag = compute_lagrange_basis(eparams, eval_log)
            jax.block_until_ready((lag.lg, lag.lh))
            extras[f"lagrange_srs_seconds_2e{eval_log}"] = round(
                time.perf_counter() - t0, 2
            )
            emit("lagrange_srs_done")
            eprover = KZGProverEvalForm(eparams, lag)
            evals = rand_mont(FR, nev)
            evars = [jnp.roll(evals, i + 1, axis=-1) for i in range(2)] + [evals]
            _note("eval form: commit")
            dt_c = _timeit(lambda v: eprover.commit(v), evars, iters=2)
            extras[f"commit_eval_form_seconds_2e{eval_log}"] = round(dt_c, 3)
            _note("eval form: create_witness (div_by_omega_i + MSM)")
            dt_w = _timeit(
                lambda v: eprover.create_witness(v, 5), evars, iters=2
            )
            extras[f"witness_eval_form_seconds_2e{eval_log}"] = round(dt_w, 3)
            del eparams, lag, eprover, evals, evars
        except Exception as e:  # noqa: BLE001 - record, don't kill the bench
            extras["eval_form_error"] = f"{type(e).__name__}: {e}"[:300]
            _note(f"eval form FAILED: {extras['eval_form_error']}")

    emit("complete")


if __name__ == "__main__":
    main()
