"""Benchmark harness mirroring the reference's criterion suite (SURVEY.md
§6: 8 bench groups over sizes 16..512) plus the BASELINE.json TPU configs
(2^10..2^24). Each bench compiles once, then times steady-state iterations
with block_until_ready — the JAX analog of criterion's warmup+sampling.

Timing is CACHE-SAFE: every iteration runs with DIFFERENT inputs and every
result is fetched, because repeated executions with identical inputs can be
served from a cache by the remote-device tunnel, producing physically
impossible rates (the trap bench.py documents and avoids the same way).

Reference bench-group parity (benches/*.rs):
  fft        -> bench_fft/bench_ifft                (benches/fft.rs:15-36)
  poly       -> add/mul_naive/mul_fft/long_division/interpolation
                                                    (benches/poly_arithmetic.rs:16-68)
  msm        -> no reference analog (blst-internal); the headline primitive
  commit     -> commit/create_witness coeff form    (benches/commit_coeff_form.rs,
                                                     benches/create_witness_coeff_form.rs)
  eval_form  -> commit/create_witness eval form     (benches/commit_eval_form.rs,
                                                     benches/create_witness_eval_form.rs)
  verify     -> verify_poly/verify_eval coeff form  (benches/poly_verify_coeff_form.rs:17-45,
                                                     benches/verify_eval_coeff_form.rs:18-53)

Run:  python -m kzg_tpu.bench.harness [--sizes 16,64,256] [--json out.json]
      python -m kzg_tpu.bench.harness --group fft --sizes 1024
"""

import argparse
import json
import time

import numpy as np

ITERS = 5


def _timeit(fn, iters=ITERS):
    """Time fn(i) for i = 1..iters after a warmup call fn(0).

    fn MUST return different work per i (callers pass per-iteration input
    variants); every result is synced so nothing is served from a stale
    async handle or the tunnel's same-input cache."""
    import jax

    out = fn(0)
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    outs = [fn(1 + (i % iters)) for i in range(iters)]
    for o in outs:
        jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def _rand_scalars(rng, n):
    import jax.numpy as jnp
    from ..fields import FR
    from ..constants import R

    return jnp.asarray(FR.encode([rng.randrange(R) for _ in range(n)]))


def _scalar_variants(x, k=ITERS):
    """k+1 distinct device copies (cyclic rolls) of a scalar batch, synced —
    the per-iteration inputs that keep the tunnel cache out of the timing."""
    import jax
    import jax.numpy as jnp

    vs = [jnp.roll(x, i, axis=-1) if i else x for i in range(k + 1)]
    jax.block_until_ready(vs)
    return vs


def _rand_points(n, seed=42):
    """n pseudorandom G1 points: k*G via the batched ladder (host-cheap)."""
    import jax.numpy as jnp
    from ..curve import G1, g1_generator_device

    rng = np.random.default_rng(seed)
    ks = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    bits = ((ks[None, :] >> np.arange(30)[:, None]) & 1).astype(np.uint32)
    return G1.to_affine(G1.scalar_mul_bits(g1_generator_device(n), jnp.asarray(bits)))


def bench_fft(sizes, rng, results):
    from ..ntt import Domain

    for n in sizes:
        exp = (n - 1).bit_length()
        dom = Domain(exp)
        xs = _scalar_variants(_rand_scalars(rng, dom.d))
        results[f"fft/{dom.d}"] = _timeit(lambda i: dom.ntt(xs[i]))
        results[f"ifft/{dom.d}"] = _timeit(lambda i: dom.intt(xs[i]))


def bench_poly(sizes, rng, results):
    from ..poly import Polynomial, lagrange_interpolation

    for n in sizes:
        avs = _scalar_variants(_rand_scalars(rng, n))
        bvs = _scalar_variants(_rand_scalars(rng, n))
        polys_a = [Polynomial(a) for a in avs]
        polys_b = [Polynomial(b) for b in bvs]
        results[f"poly_add/{n}"] = _timeit(
            lambda i: (polys_a[i] + polys_b[i]).coeffs
        )
        results[f"poly_mul_fft/{n}"] = _timeit(
            lambda i: polys_a[i].best_mul(polys_b[i]).coeffs
        )
        if n <= 256:
            # naive O(n^2) mul — the reference's bench_mul_naive comparison
            # (poly_arithmetic.rs:28-38); kept small, it is the slow oracle
            results[f"poly_mul_naive/{n}"] = _timeit(
                lambda i: polys_a[i].naive_mul(polys_b[i]).coeffs
            )
        if n <= 512:
            divs = [Polynomial(v) for v in _scalar_variants(_rand_scalars(rng, n // 2))]
            results[f"poly_long_division/{n}"] = _timeit(
                lambda i: polys_a[i].long_division(divs[i])[0].coeffs
            )
        k = min(n, 64)
        xvs = _scalar_variants(_rand_scalars(rng, k))
        yvs = _scalar_variants(_rand_scalars(rng, k))
        results[f"interpolation/{k}"] = _timeit(
            lambda i: lagrange_interpolation(xvs[i], yvs[i]).coeffs
        )


def bench_msm(sizes, rng, results):
    import jax
    from ..curve import G1
    from ..msm.pippenger import _msm_impl, pick_window
    from ..fields import FR

    for n in sizes:
        pts = _rand_points(n)
        svs = _scalar_variants(_rand_scalars(rng, n))
        c = pick_window(n)
        run = jax.jit(lambda x, y, i, sc: _msm_impl(G1, x, y, i, FR.from_mont(sc), c))
        dt = _timeit(lambda i: run(pts[0], pts[1], pts[2], svs[i]))
        results[f"msm_g1/{n}"] = dt
        results[f"msm_g1_points_per_sec/{n}"] = n / dt


def bench_commit(sizes, rng, results):
    from ..kzg import setup, KZGProver
    from ..poly import Polynomial

    for n in sizes:
        params = setup(69696969, n)
        prover = KZGProver(params)
        polys = [Polynomial(v) for v in _scalar_variants(_rand_scalars(rng, n))]
        results[f"commit_coeff_form/{n}"] = _timeit(
            lambda i: tuple(prover.commit(polys[i]))
        )
        pts = [(x := rng.randrange(1 << 62), polys[i].eval(x)) for i in range(ITERS + 1)]
        results[f"create_witness_coeff_form/{n}"] = _timeit(
            lambda i: tuple(prover.create_witness(polys[i], pts[i]))
        )


def bench_eval_form(sizes, rng, results):
    from ..kzg import setup, compute_lagrange_basis_from_secret
    from ..kzg.eval_form import KZGProverEvalForm

    for n in sizes:
        exp = (n - 1).bit_length()
        d = 1 << exp
        params = setup(69696969, d)
        lag = compute_lagrange_basis_from_secret(69696969, exp)
        prover = KZGProverEvalForm(params, lag)
        evs = _scalar_variants(_rand_scalars(rng, d))
        results[f"commit_eval_form/{d}"] = _timeit(lambda i: tuple(prover.commit(evs[i])))
        results[f"create_witness_eval_form/{d}"] = _timeit(
            lambda i: tuple(prover.create_witness(evs[i], 5))
        )


def bench_verify(sizes, rng, results):
    """verify_poly + verify_eval, coefficient form (reference
    poly_verify_coeff_form.rs:17-45, verify_eval_coeff_form.rs:18-53)."""
    from ..kzg import setup, KZGProver, KZGVerifier
    from ..poly import Polynomial

    for n in sizes:
        params = setup(69696969, n)
        prover = KZGProver(params)
        verifier = KZGVerifier(params)
        polys = [Polynomial(v) for v in _scalar_variants(_rand_scalars(rng, n))]
        commits = [prover.commit(p) for p in polys]
        results[f"verify_poly_coeff_form/{n}"] = _timeit(
            lambda i: verifier.verify_poly(commits[i], polys[i])
        )
        opens = []
        for i in range(ITERS + 1):
            x = rng.randrange(1 << 62)
            y = polys[i].eval(x)
            opens.append(((x, y), commits[i], prover.create_witness(polys[i], (x, y))))
        results[f"verify_eval_coeff_form/{n}"] = _timeit(
            lambda i: verifier.verify_eval(*opens[i])
        )


GROUPS = {
    "fft": bench_fft,
    "poly": bench_poly,
    "msm": bench_msm,
    "commit": bench_commit,
    "eval_form": bench_eval_form,
    "verify": bench_verify,
}


class TraceProfiler:
    """Per-group profiler hook: the jax.profiler analog of the reference's
    criterion FlamegraphProfiler (benches/perf.rs:40-72 wraps pprof and
    writes flamegraph.svg per bench). Here each bench group is wrapped in a
    jax.profiler trace whose Perfetto/XProf dump lands in
    <dir>/<group>/ — inspect with `xprof` or ui.perfetto.dev."""

    def __init__(self, base_dir):
        self.base_dir = base_dir

    def run(self, name, fn, *args):
        import os

        import jax

        if self.base_dir is None:
            return fn(*args)
        d = os.path.join(self.base_dir, name)
        os.makedirs(d, exist_ok=True)
        with jax.profiler.trace(d):
            return fn(*args)


def main():
    import random

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,64,128,256")
    ap.add_argument("--group", default="all", choices=["all"] + list(GROUPS))
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--profile-dir",
        default=None,
        help="write a jax.profiler trace per bench group under this dir "
        "(the flamegraph hook of the reference, benches/perf.rs)",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    rng = random.Random(42)
    profiler = TraceProfiler(args.profile_dir)

    results = {}
    for name, fn in GROUPS.items():
        if args.group not in ("all", name):
            continue
        profiler.run(name, fn, sizes, rng, results)
    for k, v in results.items():
        unit = "points/s" if "per_sec" in k else "s"
        print(f"{k:40s} {v:12.6g} {unit}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
