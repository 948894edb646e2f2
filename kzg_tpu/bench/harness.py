"""Benchmark harness mirroring the reference's criterion suite (SURVEY.md
§6: 8 bench groups over sizes 16..512) plus the BASELINE.json TPU configs
(2^10..2^24). Each bench compiles once, then times steady-state iterations
with block_until_ready — the JAX analog of criterion's warmup+sampling.

Run:  python -m kzg_tpu.bench.harness [--sizes 16,64,256] [--json out.json]
      python -m kzg_tpu.bench.harness --group fft --sizes 1024
Groups mirror the reference bench ids (benches/*.rs)."""

import argparse
import json
import time

import numpy as np


def _timeit(fn, iters=5):
    import jax

    out = fn()
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _rand_scalars(rng, n):
    import jax.numpy as jnp
    from ..fields import FR
    from ..constants import R

    return jnp.asarray(FR.encode([rng.randrange(R) for _ in range(n)]))


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
        x = _rand_scalars(rng, dom.d)
        results[f"fft/{dom.d}"] = _timeit(lambda: dom.ntt(x))
        results[f"ifft/{dom.d}"] = _timeit(lambda: dom.intt(x))


def bench_poly(sizes, rng, results):
    from ..poly import Polynomial, lagrange_interpolation

    for n in sizes:
        a = Polynomial(_rand_scalars(rng, n))
        b = Polynomial(_rand_scalars(rng, n))
        results[f"poly_add/{n}"] = _timeit(lambda: (a + b).coeffs)
        results[f"poly_mul_ntt/{n}"] = _timeit(lambda: a.best_mul(b).coeffs)
        if n <= 512:
            results[f"poly_long_division/{n}"] = _timeit(
                lambda: a.long_division(Polynomial(_rand_scalars(rng, n // 2)))[0].coeffs
            )
        k = min(n, 64)
        xs = _rand_scalars(rng, k)
        ys = _rand_scalars(rng, k)
        results[f"interpolation/{k}"] = _timeit(
            lambda: lagrange_interpolation(xs, ys).coeffs
        )


def bench_msm(sizes, rng, results):
    import jax
    from ..curve import G1
    from ..msm.pippenger import _msm_impl, pick_window
    from ..fields import FR

    for n in sizes:
        pts = _rand_points(n)
        s = _rand_scalars(rng, n)
        c = pick_window(n)
        run = jax.jit(lambda x, y, i, sc: _msm_impl(G1, x, y, i, FR.from_mont(sc), c))
        dt = _timeit(lambda: run(pts[0], pts[1], pts[2], s))
        results[f"msm_g1/{n}"] = dt
        results[f"msm_g1_points_per_sec/{n}"] = n / dt


def bench_commit(sizes, rng, results):
    from ..kzg import setup, KZGProver
    from ..poly import Polynomial

    for n in sizes:
        params = setup(69696969, n)
        prover = KZGProver(params)
        poly = Polynomial(_rand_scalars(rng, n))
        results[f"commit_coeff_form/{n}"] = _timeit(lambda: tuple(prover.commit(poly)))
        x = rng.randrange(1 << 62)
        y = poly.eval(x)
        results[f"create_witness_coeff_form/{n}"] = _timeit(
            lambda: tuple(prover.create_witness(poly, (x, y)))
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
        evals = _rand_scalars(rng, d)
        results[f"commit_eval_form/{d}"] = _timeit(lambda: tuple(prover.commit(evals)))
        results[f"create_witness_eval_form/{d}"] = _timeit(
            lambda: tuple(prover.create_witness(evals, 5))
        )


GROUPS = {
    "fft": bench_fft,
    "poly": bench_poly,
    "msm": bench_msm,
    "commit": bench_commit,
    "eval_form": bench_eval_form,
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
