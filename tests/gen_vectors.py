"""Golden-vector generator (run once; output committed as vectors.json).

Produces fixed byte vectors for the BASELINE.json configs at CI-friendly
degrees, using ONLY the native C++ engine + host integer math (no JAX, no
compiles). With the setup secret s known, every protocol value has a closed
form over Fr ints:

    C          = f(s) * G
    w(x, y)    = q(s) * G,  q(s) = (f(s) - y) / (s - x)
    batched w  = psi(s) * G, psi(s) = (f(s) - r(s)) / Z(s)
    eval C     = sum_i e_i L_i(s) * G = f_evals(s) * G

so the vectors pin (a) the native engine's curve arithmetic, (b) the ZCash
serialization codecs, and (c) the protocol algebra — independently of the
TPU compute path (whose parity with the host engine is covered by the
differential test suites).

Inputs are derived from a fixed seed the same way the reference's tests
seed SmallRng (coeff_form.rs:191: [69; 32]; values here use Python's
random.Random(69) — documented, reproducible, implementation-independent).

Provenance & external anchoring (VERDICT r2 missing #3): no Rust toolchain
exists in this environment (cargo/rustc absent), so the vectors cannot be
regenerated through the Rust reference itself. The chain of custody to the
reference is instead:

  1. the G1/G2 GENERATOR compressed encodings in vectors.json are the
     IETF/ZCash BLS12-381 standard values (draft-irtf-cfrg-pairing-friendly
     -curves §4.2.1; the same bytes blstrs' G1Affine::generator() emits) —
     externally pinned, not self-attested;
  2. compat/serialize.py implements the ZCash flag-bit spec that blstrs
     uses for all byte I/O, and test_compat pins flag/edge semantics
     (infinity, sign bit, non-canonical rejection);
  3. everything else is closed-form Fr integer math over those anchors.

Running the Rust reference on these seeds on any cargo-equipped host and
diffing the hex against vectors.json is a one-file exercise (the seed
stream is plain random.Random(69).randrange(r)); the vectors were designed
so that exercise needs no code from this repo.

Usage:  python tests/gen_vectors.py  (writes tests/vectors.json)
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kzg_tpu import native  # noqa: E402
from kzg_tpu.constants import R  # noqa: E402
from kzg_tpu.ntt.domain import compute_omega  # noqa: E402
from kzg_tpu.oracle import g1_generator, g2_generator  # noqa: E402

SECRET = 0x5EED_1DEA_F00D % R


def poly_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


def interpolate_eval(xs, ys, at):
    """r(at) for the interpolant through (xs, ys) — barycentric, host ints."""
    total = 0
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        num = den = 1
        for j, xj in enumerate(xs):
            if j == i:
                continue
            num = num * ((at - xj) % R) % R
            den = den * ((xi - xj) % R) % R
        total = (total + yi * num % R * pow(den, -1, R)) % R
    return total


def g1_hex(k):
    return native.g1_compress(native.g1_mul(g1_generator(), k % R)).hex()


def g2_hex(k):
    return native.g2_compress(native.g2_mul(g2_generator(), k % R)).hex()


def main():
    assert native.available(), "native engine required to generate vectors"
    rng = random.Random(69)
    out = {"secret": hex(SECRET), "seed": 69, "configs": {}}

    # --- config 1 (scaled): coeff form, degree 2^10 - 1 ------------------
    n = 1 << 10
    coeffs = [rng.randrange(R) for _ in range(n)]
    fs = poly_eval(coeffs, SECRET)
    x = rng.randrange(R)
    y = poly_eval(coeffs, x)
    qs = (fs - y) * pow((SECRET - x) % R, -1, R) % R
    out["configs"]["coeff_2e10"] = {
        "n": n,
        "commit": g1_hex(fs),
        "open_x": hex(x),
        "open_y": hex(y),
        "witness": g1_hex(qs),
        "verify": True,
    }

    # --- config 3 (scaled): batched opening, 16 points on 2^8 poly -------
    n = 1 << 8
    k = 16
    coeffs = [rng.randrange(R) for _ in range(n)]
    fs = poly_eval(coeffs, SECRET)
    xs = [rng.randrange(R) for _ in range(k)]
    ys = [poly_eval(coeffs, xv) for xv in xs]
    rs = interpolate_eval(xs, ys, SECRET)
    zs = 1
    for xv in xs:
        zs = zs * ((SECRET - xv) % R) % R
    psis = (fs - rs) * pow(zs, -1, R) % R
    out["configs"]["batched_2e8_k16"] = {
        "n": n,
        "k": k,
        "xs": [hex(v) for v in xs],
        "commit": g1_hex(fs),
        "witness": g1_hex(psis),
        "h_z": g2_hex(zs),
        "g_r": g1_hex(rs),
        "verify": True,
    }

    # --- config 2 (scaled): eval form, domain 2^7 ------------------------
    exp = 7
    d = 1 << exp
    omega, _, _ = compute_omega(d)
    evals = [rng.randrange(R) for _ in range(d)]
    # f(s) = sum_i evals_i * L_i(s),  L_i(s) = omega^i (s^d - 1)/(d (s - omega^i))
    sd = (pow(SECRET, d, R) - 1) % R
    dinv = pow(d, -1, R)
    fs = 0
    wi = 1
    for i in range(d):
        li = sd * wi % R * pow((SECRET - wi) % R, -1, R) % R * dinv % R
        fs = (fs + evals[i] * li) % R
        wi = wi * omega % R
    # witness at index m: q = (f - f(omega^m)) / (X - omega^m) evaluated at s
    m = 5
    wm = pow(omega, m, R)
    ym = None
    # f(omega^m) is just evals[m] (evaluation form)
    ym = evals[m]
    qs = (fs - ym) * pow((SECRET - wm) % R, -1, R) % R
    out["configs"]["eval_2e7"] = {
        "exp": exp,
        "index": m,
        "y": hex(ym),
        "commit": g1_hex(fs),
        "witness": g1_hex(qs),
        "verify": True,
    }

    # --- generator encodings (published constants, compat anchors) --------
    out["generators"] = {"g1": g1_hex(1), "g2": g2_hex(1)}

    path = os.path.join(os.path.dirname(__file__), "vectors.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
