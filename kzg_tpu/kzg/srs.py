"""Trusted setup: the SRS power ladders g^(s^i), h^(s^i).

The reference builds these with a serial chain of scalar multiplications
(lib.rs:38-55: curr = curr * s, inherently sequential). TPU-native design:

  1. powers s^0..s^(n-1) via a log-depth prefix product over Fr;
  2. one fixed-base windowed multi-scalar table per group: T[w][d] =
     (d * 2^(cw)) * G, built with batched prefix point-scans;
  3. every SRS element is then W-1 vectorised point additions of table
     gathers — total depth O(W + log n) instead of O(n).

Params are stored as affine coordinate batches (the form the MSM consumes)
and can be persisted with save/load (the checkpoint-subsystem analog of the
reference's serde_support feature, SURVEY.md §5.4).
"""

import os
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import R, LIMB_BITS
from ..fields import FR
from ..curve import G1, G2, g1_generator_device, g2_generator_device
from ..msm.pippenger import _digits

def _fb_window() -> int:
    from ..config import get_config

    return get_config().fixed_base_window


# kept as the historical default; the live value comes from config
FIXED_BASE_WINDOW = 8


@dataclass
class KZGParams:
    """SRS: gs = (x, y, inf) G1 affine batch of g^(s^i), i < n;
    hs = same over G2 (reference KZGParams, lib.rs:14-19)."""

    gs: tuple
    hs: tuple
    n: int

    def save(self, path: str):
        np.savez(
            path,
            g_x=np.asarray(self.gs[0]), g_y=np.asarray(self.gs[1]), g_i=np.asarray(self.gs[2]),
            h_x=np.asarray(self.hs[0]), h_y=np.asarray(self.hs[1]), h_i=np.asarray(self.hs[2]),
            n=self.n,
        )

    @classmethod
    def load(cls, path: str):
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        gs = tuple(jnp.asarray(z[k]) for k in ("g_x", "g_y", "g_i"))
        hs = tuple(jnp.asarray(z[k]) for k in ("h_x", "h_y", "h_i"))
        return cls(gs=gs, hs=hs, n=int(z["n"]))


def _fixed_base_table(curve, gen_point, c: int, w_count: int):
    """T[w][d] = (d << (c*w)) * G as an affine (x, y, inf) batch of
    shape (..., w_count, 2^c)."""
    b = 1 << c

    # bases g_w = 2^(cw) * G, built by c*w_count sequential doublings (cheap,
    # one lane) collected every c steps. The chain runs under lax.scan with
    # ONE traced doubling body — unrolling it in Python inlines hundreds of
    # group-law graphs (~10^3 HLOs each) and stalls XLA's compiler at
    # multi-GB memory.
    def chain(pt, _):
        nxt = jax.lax.fori_loop(0, c, lambda _i, q: curve.dbl(q), pt)
        return nxt, pt

    _, stacked = jax.lax.scan(chain, gen_point, None, length=w_count)
    # scan stacks on axis 0: (w_count, ..., 1) -> (..., w_count)
    base_batch = tuple(
        jnp.moveaxis(t, 0, -1)[..., 0, :] for t in stacked
    )

    # row for base B: [inf, B, 2B, ..., (b-1)B] via prefix point scan of a
    # constant-B batch
    rep = tuple(jnp.repeat(t[..., :, None], b - 1, axis=-1) for t in base_batch)
    # prefix scan: pre[j] = (j+1) * B
    n = b - 1
    idx = jnp.arange(n)

    def body(r, acc):
        s = jnp.left_shift(1, r)
        shifted = tuple(jnp.roll(t, s, axis=-1) for t in acc)
        added = curve.add(acc, shifted)
        return curve.select(idx >= s, added, acc)

    rounds = max(1, (n - 1).bit_length())
    pre = jax.lax.fori_loop(0, rounds, body, rep)
    inf_col = curve.infinity((w_count, 1))
    table = tuple(
        jnp.concatenate([ic, t], axis=-1) for ic, t in zip(inf_col, pre)
    )  # (..., w_count, b) jacobian
    return table


def _ladder_from_table(curve, table, digits):
    """SRS points: sum_w T[w][digit_w(s^i)] for every i, via W gathers+adds.
    digits: (W, n) int32."""
    w_count = digits.shape[0]
    n = digits.shape[-1]

    def body(w, acc):
        row = tuple(t[..., w, :] for t in table)
        d = digits[w]
        q = tuple(jnp.take(t, d, axis=-1) for t in row)
        return curve.add(acc, q)

    return jax.lax.fori_loop(0, w_count, body, curve.infinity((n,)))


_TABLE_CACHE = {}


def _table_cache_path(c: int, w_count: int) -> str:
    from ..config import get_config

    d = get_config().srs_cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".srs_cache")
    return os.path.join(d, f"fixed_base_c{c}_w{w_count}.npz")


@partial(jax.jit, static_argnums=(0, 1))
def _tables_jit(c: int, w_count: int):
    t1 = _fixed_base_table(G1, g1_generator_device(1), c, w_count)
    t2 = _fixed_base_table(G2, g2_generator_device(1), c, w_count)
    return t1, t2


def _mont_point_int(x_limbs) -> int:
    """Host-side Montgomery Fp limbs (L,) -> standard integer."""
    from ..constants import P
    from ..fields import FP

    v = 0
    for i in range(FP.L):
        v |= int(x_limbs[i]) << (LIMB_BITS * i)
    return v * pow(FP.mont_r, -1, P) % P


def _validate_tables(t1, t2, c: int, w_count: int) -> bool:
    """Integrity check for disk-loaded fixed-base tables: every downstream
    SRS derives from these, so a stale/corrupt/tampered cache blob would
    silently produce a wrong SRS. Verifies shapes, the d == 0 infinity
    column (z == 0), and spot-checks sampled Jacobian entries
    T[w][d] == (d<<cw)*G against the pure-Python oracle — all host-side
    integer math, no device compile."""
    from ..fields import FP
    from ..oracle import g1_generator, g2_generator, ec_mul
    from ..oracle.field import Fp as OFp, Fp2 as OFp2

    b = 1 << c
    try:
        t1_np = tuple(np.asarray(t) for t in t1)
        t2_np = tuple(np.asarray(t) for t in t2)
        for t in t1_np:
            if t.shape != (FP.L, w_count, b):
                return False
        for t in t2_np:
            if t.shape != (FP.L, 2, w_count, b):
                return False
        # d == 0 column must be infinity (z == 0), nothing else may be
        if t1_np[2][:, :, 0].any() or t2_np[2][:, :, :, 0].any():
            return False
        if (~t1_np[2][:, :, 1:].any(axis=0)).any():
            return False

        def g1_entry(w, d):
            x = OFp(_mont_point_int(t1_np[0][:, w, d]))
            y = OFp(_mont_point_int(t1_np[1][:, w, d]))
            z = OFp(_mont_point_int(t1_np[2][:, w, d]))
            zi = z.inv()
            zi2 = zi.square()
            return (x * zi2, y * (zi2 * zi))

        def g2_entry(w, d):
            def f2(arr):
                return OFp2(
                    OFp(_mont_point_int(arr[:, 0, w, d])),
                    OFp(_mont_point_int(arr[:, 1, w, d])),
                )

            x, y, z = f2(t2_np[0]), f2(t2_np[1]), f2(t2_np[2])
            zi = z.inv()
            zi2 = zi.square()
            return (x * zi2, y * (zi2 * zi))

        # expected values via the native engine when available (ms), else the
        # pure-Python oracle (seconds); scalars reduced mod r — same point
        from .. import native

        if native.available():
            mul1 = lambda k: native.g1_mul(g1_generator(), k)  # noqa: E731
            mul2 = lambda k: native.g2_mul(g2_generator(), k)  # noqa: E731
        else:
            mul1 = lambda k: ec_mul(g1_generator(), k)  # noqa: E731
            mul2 = lambda k: ec_mul(g2_generator(), k)  # noqa: E731
        samples = {(0, 1), (w_count - 1, b - 1), (w_count // 2, min(3, b - 1))}
        for w, d in samples:
            k = (d << (c * w)) % R
            if g1_entry(w, d) != mul1(k):
                return False
            if g2_entry(w, d) != mul2(k):
                return False
        return True
    except Exception:  # noqa: BLE001 - malformed blob == invalid
        return False


def _tables_digest(t1, t2) -> str:
    import hashlib

    h = hashlib.sha256()
    for t in (*t1, *t2):
        h.update(np.ascontiguousarray(np.asarray(t)).tobytes())
    return h.hexdigest()


def fixed_base_tables(c: int, w_count: int):
    """The G1/G2 fixed-base window tables T[w][d] = (d << cw) * G.

    These depend only on the curve GENERATORS (not the secret), so they are
    computed once and disk-cached (~7 MB): rebuilding costs minutes of
    device math. Loaded blobs are integrity-checked against the oracle
    (generator entry + sampled (d<<cw)*G entries) and rebuilt when invalid;
    the slow setup-parity test validates the table path end to end."""
    key = (c, w_count)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    path = _table_cache_path(c, w_count)
    loaded = False
    if os.path.exists(path):
        try:
            z = np.load(path)
            # validate on the HOST copies before any jnp.asarray: the digest
            # and spot checks must not round-trip 7 MB through the device
            t1_np = tuple(z[f"t1_{i}"] for i in range(3))
            t2_np = tuple(z[f"t2_{i}"] for i in range(3))
            # content hash catches any corruption (bit flips anywhere); the
            # sampled oracle checks catch a recomputed-but-wrong blob
            if "digest" in z.files and str(z["digest"]) != _tables_digest(t1_np, t2_np):
                loaded = False
            else:
                loaded = _validate_tables(t1_np, t2_np, c, w_count)
            if loaded:
                t1 = tuple(jnp.asarray(t) for t in t1_np)
                t2 = tuple(jnp.asarray(t) for t in t2_np)
        except Exception:  # noqa: BLE001 - unreadable blob -> rebuild
            loaded = False
        if not loaded:
            import warnings

            warnings.warn(
                f"fixed-base table cache {path} failed integrity validation; "
                "rebuilding",
                stacklevel=2,
            )
    if not loaded:
        t1, t2 = _tables_jit(c, w_count)
        jax.block_until_ready((t1, t2))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        t1_np = tuple(np.asarray(t) for t in t1)  # single device fetch
        t2_np = tuple(np.asarray(t) for t in t2)
        np.savez(
            path,
            **{f"t1_{i}": t for i, t in enumerate(t1_np)},
            **{f"t2_{i}": t for i, t in enumerate(t2_np)},
            digest=_tables_digest(t1_np, t2_np),
        )
    _TABLE_CACHE[key] = (t1, t2)
    return t1, t2


@partial(jax.jit, static_argnums=0)
def _ladders_from_tables_jit(c: int, digits, t1, t2):
    gs = _ladder_from_table(G1, t1, digits)
    hs = _ladder_from_table(G2, t2, digits)
    return G1.to_affine(gs), G2.to_affine(hs)


def _ladders_jit(c: int, digits):
    """Both fixed-base ladders (G1 and G2) for a (W, n) digit array,
    returned in affine form. Shared by setup() and the Lagrange-SRS
    fast path. Tables come from the process/disk cache."""
    t1, t2 = fixed_base_tables(c, digits.shape[0])
    return _ladders_from_tables_jit(c, digits, t1, t2)


@partial(jax.jit, static_argnums=(0, 1))
def _setup_digits_jit(n: int, c: int, s_mont):
    """Window digits of the powers s^0 .. s^(n-1)."""
    sb = jnp.broadcast_to(s_mont, (FR.L, n))
    pw = FR.prefix_mul(sb)
    powers = jnp.concatenate([FR.one((1,)), pw[:, : n - 1]], axis=1)
    return _digits(FR.from_mont(powers), c)


def _host_engine_preferred() -> bool:
    """Engine choice for setup(). Consults config.setup_engine:
    "host"/"device" force a path; "auto" builds the SRS with the native host
    engine (the blst role) on CPU backends instead of compiling the device
    ladder graphs — XLA-CPU takes minutes to compile them per shape on small
    hosts — and uses the device ladders on accelerator backends. The device
    ladders are pinned against the host engine by the slow setup-parity
    test. KZG_TPU_DEVICE_SETUP=1 still forces the device path at call time
    (back-compat; config reads it once at import)."""
    from ..config import get_config

    engine = get_config().setup_engine
    if os.environ.get("KZG_TPU_DEVICE_SETUP"):
        engine = "device"
    if engine == "device":
        return False
    from .. import native

    if engine == "host":
        if not native.available():
            from ..native import NativeError

            raise NativeError(
                "setup_engine='host' but the native engine is unavailable "
                "(kzg_native.so not built?)"
            )
        return True
    try:
        if jax.default_backend() != "cpu":
            return False
    except Exception:  # noqa: BLE001
        return False
    return native.available()


def _setup_host(s: int, num_coeffs: int) -> KZGParams:
    from .. import native
    from ..curve import g1_to_device, g2_to_device
    from ..oracle import g1_generator, g2_generator

    gpts = native.g1_powers(g1_generator(), s % R, num_coeffs)
    hpts = native.g2_powers(g2_generator(), s % R, num_coeffs)
    gx, gy, gz = g1_to_device(gpts)
    hx, hy, hz = g2_to_device(hpts)
    # to affine (x, y, inf) form: host points are already affine, z==1
    ginf = np.array([p is None for p in gpts])
    hinf = np.array([p is None for p in hpts])
    gs = (jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(ginf))
    hs = (jnp.asarray(hx), jnp.asarray(hy), jnp.asarray(hinf))
    return KZGParams(gs=gs, hs=hs, n=num_coeffs)


def setup(s: int, num_coeffs: int) -> KZGParams:
    """Build an SRS for polynomials with up to num_coeffs coefficients from
    the secret s (reference setup(), lib.rs:38-55)."""
    if _host_engine_preferred():
        return _setup_host(s, num_coeffs)
    return setup_device(s, num_coeffs)


@partial(jax.jit, static_argnums=(0, 1))
def _setup_digits_chunk_jit(n: int, c: int, s_mont, base_mont):
    """Window digits of base * s^0 .. base * s^(n-1) (one chunk of the
    global power ladder: base = s^(chunk_start))."""
    sb = jnp.broadcast_to(s_mont, (FR.L, n))
    pw = FR.prefix_mul(sb)  # s^1 .. s^n
    powers = jnp.concatenate([FR.one((1,)), pw[:, : n - 1]], axis=1)
    return _digits(FR.from_mont(FR.mul(powers, base_mont)), c)


@partial(jax.jit, static_argnums=0)
def _g1_ladder_jit(c: int, digits, t1):
    return G1.to_affine(_ladder_from_table(G1, t1, digits))


@partial(jax.jit, static_argnums=0)
def _g2_ladder_jit(c: int, digits, t2):
    return G2.to_affine(_ladder_from_table(G2, t2, digits))


def setup_device(
    s: int, num_coeffs: int, g2_count: int | None = None
) -> KZGParams:
    """Accelerator-path SRS build: log-depth power scan + fixed-base
    windowed ladders (see module docstring).

    g2_count limits how many G2 powers h^(s^i) are built (default: all
    num_coeffs, reference lib.rs:48-52 parity). Production proving at the
    2^24 north-star needs only hs[0..1] (verify_eval) — a full G2 ladder
    there would double the build cost and add ~6.4 GB of HBM for points the
    prover never touches; pass g2_count=2. Batched verification at k points
    needs g2_count >= k+1 (coeff_form.rs:161-166).

    Above 2^msm_chunk_log points the G1 ladder is built in CHUNKS (digits +
    gather-adds per 2^chunk_log powers): the one-shot digit array alone is
    (W, n) int32 = 2 GB at 2^24/c=8 and the Jacobian intermediates ~5 GB,
    which with the output SRS would overflow the chip; per-chunk peak
    memory is flat in n."""
    from ..config import get_config

    s_mont = jnp.asarray(FR.encode([s % R]))
    w = _fb_window()
    if g2_count is None:
        g2_count = num_coeffs
    chunk = 1 << get_config().msm_chunk_log
    if num_coeffs <= chunk and g2_count == num_coeffs:
        digits = _setup_digits_jit(num_coeffs, w, s_mont)
        gs, hs = _ladders_jit(w, digits)
        return KZGParams(gs=gs, hs=hs, n=num_coeffs)
    # chunked G1 ladder + separate (small) G2 ladder
    w_count = -(-FR.L * LIMB_BITS // w)
    t1, t2 = fixed_base_tables(w, w_count)
    gs_parts = []
    for off in range(0, num_coeffs, chunk):
        cn = min(chunk, num_coeffs - off)
        base = jnp.asarray(FR.encode([pow(s % R, off, R)]))
        digits = _setup_digits_chunk_jit(cn, w, s_mont, base)
        part = _g1_ladder_jit(w, digits, t1)
        jax.block_until_ready(part)
        gs_parts.append(part)
    gs = tuple(
        jnp.concatenate([p[i] for p in gs_parts], axis=-1) for i in range(3)
    )
    digits2 = _setup_digits_jit(g2_count, w, s_mont)
    hs = _g2_ladder_jit(w, digits2, t2)
    return KZGParams(gs=gs, hs=hs, n=num_coeffs)


def csprng_setup(num_coeffs: int) -> KZGParams:
    """Random setup from OS entropy (reference csprng_setup, lib.rs:60-64)."""
    s = int.from_bytes(os.urandom(48), "little") % R
    return setup(s, num_coeffs)
