"""Dense polynomial algebra over Fr — TPU-native redesign of the reference's
polynomial layer (reference src/polynomial.rs: Polynomial #2, long_division
#3, fft_mul/best_mul #4, SubProductTree & fast multipoint #5, op_tree #6).

Representation: coefficients as (16, n) Montgomery Fr limb arrays (limb axis
leading, coefficient index on the lanes), with the degree tracked as a host
Python int — degree is static per compilation, matching the reference's
explicitly-tracked-degree design (polynomial.rs:24-27) while keeping every
kernel shape static for XLA.

Algorithm choices (TPU-first, not translations):
  * multiplication is NTT-based at every size that fits a domain (the
    reference's naive-vs-FFT threshold, polynomial.rs:13, is a CPU artifact;
    a naive fallback is kept for parity testing);
  * division by (X - x) is a log-depth suffix scan (q_j = sum_{i>j} f_i
    x^{i-j-1}) instead of the reference's sequential synthetic division;
  * general long division is a lax.scan schoolbook (one compiled body,
    correct for any operands) — the protocol's hot exact-division path uses
    coset evaluation division instead (see kzg/coeff_form.py);
  * multipoint evaluation and Lagrange interpolation are O(k^2)-work but
    O(log)-depth vectorised formulas over the point batch, which beats tree
    recursion on a vector machine for the protocol's batch sizes.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import R
from ..fields import FR
from ..ntt import Domain

# --------------------------------------------------------------------------
# jitted kernels (module-level, shape-specialised on first use)
# --------------------------------------------------------------------------


@jax.jit
def _poly_add(a, b):
    return FR.add(a, b)


@jax.jit
def _poly_sub(a, b):
    return FR.sub(a, b)


def _pad_to(c, n):
    if c.shape[-1] == n:
        return c
    pad = ((0, 0),) * (c.ndim - 1) + ((0, n - c.shape[-1]),)
    return jnp.pad(c, pad)


def _mul_ntt(a, b, out_len: int):
    """Product of coefficient arrays via NTT (reference fft_mul semantics,
    polynomial.rs:167-183). Batched over any leading dims."""
    exp = max(1, (out_len - 1).bit_length())
    dom = Domain(exp)
    fa = dom.ntt(_pad_to(a, dom.d))
    fb = dom.ntt(_pad_to(b, dom.d))
    return dom.intt(FR.mul(fa, fb))[..., :out_len]


@jax.jit
def _mul_naive(a, b):
    """Schoolbook product via scan over the shorter operand (parity oracle
    for _mul_ntt, mirroring the reference's naive Mul polynomial.rs:473-487)."""
    if b.shape[-1] > a.shape[-1]:
        a, b = b, a
    na, nb = a.shape[-1], b.shape[-1]
    out_len = na + nb - 1
    apad = _pad_to(a, out_len)

    def body(acc, j_and_coeff):
        j, coeff = j_and_coeff
        shifted = jnp.roll(apad, j, axis=-1)
        acc = FR.add(acc, FR.mul(shifted, coeff[..., None]))
        return acc, None

    js = jnp.arange(nb)
    coeffs_b = jnp.moveaxis(b, -1, 0)  # (nb, L, ...)
    acc, _ = jax.lax.scan(
        lambda acc, jc: body(acc, jc),
        FR.zeros(apad.shape[1:]),
        (js, coeffs_b),
    )
    return acc


@jax.jit
def _eval_many(coeffs, pts):
    """Evaluate one polynomial (L, n) at many points (L, k) -> (L, k).

    Chunked power method: inner dot over a 4096-wide power table, outer
    lax.scan over chunks (Horner in X^4096). Depth O(n/4096 + log);
    the table is (L, k, 4096) — small even for many points."""
    n = coeffs.shape[-1]
    k = pts.shape[-1]
    c = min(4096, n)
    npad = -(-n // c) * c
    coeffs = _pad_to(coeffs, npad)
    # power table pts^0 .. pts^(c-1): (L, k, c)
    base = jnp.broadcast_to(pts[..., None], (FR.L, k, c))
    pw = FR.prefix_mul(base)
    powers = jnp.concatenate([FR.one((k, 1)), pw[..., : c - 1]], axis=-1)
    x_c = pw[..., c - 1]  # pts^c  (L, k)
    chunks = coeffs.reshape(FR.L, npad // c, c)
    chunks = jnp.moveaxis(chunks, 1, 0)[::-1]  # (nchunks, L, c), high-to-low

    def body(acc, chunk):
        inner = FR.sum_last(FR.mul(chunk[:, None, :], powers))  # (L, k)
        return FR.add(FR.mul(acc, x_c), inner), None

    acc, _ = jax.lax.scan(body, FR.zeros((k,)), chunks)
    return acc


@jax.jit
def _div_by_linear(f, x):
    """Quotient and remainder of f / (X - x) where x is (L, 1) or (L, k).

    q_j = sum_{i>j} f_i x^{i-j-1} computed as a log-depth suffix scan:
    q_j = xinv^{j+1} * suffix_sum(f_i x^i)_{j+1}; the x == 0 column falls
    back to a coefficient shift. Remainder = f(x).
    Batched: x with k columns divides the same f by k linear factors,
    returning (L, k, n-1) quotients and (L, k) remainders."""
    n = f.shape[-1]
    k = x.shape[-1]
    xb = jnp.broadcast_to(x[..., None], (FR.L, k, n))
    pw = FR.prefix_mul(xb)  # x^1..x^n
    powx = jnp.concatenate([FR.one((k, 1)), pw[..., : n - 1]], axis=-1)
    t = FR.mul(f[:, None, :], powx)  # f_i x^i
    s = FR.prefix_add(t, reverse=True)  # suffix sums, inclusive
    rem = s[..., 0]  # f(x)
    xinv = FR.batch_inv(x)
    pwinv = FR.prefix_mul(jnp.broadcast_to(xinv[..., None], (FR.L, k, n - 1)))
    q = FR.mul(s[..., 1:], pwinv)
    # x == 0: quotient is f shifted down one
    zero = FR.is_zero(x)[None, :, None]
    qz = jnp.broadcast_to(f[:, None, 1:], q.shape)
    q = jnp.where(zero, qz, q)
    return q, rem


@partial(jax.jit, static_argnums=(2,))
def _div_by_linear_big(f, x, chunk_log: int):
    """Memory-bounded `_div_by_linear` for a SINGLE divisor (k == 1).

    The one-shot suffix-scan formulation materialises ~8 full-length
    (L, n) temporaries; at the 2^24 north star that is ~8 GB on top of the
    resident SRS and OOMs the chip (measured: the round-3 bench e2e witness
    phase died RESOURCE_EXHAUSTED). This variant scans 2^chunk_log-wide
    chunks high-to-low with a Horner carry, so live temporaries are O(chunk)
    while the output quotient is still one (L, n-1) array:

      q_{cm+jl} = xinv^{jl+1} * V_c[jl+1]  +  x^{m-1-jl} * C_{c+1}
      V_c[j]    = sum_{i>=j, in chunk} f_i x^i          (local suffix sum)
      C_c       = V_c[0] + x^m * C_{c+1}                (value of f's tail)

    with rem = C_0 = f(x). x == 0 falls back to the coefficient shift, as
    in `_div_by_linear`."""
    n = f.shape[-1]
    m = 1 << chunk_log
    npad = -(-n // m) * m
    fp = _pad_to(f, npad)
    nch = npad // m
    chunks = jnp.moveaxis(fp.reshape(FR.L, nch, m), 1, 0)[::-1]  # high->low

    xrow = jnp.broadcast_to(x, (FR.L, m))
    pw = FR.prefix_mul(xrow)  # x^1 .. x^m
    powx = jnp.concatenate([FR.one((1,)), pw[..., : m - 1]], axis=-1)
    xm = pw[..., m - 1]  # (L,)
    xinv = FR.batch_inv(x)  # (L, 1); inv(0) = 0 keeps everything finite
    pwinv = FR.prefix_mul(jnp.broadcast_to(xinv, (FR.L, m)))  # xinv^1..xinv^m
    powrev = jnp.flip(powx, -1)  # x^(m-1) .. x^0

    def body(carry, fc):
        u = FR.mul(fc, powx)
        v = FR.prefix_add(u, reverse=True)  # inclusive suffix sums
        vexcl = jnp.concatenate([v[..., 1:], FR.zeros((1,))], axis=-1)
        qc = FR.add(FR.mul(pwinv, vexcl), FR.mul(powrev, carry[..., None]))
        new_carry = FR.add(v[..., 0], FR.mul(xm, carry))
        return new_carry, qc

    rem, qs = jax.lax.scan(body, FR.zeros(()), chunks)
    q = jnp.moveaxis(qs[::-1], 0, 1).reshape(FR.L, npad)
    nq = max(n - 1, 1)
    q = q[..., :nq]
    # x == 0: quotient is f shifted down one
    zero = FR.is_zero(x)[None, :, None]  # (1, 1, 1)
    q = jnp.where(zero[:, 0], _pad_to(f[..., 1:], nq), q)
    return q[:, None, :], rem[..., None]


@partial(jax.jit, static_argnums=(1,))
def _div_stream_consts(x, chunk_log: int):
    """Per-divisor constants for the STREAMED linear division (the chunk
    recurrence of `_div_by_linear_big`, factored out so the protocol layer
    can interleave each quotient chunk with its MSM partial instead of
    materialising the full (L, n-1) quotient — the r3 2^24 witness OOM,
    VERDICT item 1). x: (L, 1) Montgomery; requires x != 0 (the caller
    host-checks and falls back to the shift path)."""
    m = 1 << chunk_log
    xrow = jnp.broadcast_to(x, (FR.L, m))
    pw = FR.prefix_mul(xrow)  # x^1 .. x^m
    powx = jnp.concatenate([FR.one((1,)), pw[..., : m - 1]], axis=-1)
    xm = pw[..., m - 1]  # (L,)
    xinv = FR.batch_inv(x)
    pwinv = FR.prefix_mul(jnp.broadcast_to(xinv, (FR.L, m)))
    powrev = jnp.flip(powx, -1)  # x^(m-1) .. x^0
    return powx, pwinv, powrev, xm


@jax.jit
def _div_stream_chunk(fc, carry, powx, pwinv, powrev, xm):
    """One high-to-low chunk step of the linear-division Horner recurrence
    (identical math to `_div_by_linear_big`'s scan body): given this chunk's
    coefficients fc (L, m) and the value-of-the-tail carry, returns
    (quotient chunk (L, m), new carry). The final carry is f(x)."""
    u = FR.mul(fc, powx)
    v = FR.prefix_add(u, reverse=True)  # inclusive suffix sums
    vexcl = jnp.concatenate([v[..., 1:], FR.zeros((1,))], axis=-1)
    qc = FR.add(FR.mul(pwinv, vexcl), FR.mul(powrev, carry[..., None]))
    new_carry = FR.add(v[..., 0], FR.mul(xm, carry))
    return qc, new_carry


def _long_division(f, d, nf: int, nd: int):
    """Schoolbook long division with a single compiled scan body.

    Matches reference semantics (polynomial.rs:193-227): returns (quotient,
    remainder, remainder_is_zero). nf/nd are true coefficient counts
    (degree+1); d's leading coefficient must be nonzero."""
    f = f[..., :nf]
    d = d[..., :nd]
    steps = nf - nd + 1
    if steps <= 0:
        return FR.zeros((1,)), f, False  # quotient 0, remainder f
    dlead_inv = FR.inv(d[..., nd - 1 : nd])
    dpad = _pad_to(d, nf)  # d at positions [0, nd); we subtract at the top
    dtop = jnp.roll(dpad, nf - nd, axis=-1)  # d's coeffs at [nf-nd, nf)

    def body(rem, _):
        factor = FR.mul(rem[..., nf - 1 : nf], dlead_inv)
        rem = FR.sub(rem, FR.mul(dtop, factor))
        rem = jnp.roll(rem, 1, axis=-1)
        return rem, factor[..., 0]

    rem, qs = jax.lax.scan(body, f, None, length=steps)
    # qs: (steps, L) high-to-low -> (L, steps) low-to-high
    q = jnp.moveaxis(qs, 0, -1)[..., ::-1]
    r = rem[..., nf - (nd - 1) :] if nd > 1 else FR.zeros((1,))
    return q, r, None


# --------------------------------------------------------------------------
# Polynomial type
# --------------------------------------------------------------------------


class Polynomial:
    """Dense polynomial over Fr with explicitly tracked degree.

    Mirrors the reference API surface (polynomial.rs:49-165, 295-300):
    constructors, degree bookkeeping, Horner-equivalent eval, operator
    overloads, scalar multiplication — over TPU-resident limb arrays.
    """

    def __init__(self, coeffs, degree: int | None = None):
        coeffs = jnp.asarray(coeffs)
        assert coeffs.ndim == 2 and coeffs.shape[0] == FR.L
        self.coeffs = coeffs
        self.degree = coeffs.shape[-1] - 1 if degree is None else degree
        assert self.degree < coeffs.shape[-1]

    # ---- constructors (polynomial.rs:49-92 parity) -------------------------

    @classmethod
    def from_ints(cls, ints, degree: int | None = None):
        if len(ints) == 0:
            ints = [0]
        c = jnp.asarray(FR.encode(ints))
        if degree is None:
            degree = len(ints) - 1
            while degree > 0 and ints[degree] == 0:
                degree -= 1
        return cls(c, degree)

    @classmethod
    def new_zero(cls):
        return cls(FR.zeros((1,)), 0)

    @classmethod
    def from_scalar(cls, scalar):
        """Constant polynomial (polynomial.rs:56-61); accepts an int or an
        (L, 1) limb array."""
        if isinstance(scalar, int):
            return cls(jnp.asarray(FR.encode([scalar])), 0)
        return cls(scalar, 0)

    @classmethod
    def new_zero_with_size(cls, n: int):
        return cls(FR.zeros((n,)), 0)

    @classmethod
    def new_monic_of_degree(cls, degree: int):
        """All-ones polynomial of the given degree (polynomial.rs:63-70)."""
        return cls(FR.one((degree + 1,)), degree)

    @classmethod
    def new_single_term(cls, degree: int):
        c = FR.zeros((degree + 1,))
        one = FR.one(())
        c = c.at[:, degree].set(one)
        return cls(c, degree)

    # ---- bookkeeping (polynomial.rs:94-155 parity) ---------------------------

    def num_coeffs(self) -> int:
        return self.degree + 1

    def is_zero(self) -> bool:
        return bool(np.asarray(FR.is_zero(self.coeffs).all()))

    def trimmed(self):
        """Coefficients truncated to num_coeffs (device array)."""
        return self.coeffs[..., : self.degree + 1]

    def fixup_degree(self):
        """Sync the tracked degree down past leading zeros (device->host).
        Mirrors polynomial.rs:108-125; costs a device sync, call sparingly."""
        nz = ~np.asarray(FR.is_zero(self.coeffs))
        idx = np.nonzero(nz)[0]
        self.degree = int(idx[-1]) if len(idx) else 0
        return self

    def shrink_degree(self):
        """Like fixup_degree but only scans at or below the current tracked
        degree (polynomial.rs:117-120)."""
        nz = ~np.asarray(FR.is_zero(self.trimmed()))
        idx = np.nonzero(nz)[0]
        self.degree = int(idx[-1]) if len(idx) else 0
        return self

    def truncate(self, degree: int):
        """Drop all terms above `degree` and set the tracked degree
        (polynomial.rs:107-110). Returns a new Polynomial (immutable
        arrays). Over-length degrees no-op on the storage like the
        reference's Vec::truncate (the tracked degree is still clamped to
        what the backing array holds)."""
        new_len = min(degree + 1, self.coeffs.shape[-1])
        return Polynomial(self.coeffs[..., :new_len], new_len - 1)

    def reverse(self):
        """Coefficient reversal rev(f)(X) = X^deg * f(1/X)
        (polynomial.rs:112-115) — the transform behind Newton-inverse
        division (newton.py)."""
        return Polynomial(jnp.flip(self.trimmed(), axis=-1), self.degree)

    def lead(self):
        """Leading coefficient as an int (polynomial.rs:127-129)."""
        return FR.decode(self.coeffs[..., self.degree : self.degree + 1])[0]

    def constant(self):
        """Constant term as an int (polynomial.rs:131-133)."""
        return FR.decode(self.coeffs[..., 0:1])[0]

    def to_ints(self):
        return FR.decode(self.trimmed())

    # ---- arithmetic -----------------------------------------------------------

    def __add__(self, other):
        n = max(self.num_coeffs(), other.num_coeffs())
        s = _poly_add(_pad_to(self.trimmed(), n), _pad_to(other.trimmed(), n))
        return Polynomial(s, n - 1)

    def __sub__(self, other):
        n = max(self.num_coeffs(), other.num_coeffs())
        s = _poly_sub(_pad_to(self.trimmed(), n), _pad_to(other.trimmed(), n))
        return Polynomial(s, n - 1)

    def __mul__(self, other):
        return self.best_mul(other)

    def scalar_mul(self, s):
        """Multiply by a scalar given as int or (L,1) array."""
        if isinstance(s, int):
            s = jnp.asarray(FR.encode([s]))
        return Polynomial(FR.mul(self.coeffs, s), self.degree)

    def best_mul(self, other):
        """NTT multiplication (the TPU 'best' path at every size; the
        reference dispatches naive-vs-FFT at 128 coeffs, polynomial.rs:185-191)."""
        out_len = self.num_coeffs() + other.num_coeffs() - 1
        c = _mul_ntt(self.trimmed(), other.trimmed(), out_len)
        return Polynomial(c, out_len - 1)

    def naive_mul(self, other):
        c = _mul_naive(self.trimmed(), other.trimmed())
        return Polynomial(c, self.degree + other.degree)

    def eval(self, x):
        """Evaluate at one point (int -> int, or (L,1) array -> (L,1))."""
        if isinstance(x, int):
            pt = jnp.asarray(FR.encode([x]))
            return FR.decode(_eval_many(self.trimmed(), pt))[0]
        return _eval_many(self.trimmed(), x)

    def eval_many(self, pts):
        """Evaluate at (L, k) points -> (L, k). (multi_eval parity,
        polynomial.rs:229-233, without the xs.len() > degree restriction.)

        Large k on large polynomials routes through the remainder tree
        (O(M(n) + M(k) log k)); otherwise the direct chunked-power method
        (O(n·k) work, log depth — faster for small batches)."""
        k = pts.shape[-1]
        if k >= 64 and self.num_coeffs() * k >= (1 << 22):
            from .subproduct import multi_eval_tree

            return multi_eval_tree(self, pts)
        return _eval_many(self.trimmed(), pts)

    # reference name (polynomial.rs:229-233)
    def multi_eval(self, pts):
        return self.eval_many(pts)

    def long_division(self, divisor):
        """(quotient, remainder or None) — None iff division is exact,
        which is the exactness signal the protocol layer turns into
        PointNotOnPolynomial (reference coeff_form.rs:71-75).

        Dispatch: small quotients use the scan schoolbook (one compiled
        body); large ones use reversal + Newton-inverse division — O(M(n))
        NTT work at log depth instead of an O(n-k)-step sequential scan
        (SURVEY.md §7 hard parts; the reference is O((n-k)k) schoolbook,
        polynomial.rs:193-227). Both paths are differentially tested."""
        from ..config import get_config

        nf, nd = self.num_coeffs(), divisor.num_coeffs()
        steps = nf - nd + 1
        if steps > get_config().newton_div_threshold:
            from .newton import newton_divmod_jit

            q, r = newton_divmod_jit(self.trimmed(), divisor.trimmed(), nf, nd)
        else:
            q, r, _ = _long_division(self.trimmed(), divisor.trimmed(), nf, nd)
        qp = Polynomial(q, max(0, self.degree - divisor.degree))
        rp = Polynomial(r)
        rp.fixup_degree()
        if rp.is_zero():
            return qp, None
        return qp, rp

    def div_by_linear(self, x: int, want_rem: bool = True):
        """Fast path: divide by (X - x); returns (quotient, remainder_int).

        want_rem=False skips decoding the remainder (a blocking
        device->host transfer) and returns (quotient, None) — used by the
        prover's pipelined witness path where the remainder is known-zero.

        Polynomials above 2^div_chunk_log+1 coefficients use the chunked
        Horner-carry scan (`_div_by_linear_big`) so peak HBM stays bounded
        at the 2^24 north star."""
        from ..config import get_config

        pt = jnp.asarray(FR.encode([x]))
        chunk_log = get_config().div_chunk_log
        if self.num_coeffs() > (2 << chunk_log):
            q, rem = _div_by_linear_big(self.trimmed(), pt, chunk_log)
        else:
            q, rem = _div_by_linear(self.trimmed(), pt)
        qp = Polynomial(q[:, 0, :], max(0, self.degree - 1))
        return qp, (FR.decode(rem)[0] if want_rem else None)

    def __eq__(self, other):
        # Mathematical equality: compare the padded coefficient arrays rather
        # than the tracked degrees — add/sub keep degree = n-1 without fixup
        # on cancellation (cheap, no device sync), so two equal polynomials
        # can carry different tracked degrees.
        n = max(self.num_coeffs(), other.num_coeffs())
        return bool(
            np.asarray(
                FR.eq(_pad_to(self.trimmed(), n), _pad_to(other.trimmed(), n)).all()
            )
        )

    def __repr__(self):
        return f"Polynomial(degree={self.degree})"


def op_tree(size: int, get_elem, op):
    """Balanced binary fold (reference op_tree, polynomial.rs:367-392):
    keeps intermediate degrees balanced, mapping onto a parallel tree."""
    assert size > 0
    if size == 1:
        return get_elem(0)
    half = size // 2
    left = op_tree(half, get_elem, op)
    right = op_tree(size - half, lambda i: get_elem(half + i), op)
    return op(left, right)
