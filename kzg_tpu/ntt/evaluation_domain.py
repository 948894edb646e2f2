"""EvaluationDomain: the user-facing value container of the reference's
`ft.rs:17-288` plus its serde wrapper (`SerializableEvaluationDomain`,
ft.rs:389-434), designed TPU-first.

The reference couples the data (`coeffs: Vec<Scalar>`) with the domain
constants and mutates in place (`fft()` rewrites `self.coeffs`,
ft.rs:111-140). A JAX design separates the two: `Domain` (domain.py) owns
the cached twiddles and the jitted transforms — built once per size — and
`EvaluationDomain` is an IMMUTABLE value holder: every operation returns a
new container wrapping a new device array, so instances compose with
functional callers and the underlying arrays flow through jit like any
other input. The reference's `*_assign` method names are kept for API
parity but return the result instead of mutating.

Values are (L, d) Montgomery-form Fr limb arrays, the framework's native
wire format; `from_ints`/`to_ints` convert at the host boundary only.
"""

import numpy as np

import jax.numpy as jnp

from ..constants import R
from ..fields import FR
from .domain import Domain, compute_omega

# distribute_powers table cache: (g mod R, d) -> device table or (hi, lo)
_POWER_TABLE_CACHE = {}
# above this exp, hold power tables as hi/lo sqrt factors (matches
# domain.py's split-table threshold for twiddles)
_SPLIT_POWERS_EXP = 17


def _powers_device(g_int: int, count: int):
    """[1, g, g^2, ..., g^(count-1)] as an (L, count) Montgomery array,
    built with log2(count) doubling steps on device (the reference's
    distribute_powers walks a serial host chain, ft.rs:142-156 — O(d)
    dependent muls; the log-doubling form is O(log d) launches of
    vectorised muls)."""
    p = jnp.asarray(FR.encode([1]))
    k = 1
    g_pow = g_int % R
    while k < count:
        # append p * g^k : doubles the table length each step
        c = jnp.asarray(FR.encode([g_pow]))
        p = jnp.concatenate([p, FR.mul(p, c)], axis=-1)
        g_pow = (g_pow * g_pow) % R
        k *= 2
    return p[..., :count]


class EvaluationDomain:
    """d = 2^exp evaluations (or coefficients) of a polynomial over the
    omega-domain, mirroring `EvaluationDomain` ft.rs:17-25. Immutable."""

    __slots__ = ("values", "domain")

    def __init__(self, values, domain: Domain):
        self.values = values
        self.domain = domain

    # ---- constructors (ft.rs:82-109) -----------------------------------

    @classmethod
    def from_coeffs(cls, values) -> "EvaluationDomain":
        """Zero-pad an (L, n) Montgomery array to the next power of two and
        attach the matching domain (ft.rs:94-109; raises
        PolynomialDegreeTooLarge past Fr's two-adicity via compute_omega)."""
        n = values.shape[-1]
        _, d, exp = compute_omega(n)
        if d != n:
            pad = [(0, 0)] * (values.ndim - 1) + [(0, d - n)]
            values = jnp.pad(values, pad)
        return cls(values, Domain(exp))

    @classmethod
    def from_ints(cls, ints) -> "EvaluationDomain":
        return cls.from_coeffs(jnp.asarray(FR.encode([x % R for x in ints])))

    @classmethod
    def from_polynomial(cls, poly) -> "EvaluationDomain":
        # trimmed(): the domain size must come from the TRACKED degree, not
        # the backing-array slack (the reference feeds the truncated coeffs
        # into from_coeffs, eval_form.rs:271-315)
        return cls.from_coeffs(poly.trimmed())

    def clone_with_different_coeffs(self, values) -> "EvaluationDomain":
        """ft.rs:78-80 — same domain, new values (must be length d)."""
        assert values.shape[-1] == self.d, "values must match the domain size"
        return EvaluationDomain(values, self.domain)

    # ---- accessors (ft.rs:46-53, 106-114 analog) ------------------------

    @property
    def d(self) -> int:
        return self.domain.d

    @property
    def exp(self) -> int:
        return self.domain.exp

    @property
    def omega(self) -> int:
        return self.domain.omega

    def __len__(self) -> int:
        return self.d

    def into_coeffs(self):
        """The raw (L, d) Montgomery array (ft.rs:46-48)."""
        return self.values

    def to_ints(self):
        return FR.decode(self.values)

    def interpolate(self):
        """ifft and wrap as a Polynomial (the ft.rs:111-140 iFFT composed
        with the reference's EvaluationDomain -> Polynomial hand-off)."""
        from ..poly import Polynomial

        return Polynomial(self.domain.intt(self.values))

    # ---- transforms (ft.rs:111-178) -------------------------------------

    def fft(self) -> "EvaluationDomain":
        return EvaluationDomain(self.domain.ntt(self.values), self.domain)

    def ifft(self) -> "EvaluationDomain":
        return EvaluationDomain(self.domain.intt(self.values), self.domain)

    def coset_fft(self) -> "EvaluationDomain":
        return EvaluationDomain(self.domain.coset_ntt(self.values), self.domain)

    def icoset_fft(self) -> "EvaluationDomain":
        return EvaluationDomain(self.domain.coset_intt(self.values), self.domain)

    def distribute_powers(self, g: int) -> "EvaluationDomain":
        """values[i] *= g^i (ft.rs:142-156), with the power table built by
        on-device log-doubling instead of the reference's serial chain.
        Tables are cached per (g, d); for big domains (>= 2^17, matching
        domain.py's split-table threshold) the table is held as O(sqrt d)
        hi/lo factors — g^i = HI[i >> s] * LO[i & (2^s - 1)] — applied as
        two broadcast multiplies, never materialising the O(d) table."""
        key = (g % R, self.d)
        cached = _POWER_TABLE_CACHE.get(key)
        if self.exp >= _SPLIT_POWERS_EXP:
            s = self.exp // 2
            n_lo, n_hi = 1 << s, self.d >> s
            if cached is None:
                lo = _powers_device(g, n_lo)
                hi = _powers_device(pow(g % R, n_lo, R), n_hi)
                cached = _POWER_TABLE_CACHE[key] = (hi, lo)
            hi, lo = cached
            v = self.values.reshape(FR.L, n_hi, n_lo)
            v = FR.mul(FR.mul(v, lo[:, None, :]), hi[:, :, None])
            return EvaluationDomain(v.reshape(FR.L, self.d), self.domain)
        if cached is None:
            cached = _POWER_TABLE_CACHE[key] = _powers_device(g, self.d)
        return EvaluationDomain(FR.mul(self.values, cached), self.domain)

    # ---- vanishing polynomial (ft.rs:182-217) ----------------------------

    def z(self, tau: int) -> int:
        return self.domain.z_at(tau)

    def divide_by_z_on_coset(self) -> "EvaluationDomain":
        return EvaluationDomain(
            self.domain.divide_by_z_on_coset(self.values), self.domain
        )

    # ---- pointwise arithmetic (ft.rs:220-271) ----------------------------
    # names kept for reference parity; these RETURN the result (immutable)

    def mul_assign(self, other: "EvaluationDomain") -> "EvaluationDomain":
        assert self.d == other.d, "domains must match"
        return EvaluationDomain(FR.mul(self.values, other.values), self.domain)

    def sub_assign(self, other: "EvaluationDomain") -> "EvaluationDomain":
        assert self.d == other.d, "domains must match"
        return EvaluationDomain(FR.sub(self.values, other.values), self.domain)

    def add_assign(self, other: "EvaluationDomain") -> "EvaluationDomain":
        assert self.d == other.d, "domains must match"
        return EvaluationDomain(FR.add(self.values, other.values), self.domain)

    def __eq__(self, other):
        if not isinstance(other, EvaluationDomain):
            return NotImplemented
        return self.d == other.d and bool(
            np.asarray(FR.eq(self.values, other.values).all())
        )

    # value-equality over mutable device arrays: explicitly unhashable
    __hash__ = None

    def __repr__(self) -> str:
        return f"EvaluationDomain(d={self.d}, omega=...{self.omega % 10**8})"

    # ---- serialization (SerializableEvaluationDomain, ft.rs:389-434) -----
    # The reference stores coeffs + exp + the derived constants; the
    # constants are recomputed from exp on load (they are functions of it).

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, values=np.asarray(self.values), exp=np.int64(self.exp)
        )

    @classmethod
    def load(cls, path: str) -> "EvaluationDomain":
        blob = np.load(path)
        return cls(jnp.asarray(blob["values"]), Domain(int(blob["exp"])))
