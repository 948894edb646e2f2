"""Coefficient-form KZG prover and verifier.

Parity target: reference src/coeff_form.rs (KZGProver :38-112, KZGVerifier
:114-183, KZGBatchWitness :12-35). TPU-native redesign:

  * commit / witness = one Pippenger MSM over the sharded-able SRS;
  * the single-point witness quotient (f - y)/(X - x) is a log-depth suffix
    scan (poly layer) instead of schoolbook division (coeff_form.rs:66-81);
  * the batched witness quotient (f - r)/Z is computed by COSET EVALUATION
    DIVISION: evaluate numerator and Z on a coset (where Z has no roots),
    pointwise multiply by the batch inverse, interpolate back — O(n log n)
    fully-parallel work instead of the reference's O(n k) long division
    (coeff_form.rs:94); falls back to scan division in the measure-zero case
    of a batch point lying on the coset;
  * "is the point on the polynomial" is checked by direct evaluation, which
    is equivalent to the reference's remainder test (coeff_form.rs:71-75,
    polynomial remainder theorem) and costs O(n) instead of a division;
  * pairing checks run host-side over the oracle tower (2 small points cross
    the device boundary; the pairing itself is degree-independent).
"""

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..constants import R
from ..fields import FR
from ..curve import G1, G2, g1_from_device, g2_from_device
from ..msm import msm_g1, msm_g2
from ..ntt import Domain
from ..poly import Polynomial, vanishing_poly, lagrange_interpolation
from ..poly.polynomial import _pad_to
from ..oracle import ec_neg, ec_add, ec_mul
from ..hostcrypto import multi_pairing_check
from .errors import (
    PointNotOnPolynomial,
    BatchedPointsNotOnPolynomial,
    PolynomialDegreeTooLarge,
)
from .srs import KZGParams


@dataclass
class KZGBatchWitness:
    """Batched opening witness: the interpolated remainder polynomial r and
    the aggregate quotient commitment w (reference coeff_form.rs:12-35)."""

    r: Polynomial
    w: tuple  # G1 Jacobian device point


def _slice_srs(gs, n):
    return tuple(t[..., :n] for t in gs)


class KZGProver:
    """Stateless prover borrowing the SRS (coeff_form.rs:38-53)."""

    def __init__(self, params: KZGParams):
        self.params = params

    def commit(self, poly: Polynomial):
        """C = MSM(gs[..n], coeffs)  (coeff_form.rs:59-64)."""
        n = poly.num_coeffs()
        assert n <= self.params.n, "polynomial larger than SRS"
        return msm_g1(_slice_srs(self.params.gs, n), poly.trimmed())

    def create_witness(self, poly: Polynomial, point, check: bool = True):
        """Witness for f(x) = y: psi = (f - y)/(X - x), w = MSM(gs, psi)
        (coeff_form.rs:66-81). Raises PointNotOnPolynomial when y != f(x).

        check=False skips the membership check — it costs a blocking
        device->host round-trip per call, a latency drag in pipelined
        production proving where y was just computed from the same poly
        (the quotient itself is correct either way; an off-polynomial y
        simply yields a witness that will not verify).

        North-star sizes STREAM: above 2^msm_chunk_log coefficients the
        quotient is produced chunk-by-chunk (high-to-low Horner carry) and
        each chunk is consumed immediately by its MSM partial, so the full
        (L, n-1) quotient never co-resides with the SRS — the r3 2^24
        RESOURCE_EXHAUSTED fix (VERDICT item 1; reference semantics
        coeff_form.rs:66-81, which on a big-RAM CPU host has no analog of
        this memory wall)."""
        from ..config import get_config

        x, y = point
        if check and poly.eval(x) != y % R:
            raise PointNotOnPolynomial(f"({x}, {y}) not on polynomial")
        if poly.degree == 0:
            return G1.infinity(())
        n = poly.num_coeffs()
        if n > (1 << get_config().msm_chunk_log) and x % R != 0:
            return self._witness_streamed(poly, x % R)
        fm = poly.trimmed()
        # the quotient of (f - y)/(X - x) is independent of the constant
        # coefficient (f_0 only enters the remainder), so f - y is never
        # materialised — psi = quotient(f / (X - x))
        q, _ = Polynomial(fm, poly.degree).div_by_linear(x, want_rem=False)
        if q.num_coeffs() == 0:
            return G1.infinity(())
        return msm_g1(_slice_srs(self.params.gs, q.num_coeffs()), q.trimmed())

    def _witness_streamed(self, poly: Polynomial, x: int):
        """Chunk-streamed single-point witness: for each 2^div_chunk_log-
        coefficient chunk (high to low), one division-recurrence step
        produces the quotient chunk and one MSM over the matching SRS slice
        consumes it; Jacobian partials accumulate. Peak live memory is
        O(SRS + f + chunk), independent of n."""
        from ..config import get_config
        from ..msm.pippenger import _add_jitted
        from ..poly.polynomial import (
            _div_stream_consts,
            _div_stream_chunk,
            _pad_to,
        )

        cfg = get_config()
        chunk_log = min(cfg.div_chunk_log, cfg.msm_chunk_log)
        m = 1 << chunk_log
        f = poly.trimmed()
        n = f.shape[-1]
        pt = jnp.asarray(FR.encode([x]))
        consts = _div_stream_consts(pt, chunk_log)
        carry = FR.zeros(())
        acc = None
        add = _add_jitted(G1)
        nch = -(-n // m)
        for ci in range(nch - 1, -1, -1):
            off = ci * m
            fc = _pad_to(f[..., off : off + m], m)
            qc, carry = _div_stream_chunk(fc, carry, *consts)
            # quotient positions >= n-1 are structurally zero (suffix sums
            # of padded zeros with zero initial carry), so the top chunk's
            # tail rides along harmlessly; clip the SRS slice to n
            use = min(m, n - off)
            part = msm_g1(
                tuple(t[..., off : off + use] for t in self.params.gs),
                qc[..., :use],
            )
            acc = part if acc is None else add(acc, part)
        return acc

    def create_witness_batched(self, poly: Polynomial, xs, ys,
                               check: bool = True) -> KZGBatchWitness:
        """Aggregate witness for f(x_i) = y_i: r interpolates the points,
        psi = (f - r)/Z, w = MSM(gs, psi) (coeff_form.rs:83-111).
        check=False as in create_witness."""
        assert len(xs) == len(ys) and len(xs) > 0
        xs_d = jnp.asarray(FR.encode([x % R for x in xs]))
        ys_d = jnp.asarray(FR.encode([y % R for y in ys]))
        if check:
            got = FR.decode(poly.eval_many(xs_d))
            if got != [y % R for y in ys]:
                raise BatchedPointsNotOnPolynomial(
                    "some (x_i, y_i) not on polynomial"
                )
        z = vanishing_poly(xs_d)
        r = lagrange_interpolation(xs_d, ys_d)
        numerator = poly - r
        q = self._exact_div(numerator, z, xs_int=[x % R for x in xs])
        w = msm_g1(_slice_srs(self.params.gs, q.num_coeffs()), q.trimmed())
        return KZGBatchWitness(r=r, w=w)

    @staticmethod
    def _exact_div(numerator: Polynomial, z: Polynomial, xs_int=None) -> Polynomial:
        """(numerator / z), exactness guaranteed by the caller's evaluation
        check. Coset evaluation division (see module docstring).

        A batch point lying ON the evaluation coset would make Z vanish
        there (measure-zero; adversarially possible) — then exact division
        falls back to the Newton/scan path. With xs_int (the batch points
        as host ints) the test is pure host arithmetic — x on gen*<omega_d>
        iff (x/gen)^d == 1 — so the hot path never syncs the device."""
        from ..constants import FR_GENERATOR

        n = numerator.num_coeffs()
        k = z.num_coeffs()
        if n < k:
            return Polynomial.new_zero()
        exp = max(1, (n - 1).bit_length())
        dom = Domain(exp)
        ne = dom.coset_ntt(_pad_to(numerator.trimmed(), dom.d))
        ze = dom.coset_ntt(_pad_to(z.trimmed(), dom.d))
        if xs_int is not None:
            ginv = pow(FR_GENERATOR, -1, R)
            on_coset = any(
                pow(x * ginv % R, dom.d, R) == 1 for x in xs_int
            )
        else:
            on_coset = bool(np.asarray(FR.is_zero(ze).any()))
        if on_coset:
            q, _ = numerator.long_division(z)
            return q
        q_evals = FR.mul(ne, FR.batch_inv(ze))
        q_coeffs = dom.coset_intt(q_evals)[..., : n - k + 1]
        return Polynomial(q_coeffs, n - k)


class KZGVerifier:
    """Stateless verifier borrowing the SRS (coeff_form.rs:114-183).

    Pairing checks run on the engine selected by config.pairing_engine (or
    the per-verifier `engine` override): "auto"/"host" = native C++ engine
    (oracle fallback) with four small points crossing the device boundary;
    "device" = scalar muls, Miller loops and final exponentiation all
    on-chip (kzg/engines.py); "oracle" = pure-Python host path."""

    def __init__(self, params: KZGParams, engine: str | None = None):
        self.params = params
        self.engine = engine
        # cache small host copies of g = gs[0], h = hs[0], h^s = hs[1]
        self._g = g1_from_device(tuple(t[..., 0:1] for t in params.gs))[0]
        self._h = g2_from_device(tuple(t[..., 0:1] for t in params.hs))[0]
        self._hs1 = g2_from_device(tuple(t[..., 1:2] for t in params.hs))[0]

    def _engine(self) -> str:
        if self.engine is not None:
            return self.engine
        from ..config import get_config

        return get_config().pairing_engine

    def verify_poly(self, commitment, poly: Polynomial) -> bool:
        """Recommit and compare (coeff_form.rs:119-124)."""
        n = poly.num_coeffs()
        again = msm_g1(_slice_srs(self.params.gs, n), poly.trimmed())
        return bool(np.asarray(G1.eq(commitment, again)))

    def verify_eval(self, point, commitment, witness) -> bool:
        """e(w, h^s / h^x) == e(C / g^y, h)  (coeff_form.rs:126-142)."""
        x, y = point
        if self._engine() == "device":
            from .engines import verify_eval_device

            return verify_eval_device(self.params, x % R, y % R, commitment, witness)
        c_host = g1_from_device(tuple(t[..., None] for t in commitment))[0]
        w_host = g1_from_device(tuple(t[..., None] for t in witness))[0]
        s2 = ec_add(self._hs1, ec_neg(ec_mul(self._h, x % R)))  # h^(s - x)
        rhs_g1 = ec_add(c_host, ec_neg(ec_mul(self._g, y % R)))  # C - y*g
        # e(w, s2) * e(-(C - y g), h) == 1
        return multi_pairing_check(
            [(w_host, s2), (ec_neg(rhs_g1), self._h)], engine=self._engine()
        )

    def verify_eval_batched(self, commitment, batch_witness: KZGBatchWitness, xs) -> bool:
        """e(w, h^Z) == e(C / g^r, h)  (coeff_form.rs:144-182)."""
        xs_d = jnp.asarray(FR.encode([x % R for x in xs]))
        z = vanishing_poly(xs_d)  # op_tree product in the reference
        if z.num_coeffs() > self.params.hs[0].shape[-1]:
            # the k-point vanishing poly has k+1 coeffs; the reference would
            # panic on the hs slice (coeff_form.rs:164) — raise typed instead
            # of silently truncating into a shape error downstream
            raise PolynomialDegreeTooLarge(
                f"batched verify at {len(xs)} points needs {z.num_coeffs()} "
                f"G2 powers, setup has {self.params.hs[0].shape[-1]}"
            )
        hz = msm_g2(
            tuple(t[..., : z.num_coeffs()] for t in self.params.hs), z.trimmed()
        )
        r = batch_witness.r
        gr = msm_g1(_slice_srs(self.params.gs, r.num_coeffs()), r.trimmed())
        if self._engine() == "device":
            from .engines import verify_batched_device

            return verify_batched_device(
                self.params, commitment, batch_witness.w, hz, gr
            )
        hz_host = g2_from_device(tuple(t[..., None] for t in hz))[0]
        gr_host = g1_from_device(tuple(t[..., None] for t in gr))[0]
        c_host = g1_from_device(tuple(t[..., None] for t in commitment))[0]
        w_host = g1_from_device(tuple(t[..., None] for t in batch_witness.w))[0]
        lhs_g1 = ec_add(c_host, ec_neg(gr_host))
        return multi_pairing_check(
            [(w_host, hz_host), (ec_neg(lhs_g1), self._h)], engine=self._engine()
        )
