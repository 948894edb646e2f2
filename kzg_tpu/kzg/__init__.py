from .errors import (
    KZGError,
    PolynomialDegreeTooLarge,
    PointNotOnPolynomial,
    BatchedPointsNotOnPolynomial,
    NoPolynomial,
    BatchOpeningZeroRemainder,
)
from .setup import KZGParams, setup, csprng_setup
from .coeff_form import KZGProver, KZGVerifier, KZGBatchWitness
from .eval_form import (
    KZGProverEvalForm,
    KZGVerifierEvalForm,
    KZGBatchWitnessEvalForm,
    LagrangeSRS,
    compute_lagrange_basis,
    compute_lagrange_basis_from_secret,
    compute_lagrange_basis_and_polynomials,
    lagrange_polynomials,
)

__all__ = [
    "KZGError",
    "PolynomialDegreeTooLarge",
    "PointNotOnPolynomial",
    "BatchedPointsNotOnPolynomial",
    "NoPolynomial",
    "BatchOpeningZeroRemainder",
    "KZGParams",
    "setup",
    "csprng_setup",
    "KZGProver",
    "KZGVerifier",
    "KZGBatchWitness",
    "KZGProverEvalForm",
    "KZGVerifierEvalForm",
    "KZGBatchWitnessEvalForm",
    "LagrangeSRS",
    "compute_lagrange_basis",
    "compute_lagrange_basis_from_secret",
    "compute_lagrange_basis_and_polynomials",
    "lagrange_polynomials",
]
