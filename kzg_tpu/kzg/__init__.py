"""KZG protocol layer (reference L3: lib.rs / coeff_form.rs / eval_form.rs).

Exports are lazy (PEP 562): importing a sibling like `kzg_tpu.ntt.domain`
pulls `kzg.errors` through this package, and an eager import chain here
(setup -> coeff_form -> ntt) would re-enter the half-initialized `ntt`
package — a circular import. Lazy resolution also keeps `import kzg_tpu.kzg`
backend-neutral (see the root __init__'s note on JAX_PLATFORMS overrides).
"""

_EXPORTS = {
    "KZGError": "errors",
    "PolynomialDegreeTooLarge": "errors",
    "PointNotOnPolynomial": "errors",
    "BatchedPointsNotOnPolynomial": "errors",
    "NoPolynomial": "errors",
    "BatchOpeningZeroRemainder": "errors",
    "KZGParams": "srs",
    "setup": "srs",
    "csprng_setup": "srs",
    "KZGProver": "coeff_form",
    "KZGVerifier": "coeff_form",
    "KZGBatchWitness": "coeff_form",
    "KZGProverEvalForm": "eval_form",
    "KZGVerifierEvalForm": "eval_form",
    "KZGBatchWitnessEvalForm": "eval_form",
    "LagrangeSRS": "eval_form",
    "compute_lagrange_basis": "eval_form",
    "compute_lagrange_basis_from_secret": "eval_form",
    "compute_lagrange_basis_and_polynomials": "eval_form",
    "lagrange_polynomials": "eval_form",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    submodule = _EXPORTS.get(name)
    if submodule is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    value = getattr(importlib.import_module(f".{submodule}", __name__), name)
    globals()[name] = value
    return value
