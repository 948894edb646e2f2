"""Interop layer: canonical blstrs/ZCash byte encodings and golden-vector
helpers (reference parity surface, SURVEY.md §2.2 'Serialization')."""

from .serialize import (
    DecodeError,
    fr_to_bytes,
    fr_from_bytes,
    g1_compress,
    g1_decompress,
    g1_uncompressed,
    g1_from_uncompressed,
    g2_compress,
    g2_decompress,
    g2_uncompressed,
    g2_from_uncompressed,
    polynomial_to_bytes,
    polynomial_from_bytes,
    params_to_bytes,
    params_from_bytes,
    batch_witness_to_bytes,
    batch_witness_from_bytes,
    eval_batch_witness_to_bytes,
    eval_batch_witness_from_bytes,
)


def kzg_batch_witness_to_bytes(bw) -> bytes:
    """Serialize a kzg.coeff_form.KZGBatchWitness (device arrays) to the
    canonical byte layout (reference coeff_form.rs:12-13 serde analog)."""
    from ..curve import g1_from_device

    w = g1_from_device(tuple(t[..., None] for t in bw.w))[0]
    return batch_witness_to_bytes(bw.r.to_ints(), w)


def _g1_jac_device(w_host):
    """One host oracle point -> batch-() Jacobian device point."""
    import jax.numpy as jnp

    from ..curve import g1_to_device

    return tuple(jnp.asarray(t)[..., 0] for t in g1_to_device([w_host]))


def kzg_batch_witness_from_bytes(b: bytes, subgroup_check: bool = True):
    """Decode back to a KZGBatchWitness with device-resident r and w."""
    from ..kzg.coeff_form import KZGBatchWitness
    from ..poly import Polynomial

    r_ints, w = batch_witness_from_bytes(b, subgroup_check)
    return KZGBatchWitness(
        r=Polynomial.from_ints(r_ints), w=_g1_jac_device(w)
    )


def kzg_eval_batch_witness_to_bytes(bw) -> bytes:
    """Serialize a kzg.eval_form.KZGBatchWitnessEvalForm (reference
    eval_form.rs:14-16 serde analog)."""
    from ..curve import g1_from_device
    from ..fields import FR

    w = g1_from_device(tuple(t[..., None] for t in bw.w))[0]
    return eval_batch_witness_to_bytes(FR.decode(bw.r), w)


def kzg_eval_batch_witness_from_bytes(b: bytes, subgroup_check: bool = True):
    import jax.numpy as jnp

    from ..fields import FR
    from ..kzg.eval_form import KZGBatchWitnessEvalForm

    r_ints, w = eval_batch_witness_from_bytes(b, subgroup_check)
    return KZGBatchWitnessEvalForm(
        r=jnp.asarray(FR.encode(r_ints)), w=_g1_jac_device(w)
    )


__all__ = [
    "DecodeError",
    "fr_to_bytes", "fr_from_bytes",
    "g1_compress", "g1_decompress", "g1_uncompressed", "g1_from_uncompressed",
    "g2_compress", "g2_decompress", "g2_uncompressed", "g2_from_uncompressed",
    "polynomial_to_bytes", "polynomial_from_bytes",
    "params_to_bytes", "params_from_bytes",
    "batch_witness_to_bytes", "batch_witness_from_bytes",
    "eval_batch_witness_to_bytes", "eval_batch_witness_from_bytes",
    "kzg_batch_witness_to_bytes", "kzg_batch_witness_from_bytes",
    "kzg_eval_batch_witness_to_bytes", "kzg_eval_batch_witness_from_bytes",
]
