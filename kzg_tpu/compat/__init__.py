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
)

__all__ = [
    "DecodeError",
    "fr_to_bytes", "fr_from_bytes",
    "g1_compress", "g1_decompress", "g1_uncompressed", "g1_from_uncompressed",
    "g2_compress", "g2_decompress", "g2_uncompressed", "g2_from_uncompressed",
    "polynomial_to_bytes", "polynomial_from_bytes",
    "params_to_bytes", "params_from_bytes",
]
