"""kzg_tpu: a TPU-native KZG polynomial commitment framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the Rust
`kzg` crate (proxima-one/kzg): BLS12-381 field/curve arithmetic as multi-limb
integer kernels, Pippenger MSM, radix-2 NTT, polynomial algebra, and both the
coefficient-form and evaluation-form KZG protocols, designed for single-chip
speed and multi-host TPU meshes (jax.sharding + shard_map collectives).
"""

__version__ = "0.1.0"

from .kzg.errors import KZGError  # noqa: F401
