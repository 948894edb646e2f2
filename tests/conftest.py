"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding logic is exercised without TPU pod hardware (pattern
recommended by SURVEY.md §4: the CPU analog of the reference's
parallel/serial FFT consistency test ft.rs:481-509).

The environment's sitecustomize force-registers the axon TPU backend and
sets JAX_PLATFORMS=axon; jax.config.update after import reliably overrides
it back to CPU for the test run.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the limb-kernel graphs are compile-heavy on this
# box; caching makes repeat test runs fast. kzg_tpu/__init__ configures the
# machine-tagged cache dir (XLA:CPU AOT entries are CPU-feature-specific —
# reusing another host's entries segfaults), so just import the package.
import kzg_tpu  # noqa: E402,F401  (configures jax_compilation_cache_dir)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(69)  # fixed seed, mirroring the reference's [69;32]
