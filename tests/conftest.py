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
# box; caching makes repeat test runs fast
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(69)  # fixed seed, mirroring the reference's [69;32]
