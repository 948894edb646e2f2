"""kzg_tpu: a TPU-native KZG polynomial commitment framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the Rust
`kzg` crate (proxima-one/kzg): BLS12-381 field/curve arithmetic as multi-limb
integer kernels, Pippenger MSM, radix-2 NTT, polynomial algebra, and both the
coefficient-form and evaluation-form KZG protocols, designed for single-chip
speed and multi-host TPU meshes (jax.sharding + shard_map collectives).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compile cache: the limb/point kernels are compile-heavy (fused
# Pallas point ops take ~30-40s each the first time); cache them across
# processes. Opt out with KZG_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("KZG_TPU_NO_COMPILE_CACHE"):

    def _machine_tag() -> str:
        # XLA:CPU caches AOT machine code; reusing entries compiled on a
        # host with a different CPU segfaults or SIGILLs (observed SIGSEGV,
        # and cpu_aot_loader errors about +prefer-no-scatter — an XLA
        # tuning feature that does NOT show up in /proc/cpuinfo flags, so
        # a flags-only hash can collide across hosts XLA targets
        # differently). Key the cache dir by model name + stepping +
        # microcode + flags + jaxlib version.
        import hashlib

        parts = []
        try:
            import jaxlib

            parts.append(getattr(jaxlib, "__version__", ""))
        except Exception:  # noqa: BLE001 - tag is best-effort
            pass
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    key = line.split(":", 1)[0].strip()
                    if key in ("model name", "stepping", "microcode",
                               "cpu family", "model", "flags"):
                        parts.append(line.strip())
                    if key == "power management":  # end of first CPU block
                        break
        except OSError:
            import platform

            parts.append(platform.processor())
        return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:12]

    _cache_dir = _os.environ.get(
        "KZG_TPU_COMPILE_CACHE_DIR",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(__file__)),
            ".jax_cache",
            _machine_tag(),
        ),
    )
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from .kzg.errors import KZGError  # noqa: F401
