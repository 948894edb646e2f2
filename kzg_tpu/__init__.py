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

def __getattr__(name):
    # Lazy root export: `from .kzg.errors import KZGError` would execute
    # kzg/__init__ -> the whole protocol chain -> curve/__init__, whose
    # pallas_enabled() queries jax.default_backend() and LOCKS the backend
    # at package-import time — breaking any later JAX_PLATFORMS override
    # (smoke's KZG_SMOKE_BACKEND=cpu, embedding uses). Importing the bare
    # package must stay backend-neutral.
    if name == "KZGError":
        from .kzg.errors import KZGError

        return KZGError
    if name == "native":
        # importlib (not `from . import`): the from-import form re-enters
        # this __getattr__ via _handle_fromlist before the submodule binds
        import importlib

        return importlib.import_module(".native", __name__)
    raise AttributeError(f"module 'kzg_tpu' has no attribute {name!r}")
