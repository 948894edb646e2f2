"""Typed runtime configuration.

Replaces the scattered env vars (KZG_TPU_DEVICE_SETUP, KZG_TPU_SRS_CACHE_DIR)
and hardcoded tunables (fixed-base window, MSM thresholds) with one small
typed object — the config/flag subsystem SURVEY.md §5.6 calls for (the
reference's analog is its Cargo feature set plus FFT_MUL_THRESHOLD,
polynomial.rs:13; this framework has genuinely tunable mesh/kernel knobs so
it gets a real config).

Usage:
    from kzg_tpu.config import get_config, configure
    configure(pairing_engine="device", msm_window=14)
    cfg = get_config()

Env overrides (read once at import, for parity with round-1 behavior):
    KZG_TPU_DEVICE_SETUP=1   -> setup_engine="device"
    KZG_TPU_SRS_CACHE_DIR    -> srs_cache_dir
    KZG_TPU_PAIRING_ENGINE   -> pairing_engine
"""

import os
from dataclasses import dataclass, replace, fields as _dc_fields


@dataclass(frozen=True)
class KZGConfig:
    # --- MSM -----------------------------------------------------------
    # Pippenger window size; None = size heuristic (msm.pippenger.pick_window)
    msm_window: int | None = None
    # below this point count a batched double-and-add ladder beats bucketing
    small_msm_threshold: int = 512
    # bucket-accumulation implementation. "runs" (DEFAULT) = v1's window
    # structure with the bucket accumulation done by the contiguous-run
    # DMA kernel (curve.bucket_accumulate — one launch per window, each
    # bucket's sorted point run DMA-fetched in 16-point chunks double-
    # buffered against the madds, bucket state resident in VMEM; falls
    # back to v1 off-TPU or below 1024 buckets). MEASURED on the bench
    # chip round 4: 648k pts/s at 2^20/c=15 vs v1's 234k (2.8x — the
    # per-step XLA chunk gathers were 1.87s of v1's 4.4s) and 161k vs
    # 142k pts/s on G2 at 2^16. "v1" = window-sequential Jacobian scan
    # with XLA chunk gathers (fastest pre-r4 variant, BENCH_r02); "v2" =
    # windows-in-lanes variant with a capped worst case + segmented-scan
    # fallback; "affine" = v2 with batched-affine adds + per-step tree
    # inversion (fewest field muls, most dependent launches); "v1s" = v1
    # with SIGNED digit windows (half the buckets per window + one borrow
    # window). All variants are differentially tested.
    msm_impl: str = "runs"
    # bucket-accumulation steps fused into ONE Pallas launch (the gathered
    # point chunk for S steps is staged in HBM, the bucket state stays in
    # VMEM across the in-kernel step axis). 1 disables fusion (one launch +
    # one gather per step, the round-2 shape).
    msm_fuse_steps: int = 16
    # 1024-lane blocks processed per madd_multi kernel program (the grid
    # shrinks by this factor and each program's tile grows to
    # (blocks*8, 128) sublanes x lanes). >1 amortizes per-program fixed
    # costs (grid bookkeeping, mask loads, the rare-dbl cond) over more
    # lanes; VMEM use grows linearly (~1MB/block at fuse 16). Bucket
    # batches are padded up to a whole multiple.
    msm_blocks_per_program: int = 1
    # gate the madd/add doubling branch behind cond(any(lane needs it)):
    # skips ~7 of ~18 field muls on random workloads, but the any() scalar
    # reduction + branch can serialize the Mosaic pipeline — measurable
    # either way, so it's a knob.
    msm_gate_rare_dbl: bool = True
    # MSMs larger than 2^this run as sequential chunks of 2^this points
    # whose Jacobian partials are added — bounds HBM (a one-shot 2^24 MSM
    # needs ~26.5G vs the chip's 15.75G; measured) the same way the
    # sharded multi-chip MSM bounds per-device memory (parallel/msm.py),
    # just sequentially on one chip.
    msm_chunk_log: int = 22

    # --- trusted setup -------------------------------------------------
    # fixed-base window for the SRS ladders (table size = 2^w per window)
    fixed_base_window: int = 8
    # "auto": native host engine on CPU backends, device ladders on
    # accelerators; "host"/"device" force one path
    setup_engine: str = "auto"
    # directory for the fixed-base table cache (None = repo-root .srs_cache)
    srs_cache_dir: str | None = None

    # --- polynomial layer ----------------------------------------------
    # quotient length above which long division switches scan -> Newton
    newton_div_threshold: int = 32
    # linear division (the single-point witness quotient) switches from the
    # one-shot suffix scan to the chunked Horner-carry scan above
    # 2^(this+1) coefficients; chunks are 2^this wide. Bounds the division's
    # OWN ~8x full-length temporaries; the protocol layer additionally
    # STREAMS each quotient chunk straight into its MSM partial above
    # 2^msm_chunk_log coefficients (KZGProver._witness_streamed) so the
    # full quotient never co-resides with the SRS — together these are the
    # 2^24 witness RESOURCE_EXHAUSTED fix (VERDICT r3 item 1).
    div_chunk_log: int = 20
    # point count at which multipoint evaluation switches direct -> tree
    tree_eval_threshold: int = 64

    # --- NTT -------------------------------------------------------------
    # domains of size >= 2^this use the four-step (Bailey) decomposition:
    # two passes of sqrt(n)-sized NTTs along the MAJOR axis (all inter-stage
    # data movement is >= sqrt(n)-element contiguous chunks instead of the
    # Pease element shuffle) + one twiddle multiply + one transpose. Small
    # domains keep the single-pass constant-geometry loop.
    ntt_four_step_min_exp: int = 16
    # DFT-as-matmul blocks on the MXU (ntt/mxu.py): "auto" = on for real
    # accelerator backends, "off" = VPU butterfly stages everywhere,
    # "force" = on even on CPU (reduce epilogue in interpret mode — tests)
    ntt_mxu: str = "off"

    # --- eval form / Lagrange SRS ---------------------------------------
    # window for the group-iNTT's per-stage twiddle scalar ladders
    # (curve.scalar_mul_digits): c = 4 does ~2x fewer field muls than the
    # bit ladder; table memory = (2^c - 1) * 3 coords * (d/2) lanes.
    group_ladder_window: int = 4

    # --- pairing / verification ----------------------------------------
    # "auto": native C++ host engine, falling back to the Python oracle;
    # "host": same; "device": run the pairing checks on the TPU
    # (pairing/pairing.py); "oracle": force the pure-Python oracle
    pairing_engine: str = "auto"

    # --- mesh / distributed --------------------------------------------
    # mesh shape for the sharded pipeline; None = 1-D mesh over all devices
    mesh_shape: tuple | None = None
    mesh_axis_names: tuple = ("shard",)

    def validate(self):
        if self.pairing_engine not in ("auto", "host", "device", "oracle"):
            raise ValueError(f"bad pairing_engine {self.pairing_engine!r}")
        if self.setup_engine not in ("auto", "host", "device"):
            raise ValueError(f"bad setup_engine {self.setup_engine!r}")
        if self.msm_window is not None and not (1 <= self.msm_window <= 20):
            raise ValueError("msm_window must be in [1, 20]")
        if self.msm_impl not in ("v1", "v1s", "v2", "affine", "runs"):
            raise ValueError(f"bad msm_impl {self.msm_impl!r}")
        if not (2 <= self.fixed_base_window <= 16):
            raise ValueError("fixed_base_window must be in [2, 16]")
        if not (2 <= self.ntt_four_step_min_exp):
            raise ValueError("ntt_four_step_min_exp must be >= 2")
        if self.ntt_mxu not in ("auto", "off", "force"):
            raise ValueError(f"bad ntt_mxu {self.ntt_mxu!r}")
        if not (4 <= self.msm_chunk_log):
            raise ValueError("msm_chunk_log must be >= 4")
        if not (8 <= self.div_chunk_log):
            raise ValueError("div_chunk_log must be >= 8")
        if not (1 <= self.group_ladder_window <= 8):
            raise ValueError("group_ladder_window must be in [1, 8]")
        if not (1 <= self.msm_fuse_steps <= 256):
            raise ValueError("msm_fuse_steps must be in [1, 256]")
        if not (1 <= self.msm_blocks_per_program <= 64):
            raise ValueError("msm_blocks_per_program must be in [1, 64]")
        return self


def _from_env() -> KZGConfig:
    cfg = KZGConfig()
    if os.environ.get("KZG_TPU_DEVICE_SETUP"):
        cfg = replace(cfg, setup_engine="device")
    if os.environ.get("KZG_TPU_SRS_CACHE_DIR"):
        cfg = replace(cfg, srs_cache_dir=os.environ["KZG_TPU_SRS_CACHE_DIR"])
    if os.environ.get("KZG_TPU_PAIRING_ENGINE"):
        cfg = replace(cfg, pairing_engine=os.environ["KZG_TPU_PAIRING_ENGINE"])
    return cfg.validate()


_config = _from_env()


def get_config() -> KZGConfig:
    return _config


def set_config(cfg: KZGConfig) -> KZGConfig:
    global _config
    _config = cfg.validate()
    return _config


def configure(**kwargs) -> KZGConfig:
    """Update selected fields of the global config (returns the new one)."""
    bad = set(kwargs) - {f.name for f in _dc_fields(KZGConfig)}
    if bad:
        raise TypeError(f"unknown config fields: {sorted(bad)}")
    return set_config(replace(_config, **kwargs))
