"""Mesh parallelism: four-step distributed NTT (all_to_all), sharded
Pippenger MSM (all_gather join), and the sharded commit+witness pipeline.
The reference has no distributed runtime (SURVEY.md §2.3); this layer is the
TPU-native scaling design of SURVEY.md §5.7-5.8 / §7 step 8."""

from .ntt import ShardedDomain, four_step_dif, four_step_dit
from .msm import make_sharded_msm, pad_msm_inputs
from .pipeline import (
    make_commit_witness_step,
    make_batched_witness_step,
    make_eval_form_step,
)
from .runtime import initialize_distributed, make_mesh

__all__ = [
    "ShardedDomain",
    "four_step_dif",
    "four_step_dit",
    "make_sharded_msm",
    "pad_msm_inputs",
    "make_commit_witness_step",
    "make_batched_witness_step",
    "make_eval_form_step",
    "initialize_distributed",
    "make_mesh",
]
