"""Multi-host runtime scaffolding (SURVEY.md §5.8).

The reference is a single-process CPU library; its only concurrency is a
rayon pool. The TPU framework scales across hosts with JAX's distributed
runtime: every host calls `initialize_distributed()` once at startup, after
which `jax.devices()` spans the whole pod slice and the mesh helpers below
lay the framework's shardings over it. Single-process behavior is unchanged
when these are not called.
"""

import numpy as np


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kwargs):
    """Bring up the multi-host JAX runtime (jax.distributed.initialize).

    On TPU pods all three arguments are inferred from the environment; on
    CPU/GPU fleets pass them explicitly. Safe to call exactly once per
    process, before any other JAX call. No-op if already initialized."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized -> keep going
        if "already" not in str(e).lower():
            raise


def make_mesh(config=None):
    """Build the device mesh described by config.mesh_shape /
    config.mesh_axis_names (default: a 1-D mesh named "shard" over every
    visible device, which is the layout the sharded NTT/MSM/pipeline
    modules expect)."""
    import jax
    from jax.sharding import Mesh

    from ..config import get_config

    cfg = config or get_config()
    devs = np.array(jax.devices())
    if cfg.mesh_shape is None:
        shape = (len(devs),)
    else:
        shape = tuple(cfg.mesh_shape)
    names = tuple(cfg.mesh_axis_names)[: len(shape)]
    if int(np.prod(shape)) > len(devs):
        raise ValueError(
            f"mesh shape {shape} needs {int(np.prod(shape))} devices, "
            f"have {len(devs)}"
        )
    return Mesh(devs[: int(np.prod(shape))].reshape(shape), names)
