"""Row-gather DMA microbench (take 2): rows padded to 128 u32 (512B) for
Mosaic's 128-lane HBM slice tiling; per-row DMA lands directly in the
pipelined output block. Distinct index vectors EVERY iteration (the remote
tunnel caches identical executions and reports impossible rates)."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 20
M = 1 << 20
W = 128
ITERS = 3

rng = np.random.default_rng(0)
sp = jnp.asarray(rng.integers(0, 1 << 32, size=(N, W), dtype=np.uint32))
idxs = [
    jnp.asarray(rng.permutation(N).astype(np.int32)[:M]) for _ in range(ITERS + 2)
]
jax.block_until_ready((sp, idxs))


def timeit(name, fn):
    jax.block_until_ready(fn(sp, idxs[-1]))
    best = 1e9
    for i in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(sp, idxs[i]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:22s} {best*1e3:8.2f} ms   {M/best/1e6:7.1f} M rows/s"
          f"   {M*W*4/best/1e9:6.1f} GB/s", flush=True)


timeit("take_rows_pad128", jax.jit(lambda s, i: jnp.take(s, i, axis=0)))


def make_dma_gather(G: int):
    def kernel(idx_ref, src_ref, out_ref, sems):
        i = pl.program_id(0)
        for g in range(G):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[i * G + g], 1), :],
                out_ref.at[pl.ds(g, 1), :],
                sems.at[g],
            ).start()
        for g in range(G):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[i * G + g], 1), :],
                out_ref.at[pl.ds(g, 1), :],
                sems.at[g],
            ).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (G, W), lambda i, idx_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((G,))],
    )
    return jax.jit(
        lambda s, i: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, W), jnp.uint32),
        )(i, s)
    )


for G in (64, 128, 256):
    try:
        timeit(f"dma_gather G={G}", make_dma_gather(G))
    except Exception as e:
        print(f"dma_gather G={G} failed: {type(e).__name__}: {str(e)[:150]}",
              flush=True)
