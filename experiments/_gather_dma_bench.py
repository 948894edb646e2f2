"""Microbench: row-fetch strategies for the MSM bucket gather (the r4 trace
shows gathers = 3.05s of the 4.4s 2^20 MSM: fusion.180 1.87s chunk gathers +
fusion.174 1.18s row permute). Compares, at the real shapes (N=2^20 source
rows of 33 u32 words, M=2^20 fetched rows):

  take_rows      jnp.take(sp, idx, axis=0)            (the permute shape)
  take_rows_T    jnp.take(sp, idx, axis=0).T          (the chunk-gather shape)
  take_composed  jnp.take(sp, jnp.take(order, pos))   (skip-permute variant)
  take_planar    per-plane lane gather from (33, N)   (the r2 layout)
  dma_gather     Pallas kernel, one 132B row DMA per fetched row
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 20
M = 1 << 20
ROWS = 33
ITERS = 4

rng = np.random.default_rng(0)
sp = jnp.asarray(rng.integers(0, 1 << 32, size=(N, ROWS), dtype=np.uint32))
spT = jnp.asarray(np.asarray(sp).T.copy())
idx_np = rng.permutation(N).astype(np.int32)[:M]
idx = jnp.asarray(idx_np)
idx2 = jnp.roll(idx, 1)
order = jnp.asarray(rng.permutation(N).astype(np.int32))
jax.block_until_ready((sp, spT, idx, idx2, order))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(ITERS):
        a = args if i % 2 == 0 else (args[0], idx2) + args[2:]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    gb = M * ROWS * 4 / 1e9
    print(f"{name:16s} {best*1e3:8.2f} ms   {gb/best:6.2f} GB/s eff", flush=True)
    return best


take_rows = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
take_rows_T = jax.jit(lambda s, i: jnp.take(s, i, axis=0).T.reshape(ROWS, M))
take_composed = jax.jit(lambda s, i, o: jnp.take(s, jnp.take(o, i), axis=0))
take_planar = jax.jit(lambda s, i: jnp.take(s, i, axis=1))

timeit("take_rows", take_rows, sp, idx)
timeit("take_rows_T", take_rows_T, sp, idx)
timeit("take_composed", lambda s, i: take_composed(s, i, order), sp, idx)
timeit("take_planar", take_planar, spT, idx)


def make_dma_gather(G: int):
    def kernel(idx_ref, src_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        for g in range(G):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[i * G + g], 1), :],
                scratch.at[pl.ds(g, 1), :],
                sems.at[g],
            ).start()
        for g in range(G):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[i * G + g], 1), :],
                scratch.at[pl.ds(g, 1), :],
                sems.at[g],
            ).wait()
        out_ref[...] = scratch[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (G, ROWS), lambda i, idx_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((G, ROWS), jnp.uint32),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    return jax.jit(
        lambda s, i: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, ROWS), jnp.uint32),
        )(i, s)
    )


for G in (256, 512):
    try:
        f = make_dma_gather(G)
        timeit(f"dma_gather G={G}", f, sp, idx)
    except Exception as e:
        print(f"dma_gather G={G} failed: {type(e).__name__}: {e}", flush=True)
