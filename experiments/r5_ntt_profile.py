"""Round-5 NTT stage profile: where do the 50ms of the 2^20 MXU-path NTT
go? Times, separately, at bench shapes:

  * the raw u8 x u8 -> s32 DFT matmul (dot_general) per pass
  * the Pallas digit-ripple + Montgomery-reduce epilogue per pass
  * one full dft_axis2 block transform
  * the split-table twiddle multiplies
  * the full Domain.ntt in both modes (VPU / MXU)

Usage: python experiments/r5_ntt_profile.py [logn]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from kzg_tpu.config import configure
from kzg_tpu.fields import FR
from kzg_tpu.ntt import Domain
from kzg_tpu.ntt import mxu

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << LOG_N
rng = np.random.default_rng(11)


def fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


def t(name, fn, variants, iters=3):
    out = fn(variants[0])
    fetch(out)
    t0 = time.perf_counter()
    for i in range(iters):
        fetch(fn(variants[1 + i % (len(variants) - 1)]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def rand_mont(field, count):
    limbs = rng.integers(0, 1 << 16, size=(field.L, count), dtype=np.uint32)
    limbs[-1] &= 0x3FFF
    return jax.jit(field.to_mont)(jnp.asarray(limbs))


x = rand_mont(FR, n)
xv = [jnp.roll(x, i, axis=-1) for i in range(4)]
jax.block_until_ready(xv)

# ---- raw matmul per pass (C=128 shape: (8192, 4096) @ (4096, n/128)) ----
C = 128
T = n // C
w = jnp.asarray(mxu._wbig(7, False))
planes = jnp.zeros((mxu.PLANES * C, T), jnp.uint8)
pv = [jnp.roll(planes, i, axis=-1) for i in range(4)]
mm = jax.jit(
    lambda p: jax.lax.dot_general(
        w, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
)
jax.block_until_ready(pv)
t(f"dot_general (8192,4096)@(4096,{T})", mm, pv)

# ---- reduce epilogue per pass: (OUT_DIGITS, C*T) s32 -> (L, C*T) --------
y = jnp.zeros((mxu.OUT_DIGITS, n), jnp.int32)
yv = [jnp.roll(y, i, axis=-1) for i in range(4)]
red = mxu._make_reduce_kernel(False)
redj = jax.jit(red)
jax.block_until_ready(yv)
t(f"reduce epilogue ({mxu.OUT_DIGITS},{n})", redj, yv)

# ---- one dft_axis2 (exp=7) over the bench shape -------------------------
configure(ntt_mxu="auto")
xb = x.reshape(FR.L, C, T)
xbv = [jnp.roll(xb, i, axis=-1) for i in range(4)]
dft = jax.jit(lambda v: mxu.dft_axis2(7, False, v))
jax.block_until_ready(xbv)
t("dft_axis2 exp=7 (one full pass)", dft, xbv)

# ---- split-table twiddle multiply at the top level ----------------------
dom = Domain(LOG_N)
exp_r, exp_c, s, wh, wl = dom._four_step_consts(False)
rn, cn = 1 << exp_r, 1 << exp_c
xt = x.reshape(FR.L, cn, rn)
xtv = [jnp.roll(xt, i, axis=-1) for i in range(4)]


def twiddle(v):
    xs = v.reshape(FR.L, cn, rn >> s, 1 << s)
    xs = FR.mul(xs, wh.reshape(FR.L, cn, rn >> s, 1))
    xs = FR.mul(xs, wl.reshape(FR.L, cn, 1, 1 << s))
    return xs.reshape(FR.L, cn, rn)


twj = jax.jit(twiddle)
jax.block_until_ready(xtv)
t("top twiddle mul (2 split-table muls)", twj, xtv)

# transpose cost
tr = jax.jit(lambda v: jnp.swapaxes(v, -1, -2))
t("swapaxes (L, cn, rn)", tr, xtv)

# ---- full NTT, both modes ----------------------------------------------
for mode, name in (("auto", "MXU"), ("off", "VPU")):
    configure(ntt_mxu=mode)
    Domain._cache.clear()
    dom = Domain(LOG_N)
    t(f"full ntt 2^{LOG_N} ({name})", lambda v: dom.ntt(v), xv)
configure(ntt_mxu="off")
Domain._cache.clear()
