"""DFT-as-matmul NTT blocks on the MXU (int8 limb-plane matmuls).

The VPU butterfly path tops out at the field-mul roofline (BENCH_r02:
ntt_mfu 0.42 against a 483M Fr-mul/s peak). The MXU is ~100x wider — but
only for matmuls. A size-C DFT block IS a matmul: Y[k] = sum_j W[k,j] X[j]
— and multi-limb modular arithmetic decomposes it into integer matmuls:

  * field elements (Montgomery form) are split into 8-bit limb planes
    (32 planes for a 255/381-bit value in 16-bit limbs);
  * the product's 8-bit digit sums are EXACT integer matmuls over the
    (plane, j) axes: y_d[k, t] = sum_{a+b=d} sum_j W_a[k, j] * x_b[j, t],
    expressed as ONE (64C, 32C) @ (32C, T) u8 x u8 -> s32 MXU matmul with a
    block-banded LHS (Wbig[dC+k, bC+j] = plane_{d-b}(W)[k, j]);
  * overflow-free by construction: 255^2 * 32 limb pairs * C=128 terms
    = 2.7e8 < 2^31 per s32 accumulator;
  * one fused Pallas epilogue per element does the base-256 carry ripple,
    folds the >= 2^504 tail back with the precomputed 2^504 mod r constant
    (the accumulated value is < 128 r^2 ~ 2^517), and Montgomery-reduces
    back to 16-bit-limb Montgomery form.

Per element this replaces log2(C) = 7 butterfly field-muls with ~2/3 of a
field-mul of VPU work (the reduction) — the multiplies ride the MXU.
Composed with the existing four-step (Bailey) recursion (ntt/domain.py),
a 2^20 NTT becomes 3 matmul passes + 2 twiddle multiplies + transposes.

W entries are Montgomery-form (w~ = wR), so the matmul accumulates
sum w~ x~ = (sum w x) R^2 and ONE Montgomery reduction per output element
restores Montgomery form — the domain invariant every caller expects.

Replaces the serial_fft butterfly loop of the reference (ft.rs:291-333) at
block granularity; the decomposition mirrors parallel_fft (ft.rs:336-387).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import R, LIMB_BITS
from ..fields import FR
from ..fields.pallas_field import LANES, PallasFieldOps

# 8-bit planes per element: Fr = 16 16-bit limbs = 32 planes
PLANES = 2 * FR.L
# output digit rows from the plane convolution (digits 0 .. 2*PLANES-2,
# padded to 2*PLANES for even tiling)
OUT_DIGITS = 2 * PLANES
# fold point: digits >= FOLD_DIGIT are folded back via 2^(8*FOLD_DIGIT) mod r
FOLD_DIGIT = OUT_DIGITS - 1  # 63 -> 2^504
_K_FOLD = [
    (pow(1 << (8 * FOLD_DIGIT), 1, R) >> (LIMB_BITS * i)) & 0xFFFF
    for i in range(FR.L)
]

_MAX_EXP = 7  # DFT blocks up to 128 points (one MXU tile edge)


def _to_planes_np(limbs16: np.ndarray) -> np.ndarray:
    """(L, ...) 16-bit-limb uint32 -> (2L, ...) uint8 planes, plane
    p = 2l + h holding bits 8p..8p+7."""
    lo = (limbs16 & 0xFF).astype(np.uint8)
    hi = ((limbs16 >> 8) & 0xFF).astype(np.uint8)
    out = np.empty((2 * limbs16.shape[0],) + limbs16.shape[1:], np.uint8)
    out[0::2] = lo
    out[1::2] = hi
    return out


def _w_big_np(exp: int, inverse: bool) -> np.ndarray:
    """The (OUT_DIGITS*C, PLANES*C) u8 block-banded DFT-matmul LHS for a
    size-C = 2^exp block, Montgomery-form entries; the inverse direction
    folds in this block's own 1/C scaling (the _ntt_axis2 contract)."""
    from .domain import Domain

    dom = Domain(exp)
    C = 1 << exp
    base = dom.omega_inv if inverse else dom.omega
    scale = pow(C, -1, R) if inverse else 1
    ints = []
    for k in range(C):
        wk = pow(base, k, R)
        cur = scale % R
        for _ in range(C):  # row k: scale * base^(k*j), j = 0..C-1
            ints.append(cur)
            cur = cur * wk % R
    limbs = FR.encode(ints).reshape(FR.L, C, C)  # Montgomery 16-bit limbs
    planes = _to_planes_np(limbs)  # (PLANES, C, C) u8
    big = np.zeros((OUT_DIGITS, C, PLANES, C), np.uint8)
    for d in range(OUT_DIGITS):
        for b in range(max(0, d - PLANES + 1), min(PLANES, d + 1)):
            big[d, :, b, :] = planes[d - b]
    return big.reshape(OUT_DIGITS * C, PLANES * C)


# ---------------------------------------------------------------------------
# Pallas epilogue: digit ripple + tail fold + Montgomery reduce
# ---------------------------------------------------------------------------


def _reduce_body(ops: PallasFieldOps, y):
    """(OUT_DIGITS, 8, 128) s32 digit sums -> (L, 8, 128) u32 Montgomery."""
    y = y.astype(jnp.uint32)
    # base-256 carry ripple (values < 2^28 per row, total value < 2^517)
    digs = []
    carry = jnp.zeros(y.shape[1:], jnp.uint32)
    for i in range(OUT_DIGITS):
        t = y[i] + carry
        digs.append(t & 0xFF)
        carry = t >> 8
    # tail: value = lo + b * 2^(8*FOLD_DIGIT), b < 2^13
    b = digs[FOLD_DIGIT] + (carry << 8)
    # 16-bit limbs of lo (digits 0 .. FOLD_DIGIT-1)
    l16 = []
    for k in range(FOLD_DIGIT // 2):
        l16.append(digs[2 * k] + (digs[2 * k + 1] << 8))
    if FOLD_DIGIT % 2:
        l16.append(digs[FOLD_DIGIT - 1])
    while len(l16) < 2 * FR.L:
        l16.append(jnp.zeros_like(b))
    # + b * (2^(8*FOLD_DIGIT) mod r): b < 2^16 -> single-row conv
    for j, kj in enumerate(_K_FOLD):
        if kj == 0:
            continue
        p = b * np.uint32(kj)  # < 2^32 (16b x 16b)
        l16[j] = l16[j] + (p & 0xFFFF)
        l16[j + 1] = l16[j + 1] + (p >> 16)
    t, top = ops._ripple(jnp.stack(l16))
    # top carry is structurally zero (value < 2^512); mont_reduce the 2L rows
    return ops.mont_reduce(t)


def _make_reduce_kernel(interpret: bool):
    ops = PallasFieldOps(FR)

    def kernel(y_ref, out_ref):
        out_ref[:, 0] = _reduce_body(ops, y_ref[:, 0])

    def launch(y):
        """(OUT_DIGITS, B) s32 -> (L, B) u32 Montgomery, B % 1024 == 0."""
        B = y.shape[-1]
        nblk = B // LANES
        return pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[pl.BlockSpec(
                (OUT_DIGITS, 1, 8, 128), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )],
            out_specs=pl.BlockSpec(
                (FR.L, 1, 8, 128), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((FR.L, nblk, 8, 128), jnp.uint32),
            interpret=interpret,
        )(y.reshape(OUT_DIGITS, nblk, 8, 128)).reshape(FR.L, B)

    return launch


# ---------------------------------------------------------------------------
# the DFT block transform
# ---------------------------------------------------------------------------

_WBIG_CACHE = {}
_REDUCE = {}


def _wbig(exp: int, inverse: bool):
    key = (exp, inverse)
    if key not in _WBIG_CACHE:
        _WBIG_CACHE[key] = _w_big_np(exp, inverse)
    return _WBIG_CACHE[key]


def mxu_available() -> bool:
    """The matmul-DFT path: on for TPU backends, 'force' enables it on CPU
    with the reduce kernel in interpret mode (differential tests)."""
    from ..config import get_config
    from ..fields.pallas_field import pallas_enabled

    mode = get_config().ntt_mxu
    if mode == "off":
        return False
    if mode == "force":
        return True
    return pallas_enabled()


def _interpret() -> bool:
    from ..fields.pallas_field import pallas_enabled

    return not pallas_enabled()


def dft_axis2(exp: int, inverse: bool, x):
    """Size-2^exp DFT over axis -2 of (L, *lead, C, bt): the MXU matmul
    path. Drop-in for Domain._ntt_axis2 on exp <= 7 blocks (natural order
    in/out, inverse folds this block's 1/C)."""
    assert exp <= _MAX_EXP
    C = 1 << exp
    lead = x.shape[1:-2]
    bt = x.shape[-1]
    # planes: (L, *lead, C, bt) u32 -> (PLANES, C, T) u8 with T = lead*bt
    xm = jnp.moveaxis(x, -2, 1)  # (L, C, *lead, bt)
    xm = xm.reshape(FR.L, C, -1)
    T = xm.shape[-1]
    lo = (xm & 0xFF).astype(jnp.uint8)
    hi = ((xm >> 8) & 0xFF).astype(jnp.uint8)
    planes = jnp.stack([lo, hi], axis=1).reshape(2 * FR.L * C, T)
    w = jnp.asarray(_wbig(exp, inverse))  # (OUT_DIGITS*C, PLANES*C) u8
    y = jax.lax.dot_general(
        w, planes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (OUT_DIGITS*C, T) s32
    y = y.reshape(OUT_DIGITS, C * T)
    # pad the flattened batch to whole 1024-lane blocks for the epilogue
    n = C * T
    rem = (-n) % LANES
    if rem:
        y = jnp.pad(y, ((0, 0), (0, rem)))
    key = _interpret()
    if key not in _REDUCE:
        _REDUCE[key] = _make_reduce_kernel(key)
    out = _REDUCE[key](y)[:, :n]  # (L, C*T)
    out = out.reshape((FR.L, C) + lead + (bt,))
    return jnp.moveaxis(out, 1, -2)
