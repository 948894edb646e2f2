"""Curve instances: G1 over Fp, G2 over Fp2, plus host converters to/from
the pure-Python oracle's point representation.

On a real accelerator backend both G1 (over Fp) and G2 (over Fp2) use the
fused Pallas point kernels (curve/pallas_ops.py) for their hot batch ops;
on CPU (tests, virtual-mesh dry runs) they stay on the pure-XLA formulas.
Set KZG_TPU_NO_PALLAS=1 to force the XLA path everywhere."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import B_G1, B_G2, G1_GEN, G2_GEN
from ..fields import FP
from .ops import CurveOps, FpAdapter, Fp2Adapter

FPA = FpAdapter(FP)
FP2A = Fp2Adapter(FP)


from ..fields.pallas_field import pallas_enabled as _pallas_enabled

if _pallas_enabled():
    from .pallas_ops import PallasCurveOps

    G1 = PallasCurveOps(FPA, name="G1")
    G2 = PallasCurveOps(FP2A, name="G2")
else:
    G1 = CurveOps(FPA, name="G1")
    G2 = CurveOps(FP2A, name="G2")

# curve constants b (Montgomery, broadcastable)
B1_CONST = FPA.encode([B_G1])[:, 0]
B2_CONST = FP2A.encode([B_G2])[:, :, 0]


# ---- host converters (oracle <-> device) ----------------------------------

def g1_to_device(points):
    """List of oracle G1 points (None or (Fp, Fp)) -> batched Jacobian
    device point (X, Y, Z) with Z = 0 rows for infinity."""
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append(1)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(p[0].n)
            ys.append(p[1].n)
            zs.append(1)
    return (FPA.encode(xs), FPA.encode(ys), FPA.encode(zs))


def _is_affine_triple(point, bdim: int) -> bool:
    """Affine batches carry a boolean infinity mask as the third element;
    Jacobian batches carry a Z field element (limb axis present)."""
    return point[2].ndim == point[0].ndim - bdim


def g1_from_device(point):
    """Batched device point -> list of oracle points. Accepts either a
    Jacobian (X, Y, Z) batch or an affine (x, y, inf_mask) batch (the form
    stored in KZGParams / returned by to_affine)."""
    from ..oracle.field import Fp

    if _is_affine_triple(point, 1):
        x, y, inf = point
    else:
        x, y, inf = G1.to_affine(point)
    xs = FPA.decode(x)
    ys = FPA.decode(y)
    infs = np.asarray(inf).reshape(-1)
    return [None if i else (Fp(a), Fp(b)) for a, b, i in zip(xs, ys, infs)]


def g2_to_device(points):
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append((1, 0))
            ys.append((1, 0))
            zs.append((0, 0))
        else:
            xs.append((p[0].a.n, p[0].b.n))
            ys.append((p[1].a.n, p[1].b.n))
            zs.append((1, 0))
    return (FP2A.encode(xs), FP2A.encode(ys), FP2A.encode(zs))


def g2_from_device(point):
    from ..oracle.field import Fp2

    if _is_affine_triple(point, 2):
        x, y, inf = point
    else:
        x, y, inf = G2.to_affine(point)
    xs = FP2A.decode(x)
    ys = FP2A.decode(y)
    infs = np.asarray(inf).reshape(-1)
    return [
        None if i else (Fp2.from_ints(*a), Fp2.from_ints(*b))
        for a, b, i in zip(xs, ys, infs)
    ]


def g1_generator_device(n: int = 1):
    """(X, Y, Z) of n copies of the G1 generator."""
    return (
        FPA.encode([G1_GEN[0]] * n),
        FPA.encode([G1_GEN[1]] * n),
        FPA.encode([1] * n),
    )


def g2_generator_device(n: int = 1):
    return (
        FP2A.encode([G2_GEN[0]] * n),
        FP2A.encode([G2_GEN[1]] * n),
        FP2A.encode([(1, 0)] * n),
    )
