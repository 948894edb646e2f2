"""Curve instances: G1 over Fp, G2 over Fp2, plus host converters to/from
the pure-Python oracle's point representation."""

import numpy as np
import jax.numpy as jnp

from ..constants import B_G1, B_G2, G1_GEN, G2_GEN
from ..fields import FP
from .ops import CurveOps, FpAdapter, Fp2Adapter

FPA = FpAdapter(FP)
FP2A = Fp2Adapter(FP)

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


def g1_from_device(point):
    """Batched Jacobian device point -> list of oracle points."""
    from ..oracle.field import Fp

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
