"""Mesh-sharded Pippenger MSM.

The reference's MSM is blst's thread-pooled bucket method behind
`multi_exp` (SURVEY.md §2.2); here the points/scalars axis is sharded over
the device mesh, every device runs the local vectorised Pippenger
(msm/pippenger.py), and the per-device partial sums — one Jacobian point
each, a few KB — are joined with an all_gather + log-depth point reduction.
This is the DP analog from SURVEY.md §5.8: the collective rides ICI and the
join cost is independent of N, so scaling efficiency is limited only by the
local kernel (target >= 80% at N>=2 hosts, BASELINE.md).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import FR
from ..curve import G1, G2
from ..msm.pippenger import _msm_impl, point_sum, pick_window


def _point_specs(curve, axis_name):
    """PartitionSpecs for an affine (x, y, inf) batch of this curve."""
    if curve is G2:
        coord = P(None, None, axis_name)
    else:
        coord = P(None, axis_name)
    return (coord, coord, P(axis_name))


def _local_msm_join(curve, axis_name, xa, ya, inf, s_mont, c):
    part = _msm_impl(curve, xa, ya, inf, FR.from_mont(s_mont), c)
    # gather the per-device partials (tiny) and tree-reduce on every device
    gathered = tuple(
        jax.lax.all_gather(t, axis_name, axis=t.ndim, tiled=False)
        for t in part
    )
    return point_sum(curve, gathered)


def make_sharded_msm(mesh: Mesh, axis_name: str, curve=G1, c: int | None = None):
    """Build a jitted sharded MSM: (points, scalars) block-sharded over
    `axis_name` -> replicated Jacobian point. Window size `c` fixed at build
    time (default: heuristic for the per-device shard size at call time)."""
    px, py, pinf = _point_specs(curve, axis_name)
    sspec = P(None, axis_name)
    out_spec = tuple(P() for _ in range(3))

    cache = {}

    def run(points, scalars_mont):
        n = points[0].shape[-1]
        n_dev = mesh.shape[axis_name]
        assert n % n_dev == 0, "pad points to a multiple of the mesh size"
        cc = c if c is not None else pick_window(n // n_dev)
        if cc not in cache:
            body = partial(_local_msm_join, curve, axis_name, c=cc)
            cache[cc] = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=(px, py, pinf, sspec), out_specs=out_spec,
                check_vma=False,
            ))
        return cache[cc](points[0], points[1], points[2], scalars_mont)

    run.sharding_points = tuple(NamedSharding(mesh, s) for s in (px, py, pinf))
    run.sharding_scalars = NamedSharding(mesh, sspec)
    return run


def pad_msm_inputs(curve, points, scalars_mont, n_dev: int):
    """Pad an affine point batch + scalars to a multiple of n_dev with
    infinity points / zero scalars (contributes nothing to the sum)."""
    n = points[0].shape[-1]
    npad = -(-n // n_dev) * n_dev
    if npad == n:
        return points, scalars_mont
    extra = npad - n

    def padc(t):
        pad = ((0, 0),) * (t.ndim - 1) + ((0, extra),)
        return jnp.pad(t, pad)

    x, y, inf = points
    x = padc(x)
    y = padc(y)
    inf = jnp.pad(inf, ((0, extra),), constant_values=True)
    s = padc(scalars_mont)
    return (x, y, inf), s
