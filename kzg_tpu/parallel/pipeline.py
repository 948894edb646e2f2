"""Sharded end-to-end KZG pipeline: commit + evaluate + single-point witness
for a degree-(2^exp - 1) polynomial, everything block-sharded over a device
mesh. This is BASELINE.json config 5's shape (multi-host commit + witness =
sharded Pippenger + all_to_all NTT) and the framework's flagship multi-chip
step.

Per step, for coefficients f sharded over the mesh and an opening point x:
  1. C = MSM(gs, f)                                (sharded Pippenger, psum-
                                                    style all_gather join)
  2. y = f(x)                                      (sharded dot: local
                                                    geometric powers + join)
  3. q = (f - y) / (X - x) by coset evaluation division in TRANSPOSED NTT
     order: coset_ntt_t(f), subtract y, multiply by 1/(coset_j - x)
     (local batch inversion), coset_intt_t -> quotient coefficients. The
     divisor never vanishes on the coset (x would need to equal gen*omega^j;
     the coset is disjoint from the omega-domain and from uniformly random
     challenge points with probability 1 - d/r).
  4. W = MSM(gs, q)

The quotient identity (f - f(x))/(X - x) is the reference's witness
definition (coeff_form.rs:66-81) — computed here with O(d log d / N) work
and three all_to_alls instead of a serial O(d) synthetic division.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import R as FR_MOD, FR_GENERATOR
from ..fields import FR
from ..curve import G1
from ..msm.pippenger import _msm_impl, point_sum, pick_window
from .ntt import (
    four_step_dif,
    four_step_dit,
    coset_scale_local,
    _split,
    _pow_dynamic_idx,
    _geom_row,
    _geom_row_dynamic_base,
)
from .msm import _local_msm_join


def _coset_points_local_t(exp: int, n_dev: int, axis_name: str):
    """(L, n/n_dev) Montgomery array of the coset points gen*omega^k at this
    device's TRANSPOSED-order eval indices k = d + R*k2."""
    n, r, log_r, c, c_local, omega = _split(exp, n_dev)
    d_idx = jax.lax.axis_index(axis_name)
    w_d = _pow_dynamic_idx(omega, d_idx)  # omega^d
    start = FR.mul(w_d, jnp.asarray(FR.encode([FR_GENERATOR])))
    return _geom_row(pow(omega, r, FR_MOD), start, c)  # gen*omega^(d + R*k2)


def _eval_at_local(coeffs_local, x_mont, exp: int, n_dev: int, axis_name: str):
    """f(x) with coefficients block-sharded: local dot against x^j for the
    device's global index range, then an all_gather join."""
    n = 1 << exp
    blk = n // n_dev
    d_idx = jax.lax.axis_index(axis_name)
    x_blk = FR.pow_static(x_mont, blk)  # x^blk (traced base, static exp)
    bits = jnp.stack([(d_idx >> i) & 1 for i in range(16)]).astype(jnp.uint32)[:, None]
    start = FR.pow_dynamic(x_blk, bits)  # x^(d*blk)
    powers = FR.mul(_geom_row_dynamic_base(x_mont, blk), start)
    local = FR.dot(coeffs_local, powers)  # (L,)
    parts = jax.lax.all_gather(local, axis_name, axis=1, tiled=False)  # (L, N)
    return FR.sum_last(parts)[..., None]  # (L, 1)


def make_commit_witness_step(mesh: Mesh, axis_name: str, exp: int,
                             msm_window: int | None = None):
    """Jitted sharded step: (gs_x, gs_y, gs_inf, coeffs, x_mont) ->
    (commit_jac, y_mont, witness_jac). All point/coefficient inputs are
    block-sharded on their last axis; x is replicated; outputs replicated."""
    n = 1 << exp
    n_dev = mesh.shape[axis_name]
    c = msm_window if msm_window is not None else pick_window(n // n_dev)
    from .ntt import prebuild_domains
    prebuild_domains(exp, n_dev)

    def body(gx, gy, ginf, coeffs, x_mont):
        # 1. commit
        commit = _local_msm_join(G1, axis_name, gx, gy, ginf, coeffs, c)
        # 2. y = f(x)
        y = _eval_at_local(coeffs, x_mont, exp, n_dev, axis_name)
        # 3. quotient by coset evaluation division (transposed order)
        fe = four_step_dif(
            coset_scale_local(coeffs, exp, n_dev, axis_name, False),
            exp, n_dev, axis_name, False, "transposed",
        )
        num = FR.sub(fe, y)  # f(coset_k) - y
        denom = FR.sub(_coset_points_local_t(exp, n_dev, axis_name), x_mont)
        q_e = FR.mul(num, FR.batch_inv(denom))
        q = coset_scale_local(
            four_step_dit(q_e, exp, n_dev, axis_name, True),
            exp, n_dev, axis_name, True,
        )
        # 4. witness
        wit = _local_msm_join(G1, axis_name, gx, gy, ginf, q, c)
        return commit, y, wit

    coord = P(None, axis_name)
    specs = (coord, coord, P(axis_name), coord, P(None, None))
    out_specs = (tuple(P() for _ in range(3)), P(None, None),
                 tuple(P() for _ in range(3)))
    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=specs,
                               out_specs=out_specs, check_vma=False))
    fn.point_sharding = NamedSharding(mesh, coord)
    fn.inf_sharding = NamedSharding(mesh, P(axis_name))
    return fn


def _eval_many_local(coeffs_local, xs_mont, exp: int, n_dev: int, axis_name: str):
    """f(x_i) for a replicated (L, k) point batch with block-sharded
    coefficients: local dot against each point's power row for this device's
    global index range, then an all_gather join. Returns replicated (L, k)."""
    n = 1 << exp
    blk = n // n_dev
    k = xs_mont.shape[-1]
    d_idx = jax.lax.axis_index(axis_name)
    x_blk = FR.pow_static(xs_mont, blk)  # x^blk, (L, k)
    bits = jnp.stack([(d_idx >> i) & 1 for i in range(16)]).astype(jnp.uint32)[:, None]
    start = FR.pow_dynamic(x_blk, bits)  # x^(d*blk), (L, k)
    rows = jnp.broadcast_to(xs_mont[..., None], (FR.L, k, blk))
    pw = FR.prefix_mul(rows)
    powers = jnp.concatenate([FR.one((k, 1)), pw[..., : blk - 1]], axis=-1)
    local = FR.sum_last(FR.mul(coeffs_local[:, None, :], powers))  # (L, k)
    local = FR.mul(local, start)
    parts = jax.lax.all_gather(local, axis_name, axis=2, tiled=False)  # (L,k,N)
    return FR.sum_last(parts)


def _replicated_slice0(coeffs, blk: int, axis_name: str):
    """Block-shard a small replicated (L, m) coefficient array (m <= blk):
    device 0 holds it zero-padded to blk, everyone else holds zeros."""
    d_idx = jax.lax.axis_index(axis_name)
    padded = _pad_blk(coeffs, blk)
    return jnp.where((d_idx == 0), padded, jnp.zeros_like(padded))


def _pad_blk(c, blk: int):
    if c.shape[-1] == blk:
        return c
    pad = ((0, 0),) * (c.ndim - 1) + ((0, blk - c.shape[-1]),)
    return jnp.pad(c, pad)


def make_batched_witness_step(mesh: Mesh, axis_name: str, exp: int, k: int,
                              msm_window: int | None = None):
    """Jitted sharded BATCHED opening (BASELINE config 3 at scale; reference
    create_witness_batched semantics, coeff_form.rs:83-111):
    (gs_x, gs_y, gs_inf, coeffs, xs_mont) ->
        (commit_jac, ys_mont (L,k), r_coeffs (L,k), witness_jac).

    The interpolated remainder r and vanishing Z are k-sized (replicated,
    identical on every device); the quotient (f - r)/Z is computed by the
    sharded coset-evaluation division with both numerator and Z run through
    the transposed four-step NTT. Requires k < n/n_dev."""
    n = 1 << exp
    n_dev = mesh.shape[axis_name]
    blk = n // n_dev
    assert k + 1 <= blk, "point count must fit in one coefficient block"
    c = msm_window if msm_window is not None else pick_window(blk)
    from .ntt import prebuild_domains
    from ..ntt import Domain
    prebuild_domains(exp, n_dev)
    for e in range(1, max(2, 2 * (k - 1).bit_length() + 2)):
        Domain(min(e, exp))  # small domains used by vanishing/interp builds

    from ..poly import vanishing_poly, lagrange_interpolation

    def body(gx, gy, ginf, coeffs, xs_mont):
        commit = _local_msm_join(G1, axis_name, gx, gy, ginf, coeffs, c)
        ys = _eval_many_local(coeffs, xs_mont, exp, n_dev, axis_name)
        # replicated small-poly algebra (identical on every device)
        z = vanishing_poly(xs_mont)           # degree k
        r = lagrange_interpolation(xs_mont, ys)  # degree k-1
        num_local = FR.sub(
            coeffs, _replicated_slice0(r.trimmed(), blk, axis_name)
        )
        z_local = _replicated_slice0(z.trimmed(), blk, axis_name)
        fe = four_step_dif(
            coset_scale_local(num_local, exp, n_dev, axis_name, False),
            exp, n_dev, axis_name, False, "transposed",
        )
        ze = four_step_dif(
            coset_scale_local(z_local, exp, n_dev, axis_name, False),
            exp, n_dev, axis_name, False, "transposed",
        )
        q_e = FR.mul(fe, FR.batch_inv(ze))
        q = coset_scale_local(
            four_step_dit(q_e, exp, n_dev, axis_name, True),
            exp, n_dev, axis_name, True,
        )
        wit = _local_msm_join(G1, axis_name, gx, gy, ginf, q, c)
        return commit, ys, r.trimmed(), wit

    coord = P(None, axis_name)
    specs = (coord, coord, P(axis_name), coord, P(None, None))
    out_specs = (tuple(P() for _ in range(3)), P(None, None), P(None, None),
                 tuple(P() for _ in range(3)))
    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=specs,
                               out_specs=out_specs, check_vma=False))
    fn.point_sharding = NamedSharding(mesh, coord)
    fn.inf_sharding = NamedSharding(mesh, P(axis_name))
    return fn


def make_eval_form_step(mesh: Mesh, axis_name: str, exp: int, m: int,
                        msm_window: int | None = None):
    """Jitted sharded EVAL-FORM commit + witness at domain index m
    (reference eval_form.rs:114-140 semantics, div_by_omega_i fully local +
    two small collectives): (lg_x, lg_y, lg_inf, evals) ->
    (commit_jac, y_mont, witness_jac). Lagrange-basis points and evals are
    block-sharded; m is static."""
    from ..ntt.domain import compute_omega

    n = 1 << exp
    n_dev = mesh.shape[axis_name]
    blk = n // n_dev
    c = msm_window if msm_window is not None else pick_window(blk)
    omega, _, _ = compute_omega(n)
    wm_np = FR.encode([pow(omega, m, FR_MOD)])
    wm_inv_np = FR.encode([pow(pow(omega, m, FR_MOD), -1, FR_MOD)])

    def body(lx, ly, linf, evals):
        commit = _local_msm_join(G1, axis_name, lx, ly, linf, evals, c)
        d_idx = jax.lax.axis_index(axis_name)
        gidx = d_idx * blk + jnp.arange(blk)
        start = _pow_dynamic_idx(pow(omega, blk, FR_MOD), d_idx)
        opow = _geom_row(omega, start, blk)  # omega^j, local block
        wm = jnp.asarray(wm_np)
        # y = evals[m] (owned by one device; masked sum + gather join)
        is_m = (gidx == m)
        local_y = FR.sum_last(jnp.where(is_m[None], evals, 0))  # (L,)
        y = FR.sum_last(
            jax.lax.all_gather(local_y, axis_name, axis=1, tiled=False)
        )[..., None]  # (L, 1)
        num = FR.sub(evals, y)
        denom = FR.sub(opow, wm)          # zero at j == m
        dinv = FR.batch_inv(denom)        # zero at j == m
        q = FR.mul(num, dinv)
        # diagonal term q_m = -(sum_j num_j omega^j dinv_j) * omega^{-m}
        terms = FR.mul(FR.mul(num, opow), dinv)
        local_t = FR.sum_last(terms)
        total = FR.sum_last(
            jax.lax.all_gather(local_t, axis_name, axis=1, tiled=False)
        )[..., None]
        qm = FR.neg(FR.mul(total, jnp.asarray(wm_inv_np)))
        q = jnp.where(is_m[None], jnp.broadcast_to(qm, q.shape), q)
        wit = _local_msm_join(G1, axis_name, lx, ly, linf, q, c)
        return commit, y, wit

    coord = P(None, axis_name)
    specs = (coord, coord, P(axis_name), coord)
    out_specs = (tuple(P() for _ in range(3)), P(None, None),
                 tuple(P() for _ in range(3)))
    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=specs,
                               out_specs=out_specs, check_vma=False))
    fn.point_sharding = NamedSharding(mesh, coord)
    fn.inf_sharding = NamedSharding(mesh, P(axis_name))
    return fn
