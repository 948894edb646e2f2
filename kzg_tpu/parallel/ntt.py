"""Distributed four-step NTT over a JAX device mesh.

The reference's parallel FFT (src/ft.rs:336-387) decomposes a size-n FFT into
2^k sub-FFTs with a twiddled gather and an interleaving writeback — shared
memory only. SURVEY.md §5.7 identifies this as structurally the four-step
(Bailey) NTT; this module is its mesh-native realisation:

    n = R * C,  R = #devices.  Input x flat, block-sharded over devices.
    Viewing M[j1, j2] = x[j1*C + j2] (rows j1 = device blocks):

      T0  all_to_all transpose: device d holds M[:, d*C/R : (d+1)*C/R]
      A   local R-point NTT along j1 (root omega^C)     -> A[k1, j2]
      TW  twiddle A[k1, j2] *= omega^(j2*k1)            (on-device table)
      T1  all_to_all transpose back: device d holds row k1 = d
      B   local C-point NTT along j2 (root omega^R)     -> Y[k1, k2]

    y[k1 + R*k2] = Y[k1, k2], so the natural output is "transposed order"
    (device d holds y at indices d + R*k2); a third all_to_all + local
    permute yields the standard flat order. Pointwise algebra (polynomial
    multiply, coset division) works in any fixed order, so forward/inverse
    pairs use the transposed variants and skip two transposes: the inverse
    consuming transposed order is the mirror decimation-in-time pipeline
    (B' -> row twiddle -> transpose -> A' -> transpose), not the same code.

All collectives are XLA all_to_alls riding ICI — no custom transport,
matching SURVEY.md §5.8's design note.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import R as FR_MOD, FR_ROOT_OF_UNITY, FR_TWO_ADICITY, FR_GENERATOR
from ..fields import FR
from ..ntt import Domain


def _pow_dynamic_idx(base_int: int, idx, max_bits: int = 16):
    """(L, 1) Montgomery array of base^idx for a traced nonneg int idx."""
    w = jnp.asarray(FR.encode([base_int]))
    bits = jnp.stack(
        [(idx >> i) & 1 for i in range(max_bits)]
    ).astype(jnp.uint32)[:, None]
    return FR.pow_dynamic(w, bits)


def _geom_row(base_int: int, start, count: int):
    """(L, count) Montgomery row [start * base^i for i in range(count)];
    start is an (L, 1) device array."""
    b = jnp.asarray(FR.encode([base_int]))
    bb = jnp.broadcast_to(b, (FR.L, count))
    pw = FR.prefix_mul(bb)  # base^1 .. base^count
    loc = jnp.concatenate([FR.one((1,)), pw[:, : count - 1]], axis=1)
    return FR.mul(loc, start)


def _block_twiddle(omega_int: int, r: int, c_local: int, d_idx):
    """(L, r, c_local) table of omega^(k1 * j2) for this device's j2 block
    [d_idx*c_local, (d_idx+1)*c_local). d_idx is traced."""
    start = _pow_dynamic_idx(pow(omega_int, c_local, FR_MOD), d_idx)
    row = _geom_row(omega_int, start, c_local)  # omega^{j2}
    rep = jnp.broadcast_to(row[:, None, :], (FR.L, r, c_local))
    pk = jnp.swapaxes(FR.prefix_mul(jnp.swapaxes(rep, 1, 2)), 1, 2)
    ones = jnp.broadcast_to(FR.one((1, 1)), (FR.L, 1, c_local))
    return jnp.concatenate([ones, pk[:, : r - 1, :]], axis=1)


def _local_ntt_axis(dom: Domain, x, axis: int, inverse: bool):
    x = jnp.moveaxis(x, axis, -1)
    x = dom.intt(x) if inverse else dom.ntt(x)
    return jnp.moveaxis(x, -1, axis)


def _split(exp: int, n_dev: int):
    n = 1 << exp
    r = n_dev
    log_r = (r - 1).bit_length()
    assert 1 << log_r == r, "device count must be a power of two"
    c = n // r
    c_local = c // r
    assert c_local * r == c, "need n >= n_dev^2"
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - exp), FR_MOD)
    return n, r, log_r, c, c_local, omega


def prebuild_domains(exp: int, n_dev: int):
    """Instantiate the local Domains OUTSIDE any trace. Domain caches device
    twiddle tables at first construction; building one inside a shard_map
    body would cache tracers (UnexpectedTracerError). Call this from wrapper
    builders before jitting."""
    log_r = (n_dev - 1).bit_length()
    Domain(log_r)
    Domain(exp - log_r)


def four_step_dif(x_local, exp: int, n_dev: int, axis_name: str,
                  inverse: bool = False, order: str = "standard"):
    """Forward-structured (decimation-in-frequency) distributed transform.
    x_local: (L, n/n_dev) standard-order block. Output in `order`
    ('standard': 3 all_to_alls; 'transposed': 2)."""
    n, r, log_r, c, c_local, omega = _split(exp, n_dev)
    if inverse:
        omega = pow(omega, -1, FR_MOD)
    d_idx = jax.lax.axis_index(axis_name)
    dom_r = Domain(log_r)
    dom_c = Domain(exp - log_r)

    # T0: row-block -> column-block
    m = x_local.reshape(FR.L, 1, r, c_local)
    m = jax.lax.all_to_all(m, axis_name, split_axis=2, concat_axis=1,
                           tiled=False)
    m = m.reshape(FR.L, r, c_local)  # M[j1, j2 in block d]

    # A: R-point transform along j1
    m = _local_ntt_axis(dom_r, m, 1, inverse)

    # TW: omega^{j2 k1}
    m = FR.mul(m, _block_twiddle(omega, r, c_local, d_idx))

    # T1: column-block -> row k1 = d
    m = m.reshape(FR.L, r, 1, c_local)
    m = jax.lax.all_to_all(m, axis_name, split_axis=1, concat_axis=2,
                           tiled=False)
    m = m.reshape(FR.L, 1, c)  # A'[k1 = d, all j2]

    # B: C-point transform along j2
    m = _local_ntt_axis(dom_c, m, 2, inverse)  # Y[k1 = d, k2]

    if order == "transposed":
        return m.reshape(FR.L, c)

    # T2: rows-of-k1 -> standard flat (sharded by k2 block)
    m = m.reshape(FR.L, 1, r, c_local)
    m = jax.lax.all_to_all(m, axis_name, split_axis=2, concat_axis=1,
                           tiled=False)
    m = m.reshape(FR.L, r, c_local)        # [k1, k2_local]
    m = jnp.swapaxes(m, 1, 2)              # local flat = k2_local*R + k1
    return m.reshape(FR.L, c)


def four_step_dit(y_local, exp: int, n_dev: int, axis_name: str,
                  inverse: bool = True):
    """Mirror (decimation-in-time) transform CONSUMING transposed order and
    emitting standard order (2 all_to_alls). With inverse=True this is the
    exact inverse of four_step_dif(..., order='transposed'):

        x[j1 C + j2] = (1/n) sum_{k1} w^{-j1 C k1} w^{-j2 k1}
                        [ sum_{k2} y[k1 + R k2] w^{-R j2 k2} ]
    """
    n, r, log_r, c, c_local, omega = _split(exp, n_dev)
    if inverse:
        omega = pow(omega, -1, FR_MOD)
    d_idx = jax.lax.axis_index(axis_name)
    dom_r = Domain(log_r)
    dom_c = Domain(exp - log_r)

    # input: row k1 = d, local index k2
    m = y_local.reshape(FR.L, 1, c)

    # B': C-point transform along k2 -> B[k1 = d, j2]
    m = _local_ntt_axis(dom_c, m, 2, inverse)

    # row twiddle: *= omega^{j2 * d}
    w_d = _pow_dynamic_idx(omega, d_idx)  # omega^d
    tw = _geom_row_dynamic_base(w_d, c)   # omega^{d * j2}
    m = FR.mul(m, tw[:, None, :])

    # transpose: rows-of-k1 -> column-block of j2 (all k1 local)
    m = m.reshape(FR.L, 1, r, c_local)
    m = jax.lax.all_to_all(m, axis_name, split_axis=2, concat_axis=1,
                           tiled=False)
    m = m.reshape(FR.L, r, c_local)  # [k1, j2 in block d]

    # A': R-point transform along k1 -> x[j1, j2 block]
    m = _local_ntt_axis(dom_r, m, 1, inverse)

    # T0^-1: column-block -> row-block (standard order)
    m = m.reshape(FR.L, r, 1, c_local)
    m = jax.lax.all_to_all(m, axis_name, split_axis=1, concat_axis=2,
                           tiled=False)
    m = m.reshape(FR.L, c)  # x[d*C + j2]
    return m


def _geom_row_dynamic_base(base, count: int):
    """(L, count) row [base^i for i in range(count)] where base is a traced
    (L, 1) element — log-depth prefix products."""
    rep = jnp.broadcast_to(base, (FR.L, count))
    pw = FR.prefix_mul(rep)
    return jnp.concatenate([FR.one((1,)), pw[:, : count - 1]], axis=1)


def coset_scale_local(x_local, exp: int, n_dev: int, axis_name: str,
                      inverse: bool):
    """Elementwise multiply by gen^j (or gen^{-j}) at global flat index
    j = d*(n/n_dev) + local — the sharded distribute_powers
    (reference ft.rs:142-178)."""
    n = 1 << exp
    blk = n // n_dev
    g = pow(FR_GENERATOR, -1, FR_MOD) if inverse else FR_GENERATOR
    d_idx = jax.lax.axis_index(axis_name)
    start = _pow_dynamic_idx(pow(g, blk, FR_MOD), d_idx)
    return FR.mul(x_local, _geom_row(g, start, blk))


class ShardedDomain:
    """Sharded evaluation domain: jitted mesh transforms for one 2^exp size.

    Standard-order API mirrors ntt/domain.py: ntt/intt/coset_ntt/coset_intt
    map a block-sharded (L, n) array to a block-sharded (L, n) array.
    Transposed-order variants (ntt_t / intt_t, and coset_*_t) skip the final/
    initial transpose for fused pointwise pipelines.
    """

    def __init__(self, mesh: Mesh, axis_name: str, exp: int):
        self.mesh = mesh
        self.axis_name = axis_name
        self.exp = exp
        self.d = 1 << exp
        self.n_dev = mesh.shape[axis_name]
        self.spec = P(None, axis_name)
        self.sharding = NamedSharding(mesh, self.spec)
        a = axis_name
        nd = self.n_dev
        prebuild_domains(exp, nd)

        def smap(body):
            return jax.jit(jax.shard_map(
                body, mesh=mesh, in_specs=(self.spec,), out_specs=self.spec,
                check_vma=False,
            ))

        self.ntt = smap(lambda x: four_step_dif(x, exp, nd, a, False, "standard"))
        self.intt = smap(lambda x: four_step_dif(x, exp, nd, a, True, "standard"))
        self.ntt_t = smap(lambda x: four_step_dif(x, exp, nd, a, False, "transposed"))
        self.intt_t = smap(lambda x: four_step_dit(x, exp, nd, a, True))
        self.coset_ntt = smap(lambda x: four_step_dif(
            coset_scale_local(x, exp, nd, a, False), exp, nd, a, False, "standard"))
        self.coset_intt = smap(lambda x: coset_scale_local(
            four_step_dif(x, exp, nd, a, True, "standard"), exp, nd, a, True))
        self.coset_ntt_t = smap(lambda x: four_step_dif(
            coset_scale_local(x, exp, nd, a, False), exp, nd, a, False, "transposed"))
        self.coset_intt_t = smap(lambda x: coset_scale_local(
            four_step_dit(x, exp, nd, a, True), exp, nd, a, True))

    def shard(self, arr):
        """Place a host/replicated (L, n) array into the block sharding."""
        return jax.device_put(arr, self.sharding)
