"""On-chip Pallas bitonic key/value sort.

The reference sorts its particle permutation with a global bitonic network:
½·log₂N·(log₂N+1) = 136 separate GPU dispatches at N = 2¹⁶, one per
compare-exchange stage, with global synchronization between stages
(/root/reference/assets/bitonic_sort.wgsl:23-46; stage schedule generated at
/root/reference/src/fluid_compute.rs:251-273). On TPU the whole array fits in
VMEM (even 1M pairs = 8 MB), so the entire network runs as ONE kernel with
zero global synchronization: each stage's XOR-partner exchange
(j = i ^ block) becomes a pair of sublane/lane rolls plus a select —

* partner distance k < 128  → within-row lane roll (XOR of the low 7 bits
  never crosses a 128-lane row);
* partner distance k ≥ 128 → row (sublane) roll by k/128, same lane.

Keys are int32 (cell ids / hashes); values carry the permutation. Non-power-
of-two n pads with INT32_MAX keys (the reference's INF sentinel trick,
bitonic_sort.wgsl:4 — except the reference simply requires power-of-two N,
src/fluid_compute.rs:15).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128
_KEY_MAX = jnp.iinfo(jnp.int32).max


def _partner(x: Array, k: int, up: Array) -> Array:
    """Value of each element's XOR-partner at distance k (k a power of 2).

    up = (i & k) == 0 → partner is at i + k, else i - k. Rolls never wrap
    across a meaningful boundary because XOR keeps i and i^k inside the same
    aligned 2k block."""
    if k < _LANES:
        # pltpu.roll needs non-negative shifts: roll by L-k ≡ roll by -k
        fwd = pltpu.roll(x, _LANES - k, axis=1)
        bwd = pltpu.roll(x, k, axis=1)
    else:
        r = k // _LANES
        rows = x.shape[0]
        fwd = pltpu.roll(x, rows - r, axis=0)
        bwd = pltpu.roll(x, r, axis=0)
    return jnp.where(up, fwd, bwd)


def _sort_kernel(keys_ref, vals_ref, out_keys_ref, out_vals_ref, *, n_pad):
    rows = n_pad // _LANES
    keys = keys_ref[:]
    vals = vals_ref[:]
    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    idx = row_id * _LANES + lane_id

    d = 2
    while d <= n_pad:
        k = d // 2
        while k >= 1:
            up = (idx & k) == 0
            ascending = (idx & d) == 0
            pk = _partner(keys, k, up)
            pv = _partner(vals, k, up)
            # my element should be the min of the pair iff (I'm the lower
            # index) == (this block sorts ascending). Strict comparisons on
            # both sides: equal keys never swap (keeps the exchange
            # symmetric). Logical form — Mosaic can't select between i1s.
            want_min = up == ascending
            take = (want_min & (pk < keys)) | (~want_min & (pk > keys))
            keys = jnp.where(take, pk, keys)
            vals = jnp.where(take, pv, vals)
            k //= 2
        d *= 2

    out_keys_ref[:] = keys
    out_vals_ref[:] = vals


def sort_pairs(keys: Array, values: Array, interpret: bool = False):
    """Sort int32 (keys, values) by key, ascending. Returns (keys, values)
    of the original length n. Runs entirely in VMEM — n·8 bytes must fit
    (≈1.9M pairs on a 16 MB core)."""
    n = keys.shape[0]
    n_pad = max(_LANES * 8, 1 << (n - 1).bit_length())
    # Mosaic's scoped-VMEM stack holds several live stage temporaries on
    # top of the two arrays; 64k pairs is the observed safe bound on v5e
    # (128k needs 16.87M scoped vmem vs the 16M stack cap, and the cap is
    # not raised by CompilerParams.vmem_limit_bytes).
    if n_pad > 65536:
        raise ValueError(f"n={n} too large for the in-VMEM sort (max 65536)")

    keys_p = jnp.full((n_pad,), _KEY_MAX, jnp.int32).at[:n].set(
        keys.astype(jnp.int32))
    vals_p = jnp.zeros((n_pad,), jnp.int32).at[:n].set(
        values.astype(jnp.int32))
    rows = n_pad // _LANES

    kernel = functools.partial(_sort_kernel, n_pad=n_pad)
    out_keys, out_vals = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
                   jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)),
        # stage temporaries push past the default 16 MB scoped budget at
        # 128k pairs (measured: 16.87M needed)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(24 * n_pad, 16 * 2**20)),
        interpret=interpret,
    )(keys_p.reshape(rows, _LANES), vals_p.reshape(rows, _LANES))
    return out_keys.reshape(-1)[:n], out_vals.reshape(-1)[:n]


def argsort_keys(keys: Array, interpret: bool = False):
    """The reference's use case: sort a permutation by cell keys
    (bitonic_sort.wgsl keys particle_cell_indicies[particle_indicies[i]]).
    Returns (sorted_keys, order)."""
    n = keys.shape[0]
    order = jnp.arange(n, dtype=jnp.int32)
    return sort_pairs(keys, order, interpret=interpret)
