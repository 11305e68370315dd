"""Micro 8: packed-row scatter vs six feature scatters, on TPU.

The build pays ~6 independent feature scatters (measured ~2 ms fixed +
~14 ns/element each, benchmarks/micro2_tpu_results.json). Gathers are
per-INDEX priced (multi-feature windows ~free) — if scatter prices the
same way, ONE scatter of (n, 8) feature rows into a (size, 8) buffer plus
a (size, 8) -> (8, size) transpose-copy should beat six scatters by ~4x.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro8_packed_scatter.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = 266_112
    cap = 48
    L = 468_480
    size = cap * L + 1
    key = jax.random.PRNGKey(0)
    col = jnp.sort(jax.random.randint(key, (n,), 0, L - 1, jnp.int32))
    slot = jax.random.randint(key, (n,), 0, cap, jnp.int32)
    flat = slot * L + col
    vals6 = jax.random.normal(key, (n, 6), jnp.float32)
    vals8 = jax.random.normal(key, (n, 8), jnp.float32)

    results = {"n": n, "cap": cap, "L": L}

    def rec(name, val):
        results[name] = round(val, 3)
        print(name, round(val, 2), flush=True)

    @jax.jit
    def six_scatters(flat, vals):
        outs = []
        for j in range(6):
            fill = 1.0e15 if j < 3 else 0.0
            out = jnp.full((size,), fill, jnp.float32)
            outs.append(out.at[flat].set(
                vals[:, j], mode="promise_in_bounds", unique_indices=True))
        return outs

    rec("six_scatters", timeit(six_scatters, flat, vals6))

    @jax.jit
    def row_scatter8(flat, vals):
        out = jnp.zeros((size, 8), jnp.float32)
        return out.at[flat].set(
            vals, mode="promise_in_bounds", unique_indices=True)

    rec("row_scatter8", timeit(row_scatter8, flat, vals8))

    @jax.jit
    def row_scatter8_t(flat, vals):
        out = jnp.zeros((size, 8), jnp.float32)
        out = out.at[flat].set(
            vals, mode="promise_in_bounds", unique_indices=True)
        return jnp.transpose(out)          # (8, size) feature-major copy

    rec("row_scatter8_transpose", timeit(row_scatter8_t, flat, vals8))

    @jax.jit
    def row_scatter6_t(flat, vals):
        out = jnp.zeros((size, 6), jnp.float32)
        out = out.at[flat].set(
            vals, mode="promise_in_bounds", unique_indices=True)
        return jnp.transpose(out)

    rec("row_scatter6_transpose", timeit(row_scatter6_t, flat, vals6))

    # the fill problem: position planes need _FAR fill, a transpose of a
    # zeros-init packed buffer gives 0 -- add the sentinel via a where on
    # an occupancy mask instead (one extra elementwise pass over 6 planes)
    @jax.jit
    def row_scatter6_t_fill(flat, vals):
        out = jnp.zeros((size, 8), jnp.float32)
        out = out.at[flat].set(
            jnp.concatenate([vals, jnp.ones((n, 2), jnp.float32)], 1),
            mode="promise_in_bounds", unique_indices=True)
        t = jnp.transpose(out)
        occ = t[7] > 0.0
        planes = jnp.where(occ[None, :], t[:6], 1.0e15)
        return planes

    rec("row_scatter6_t_far_fill", timeit(row_scatter6_t_fill, flat, vals6))

    print(json.dumps(results))
    with open("benchmarks/micro8_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
