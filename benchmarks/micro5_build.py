"""Micro 5: v2 build-stage costs on TPU — where did build 37 -> 61.6 ms go?

Times each stage of ops/pallas/sph_bucket._build_slab_buckets in isolation
at the flagship 256k geometry, plus A/B of the suspected regression: scatter
into jnp.zeros vs jnp.full(_FAR) init buffers (c64 packing is dead —
complex64 scatter is UNIMPLEMENTED on the TPU backend, see micro4).

    python benchmarks/micro5_build.py
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
    L = 468_480  # ~ flagship v2 geometry
    size = cap * L + 1
    key = jax.random.PRNGKey(0)
    col = jnp.sort(jax.random.randint(key, (n,), 0, L - 1, jnp.int32))
    slot = jax.random.randint(key, (n,), 0, cap, jnp.int32)
    flat = slot * L + col
    vals = jax.random.normal(key, (n, 6), jnp.float32)

    results = {"n": n, "cap": cap, "L": L}

    def rec(name, val):
        results[name] = val
        print(name, round(val, 2), flush=True)

    def scatter_with(fill):
        @jax.jit
        def fn(flat, vals):
            outs = []
            for j in range(6):
                out = jnp.full((size,), fill, jnp.float32)
                outs.append(out.at[flat].set(
                    vals[:, j], mode="promise_in_bounds",
                    unique_indices=True))
            return outs
        return fn

    rec("six_scatters_zeros", timeit(scatter_with(0.0), flat, vals))
    rec("six_scatters_far", timeit(scatter_with(1.0e15), flat, vals))

    @jax.jit
    def mixed(flat, vals):
        outs = []
        for j in range(6):
            fill = 1.0e15 if j < 3 else 0.0
            out = jnp.full((size,), fill, jnp.float32)
            outs.append(out.at[flat].set(
                vals[:, j], mode="promise_in_bounds", unique_indices=True))
        return outs

    rec("six_scatters_mixed", timeit(mixed, flat, vals))

    iota = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def sort_pair(col):
        return jax.lax.sort((col, iota), num_keys=1)

    rec("sort", timeit(sort_pair, col))

    @jax.jit
    def row_gather(vals, order):
        return jnp.take(vals, order, axis=0)

    _, order = sort_pair(col)
    rec("row_gather6", timeit(row_gather, vals, order))

    @jax.jit
    def counts_add(col):
        return jnp.minimum(
            jnp.zeros((1, L), jnp.float32).at[0, col].add(
                1.0, mode="promise_in_bounds"), float(cap))

    rec("counts_add", timeit(counts_add, col))

    @jax.jit
    def addr_scatter(order, flat):
        return jnp.zeros((n,), jnp.int32).at[order].set(
            flat, unique_indices=True)

    rec("addr_scatter", timeit(addr_scatter, order, flat))

    # occupancy bounds at the real flagship geometry (isolated-jit cost)
    from water_sandbox_tpu.models import scenes
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb
    cfg, _, _ = scenes.build("moving-container-256k")
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, Lx = g[:8]
    counts_l = jnp.zeros((1, Lx), jnp.float32).at[0, PAD:PAD + n].set(1.0)

    @jax.jit
    def occ(c):
        return sb.occupancy_bounds(c, g)

    rec("occupancy_bounds", timeit(occ, counts_l))

    print(json.dumps(results, indent=1))
    with open("benchmarks/micro5_build_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
