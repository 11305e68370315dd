"""Micro 20: complex64-packed feature scatters, on TPU.

The build's 6 f32 feature scatters are the measured wall of every
rebuild-per-step formulation (~22-26 ms at 256k; micro18: per-ELEMENT
~14-21 ns, index order irrelevant, row/window packing loses). complex64 is
the one 8-byte element type TPU XLA supports: if the scatter loop prices
per ELEMENT (not per byte), packing two f32 features into one complex64
halves the element count — 3 scatters instead of 6 — at the cost of one
bulk deinterleave (bitcast + minor-2 transpose) to recover the kernels'
f32 plane layout.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro20_c64_scatter.py
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

    results = {"n": n, "cap": cap, "L": L,
               "backend": jax.default_backend()}

    def rec(name, val):
        results[name] = round(val, 3)
        print(name, round(val, 2), flush=True)

    @jax.jit
    def six_f32(flat, vals):
        outs = []
        for j in range(6):
            fill = 1.0e15 if j < 3 else 0.0
            out = jnp.full((size,), fill, jnp.float32)
            outs.append(out.at[flat].set(
                vals[:, j], mode="promise_in_bounds", unique_indices=True))
        return outs

    rec("six_f32_scatters", timeit(six_f32, flat, vals6))

    def c64_scatters(flat, vals):
        # plane pairing (px,py) (pz,vx) (vy,vz); fills FAR+iFAR / FAR+0i / 0
        fills = [jnp.complex64(1.0e15 + 1.0e15j),
                 jnp.complex64(1.0e15 + 0.0j),
                 jnp.complex64(0.0 + 0.0j)]
        outs = []
        for p in range(3):
            v = jax.lax.complex(vals[:, 2 * p], vals[:, 2 * p + 1])
            out = jnp.full((size,), fills[p], jnp.complex64)
            outs.append(out.at[flat].set(
                v, mode="promise_in_bounds", unique_indices=True))
        return outs

    rec("three_c64_scatters", timeit(jax.jit(c64_scatters), flat, vals6))

    @jax.jit
    def c64_full(flat, vals):
        # scatters + deinterleave back to 6 f32 planes (cap, L)
        outs = c64_scatters(flat, vals)
        planes = []
        for o in outs:
            f = jax.lax.bitcast_convert_type(
                o[:-1].reshape(cap, L), jnp.float32)   # (cap, L, 2)
            planes.append(jnp.moveaxis(f, -1, 0))      # (2, cap, L)
        return jnp.concatenate(planes)                  # (6, cap, L)

    rec("three_c64_plus_deinterleave", timeit(c64_full, flat, vals6))

    @jax.jit
    def one_f32(flat, vals):
        out = jnp.zeros((size,), jnp.float32)
        return out.at[flat].set(
            vals[:, 0], mode="promise_in_bounds", unique_indices=True)

    rec("one_f32_scatter", timeit(one_f32, flat, vals6))

    @jax.jit
    def one_c64(flat, vals):
        v = jax.lax.complex(vals[:, 0], vals[:, 1])
        out = jnp.zeros((size,), jnp.complex64)
        return out.at[flat].set(
            v, mode="promise_in_bounds", unique_indices=True)

    rec("one_c64_scatter", timeit(one_c64, flat, vals6))

    # correctness spot-check of the full pipeline
    planes = np.asarray(c64_full(flat, vals6))
    f = np.asarray(flat)
    v = np.asarray(vals6)
    idx = np.asarray([0, n // 2, n - 1])
    for j in range(6):
        got = planes[j].reshape(-1)[f[idx] % (cap * L)]
        np.testing.assert_array_equal(got, v[idx, j])
    results["correct"] = True

    print(json.dumps(results))
    with open("benchmarks/micro20_c64_scatter_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
