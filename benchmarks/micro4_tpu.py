"""Micro 4: is the v5e scatter tax per-ELEMENT or per-BYTE?

micro2 measured ~14 ns per scattered element (f32) with a ~2 ms fixed floor
per op. If the tax is per-element, packing two f32 feature planes into one
complex64 scatter halves the build's dominant cost (6 feature scatters,
PLAN round-3 item 2). This measures f32 vs c64 scatters at the flagship
shapes, plus the unpack (real/imag extraction) the c64 variant needs.

    python benchmarks/micro4_tpu.py
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
    size = 19_150_848  # ~ cap 48 x L at the flagship geometry
    key = jax.random.PRNGKey(0)
    idx = jax.random.permutation(key, size)[:n].astype(jnp.int32)
    idx = jnp.sort(idx)  # build scatters go in sorted-column order
    vals = jax.random.normal(key, (n, 6), jnp.float32)

    results = {"n": n, "size": size,
               "device": str(jax.devices()[0].device_kind)}

    @jax.jit
    def scatter_f32_x6(idx, vals):
        outs = []
        for j in range(6):
            out = jnp.zeros((size,), jnp.float32)
            outs.append(out.at[idx].set(vals[:, j], mode="promise_in_bounds",
                                        unique_indices=True))
        return outs

    results["six_f32_scatters"] = timeit(scatter_f32_x6, idx, vals)

    @jax.jit
    def scatter_c64_x3(idx, vals):
        outs = []
        for j in range(3):
            c = jax.lax.complex(vals[:, 2 * j], vals[:, 2 * j + 1])
            out = jnp.zeros((size,), jnp.complex64)
            outs.append(out.at[idx].set(c, mode="promise_in_bounds",
                                        unique_indices=True))
        return outs

    results["three_c64_scatters"] = timeit(scatter_c64_x3, idx, vals)

    @jax.jit
    def scatter_c64_x3_unpacked(idx, vals):
        outs = []
        for j in range(3):
            c = jax.lax.complex(vals[:, 2 * j], vals[:, 2 * j + 1])
            out = jnp.zeros((size,), jnp.complex64)
            s = out.at[idx].set(c, mode="promise_in_bounds",
                                unique_indices=True)
            outs.append(jnp.real(s))
            outs.append(jnp.imag(s))
        return outs

    results["three_c64_scatters_unpacked"] = timeit(
        scatter_c64_x3_unpacked, idx, vals)

    # one scatter of (n, 6) rows into a (size, 6) table + transpose to
    # plane-major, for comparison (micro2 said ~equal; re-check at v2 sizes)
    @jax.jit
    def scatter_rows(idx, vals):
        out = jnp.zeros((size, 6), jnp.float32)
        out = out.at[idx].set(vals, mode="promise_in_bounds",
                              unique_indices=True)
        return out.T

    results["one_row_scatter_T"] = timeit(scatter_rows, idx, vals)

    print(json.dumps(results, indent=1))
    with open("benchmarks/micro4_tpu_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
