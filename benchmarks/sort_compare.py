"""Pallas bitonic sort vs XLA sort on the real chip — the measured basis
for the production build's sort choice (VERDICT r1 item 5: 'wire the Pallas
sort in, or commit a measurement justifying argsort').

The build needs (sorted_keys, permutation) from int32 cell ids. Candidates:

- jax.lax.sort((keys, iota))  — what the build uses (ops XLA's sort HLO)
- jnp.argsort + take          — two ops
- ops.pallas.bitonic_sort.sort_pairs — in-VMEM single-kernel bitonic net
  (the reference's algorithm, fused from 136 dispatches to one)

    python benchmarks/sort_compare.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from water_sandbox_tpu.ops.pallas import bitonic_sort


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", flush=True)
    results = {}

    lax_sort = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    argsort = jax.jit(lambda k: jnp.argsort(k))
    pallas_sort = jax.jit(
        lambda k, v: bitonic_sort.sort_pairs(k, v))

    for n in (16_384, 65_536, 131_072, 265_302):
        keys = jnp.asarray(rng.integers(0, 400_000, n, dtype=np.int32))
        vals = jnp.arange(n, dtype=jnp.int32)
        row = {}
        row["lax_sort_kv"] = round(timeit(lax_sort, keys, vals), 3)
        row["argsort"] = round(timeit(argsort, keys), 3)
        if n <= 65_536:  # in-VMEM network cap
            try:
                sk, sv = pallas_sort(keys, vals)
                ref_k, _ = lax_sort(keys, vals)
                assert bool(jnp.all(sk == ref_k)), "pallas sort mismatch"
                row["pallas_bitonic_kv"] = round(
                    timeit(pallas_sort, keys, vals), 3)
            except Exception as e:
                row["pallas_bitonic_kv"] = f"ERROR: {e}"[:120]
        results[str(n)] = row
        print(n, row, flush=True)

    with open("benchmarks/sort_compare_results.json", "w") as f:
        json.dump({"device": str(dev), "results": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
