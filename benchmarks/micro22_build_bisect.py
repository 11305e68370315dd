"""Micro 22: bisect the REAL build (sorted path) on the settled flagship.

micro21 measured the build prefix at ~63 ms while its synthetic pieces
(sort 4.9 + row gather 3.5 + 6 scatters 14.9, micro2/micro20) sum to ~24 ms.
This times nested prefixes INSIDE _build_core's body (reimplemented here
step for step) to find the unaccounted ~30 ms.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro22_build_bisect.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10, warmup=2):
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
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import hashing
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    done = 0
    while done < 300:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled", flush=True)

    cfg, params, state = sim.cfg, sim.params, sim.state
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    dims = cfg.grid_dims
    cap = cfg.cell_capacity
    cap_p = sb._cap_pad(cap)
    n, dim = state.pos.shape
    h = params.smoothing_radius
    _FAR = sb._FAR

    def keys(s):
        origin = hashing.grid_origin(s.predicted, h)
        cell = jnp.floor((s.predicted - origin) / h).astype(jnp.int32)
        cell = jnp.clip(cell, 0, jnp.asarray(dims, jnp.int32) - 1)
        col = cell[:, 0] * S_pad + cell[:, 1] * gz + cell[:, 2]
        return col

    def sort(s):
        col = keys(s)
        iota = jnp.arange(n, dtype=jnp.int32)
        sorted_col, order = jax.lax.sort((col, iota), num_keys=1)
        return sorted_col, order

    def slots(s):
        sorted_col, order = sort(s)
        iota = jnp.arange(n, dtype=jnp.int32)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_col[1:] != sorted_col[:-1]])
        run_start = jax.lax.cummax(jnp.where(first, iota, 0))
        slot = iota - run_start
        ok = slot < cap
        flat = jnp.where(ok, slot * L + PAD + sorted_col, cap_p * L)
        return flat, order, ok

    def rowgather(s):
        flat, order, ok = slots(s)
        ids_f = jax.lax.bitcast_convert_type(s.ids, jnp.float32)[:, None]
        rows = jnp.concatenate([s.predicted, s.vel, s.pos, ids_f], axis=1)
        srows = jnp.take(rows, order, axis=0)
        return flat, srows, ok

    def scatter_k(k):
        def fn(s):
            flat, srows, ok = rowgather(s)
            planes = []
            for j in range(k):
                fill = _FAR if j < dim else 0.0
                out = jnp.full((cap_p * L + 1,), fill, jnp.float32)
                planes.append(out.at[flat].set(
                    srows[:, j], mode="promise_in_bounds",
                    unique_indices=True)[:-1].reshape(cap_p, L))
            return jnp.stack(planes), flat, srows, ok
        return fn

    def counts_too(s):
        planes, flat, srows, ok = scatter_k(6)(s)
        counts = jnp.sum(jnp.where(planes[0] < _FAR * 0.5, 1.0, 0.0),
                         axis=0, dtype=jnp.float32)[None, :]
        overflow = (n - jnp.sum(ok)).astype(jnp.int32)
        return planes, counts, flat, srows, overflow

    stages = [("keys", keys), ("sort", sort), ("slots", slots),
              ("rowgather", rowgather), ("scatter1", scatter_k(1)),
              ("scatter3", scatter_k(3)), ("scatter6", scatter_k(6)),
              ("counts", counts_too)]
    results = {"n": n, "note": "nested prefixes of the real sorted build; "
               "stage cost = diff between consecutive rows"}
    prev = 0.0
    for name, fn in stages:
        ms = timeit(jax.jit(fn), state)
        results[name] = round(ms, 2)
        print(f"{name:10s} {ms:7.2f} ms  (+{ms - prev:6.2f})", flush=True)
        prev = ms

    with open("benchmarks/micro22_build_bisect_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
