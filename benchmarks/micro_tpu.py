"""Microbenchmarks for the primitives that dominate the 256k step.

Round-1 ledger (PLAN.md) said: build (argsort + scatters) ~22 ms, 5 plane->
particle gather-backs ~43 ms, kernels ~46 ms. This script measures each
primitive in isolation on the real chip so the round-2 redesign (state
layout, sort strategy, gather addressing) is driven by data, not guesses.

Run: cd /root/repo && python benchmarks/micro_tpu.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 265_302           # moving-container-256k particle count
CAP = 24
GX, S_PAD = 100, 3712  # its slab geometry (grid 100x60x60 -> S=3600)
L = GX * S_PAD         # un-end-padded plane length
KEY_MAX = L


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    # axon tunnel: block_until_ready doesn't reliably block; fetch a scalar
    jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x.ravel()[0])),
                           out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x.ravel()[0])),
                           out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    results = {}
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", flush=True)

    keys = jnp.asarray(rng.integers(0, KEY_MAX, N, dtype=np.int32))
    vals = [jnp.asarray(rng.standard_normal(N), np.float32) for _ in range(7)]
    plane = jnp.asarray(rng.standard_normal(CAP * L), np.float32)
    rnd_idx = jnp.asarray(rng.integers(0, CAP * L, N, dtype=np.int32))
    srt_idx = jnp.sort(rnd_idx)
    small_idx = jnp.asarray(rng.permutation(N).astype(np.int32))

    bench = {}

    bench["argsort_n"] = jax.jit(lambda k: jnp.argsort(k))
    bench["sort_kv1"] = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    bench["sort_kv7"] = jax.jit(
        lambda k, *vs: jax.lax.sort((k,) + vs, num_keys=1))

    # per-particle random gather from a small (1 MB) source
    bench["gather_small_random"] = jax.jit(lambda v, i: jnp.take(v, i))
    # plane -> particle gather (39 MB source), random vs sorted addresses
    bench["gather_plane_random"] = jax.jit(lambda p, i: jnp.take(p, i))
    bench["gather_plane_sorted"] = jax.jit(lambda p, i: jnp.take(p, i))
    bench["gather_plane_sorted_hint"] = jax.jit(lambda p, i: p.at[i].get(
        indices_are_sorted=True, unique_indices=True, mode="promise_in_bounds"))

    def scatter_plane(v, i):
        out = jnp.zeros((CAP * L,), jnp.float32)
        return out.at[i].set(v, mode="drop", unique_indices=True)
    bench["scatter_plane_random"] = jax.jit(scatter_plane)
    bench["scatter_plane_sorted"] = jax.jit(scatter_plane)

    def scatter_plane_hint(v, i):
        out = jnp.zeros((CAP * L,), jnp.float32)
        return out.at[i].set(v, mode="promise_in_bounds",
                             unique_indices=True, indices_are_sorted=True)
    bench["scatter_plane_sorted_hint"] = jax.jit(scatter_plane_hint)

    bench["cumsum_plane"] = jax.jit(lambda p: jnp.cumsum(p))
    bench["elementwise_planes10"] = jax.jit(
        lambda p: sum(p * (1.0 + 0.1 * i) for i in range(10)))

    # one full current-build (sorted scatter of 7 planes, as _build_slab_buckets)
    def full_build(keys, *vs):
        order = jnp.argsort(keys).astype(jnp.int32)
        sk = jnp.take(keys, order)
        ranks = jnp.arange(N, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        run_start = jax.lax.cummax(jnp.where(first, ranks, 0))
        slot = ranks - run_start
        ok = slot < CAP
        flat = jnp.where(ok, slot * L + sk, CAP * L)
        outs = []
        for v in vs:
            out = jnp.full((CAP * L + 1,), 0.0, jnp.float32)
            outs.append(out.at[flat].set(jnp.take(v, order), mode="drop",
                                         unique_indices=True)[:-1])
        return tuple(outs)
    bench["full_build_argsort7"] = jax.jit(full_build)

    # candidate replacement: one sort carrying all payloads, then monotone
    # scatters (addresses ascend with rank when layout is col-major)
    def build_multisort(keys, *vs):
        sorted_all = jax.lax.sort((keys,) + vs, num_keys=1)
        sk = sorted_all[0]
        ranks = jnp.arange(N, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        run_start = jax.lax.cummax(jnp.where(first, ranks, 0))
        slot = ranks - run_start
        ok = slot < CAP
        flat = jnp.where(ok, sk * CAP + slot, CAP * L)  # col-major: ascending
        outs = []
        for v in sorted_all[1:]:
            out = jnp.full((CAP * L + 1,), 0.0, jnp.float32)
            outs.append(out.at[flat].set(
                v, mode="promise_in_bounds", unique_indices=True,
                indices_are_sorted=True)[:-1])
        return tuple(outs)
    bench["full_build_multisort7"] = jax.jit(build_multisort)

    args = {
        "argsort_n": (keys,),
        "sort_kv1": (keys, vals[0]),
        "sort_kv7": (keys,) + tuple(vals),
        "gather_small_random": (vals[0], small_idx),
        "gather_plane_random": (plane, rnd_idx),
        "gather_plane_sorted": (plane, srt_idx),
        "gather_plane_sorted_hint": (plane, srt_idx),
        "scatter_plane_random": (vals[0], rnd_idx),
        "scatter_plane_sorted": (vals[0], srt_idx),
        "scatter_plane_sorted_hint": (vals[0], srt_idx),
        "cumsum_plane": (plane,),
        "elementwise_planes10": (plane,),
        "full_build_argsort7": (keys,) + tuple(vals),
        "full_build_multisort7": (keys,) + tuple(vals),
    }

    for name, fn in bench.items():
        try:
            ms = timeit(fn, *args[name])
            results[name] = round(ms, 3)
            print(f"{name:32s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # keep going; record the failure
            results[name] = f"ERROR: {type(e).__name__}: {e}"[:200]
            print(f"{name:32s} FAILED: {e}", flush=True)

    with open("benchmarks/micro_tpu_results.json", "w") as f:
        json.dump({"device": str(dev), "n": N, "results": results}, f,
                  indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
