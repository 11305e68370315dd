"""Microbench round 2: can ONE gather/scatter carry all F features?

micro_tpu.py showed each gather/scatter costs ~3.5 ms flat at n=265k.
The step needs: reorder particle rows by sort order, scatter them into the
cell-plane layout, and gather results back. If a single op with an (F,1) or
(1,F) slice window costs about the same as a scalar one, the build drops
from ~14 irregular ops to ~4.

Run: cd /root/repo && python benchmarks/micro2_tpu.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 265_302
CAP = 24
L = 100 * 3712
M = CAP * L


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

    idx = jnp.asarray(np.sort(rng.choice(M, N, replace=False)).astype(np.int32))
    order = jnp.asarray(rng.permutation(N).astype(np.int32))
    rows7 = jnp.asarray(rng.standard_normal((N, 7)), jnp.float32)
    planes7 = jnp.asarray(rng.standard_normal((7, M)), jnp.float32)
    flat7 = jnp.asarray(rng.standard_normal((M, 7)), jnp.float32)

    bench = {}

    # A. reorder (n,7) rows by a permutation: one gather, row window
    bench["reorder_rows7"] = (
        jax.jit(lambda r, o: jnp.take(r, o, axis=0)), (rows7, order))

    # B. gather (7,1) windows from plane-major (7, M)
    bench["gather_cols_from_major7"] = (
        jax.jit(lambda p, i: p[:, i]), (planes7, idx))

    # C. gather rows from feature-minor (M, 7)
    bench["gather_rows_from_minor7"] = (
        jax.jit(lambda p, i: jnp.take(p, i, axis=0)), (flat7, idx))

    # D. scatter (n,7) rows into feature-minor (M, 7)
    def scat_minor(r, i):
        out = jnp.zeros((M, 7), jnp.float32)
        return out.at[i].set(r, mode="promise_in_bounds",
                             unique_indices=True, indices_are_sorted=True)
    bench["scatter_rows_minor7"] = (jax.jit(scat_minor), (rows7, idx))

    # E. scatter (7,n) columns into plane-major (7, M)
    def scat_major(r, i):
        out = jnp.zeros((7, M), jnp.float32)
        return out.at[:, i].set(r.T, mode="promise_in_bounds",
                                unique_indices=True, indices_are_sorted=True)
    bench["scatter_cols_major7"] = (jax.jit(scat_major), (rows7, idx))

    # F. transpose feature-minor -> plane-major
    bench["transpose_minor_to_major"] = (
        jax.jit(lambda p: p.T.copy()), (flat7,))
    bench["transpose_rows_small"] = (
        jax.jit(lambda r: r.T.copy()), (rows7,))

    # G. full build chain, candidate design:
    #    sort(keys, iota) -> take rows -> scatter rows into (M, 7) ->
    #    transpose to (7, M)
    keys = jnp.asarray(rng.integers(0, L, N, dtype=np.int32))

    def build_v2(keys, rows):
        sk, order = jax.lax.sort((keys, jnp.arange(N, dtype=jnp.int32)),
                                 num_keys=1)
        ranks = jnp.arange(N, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        run_start = jax.lax.cummax(jnp.where(first, ranks, 0))
        slot = ranks - run_start
        ok = slot < CAP
        flat = jnp.where(ok, sk * CAP + slot, M)  # col-major -> ascending
        srows = jnp.take(rows, order, axis=0)
        out = jnp.zeros((M + 1, 7), jnp.float32)
        out = out.at[flat].set(srows, mode="promise_in_bounds",
                               unique_indices=True, indices_are_sorted=True)
        return out[:-1]
    bench["build_v2_rows"] = (jax.jit(build_v2), (keys, rows7))

    def build_v2t(keys, rows):
        return build_v2(keys, rows).T.copy()
    bench["build_v2_rows_T"] = (jax.jit(build_v2t), (keys, rows7))

    # H. slot-major scatter with (7,1) windows (no transpose needed;
    #    addresses NOT ascending in slot-major layout)
    def build_v2_major(keys, rows):
        sk, order = jax.lax.sort((keys, jnp.arange(N, dtype=jnp.int32)),
                                 num_keys=1)
        ranks = jnp.arange(N, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        run_start = jax.lax.cummax(jnp.where(first, ranks, 0))
        slot = ranks - run_start
        ok = slot < CAP
        flat = jnp.where(ok, slot * L + sk, M)  # slot-major
        srows = jnp.take(rows, order, axis=0)
        out = jnp.zeros((7, M + 1), jnp.float32)
        out = out.at[:, flat].set(srows.T, mode="promise_in_bounds",
                                  unique_indices=True)
        return out[:, :-1]
    bench["build_v2_major"] = (jax.jit(build_v2_major), (keys, rows7))

    results = {}
    for name, (fn, args) in bench.items():
        try:
            ms = timeit(fn, *args)
            results[name] = round(ms, 3)
            print(f"{name:28s} {ms:8.3f} ms", flush=True)
        except Exception as e:
            results[name] = f"ERROR: {type(e).__name__}: {e}"[:200]
            print(f"{name:28s} FAILED: {e}", flush=True)

    with open("benchmarks/micro2_tpu_results.json", "w") as f:
        json.dump({"device": str(dev), "n": N, "results": results}, f,
                  indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
