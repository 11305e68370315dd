"""Microbench round 3: scaling of the irregular-op tax.

micro1/2 established ~13ns/index gathers and ~14ns/element scatters at
n=265k. Open questions that pick the final build design:

- do gather/scatter costs scale linearly down to m=8k..64k, or is there a
  fixed per-op floor? (decides the incremental-mover pipeline)
- does a gather with ~9.8M mostly-CONSECUTIVE indices run at bandwidth
  (decides gather-based plane build vs scatter-based)
- elementwise integrate cost over resident planes

    python benchmarks/micro3_tpu.py
"""
from __future__ import annotations

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
    results = {}

    def scat1(v, i):
        out = jnp.zeros((M,), jnp.float32)
        return out.at[i].set(v, mode="promise_in_bounds", unique_indices=True)

    def scat6(r, i):
        out = jnp.zeros((M, 6), jnp.float32)
        return out.at[i].set(r, mode="promise_in_bounds", unique_indices=True)

    def gath8(r, i):
        return jnp.take(r, i, axis=0)

    for m in (8192, 49152, 265_302):
        idx = jnp.asarray(
            np.sort(rng.choice(M, m, replace=False)).astype(np.int32))
        v = jnp.asarray(rng.standard_normal(m), np.float32)
        r6 = jnp.asarray(rng.standard_normal((m, 6)), np.float32)
        src = jnp.asarray(rng.standard_normal((N, 8)), np.float32)
        gidx = jnp.asarray(rng.integers(0, N, m, dtype=np.int32))
        for name, fn, args in (
                (f"scatter1_m{m}", jax.jit(scat1), (v, idx)),
                (f"scatter_rows6_m{m}", jax.jit(scat6), (r6, idx)),
                (f"gather_rows8_m{m}", jax.jit(gath8), (src, gidx)),
        ):
            try:
                ms = timeit(fn, *args)
                results[name] = round(ms, 3)
                print(f"{name:24s} {ms:8.3f} ms", flush=True)
            except Exception as e:
                results[name] = f"ERROR: {e}"[:120]
                print(f"{name:24s} FAILED {e}", flush=True)

    # gather-based plane build: 9.8M mostly-consecutive indices
    starts = jnp.asarray(
        np.sort(rng.choice(N, L - 1, replace=True)).astype(np.int32))
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), starts])
    idx_plane = starts[None, :] + jnp.arange(CAP, dtype=jnp.int32)[:, None]
    idx_plane = jnp.minimum(idx_plane, N - 1)
    src1 = jnp.asarray(rng.standard_normal(N), np.float32)

    results["gather_plane_9p8M_consec"] = round(
        timeit(jax.jit(lambda s, i: jnp.take(s, i)), src1, idx_plane,
               reps=5), 3)
    print(f"gather_plane_9p8M_consec {results['gather_plane_9p8M_consec']} ms",
          flush=True)

    # resident-plane integrate: 6 planes updated elementwise + drift reduce
    planes = jnp.asarray(rng.standard_normal((6, CAP, L)), np.float32)

    def integ(p):
        pos = p[:3] + p[3:] * (1.0 / 60.0)
        vel = p[3:] * 0.999 - 9.8 / 60.0
        drift = jnp.max(jnp.abs(pos - p[:3]))
        return jnp.concatenate([pos, vel], axis=0), drift
    results["integrate_planes6"] = round(timeit(jax.jit(integ), planes), 3)
    print(f"integrate_planes6 {results['integrate_planes6']} ms", flush=True)

    with open("benchmarks/micro3_tpu_results.json", "w") as f:
        json.dump({"device": str(dev), "results": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
