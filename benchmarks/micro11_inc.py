"""Micro 11: incremental plane-resident stepping at the settled flagship.

Times the rebuild-per-step rollout vs rollout_inc at several rebuild
cadences K in one TPU session, from the settled 256k checkpoint.

    python benchmarks/micro11_inc.py [--ks 4,8,16,32] [--chunk 24]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="benchmarks/data/settled_256k.npz")
    ap.add_argument("--ks", default="4,8,16,32")
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--out", default="benchmarks/micro11_inc_results.json")
    args = ap.parse_args()

    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import step as step_mod
    from water_sandbox_tpu.runtime import checkpoint

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    state0, params, _ = checkpoint.load(args.checkpoint)
    cfg = sim.cfg
    n = cfg.n
    chunk = args.chunk

    def copy_state(s):
        return jax.tree_util.tree_map(lambda x: x.copy(), s)

    from functools import partial

    from water_sandbox_tpu.ops.pallas import incremental as inc

    @partial(jax.jit, static_argnums=2)
    def rollout_inc_counted(state, params, cfg_run):
        """rollout_inc + a rebuild counter (a rebuild resets ticks to 0 at
        the start of a step, so post-step ticks==1 marks it; the scan's
        first step also reads 1 — subtract the constant when comparing)."""
        cache = inc.build_cache(state.predicted, state.vel, params,
                                cfg_run)

        def body(carry, idx):
            s, c, nreb = carry
            s, c = inc.step_inc(s, c, params, cfg_run,
                                materialize=idx == chunk - 1)
            return (s, c, nreb + (c.ticks == 1).astype(jnp.int32)), None

        (state, _, nreb), _ = jax.lax.scan(
            body, (state, cache, jnp.zeros((), jnp.int32)),
            jnp.arange(chunk, dtype=jnp.int32))
        return state, nreb

    def time_chunks(cfg_run, reps=4):
        s = copy_state(state0)
        s = step_mod.rollout(s, params, cfg_run, chunk)   # compile+warm
        np.asarray(s.pos[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            s = step_mod.rollout(s, params, cfg_run, chunk)
        np.asarray(s.pos[0])
        dt = (time.perf_counter() - t0) / (reps * chunk)
        return dt * 1e3, s

    results = {"n": n, "chunk": chunk}
    ms, s_ref = time_chunks(cfg)
    results["rebuild_ms_per_step"] = round(ms, 2)
    results["rebuild_overflow_total"] = float(s_ref.overflow_total)
    print(f"rebuild-per-step: {ms:.2f} ms/step "
          f"({n / ms * 1e3:,.0f} ps/s)", flush=True)

    for k in [int(x) for x in args.ks.split(",")]:
        cfg_k = dataclasses.replace(cfg, incremental_rebuild=k)

        def rollout_k(s, p, c, _n, cfg_k=cfg_k):
            s, nreb = rollout_inc_counted(s, p, cfg_k)
            return s, nreb

        nrebs = []

        def timed(s):
            s2, nreb = rollout_k(s, params, cfg_k, chunk)
            nrebs.append(nreb)
            return s2

        s = copy_state(state0)
        s = timed(s)
        np.asarray(s.pos[0])
        t0 = time.perf_counter()
        for _ in range(4):
            s = timed(s)
        np.asarray(s.pos[0])
        ms = (time.perf_counter() - t0) / (4 * chunk) * 1e3
        s_k = s
        results[f"inc_k{k}_ms_per_step"] = round(ms, 2)
        results[f"inc_k{k}_rebuilds_per_chunk"] = float(
            np.mean([np.asarray(x) for x in nrebs[1:]]))
        results[f"inc_k{k}_overflow_total"] = float(s_k.overflow_total)
        # sanity: same physics class — bounded KE drift vs the rebuild run
        ke_ref = float(np.sum(np.asarray(s_ref.vel) ** 2))
        ke_k = float(np.sum(np.asarray(s_k.vel) ** 2))
        results[f"inc_k{k}_ke_rel"] = round(abs(ke_k - ke_ref)
                                            / max(ke_ref, 1e-9), 4)
        print(f"inc K={k}: {ms:.2f} ms/step ({n / ms * 1e3:,.0f} ps/s) "
              f"ke_rel={results[f'inc_k{k}_ke_rel']}", flush=True)

    print(json.dumps(results, indent=1))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
