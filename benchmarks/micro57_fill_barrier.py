"""Micro 57: split the plane FILL from the scatter (trace-guided).

The micro56-followup device trace exposed the real build cost: six
fill+scatter fusions at 1.58 ms each per step, where the fill part
(21.6 MB per plane) dominates — the fused scatter loop writes it at
far below memset speed. It also exposed micro47/53's "force machinery"
as an anchor bug: the one-launch rows consumed planes[:3] only, so the
3 velocity-plane scatters were DCE'd (the §1b bug class, round 5
edition). 'stack_barrier' puts an optimization_barrier between the
jnp.full and the scatter so the fill stays a standalone memset-class
op. Rows: full production step, stack vs stack_barrier (A/B, ssync,
best-of-3) + bit-identity check.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro57_fill_barrier.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import numpy as np

STEPS = 50


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import step as step_mod

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    done = 0
    while done < 600:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled@600", flush=True)
    cfg, params, state = sim.cfg, sim.params, sim.state

    def timed(mode, reps=3):
        cfg_v = dataclasses.replace(cfg, build_scatter=mode)

        @jax.jit
        def run(s):
            return jax.lax.scan(
                lambda c, _: (step_mod.step(c, params, cfg_v), None),
                s, None, length=STEPS)[0]
        t0 = time.perf_counter()
        out = run(state)
        np.asarray(out.time)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out.time)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        ms = min(walls)
        print(f"{mode:14s} {ms:7.2f} ms/step (compile {compile_s:.0f}s, "
              f"all {['%.2f' % w for w in walls]})", flush=True)
        return ms, out

    results = {"n": cfg.n, "steps_per_scan": STEPS, "protocol": "ssync"}
    pos = {}
    for mode in (sys.argv[1:] or ("stack", "stack_barrier")):
        ms, out = timed(mode)
        results[mode] = round(ms, 2)
        pos[mode] = np.asarray(out.pos)
    if len(pos) == 2:
        a, b = pos.values()
        results["bit_identical_50_steps"] = bool(
            (a.view(np.uint32) == b.view(np.uint32)).all())

    with open("benchmarks/micro57_fill_barrier_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
