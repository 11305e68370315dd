"""Micro 52: is the r5 cellmajor build-scatter default wrong for SMALL
scenes?

The r5 2d-16k ledger (micro46 scene=interactive-2d-16k) measured
step_default 5.90 ms ssync where the r4 bench row was 3.73 ms under the
HEAVIER pos-fetch protocol — something regressed on this scene since r4.
The one default that changed in the build is _BUILD_SCATTER stack ->
cellmajor (adopted on a FLAGSHIP-only full-step A/B, micro41). This
replays the same-session A/B at 16k/2-D (cap 32: the cellmajor transpose
moves cap_p x L twice while n is only 16k — the overhead is plausibly
scene-scale-dependent).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro52_2d_scatter.py
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

    sim = wst.Simulation.from_scene("interactive-2d-16k",
                                    neighbor_mode="pallas")
    done = 0
    while done < 600:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled@600", flush=True)
    cfg, params, state = sim.cfg, sim.params, sim.state

    def timed(cfg_v, tag, reps=3):
        @jax.jit
        def run(s):
            return jax.lax.scan(
                lambda c, _: (step_mod.step(c, params, cfg_v), None),
                s, None, length=STEPS)[0]
        t0 = time.perf_counter()
        out = run(state)
        np.asarray(out.time)
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out.time)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        ms = min(walls)
        print(f"{tag}: {ms:.2f} ms/step (all {['%.2f' % w for w in walls]})",
              flush=True)
        return ms

    results = {"scene": "interactive-2d-16k", "n": cfg.n,
               "steps_per_scan": STEPS, "protocol": "ssync"}
    for mode in ("cellmajor", "stack"):
        cfg_m = dataclasses.replace(cfg, build_scatter=mode)
        results[mode] = round(timed(cfg_m, mode), 2)

    with open("benchmarks/micro52_2d_scatter_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
