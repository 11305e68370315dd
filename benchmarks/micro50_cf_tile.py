"""Micro 50: lane-tile width at the container-frame layout.

micro49 localized the force pass's 8.1 ms empty-body machinery as
per-grid-step (insensitive to out_any; micro37 measured sub-ms with the
same construction OUTSIDE the build-in-scan context). T2048 halves the
grid steps (324 -> 162, NYC 2 -> 1): if the machinery is per-step, the
full production step should drop ~3-4 ms net of wider-tile padding
(which micro33 measured flat at the old layout's smaller machinery
share). T512 doubles steps as the control arm.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro50_cf_tile.py
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

    def timed(cfg_v, tag, reps=3):
        @jax.jit
        def run(s):
            return jax.lax.scan(
                lambda c, _: (step_mod.step(c, params, cfg_v), None),
                s, None, length=STEPS)[0]
        t0 = time.perf_counter()
        out = run(state)
        np.asarray(out.time)
        print(f"{tag}: compile+first {time.perf_counter() - t0:.0f}s",
              flush=True)
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out.time)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        ms = min(walls)
        ovf = float(np.asarray(out.overflow_total))
        print(f"{tag}: {ms:.2f} ms/step (all {['%.2f' % w for w in walls]}) "
              f"overflow={ovf}", flush=True)
        return ms, ovf

    results = {"n": cfg.n, "steps_per_scan": STEPS, "protocol": "ssync",
               "grid_dims": list(cfg.grid_dims)}
    tiles = [int(a) for a in sys.argv[1:]] or [1024, 2048, 512]
    for t in tiles:
        cfg_t = dataclasses.replace(cfg, tile_override=t)
        try:
            ms, ovf = timed(cfg_t, f"T{t}")
        except Exception as e:
            results[f"T{t}"] = f"failed: {type(e).__name__}"
            print(f"T{t}: FAILED {e}", flush=True)
            continue
        results[f"T{t}"] = round(ms, 2)
        results[f"T{t}_overflow"] = ovf

    with open("benchmarks/micro50_cf_tile_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
