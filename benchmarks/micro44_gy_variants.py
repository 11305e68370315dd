"""Micro 44: gy-trim variants on top of micro42.

micro42 measured gy 44 -> 25 (auto-tile: T dropped 1024 -> 256 because
S = 2000 < 2048) at -1.36 ms/step with overflow_total == 0 over the full
1k trajectory and reassociation-class drift (the clamp engages during the
splash transient: y-extent peaks at 30.2 cells, settles to 18.4).

This sweeps the (gy, tile) grid the auto-pick conflated:

  gy44            baseline (T1024, S_pad 4096)
  gy32            covers the 30.2-cell max extent -> clamp never engages
                  (T1024, S_pad 3072): candidate for adoption with only
                  chunk-boundary reassociation drift in the qsym flush
  gy25_t1024      micro42's trim at the production tile (S_pad 2048, NYC 2)
  gy25_t512       middle tile (S_pad 2048, NYC 4)
  gy20            aggressive trim (auto T256, S_pad 1792): clamps ~10 cell
                  layers during the splash — overflow risk, traj-checked

Speed rows use the settled state (600 pre-steps) under the ssync protocol,
best-of-3 x 50-step scans. The winner (if any) gets a 1k-trajectory
overflow check before adoption.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro44_gy_variants.py
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
    gx, gy, gz = cfg.grid_dims

    def variant(gy_v, tile=0):
        return dataclasses.replace(cfg, grid_dims=(gx, gy_v, gz),
                                   tile_override=tile)

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

    rows = [
        ("gy44", variant(44)),
        ("gy32", variant(32)),
        ("gy25_t1024", variant(25, 1024)),
        ("gy25_t512", variant(25, 512)),
        ("gy20", variant(20)),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        rows = [r for r in rows if r[0] in want]

    results = {"n": cfg.n, "steps_per_scan": STEPS, "protocol": "ssync",
               "grid_dims_base": list(cfg.grid_dims)}
    for tag, cfg_v in rows:
        ms, ovf = timed(cfg_v, tag)
        results[tag] = round(ms, 2)
        results[tag + "_overflow"] = ovf

    with open("benchmarks/micro44_gy_variants_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
