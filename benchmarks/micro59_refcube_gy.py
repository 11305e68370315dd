"""Micro 59: gy trim on the REFERENCE'S OWN scene (reference-cube).

reference-cube's grid is (68, 40, 40) for the static 16x9x9 box; the
falling cube + splash use the full height early, but the settled pool is
~18 y-cells. The container-frame lesson (micro44: S_pad cuts pay at a
fixed tile) applies: gy 40 -> 34/30 shrinks S_pad 1792 -> 1536/1280 at
T256. Clamping is exact; overflow is the guard. Rows: 1k-trajectory
y-extent + overflow at gy40, then settled speed A/B.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro59_refcube_gy.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import step as step_mod

    sim = wst.Simulation.from_scene("reference-cube",
                                    neighbor_mode="pallas")
    cfg, params, state0 = sim.cfg, sim.params, sim.state
    gx, gy, gz = cfg.grid_dims
    h = float(params.smoothing_radius)

    want = set(sys.argv[1:]) or {"traj", "speed"}
    results = {"scene": "reference-cube", "n": cfg.n,
               "grid_dims": list(cfg.grid_dims), "protocol": "ssync"}

    if "traj" in want:
        @jax.jit
        def run_chunk(s):
            def body(c, _):
                c2 = step_mod.step(c, params, cfg)
                ext = (jnp.max(c2.pos, axis=0)
                       - jnp.min(c2.pos, axis=0)) / h
                return c2, ext
            return jax.lax.scan(body, s, None, length=STEPS)
        s = state0
        exts = []
        for k in range(20):
            s, ext = run_chunk(s)
            exts.append(np.asarray(ext))
        exts = np.concatenate(exts)
        results["yext_max_cells"] = round(float(exts[:, 1].max()), 2)
        results["yext_final_cells"] = round(float(exts[-1, 1]), 2)
        results["overflow_total_1k"] = float(np.asarray(s.overflow_total))
        print(json.dumps({k: v for k, v in results.items()
                          if "ext" in k or "overflow" in k}), flush=True)
        settled = s
    else:
        settled = None

    if "speed" in want:
        if settled is None:
            done = 0
            while done < 600:
                sim.run(50)
                done += 50
            np.asarray(sim.state.pos)
            settled = sim.state
        np.asarray(settled.pos)

        def timed(cfg_v, tag, reps=3):
            @jax.jit
            def run(s):
                return jax.lax.scan(
                    lambda c, _: (step_mod.step(c, params, cfg_v), None),
                    s, None, length=STEPS)[0]
            t0 = time.perf_counter()
            out = run(settled)
            np.asarray(out.time)
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = run(settled)
                np.asarray(out.time)
                walls.append((time.perf_counter() - t0) / STEPS * 1e3)
            ms = min(walls)
            ovf = float(np.asarray(out.overflow_total))
            print(f"{tag}: {ms:.2f} ms/step "
                  f"(all {['%.2f' % w for w in walls]}) overflow={ovf}",
                  flush=True)
            results[tag] = round(ms, 2)
            results[tag + "_overflow"] = ovf

        timed(cfg, "gy40")
        for gy_v in (34, 30):
            timed(dataclasses.replace(cfg, grid_dims=(gx, gy_v, gz)),
                  f"gy{gy_v}")

    with open("benchmarks/micro59_refcube_gy_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
