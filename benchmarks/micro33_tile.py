"""Micro 33: tile-width sweep, driven by micro32's floor bisect.

micro32 found the kernels' zero-work floor is almost entirely per-grid-step
machinery (~11.5 us/step: d_grid0 16.04 vs anchor-implied build ~8 ms over
672 steps), NOT output movement (out_any saves 0.3 ms) nor output-plane
count (p2 saves 0.7 ms). The grid is (gx, NYC = S_pad/_T) sequential steps,
and the total window-DMA bytes are INVARIANT in _T (steps x _CLW = 2 gx
S_pad), so widening the lane tile directly deletes floor:

  flagship (168, 4) @ T1024 -> (168, 2) @ T2048 -> (168, 1) @ T4096
  reference-cube (64, 6) @ T256 -> (64, 1) @ T1536

The cost side is pair-slot padding: occupancy bounds are per-chunk maxima,
so wider chunks gate more lanes at the max occupancy. This sweeps the full
settled step per tile width, in-scan (production methodology, micro23), on
both bench scenes.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro33_tile.py
"""
from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

STEPS = 50


def settle(scene, steps=300):
    import water_sandbox_tpu as wst
    sim = wst.Simulation.from_scene(scene, neighbor_mode="pallas")
    done = 0
    while done < steps:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    return sim


def scan_time(state, params, cfg, reps=3):
    from water_sandbox_tpu.ops import step as step_mod

    @jax.jit
    def run(s):
        return jax.lax.scan(lambda c, _: (step_mod.step(c, params, cfg), None),
                            s, None, length=STEPS)[0]

    t0 = time.perf_counter()
    out = run(state)
    np.asarray(out.pos)
    compile_s = time.perf_counter() - t0
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(state)
        np.asarray(out.pos)
        walls.append((time.perf_counter() - t0) / STEPS * 1e3)
    ovf = float(np.asarray(out.overflow_total))
    return min(walls), compile_s, ovf, out


def main():
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    jobs = {
        "moving-container-256k": (1024, 2048, 4096),
        "reference-cube": (256, 512, 1536),
    }
    if len(sys.argv) > 1:   # e.g. micro33_tile.py moving-container-256k:4096
        jobs = {}
        for a in sys.argv[1:]:
            scene, _, ts = a.partition(":")
            jobs.setdefault(scene, [])
            jobs[scene].extend(int(t) for t in ts.split(",") if t)

    results = {"steps_per_scan": STEPS,
               "note": "settled full-step ms/it per lane-tile width; "
               "baselines re-measured same-session (tunnel drift)"}
    path = "benchmarks/micro33_tile_results.json"
    try:
        with open(path) as f:
            results.update(json.load(f))
    except Exception:
        pass

    for scene, tiles in jobs.items():
        sim = settle(scene)
        row = results.get(scene, {})
        base = None
        import dataclasses
        for t in tiles:
            cfg_t = dataclasses.replace(sim.cfg, tile_override=t)
            try:
                ms, compile_s, ovf, out = scan_time(sim.state, sim.params,
                                                    cfg_t)
            except Exception as e:   # VMEM overflow etc: record and move on
                row[f"T{t}"] = f"failed: {type(e).__name__}"
                print(f"{scene} T{t}: FAILED {e}", flush=True)
                continue
            row[f"T{t}"] = round(ms, 2)
            row[f"T{t}_overflow"] = ovf
            if base is None:
                base = out
            else:
                # physics parity vs the first tile width (bit-level drift
                # check: gating differs, terms are identical)
                d = float(np.max(np.abs(np.asarray(base.pos)
                                        - np.asarray(out.pos))))
                row[f"T{t}_max_pos_delta_vs_T{tiles[0]}"] = d
            print(f"{scene:24s} T{t:<5d} {ms:7.2f} ms/it "
                  f"(compile {compile_s:.0f}s, overflow {ovf})", flush=True)
        results[scene] = row
        with open(path, "w") as f:
            json.dump(results, f, indent=1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
