"""Sorted-state step vs particle-order step on the settled flagship (TPU).

Round-4 queue item 1a: the sorted-state pallas step (SimConfig.sorted_state)
skips the (n,) addr inversion scatter of the rebuild pipeline; identity
rides FluidState.ids through the build's single row gather (bitcast int32
column — multi-feature gathers are ~free per micro2). This measures the
settled ms/step for both on the flagship 256k scene and the reference's own
64k scene.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro19_sorted_state.py
"""

import dataclasses
import json
import time

import numpy as np


def settle_and_time(scene, sorted_state, settle=600, chunk=50, reps=3):
    from water_sandbox_tpu.models import scenes
    from water_sandbox_tpu.ops.step import rollout

    cfg, params, state = scenes.build(scene, neighbor_mode="pallas")
    cfg = dataclasses.replace(cfg, sorted_state=sorted_state)

    done = 0
    t0 = time.perf_counter()
    while done < settle:
        state = rollout(state, params, cfg, chunk)
        done += chunk
        np.asarray(state.pos)  # hard sync (block_until_ready unreliable)
    print(f"#   settled {scene} sorted={sorted_state} in "
          f"{time.perf_counter()-t0:.0f}s, overflow_total="
          f"{float(np.asarray(state.overflow_total))}", flush=True)

    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = rollout(state, params, cfg, chunk)
        np.asarray(state.pos)
        walls.append((time.perf_counter() - t0) / chunk * 1e3)
    return min(walls), float(np.asarray(state.overflow_total))


def main():
    out = {}
    for scene in ("moving-container-256k", "reference-cube"):
        for sorted_state in (False, True):
            ms, ovf = settle_and_time(scene, sorted_state)
            key = f"{scene}|sorted={sorted_state}"
            out[key] = {"ms_per_step": round(ms, 2), "overflow_total": ovf}
            print(f"# {key}: {ms:.2f} ms/step", flush=True)
    with open("benchmarks/micro19_sorted_state_results.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
