"""Micro 12: grid z/x coverage vs kernel time at the settled flagship.

The moving-container scene's yawing box grows its AABB past the static
grid dims sized for the axis-aligned container (z extent reaches ~15.8 vs
the 15.0 the (164,44,60) grid covers at h=0.25), so a ~1-cell-deep slab of
fluid clamps into the boundary cell plane every step. Clamping never
breaks pair completeness (cell keys are a monotone non-expansive map of
position — see ops/pallas/incremental.py), but it inflates boundary-cell
occupancy and thus the kernels' slot bounds. This micro times the settled
rollout at several grid sizes to price that heat.

    python benchmarks/micro12_grid.py
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import numpy as np


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import step as step_mod
    from water_sandbox_tpu.runtime import checkpoint

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    state0, params, _ = checkpoint.load("benchmarks/data/settled_256k.npz")
    cfg = sim.cfg
    n = cfg.n
    chunk = 24

    def run(dims, reps=4):
        cfg_d = dataclasses.replace(cfg, grid_dims=dims)
        s = jax.tree_util.tree_map(lambda x: x.copy(), state0)
        s = step_mod.rollout(s, params, cfg_d, chunk)
        np.asarray(s.pos[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            s = step_mod.rollout(s, params, cfg_d, chunk)
        np.asarray(s.pos[0])
        ms = (time.perf_counter() - t0) / (reps * chunk) * 1e3
        return ms, float(s.overflow_total)

    results = {"n": n, "chunk": chunk, "rows": []}
    for dims in [(164, 44, 72), (164, 44, 80), (168, 44, 80)]:
        ms, ovf = run(dims)
        row = {"grid_dims": list(dims), "ms_per_step": round(ms, 2),
               "ps_per_s": round(n / ms * 1e3), "overflow_total": ovf}
        results["rows"].append(row)
        print(row, flush=True)

    with open("benchmarks/micro12_grid_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
