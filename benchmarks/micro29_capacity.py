"""Micro 29: right-size the flagship cell_capacity.

The round-3 yawed-AABB grid fix (micro12) removed the out-of-grid clamping
pile-up that originally forced cell_capacity=48; the committed settled
occupancy stats now peak at own_max == 6 (step_breakdown_results.json).
Everything cap-proportional pays for the stale headroom every step: the
6 plane fills + scatter targets (cap_p x L), the counts reduction, both
kernels' output arrays (and the force gather's relayout copy), and the
qsym flush machinery. This runs the FULL 1k-step flagship trajectory
(fresh lattice -> transient slosh -> settled) at smaller capacities and
records the cumulative overflow: a capacity with overflow_total == 0 over
all 1000 steps produces a step-for-step identical trajectory (blocks above
every real occupancy only ever add distance-masked zeros), so the existing
golden stays valid.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro29_capacity.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops.step import rollout

    results = {}
    for cap in (16, 24):
        sim = wst.Simulation.from_scene("moving-container-256k",
                                        neighbor_mode="pallas",
                                        cell_capacity=cap)
        done = 0
        t0 = time.perf_counter()
        while done < 1000:
            sim.state = rollout(sim.state, sim.params, sim.cfg, 50)
            done += 50
        np.asarray(sim.state.pos)
        wall = time.perf_counter() - t0
        overflow = float(np.asarray(sim.state.overflow_total))

        # settled window, same compiled program
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            sim.state = rollout(sim.state, sim.params, sim.cfg, 50)
            np.asarray(sim.state.pos)
            walls.append(time.perf_counter() - t0)
        step_ms = min(walls) / 50 * 1e3
        st = sim.stats()
        results[f"cap{cap}"] = {
            "overflow_total_1k": overflow,
            "settled_step_ms": round(step_ms, 2),
            "ps_per_s": round(sim.cfg.n / step_ms * 1e3, 0),
            "kinetic_energy": float(st["kinetic_energy"]),
            "max_speed": float(st["max_speed"]),
            "mean_density": float(st["mean_density"]),
            "wall_1k_s": round(wall, 1),
        }
        print(cap, json.dumps(results[f"cap{cap}"]), flush=True)
        if overflow == 0.0:
            break   # smallest clean capacity found; no need to go larger

    with open("benchmarks/micro29_capacity_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
