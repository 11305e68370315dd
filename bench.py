"""Driver benchmark: ONE JSON line.

Metric per BASELINE.json: particle-steps/sec/chip at 256k particles.
vs_baseline is against the reference's implied throughput (65,536 particles
x 60 Hz = 3.93M particle-steps/s if it holds 60 FPS — BASELINE.md; the
reference publishes no measured numbers).
"""

import json
import os
import sys
import time


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    from water_sandbox_tpu.runtime.runner import Simulation
    from water_sandbox_tpu.ops.step import rollout

    scene = os.environ.get("WST_BENCH_SCENE", "moving-container-256k")
    steps = int(os.environ.get("WST_BENCH_STEPS", "10"))
    mode = os.environ.get("WST_BENCH_MODE", "pallas")

    sim = Simulation.from_scene(scene, neighbor_mode=mode)
    # warmup with the SAME static step count — a different scan length is a
    # different program and the measurement would include its compile
    sim.state = rollout(sim.state, sim.params, sim.cfg, steps)
    np.asarray(sim.state.pos)  # hard sync

    t0 = time.perf_counter()
    sim.state = rollout(sim.state, sim.params, sim.cfg, steps)
    np.asarray(sim.state.pos)  # hard sync through the device queue
    wall = time.perf_counter() - t0

    rate = steps * sim.cfg.n / wall
    baseline = 65536 * 60.0  # reference implied particle-steps/s
    print(json.dumps({
        "metric": f"particle-steps/sec/chip ({scene}, n={sim.cfg.n})",
        "value": round(rate, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(rate / baseline, 3),
    }))


if __name__ == "__main__":
    main()
