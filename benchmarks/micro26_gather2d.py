"""Micro 26: settled flagship + reference-cube after the 2-D result gather.

gather_results used to flatten the force output to (2+dim, cap*L) before
indexing; on TPU that reshape merges tiled dims and is a physical RELAYOUT
— HLO %copy.336, f32[5,48,610304], 3.5M estimated cycles (~3.7 ms) every
step. The fix gathers with decomposed (slot, lane) indices straight from
the 3-D planes. This measures the settled ms/step on both bench scenes.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro26_gather2d.py
"""

import json
import time

import numpy as np


def settle_and_time(scene, settle=600, chunk=50, reps=3):
    from water_sandbox_tpu.models import scenes
    from water_sandbox_tpu.ops.step import rollout

    cfg, params, state = scenes.build(scene, neighbor_mode="pallas")

    t0 = time.perf_counter()
    done = 0
    while done < settle:
        state = rollout(state, params, cfg, chunk)
        done += chunk
        np.asarray(state.pos)  # hard sync (block_until_ready unreliable)
    print(f"#   settled {scene} in {time.perf_counter()-t0:.0f}s, "
          f"overflow_total={float(np.asarray(state.overflow_total))}",
          flush=True)

    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = rollout(state, params, cfg, chunk)
        np.asarray(state.pos)
        walls.append((time.perf_counter() - t0) / chunk * 1e3)
    return min(walls), float(np.asarray(state.overflow_total))


def main():
    out = {"change": "force kernels emit SLOT-major (cap, 2+dim, L) output "
           "(feature column in sublanes = the gather's demanded layout) + "
           "2-D (slot, lane) result gather. Baselines: 68.54 / 12.18 ms "
           "(flatten-relayout), 69.76 / 11.86 ms (2-D gather alone: XLA "
           "still relayouted the operand, HLO %copy.313)"}
    for scene in ("moving-container-256k", "reference-cube"):
        ms, ovf = settle_and_time(scene)
        out[scene] = {"ms_per_step": round(ms, 2), "overflow_total": ovf}
        print(f"{scene}: {ms:.2f} ms/step  overflow_total={ovf}",
              flush=True)
    with open("benchmarks/micro26_gather2d_results.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
