"""Catch the flagship explosion in the act: step in chunks of 10, keep the
last few states host-side, stop at the first KE jump / non-finite, save the
last-good and first-bad states for offline analysis.

    python benchmarks/hunt_explosion.py [--max-steps 400]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def snap(state):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), state)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="moving-container-256k")
    ap.add_argument("--max-steps", type=int, default=400)
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()

    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops.step import rollout

    sim = wst.Simulation.from_scene(args.scene, neighbor_mode="pallas")
    history = []
    prev_ke = None
    while int(jax.device_get(sim.state.step_count)) < args.max_steps:
        history.append(snap(sim.state))
        history = history[-3:]
        sim.state = rollout(sim.state, sim.params, sim.cfg, args.chunk)
        pos = np.asarray(sim.state.pos)
        vel = np.asarray(sim.state.vel)
        ke = float(0.5 * (vel ** 2).sum())
        finite = bool(np.isfinite(pos).all() and np.isfinite(vel).all())
        ovf = int(np.asarray(sim.state.overflow))
        tot = float(np.asarray(sim.state.overflow_total))
        step = int(np.asarray(sim.state.step_count))
        print(f"step {step:4d} ke={ke:.5g} ovf={ovf} tot={tot:.0f} "
              f"finite={finite} max|v|={np.abs(vel).max():.4g}", flush=True)
        blown = (not finite) or (prev_ke is not None and ke > 50 * prev_ke
                                 and ke > 1e7)
        if blown:
            good = history[-1]
            np.savez("/tmp/wst_lastgood.npz",
                     **{k: getattr(good, k) for k in
                        ("pos", "vel", "predicted", "acc", "density",
                         "near_density", "pressure", "near_pressure")},
                     step_count=good.step_count, time=good.time,
                     overflow=good.overflow,
                     overflow_total=good.overflow_total)
            bad = snap(sim.state)
            np.savez("/tmp/wst_firstbad.npz", pos=bad.pos, vel=bad.vel)
            print(f"BLOWUP between {step - args.chunk} and {step}; "
                  "last-good saved to /tmp/wst_lastgood.npz", flush=True)
            return
        prev_ke = ke
    print("no blowup within budget", flush=True)


if __name__ == "__main__":
    main()
