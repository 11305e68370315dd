"""Micro 46: production-context cost ledger at the ADOPTED container-frame
layout (grid (162, 32, 58), grid_frame='container', T1024 — micro45).

Re-runs micro40's gate methodology — the only varied knob is a kernel-body
gate inside the otherwise-identical production program (pallas operands
cannot be DCE'd) — so the old 40.6 ms ledger's terms can each be assigned
a measured post-compact-layout value. Feeds the round-5 BASELINE.md
north-star reconciliation.

  chain_only        no-op state-carry scan floor
  step_default      the adopted production step (bench row cross-check)
  step_norescue     rescue off (the rescue-cond tax)
  step_d0           density body empty, rescue off
  step_f0           force body empty, rescue off
  step_df0          both bodies empty, rescue off

All rows ssync protocol, best-of-3 x 50-step scans, settled@600 state.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro46_cf_ledger.py
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

    # scene=<name> switches the workload (VERDICT r4 weak #7 asks for this
    # same decomposition at interactive-2d-16k); results file is suffixed.
    scene = "moving-container-256k"
    for a in list(sys.argv[1:]):
        if a.startswith("scene="):
            scene = a.split("=", 1)[1]
            sys.argv.remove(a)

    sim = wst.Simulation.from_scene(scene, neighbor_mode="pallas")
    done = 0
    while done < 600:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled@600", flush=True)
    cfg, params, state = sim.cfg, sim.params, sim.state

    G0 = ("grid0", 8)
    FG0 = ("qsym+grid0", 8)
    nr = dict(rescue_capacity=0)
    variants = {
        "step_default": cfg,
        "step_norescue": dataclasses.replace(cfg, **nr),
        "step_d0": dataclasses.replace(cfg, density_gate=G0, **nr),
        "step_f0": dataclasses.replace(cfg, force_gate=FG0, **nr),
        "step_df0": dataclasses.replace(cfg, density_gate=G0,
                                        force_gate=FG0, **nr),
    }

    def chain_only(s):
        eps = jnp.minimum(s.predicted[0, 0], 0.0) * 1e-30
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def scan_time(body, reps=3):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (body(c), None), s,
                                None, length=STEPS)[0]
        t0 = time.perf_counter()
        out = run(state)
        np.asarray(out.time)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out.time)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), compile_s, walls

    rows = [("chain_only", chain_only)]
    rows += [(name, (lambda c: lambda s: step_mod.step(s, params, c))(c))
             for name, c in variants.items()]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        rows = [r for r in rows if r[0] in want]

    results = {"scene": scene, "n": cfg.n, "steps_per_scan": STEPS,
               "protocol": "ssync", "grid_dims": list(cfg.grid_dims),
               "grid_frame": cfg.grid_frame, "tile": cfg.tile_override}
    for name, fn in rows:
        ms, compile_s, walls = scan_time(fn)
        results[name] = round(ms, 2)
        results[name + "_all"] = [round(w, 2) for w in walls]
        print(f"{name:15s} {ms:7.2f} ms/it (compile {compile_s:.0f}s, "
              f"all {['%.2f' % w for w in walls]})", flush=True)

    suffix = "" if scene == "moving-container-256k" else (
        "_" + scene.replace("-", "_"))
    with open(f"benchmarks/micro46_cf_ledger{suffix}_results.json",
              "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
