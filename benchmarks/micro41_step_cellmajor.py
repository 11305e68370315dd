"""Micro 41: full-step A/B of the cell-major build scatter (+ sync check).

micro39 measured the isolated build 1.2 ms faster with cell-major
scatter addresses (consecutive sorted particles write adjacent slots).
This checks the win survives the full production step (XLA may schedule
the transposes differently in context), same session, and re-confirms the
scalar-leaf sync delta on both variants.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro41_step_cellmajor.py
"""
from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

STEPS = 50


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import step as step_mod
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    done = 0
    while done < 300:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled", flush=True)

    cfg, params, state = sim.cfg, sim.params, sim.state

    def step_body(mode):
        import dataclasses
        cfg_m = dataclasses.replace(cfg, build_scatter=mode)

        def fn(s):
            return step_mod.step(s, params, cfg_m)
        return fn

    def scan_time(body, fetch, reps=3):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (body(c), None), s,
                                None, length=STEPS)[0]

        t0 = time.perf_counter()
        out = run(state)
        np.asarray(fetch(out))
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(fetch(out))
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), compile_s, out

    results = {"n": cfg.n, "steps_per_scan": STEPS}
    outs = {}
    stages = [
        ("step_stack", step_body("stack"), lambda o: o.pos),
        ("step_cellmajor", step_body("cellmajor"), lambda o: o.pos),
        ("step_stack_ssync", step_body("stack"), lambda o: o.time),
        ("step_cellmajor_ssync", step_body("cellmajor"), lambda o: o.time),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        stages = [st for st in stages if st[0] in want]

    for name, body, fetch in stages:
        ms, compile_s, out = scan_time(body, fetch)
        results[name] = round(ms, 2)
        outs[name] = out
        print(f"{name:22s} {ms:7.2f} ms/it  (compile {compile_s:.0f}s)",
              flush=True)

    if "step_stack" in outs and "step_cellmajor" in outs:
        a, b = outs["step_stack"], outs["step_cellmajor"]
        same = bool(np.array_equal(np.asarray(a.pos), np.asarray(b.pos)))
        results["trajectory_bit_identical"] = same
        print("trajectory bit-identical:", same, flush=True)

    with open("benchmarks/micro41_step_cellmajor_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
