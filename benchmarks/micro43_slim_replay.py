"""Micro 43: settle the slim-carry question (VERDICT r4 weak #2).

micro40's step_slim rows used rescue_capacity=0 while step_default used the
production rescue cond — so the published ssync delta (39.79 vs 41.34)
conflates the slim carry with the measured 1.3 ms rescue-cond tax. This
replays all four corners same-session under the ssync protocol, best-of-3:

  step_default_ssync      production step, rescue on   (the bench row)
  step_norescue_ssync     production step, rescue off  (fair slim baseline)
  step_slim_nr_ssync      slim carry,      rescue off  (micro40's row)
  step_slim_ssync         slim carry,      rescue on   (adoptable variant)

slim carry = the scan carries ONLY (pos, vel, predicted, ids, t); per-step
outputs (acc, den/nden/prs/nprs, counters) never ride the carry.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro43_slim_replay.py
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
    from water_sandbox_tpu.core.params import KernelCoeffs
    from water_sandbox_tpu.ops import integrate as integrate_mod
    from water_sandbox_tpu.ops import step as step_mod
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    done = 0
    while done < 600:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled@600", flush=True)

    cfg, params, state = sim.cfg, sim.params, sim.state
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    cfg_nr = dataclasses.replace(cfg, rescue_capacity=0)

    def slim_body(c):
        def fn(carry):
            pos, vel, predicted, ids, t = carry
            (den, nden, prs, nprs, acc, unrescued, s_pos, s_vel,
             s_ids) = sb.bucket_sph_sorted(pos, vel, predicted, ids,
                                           params, coeffs, c)
            t_new = t + params.dt
            npos, nvel, npred = integrate_mod.integrate(
                s_pos, s_vel, acc, params, t_new)
            return npos, nvel, npred, s_ids, t_new
        return fn

    def scan_time(body, init, fetch, reps=3):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (body(c), None), s,
                                None, length=STEPS)[0]
        t0 = time.perf_counter()
        out = run(init)
        np.asarray(fetch(out))
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(init)
            np.asarray(fetch(out))
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), compile_s, walls

    slim0 = (state.pos, state.vel, state.predicted, state.ids, state.time)
    stages = [
        ("step_default_ssync",
         lambda: scan_time(lambda s: step_mod.step(s, params, cfg),
                           state, lambda o: o.time)),
        ("step_norescue_ssync",
         lambda: scan_time(lambda s: step_mod.step(s, params, cfg_nr),
                           state, lambda o: o.time)),
        ("step_slim_nr_ssync",
         lambda: scan_time(slim_body(cfg_nr), slim0, lambda o: o[4])),
        ("step_slim_ssync",
         lambda: scan_time(slim_body(cfg), slim0, lambda o: o[4])),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        stages = [st for st in stages if st[0] in want]

    results = {"n": cfg.n, "steps_per_scan": STEPS, "protocol": "ssync"}
    for name, fn in stages:
        ms, compile_s, walls = fn()
        results[name] = round(ms, 2)
        results[name + "_all"] = [round(w, 2) for w in walls]
        print(f"{name:22s} {ms:7.2f} ms/it  (compile {compile_s:.0f}s, "
              f"all {['%.2f' % w for w in walls]})", flush=True)

    with open("benchmarks/micro43_slim_replay_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
