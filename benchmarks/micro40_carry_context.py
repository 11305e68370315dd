"""Micro 40: production-CONTEXT cost ledger + the scan-carry floor.

micro37/38 fixed the anchors but left a composition puzzle: the real
kernels alone cost 5.5 + 10.2 ms, yet in-chain prefix deltas said
12.2 + 18.3. One missing term is micro23's `baseline_chain` = 4.8 ms — a
no-op STATE-carry scan floor that every state-chained row (and production)
pays. This measures everything in the production program itself, where the
only varied knob is the kernel-body gate (inputs/outputs stay materialized
— pallas operands cannot be DCE'd), so the deltas are true in-context body
costs:

  chain_only      no-op state scan (the carry floor, re-measured)
  step_d0         production step, density body gated empty, rescue off
  step_f0         production step, force body gated empty, rescue off
  step_df0        both bodies empty, rescue off
  step_norescue   full step, rescue off (same-session anchor)
  step_default    full step (rescue-cond tax cross-check)
  step_slim       slim-carry probe: scan carries ONLY (pos, vel,
                  predicted, ids, counters); per-step outputs (acc,
                  den/nden/prs/nprs) never enter the carry — measures the
                  upside of a slim rollout (outputs materialized once at
                  the end in a real implementation)

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro40_carry_context.py
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
    while done < 300:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled", flush=True)

    cfg, params, state = sim.cfg, sim.params, sim.state
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    cfg_nr = dataclasses.replace(cfg, rescue_capacity=0)

    def chain_only(s):
        eps = jnp.minimum(s.predicted[0, 0], 0.0) * 1e-30
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def step_gated(c, dgate=None, fgate=None):
        def fn(s):
            old_d, old_f = sb._DENSITY_GATE, sb._FORCE_GATE
            if dgate is not None:
                sb._DENSITY_GATE = dgate
            if fgate is not None:
                sb._FORCE_GATE = fgate
            try:
                return step_mod.step(s, params, c)
            finally:
                sb._DENSITY_GATE, sb._FORCE_GATE = old_d, old_f
        return fn

    def slim_body(carry):
        pos, vel, predicted, ids, t = carry
        (den, nden, prs, nprs, acc, unrescued, s_pos, s_vel,
         s_ids) = sb.bucket_sph_sorted(pos, vel, predicted, ids, params,
                                       coeffs, cfg_nr)
        t_new = t + params.dt
        npos, nvel, npred = integrate_mod.integrate(
            s_pos, s_vel, acc, params, t_new)
        return npos, nvel, npred, s_ids, t_new

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
        return min(walls), compile_s

    slim0 = (state.pos, state.vel, state.predicted, state.ids, state.time)

    def fetch_only():
        # the state-row sync is a 3 MB pos fetch over the REMOTE tunnel —
        # if that dominates, micro23's baseline_chain "scan floor" was a
        # fetch tax every state row pays equally, not carry machinery
        np.asarray(state.pos)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(state.pos)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), 0.0

    G0 = ("grid0", 8)
    FG0 = ("qsym+grid0", 8)
    stages = [
        ("fetch_only", fetch_only),
        ("chain_only",
         lambda: scan_time(chain_only, state, lambda o: o.pos)),
        ("step_d0",
         lambda: scan_time(step_gated(cfg_nr, dgate=G0), state,
                           lambda o: o.pos)),
        ("step_f0",
         lambda: scan_time(step_gated(cfg_nr, fgate=FG0), state,
                           lambda o: o.pos)),
        ("step_df0",
         lambda: scan_time(step_gated(cfg_nr, dgate=G0, fgate=FG0), state,
                           lambda o: o.pos)),
        ("step_norescue",
         lambda: scan_time(step_gated(cfg_nr), state, lambda o: o.pos)),
        ("step_default",
         lambda: scan_time(step_gated(cfg), state, lambda o: o.pos)),
        # scalar-leaf sync: device_get of the (1,) time still waits for
        # program completion but ships 4 bytes instead of 3.2 MB over the
        # tunnel — if this row is ~fetch_only faster than step_default,
        # the bench sync should fetch a scalar leaf
        ("step_default_ssync",
         lambda: scan_time(step_gated(cfg), state, lambda o: o.time)),
        ("step_slim",
         lambda: scan_time(slim_body, slim0, lambda o: o[0])),
        ("step_slim_ssync",
         lambda: scan_time(slim_body, slim0, lambda o: o[4])),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        stages = [st for st in stages if st[0] in want]

    results = {"n": cfg.n, "steps_per_scan": STEPS,
               "note": "production-context deltas: gates empty ONLY the "
               "kernel body (operands stay materialized); slim row drops "
               "per-step outputs from the scan carry"}
    for name, fn in stages:
        ms, compile_s = fn()
        results[name] = round(ms, 2)
        print(f"{name:14s} {ms:7.2f} ms/it  (compile {compile_s:.0f}s)",
              flush=True)

    with open("benchmarks/micro40_carry_context_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
