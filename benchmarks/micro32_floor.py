"""Micro 32: bisect the kernels' ZERO-WORK floor (VERDICT r4 item 1).

The regenerated in-scan ledger (micro23 @ cap16/T1024) says HALF of each
pass is its zero-occupancy floor (density0 6.4 ms, force0 9.2 ms) — but
those probes zero the occupancy bounds, which gates off the window DMA
*too*, so the floor's composition (grid machinery vs auto-pipelined output
window movement vs window DMA) was never measured. This bisects it with
kernel-body probes at the REAL settled occupancy:

* gate "grid0"   — kernel body returns immediately: grid machinery + the
                   output movement the out_specs imply, nothing else;
* + out_any      — same, with the output parked in HBM (no auto-pipelined
                   output window movement): pure grid machinery;
* + out_planes=2 — output-plane scaling of the auto-pipeline (density);
* gate "dma0"    — grid + occupancy-gated window DMA, no compute/writes.

Every probe runs as the body of a 50-step lax.scan (production-like; see
micro23's methodology note on standalone-vs-in-scan dispatch pipelining)
on the settled flagship, with fresh same-session anchors for the real
density/force/full-step rows so tunnel drift can't skew the deltas.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro32_floor.py
"""
from __future__ import annotations

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
    pv = sb._param_vector(params, coeffs)

    def chain(s, *scalars):
        import dataclasses
        eps = sum(jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30
                  for x in scalars)
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def built(s):
        planes, counts, flat, _, srows, overflow = sb._build_core(
            s.predicted, s.vel, params, cfg)
        g = sb._geometry(cfg)
        gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
        own, m0 = sb.occupancy_bounds(counts, g)
        return planes, flat, srows, own, m0

    def d_probe(gate=None, out_planes=6, out_any=False):
        def fn(s):
            planes, flat, srows, own, m0 = built(s)
            dens = sb._run_density(planes, own, m0, pv, cfg, False,
                                   gate=gate, out_planes=out_planes,
                                   out_any=out_any)
            return chain(s, dens[0, 0, 0], flat[0], srows[0, 0])
        return fn

    def f_probe(gate=None, out_any=False):
        def fn(s):
            planes, flat, srows, own, m0 = built(s)
            dens = sb._run_density(planes, own, m0, pv, cfg, False)
            out_c = sb._run_force(planes, dens, own, m0, pv, cfg, False,
                                  gate=gate, out_any=out_any)
            return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])
        return fn

    def scan_time(body, reps=3):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (body(c), None), s,
                                None, length=STEPS)[0]

        t0 = time.perf_counter()
        out = run(state)
        np.asarray(out.pos)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out.pos)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), compile_s

    def b_full(s):
        from water_sandbox_tpu.ops import step as step_mod
        return step_mod.step(s, params, cfg)

    stages = [
        # anchors, same session (tunnel drift guard)
        ("density", d_probe()),
        ("force", f_probe()),
        # density floor bisect
        ("d_grid0", d_probe(gate=("grid0", 8))),
        ("d_grid0_any", d_probe(gate=("grid0", 8), out_any=True)),
        ("d_grid0_p2", d_probe(gate=("grid0", 8), out_planes=2)),
        ("d_dma0", d_probe(gate=("dma0", 8))),
        # force floor bisect
        ("f_grid0", f_probe(gate=("qsym+grid0", 8))),
        ("f_grid0_any", f_probe(gate=("qsym+grid0", 8), out_any=True)),
        ("f_dma0", f_probe(gate=("qsym+dma0", 8))),
        ("full_step", b_full),
    ]
    if len(sys.argv) > 1:   # subset (tunnel compiles are slow)
        want = set(sys.argv[1:])
        stages = [st for st in stages if st[0] in want]

    results = {"n": cfg.n, "steps_per_scan": STEPS,
               "note": "in-scan; d_* rows include the build chain, f_* rows "
               "build+density; deltas vs the same-session anchors"}
    for name, fn in stages:
        ms, compile_s = scan_time(fn)
        results[name] = round(ms, 2)
        print(f"{name:12s} {ms:7.2f} ms/it  (compile {compile_s:.0f}s)",
              flush=True)

    out_path = "benchmarks/micro32_floor_results.json"
    try:
        import os
        if os.path.exists(out_path):
            with open(out_path) as f:
                old = json.load(f)
            old.update(results)
            results = old
    except Exception:
        pass
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
