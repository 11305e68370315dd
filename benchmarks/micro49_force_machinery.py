"""Micro 49: what is the force pass's 8.1 ms of EMPTY-BODY machinery?

micro47 (cf layout, settled, non-degenerate): build+d_grid0 = 10.62,
+f_grid0(qsym) = 18.74 — an empty qsym kernel adds 8.12 ms, more than the
real force BODY (7.90). Hypotheses:

  (a) qsym's 'arbitrary' dimension semantics serializes the 324 grid
      steps, exposing each step's output-window write latency that the
      default parallel semantics would pipeline;
  (b) per-byte output streaming (5 planes x cap x T per step, ~106 MB);
  (c) per-launch fixed cost that grew with the layout change.

Rows (same build+d_grid0 prefix as micro47's `build` row, settled state,
ssync, best-of-3):

  f0_qsym       ("qsym+grid0", 8)  — arbitrary semantics + out windows
                (micro47's 18.74 reference point, re-measured in-session)
  f0_qrow3      ("qrow3+grid0", 8) — SAME out shape/windows, default
                parallel semantics -> isolates (a)
  f0_qsym_any   ("qsym+grid0", 8) + out_any — arbitrary semantics, output
                parked in HBM, no window streaming -> isolates (b)

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro49_force_machinery.py
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
    pv = sb._param_vector(params, coeffs)
    g = sb._geometry(cfg)
    dim = cfg.dim

    def chain(s, *scalars):
        eps = sum(jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30
                  for x in scalars)
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def built(s):
        ids_f = jax.lax.bitcast_convert_type(s.ids, jnp.float32)[:, None]
        carry = jnp.concatenate([s.pos, ids_f], axis=1)
        planes, counts, flat, _, srows, overflow = sb._build_core(
            s.predicted, s.vel, params, cfg, carry=carry, time=s.time)
        own, m0 = sb.occupancy_bounds(counts, g)
        return planes, flat, srows, own, m0

    D0 = ("grid0", 8)

    def row_base(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
        return chain(s, dens[0, 0, 0], flat[0], srows[0, 0])

    def frow(fgate, out_any=False):
        def fn(s):
            planes, flat, srows, own, m0 = built(s)
            dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
            out_c = sb._run_force(planes[:2 * dim], dens, own, m0, pv, cfg,
                                  False, gate=fgate, out_any=out_any)
            return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])
        return fn

    rows = [
        ("base_build_d0", row_base),
        ("f0_qsym", frow(("qsym+grid0", 8))),
        ("f0_qrow3", frow(("qrow3+grid0", 8))),
        ("f0_qsym_any", frow(("qsym+grid0", 8), out_any=True)),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        rows = [r for r in rows if r[0] in want]

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

    results = {"n": cfg.n, "steps_per_scan": STEPS, "protocol": "ssync",
               "grid_dims": list(cfg.grid_dims),
               "grid_frame": cfg.grid_frame, "tile": cfg.tile_override}
    for name, fn in rows:
        ms, compile_s, walls = scan_time(fn)
        results[name] = round(ms, 2)
        print(f"{name:14s} {ms:7.2f} ms/it (compile {compile_s:.0f}s, "
              f"all {['%.2f' % w for w in walls]})", flush=True)

    with open("benchmarks/micro49_force_machinery_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
