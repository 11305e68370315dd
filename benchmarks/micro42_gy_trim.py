"""Micro 42: compact-plane lever, cheapest form — trim the flagship grid's
y-dim to the fluid's real extent.

The flat lane layout l = x*S_pad + y*gz + z sizes S = gy*gz statically, but
the grid origin already tracks the fluid MIN each step (ops/hashing.py::
grid_origin), so gy only needs to cover the fluid's instantaneous y-EXTENT,
not the container height: the settled flagship pool is ~19 y-cells deep
while gy=44 covers the full 10 m box. gy=25 halves S_pad (4096 -> 2048 at
T=1024) and with it L and every plane-proportional step cost (fills, counts
reduction, kernel output streaming, gather relayout, grid programs).

y-clamping is EXACT physics (the micro12 monotone non-expansive argument:
pairs within h stay within one cell ring) — the only risk is occupancy
heat in the top clamped layer during splash transients. This measures:

  1. per-step y-extent (cells) over the full 1k trajectory at gy=44;
  2. the same trajectory at gy=25: overflow_total must stay 0 and the
     final positions (by particle id) must match gy=44 closely (bit-equal
     while no clamp engages; fp-reassociation-level when it does);
  3. settled-state speed A/B (ssync protocol, best-of-3).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro42_gy_trim.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 50
CHUNKS = 20        # 1000 steps total
GY_TRIM = 25


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import step as step_mod

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    cfg44, params, state0 = sim.cfg, sim.params, sim.state
    gx, gy, gz = cfg44.grid_dims
    cfg25 = dataclasses.replace(cfg44, grid_dims=(gx, GY_TRIM, gz))
    h = float(params.smoothing_radius)

    def extent_scan(cfg):
        @jax.jit
        def run(s):
            def body(c, _):
                c2 = step_mod.step(c, params, cfg)
                ext = (jnp.max(c2.pos, axis=0) - jnp.min(c2.pos, axis=0)) / h
                return c2, ext
            return jax.lax.scan(body, s, None, length=CHUNK)
        return run

    def run_traj(cfg, tag):
        run = extent_scan(cfg)
        s = state0
        exts = []
        t0 = time.perf_counter()
        for k in range(CHUNKS):
            s, ext = run(s)
            exts.append(np.asarray(ext))
            if k == 0:
                print(f"{tag}: first chunk done (compile+run "
                      f"{time.perf_counter() - t0:.0f}s)", flush=True)
        exts = np.concatenate(exts)            # (1000, dim)
        of = float(np.asarray(s.overflow_total))
        pos = np.asarray(s.pos)
        ids = np.asarray(s.ids)
        by_id = pos[np.argsort(ids)]
        print(f"{tag}: y-extent cells max={exts[:, 1].max():.1f} "
              f"p99={np.quantile(exts[:, 1], 0.99):.1f} "
              f"final={exts[-1, 1]:.1f}  overflow_total={of}", flush=True)
        return s, exts, of, by_id

    results = {"n": cfg44.n, "gy_trim": GY_TRIM, "steps": CHUNK * CHUNKS}

    want = set(sys.argv[1:]) or {"traj", "speed"}

    if "traj" in want:
        s44, ext44, of44, by44 = run_traj(cfg44, "gy44")
        s25, ext25, of25, by25 = run_traj(cfg25, "gy25")
        results["yext_max_cells"] = round(float(ext44[:, 1].max()), 2)
        results["yext_p99_cells"] = round(
            float(np.quantile(ext44[:, 1], 0.99)), 2)
        results["yext_final_cells"] = round(float(ext44[-1, 1]), 2)
        results["overflow_total_gy44"] = of44
        results["overflow_total_gy25"] = of25
        diff = np.abs(by44 - by25)
        results["final_pos_bitequal"] = bool(np.array_equal(by44, by25))
        results["final_pos_maxdiff"] = float(diff.max())
        results["final_pos_p99diff"] = float(np.quantile(diff, 0.999))
        print("final pos by id: bitequal=%s maxdiff=%.3g" %
              (results["final_pos_bitequal"], results["final_pos_maxdiff"]),
              flush=True)
        settled = s44
    else:
        settled = None

    if "speed" in want:
        if settled is None:
            s = state0
            run = extent_scan(cfg44)
            for _ in range(12):
                s, _ = run(s)
            settled = s
        np.asarray(settled.pos)

        def timed(cfg, tag, reps=3):
            @jax.jit
            def run(s):
                return jax.lax.scan(
                    lambda c, _: (step_mod.step(c, params, cfg), None),
                    s, None, length=CHUNK)[0]
            t0 = time.perf_counter()
            out = run(settled)
            np.asarray(out.time)       # ssync: scalar-leaf fetch
            print(f"{tag}: compile+first {time.perf_counter() - t0:.0f}s",
                  flush=True)
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = run(settled)
                np.asarray(out.time)
                walls.append((time.perf_counter() - t0) / CHUNK * 1e3)
            ms = min(walls)
            print(f"{tag}: {ms:.2f} ms/step (all {['%.2f' % w for w in walls]})",
                  flush=True)
            return ms

        results["step_gy44_ssync"] = round(timed(cfg44, "speed gy44"), 2)
        results["step_gy25_ssync"] = round(timed(cfg25, "speed gy25"), 2)

    with open("benchmarks/micro42_gy_trim_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
