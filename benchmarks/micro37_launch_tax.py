"""Micro 37: is the kernels' ~8 ms zero-work floor a LAUNCH tax or
mis-attributed BUILD cost?

micro32/34 established: with an empty body (gate "grid0"), no window DMA,
no output writes and the output parked in ANY memory, each pass still
costs ~8 ms in-scan, invariant in grid-step count. Two candidate
explanations the existing probes cannot distinguish:

1. genuine per-launch machinery (Mosaic/runtime tax per pallas_call);
2. the anchor (build alone) UNDER-counts the build because XLA DCEs the
   feature-plane scatters nothing consumes — the "floor" delta would then
   be build materialization, not kernel cost.

This isolates the launch: scan bodies that run ONLY the empty kernel on
prebuilt constant planes, serial-chained through the (1, 16) params
vector (so consecutive launches cannot overlap), plus a fully-consumed
build anchor. Rows:

  anchor_build     build chain with every plane consumed (strided sums)
  build+d_grid0    the micro32-style delta base (anchor may DCE nothing)
  d_grid0_alone    empty density kernel ONLY, chained via params
  d_grid0_alone_p1 same with out_shape (1, cap, L) instead of (6, cap, L)
  f_grid0_alone    empty qsym force kernel ONLY
  df_grid0_alone   both empty kernels back-to-back (is the tax additive?)

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro37_launch_tax.py
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
    pv0 = sb._param_vector(params, coeffs)

    # prebuilt constant planes for the *_alone rows
    @jax.jit
    def prebuild(s):
        planes, counts, flat, _, srows, overflow = sb._build_core(
            s.predicted, s.vel, params, cfg)
        g = sb._geometry(cfg)
        gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
        own, m0 = sb.occupancy_bounds(counts, g)
        return planes, own, m0

    planes_c, own_c, m0_c = jax.block_until_ready(prebuild(state))
    np.asarray(own_c)

    def chain_pv(pv, x):
        return pv + jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30

    def alone(run_fns):
        """Scan body: empty kernel(s) only, serial-chained through pv."""
        def body(pv, _):
            for fn in run_fns:
                out = fn(pv)
                pv = chain_pv(pv, out[0, 0, 0])
            return pv, None
        return body

    def d_alone(pv, out_planes=6):
        return sb._run_density(planes_c, own_c, m0_c, pv, cfg, False,
                               gate=("grid0", 8), out_planes=out_planes,
                               out_any=True)

    def f_alone(pv):
        dim = cfg.dim
        return sb._run_force(planes_c[:2 * dim], planes_c, own_c, m0_c, pv,
                             cfg, False, gate=("qsym+grid0", 8),
                             out_any=True)

    # micro32-style rows on the full state (anchor + delta base)
    import dataclasses

    def chain_state(s, *scalars):
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

    def anchor_build(s):
        planes, flat, srows, own, m0 = built(s)
        # consume EVERY plane so no scatter can be DCE'd: strided slice sums
        consume = jnp.sum(planes[:, :, ::4097]) + jnp.sum(own) + jnp.sum(m0)
        return chain_state(s, consume, flat[0], srows[0, 0])

    def build_d_grid0(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv0, cfg, False,
                               gate=("grid0", 8), out_any=True)
        return chain_state(s, dens[0, 0, 0], flat[0], srows[0, 0])

    def scan_time_state(body, init, fetch, reps=3):
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

    def scan_time_pv(body_fn, reps=3):
        @jax.jit
        def run(pv):
            return jax.lax.scan(body_fn, pv, None, length=STEPS)[0]

        t0 = time.perf_counter()
        out = run(pv0)
        np.asarray(out)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(pv0)
            np.asarray(out)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), compile_s

    stages = [
        ("anchor_build",
         lambda: scan_time_state(lambda s: anchor_build(s), state,
                                 lambda o: o.pos)),
        ("build+d_grid0",
         lambda: scan_time_state(lambda s: build_d_grid0(s), state,
                                 lambda o: o.pos)),
        ("d_grid0_alone", lambda: scan_time_pv(alone([d_alone]))),
        ("d_grid0_alone_p1",
         lambda: scan_time_pv(alone([lambda pv: d_alone(pv, out_planes=1)]))),
        ("f_grid0_alone", lambda: scan_time_pv(alone([f_alone]))),
        ("df_grid0_alone", lambda: scan_time_pv(alone([d_alone, f_alone]))),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        stages = [st for st in stages if st[0] in want]

    results = {"n": cfg.n, "steps_per_scan": STEPS,
               "note": "in-scan; *_alone rows run ONLY the empty kernel(s) "
               "on prebuilt constant planes, chained via the params vector"}
    for name, fn in stages:
        ms, compile_s = fn()
        results[name] = round(ms, 2)
        print(f"{name:18s} {ms:7.2f} ms/it  (compile {compile_s:.0f}s)",
              flush=True)

    out_path = "benchmarks/micro37_launch_tax_results.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
