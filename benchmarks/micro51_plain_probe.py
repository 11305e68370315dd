"""Micro 51: is the 8.1 ms empty-force machinery qsym-class-specific?

micro49 ruled out output streaming (out_any flat) and micro50 ruled out
per-grid-step pricing (T2048 worse). Remaining suspects: the qsym class's
~15 MB persistent VMEM scratch (sameb/nextb + parity-doubled windows) or
its 'arbitrary' dimension semantics as such. The new ("grid0", 8) gate on
the PLAIN _force_kernel (default parallel semantics, no persistent
scratch, same operands and output shape) splits these:

  base_build_d0   build + d_grid0 (anchor, micro47/49's 10.6)
  f0_plain        empty plain force kernel, default semantics
  f0_qsym         empty qsym (re-anchor of micro49's 18.8)

f0_plain ~ base + ~1  -> the cost is qsym-class-specific;
f0_plain ~ f0_qsym    -> it is context-level (any second pallas pass).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro51_plain_probe.py
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

    def frow(fgate):
        def fn(s):
            planes, flat, srows, own, m0 = built(s)
            dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
            out_c = sb._run_force(planes[:2 * dim], dens, own, m0, pv, cfg,
                                  False, gate=fgate)
            return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])
        return fn

    rows = [
        ("base_build_d0", row_base),
        ("f0_plain", frow(("grid0", 8))),
        ("f0_qsym", frow(("qsym+grid0", 8))),
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

    with open("benchmarks/micro51_plain_probe_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
