"""Micro 55: fused single-buffer build scatters vs "stack".

"stack" (re-adopted in micro54) materializes 6 per-feature (cap_p, L)
scatter buffers then jnp.stack-copies them into the (6, cap_p, L)
operand (~62 MB copy at the cf layout). "fused" chains the 6 scatters
in place over ONE flat buffer (disjoint feature regions; bit-identical
including overflow sentinels — asserted on CPU). Rows:

  probe_stack     build + d_grid0 + f_grid0 (micro54's 15.6 anchor)
  probe_fused     same with build_scatter='fused'
  full_stack      production step (micro54's 30.32 anchor)
  full_fused      production step with 'fused'

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro55_fused_scatter.py
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
    pv = sb._param_vector(params, coeffs)
    g = sb._geometry(cfg)
    dim = cfg.dim

    def chain(s, *scalars):
        eps = sum(jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30
                  for x in scalars)
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def probe(cfg_v):
        def fn(s):
            ids_f = jax.lax.bitcast_convert_type(s.ids, jnp.float32)[:, None]
            carry = jnp.concatenate([s.pos, ids_f], axis=1)
            planes, counts, flat, _, srows, _ = sb._build_core(
                s.predicted, s.vel, params, cfg_v, carry=carry, time=s.time)
            own, m0 = sb.occupancy_bounds(counts, g)
            dens = sb._run_density(planes, own, m0, pv, cfg_v, False,
                                   gate=("grid0", 8))
            out_c = sb._run_force(planes[:2 * dim], dens, own, m0, pv,
                                  cfg_v, False, gate=("qsym+grid0", 8))
            return chain(s, out_c[0, 0, 0], dens[0, 0, 0], flat[0],
                         srows[0, 0])
        return fn

    def full(cfg_v):
        return lambda s: step_mod.step(s, params, cfg_v)

    variants = {m: dataclasses.replace(cfg, build_scatter=m)
                for m in ("stack", "fused")}
    rows = [("probe_stack", probe(variants["stack"])),
            ("probe_fused", probe(variants["fused"])),
            ("full_stack", full(variants["stack"])),
            ("full_fused", full(variants["fused"]))]
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

    with open("benchmarks/micro55_fused_scatter_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
