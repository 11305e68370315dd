"""Micro 53: what triggers the ~8 ms second-pallas-launch tax?

Evidence so far: two empty launches on PREBUILT operands are additive
sub-ms (micro37), chained REAL kernels on prebuilt planes are additive
(micro38: 5.48 + 10.2 = 15.19 chained), but in the production context —
where the build produces the operands in the same scan iteration — the
second launch costs ~8.1 ms EMPTY for qsym and plain alike
(micro47/49/51). Hypothesis: operands freshly produced in-iteration.

Rows (settled state, eps-chained, ssync, best-of-3):

  base         build + d_grid0(fresh planes)                   [10.6]
  two_fresh    + f_grid0(fresh planes, fresh dens)             [18.7]
  two_const    + f_grid0(CONST planes, CONST dens) — the second launch
               consumes loop-invariant buffers; the build + first launch
               stay bit-identical to `base`
  dens_fresh   + f_grid0(CONST planes, fresh dens) — which operand?
  barrier      + f_grid0(fresh, fresh) with optimization_barrier on the
               operands — does a scheduling fence change anything?

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro53_fresh_operands.py
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

    # loop-invariant prebuilt operands (closure constants)
    P0, F0_, S0, OWN, M0 = jax.jit(built)(state)
    DENS0 = jax.jit(lambda p: sb._run_density(p, OWN, M0, pv, cfg, False))(
        P0)
    P0 = jax.device_put(np.asarray(P0))
    DENS0 = jax.device_put(np.asarray(DENS0))
    print("prebuilt operands ready", flush=True)

    D0 = ("grid0", 8)
    FG0 = ("qsym+grid0", 8)

    def row_base(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
        return chain(s, dens[0, 0, 0], flat[0], srows[0, 0])

    def row_two_fresh(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
        out_c = sb._run_force(planes[:2 * dim], dens, own, m0, pv, cfg,
                              False, gate=FG0)
        return chain(s, out_c[0, 0, 0], dens[0, 0, 0], flat[0],
                     srows[0, 0])

    def row_two_const(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
        out_c = sb._run_force(P0[:2 * dim], DENS0, own, m0, pv, cfg,
                              False, gate=FG0)
        return chain(s, out_c[0, 0, 0], dens[0, 0, 0], flat[0],
                     srows[0, 0])

    def row_dens_fresh(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
        out_c = sb._run_force(P0[:2 * dim], dens, own, m0, pv, cfg,
                              False, gate=FG0)
        return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])

    def row_barrier(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
        pb, db = jax.lax.optimization_barrier((planes, dens))
        out_c = sb._run_force(pb[:2 * dim], db, own, m0, pv, cfg,
                              False, gate=FG0)
        return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])

    rows = [("base", row_base), ("two_fresh", row_two_fresh),
            ("two_const", row_two_const), ("dens_fresh", row_dens_fresh),
            ("barrier", row_barrier)]
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
        print(f"{name:11s} {ms:7.2f} ms/it (compile {compile_s:.0f}s, "
              f"all {['%.2f' % w for w in walls]})", flush=True)

    with open("benchmarks/micro53_fresh_operands_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
