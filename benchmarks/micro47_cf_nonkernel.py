"""Micro 47: bisect the container-frame layout's ~20.4 ms non-kernel
remainder (micro46: step_norescue 32.77, both-bodies-empty 20.98, chain
floor 0.56).

micro46's gate rows follow micro40's design: the gated step still
INTEGRATES its garbage outputs, so from step 2 of the scan the state (and
with it occupancy, window DMA, rescue pressure) is degenerate. Fine for
the value-insensitive aggregate (sort/scatter/gather/stream costs are
per-element or per-byte), but useless for bisecting value-sensitive
terms. Here every row keeps the SETTLED state forever: the scan carries
the real state and each step chains an epsilon of the probed pipeline
back into `predicted` (the micro34/36 anchor pattern — consume every
materialized buffer through a non-DCE-able reader; empty pallas kernels
are the cheap anchors for plane buffers).

  chain          eps-chain only (floor)
  build          bucket build, planes anchored by d_grid0 (cheapest
                 non-DCE consume) = build + density launch/output machinery
  build_df0      + f_grid0: both kernel machineries + output streams
  dens_f0        real density, force empty: density body in a
                 NON-degenerate context
  nogather       real density + real force, out_c eps-anchored — the full
                 compute without gather_results/integrate/reassembly
  full           + gather_results + integrate (compare step_norescue)

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro47_cf_nonkernel.py
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
    cap_p = sb._cap_pad(cfg.cell_capacity)
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

    D0, F0 = ("grid0", 8), ("qsym+grid0", 8)

    def row_chain(s):
        return chain(s, s.predicted[0, 0])

    def row_build(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
        return chain(s, dens[0, 0, 0], flat[0], srows[0, 0])

    def row_build_df0(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False, gate=D0)
        out_c = sb._run_force(planes[:2 * dim], dens, own, m0, pv, cfg,
                              False, gate=F0)
        return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])

    def row_dens_f0(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False)
        out_c = sb._run_force(planes[:2 * dim], dens, own, m0, pv, cfg,
                              False, gate=F0)
        return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])

    def row_nogather(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False)
        out_c = sb._run_force(planes[:2 * dim], dens, own, m0, pv, cfg,
                              False)
        return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])

    def row_full(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False)
        out_c = sb._run_force(planes[:2 * dim], dens, own, m0, pv, cfg,
                              False)
        dropped = flat == cap_p * g.L
        den, nden, acc = sb.gather_results(out_c, flat, dropped, params)
        t_new = s.time + params.dt
        pos, vel, predicted = integrate_mod.integrate(
            srows[:, 2 * dim:3 * dim], srows[:, dim:2 * dim], acc,
            params, t_new)
        return chain(s, pos[0, 0], vel[0, 0], predicted[0, 0],
                     den[0], nden[0])

    rows = [("chain", row_chain), ("build", row_build),
            ("build_df0", row_build_df0), ("dens_f0", row_dens_f0),
            ("nogather", row_nogather), ("full", row_full)]
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
        results[name + "_all"] = [round(w, 2) for w in walls]
        print(f"{name:10s} {ms:7.2f} ms/it (compile {compile_s:.0f}s, "
              f"all {['%.2f' % w for w in walls]})", flush=True)

    with open("benchmarks/micro47_cf_nonkernel_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
