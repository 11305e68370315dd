"""Micro 34: does the kernels' zero-work floor scale with GRID-STEP COUNT?

micro32 bisected the floor at T1024 (672 grid steps/pass): ~11.5-14.4 us
per grid step of pure machinery — not output movement (out_any saves
0.3 ms), not window DMA (0.4-0.8 ms). micro33 then found the raw tile
sweep FLAT (T2048) to worse (T4096): floor savings cancel against
pair-slot padding growth, because the occupancy bounds coarsen with _T.

This separates the two by measuring the EMPTY-BODY (grid0) floor alone at
T in {1024, 2048, 4096} (grid steps 672 / 336 / 168 per pass), with a
same-session build anchor (occ) per tile width:

* floor ~ per grid step  -> d_grid0(T4096) - occ ~= (d_grid0(T1024) - occ)/4
  => the lever is wide tiles + SUBTILED query loops (fine-grained
     occupancy bounds inside one grid step) to keep padding at T1024
     levels while deleting 3/4 of the floor (~13 ms of the 43 ms step).
* floor ~ per launch     -> d_grid0 invariant in _T => lever class dead.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro34_floor_tile.py
"""
from __future__ import annotations

import json
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

    def occ_probe(s):
        planes, flat, srows, own, m0 = built(s)
        return chain(s, own[0, 0].astype(jnp.float32),
                     m0[0, 0].astype(jnp.float32), flat[0], srows[0, 0])

    def d_probe(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False,
                               gate=("grid0", 8))
        return chain(s, dens[0, 0, 0], flat[0], srows[0, 0])

    def f_probe(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False)
        out_c = sb._run_force(planes, dens, own, m0, pv, cfg, False,
                              gate=("qsym+grid0", 8))
        return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])

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

    results = {"n": cfg.n, "steps_per_scan": STEPS,
               "note": "empty-body (grid0) kernel floors vs tile width; "
               "occ = same-session build anchor per width; flagship grid "
               "steps/pass = 672/336/168 @ T1024/2048/4096"}
    import dataclasses
    cfg0 = cfg
    for t in (1024, 2048, 4096):
        # rebind the closure the probes read: each width traces fresh jits
        cfg = dataclasses.replace(cfg0, tile_override=t)
        for name, fn in (("occ", occ_probe), ("d_grid0", d_probe),
                         ("f_grid0", f_probe)):
            ms, compile_s = scan_time(fn)
            results[f"{name}_T{t}"] = round(ms, 2)
            print(f"T{t:<5d} {name:9s} {ms:7.2f} ms/it "
                  f"(compile {compile_s:.0f}s)", flush=True)

    with open("benchmarks/micro34_floor_tile_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
