"""Micro 14: Newton's-third-law force pass ("qsym") vs the incumbent
qrow3, on the settled flagship checkpoint at the coverage-fixed grid.

    python benchmarks/micro14_qsym.py [--dims 168,44,80]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import numpy as np


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="168,44,80")
    ap.add_argument("--out", default="benchmarks/micro14_qsym_results.json")
    args = ap.parse_args()
    dims = tuple(int(x) for x in args.dims.split(","))

    import water_sandbox_tpu as wst
    from water_sandbox_tpu.core.params import KernelCoeffs
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb
    from water_sandbox_tpu.runtime import checkpoint

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    state, params, _ = checkpoint.load("benchmarks/data/settled_256k.npz")
    cfg = dataclasses.replace(sim.cfg, grid_dims=dims)
    n = cfg.n
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)

    build = jax.jit(lambda p, v: sb._build_slab_buckets(p, v, params, cfg))
    planes, counts, addr, overflow = build(state.predicted, state.vel)
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    own, m0 = sb.occupancy_bounds(counts, g)
    pv = sb._param_vector(params, coeffs)
    dens = jax.jit(lambda *a: sb._run_density(*a, cfg, False))(
        planes, own, m0, pv)
    dropped = addr == sb._cap_pad(cfg.cell_capacity) * L
    print(f"n={n} dims={dims} overflow={int(overflow)}", flush=True)

    results = {"n": n, "dims": list(dims)}
    accs = {}
    for g in ("qrow3", "qsym"):
        run = jax.jit(lambda pl_, d_, o_, m_, p_, g=g: sb._run_force(
            pl_, d_, o_, m_, p_, cfg, False, gate=(g, 8)))
        ms = timeit(run, planes, dens, own, m0, pv)
        out_c = run(planes, dens, own, m0, pv)
        _, _, acc = sb.gather_results(out_c, addr, dropped, params)
        accs[g] = np.asarray(acc)
        results[f"force_{g}"] = round(ms, 2)
        print(f"force {g}: {ms:.2f} ms", flush=True)
    rel = (np.abs(accs["qsym"] - accs["qrow3"])
           / (np.abs(accs["qrow3"]) + 1.0)).max()
    results["maxrel_qsym"] = float(rel)
    print("maxrel qsym vs qrow3:", rel, flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
