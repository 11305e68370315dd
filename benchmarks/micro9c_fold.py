"""Micro 9c: folded derived planes ("slabf" density + "qrow6" force) and a
1024-lane tile probe, on the settled flagship checkpoint.

qrow6 expects the density pass to store pow2_der/den and pow3_der/nden in
planes 4/5 ("slabf" gate); the pair body then contracts via Horner — ~3
fewer VPU ops of ~39. Parity vs the incumbent (slab8 + qrow3) is checked on
the gathered accelerations.

    python benchmarks/micro9c_fold.py [--tiles 512,1024]
"""
from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--checkpoint",
                    default="benchmarks/data/settled_256k.npz")
    ap.add_argument("--tiles", default="512,1024")
    ap.add_argument("--out", default="benchmarks/micro9c_results.json")
    args = ap.parse_args()

    import water_sandbox_tpu as wst
    from water_sandbox_tpu.core.params import KernelCoeffs
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb
    from water_sandbox_tpu.runtime import checkpoint

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    state, params, _ = checkpoint.load(args.checkpoint)
    cfg = sim.cfg
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    pv = sb._param_vector(params, coeffs)
    gather = jax.jit(functools.partial(sb.gather_results, params=params))

    results = {"n": int(state.pos.shape[0])}
    ref = None
    import dataclasses
    cfg0 = cfg
    for tile in [int(t) for t in args.tiles.split(",")]:
        cfg = dataclasses.replace(cfg0, tile_override=tile)
        g = sb._geometry(cfg)
        gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
        build = jax.jit(functools.partial(sb._build_slab_buckets, cfg=cfg))
        planes, counts, addr, _ = build(state.predicted, state.vel, params)
        own, m0 = jax.jit(
            lambda c: sb.occupancy_bounds(c, g))(counts)
        dropped = addr == sb._cap_pad(cfg.cell_capacity) * L

        for dgate, fgate in ((("slab", 8), ("qrow3", 8)),
                             (("slabf", 8), ("qrow6", 8))):
            tag = f"{fgate[0]}_t{tile}"
            try:
                dpass = jax.jit(functools.partial(
                    sb._run_density, params_vec=pv, cfg=cfg,
                    interpret=False, gate=dgate))
                dms = timeit(dpass, planes, own, m0)
                dens = dpass(planes, own, m0)
                fpass = jax.jit(functools.partial(
                    sb._run_force, params_vec=pv, cfg=cfg,
                    interpret=False, gate=fgate))
                fms = timeit(fpass, planes, dens, own, m0)
                _, _, acc = gather(fpass(planes, dens, own, m0),
                                   addr, dropped)
            except Exception as e:  # noqa: BLE001 — record and move on
                results[f"error_{tag}"] = repr(e)[:200]
                print(f"{tag}: FAILED {e!r}", flush=True)
                continue
            acc = np.asarray(acc)
            results[f"density_{dgate[0]}_t{tile}"] = round(dms, 2)
            results[f"force_{tag}"] = round(fms, 2)
            if ref is None:
                ref = acc
            else:
                scale = max(1.0, float(np.abs(ref).max()))
                results[f"maxrel_{tag}"] = float(
                    np.abs(acc - ref).max()) / scale
            print(f"t{tile} {dgate[0]}+{fgate[0]}: density {dms:.2f} "
                  f"force {fms:.2f} ms", flush=True)

    print(json.dumps(results, indent=1))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
