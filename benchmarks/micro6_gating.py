"""Micro 6: candidate-gating granularity for the Pallas SPH kernels.

Times `_run_density`/`_run_force` on the settled flagship state across
(structure, block) gating variants in ONE TPU session — per-row gating
("slab", 1) unexpectedly made the force pass 1.8x SLOWER than 8-row blocks
despite ~2.8x less pair work, so this maps the whole space to pick
_DENSITY_GATE/_FORCE_GATE empirically.

    python benchmarks/micro6_gating.py [--checkpoint PATH]
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
    ap.add_argument("--variants", default="",
                    help="comma list like 'slab8,qrow8' (default: all)")
    ap.add_argument("--out", default="benchmarks/micro6_gating_results.json")
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
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]

    build = jax.jit(functools.partial(sb._build_slab_buckets, cfg=cfg))
    planes, counts, addr, overflow = build(state.predicted, state.vel,
                                           params)
    own, m0 = jax.jit(
        lambda c: sb.occupancy_bounds(c, g))(counts)
    pv = sb._param_vector(params, coeffs)

    variants = [("slab", 1), ("slab", 2), ("slab", 4), ("slab", 8),
                ("off", 4), ("off", 8), ("qrow", 8), ("noop", 8)]
    if args.variants:
        allow = set(args.variants.split(","))
        variants = [v for v in variants if f"{v[0]}{v[1]}" in allow]
    results = {"n": int(state.pos.shape[0])}

    dens = None
    for gate in variants:
        f = jax.jit(functools.partial(
            sb._run_density, params_vec=pv, cfg=cfg, interpret=False,
            gate=gate))
        ms = timeit(f, planes, own, m0)
        results[f"density_{gate[0]}{gate[1]}"] = round(ms, 2)
        print(f"density {gate}: {ms:.2f} ms", flush=True)
        if dens is None:
            dens = f(planes, own, m0)

    for gate in variants:
        f = jax.jit(functools.partial(
            sb._run_force, params_vec=pv, cfg=cfg, interpret=False,
            gate=gate))
        ms = timeit(f, planes, dens, own, m0)
        results[f"force_{gate[0]}{gate[1]}"] = round(ms, 2)
        print(f"force {gate}: {ms:.2f} ms", flush=True)

    print(json.dumps(results, indent=1))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
