"""Micro 9: force-kernel op-count trims (round 3 perf push).

Times `_run_force` gate variants on the settled flagship checkpoint in one
TPU session and checks each variant's output against the incumbent "qrow"
(same pairs, different op schedule/reassociation -> tolerance compare).

    python benchmarks/micro9_force.py [--checkpoint PATH]
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
    ap.add_argument("--variants", default="qrow,qrow2,qrow3")
    ap.add_argument("--tile", type=int, default=0,
                    help="pin the lane-tile width (0 = cfg auto)")
    ap.add_argument("--t512", action="store_true",
                    help="also measure qrow3 with 512-lane tiles")
    ap.add_argument("--out", default="benchmarks/micro9_force_results.json")
    args = ap.parse_args()

    import water_sandbox_tpu as wst
    from water_sandbox_tpu.core.params import KernelCoeffs
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb
    from water_sandbox_tpu.runtime import checkpoint

    import dataclasses

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    state, params, _ = checkpoint.load(args.checkpoint)
    cfg = sim.cfg
    if args.tile:
        cfg = dataclasses.replace(cfg, tile_override=args.tile)
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]

    build = jax.jit(functools.partial(sb._build_slab_buckets, cfg=cfg))
    planes, counts, addr, overflow = build(state.predicted, state.vel,
                                           params)
    own, m0 = jax.jit(
        lambda c: sb.occupancy_bounds(c, g))(counts)
    pv = sb._param_vector(params, coeffs)
    dens = jax.jit(functools.partial(
        sb._run_density, params_vec=pv, cfg=cfg, interpret=False))(
            planes, own, m0)

    # particle-order reference results for the parity compare (only valid
    # slots are gathered; unwritten plane rows are excluded by addr)
    dropped = addr == sb._cap_pad(cfg.cell_capacity) * L
    gather = jax.jit(functools.partial(sb.gather_results, params=params))

    results = {"n": int(state.pos.shape[0])}
    ref = None
    for name in args.variants.split(","):
        gate = (name, 8)
        f = jax.jit(functools.partial(
            sb._run_force, params_vec=pv, cfg=cfg, interpret=False,
            gate=gate))
        ms = timeit(f, planes, dens, own, m0)
        results[f"force_{name}"] = round(ms, 2)
        if not name.startswith("qdiag"):
            den, nden, acc = gather(f(planes, dens, own, m0), addr, dropped)
            acc = np.asarray(acc)
            if ref is None:
                ref = acc
            else:
                scale = max(1.0, float(np.abs(ref).max()))
                rel = float(np.abs(acc - ref).max()) / scale
                results[f"maxrel_{name}"] = rel
                print(f"{name}: maxrel vs {args.variants.split(',')[0]}"
                      f" = {rel:.3g}", flush=True)
        print(f"force {name}: {ms:.2f} ms", flush=True)

    if args.t512:
        # re-run the full pipeline under 512-lane tiles (window margin 256
        # keeps PAD a multiple of _T); probes whether the ~15 ns/vector-op
        # wall amortizes with wider tiles
        cfg = dataclasses.replace(cfg, tile_override=512)
        g = sb._geometry(cfg)
        gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
        # fresh jit wrappers: the earlier ones would replay executables
        # traced under the 256-lane geometry (same input shapes)
        build2 = jax.jit(functools.partial(sb._build_slab_buckets, cfg=cfg))
        planes2, counts2, addr2, _ = build2(state.predicted, state.vel,
                                            params)
        own2, m02 = jax.jit(
            lambda c: sb.occupancy_bounds(c, g))(counts2)
        dpass = jax.jit(functools.partial(
            sb._run_density, params_vec=pv, cfg=cfg, interpret=False))
        results["density_slab8_t512"] = round(
            timeit(dpass, planes2, own2, m02), 2)
        dens2 = dpass(planes2, own2, m02)
        f2 = jax.jit(functools.partial(
            sb._run_force, params_vec=pv, cfg=cfg, interpret=False,
            gate=("qrow3", 8)))
        ms = timeit(f2, planes2, dens2, own2, m02)
        results["force_qrow3_t512"] = round(ms, 2)
        dropped2 = addr2 == sb._cap_pad(cfg.cell_capacity) * L
        _, _, acc = gather(f2(planes2, dens2, own2, m02), addr2, dropped2)
        acc = np.asarray(acc)
        if ref is not None:
            scale = max(1.0, float(np.abs(ref).max()))
            results["maxrel_t512"] = float(np.abs(acc - ref).max()) / scale
        print(f"force qrow3 T512: {ms:.2f} ms "
              f"(density {results['density_slab8_t512']:.2f})", flush=True)

    print(json.dumps(results, indent=1))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
