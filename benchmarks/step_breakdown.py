"""Per-stage timing of the pallas step at 256k on a settled state —
fills PLAN.md's cost ledger with measured numbers.

Stages timed in isolation (each its own jit, hard device_get sync):
build (sort + reorder + scatters + counts), occupancy, density pass,
force pass, gather-back, rescue-off integrate, and the full fused step.

    python benchmarks/step_breakdown.py [--settle 300] [--tune JSON]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x.ravel()[0])), out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="moving-container-256k")
    ap.add_argument("--settle", type=int, default=300)
    ap.add_argument("--tune", default=None)
    args = ap.parse_args()

    import water_sandbox_tpu as wst
    from water_sandbox_tpu.core.params import KernelCoeffs
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    sim = wst.Simulation.from_scene(args.scene, neighbor_mode="pallas")
    if args.tune:
        sim.tune(**json.loads(args.tune))
    done = 0
    while done < args.settle:
        sim.run(min(50, args.settle - done))
        done += 50
    np.asarray(sim.state.pos)
    print(f"settled {done} steps, ke="
          f"{float(0.5*jnp.sum(sim.state.vel**2)):.3g}", flush=True)

    cfg, params = sim.cfg, sim.params
    state = sim.state
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    gx, gy, gz, S, S_pad, CL, PAD = sb._geometry(cfg)
    dim = cfg.dim

    results = {}

    build = jax.jit(functools.partial(sb._build_slab_buckets, cfg=cfg))
    results["build"] = timeit(build, state.predicted, state.vel, params)
    planes, counts, addr_out, overflow = build(state.predicted, state.vel,
                                               params)
    print(f"build {results['build']:.1f} ms  overflow={int(overflow)}",
          flush=True)

    occf = jax.jit(lambda c: sb.window_occupancy(c, gx, S_pad, PAD))
    results["occupancy"] = timeit(occf, counts)
    occ_win = occf(counts)
    occ_np = np.asarray(occ_win)
    results["occ_stats"] = {
        "mean": round(float(occ_np.mean()), 2),
        "p50": int(np.percentile(occ_np, 50)),
        "p90": int(np.percentile(occ_np, 90)),
        "max": int(occ_np.max()),
    }
    print(f"occupancy {results['occupancy']:.1f} ms  {results['occ_stats']}",
          flush=True)

    pv = sb._param_vector(params, coeffs)

    dens_f = jax.jit(lambda p, c, o: sb._run_pass(
        sb._density_kernel, p[:dim], c, o, pv, cfg, 2, False))
    results["density_pass"] = timeit(dens_f, planes, counts, occ_win)
    dens = dens_f(planes, counts, occ_win)
    print(f"density {results['density_pass']:.1f} ms", flush=True)

    def force(planes, counts, occ_win, dens):
        dens_p = jnp.pad(dens, ((0, 0), (0, 0), (PAD, PAD)))
        feats = jnp.concatenate([planes, dens_p], axis=0)
        return sb._run_pass(sb._force_kernel, feats, counts, occ_win, pv,
                            cfg, dim, False)
    force_f = jax.jit(force)
    results["force_pass"] = timeit(force_f, planes, counts, occ_win, dens)
    acc_c = force_f(planes, counts, occ_win, dens)
    print(f"force {results['force_pass']:.1f} ms", flush=True)

    def gather(dens, acc_c, addr_out):
        stacked = jnp.concatenate([dens, acc_c], axis=0).reshape(2 + dim, -1)
        stacked = jnp.concatenate(
            [stacked, jnp.zeros((2 + dim, 1), stacked.dtype)], axis=1)
        return stacked[:, addr_out]
    gather_f = jax.jit(gather)
    results["gather_back"] = timeit(gather_f, dens, acc_c, addr_out)
    print(f"gather {results['gather_back']:.1f} ms", flush=True)

    from water_sandbox_tpu.ops import step as step_mod
    full = jax.jit(lambda s: step_mod.step(s, params, cfg))
    results["full_step"] = timeit(full, state)
    print(f"full step {results['full_step']:.1f} ms "
          f"({sim.cfg.n / results['full_step'] * 1e3:,.0f} ps/s)", flush=True)

    with open("benchmarks/step_breakdown_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
