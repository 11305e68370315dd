"""Per-stage timing of the pallas step at 256k on a settled state —
fills PLAN.md's cost ledger with measured numbers.

Stages timed in isolation (each its own jit, hard device_get sync):
build (sort + reorder + scatters + counts), occupancy bounds, density pass,
force pass, gather-back, and the full fused step.

    python benchmarks/step_breakdown.py [--settle 300] [--tune JSON]
        [--checkpoint PATH]   # reuse a settled state instead of running
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
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    import water_sandbox_tpu as wst
    from water_sandbox_tpu.core.params import KernelCoeffs
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    sim = wst.Simulation.from_scene(args.scene, neighbor_mode="pallas")
    if args.tune:
        sim.tune(**json.loads(args.tune))
    if args.checkpoint:
        from water_sandbox_tpu.runtime import checkpoint
        state, params, _ = checkpoint.load(args.checkpoint)
        sim.state, sim.params = state, params
    else:
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
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    dim = cfg.dim

    results = {}

    build = jax.jit(functools.partial(sb._build_slab_buckets, cfg=cfg))
    results["build"] = timeit(build, state.predicted, state.vel, params)
    planes, counts, addr, overflow = build(state.predicted, state.vel,
                                           params)
    print(f"build {results['build']:.1f} ms  overflow={int(overflow)}",
          flush=True)

    occf = jax.jit(lambda c: sb.occupancy_bounds(c, g))
    results["occupancy"] = timeit(occf, counts)
    own, m0 = occf(counts)
    own_np, m0_np = np.asarray(own), np.asarray(m0)
    results["occ_stats"] = {
        "own_mean": round(float(own_np.mean()), 2),
        "own_p90": int(np.percentile(own_np, 90)),
        "own_max": int(own_np.max()),
        "m0_mean": round(float(m0_np.mean()), 2),
        "m0_p90": int(np.percentile(m0_np, 90)),
        "m0_max": int(m0_np.max()),
    }
    print(f"occupancy {results['occupancy']:.1f} ms  {results['occ_stats']}",
          flush=True)

    pv = sb._param_vector(params, coeffs)

    dens_f = jax.jit(lambda p, o, m: sb._run_density(p, o, m, pv, cfg, False))
    results["density_pass"] = timeit(dens_f, planes, own, m0)
    dens = dens_f(planes, own, m0)
    print(f"density {results['density_pass']:.1f} ms", flush=True)

    force_f = jax.jit(
        lambda p, d, o, m: sb._run_force(p, d, o, m, pv, cfg, False))
    results["force_pass"] = timeit(force_f, planes, dens, own, m0)
    out_c = force_f(planes, dens, own, m0)
    print(f"force {results['force_pass']:.1f} ms", flush=True)

    def gather(out_c, addr):
        cap_p = sb._cap_pad(cfg.cell_capacity)
        return sb.gather_results(out_c, addr, addr == cap_p * L, params)
    gather_f = jax.jit(gather)
    results["gather_back"] = timeit(gather_f, out_c, addr)
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
