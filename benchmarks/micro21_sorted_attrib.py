"""Micro 21: prefix-composition attribution of the SORTED flagship step.

step_breakdown.py times stages in isolation, which adds the axon tunnel's
per-dispatch tax (~5-6 ms, micro7) to every number. Here each measurement
is a PREFIX of the real sorted-state pipeline compiled as one jit — the
stage cost is the DIFFERENCE between consecutive prefixes, which cancels
the dispatch tax and keeps XLA fusion close to the production program.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro21_sorted_attrib.py
"""
from __future__ import annotations

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
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.core.params import KernelCoeffs
    from water_sandbox_tpu.ops import integrate as integrate_mod
    from water_sandbox_tpu.ops import step as step_mod
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    done = 0
    while done < 300:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print(f"settled {done}", flush=True)

    cfg, params, state = sim.cfg, sim.params, sim.state
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    dim = cfg.dim
    cap_p = sb._cap_pad(cfg.cell_capacity)
    pv = sb._param_vector(params, coeffs)

    def pre_build(s):
        ids_f = jax.lax.bitcast_convert_type(s.ids, jnp.float32)[:, None]
        carry = jnp.concatenate([s.pos, ids_f], axis=1)
        return sb._build_core(s.predicted, s.vel, params, cfg, carry=carry)

    def pre_occ(s):
        planes, counts, flat, order, srows, overflow = pre_build(s)
        own, m0 = sb.occupancy_bounds(counts, g)
        return planes, flat, srows, own, m0, overflow

    def pre_density(s):
        planes, flat, srows, own, m0, overflow = pre_occ(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False)
        return dens, planes, flat, srows, own, m0, overflow

    def pre_force(s):
        dens, planes, flat, srows, own, m0, overflow = pre_density(s)
        out_c = sb._run_force(planes, dens, own, m0, pv, cfg, False)
        return out_c, dens, flat, srows, overflow

    def pre_gather(s):
        out_c, dens, flat, srows, overflow = pre_force(s)
        dropped = flat == cap_p * L
        den, nden, acc = sb.gather_results(out_c, flat, dropped, params)
        return den, nden, acc, srows, overflow

    def full(s):
        return step_mod.step(s, params, cfg)

    stages = [("build", pre_build), ("occupancy", pre_occ),
              ("density", pre_density), ("force", pre_force),
              ("gather", pre_gather), ("full_step", full)]
    results = {"n": cfg.n, "note": "prefix compositions; stage cost = "
               "difference between consecutive rows (dispatch tax cancels)"}
    prev = 0.0
    for name, fn in stages:
        ms = timeit(jax.jit(fn), state)
        results[name] = round(ms, 2)
        print(f"{name:12s} {ms:7.2f} ms  (+{ms - prev:6.2f})", flush=True)
        prev = ms

    with open("benchmarks/micro21_sorted_attrib_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
