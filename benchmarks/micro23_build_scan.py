"""Micro 23: SCAN-amortized bisect of the sorted flagship build.

micro21/micro22's standalone-jit prefixes are contaminated by the axon
tunnel's per-dispatch overhead, which is NOT constant (one sorted step:
106.9 ms standalone vs 68.5 ms inside a 50-step scan). Here every prefix
runs as the body of a 50-iteration lax.scan, exactly like production:
each iteration perturbs `predicted` by a data-dependent (but numerically
zero-ish) scalar folded from the prefix's outputs, so XLA cannot hoist the
loop-invariant body or DCE the prefix.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro23_build_scan.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


STEPS = 50


def scan_time(body, state, reps=3):
    """Min wall ms/iteration of lax.scan(body, state, length=STEPS)."""
    @jax.jit
    def run(s):
        return jax.lax.scan(lambda c, _: (body(c), None), s,
                            None, length=STEPS)[0]

    out = run(state)
    np.asarray(out.pos)  # compile + hard sync
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(state)
        np.asarray(out.pos)
        walls.append((time.perf_counter() - t0) / STEPS * 1e3)
    return min(walls)


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import hashing
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
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    dims = cfg.grid_dims
    cap = cfg.cell_capacity
    cap_p = sb._cap_pad(cap)
    n, dim = state.pos.shape
    h = params.smoothing_radius
    _FAR = sb._FAR

    def chain(s, *scalars):
        """Fold output scalars into `predicted` with numerically-nil effect
        (min(x,0)*1e-30 of finite positives is 0.0) but a live dependency."""
        import dataclasses
        eps = sum(jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30
                  for x in scalars)
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def keys_cells(s):
        origin = hashing.grid_origin(s.predicted, h)
        cell = jnp.floor((s.predicted - origin) / h).astype(jnp.int32)
        cell = jnp.clip(cell, 0, jnp.asarray(dims, jnp.int32) - 1)
        return cell[:, 0] * S_pad + (cell[:, 1] * gz + cell[:, 2])

    def b_keys(s):
        col = keys_cells(s)
        return chain(s, jnp.sum(col, dtype=jnp.float32))

    def _sorted(s):
        col = keys_cells(s)
        iota = jnp.arange(n, dtype=jnp.int32)
        return jax.lax.sort((col, iota), num_keys=1)

    def b_sort(s):
        sorted_col, order = _sorted(s)
        return chain(s, sorted_col[0], order[0])

    def _slots(s):
        sorted_col, order = _sorted(s)
        iota = jnp.arange(n, dtype=jnp.int32)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_col[1:] != sorted_col[:-1]])
        run_start = jax.lax.cummax(jnp.where(first, iota, 0))
        slot = iota - run_start
        ok = slot < cap
        flat = jnp.where(ok, slot * L + PAD + sorted_col, cap_p * L)
        return flat, order, ok

    def b_slots(s):
        flat, order, ok = _slots(s)
        return chain(s, flat[0], order[0])

    def _rows(s):
        flat, order, ok = _slots(s)
        ids_f = jax.lax.bitcast_convert_type(s.ids, jnp.float32)[:, None]
        rows = jnp.concatenate([s.predicted, s.vel, s.pos, ids_f], axis=1)
        srows = jnp.take(rows, order, axis=0)
        return flat, srows, ok

    def b_rows(s):
        flat, srows, ok = _rows(s)
        return chain(s, flat[0], srows[0, 0])

    def _scatter(s, k):
        flat, srows, ok = _rows(s)
        planes = []
        for j in range(k):
            fill = _FAR if j < dim else 0.0
            out = jnp.full((cap_p * L + 1,), fill, jnp.float32)
            planes.append(out.at[flat].set(
                srows[:, j], mode="promise_in_bounds",
                unique_indices=True)[:-1].reshape(cap_p, L))
        return jnp.stack(planes), flat, srows, ok

    def b_scatter(k):
        def fn(s):
            planes, flat, srows, ok = _scatter(s, k)
            return chain(s, planes[0, 0, 0], flat[0], srows[0, 0])
        return fn

    def b_counts(s):
        planes, flat, srows, ok = _scatter(s, 6)
        counts = jnp.sum(jnp.where(planes[0] < _FAR * 0.5, 1.0, 0.0),
                         axis=0, dtype=jnp.float32)[None, :]
        return chain(s, planes[0, 0, 0], counts[0, 0], flat[0], srows[0, 0])

    def _built(s):
        planes, flat, srows, ok = _scatter(s, 6)
        counts = jnp.sum(jnp.where(planes[0] < _FAR * 0.5, 1.0, 0.0),
                         axis=0, dtype=jnp.float32)[None, :]
        own, m0 = sb.occupancy_bounds(counts, g)
        return planes, flat, srows, own, m0

    def b_occ(s):
        planes, flat, srows, own, m0 = _built(s)
        return chain(s, planes[0, 0, 0], own[0, 0], m0[0, 0], flat[0],
                     srows[0, 0])

    from water_sandbox_tpu.core.params import KernelCoeffs
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    pv = sb._param_vector(params, coeffs)

    def b_density(s):
        planes, flat, srows, own, m0 = _built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False)
        return chain(s, dens[0, 0, 0], flat[0], srows[0, 0])

    def b_force(s):
        planes, flat, srows, own, m0 = _built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False)
        out_c = sb._run_force(planes, dens, own, m0, pv, cfg, False)
        return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])

    def b_gather(s):
        planes, flat, srows, own, m0 = _built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False)
        out_c = sb._run_force(planes, dens, own, m0, pv, cfg, False)
        dropped = flat == cap_p * L
        den, nden, acc = sb.gather_results(out_c, flat, dropped, params)
        return chain(s, den[0], nden[0], acc[0, 0], srows[0, 0])

    def b_density0(s):
        # zero occupancy bounds: every gated block skipped — measures the
        # density kernel's fixed grid/DMA machinery floor in-scan
        planes, flat, srows, own, m0 = _built(s)
        z_own, z_m0 = jnp.zeros_like(own), jnp.zeros_like(m0)
        dens = sb._run_density(planes, z_own, z_m0, pv, cfg, False)
        return chain(s, dens[0, 0, 0], flat[0], srows[0, 0])

    def b_force0(s):
        planes, flat, srows, own, m0 = _built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False)
        z_own, z_m0 = jnp.zeros_like(own), jnp.zeros_like(m0)
        out_c = sb._run_force(planes, dens, z_own, z_m0, pv, cfg, False)
        return chain(s, out_c[0, 0, 0], flat[0], srows[0, 0])

    def b_full(s):
        from water_sandbox_tpu.ops import step as step_mod
        return step_mod.step(s, params, cfg)

    stages = [("baseline_chain", lambda s: chain(s, s.pos[0, 0])),
              ("keys", b_keys), ("sort", b_sort), ("slots", b_slots),
              ("rowgather", b_rows), ("scatter1", b_scatter(1)),
              ("scatter3", b_scatter(3)), ("scatter6", b_scatter(6)),
              ("counts", b_counts), ("occ", b_occ),
              ("density", b_density), ("force", b_force),
              ("density0", b_density0), ("force0", b_force0),
              ("gather", b_gather), ("full_step", b_full)]
    import sys
    if len(sys.argv) > 1:  # run a subset (tunnel compiles are slow)
        want = set(sys.argv[1:])
        stages = [st for st in stages if st[0] in want]
    results = {"n": n, "steps_per_scan": STEPS,
               "note": "each prefix scanned 50x like production; stage cost "
               "= diff between consecutive rows"}
    prev = 0.0
    for name, fn in stages:
        ms = scan_time(fn, state)
        results[name] = round(ms, 2)
        print(f"{name:14s} {ms:7.2f} ms/it  (+{ms - prev:6.2f})", flush=True)
        prev = ms

    out_path = "benchmarks/micro23_build_scan_results.json"
    try:
        import os
        if os.path.exists(out_path):  # merge partial runs
            with open(out_path) as f:
                old = json.load(f)
            old.update(results)
            results = old
    except Exception:
        pass
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
