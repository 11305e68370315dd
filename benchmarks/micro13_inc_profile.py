"""Micro 13: piece-wise profile of the incremental step (step_inc) on TPU.

Times each component of ops/pallas/incremental.py::step_inc in isolation
from the settled flagship checkpoint, and reports the rebuild-guard inputs
(nm, drift, debt, overflow) for the first few steps — to find where the
inc arm's time actually goes.

    python benchmarks/micro13_inc_profile.py
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=6, warmup=2):
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
    from water_sandbox_tpu.ops.pallas import incremental as inc
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb
    from water_sandbox_tpu.runtime import checkpoint

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    cfg = dataclasses.replace(sim.cfg, incremental_rebuild=8)
    state, params, _ = checkpoint.load("benchmarks/data/settled_256k.npz")
    n = cfg.n
    dim = cfg.dim
    h = params.smoothing_radius
    gx, gy, gz, S, S_pad, NYC, PAD, L = sb._geometry(cfg)
    cap_p = sb._cap_pad(cfg.cell_capacity)
    PL = cap_p * L
    coeffs = KernelCoeffs.from_radius(h, dim)
    M = inc.mover_budget(cfg)
    results = {"n": n, "M": M}

    cache = jax.jit(inc.build_cache, static_argnums=4)(
        state.predicted, state.vel, state.pos, params, cfg)

    # guard inputs over the first few steps
    st, ca = state, cache
    step_j = jax.jit(inc.step_inc, static_argnums=(3, 4))
    guards = []
    for i in range(4):
        top, occ_total = jax.jit(inc._top_row, static_argnums=1)(
            ca.planes, cap_p)
        debt = float(jnp.sum(top) - occ_total)
        dropped = int(jnp.sum(ca.addr == PL))
        newcol = inc._new_columns(st.predicted, ca.origin, params, cfg,
                                  S_pad)
        oldcol = ca.addr % L - PAD
        nm = int(jnp.sum(newcol != oldcol))
        mins = jnp.min(st.predicted, axis=0)
        drift = bool(jnp.any(jnp.abs(ca.origin - (mins - h)) > 0.75 * h))
        guards.append({"step": i, "ticks": int(ca.ticks), "debt": debt,
                       "dropped": dropped, "nm_vs_prev": nm,
                       "drift": drift})
        print(guards[-1], flush=True)
        st, ca = step_j(st, ca, params, cfg, False)
    results["guards"] = guards

    # ---- piece timings on the post-build cache ----
    planes, addr, origin, ticks = cache
    top, occ_total = jax.jit(inc._top_row, static_argnums=1)(planes, cap_p)

    results["top_row"] = timeit(
        jax.jit(inc._top_row, static_argnums=1), planes, cap_p)

    @jax.jit
    def bounds(top):
        return sb.occupancy_bounds(top, gx, S_pad, PAD, gz)
    results["occupancy_bounds"] = timeit(bounds, top)
    own, m0 = bounds(top)

    dropped = addr == PL
    overflow = jnp.sum(dropped).astype(jnp.int32)

    @jax.jit
    def passes(planes, own, m0, addr, dropped, overflow, pred, vel):
        return sb.sph_passes(planes, own, m0, addr, dropped, overflow,
                             pred, vel, params, coeffs, cfg, False)
    results["sph_passes"] = timeit(
        passes, planes, own, m0, addr, dropped, overflow,
        state.predicted, state.vel)
    den, nden, prs, nprs, acc, unres, out_c = passes(
        planes, own, m0, addr, dropped, overflow,
        state.predicted, state.vel)

    t_new = state.time + params.dt

    @jax.jit
    def integ(planes, out_c):
        occupied = planes[0] < 0.5 * sb._FAR
        np_, nv_, npr_ = integrate_mod.integrate_axes(
            [planes[2 * dim + a] for a in range(dim)],
            [planes[dim + a] for a in range(dim)],
            [out_c[2 + a] for a in range(dim)], params, t_new)
        return jnp.stack(
            [jnp.where(occupied, npr_[a], sb._FAR) for a in range(dim)]
            + [jnp.where(occupied, nv_[a], 0.0) for a in range(dim)]
            + [jnp.where(occupied, np_[a], 0.0) for a in range(dim)])
    results["integrate_planes"] = timeit(integ, planes, out_c)
    newplanes = integ(planes, out_c)

    @jax.jit
    def gather_rows(newplanes, addr):
        safe = jnp.minimum(addr, PL - 1)
        return newplanes.reshape(3 * dim, -1)[:, safe]
    results["gather_rows"] = timeit(gather_rows, newplanes, addr)
    rows_p = gather_rows(newplanes, addr)
    pred_n = rows_p[:dim].T

    @jax.jit
    def mover_sort(pred_n, addr):
        newcol = inc._new_columns(pred_n, origin, params, cfg, S_pad)
        oldcol = addr % L - PAD
        moved = newcol != oldcol
        iota = jnp.arange(n, dtype=jnp.int32)
        skey, sidx = jax.lax.sort(
            (jnp.where(moved, newcol, inc._I32_MAX), iota), num_keys=1)
        return skey[:M], sidx[:M]
    results["mover_sort"] = timeit(mover_sort, pred_n, addr)
    mk, mid = mover_sort(pred_n, addr)

    @jax.jit
    def slot_pick(mk, planes, top):
        valid = mk < inc._I32_MAX
        miota = jnp.arange(M, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones((1,), bool), mk[1:] != mk[:-1]])
        rank = miota - jax.lax.cummax(jnp.where(first, miota, 0))
        col_safe = jnp.where(valid, mk, 0)
        top_at = top[0, PAD + col_safe].astype(jnp.int32)
        occupied = planes[0] < 0.5 * sb._FAR
        empty_slot = jnp.where(occupied, jnp.float32(cap_p),
                               jax.lax.broadcasted_iota(
                                   jnp.float32, (cap_p, L), 0))
        first_free = jnp.min(empty_slot, axis=0)[PAD + col_safe].astype(
            jnp.int32)
        slot = jnp.where(rank == 0, jnp.minimum(first_free, top_at),
                         top_at + rank)
        ok = valid & (slot < cfg.cell_capacity)
        return jnp.where(ok, slot * L + PAD + (mk * ok), PL), ok, valid
    results["slot_pick"] = timeit(slot_pick, mk, planes, top)
    newaddr, ok, valid = slot_pick(mk, planes, top)
    results["insert_failures"] = int(jnp.sum(valid & ~ok))
    results["movers_valid"] = int(jnp.sum(valid))

    @jax.jit
    def scatter(newplanes, addr, rows_p, mid, newaddr, ok, valid):
        OOB = 3 * dim * PL
        oldaddr_m = addr[mid]
        clear_idx = jnp.where(valid & (oldaddr_m < PL), oldaddr_m, OOB)
        rows_m = jnp.take(rows_p.T, mid, axis=0)
        ins_idx = [jnp.where(ok, a * PL + newaddr, OOB)
                   for a in range(3 * dim)]
        all_idx = jnp.concatenate([clear_idx] + ins_idx)
        all_val = jnp.concatenate(
            [jnp.full((M,), sb._FAR, jnp.float32)]
            + [rows_m[:, a] for a in range(3 * dim)])
        flat = newplanes.reshape(-1).at[all_idx].set(
            all_val, mode="drop", unique_indices=True)
        addr2 = addr.at[jnp.where(valid, mid, n)].set(
            jnp.where(ok, newaddr, PL), mode="drop", unique_indices=True)
        return flat.reshape(3 * dim, cap_p, L), addr2
    results["mover_scatter"] = timeit(
        scatter, newplanes, addr, rows_p, mid, newaddr, ok, valid)

    results["full_step_inc"] = timeit(
        lambda s, c: step_j(s, c, params, cfg, False), state, cache)

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 2)
    print(json.dumps(results, indent=1, default=str), flush=True)
    with open("benchmarks/micro13_inc_profile.json", "w") as f:
        json.dump(results, f, indent=1, default=str)


if __name__ == "__main__":
    main()
