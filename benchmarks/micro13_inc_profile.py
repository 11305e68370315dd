"""Micro 13: piece-wise profile of the incremental step (v2) on TPU.

Times each component of ops/pallas/incremental.py::step_inc in isolation
from the settled flagship checkpoint — to find where the inc arm's time
goes relative to the rebuild-per-step pipeline.

    python benchmarks/micro13_inc_profile.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=8, warmup=2):
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
    cfg = sim.cfg
    state, params, _ = checkpoint.load("benchmarks/data/settled_256k.npz")
    n = cfg.n
    dim = cfg.dim
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    cap_p = sb._cap_pad(cfg.cell_capacity)
    PL = cap_p * L
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, dim)
    pv = sb._param_vector(params, coeffs)
    M = inc.mover_budget(cfg)
    results = {"n": n, "M": M}

    cache = jax.jit(inc.build_cache, static_argnums=3)(
        state.predicted, state.vel, params, cfg)
    planes, addr, origin, ticks = cache

    # advance one step so movers exist (realistic machinery load)
    st1, c1 = jax.jit(inc.step_inc, static_argnums=(3, 4, 5))(
        state, cache, params, cfg, True, False)
    planes, addr = c1.planes, c1.addr
    state = st1

    def piece(name, fn, *args):
        ms = timeit(jax.jit(fn), *args)
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)
        return fn(*args)

    rows = piece(
        "rows_gather",
        lambda planes, addr: planes.reshape(2 * dim, -1)[
            :, jnp.minimum(addr, PL - 1)], planes, addr)
    pred_c = rows[:dim].T
    vel_c = rows[dim:].T

    def movers(pred_c, addr):
        newcol = inc._new_columns(pred_c, origin, params, cfg, S_pad)
        moved = newcol != (addr % L - PAD)
        iota = jnp.arange(n, dtype=jnp.int32)
        skey, sidx = jax.lax.sort(
            (jnp.where(moved, newcol, inc._I32_MAX), iota), num_keys=1)
        return skey[:M], sidx[:M]
    mk, mid = piece("mover_sort", movers, pred_c, addr)

    def slot_pick(mk, planes):
        top, occ_total = inc._top_row(planes, cap_p)
        occupied = planes[0] < 0.5 * sb._FAR
        valid = mk < inc._I32_MAX
        miota = jnp.arange(M, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones((1,), bool), mk[1:] != mk[:-1]])
        rank = miota - jax.lax.cummax(jnp.where(first, miota, 0))
        col_safe = jnp.where(valid, mk, 0)
        top_at = top[0, PAD + col_safe].astype(jnp.int32)
        slot_no = jax.lax.broadcasted_iota(jnp.float32, (cap_p, L), 0)
        es = jnp.where(occupied, jnp.float32(cap_p), slot_no)
        ff = jnp.min(es, axis=0)
        es2 = jnp.where(es == ff[None, :], jnp.float32(cap_p), es)
        sf = jnp.min(es2, axis=0)
        first_free = ff[PAD + col_safe].astype(jnp.int32)
        second_free = sf[PAD + col_safe].astype(jnp.int32)
        slot = jnp.where(
            rank == 0, first_free,
            jnp.where(rank == 1, second_free,
                      jnp.maximum(top_at, second_free + 1) + (rank - 2)))
        ok = valid & (slot < cfg.cell_capacity)
        return jnp.where(ok, slot * L + PAD + (mk * ok), PL), ok, valid
    newaddr, ok, valid = piece("slot_pick_and_frees", slot_pick, mk, planes)

    def scatter(planes, addr, pred_c, vel_c, mid, newaddr, ok, valid):
        OOB = 2 * dim * PL
        oldaddr_m = addr[mid]
        clear_idx = jnp.where(valid & (oldaddr_m < PL), oldaddr_m, OOB)
        rows_m = jnp.concatenate([pred_c, vel_c], axis=1)[mid]
        ins_idx = [jnp.where(ok, a * PL + newaddr, OOB)
                   for a in range(2 * dim)]
        all_idx = jnp.concatenate([clear_idx] + ins_idx)
        all_val = jnp.concatenate(
            [jnp.full((M,), sb._FAR, jnp.float32)]
            + [rows_m[:, a] for a in range(2 * dim)])
        flat = planes.reshape(-1).at[all_idx].set(
            all_val, mode="drop", unique_indices=True)
        addr2 = addr.at[jnp.where(valid, mid, n)].set(
            jnp.where(ok, newaddr, PL), mode="drop", unique_indices=True)
        return flat.reshape(2 * dim, cap_p, L), addr2
    planes_r, addr_r = piece("mover_scatter", scatter, planes, addr,
                             pred_c, vel_c, mid, newaddr, ok, valid)

    def bounds(planes_r):
        top, _ = inc._top_row(planes_r, cap_p)
        return sb.occupancy_bounds(top, g)
    own, m0 = piece("top_and_bounds", bounds, planes_r)

    dens = piece("density", lambda p, o, m: sb._run_density(
        p, o, m, pv, cfg, False), planes_r, own, m0)
    out_c = piece("force", lambda p, d, o, m: sb._run_force(
        p, d, o, m, pv, cfg, False), planes_r, dens, own, m0)

    t_new = state.time + params.dt

    def integ(planes_r, out_c):
        look = params.lookahead
        occupied = planes_r[0] < 0.5 * sb._FAR
        np_, nv_, npr_ = integrate_mod.integrate_axes(
            [planes_r[a] - planes_r[dim + a] * look for a in range(dim)],
            [planes_r[dim + a] for a in range(dim)],
            [out_c[2 + a] for a in range(dim)], params, t_new)
        return jnp.stack(
            [jnp.where(occupied, npr_[a], sb._FAR) for a in range(dim)]
            + [jnp.where(occupied, nv_[a], 0.0) for a in range(dim)])
    piece("integrate_planes", integ, planes_r, out_c)

    # reference: the rebuild path's build from particle order
    piece("full_build", lambda p, v: sb._build_slab_buckets(
        p, v, params, cfg)[0], state.predicted, state.vel)

    step_j = jax.jit(inc.step_inc, static_argnums=(3, 4, 5))
    results["full_step_inc"] = round(timeit(
        lambda s, c: step_j(s, c, params, cfg, False, False), st1, c1), 2)
    print("full_step_inc:", results["full_step_inc"], flush=True)

    print(json.dumps(results, indent=1))
    with open("benchmarks/micro13_inc_profile.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
