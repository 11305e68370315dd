"""Micro 30: padding-waste decomposition + lane-tile width sweep (round 4).

VERDICT r3 item 1: before any "accept", decompose computed pair-slots per
true pair into measured factors, then pull the top densification lever.

Part A (analytic, from the settled state + the kernels' static loop
structure): the qsym force pass evaluates, per (slab, yc) program,
`own[i,yc]` query rows x (gated 8-slot candidate blocks x dy-offset
tiles) x _T lanes. From the settled occupancy census this script computes
the exact number of (8, _T) pair tiles the compiled kernel issues and
splits computed-pair-slots per true pair into:

  f_geom   — candidates in the 27-cell neighborhood per true pair (the
             cell-list geometric floor; the reference's WGSL walk pays
             this too, simulation.wgsl:219-263)
  f_query  — query-side waste: own(chunk-max) x _T lanes processed per
             query row vs one slot per real particle (empty lanes +
             chunk-max-vs-actual occupancy)
  f_cand   — candidate-side waste: gated 8-row blocks x dy tiles vs the
             true mean 27-cell candidate count per query (slot padding
             at occ ~2)

  pair_slots / true_pair = f_geom x f_query x f_cand  (exact identity)

Part B (measured): the settled flagship full step, in-scan, at lane-tile
widths 256 / 512(default) / 1024 / 2048. Round-3's t1024 negative predates
the cap 48 -> 16 fix (3x smaller VMEM windows); if the force pass is
vector-issue-bound, wider tiles cut program count (gx x NYC) and the
per-tile-op overhead per pair-slot.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro30_waste.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


STEPS = 50


def main():
    import jax
    import jax.numpy as jnp

    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import hashing
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb
    from water_sandbox_tpu.ops.step import rollout, step as step_fn

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    cfg, params = sim.cfg, sim.params
    done = 0
    while done < 300:
        sim.state = rollout(sim.state, sim.params, sim.cfg, 50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled @300", flush=True)
    state = sim.state

    n, dim = state.pos.shape
    h = float(params.smoothing_radius)
    dims = cfg.grid_dims
    cap = cfg.cell_capacity
    cap_p = sb._cap_pad(cap)

    # ---- Part A: occupancy census (width-independent) ----
    pred = np.asarray(state.predicted)
    origin = np.asarray(hashing.grid_origin(state.predicted,
                                            params.smoothing_radius))
    cell = np.clip(np.floor((pred - origin) / h).astype(np.int64), 0,
                   np.asarray(dims) - 1)
    counts3 = np.bincount(
        (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2],
        minlength=int(np.prod(dims))).reshape(dims).astype(np.int64)

    # candidates within the 27-cell neighborhood (out-of-grid = empty)
    nbr = np.zeros_like(counts3)
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                src = tuple(slice(max(o, 0), d + min(o, 0))
                            for o, d in zip((ox, oy, oz), dims))
                dst = tuple(slice(max(-o, 0), d + min(-o, 0))
                            for o, d in zip((ox, oy, oz), dims))
                nbr[dst] += counts3[src]
    cand27 = int((counts3 * nbr).sum())          # directed, incl. self

    @jax.jit
    def true_pairs(pos, hh):
        c = 8192
        n_pad = -(-n // c) * c
        padded = jnp.pad(pos, ((0, n_pad - n), (0, 0)), constant_values=1e15)
        chunks = padded.reshape(n_pad // c, c, -1)

        def body(tot, cpos):
            d2 = jnp.sum((cpos[:, None, :] - pos[None, :, :]) ** 2, -1)
            return tot + jnp.sum(d2 <= hh * hh), None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), chunks)[0]

    pairs = float(true_pairs(state.predicted, params.smoothing_radius))
    occ_cells = int((counts3 > 0).sum())
    half_cand = (cand27 + n) / 2.0     # qsym evaluates each unordered pair
    half_pairs = (pairs + n) / 2.0     # once (self excluded on both sides)
    results = {
        "n": n, "dims": list(dims), "cap": cap, "settle_steps": done,
        "occupied_cells": occ_cells,
        "mean_occ_occupied": round(n / occ_cells, 3),
        "max_cell_occupancy": int(counts3.max()),
        "true_pairs_per_particle": round(pairs / n, 2),
        "cand27_per_particle": round(cand27 / n, 2),
        "f_geom": round(cand27 / pairs, 2),
    }
    print(json.dumps(results), flush=True)

    NDY1 = 1 + (3 ** (dim - 1) - 1) // 2   # own-slab dys in qsym
    NDY2 = 3 ** (dim - 1)                  # next-slab dys

    def census(cfg):
        """Exact gated-tile counts at cfg's sb geometry (numpy
        re-implementation of occupancy_bounds over the lane row)."""
        g = sb._geometry(cfg)
        gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
        T = g.T
        row = np.zeros(L, np.int64)
        lane = PAD + cell[:, 0] * S_pad + cell[:, 1] * gz + cell[:, 2]
        np.add.at(row, lane, 1)
        row = np.minimum(row, cap)           # plane-derived counts clamp
        own = row[PAD:PAD + gx * S_pad].reshape(gx, NYC, T).max(-1)
        mg = gz + 1
        blk = row[PAD - S_pad:PAD + (gx + 1) * S_pad].reshape(gx + 2, NYC, T)
        bmax = blk.max(-1)
        ledge = blk[:, :, :mg].max(-1)
        redge = blk[:, :, T - mg:].max(-1)
        zero = np.zeros_like(bmax[:, :1])
        m0 = np.maximum(bmax, np.maximum(
            np.concatenate([zero, redge[:, :-1]], 1),
            np.concatenate([ledge[:, 1:], zero], 1)))

        blocks = lambda o: -(-np.minimum(o, cap_p) // 8)
        q = own
        b1 = blocks(m0[1:gx + 1])        # occs[1] = m0[i+1] (own slab)
        b2 = blocks(m0[2:gx + 2])        # occs[2] = m0[i+2] (next slab)
        force_tiles = int((q * (b1 * NDY1 + b2 * NDY2)).sum())
        dens_rowops = int((-(-q // 8) * 8 * NDY2
                           * (blocks(m0[0:gx]) + b1 + b2)).sum())
        return {
            "T": T, "NYC": NYC, "grid_programs": gx * NYC,
            "programs_active": int((q > 0).sum()),
            "query_row_lanes": int(q.sum()) * T,
            "force_tiles": force_tiles,
            "force_pair_slots": force_tiles * 8 * T,
            "density_rowops": dens_rowops,
            "density_pair_slots": dens_rowops * 8 * T,
        }

    def timed_step(cfg):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (step_fn(c, params, cfg), None),
                                s, None, length=STEPS)[0]

        out = run(state)
        np.asarray(out.pos)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out.pos)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls)

    import dataclasses
    widths = [int(w) for w in sys.argv[1:]] or [512, 256, 1024, 2048]
    for width in widths:
        cfg_w = dataclasses.replace(cfg, tile_override=width)
        row = census(cfg_w)
        row["step_ms"] = round(timed_step(cfg_w), 2)
        row["ps_per_s"] = round(n / row["step_ms"] * 1e3, 0)
        results[f"tile{width}"] = row
        print(f"tile{width}: {json.dumps(row)}", flush=True)

    # exact multiplicative decomposition at the default width
    if "tile512" in results:
        d = results["tile512"]
        f_query = d["query_row_lanes"] / n
        f_cand = (d["force_pair_slots"] / d["query_row_lanes"]) / (
            half_cand / n)
        results["force_pair_slots_per_true_pair_512"] = round(
            d["force_pair_slots"] / half_pairs, 1)
        results["f_query_512"] = round(f_query, 2)
        results["f_cand_512"] = round(f_cand, 2)
        results["decomposition_note"] = (
            "pair_slots/true_pair ~= f_geom(cell-list floor, reference pays "
            "it too) x f_query(chunk-max occupancy x lanes per query row) "
            "x f_cand(8-row block + dy-tile padding vs true 27-cell "
            "candidates); exact up to the self-pair terms (qsym halves "
            "unordered pairs); all from the same settled state")

    with open("benchmarks/micro30_waste_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
