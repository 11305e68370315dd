"""Micro 58: pair-slot padding census at the ADOPTED container-frame
layout (the micro30 decomposition, recomputed at grid (162, 32, 58),
T1024, body-frame cells) — round-6 needs the updated f_query/f_cand
shares before attacking the 12.4 ms of kernel bodies.

Settles the flagship 600 steps on the chip, then does the census on
host numpy from the body-frame cell keys.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro58_cf_census.py
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import hashing
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    done = 0
    while done < 600:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled@600", flush=True)
    cfg, params, state = sim.cfg, sim.params, sim.state
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    T = g.T
    cap = cfg.cell_capacity
    cap_p = sb._cap_pad(cap)
    h = float(params.smoothing_radius)
    n = cfg.n
    dim = cfg.dim

    kpred = np.asarray(hashing.key_coords(
        jnp.asarray(state.predicted), params, cfg, state.time))
    origin = kpred.min(axis=0) - h
    cell = np.clip(((kpred - origin) / h).astype(np.int64), 0,
                   np.asarray(cfg.grid_dims) - 1)

    # true pairs (within h of PREDICTED positions, world frame == body
    # frame distances): chunked O(n^2) on host is too slow; count via the
    # cell-bucket candidate sweep in numpy instead.
    counts3 = np.zeros(cfg.grid_dims, np.int64)
    np.add.at(counts3, tuple(cell.T), 1)
    occ_cells = int((counts3 > 0).sum())
    cand27 = 0
    from itertools import product
    for off in product((-1, 0, 1), repeat=dim):
        shifted = cell + np.asarray(off)
        ok = ((shifted >= 0) & (shifted < np.asarray(cfg.grid_dims))).all(1)
        cand27 += int(counts3[tuple(shifted[ok].T)].sum())

    # padded-tile census (numpy re-implementation of occupancy_bounds)
    row = np.zeros(L, np.int64)
    lane = PAD + cell[:, 0] * S_pad + cell[:, 1] * gz + cell[:, 2]
    np.add.at(row, lane, 1)
    row = np.minimum(row, cap)
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

    NDY1 = 1 + (3 ** (dim - 1) - 1) // 2
    NDY2 = 3 ** (dim - 1)
    blocks = lambda o: -(-np.minimum(o, cap_p) // 8)
    q = own
    b1 = blocks(m0[1:gx + 1])
    b2 = blocks(m0[2:gx + 2])
    force_tiles = int((q * (b1 * NDY1 + b2 * NDY2)).sum())
    half_cand = (cand27 + n) / 2.0

    results = {
        "n": n, "dims": list(cfg.grid_dims), "grid_frame": cfg.grid_frame,
        "T": T, "cap": cap, "L": int(L), "grid_programs": int(gx * NYC),
        "programs_active": int((q > 0).sum()),
        "occupied_cells": occ_cells,
        "mean_occ_occupied": round(n / occ_cells, 3),
        "max_cell_occupancy": int(counts3.max()),
        "cand27_per_particle": round(cand27 / n, 2),
        "query_row_lanes": int(q.sum()) * T,
        "f_query": round(int(q.sum()) * T / n, 2),
        "force_tiles": force_tiles,
        "force_pair_slots": force_tiles * 8 * T,
        "force_pair_slots_per_half_cand": round(
            force_tiles * 8 * T / half_cand, 2),
    }
    with open("benchmarks/micro58_cf_census_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
