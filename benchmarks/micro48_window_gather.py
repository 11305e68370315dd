"""Micro 48: could a WINDOW-GATHER build replace the 6 feature scatters?

The build's 6 per-feature scatters are the largest non-kernel term
(~1.3 ms each in-scan, micro39/47). After the one lax.sort the particles
are already cell-contiguous, so the planes could instead be produced by
ONE windowed gather: for each of the L lanes (cells), slice (cap_p, nf)
rows of the sorted feature array starting at that cell's run start, then
mask slots >= occupancy (they alias the NEXT cell's rows — real
particles, so unmasked they would double-count pairs).

Whether this wins hinges on one unmeasured number: the per-index cost of
a (cap_p, nf) = (16, 6) slice window vs the measured ~13 ns/index of
(1, F) row gathers (micro2: multi-feature windows ~free). If windows
price per-ROW, L x 13 ns ~ 4.4 ms beats ~7.8 ms of scatters; if they
price per-ELEMENT, 16x kills it. This measures, in a 50-step scan on the
settled flagship state (cf layout: L = 337k lanes):

  scatters6      the production 6-scatter cellmajor build (anchor)
  wingather      2 int scatters (starts_L, occ_L) + lax.gather with
                 slice_sizes (cap_p, nf) + mask + transpose to (nf,
                 cap_p, L) — bit-compared against the production planes

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro48_window_gather.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50


def main():
    import water_sandbox_tpu as wst
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
    L = g.L
    cap_p = sb._cap_pad(cfg.cell_capacity)
    dim = cfg.dim
    nf = 2 * dim
    h = params.smoothing_radius

    from water_sandbox_tpu.ops import hashing

    def sort_core(s):
        """Shared prefix: keys + sort + slot ranks (identical in both)."""
        kpred = hashing.key_coords(s.predicted, params, cfg, s.time)
        origin = hashing.grid_origin(kpred, h)
        cell = jnp.floor((kpred - origin) / h).astype(jnp.int32)
        cell = jnp.clip(cell, 0,
                        jnp.asarray(cfg.grid_dims, jnp.int32) - 1)
        r = cell[:, 1] * g.gz + cell[:, 2]
        col = cell[:, 0] * g.S_pad + r
        n = col.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        sorted_col, order = jax.lax.sort((col, iota), num_keys=1)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_col[1:] != sorted_col[:-1]])
        run_start = jax.lax.cummax(jnp.where(first, iota, 0))
        slot = iota - run_start
        rows = jnp.concatenate([s.predicted, s.vel], axis=1)
        srows = jnp.take(rows, order, axis=0)
        return sorted_col, first, run_start, slot, srows

    def chain(s, *scalars):
        eps = sum(jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30
                  for x in scalars)
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def build_scatter(s):
        sorted_col, first, run_start, slot, srows = sort_core(s)
        ok = slot < cfg.cell_capacity
        flat = jnp.where(ok, slot * L + g.PAD + sorted_col, cap_p * L)
        planes = sb._scatter_planes(srows, flat, dim, cap_p, L,
                                    srows.dtype, mode="cellmajor")
        return planes

    def row_scatters6(s):
        planes = build_scatter(s)
        d0 = sb._run_density(planes, OWN0, M00, PV, cfg, False,
                             gate=("grid0", 8))
        return chain(s, d0[0, 0, 0])

    def build_wingather(s):
        sorted_col, first, run_start, slot, srows = sort_core(s)
        n = sorted_col.shape[0]
        lane = g.PAD + sorted_col
        # starts_L: run start per lane; n (-> fill rows) where empty
        starts = jnp.full((L,), n, jnp.int32).at[
            jnp.where(first, lane, L)].set(
            jnp.where(first, run_start, 0), mode="drop",
            unique_indices=True)
        # occ_L: scatter (slot+1) at last-of-cell rows
        last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
        occ = jnp.zeros((L,), jnp.int32).at[
            jnp.where(last, lane, L)].set(
            jnp.where(last, jnp.minimum(slot + 1, cfg.cell_capacity), 0),
            mode="drop", unique_indices=True)
        # pad srows with cap_p fill rows (pos=_FAR, vel=0) so full windows
        # starting at any real run_start stay in bounds
        fills = jnp.concatenate(
            [jnp.full((cap_p, dim), sb._FAR, srows.dtype),
             jnp.zeros((cap_p, dim), srows.dtype)], axis=1)
        src = jnp.concatenate([srows, fills], axis=0)      # (n+cap_p, nf)
        starts_c = jnp.minimum(starts, n)
        gathered = jax.vmap(
            lambda st: jax.lax.dynamic_slice(src, (st, 0), (cap_p, nf))
        )(starts_c)                                        # (L, cap_p, nf)
        slot_ids = jnp.arange(cap_p, dtype=jnp.int32)[None, :, None]
        fill_row = fills[0][None, None, :]
        planes = jnp.where(slot_ids < occ[:, None, None], gathered,
                           fill_row)
        return jnp.transpose(planes, (2, 1, 0))            # (nf, cap_p, L)

    def row_wingather(s):
        planes = build_wingather(s)
        d0 = sb._run_density(planes, OWN0, M00, PV, cfg, False,
                             gate=("grid0", 8))
        return chain(s, d0[0, 0, 0])

    # static anchors for the grid0 consume (zero-work kernels; bounds all
    # zero so the kernel does nothing but its launch/output machinery —
    # identical in both rows, cancels in the A/B)
    from water_sandbox_tpu.core.params import KernelCoeffs
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    PV = sb._param_vector(params, coeffs)
    OWN0 = jnp.zeros((g.gx, g.NYC), jnp.int32)
    M00 = jnp.zeros((g.gx + 2, g.NYC), jnp.int32)

    # correctness: bit-compare the two builds once
    p_sc = jax.jit(build_scatter)(state)
    p_wg = jax.jit(build_wingather)(state)
    same = bool(jnp.all(p_sc == p_wg))
    print("planes bit-identical:", same, flush=True)

    def scan_time(body, reps=3):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (body(c), None), s,
                                None, length=STEPS)[0]
        t0 = time.perf_counter()
        out = run(state)
        np.asarray(out.time)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out.time)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), compile_s, walls

    results = {"n": cfg.n, "L": int(L), "cap_p": int(cap_p),
               "steps_per_scan": STEPS, "protocol": "ssync",
               "planes_bit_identical": same}
    for name, fn in (("scatters6", row_scatters6),
                     ("wingather", row_wingather)):
        ms, compile_s, walls = scan_time(fn)
        results[name] = round(ms, 2)
        print(f"{name:10s} {ms:7.2f} ms/it (compile {compile_s:.0f}s, "
              f"all {['%.2f' % w for w in walls]})", flush=True)

    with open("benchmarks/micro48_window_gather_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
