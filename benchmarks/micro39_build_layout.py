"""Micro 39: cell-major contiguous-scatter build vs the 6-scatter stack.

micro37/38 re-attributed ~6.5 ms of the step from "kernel floors" back to
the build: the old prefix ledger DCE'd planes 1-5's scatters (micro23
chained only planes[0,0,0]), so the build is really ~15 ms — the second-
biggest step item. Its dominant cost is 6 feature scatters whose addresses
(flat = slot*L + PAD + col) jump by L between consecutive sorted particles:
every write lands ~2.8 MB from the previous one.

Cell-major addressing flips that: flat2 = (PAD + col)*cap_p + slot makes
consecutive sorted particles write CONSECUTIVE addresses (same cell ->
adjacent slots; next cell -> next cap_p block), and a features-minor
(n, 6)-row scatter makes each update a contiguous 24 B row. The price is
one (L, cap_p, 6) -> (6, cap_p, L) transpose back to the kernels' layout.

Rows (all in-scan, every plane consumed by streaming sums so nothing DCEs):

  build_stack     current production path (6 scatters, slot-major)
  build_cm_row    ONE (n, 6)-row scatter, sorted+unique indices, + transpose
  build_cm_col    6 per-feature scatters at cell-major addresses + transposes
                  (isolates index-locality from row-contiguity)

Also checks bit-equality of the resulting planes vs the stack shape.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro39_build_layout.py
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
    nf = 2 * dim

    def chain_state(s, *scalars):
        eps = sum(jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30
                  for x in scalars)
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def sorted_rows(s):
        origin = hashing.grid_origin(s.predicted, h)
        cell = jnp.floor((s.predicted - origin) / h).astype(jnp.int32)
        cell = jnp.clip(cell, 0, jnp.asarray(dims, jnp.int32) - 1)
        col = cell[:, 0] * S_pad + (cell[:, 1] * gz + cell[:, 2])
        iota = jnp.arange(n, dtype=jnp.int32)
        sorted_col, order = jax.lax.sort((col, iota), num_keys=1)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_col[1:] != sorted_col[:-1]])
        run_start = jax.lax.cummax(jnp.where(first, iota, 0))
        slot = iota - run_start
        ok = slot < cap
        rows = jnp.concatenate([s.predicted, s.vel], axis=1)
        srows = jnp.take(rows, order, axis=0)
        return sorted_col, slot, ok, srows

    fills = jnp.asarray([_FAR] * dim + [0.0] * dim, jnp.float32)

    def planes_stack(s):
        sorted_col, slot, ok, srows = sorted_rows(s)
        flat = jnp.where(ok, slot * L + PAD + sorted_col, cap_p * L)
        return sb._scatter_planes(srows, flat, dim, cap_p, L,
                                  jnp.float32), srows

    def planes_cm_row(s, sorted_claim=True):
        sorted_col, slot, ok, srows = sorted_rows(s)
        flat2 = jnp.where(ok, (PAD + sorted_col) * cap_p + slot,
                          L * cap_p)
        buf = jnp.broadcast_to(fills[None, :], (L * cap_p + 1, nf))
        # the overflow sentinel row L*cap_p is IN bounds here (the buffer
        # carries one extra row that [:-1] drops), so promise_in_bounds is
        # exact, not a promise. indices_are_sorted is only a valid claim
        # when no cell overflows (the sentinel is larger than later cells'
        # addresses) — measured both ways; production would need the
        # unsorted variant unless overflow is statically impossible.
        buf = buf.at[flat2].set(srows, mode="promise_in_bounds",
                                indices_are_sorted=sorted_claim,
                                unique_indices=True)
        return (buf[:-1].reshape(L, cap_p, nf).transpose(2, 1, 0),
                srows)

    def planes_cm_col(s):
        sorted_col, slot, ok, srows = sorted_rows(s)
        flat2 = jnp.where(ok, (PAD + sorted_col) * cap_p + slot,
                          L * cap_p)

        def one(j):
            fill = _FAR if j < dim else 0.0
            out = jnp.full((L * cap_p + 1,), fill, jnp.float32)
            return out.at[flat2].set(
                srows[:, j], mode="promise_in_bounds",
                indices_are_sorted=True,
                unique_indices=True)[:-1].reshape(L, cap_p).T

        return jnp.stack([one(j) for j in range(nf)]), srows

    def consumer(fn):
        def body(s):
            planes, srows = fn(s)
            return chain_state(s, jnp.sum(planes), srows[0, 0])
        return body

    def scan_time(body, init, reps=3):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (body(c), None), s,
                                None, length=STEPS)[0]

        t0 = time.perf_counter()
        out = run(init)
        np.asarray(out.pos)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(init)
            np.asarray(out.pos)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), compile_s

    # bit-equality of the three shapes (once, off-scan)
    p_ref = jax.jit(lambda s: planes_stack(s)[0])(state)
    eq = {}
    for name, fn in (("cm_row", planes_cm_row), ("cm_col", planes_cm_col)):
        p = jax.jit(lambda s, f=fn: f(s)[0])(state)
        eq[name] = bool(jnp.all(p == p_ref))
        print(f"equal[{name}] = {eq[name]}", flush=True)

    stages = [
        ("build_stack", consumer(planes_stack)),
        ("build_cm_row", consumer(planes_cm_row)),
        ("build_cm_row_us",
         consumer(lambda s: planes_cm_row(s, sorted_claim=False))),
        ("build_cm_col", consumer(planes_cm_col)),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        stages = [st for st in stages if st[0] in want]

    results = {"n": n, "steps_per_scan": STEPS, "equal": eq,
               "note": "in-scan; every plane consumed via streaming sums "
               "(no scatter DCE — cf. micro23's flawed anchors)"}
    for name, body in stages:
        ms, compile_s = scan_time(body, state)
        results[name] = round(ms, 2)
        print(f"{name:14s} {ms:7.2f} ms/it  (compile {compile_s:.0f}s)",
              flush=True)

    with open("benchmarks/micro39_build_layout_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
