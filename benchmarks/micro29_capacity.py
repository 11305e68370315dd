"""Micro 29: right-size the flagship cell_capacity.

The round-3 yawed-AABB grid fix (micro12) removed the out-of-grid clamping
pile-up that originally forced cell_capacity=48; the committed settled
occupancy stats now peak at own_max == 6 (step_breakdown_results.json).
Everything cap-proportional pays for the stale headroom every step: the
6 plane fills + scatter targets (cap_p x L), the counts reduction, both
kernels' output arrays (and the force gather's relayout copy), and the
qsym flush machinery. This runs the FULL 1k-step flagship trajectory
(fresh lattice -> transient slosh -> settled) at smaller capacities and
records the cumulative overflow: a capacity with overflow_total == 0 over
all 1000 steps produces a step-for-step identical trajectory (blocks above
every real occupancy only ever add distance-masked zeros), so the existing
golden stays valid.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro29_capacity.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import hashing, step as step_mod
    from water_sandbox_tpu.ops.step import rollout

    results = {}
    for cap in (8, 16):
        sim = wst.Simulation.from_scene("moving-container-256k",
                                        neighbor_mode="pallas",
                                        cell_capacity=cap)
        params, cfg = sim.params, sim.cfg
        dims = jnp.asarray(cfg.grid_dims, jnp.int32)
        ncells = int(np.prod(cfg.grid_dims))

        # EVERY-step peak per-cell occupancy (ADVICE r3: overflow_total == 0
        # only proves peak <= cap; the margin above the true peak was never
        # recorded). Counted on each step's post-step `predicted` — the keys
        # the NEXT step's build will bucket — via a plain scatter-add, so the
        # peak is trajectory-wide, not sampled at chunk boundaries.
        @functools.partial(jax.jit, donate_argnums=0)
        def chunk50(carry):
            def body(c, _):
                s, peak, dmax = c
                s = step_mod.step(s, params, cfg)
                origin = hashing.grid_origin(s.predicted,
                                             params.smoothing_radius)
                cell = jnp.floor((s.predicted - origin)
                                 / params.smoothing_radius).astype(jnp.int32)
                cell = jnp.clip(cell, 0, dims - 1)
                key = (cell[:, 0] * cfg.grid_dims[1]
                       + cell[:, 1]) * cfg.grid_dims[2] + cell[:, 2]
                cnt = jnp.zeros((ncells,), jnp.int32).at[key].add(
                    1, mode="promise_in_bounds")
                # per-step DROP count at this cap (particles the buckets
                # hand to the exact rescue) — its max over the trajectory
                # must stay under rescue_capacity for overflow_total == 0
                drops = jnp.maximum(cnt - cap, 0).sum()
                return (s, jnp.maximum(peak, cnt.max()),
                        jnp.maximum(dmax, drops)), None
            return jax.lax.scan(body, carry, None, length=50)[0]

        carry = (sim.state, jnp.zeros((), jnp.int32),
                 jnp.zeros((), jnp.int32))
        done = 0
        t0 = time.perf_counter()
        while done < 1000:
            carry = chunk50(carry)
            done += 50
        sim.state, peak, dmax = carry
        np.asarray(sim.state.pos)
        wall = time.perf_counter() - t0
        overflow = float(np.asarray(sim.state.overflow_total))
        peak = int(np.asarray(peak))
        dmax = int(np.asarray(dmax))

        # settled window, same compiled program
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            sim.state = rollout(sim.state, sim.params, sim.cfg, 50)
            np.asarray(sim.state.pos)
            walls.append(time.perf_counter() - t0)
        step_ms = min(walls) / 50 * 1e3
        st = sim.stats()
        results[f"cap{cap}"] = {
            "overflow_total_1k": overflow,
            "peak_cell_occupancy_1k": peak,
            "capacity_margin": cap - peak,
            "max_step_drops": dmax,
            "rescue_capacity": cfg.rescue_capacity,
            "settled_step_ms": round(step_ms, 2),
            "ps_per_s": round(sim.cfg.n / step_ms * 1e3, 0),
            "kinetic_energy": float(st["kinetic_energy"]),
            "max_speed": float(st["max_speed"]),
            "mean_density": float(st["mean_density"]),
            "wall_1k_s": round(wall, 1),
        }
        print(cap, json.dumps(results[f"cap{cap}"]), flush=True)

    results["note"] = ("wall_1k_s includes the per-step occupancy counting "
                       "scatter-add; settled_step_ms does not (plain rollout)")
    with open("benchmarks/micro29_capacity_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
