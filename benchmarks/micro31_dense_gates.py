"""Micro 31: densification A/B on the settled flagship (round-4 VERDICT
item 1 levers, picked from micro30's waste decomposition):

* density ("slab", block<8): the density pass's candidate ROWS are its real
  op unit ((1,_T) row vs (8,_T) query block), gated at 8-row granularity —
  at settled occupancy ~1.6 that's ~5x row-op waste. block=2/4 gates finer.
* force "qsymw" / density "slabw": ONE (…,_T+2) load per (block, oy) with
  the 3 oz shifts sliced from registers (micro9's qrow3 trick) — 3x fewer
  candidate loads, bit-identical accumulation order.

Every variant's 50-step endpoint is checked against the baseline's: the
wide-load variants keep the narrow path's pair order, and the finer gate
blocks only drop padded rows that contribute exact zeros, so all variants
should be BIT-identical — the harness verifies and records it.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro31_dense_gates.py
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

STEPS = 50

CONFIGS = [
    ("base", ("slab", 8), ("qsym", 8)),
    ("slab2", ("slab", 2), ("qsym", 8)),
    ("slab4", ("slab", 4), ("qsym", 8)),
    ("qsymw", ("slab", 8), ("qsymw", 8)),
    ("slab2+qsymw", ("slab", 2), ("qsymw", 8)),
    ("slabw", ("slabw", 8), ("qsym", 8)),
    ("slabw2+qsymw", ("slabw", 2), ("qsymw", 8)),
]


def _one(name, state0, params, cfg, base_pos):
    import jax

    from water_sandbox_tpu.ops import step as step_mod

    def run_body(s):
        body = lambda c, _: (step_mod.step(c, params, cfg), None)
        return jax.lax.scan(body, s, None, length=STEPS)[0]

    run = jax.jit(run_body)
    t0 = time.perf_counter()
    end = run(state0)
    pos = np.asarray(end.pos)     # compile + hard sync
    compile_s = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        end = run(state0)
        pos = np.asarray(end.pos)
        walls.append((time.perf_counter() - t0) / STEPS * 1e3)
    ms = min(walls)
    row = {"ms_per_step": round(ms, 2),
           "ps_per_s": round(cfg.n / ms * 1e3),
           "compile_s": round(compile_s, 1),
           "overflow_total": float(np.asarray(end.overflow_total))}
    if base_pos is None:
        row["bit_identical_to_base"] = True
        row["max_pos_drift"] = 0.0
        base_pos = pos
    else:
        row["bit_identical_to_base"] = bool((pos == base_pos).all())
        row["max_pos_drift"] = float(np.abs(pos - base_pos).max())
    return row, base_pos


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    done = 0
    while done < 300:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled", flush=True)
    cfg, params, state0 = sim.cfg.resolved(), sim.params, sim.state

    out = {"n": cfg.n, "steps_per_scan": STEPS, "results": {}}
    base_pos = None
    d0, f0 = sb._DENSITY_GATE, sb._FORCE_GATE
    try:
        for name, dgate, fgate in CONFIGS:
            sb._DENSITY_GATE, sb._FORCE_GATE = dgate, fgate
            try:
                row, base_pos = _one(name, state0, params, cfg, base_pos)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                row = {"error": repr(e)[:300]}
            out["results"][name] = row
            print(name, json.dumps(row), flush=True)
    finally:
        sb._DENSITY_GATE, sb._FORCE_GATE = d0, f0

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "micro31_dense_gates_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
