"""Micro 36: windowed single-scatter plane build vs the round-3 shape.

micro35's HLO inventory showed the round-3 build ("stack") pays 5-6
full-plane [:-1] slice copies (~1.4 ms by XLA's own estimates) plus six
jnp.stack DUS copies (~1.9 ms) purely to assemble the (6, cap, L) planes
from per-feature scatter buffers. The "windowed" shape scatters all six
features in ONE windowed scatter into a preallocated (6, cap*L) buffer
and drops the overflow sentinel via mode="drop" (no +1 element, no
slice, no stack). Outputs are bit-identical (asserted on CPU incl. a
forced-overflow case; asserted here in-scan on the TPU).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro36_build_scatter.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb
    from water_sandbox_tpu.ops.step import rollout

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    done = 0
    while done < 300:
        sim.run(50)
        done += 50
    np.asarray(sim.state.pos)
    print("settled", flush=True)
    state, params, cfg = sim.state, sim.params, sim.cfg

    def chain(s, *scalars):
        import dataclasses
        eps = sum(jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30
                  for x in scalars)
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def occ_probe(s, cfg_m):
        planes, counts, flat, _, srows, overflow = sb._build_core(
            s.predicted, s.vel, params, cfg_m)
        g = sb._geometry(cfg_m)
        own, m0 = sb.occupancy_bounds(counts, g)
        return chain(s, own[0, 0].astype(jnp.float32),
                     m0[0, 0].astype(jnp.float32), flat[0], srows[0, 0],
                     planes[0, 0, 0])

    def full(s, cfg_m):
        return rollout(s, params, cfg_m, 1)

    def scan_time(body, reps=3):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (body(c), None), s,
                                None, length=STEPS)[0]

        t0 = time.perf_counter()
        out = run(state)
        np.asarray(out.pos)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out.pos)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), compile_s, out

    results = {"n": cfg.n, "steps_per_scan": STEPS}
    pos = {}
    import dataclasses
    for mode in ("stack", "windowed"):
        cfg_m = dataclasses.replace(cfg, build_scatter=mode)
        for name, fn in (("occ", occ_probe), ("full", full)):
            ms, compile_s, out = scan_time(
                lambda s, fn=fn, cfg_m=cfg_m: fn(s, cfg_m))
            results[f"{name}_{mode}"] = round(ms, 2)
            print(f"{mode:9s} {name:5s} {ms:7.2f} ms/it "
                  f"(compile {compile_s:.0f}s)", flush=True)
            if name == "full":
                pos[mode] = np.asarray(out.pos)
                results[f"overflow_{mode}"] = float(
                    np.asarray(out.overflow_total))

    bits = pos["stack"].view(np.uint32) ^ pos["windowed"].view(np.uint32)
    results["bit_identical_50_steps"] = bool((bits == 0).all())
    with open("benchmarks/micro36_build_scatter_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
