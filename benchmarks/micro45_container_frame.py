"""Micro 45: container-frame bucket keys on the flagship scene.

The flagship's world grid (168, 44, 80) = 591k cells covers the yawing
box's SWEPT world AABB (scenes.py notes; micro12), while the fluid only
ever occupies the box interior — a body-frame extent of ~(160, <=30, 56)
cells. grid_frame='container' (ops/hashing.py::key_coords) bins particles
in the box's body frame, so the static grid shrinks to (162, 32, 58):

  S 3520 -> 1856, S_pad 4096 -> 2048, L 698k -> ~337k lanes (2.1x), grid
  programs 672 -> 324 (@T1024), and no clamp pile-up as yaw grows (the
  world grid starts clamping past yaw 0.16 rad ~ step 950).

Physics is exact either way (isometric keys; kernels filter on stored
world coordinates); trajectories differ at reassociation level, same
class as sorted_state (tests/test_pallas_sph.py::
test_container_frame_keys_match_world pins small-scene parity).

Rows (settled@600 state, ssync protocol, best-of-3 x 50-step scans):

  world_168_44_80       baseline
  cf_162_32_58          container frame, auto tile (T256: S_pad 2048 NYC 8)
  cf_162_32_58_t1024    container frame, T1024 (S_pad 2048, NYC 2)
  cf_162_32_58_t512     container frame, T512

plus a 1k-step trajectory at the winner: overflow_total must stay 0 and
the per-step BODY-frame extents are recorded (the occupancy-margin
evidence for adopting the trimmed dims).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro45_container_frame.py [speed|traj]
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
BODY_DIMS = (162, 32, 58)


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops import integrate as integrate_mod
    from water_sandbox_tpu.ops import step as step_mod

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    cfg, params, state0 = sim.cfg, sim.params, sim.state
    h = float(params.smoothing_radius)

    def cf(tile=0):
        return dataclasses.replace(cfg, grid_dims=BODY_DIMS,
                                   grid_frame="container",
                                   tile_override=tile)

    want = set(sys.argv[1:]) or {"speed", "traj"}
    results = {"n": cfg.n, "steps_per_scan": STEPS, "protocol": "ssync",
               "world_dims": list(cfg.grid_dims),
               "body_dims": list(BODY_DIMS)}

    if "speed" in want:
        done = 0
        while done < 600:
            sim.run(50)
            done += 50
        np.asarray(sim.state.pos)
        print("settled@600", flush=True)
        state = sim.state

        def timed(cfg_v, tag, reps=3):
            @jax.jit
            def run(s):
                return jax.lax.scan(
                    lambda c, _: (step_mod.step(c, params, cfg_v), None),
                    s, None, length=STEPS)[0]
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out.time)
            print(f"{tag}: compile+first {time.perf_counter() - t0:.0f}s",
                  flush=True)
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = run(state)
                np.asarray(out.time)
                walls.append((time.perf_counter() - t0) / STEPS * 1e3)
            ms = min(walls)
            ovf = float(np.asarray(out.overflow_total))
            print(f"{tag}: {ms:.2f} ms/step "
                  f"(all {['%.2f' % w for w in walls]}) overflow={ovf}",
                  flush=True)
            results[tag] = round(ms, 2)
            results[tag + "_overflow"] = ovf

        timed(cfg, "world_168_44_80")
        timed(cf(), "cf_162_32_58")
        timed(cf(1024), "cf_162_32_58_t1024")
        timed(cf(512), "cf_162_32_58_t512")

    if "traj" in want:
        # default to the measured winner (T1024: 33.19 vs 35.09 auto/T256,
        # speed rows above) when this invocation skipped the speed sweep
        cfg_c = cf(1024)
        results["traj_tile"] = 1024
        if "speed" in want:
            cands = [(results[k], k) for k in
                     ("cf_162_32_58", "cf_162_32_58_t1024",
                      "cf_162_32_58_t512") if k in results]
            best = min(cands)[1]
            tile = {"cf_162_32_58": 0, "cf_162_32_58_t1024": 1024,
                    "cf_162_32_58_t512": 512}[best]
            cfg_c = cf(tile)
            results["traj_tile"] = tile

        @jax.jit
        def run_chunk(s):
            def body(c, _):
                c2 = step_mod.step(c, params, cfg_c)
                center, ang = integrate_mod.container_at(
                    params.container, c2.time)
                bp = integrate_mod._rotate_yaw(c2.pos - center, ang,
                                               inverse=True)
                ext = (jnp.max(bp, axis=0) - jnp.min(bp, axis=0)) / h
                return c2, ext
            return jax.lax.scan(body, s, None, length=STEPS)

        s = state0
        exts = []
        t0 = time.perf_counter()
        for k in range(20):
            s, ext = run_chunk(s)
            exts.append(np.asarray(ext))
            if k == 0:
                print(f"traj: first chunk {time.perf_counter() - t0:.0f}s",
                      flush=True)
        exts = np.concatenate(exts)
        results["traj_steps"] = 1000
        results["traj_overflow_total"] = float(np.asarray(s.overflow_total))
        for a, nm in enumerate("xyz"):
            results[f"body_ext_{nm}_max"] = round(float(exts[:, a].max()), 2)
            results[f"body_ext_{nm}_final"] = round(float(exts[-1, a]), 2)
        ke = 0.5 * float(np.sum(np.asarray(s.vel) ** 2))
        results["traj_ke"] = round(ke, 1)
        pos = np.asarray(s.pos)
        results["traj_finite"] = bool(np.isfinite(pos).all())
        print(json.dumps({k: results[k] for k in results
                          if k.startswith(("traj", "body"))}), flush=True)

    with open("benchmarks/micro45_container_frame_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
