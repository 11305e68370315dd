"""Driver benchmark: ONE JSON line.

Primary metric per BASELINE.md: particle-steps/sec/chip at 256k particles
(the flagship moving-container scene — 4x the reference's particle count
plus a translating+yawing container the reference doesn't have).
vs_baseline divides by the reference's implied throughput (65,536
particles x 60 Hz = 3.93M particle-steps/s IF it holds 60 FPS —
BASELINE.md; the reference publishes no measured numbers).

Because that ceiling is derived from the reference's own 65,536-particle
scene, the line also carries the apples-to-apples head-to-head: the same
measurement on `reference-cube` itself (`reference_scene_*` fields) — the
workload the 60 FPS figure is actually about.

Honest measurement (VERDICT r1 item 4): timed windows run from a SETTLED
state, settled with the same compiled 50-step rollout program that is then
timed (the warmup compiles exactly the measured program); best of 3
windows (the axon tunnel adds multi-ms run-to-run jitter on identical
programs); the transient (fresh lattice) rate is reported alongside.

PINNED PROTOCOL (VERDICT r3 item 8 — round-over-round deltas must be
attributable to code, not protocol drift): settle = 600 steps, window =
50 steps, best of 3 windows, flagship scene `moving-container-256k` at
its registry config + reference-cube head-to-head. The JSON carries
`ms_per_step` and a full config fingerprint (n, grid_dims, cell_capacity,
sorted_state, resolved neighbor_mode, kernel gates, tile width, dt, k) so
any scene/kernel retune is visible in the artifact itself. Env overrides
(WST_BENCH_*) exist for experiments only — the driver runs the defaults.

r4 protocol fix (micro40): windows sync via a SCALAR-leaf device_get
(state.time) — it waits for program completion exactly like the old
np.asarray(pos) but ships 4 bytes instead of 3.2 MB over the remote
tunnel, which was inflating every window by a measured 1.8 ms/step
(43.14 -> 41.34 on the identical program, same session,
benchmarks/micro40_carry_context_results.json). The r3 numbers carry that
fetch tax; the fingerprint's `protocol` field records which sync a JSON
was measured under.
"""

import json
import os
import sys
import time

PROTOCOL = "settle600+best3x50+ssync"


def measure(scene, mode, chunk, settle):
    import numpy as np
    from water_sandbox_tpu.ops.step import rollout
    from water_sandbox_tpu.runtime.runner import Simulation

    sim = Simulation.from_scene(scene, neighbor_mode=mode)

    def sync():
        # scalar-leaf device_get: waits for program completion (the leaf is
        # an output buffer of the compiled rollout) without the 3.2 MB pos
        # fetch the tunnel charges ~1.8 ms/step for (micro40);
        # block_until_ready is unreliable here
        np.asarray(sim.state.time)

    # first chunk: compile + transient window
    sim.state = rollout(sim.state, sim.params, sim.cfg, chunk)
    sync()
    t0 = time.perf_counter()
    sim.state = rollout(sim.state, sim.params, sim.cfg, chunk)
    sync()
    transient = chunk * sim.cfg.n / (time.perf_counter() - t0)

    # settle with the same program (tunnel limits long single rollouts)
    done = 2 * chunk
    while done < settle:
        sim.state = rollout(sim.state, sim.params, sim.cfg, chunk)
        done += chunk
    sync()

    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        sim.state = rollout(sim.state, sim.params, sim.cfg, chunk)
        sync()
        walls.append(time.perf_counter() - t0)
    rate = chunk * sim.cfg.n / min(walls)
    return sim, rate, transient, done


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    scene = os.environ.get("WST_BENCH_SCENE", "moving-container-256k")
    chunk = int(os.environ.get("WST_BENCH_STEPS", "50"))
    settle = int(os.environ.get("WST_BENCH_SETTLE", "600"))
    mode = os.environ.get("WST_BENCH_MODE", "auto")
    baseline = 65536 * 60.0  # reference implied particle-steps/s

    sim, rate, transient, done = measure(scene, mode, chunk, settle)

    # roofline anchor (VERDICT r2 item 6): count TRUE interacting pairs in
    # the settled state (one chunked O(n^2) sweep, bench-time only) and
    # convert to useful pair-interaction FLOPs per step. ~61 f32 ops per
    # directed pair across the density (~16) and force (~45) passes, from
    # the kernel math in ops/pallas/sph_bucket.py. The denominator is the
    # v5e VPU f32 peak (~3.2e12 op/s; the SPH pair math is pure VPU — the
    # MXU is idle by design, bf16 matmuls detonate particle positions).
    @jax.jit
    def true_pairs(pos, h):
        n = pos.shape[0]
        c = 8192
        n_pad = -(-n // c) * c
        padded = jnp.pad(pos, ((0, n_pad - n), (0, 0)),
                         constant_values=1e15)
        chunks = padded.reshape(n_pad // c, c, -1)

        def body(tot, cpos):
            d2 = jnp.sum((cpos[:, None, :] - pos[None, :, :]) ** 2, -1)
            return tot + jnp.sum(d2 <= h * h), None

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), chunks)
        return tot

    pairs = float(true_pairs(sim.state.predicted,
                             sim.params.smoothing_radius))
    flops_per_s = pairs * 61.0 * rate / sim.cfg.n

    from water_sandbox_tpu.ops.pallas import sph_bucket as _sb

    def fingerprint(s):
        return {
            "scene": s.name, "n": s.cfg.n,
            "neighbor_mode": s.cfg.neighbor_mode,  # resolved by Simulation
            "grid_dims": list(s.cfg.grid_dims),
            "grid_frame": s.cfg.grid_frame,
            "cell_capacity": s.cfg.cell_capacity,
            "sorted_state": s.cfg.sorted_state,
            "density_gate": list(s.cfg.density_gate or _sb._DENSITY_GATE),
            "force_gate": list(s.cfg.force_gate or _sb._FORCE_GATE),
            # the ACTUAL lane-tile width (r5: honors cfg.tile_override —
            # the flagship pins 1024; BENCH_r05's first run mis-reported
            # the auto-pick 256 here)
            "tile": _sb._geometry(s.cfg).T,
            "build_scatter": s.cfg.build_scatter,
            "dt": float(s.params.dt),
            "pressure_scalar": float(s.params.pressure_scalar),
        }

    out = {
        "metric": (f"particle-steps/sec/chip ({scene}, n={sim.cfg.n}, "
                   f"settled@{done}; transient={transient:.3g})"),
        "value": round(rate, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(rate / baseline, 3),
        "ms_per_step": round(1e3 * sim.cfg.n / rate, 2),
        "protocol": PROTOCOL,
        "true_pairs_per_particle": round(pairs / sim.cfg.n, 1),
        "pair_gflops_per_s": round(flops_per_s / 1e9, 1),
        "vpu_mfu_est": round(flops_per_s / 3.2e12, 4),
        "config": fingerprint(sim),
    }

    # head-to-head on the reference's OWN scene (skip if it was primary)
    if scene != "reference-cube" and not os.environ.get("WST_BENCH_NO_REF"):
        sim_r, rate_r, _, _ = measure("reference-cube", mode, chunk, settle)
        out["reference_scene_ps_per_s"] = round(rate_r, 1)
        out["reference_scene_vs_baseline"] = round(rate_r / baseline, 3)
        out["reference_scene_fps_at_dt60"] = round(rate_r / 65536, 1)
        out["reference_scene_ms_per_step"] = round(1e3 * 65536 / rate_r, 2)
        out["reference_scene_config"] = fingerprint(sim_r)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
