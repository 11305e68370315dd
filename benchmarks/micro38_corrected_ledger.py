"""Micro 38: CORRECTED step decomposition after micro37's anchor audit.

micro37 found the old prefix ledger's flaw: micro23's build rows chain only
`planes[0, 0, 0]`, so XLA DCEs the scatters of planes 1-5 in every build
prefix (that's why scatter1 == scatter3 == scatter6 there — one plane was
ever materialized, not a "variadic scatter fast path"). The build was
under-counted by the 5 missing feature scatters and the difference got
mis-attributed to the kernels as an ~8 ms "per-launch floor" — while the
empty density kernel ALONE measures 0.92 ms/launch (micro37).

This rebuilds the ledger with non-DCE-able anchors:

  anchor_sum      build with EVERY plane consumed by a cheap streaming
                  jnp.sum (447 MB read ~0.6 ms at roofline) -> true build
  d_real_alone    the REAL density kernel alone on prebuilt planes
  f_real_alone    the REAL qsym force kernel alone (prebuilt planes+dens)
  df_real_alone   both real kernels chained (overlap check)
  bdf_real        build + density + force, no rescue cond, no gather
                  (additivity check vs anchor_sum + alone rows)
  step_norescue   full production step with rescue_capacity=0
  step_default    full production step (same session) -> cond-boundary cost

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro38_corrected_ledger.py
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
    from water_sandbox_tpu.core.params import KernelCoeffs
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
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    pv0 = sb._param_vector(params, coeffs)

    @jax.jit
    def prebuild(s):
        planes, counts, flat, _, srows, overflow = sb._build_core(
            s.predicted, s.vel, params, cfg)
        g = sb._geometry(cfg)
        gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
        own, m0 = sb.occupancy_bounds(counts, g)
        dens = sb._run_density(planes, own, m0, pv0, cfg, False)
        return planes, own, m0, dens

    planes_c, own_c, m0_c, dens_c = jax.block_until_ready(prebuild(state))
    np.asarray(own_c)

    def chain_pv(pv, x):
        return pv + jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30

    # The prebuilt planes must travel as jit ARGUMENTS, not closures: a
    # closed-over 447 MB array is baked into the HLO as a literal and the
    # remote-compile tunnel rejects the request body (HTTP 413).
    def alone(run_fns):
        def body(pv, **big):
            for fn in run_fns:
                out = fn(pv, **big)
                pv = chain_pv(pv, out[0, 0, 0])
            return pv
        return body

    def d_real(pv, planes=None, dens=None, own=None, m0=None):
        return sb._run_density(planes, own, m0, pv, cfg, False)

    def f_real(pv, planes=None, dens=None, own=None, m0=None):
        dim = cfg.dim
        return sb._run_force(planes[:2 * dim], dens, own, m0, pv,
                             cfg, False)

    def chain_state(s, *scalars):
        eps = sum(jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30
                  for x in scalars)
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def built(s):
        planes, counts, flat, _, srows, overflow = sb._build_core(
            s.predicted, s.vel, params, cfg)
        g = sb._geometry(cfg)
        gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
        own, m0 = sb.occupancy_bounds(counts, g)
        return planes, flat, srows, own, m0

    def anchor_sum(s):
        planes, flat, srows, own, m0 = built(s)
        # cheap streaming consume: full-plane sum cannot be DCE'd and
        # carries no strided-slice relayout tax (cf. micro37's anchor_build)
        consume = jnp.sum(planes) + jnp.sum(own) + jnp.sum(m0)
        return chain_state(s, consume, flat[0], srows[0, 0])

    def bdf_real(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv0, cfg, False)
        out_c = sb._run_force(planes[:2 * cfg.dim], dens, own, m0, pv0,
                              cfg, False)
        return chain_state(s, out_c[0, 0, 0], flat[0], srows[0, 0])

    from water_sandbox_tpu.ops import step as step_mod
    cfg_nr = dataclasses.replace(cfg, rescue_capacity=0)

    def step_fn(c):
        return lambda s: step_mod.step(s, params, c)

    def scan_time_state(body, init, reps=3):
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

    def scan_time_pv(body_fn, reps=3):
        @jax.jit
        def run(pv, planes, dens, own, m0):
            def body(c, _):
                return body_fn(c, planes=planes, dens=dens, own=own,
                               m0=m0), None
            return jax.lax.scan(body, pv, None, length=STEPS)[0]

        t0 = time.perf_counter()
        out = run(pv0, planes_c, dens_c, own_c, m0_c)
        np.asarray(out)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(pv0, planes_c, dens_c, own_c, m0_c)
            np.asarray(out)
            walls.append((time.perf_counter() - t0) / STEPS * 1e3)
        return min(walls), compile_s

    stages = [
        ("anchor_sum", lambda: scan_time_state(anchor_sum, state)),
        ("d_real_alone", lambda: scan_time_pv(alone([d_real]))),
        ("f_real_alone", lambda: scan_time_pv(alone([f_real]))),
        ("df_real_alone", lambda: scan_time_pv(alone([d_real, f_real]))),
        ("bdf_real", lambda: scan_time_state(bdf_real, state)),
        ("step_norescue", lambda: scan_time_state(step_fn(cfg_nr), state)),
        ("step_default", lambda: scan_time_state(step_fn(cfg), state)),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        stages = [st for st in stages if st[0] in want]

    results = {"n": cfg.n, "steps_per_scan": STEPS,
               "note": "in-scan; *_alone rows run the REAL kernel(s) on "
               "prebuilt constant planes, chained via the params vector; "
               "anchor_sum consumes every plane via streaming sums"}
    for name, fn in stages:
        ms, compile_s = fn()
        results[name] = round(ms, 2)
        print(f"{name:14s} {ms:7.2f} ms/it  (compile {compile_s:.0f}s)",
              flush=True)

    out_path = "benchmarks/micro38_corrected_ledger_results.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
