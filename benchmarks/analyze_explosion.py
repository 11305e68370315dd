"""Analyze the saved last-good state: run one step / field computation on
the current backend and dump results for cross-backend comparison.

    python benchmarks/analyze_explosion.py --out /tmp/fields_tpu.npz
    WST_FORCE_CPU=1 python benchmarks/analyze_explosion.py \
        --mode bucket_grid --out /tmp/fields_cpu.npz
    python benchmarks/analyze_explosion.py --compare \
        /tmp/fields_tpu.npz /tmp/fields_cpu.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", default="/tmp/wst_lastgood.npz")
    ap.add_argument("--scene", default="moving-container-256k")
    ap.add_argument("--mode", default="pallas")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/fields.npz")
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()

    if args.compare:
        a = np.load(args.compare[0])
        b = np.load(args.compare[1])
        for k in a.files:
            if k not in b.files:
                continue
            x, y = a[k], b[k]
            if x.shape != y.shape:
                print(f"{k}: shape {x.shape} vs {y.shape}")
                continue
            d = np.abs(x - y)
            i = np.unravel_index(np.argmax(d), d.shape)
            print(f"{k}: max_abs={d.max():.5g} at {i} "
                  f"(a={x[i]:.6g} b={y[i]:.6g}) mean_abs={d.mean():.4g}")
        return

    if os.environ.get("WST_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from water_sandbox_tpu.core.params import KernelCoeffs
    from water_sandbox_tpu.core.state import FluidState
    from water_sandbox_tpu.models import scenes
    from water_sandbox_tpu.ops import step as step_mod
    from water_sandbox_tpu.ops import grid as grid_mod

    cfg, params, _ = scenes.build(args.scene, neighbor_mode=args.mode)
    d = np.load(args.state)
    state = FluidState(**{k: jnp.asarray(d[k]) for k in
                          ("pos", "vel", "predicted", "acc", "density",
                           "near_density", "pressure", "near_pressure",
                           "step_count", "time", "overflow",
                           "overflow_total")},
                       ids=(jnp.asarray(d["ids"]) if "ids" in d else
                            jnp.arange(d["pos"].shape[0], dtype=jnp.int32)))
    print(f"backend={jax.default_backend()} mode={args.mode} "
          f"step={int(d['step_count'])}", flush=True)

    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    if args.mode == "pallas":
        from water_sandbox_tpu.ops.pallas import sph_bucket
        den, nden, prs, nprs, acc, ovf = sph_bucket.bucket_sph(
            state.predicted, state.vel, params, coeffs, cfg)
    else:
        den, nden, prs, nprs, acc, ovf = grid_mod.bucket_sph(
            state.predicted, state.vel, params, coeffs, cfg)
    den, acc = np.asarray(den), np.asarray(acc)
    print(f"one-field: ovf={int(ovf)} den[min,max]=({den.min():.4g},"
          f"{den.max():.4g}) acc_absmax={np.abs(acc).max():.5g}", flush=True)

    # short evolution to see whether THIS backend/mode blows up
    s = state
    for i in range(args.steps):
        s = step_mod.step(s, params, cfg)
        vel = np.asarray(s.vel)
        ke = float(0.5 * (vel ** 2).sum())
        print(f"  +{i+1}: ke={ke:.5g} max|v|={np.abs(vel).max():.5g} "
              f"ovf={int(np.asarray(s.overflow))}", flush=True)
        if not np.isfinite(ke) or ke > 1e10:
            break

    np.savez(args.out, den=den, nden=np.asarray(nden), acc=acc,
             pos1=np.asarray(s.pos), vel1=np.asarray(s.vel))
    print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
