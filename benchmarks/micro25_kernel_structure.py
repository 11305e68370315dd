"""Micro 25: which structural feature of the density kernel costs ~6 us per
grid step even when every gated region is skipped?

micro23: density at ZERO occupancy bounds = 7.7 ms (grid 168x7).
micro24: a zero-body kernel at the same grid + out block = 1.45 ms.
The ~6.3 ms gap is structural. Candidates, added one at a time to the
micro24 baseline: scalar-prefetch grid spec, ANY-space HBM operand,
VMEM scratch + DMA semaphores, empty @pl.when(own > 0) region, and the
full combination.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro25_kernel_structure.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GX, NYC, T, CAP, F = 168, 7, 512, 48, 6
S_PAD = NYC * T
CLW = T + 2 * (T // 2)
NB = CAP // 8
L = GX * S_PAD
STEPS = 50


def scan_time(body_fn, reps=3):
    @jax.jit
    def run(x):
        def it(c, _):
            out = body_fn(c)
            return c + jnp.minimum(out.ravel()[0], 0.0) * 1e-30, None
        return jax.lax.scan(it, x, None, length=STEPS)[0]

    x = jnp.float32(1.0)
    np.asarray(run(x))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(out)
        walls.append((time.perf_counter() - t0) / STEPS * 1e3)
    return min(walls)


def main():
    own = jnp.zeros((GX, NYC), jnp.int32)
    m0 = jnp.zeros((GX + 2, NYC), jnp.int32)
    params = jnp.zeros((1, 16), jnp.float32)
    planes = jnp.zeros((F, CAP, L), jnp.float32)

    results = {"geometry": f"gx={GX} nyc={NYC} T={T} cap={CAP}",
               "steps_per_scan": STEPS}

    def rec(name, val):
        results[name] = round(val, 2)
        print(f"{name:24s} {val:7.2f} ms/it", flush=True)

    out_shape = jax.ShapeDtypeStruct((F, CAP, L), jnp.float32)
    out_spec = pl.BlockSpec((F, CAP, T), lambda i, yc, *_: (0, 0,
                                                            i * NYC + yc))

    # -- a: scalar-prefetch spec (own, m0 prefetched; params SMEM; planes
    #       ANY), body only touches the scalars --------------------------
    def k_a(own_ref, m0_ref, params_ref, feats_ref, out_ref):
        i = pl.program_id(0)
        yc = pl.program_id(1)
        occ = own_ref[i, yc] + m0_ref[i, yc]
        out_ref[0, :1, :] = jnp.full((1, T), occ.astype(jnp.float32)
                                     + params_ref[0, 0])

    def call_a(c):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(GX, NYC),
            in_specs=[pl.BlockSpec((1, 16), lambda i, yc, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
        )
        return pl.pallas_call(
            k_a, grid_spec=gs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
        )(own, m0, params + c, planes)

    rec("a_prefetch_any", scan_time(call_a))

    # -- b: + VMEM scratch + DMA semaphores (unused) ---------------------
    def k_b(own_ref, m0_ref, params_ref, feats_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        yc = pl.program_id(1)
        occ = own_ref[i, yc] + m0_ref[i, yc]
        out_ref[0, :1, :] = jnp.full((1, T), occ.astype(jnp.float32)
                                     + params_ref[0, 0])

    def call_b(c):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(GX, NYC),
            in_specs=[pl.BlockSpec((1, 16), lambda i, yc, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((F, CAP, 3 * CLW), jnp.float32),
                            pltpu.SemaphoreType.DMA((3, NB, 2))],
        )
        return pl.pallas_call(
            k_b, grid_spec=gs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
        )(own, m0, params + c, planes)

    rec("b_plus_scratch_sems", scan_time(call_b))

    # -- c: + empty when(occ > 0) region (never taken: own == 0) ---------
    def k_c(own_ref, m0_ref, params_ref, feats_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        yc = pl.program_id(1)
        occ = own_ref[i, yc]

        @pl.when(occ > 0)
        def _run():
            out_ref[0, :1, :] = jnp.full((1, T), params_ref[0, 0])

        out_ref[0, 1:2, :] = jnp.full((1, T), occ.astype(jnp.float32))

    def call_c(c):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(GX, NYC),
            in_specs=[pl.BlockSpec((1, 16), lambda i, yc, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((F, CAP, 3 * CLW), jnp.float32),
                            pltpu.SemaphoreType.DMA((3, NB, 2))],
        )
        return pl.pallas_call(
            k_c, grid_spec=gs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
        )(own, m0, params + c, planes)

    rec("c_plus_empty_when", scan_time(call_c))

    # -- d: the real density kernel, zero bounds (reference point) -------
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb
    from water_sandbox_tpu.models import scenes

    cfg, prm, state = scenes.build("moving-container-256k",
                                   neighbor_mode="pallas")
    gx, gy, gz, S, S_pad, NYC2, PAD, L2 = sb._geometry(cfg)[:8]
    from water_sandbox_tpu.core.params import KernelCoeffs
    coeffs = KernelCoeffs.from_radius(prm.smoothing_radius, cfg.dim)
    pv = sb._param_vector(prm, coeffs)
    planes2 = jnp.zeros((6, sb._cap_pad(cfg.cell_capacity), L2), jnp.float32)
    own2 = jnp.zeros((gx, NYC2), jnp.int32)
    m02 = jnp.zeros((gx + 2, NYC2), jnp.int32)

    def call_d(c):
        # min(c, 0) is 0.0 at runtime (c stays ~1.0) but keeps the body
        # loop-variant so XLA cannot hoist it out of the scan
        return sb._run_density(planes2 + jnp.minimum(c, 0.0), own2, m02,
                               pv, cfg, False)

    rec("d_real_density_zero_occ", scan_time(call_d))

    with open("benchmarks/micro25_kernel_structure_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
