"""Micro 24: Mosaic grid-step overhead floor at the flagship geometry.

micro23 (scan-amortized) isolated zero-work kernel floors of 7.7 ms
(density: grid (168,7), out block (6,48,512)) and 15.1 ms (force qsym) —
~6.5/12.8 us PER GRID STEP with every gated block off. This measures
whether the floor is (a) Mosaic per-grid-step machinery — in which case
FOLDING the chunk dimension into the kernel (one step per slab, 168 steps,
out block (6,48,S_pad)) should cut it ~7x — or (b) proportional to bytes
copied (out blocks), in which case folding buys nothing.

Kernels here write constant zeros (no inputs beyond a token), scanned 50x
with a data-dependent chain like production.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro24_grid_floor.py
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
STEPS = 50


def scan_time(body_fn, reps=3):
    @jax.jit
    def run(x):
        def it(c, _):
            out = body_fn(c)
            # live chain: fold one output element back into the carry
            return c + jnp.minimum(out.ravel()[0], 0.0) * 1e-30, None
        return jax.lax.scan(it, x, None, length=STEPS)[0]

    x = jnp.float32(1.0)
    out = run(x)
    np.asarray(out)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(out)
        walls.append((time.perf_counter() - t0) / STEPS * 1e3)
    return min(walls)


def k_zero(tok_ref, out_ref):
    out_ref[...] = jnp.zeros_like(out_ref) + tok_ref[0, 0]


def main():
    results = {"geometry": f"gx={GX} nyc={NYC} T={T} cap={CAP} F={F}",
               "steps_per_scan": STEPS}

    def rec(name, val):
        results[name] = round(val, 2)
        print(f"{name:28s} {val:7.2f} ms/it", flush=True)

    # (a) production-like: grid (GX, NYC), out block (F, CAP, T) at
    # block index (0, 0, i*NYC + yc)  [mirrors the density out_specs]
    def prod_call(tok):
        f = pl.pallas_call(
            k_zero,
            grid=(GX, NYC),
            in_specs=[pl.BlockSpec((1, 16), lambda i, yc: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((F, CAP, T),
                                   lambda i, yc: (0, 0, i * NYC + yc)),
            out_shape=jax.ShapeDtypeStruct((F, CAP, GX * S_PAD),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )
        return f(tok)

    tok = jnp.zeros((1, 16), jnp.float32)
    rec("grid1176_block_FxCAPxT", scan_time(lambda c: prod_call(tok + c)))

    # (b) slab-folded: grid (GX,), out block (F, CAP, S_PAD)
    def fold_call(tok):
        f = pl.pallas_call(
            k_zero,
            grid=(GX,),
            in_specs=[pl.BlockSpec((1, 16), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((F, CAP, S_PAD),
                                   lambda i: (0, 0, i)),
            out_shape=jax.ShapeDtypeStruct((F, CAP, GX * S_PAD),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )
        return f(tok)

    rec("grid168_block_FxCAPxSPAD", scan_time(lambda c: fold_call(tok + c)))

    # (c) like (a) but half the planes — is the floor ~bytes or ~steps?
    def prod3_call(tok):
        f = pl.pallas_call(
            k_zero,
            grid=(GX, NYC),
            in_specs=[pl.BlockSpec((1, 16), lambda i, yc: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((3, CAP, T),
                                   lambda i, yc: (0, 0, i * NYC + yc)),
            out_shape=jax.ShapeDtypeStruct((3, CAP, GX * S_PAD),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )
        return f(tok)

    rec("grid1176_block_3xCAPxT", scan_time(lambda c: prod3_call(tok + c)))

    with open("benchmarks/micro24_grid_floor_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
