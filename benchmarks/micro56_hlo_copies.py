"""Micro 56: what does XLA INSERT when the force launch consumes fresh
planes? HLO copy inventory of the one-launch vs two-launch probe
programs (the micro53 pair), compiled for the real TPU.

Prints every copy/transpose/bitcast-convert op with its shape and
estimated bytes, diffing the two programs — if the second launch makes
XLA materialize an extra copy of the (6, cap_p, L) planes (or changes
the scatter's layout), it shows up here by name.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro56_hlo_copies.py
"""
from __future__ import annotations

import dataclasses
import json
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.core.params import KernelCoeffs
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    cfg, params = sim.cfg, sim.params
    state = sim.state
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    pv = sb._param_vector(params, coeffs)
    g = sb._geometry(cfg)
    dim = cfg.dim

    def chain(s, *scalars):
        eps = sum(jnp.minimum(x.astype(jnp.float32), 0.0) * 1e-30
                  for x in scalars)
        return dataclasses.replace(s, predicted=s.predicted + eps)

    def built(s):
        ids_f = jax.lax.bitcast_convert_type(s.ids, jnp.float32)[:, None]
        carry = jnp.concatenate([s.pos, ids_f], axis=1)
        planes, counts, flat, _, srows, _ = sb._build_core(
            s.predicted, s.vel, params, cfg, carry=carry, time=s.time)
        own, m0 = sb.occupancy_bounds(counts, g)
        return planes, flat, srows, own, m0

    def one_launch(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False,
                               gate=("grid0", 8))
        return chain(s, dens[0, 0, 0], flat[0], srows[0, 0])

    def two_launch(s):
        planes, flat, srows, own, m0 = built(s)
        dens = sb._run_density(planes, own, m0, pv, cfg, False,
                               gate=("grid0", 8))
        out_c = sb._run_force(planes[:2 * dim], dens, own, m0, pv, cfg,
                              False, gate=("qsym+grid0", 8))
        return chain(s, out_c[0, 0, 0], dens[0, 0, 0], flat[0],
                     srows[0, 0])

    def scan_of(body):
        def run(s):
            return jax.lax.scan(lambda c, _: (body(c), None), s,
                                None, length=50)[0]
        return run

    def copy_inventory(fn, tag):
        print(f"compiling {tag}...", flush=True)
        comp = jax.jit(fn).lower(state).compile()
        txt = comp.as_text()
        inv = {}
        for m in re.finditer(
                r"%?(copy[\w.-]*|transpose[\w.-]*)\s*=\s*"
                r"(f32|s32|u32|pred)\[([\d,]*)\]", txt):
            shape = m.group(3)
            elems = 1
            for d in (shape.split(",") if shape else []):
                if d:
                    elems *= int(d)
            mb = elems * 4 / 1e6
            if mb >= 1.0:
                key = f"{m.group(1).split('.')[0]} {m.group(2)}[{shape}]"
                inv[key] = inv.get(key, 0) + 1
        total = sum(inv.values())
        print(f"{tag}: {total} copy/transpose ops >= 1 MB", flush=True)
        for k in sorted(inv):
            print(f"  {inv[k]:2d} x {k}", flush=True)
        return inv

    inv1 = copy_inventory(scan_of(one_launch), "one_launch")
    inv2 = copy_inventory(scan_of(two_launch), "two_launch")
    diff = {k: inv2.get(k, 0) - inv1.get(k, 0)
            for k in set(inv1) | set(inv2)
            if inv2.get(k, 0) != inv1.get(k, 0)}
    print("DIFF (two_launch - one_launch):", flush=True)
    for k, v in sorted(diff.items()):
        print(f"  {v:+2d} x {k}", flush=True)

    with open("benchmarks/micro56_hlo_copies_results.json", "w") as f:
        json.dump({"one_launch": inv1, "two_launch": inv2, "diff": diff},
                  f, indent=1)


if __name__ == "__main__":
    main()
