"""Micro 35: inventory of XLA-inserted COPIES in the compiled production step.

micro32/34 left the kernels' zero-work floor unexplained: ~7.5-8 ms per
pass that survives empty bodies (grid0), output-pipeline parking
(out_any), window-DMA suppression (dma0), and a 4x grid-step reduction
(T4096) — i.e. per-launch, footprint-proportional (reference-cube's floors
are far smaller), but not any movement we control from inside the kernel.

The one mover we have never inventoried is XLA itself: micro26 already
caught one hidden 586 MB relayout copy on the result-gather input. If the
scheduler also copies the 268 MB `planes` / 268 MB `dens` operands into
(or out of) the pallas custom-calls each scan iteration — e.g. for layout
or aliasing reasons — that alone is the floor. This dumps the optimized
HLO of the exact production rollout program and lists every copy/transpose
fusion >= 8 MB with its shape, so the floor stops being a guess.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro35_hlo_copies.py
"""
from __future__ import annotations

import json
import re

import jax


def nbytes(shape: str) -> int:
    m = re.match(r"(f32|s32|u32|bf16|u16|s16|f16|pred|s8|u8)\[([0-9,]*)\]",
                 shape)
    if not m:
        return 0
    dt, dims = m.groups()
    size = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "u16": 2, "s16": 2,
            "f16": 2, "pred": 1, "s8": 1, "u8": 1}[dt]
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * size


def main():
    import water_sandbox_tpu as wst
    from water_sandbox_tpu.ops.step import rollout

    sim = wst.Simulation.from_scene("moving-container-256k",
                                    neighbor_mode="pallas")
    fn = jax.jit(lambda s, p: rollout(s, p, sim.cfg, 50))
    print("lowering + compiling the production 50-step rollout...",
          flush=True)
    compiled = fn.lower(sim.state, sim.params).compile()
    text = compiled.as_text()
    print(f"HLO text: {len(text)/1e6:.1f} MB", flush=True)

    rows = []
    for line in text.splitlines():
        ls = line.strip()
        m = re.match(r"(%?[\w.-]+) = (\S+) (copy|transpose|bitcast)\(",
                     ls)
        if not m:
            # copies often live inside fusions; catch the fusion root kind
            if " fusion(" in ls and "kind=kLoop" in ls:
                continue
            continue
        name, shape, kind = m.groups()
        b = nbytes(shape)
        if b >= 8 * 2**20:
            rows.append({"name": name, "kind": kind, "shape": shape,
                         "mbytes": round(b / 2**20, 1)})
    # also: any instruction annotated with a layout change on a big shape
    big_ops = {}
    for m in re.finditer(r"= (f32\[[0-9,]+\]\{[0-9,]+\}) (\w+)", text):
        shape, op = m.groups()
        b = nbytes(shape)
        if b >= 64 * 2**20:
            key = f"{op} {shape}"
            big_ops[key] = big_ops.get(key, 0) + 1

    out = {"copies_ge_8mb": rows,
           "big_ops_ge_64mb_counts": big_ops}
    print(json.dumps(out, indent=1))
    with open("benchmarks/micro35_hlo_copies_results.json", "w") as f:
        json.dump(out, f, indent=1)
    # keep the HLO around for manual digging (not committed)
    with open("/tmp/step50_hlo.txt", "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
