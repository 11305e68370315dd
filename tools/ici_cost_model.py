"""Static ICI communication-cost model for the domain-decomposed step.

Real-slice weak scaling is hardware-blocked (one v5e chip behind a tunnel;
benchmarks/weak_scaling_results.json is a CPU-mesh FUNCTIONAL smoke, not an
ICI measurement — VERDICT r2 weak #5). What CAN be computed today, exactly,
is the bytes each device ppermutes per step in the Pallas domain path
(parallel/domain.py::_sph_local_pallas + _migrate):

  1. feature-plane halo slabs:  (2*dim, cap_p, S_pad) f32, each direction
  2. density-plane halo slabs:  (6, cap_p, S_pad) f32, each direction
  3. migration send buffers:    mig_cap rows x (3*dim + 1) f32, each dir
  4. rescue exchange (only on overflow steps): R x (2*dim + 2) f32, both
     directions — a transient, excluded from the steady-state model.

Each direction rides one ICI link, both directions concurrently (1-D mesh
along the grid's long axis — SURVEY.md §5). The model divides by a nominal
per-link ICI bandwidth for v5e (45 GB/s per link per direction, the
figure public v5e system descriptions give for the 2-D torus links) and
compares against the measured single-chip settled step time to bound the
communication fraction. Collectives overlap poorly with the Pallas kernels
today (no async dispatch in the step), so the model reports the
non-overlapped (worst-case) fraction.

    python tools/ici_cost_model.py  [--out benchmarks/ici_cost_model.json]
"""
from __future__ import annotations

import argparse
import json


NOMINAL_ICI_GBPS = 45.0        # GB/s per link per direction (v5e, nominal)


def model(scene: str, ndev: int, step_ms_1chip: float,
          mig_cap: int = 2048) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from water_sandbox_tpu.models import scenes
    from water_sandbox_tpu.ops.pallas import sph_bucket as sb

    cfg, params, _ = scenes.build(scene, neighbor_mode="pallas")
    gx = cfg.grid_dims[0]
    gx_loc = gx // ndev
    cfg_loc = dataclasses.replace(cfg, grid_dims=(gx_loc,)
                                  + cfg.grid_dims[1:])
    _, _, gz, S, S_pad, NYC, PAD, L = sb._geometry(cfg_loc)[:8]
    cap_p = sb._cap_pad(cfg.cell_capacity)
    dim = cfg.dim

    feat_bytes = 2 * dim * cap_p * S_pad * 4          # per direction
    dens_bytes = 6 * cap_p * S_pad * 4                # per direction
    mig_bytes = mig_cap * (3 * dim + 1) * 4           # per direction
    per_dir = feat_bytes + dens_bytes + mig_bytes     # one link's load

    t_comm_ms = per_dir / (NOMINAL_ICI_GBPS * 1e9) * 1e3
    # per-device compute shrinks ~1/ndev (the slab kernels are linear in
    # local slab count); the exchange load is constant per device
    t_comp_ms = step_ms_1chip / ndev
    return {
        "scene": scene,
        "devices": ndev,
        "grid_dims": list(cfg.grid_dims),
        "slab_bytes_per_direction": {
            "feature_planes": feat_bytes,
            "density_planes": dens_bytes,
            "migration": mig_bytes,
            "total": per_dir,
        },
        "nominal_ici_GBps_per_link_per_dir": NOMINAL_ICI_GBPS,
        "t_comm_ms_per_step": round(t_comm_ms, 4),
        "t_compute_ms_per_step_est": round(t_comp_ms, 2),
        "comm_fraction_nonoverlapped": round(
            t_comm_ms / (t_comm_ms + t_comp_ms), 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured 1-chip settled step ms (default: read "
                    "benchmarks/step_breakdown_results.json full_step)")
    ap.add_argument("--out", default="benchmarks/ici_cost_model.json")
    args = ap.parse_args()

    step_ms = args.step_ms
    if step_ms is None:
        with open("benchmarks/step_breakdown_results.json") as f:
            step_ms = json.load(f)["full_step"]

    rows = [model("sharded-1m", nd, step_ms * 1015920 / 266112)
            for nd in (2, 4, 8)]
    rows += [model("moving-container-256k", nd, step_ms)
             for nd in (2, 4)]
    out = {
        "note": ("static model — bytes are exact from the code's buffer "
                 "shapes; bandwidth is nominal; compute scaling assumes "
                 "linear slab partitioning. weak_scaling_results.json is "
                 "a CPU-mesh functional smoke, not an ICI measurement."),
        "measured_1chip_step_ms_256k": step_ms,
        "rows": rows,
    }
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
