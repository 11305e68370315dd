"""Pallas fused SPH kernels vs the XLA bucket pipeline (interpret mode on
CPU; the same code compiles via Mosaic on TPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from water_sandbox_tpu.core.params import KernelCoeffs, SimConfig, SimParams
from water_sandbox_tpu.ops import grid as grid_mod
from water_sandbox_tpu.ops.pallas import sph_bucket


def make_inputs(dim, seed=0, n=96, spread=1.6):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pred = (jax.random.uniform(k1, (n, dim)) - 0.5) * spread
    vel = jax.random.normal(k2, (n, dim)).astype(jnp.float32)
    return pred.astype(jnp.float32), vel


@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_matches_xla_bucket(dim):
    pred, vel = make_inputs(dim)
    n = pred.shape[0]
    params = SimParams.create(dim=dim)
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, dim)
    cfg = SimConfig(n=n, dim=dim, neighbor_mode="pallas",
                    grid_dims=(8,) * dim, cell_capacity=8)

    ref = grid_mod.bucket_sph(pred, vel, params, coeffs, cfg)
    out = sph_bucket.bucket_sph(pred, vel, params, coeffs, cfg,
                                interpret=True)

    names = ["den", "nden", "prs", "nprs", "acc"]
    for name, a, b in zip(names, out[:5], ref[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_pallas_geometry_alignment():
    cfg = SimConfig(n=64, dim=3, neighbor_mode="pallas",
                    grid_dims=(16, 12, 10), cell_capacity=8)
    g = sph_bucket._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    assert S == 120 and S_pad % g.T == 0 and S_pad >= S
    assert NYC == S_pad // g.T
    # PAD must be a multiple of the lane-chunk width (output BlockSpec
    # tiling) and leave room for the edge slabs' full halo windows
    assert PAD % g.T == 0
    assert PAD >= S_pad + g.M
    assert L == PAD + gx * S_pad + PAD
    # _geometry is pure: a tile_override config traced "interleaved" with
    # the default one changes nothing about the default's geometry
    import dataclasses
    g512 = sph_bucket._geometry(
        dataclasses.replace(cfg, tile_override=512))
    assert g512.T == 512 and g512.M == 256
    assert sph_bucket._geometry(cfg) == g


def test_pallas_rejects_oversized_z():
    # gz must fit inside the window lane margin; the margin follows the
    # auto-picked tile width (512 lanes for wide scenes), so only z-dims
    # past that are rejected — gz=600 > 511 even at the widest tile
    cfg = SimConfig(n=64, dim=3, neighbor_mode="pallas",
                    grid_dims=(16, 12, 600), cell_capacity=8)
    with pytest.raises(ValueError, match="z-dim"):
        sph_bucket._geometry(cfg)


_slow_gate = pytest.mark.skipif(
    not os.environ.get("WST_SLOW"),
    reason="archaeology gate variant (not used in production); WST_SLOW=1")


@pytest.mark.parametrize("gate", [
    # production gates run in the default suite: ("slab", 8) is the density
    # gate, ("qsym", 8) the single-chip force gate, ("qrow3", 8) the
    # domain-decomposed force gate, ("qrow", 8) the un-trimmed qrow body
    # the trimmed variants derive from
    ("slab", 8), ("qrow", 8), ("qrow3", 8), ("qsym", 8),
    # round-4 densification candidates (micro31): wide shared-oz loads —
    # bit-identical accumulation order to their narrow parents
    ("qsymw", 8), ("slabw", 8), ("slabw", 2),
    # measured-and-rejected sweep variants (micro6): physics-identical by
    # construction, pinned only under WST_SLOW to keep the default suite
    # fast (each costs 2-4 min in interpret mode)
    pytest.param(("slab", 1), marks=_slow_gate),
    pytest.param(("slab", 2), marks=_slow_gate),
    pytest.param(("slab", 4), marks=_slow_gate),
    pytest.param(("off", 4), marks=_slow_gate),
    pytest.param(("off", 8), marks=_slow_gate),
])
def test_gate_variants_match_xla_bucket(gate):
    """Every candidate-gating variant the micro6 sweep times must be
    physics-identical — whichever wins on the TPU can be adopted without a
    correctness question."""
    import functools

    from water_sandbox_tpu.core.params import DENSITY_PADDING

    dim = 3
    pred, vel = make_inputs(dim, seed=3)
    n = pred.shape[0]
    params = SimParams.create(dim=dim)
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, dim)
    cfg = SimConfig(n=n, dim=dim, neighbor_mode="pallas",
                    grid_dims=(8,) * dim, cell_capacity=8)
    ref = grid_mod.bucket_sph(pred, vel, params, coeffs, cfg)

    planes, counts, addr, overflow = sph_bucket._build_slab_buckets(
        pred, vel, params, cfg)
    g = sph_bucket._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    own, m0 = sph_bucket.occupancy_bounds(counts, g)
    pv = sph_bucket._param_vector(params, coeffs)
    assert int(overflow) == 0

    dens = sph_bucket._run_density(planes, own, m0, pv, cfg,
                                   interpret=True, gate=gate)
    out_c = sph_bucket._run_force(planes, dens, own, m0, pv, cfg,
                                  interpret=True, gate=gate)
    dropped = addr == sph_bucket._cap_pad(cfg.cell_capacity) * L
    den, nden, acc = sph_bucket.gather_results(out_c, addr, dropped, params)

    np.testing.assert_allclose(np.asarray(den), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-4, err_msg="den")
    np.testing.assert_allclose(np.asarray(nden), np.asarray(ref[1]),
                               rtol=2e-4, atol=2e-4, err_msg="nden")
    np.testing.assert_allclose(np.asarray(acc), np.asarray(ref[4]),
                               rtol=2e-4, atol=2e-4, err_msg="acc")


def test_container_frame_keys_match_world(tmp_path):
    """grid_frame='container' changes the bucket-key frame only: with a
    yawed/translated box pose the pair set is identical (isometric keys +
    world-coordinate distance filter), so results match the world-frame
    pipeline to reassociation tolerance — and overflow accounting stays
    clean on a grid sized to the BODY frame, which the world grid would
    need a swept AABB to cover (ops/hashing.py::key_coords; adopted by the
    flagship scene after benchmarks/micro45)."""
    import dataclasses

    from water_sandbox_tpu.core.params import Container

    dim = 3
    pred, vel = make_inputs(dim, seed=7)
    n = pred.shape[0]
    params = SimParams.create(
        dim=dim,
        container=Container.create(
            center=(0.3, -0.1, 0.2), size=(2.4, 2.4, 2.4),
            velocity=(0.5, 0.0, 0.0), angular_velocity=0.4, angle=0.3))
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, dim)
    cfg_w = SimConfig(n=n, dim=dim, neighbor_mode="pallas",
                      grid_dims=(12,) * dim, cell_capacity=8)
    cfg_c = dataclasses.replace(cfg_w, grid_frame="container")
    t = jnp.asarray(1.7, jnp.float32)

    ref = sph_bucket.bucket_sph(pred, vel, params, coeffs, cfg_w,
                                interpret=True, time=t)
    out = sph_bucket.bucket_sph(pred, vel, params, coeffs, cfg_c,
                                interpret=True, time=t)
    assert int(ref[5]) == 0 and int(out[5]) == 0
    for name, a, b in zip(["den", "nden", "prs", "nprs", "acc"],
                          out[:5], ref[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)

    # grid_frame='container' must be refused where it cannot work
    with pytest.raises(ValueError, match="incremental"):
        dataclasses.replace(cfg_c, incremental_rebuild=4)
    with pytest.raises(ValueError, match="time"):
        sph_bucket.bucket_sph(pred, vel, params, coeffs, cfg_c,
                              interpret=True)


def test_container_frame_step_rollout():
    """Step-level coverage for grid_frame='container': the sorted-state
    pallas step threads state.time into the bucket build (ops/step.py),
    and a 3-step rollout with a translating+yawing box must stay finite,
    bounded and overflow-free on a BODY-frame-sized grid."""
    import dataclasses

    from water_sandbox_tpu.core.params import Container
    from water_sandbox_tpu.core.state import init_state
    from water_sandbox_tpu.models.scenes import cube_fluid
    from water_sandbox_tpu.ops.step import step

    pts = cube_fluid(6, 6, 6, particle_radius=0.1)
    n = pts.shape[0]
    container = Container.create(
        center=(0.0, 0.0, 0.0), size=(3.0, 3.0, 3.0),
        velocity=(0.2, 0.0, 0.0), angular_velocity=0.3)
    params = SimParams.create(dim=3, container=container)
    cfg = SimConfig(n=n, dim=3, neighbor_mode="pallas",
                    grid_dims=(14, 14, 14), cell_capacity=8,
                    grid_frame="container", sorted_state=True)
    state = init_state(pts)
    for _ in range(3):
        state = step(state, params, cfg)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    # inside the box posed at the final time (local-frame bound + slack)
    from water_sandbox_tpu.ops import integrate as integrate_mod
    center, angle = integrate_mod.container_at(container, state.time)
    local = np.asarray(integrate_mod._rotate_yaw(
        jnp.asarray(pos) - center, angle, inverse=True))
    assert (np.abs(local) <= 1.6).all()
    assert float(np.asarray(state.overflow_total)) == 0.0


def test_build_scatter_modes_bit_identical():
    """Every cfg.build_scatter mode must produce bit-identical planes,
    addresses and overflow — including duplicate overflow sentinels
    (cell_capacity 4 forces drops). The mode choice is purely a
    performance decision (stack vs cellmajor flipped between the r4
    world-frame and r5 container-frame layouts — micro41/54), so
    flipping the default must never touch goldens."""
    import dataclasses

    pred, vel = make_inputs(3, seed=11, n=500)
    params = SimParams.create(dim=3)
    base = SimConfig(n=500, dim=3, neighbor_mode="pallas",
                     grid_dims=(8, 8, 8), cell_capacity=4)
    ref = None
    for mode in ("stack", "cellmajor", "windowed", "fused",
                 "stack_barrier"):
        cfg = dataclasses.replace(base, build_scatter=mode)
        planes, counts, addr, ovf = sph_bucket._build_slab_buckets(
            pred, vel, params, cfg)
        got = (np.asarray(planes), np.asarray(counts), np.asarray(addr),
               int(ovf))
        if ref is None:
            ref = got
            assert got[3] > 0, "test must exercise overflow sentinels"
        else:
            for a, b in zip(got[:3], ref[:3]):
                assert (a == b).all(), mode
            assert got[3] == ref[3], mode
