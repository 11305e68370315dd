"""Overflow-rescue exactness: a scene forced to overflow its cell buckets
must still match the dense O(N²) oracle everywhere (VERDICT r1 item 3 —
'complete physics can't drop particles')."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from water_sandbox_tpu.core.params import KernelCoeffs, SimConfig, SimParams
from water_sandbox_tpu.models.scenes import cube_fluid
from water_sandbox_tpu.ops import dense, grid, step as step_mod
from water_sandbox_tpu.core.state import init_state


@pytest.fixture(scope="module")
def crowded():
    """A 2-D blob whose cells hold far more than the tiny test capacity."""
    pts = cube_fluid(24, 18, None, particle_radius=0.04)
    params = SimParams.create(dim=2, container=jnp.asarray)  # placeholder
    params = SimParams.create(dim=2)
    state = init_state(pts)
    # a couple of dense steps to get irregular positions + velocities
    cfg_d = SimConfig(n=pts.shape[0], dim=2, neighbor_mode="dense")
    state = step_mod.rollout(state, params, cfg_d, 5)
    return state, params


def _fields(state, params, cfg):
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    return grid.bucket_sph(state.predicted, state.vel, params, coeffs, cfg)


def _dense_fields(state, params, cfg):
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    den, nden, prs, nprs = dense.density_pass(state.predicted, params, coeffs)
    acc = dense.force_pass(state.predicted, state.vel, den, nden, prs, nprs,
                           params, coeffs)
    return den, nden, prs, nprs, acc


def test_rescue_matches_dense_oracle(crowded):
    state, params = crowded
    n = state.n
    cfg = SimConfig(n=n, dim=2, neighbor_mode="bucket_grid",
                    grid_dims=(40, 40), cell_capacity=4,
                    rescue_capacity=512, chunk=128)
    den, nden, prs, nprs, acc, unrescued = _fields(state, params, cfg)

    # capacity 4 must actually overflow this blob, and rescue must cover it
    cfg_plain = dataclasses.replace(cfg, rescue_capacity=0)
    *_, raw_overflow = _fields(state, params, cfg_plain)
    assert int(raw_overflow) > 0, "test scene must force overflow"
    assert int(unrescued) == 0

    dden, dnden, dprs, dnprs, dacc = _dense_fields(state, params, cfg)
    np.testing.assert_allclose(den, dden, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(nden, dnden, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(acc, dacc, rtol=2e-4, atol=2e-3)


def test_rescue_budget_exceeded_is_counted(crowded):
    """Beyond-budget overflow must stay counted AND harmless: pairs touching
    unrescued particles are excluded from the sweep (their fill densities
    would otherwise amplify forces ~1e5x — the round-2 detonation bug)."""
    state, params = crowded
    cfg = SimConfig(n=state.n, dim=2, neighbor_mode="bucket_grid",
                    grid_dims=(40, 40), cell_capacity=2,
                    rescue_capacity=8, chunk=128)
    den, nden, prs, nprs, acc, unrescued = _fields(state, params, cfg)
    assert int(unrescued) > 0          # budget deliberately too small
    assert np.isfinite(np.asarray(den)).all()
    assert np.isfinite(np.asarray(acc)).all()

    # accelerations must stay at the physical scale of the rescue-disabled
    # pipeline — not orders of magnitude above it
    cfg0 = dataclasses.replace(cfg, rescue_capacity=0)
    *_, acc0, _ = _fields(state, params, cfg0)
    a_max = float(np.linalg.norm(np.asarray(acc), axis=1).max())
    a0_max = float(np.linalg.norm(np.asarray(acc0), axis=1).max())
    dmax = float(np.asarray(den).max())
    d0max = float(np.asarray(_dense_fields(state, params, cfg)[0]).max())
    assert a_max < 20 * max(a0_max, 1.0), (a_max, a0_max)
    assert dmax < 2 * d0max + 100.0


def test_pallas_rescue_matches_dense_oracle(crowded):
    from water_sandbox_tpu.ops.pallas import sph_bucket

    state, params = crowded
    cfg = SimConfig(n=state.n, dim=2, neighbor_mode="pallas",
                    grid_dims=(12, 12), cell_capacity=8,
                    rescue_capacity=512, chunk=128)
    coeffs = KernelCoeffs.from_radius(params.smoothing_radius, cfg.dim)
    den, nden, prs, nprs, acc, unrescued = sph_bucket.bucket_sph(
        state.predicted, state.vel, params, coeffs, cfg, interpret=True)
    assert int(unrescued) == 0
    dden, dnden, dprs, dnprs, dacc = _dense_fields(state, params, cfg)
    np.testing.assert_allclose(den, dden, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(acc, dacc, rtol=2e-4, atol=2e-3)


def test_no_overflow_means_no_rescue_cost_difference(crowded):
    """With ample capacity the cond must take the cheap branch and results
    must equal the rescue-disabled pipeline exactly."""
    state, params = crowded
    base = SimConfig(n=state.n, dim=2, neighbor_mode="bucket_grid",
                     grid_dims=(40, 40), cell_capacity=32, chunk=128)
    with_r = dataclasses.replace(base, rescue_capacity=256)
    a = _fields(state, params, base)
    b = _fields(state, params, with_r)
    assert int(a[-1]) == 0 and int(b[-1]) == 0
    for x, y in zip(a[:-1], b[:-1]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
