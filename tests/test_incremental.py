"""Incremental plane-resident stepping (ops/pallas/incremental.py):
plane/address consistency invariants, parity with the rebuild-per-step
pallas path, rescue exactness under forced overflow, and the rebuild
triggers. Runs the Pallas kernels in interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import water_sandbox_tpu as wst
from water_sandbox_tpu.core.params import SimConfig, SimParams
from water_sandbox_tpu.core.state import init_state
from water_sandbox_tpu.models.scenes import cube_fluid
from water_sandbox_tpu.ops import dense, step as step_mod
from water_sandbox_tpu.ops.pallas import incremental as inc
from water_sandbox_tpu.ops.pallas import sph_bucket as sb

# eager interpret-mode stepping is minutes/step; jit (cached per cfg).
# materialize=True every step so density/acc invariants stay checkable.
_step_inc = jax.jit(inc.step_inc, static_argnums=(3, 4, 5))


def step_inc(state, cache, params, cfg):
    return _step_inc(state, cache, params, cfg, True, True)


@pytest.fixture(scope="module")
def mini():
    sim = wst.Simulation.from_scene("mini-3d", neighbor_mode="pallas")
    return sim.state, sim.params, sim.cfg


def _check_cache_consistency(state, cache, cfg, lookahead=None):
    """Planes/addr must exactly mirror the particle-order state. With
    ``lookahead`` given, also checks the derived-position relation
    pos = predicted - vel*lookahead (exact to one float rounding)."""
    gx, gy, gz, S, S_pad, NYC, PAD, L = sb._geometry(cfg)[:8]
    cap_p = sb._cap_pad(cfg.cell_capacity)
    PL = cap_p * L
    addr = np.asarray(cache.addr)
    dropped = addr == PL
    live = ~dropped
    # unique addresses among live particles
    assert len(np.unique(addr[live])) == live.sum()
    planes = np.asarray(cache.planes).reshape(cache.planes.shape[0], -1)
    dim = cfg.dim
    for a in range(dim):
        np.testing.assert_array_equal(
            planes[a, addr[live]], np.asarray(state.predicted)[live, a])
        np.testing.assert_array_equal(
            planes[dim + a, addr[live]], np.asarray(state.vel)[live, a])
    if lookahead is not None:
        np.testing.assert_allclose(
            np.asarray(state.pos)[live],
            (np.asarray(state.predicted)
             - np.asarray(state.vel) * lookahead)[live], atol=1e-5)
    # every live particle occupies a slot; occupied slots == live count
    occupied = planes[0] < 0.5 * sb._FAR
    assert occupied.sum() == live.sum()


def test_incremental_invariants_and_conservation(mini):
    state, params, cfg = mini
    cfg = dataclasses.replace(cfg, incremental_rebuild=8)
    cache = inc.build_cache(state.predicted, state.vel, params, cfg)
    _check_cache_consistency(state, cache, cfg)
    for _ in range(4):
        state, cache = step_inc(state, cache, params, cfg)
        # the invariants must hold whether or not a rebuild triggered
        # (a fresh lattice's pressure explosion moves enough particles
        # that the hole-debt guard may legitimately fire)
        _check_cache_consistency(state, cache, cfg,
                                 lookahead=float(params.lookahead))
    assert np.isfinite(np.asarray(state.pos)).all()


def test_incremental_static_fluid_never_rebuilds(mini):
    """With all forces off nothing moves: zero movers, zero debt, no
    drift — the cache must tick through every step without a rebuild."""
    state, params, cfg = mini
    params = dataclasses.replace(
        params, gravity=params.gravity * 0.0, pressure_scalar=0.0,
        near_pressure_scalar=0.0, viscosity_strength=0.0)
    state = dataclasses.replace(state, vel=state.vel * 0.0)
    cfg = dataclasses.replace(cfg, incremental_rebuild=16)
    cache = inc.build_cache(state.predicted, state.vel, params, cfg)
    pos0 = np.asarray(state.pos)
    for _ in range(3):
        state, cache = step_inc(state, cache, params, cfg)
    assert int(cache.ticks) == 3
    np.testing.assert_allclose(np.asarray(state.pos), pos0, atol=1e-6)
    _check_cache_consistency(state, cache, cfg)


@pytest.mark.parametrize("k, steps, tol", [(1, 4, 1e-5), (4, 6, 5e-3)])
def test_incremental_matches_rebuild_path(mini, k, steps, tol):
    """K=1 degenerates to rebuild-every-step (same planes every step, so
    only compiler-level fusion differences remain); K>1 diverges only by
    slot-order float reassociation at the usual chaotic rate."""
    state, params, cfg = mini
    # rollout donates its state buffers — hand it a copy so the
    # module-scoped fixture state survives
    ref = step_mod.rollout(jax.tree_util.tree_map(lambda x: x.copy(), state),
                           params, cfg, steps)
    cfg_inc = dataclasses.replace(cfg, incremental_rebuild=k)
    out = inc.rollout_inc(state, params, cfg_inc, steps)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=10 * tol, atol=10 * tol)
    assert int(out.step_count) == int(ref.step_count)


def test_incremental_rescue_matches_dense_oracle():
    """Forced cell-capacity overflow: dropped movers must re-enter physics
    exactly via the rescue pass — densities/forces match the dense oracle
    through a multi-step incremental rollout."""
    pts = cube_fluid(12, 9, 6, particle_radius=0.04)
    params = SimParams.create(dim=3)
    state = init_state(pts)
    n = pts.shape[0]
    cfg_d = SimConfig(n=n, dim=3, neighbor_mode="dense")
    state = step_mod.rollout(state, params, cfg_d, 3)

    cfg = SimConfig(n=n, dim=3, neighbor_mode="pallas",
                    grid_dims=(12, 12, 12), cell_capacity=8,
                    rescue_capacity=512, incremental_rebuild=8)
    cache = inc.build_cache(state.predicted, state.vel, params, cfg)
    assert int(jnp.sum(cache.addr == sb._cap_pad(8)
                       * sb._geometry(cfg).L)) > 0, \
        "test scene must force overflow"

    s_inc, s_dense = state, state
    for _ in range(3):
        s_inc, cache = step_inc(s_inc, cache, params, cfg)
        s_dense = step_mod.step(s_dense, params, cfg_d)
        np.testing.assert_allclose(np.asarray(s_inc.pos),
                                   np.asarray(s_dense.pos),
                                   rtol=2e-4, atol=2e-4)
    assert int(s_inc.overflow_total) > 0  # drops happened and were counted


def test_drift_guard_triggers_rebuild(mini):
    """A blob in free fall strays from the frozen grid anchor by more than
    the 3/4-cell guard within ~10 steps — the cache must re-anchor
    (rebuild) so boundary-cell clamping stays no worse than a fresh
    build's (a perf guard; pair coverage is anchor-independent)."""
    state, params, cfg = mini
    params = dataclasses.replace(
        params, gravity=params.gravity * 0.0 - 50.0)
    cfg = dataclasses.replace(cfg, incremental_rebuild=64)
    cache = inc.build_cache(state.predicted, state.vel, params, cfg)
    steps = 12
    for _ in range(steps):
        state, cache = step_inc(state, cache, params, cfg)
    assert int(cache.ticks) < steps  # at least one drift-triggered rebuild
    _check_cache_consistency(state, cache, cfg)
    assert np.isfinite(np.asarray(state.pos)).all()
