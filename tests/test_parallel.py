"""Multi-chip tests on the 8-virtual-device CPU mesh (conftest.py):
sharded trajectories must match single-device ones (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from water_sandbox_tpu.core.params import SimConfig, SimParams
from water_sandbox_tpu.core.state import init_state
from water_sandbox_tpu.models import scenes
from water_sandbox_tpu.ops import step as step_mod
from water_sandbox_tpu.parallel import gspmd, mesh as mesh_mod


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def small_setup():
    pts = scenes.cube_fluid(8, 6, 6)  # 288 particles
    n = pts.shape[0]
    params = SimParams.create(dim=3)
    cfg = SimConfig(n=n, dim=3, neighbor_mode="bucket_grid",
                    grid_dims=(16, 12, 12), cell_capacity=16)
    return cfg, params, init_state(pts)


def test_mesh_creation():
    mesh = mesh_mod.make_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_matches_single_device():
    cfg, params, state = small_setup()
    mesh = mesh_mod.make_mesh(8)

    s_single = state
    for _ in range(5):
        s_single = step_mod.step(s_single, params, cfg)

    rollout = gspmd.make_sharded_rollout(mesh, cfg)
    s_shard = gspmd.shard_state(state, mesh)
    s_shard = rollout(s_shard, params, 5)

    np.testing.assert_allclose(np.asarray(s_shard.pos),
                               np.asarray(s_single.pos), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_shard.vel),
                               np.asarray(s_single.vel), rtol=1e-3, atol=1e-4)


def test_sharded_rollout_rejects_bad_split():
    cfg, params, state = small_setup()
    cfg = SimConfig(n=cfg.n, dim=3, neighbor_mode="bucket_grid",
                    grid_dims=(15, 12, 12), cell_capacity=16)
    mesh = mesh_mod.make_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        gspmd.make_sharded_rollout(mesh, cfg)
