"""Checkpoint, trajectory export, rasterizer, and CLI tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from water_sandbox_tpu import Simulation
from water_sandbox_tpu.io.export import TrajectoryWriter, load_trajectory
from water_sandbox_tpu.runtime import checkpoint
from water_sandbox_tpu.viz import raster


def test_checkpoint_roundtrip(tmp_path):
    sim = Simulation.from_scene("mini-3d", neighbor_mode="dense")
    sim.tune(viscosity_strength=0.42)
    sim.run(3)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, sim.state, sim.params, sim.cfg)

    state, params, cfg = checkpoint.load(path)
    assert cfg == sim.cfg
    np.testing.assert_allclose(np.asarray(state.pos),
                               np.asarray(sim.state.pos))
    assert float(params.viscosity_strength) == pytest.approx(0.42)

    # resumed trajectory == continuous trajectory
    sim2 = Simulation(cfg, params, state)
    sim2.run(3)
    sim.run(3)
    np.testing.assert_allclose(np.asarray(sim2.state.pos),
                               np.asarray(sim.state.pos), rtol=1e-6)


def test_trajectory_export_roundtrip(tmp_path):
    sim = Simulation.from_scene("mini-3d", neighbor_mode="dense")
    w = TrajectoryWriter(str(tmp_path / "traj.npz"), {"scene": "mini-3d"})
    w.add_frame(sim.positions(), 0.0)
    sim.run(2)
    w.add_frame(sim.positions(), float(sim.state.time))
    path = w.write()

    positions, times, meta = load_trajectory(path)
    assert positions.shape == (2, 512, 3)
    assert meta["scene"] == "mini-3d"
    assert times[1] > times[0]


def test_density_raster():
    sim = Simulation.from_scene("mini-3d", neighbor_mode="dense")
    sim.run(2)
    img = np.asarray(raster.density_image(sim.state, sim.params, 64, 36))
    assert img.shape == (36, 64)
    assert img.sum() > 0
    # mass should be concentrated where the cube is (center of the image)
    assert img[:, 24:40].sum() > img[:, :16].sum()
    txt = raster.ascii_preview(img)
    assert len(txt.splitlines()) == 36

    simg = np.asarray(raster.speed_image(sim.state, sim.params, 32, 18))
    assert simg.shape == (18, 32)


def test_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""
    env["WST_FORCE_CPU"] = "1"
    ck = str(tmp_path / "end.npz")
    out = subprocess.run(
        [sys.executable, "-m", "water_sandbox_tpu.cli", "run",
         "--scene", "mini-3d", "--neighbor-mode", "dense", "--steps", "4",
         "--record-every", "2", "--checkpoint", ck],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    stats_line = [l for l in out.stdout.splitlines() if l.startswith("{")][0]
    stats = json.loads(stats_line)
    assert stats["step"] == 4
    assert os.path.exists(ck)

    out2 = subprocess.run(
        [sys.executable, "-m", "water_sandbox_tpu.cli", "resume",
         "--checkpoint", ck, "--steps", "2"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out2.returncode == 0, out2.stderr
    stats2 = json.loads(
        [l for l in out2.stdout.splitlines() if l.startswith("{")][0])
    assert stats2["step"] == 6
