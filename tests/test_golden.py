"""Golden-trajectory regression tests (SURVEY.md §4): summary statistics of
fixed scenes after a fixed number of steps, generated on CPU float32.

Statistics (center of mass, kinetic energy, bounding box, mean density) are
robust to benign float reassociation across XLA versions but catch any
physics regression. Dense and bucket_grid pipelines share goldens — they
must agree with each other too.
"""

import numpy as np
import pytest

from water_sandbox_tpu.models import scenes
from water_sandbox_tpu.ops.step import rollout

GOLDEN = {
    ("dam-break-2d-4k", "bucket_grid", 40): dict(
        com=[-5.38943, -2.26851], ke=69894.0, mean_rho=159.5193),
    ("mini-3d", "dense", 60): dict(
        com=[0.0, -3.79511, 0.0], ke=10585.86,
        bbox_lo=[-2.28083, -4.4, -2.28083],
        bbox_hi=[2.28083, -3.10759, 2.28083], mean_rho=156.2288),
    ("mini-3d", "bucket_grid", 60): dict(
        com=[0.0, -3.79511, 0.0], ke=10585.88,
        bbox_lo=[-2.28083, -4.4, -2.28083],
        bbox_hi=[2.28083, -3.10759, 2.28083], mean_rho=156.2288),
}


@pytest.mark.parametrize("key", sorted(GOLDEN, key=str))
def test_golden_trajectory(key):
    name, mode, steps = key
    kw = {}
    if mode == "bucket_grid" and name == "mini-3d":
        kw = dict(grid_dims=(20, 16, 16), chunk=256)
    elif name == "dam-break-2d-4k":
        kw = dict(grid_dims=(24, 24), chunk=512)
    cfg, params, state = scenes.build(name, neighbor_mode=mode, **kw)
    s = rollout(state, params, cfg, steps)
    pos = np.asarray(s.pos)
    vel = np.asarray(s.vel)

    g = GOLDEN[key]
    np.testing.assert_allclose(pos.mean(0), g["com"], atol=2e-3)
    np.testing.assert_allclose(0.5 * (vel**2).sum(), g["ke"], rtol=2e-3)
    if "bbox_lo" in g:
        np.testing.assert_allclose(pos.min(0), g["bbox_lo"], atol=5e-3)
        np.testing.assert_allclose(pos.max(0), g["bbox_hi"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(s.density).mean(), g["mean_rho"],
                               rtol=2e-3)
