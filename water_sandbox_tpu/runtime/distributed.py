"""Multi-chip runtime: the Simulation-equivalent driving the explicit
domain-decomposition step (parallel/domain.py) over a device mesh.

    sim = DistributedSimulation.from_scene("sharded-1m", n_devices=8)
    sim.run(100)
    pos, vel = sim.particles()
"""

from __future__ import annotations

import dataclasses
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import SimConfig, SimParams
from ..models import scenes as scene_registry
from ..parallel import domain, mesh as mesh_mod
from . import metrics as metrics_mod


class DistributedSimulation:
    """Stateful wrapper over the shard_map domain step: fixed-capacity
    per-device particle slots, ppermute halo exchange, migration."""

    def __init__(self, cfg: SimConfig, params: SimParams, state, mesh=None,
                 n_devices: int | None = None, slack: float = 2.0,
                 mig_cap: int = 1024, name: str = "custom"):
        self.mesh = mesh or mesh_mod.make_mesh(n_devices)
        if self.mesh.devices.size < (n_devices or 1):
            raise ValueError(
                f"asked for {n_devices} devices but only "
                f"{self.mesh.devices.size} exist")
        self.cfg = cfg
        self.params = params
        self.name = name
        self.state, self.active = domain.shard_state(
            state, self.mesh, cfg, params, slack=slack)
        self._rollout = domain.make_domain_rollout(self.mesh, cfg,
                                                   mig_cap=mig_cap)
        self.lost_total = 0.0
        self._lost_acc = jnp.zeros((), jnp.float32)
        self.metrics = metrics_mod.MetricsRecorder()

    @classmethod
    def from_scene(cls, name: str, n_devices: int | None = None,
                   slack: float = 2.0, **cfg_overrides):
        cfg, params, state = scene_registry.build(name, **cfg_overrides)
        return cls(cfg, params, state, n_devices=n_devices, slack=slack,
                   name=name)

    # scanned-rollout chunk sizes — same compile-count bound as
    # Simulation._CHUNKS (runtime/runner.py)
    _CHUNKS = (64, 8, 1)

    def run(self, num_steps: int = 1, block: bool = True):
        if num_steps <= 0:
            return self
        t0 = _time.perf_counter()
        # the rollout scans steps on-device (one dispatch per chunk, not per
        # step) and sums every step's migration losses in the scan carry, so
        # no step's losses go unreported regardless of `block`.
        lost_acc = self._lost_acc
        remaining = num_steps
        for size in self._CHUNKS:
            while remaining >= size:
                self.state, self.active, lost = self._rollout(
                    self.state, self.active, self.params, size)
                lost_acc = lost_acc + lost
                remaining -= size
        self._lost_acc = lost_acc
        if block:
            self.lost_total = float(jax.device_get(lost_acc))
            self.metrics.record_steps(num_steps, self.cfg.n,
                                      _time.perf_counter() - t0)
        return self

    def tune(self, **kw):
        self.params = dataclasses.replace(
            self.params, **{k: jnp.asarray(v, jnp.float32)
                            for k, v in kw.items()})
        return self

    def particles(self):
        """(positions, velocities) of all active particles, gathered to the
        host. Row order is device order, not original particle ids."""
        return domain.gather_dense(self.state, self.active)

    def to_dense_state(self):
        """Collapse the sharded slots into a dense FluidState of the active
        particles (host-side; row order is device order) — feeds
        runtime.checkpoint.save for persistence of distributed runs."""
        from ..core.state import FluidState
        act = np.asarray(self.active) > 0

        def take(arr):
            return jnp.asarray(np.asarray(arr)[act])

        s = self.state
        return FluidState(
            pos=take(s.pos), vel=take(s.vel), predicted=take(s.predicted),
            acc=take(s.acc), density=take(s.density),
            near_density=take(s.near_density), pressure=take(s.pressure),
            near_pressure=take(s.near_pressure),
            step_count=jnp.asarray(jax.device_get(s.step_count)),
            time=jnp.asarray(jax.device_get(s.time)),
            overflow=jnp.asarray(jax.device_get(s.overflow)),
            overflow_total=jnp.asarray(jax.device_get(s.overflow_total)),
            ids=take(s.ids))

    def stats(self) -> dict:
        pos, vel = self.particles()
        self.lost_total = float(jax.device_get(self._lost_acc))
        out = {
            "step": int(jax.device_get(self.state.step_count)),
            "active_particles": int(pos.shape[0]),
            "lost_particles": self.lost_total,
            "kinetic_energy": float(0.5 * (vel**2).sum()),
            "per_device_counts": np.asarray(self.active).reshape(
                self.mesh.devices.size, -1).sum(axis=1).astype(int).tolist(),
        }
        out.update(self.metrics.summary())
        return out
