"""Semi-implicit Euler integration + boundary collision + prediction.

Mirrors the reference ``integrate`` pass
(/root/reference/assets/simulation.wgsl:272-310):

    v += (g + a)·dt;  x += v·dt;
    per-axis AABB clamp with velocity flip ×(-damping);
    predicted = x + v·lookahead

Extensions with no reference counterpart (BASELINE.md new features):
  * interaction force field (point attractor/repulsor) folded into the
    acceleration before the velocity update;
  * moving/rotating container — collision is resolved in the box's local
    frame against the *wall-relative* velocity, so a translating or yawing
    box drags the fluid. For a static box this reduces bit-for-bit to the
    reference behavior (R = I, wall velocity = 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.params import Container, InteractionField, SimParams

Array = jax.Array


def field_acceleration(pos: Array, field: InteractionField) -> Array:
    """Point repulsor (strength > 0) / attractor (strength < 0) with linear
    falloff over `radius`. Zero strength disables (exactly zero force)."""
    disp = pos - field.position[None, :]
    r = jnp.sqrt(jnp.sum(disp * disp, axis=-1))
    safe_r = jnp.where(r > 0.0, r, 1.0)
    outward = jnp.where((r > 0.0)[:, None], disp / safe_r[:, None], 0.0)
    falloff = jnp.maximum(0.0, 1.0 - r / field.radius)
    return outward * (field.strength * falloff)[:, None]


def _rotate_yaw(x: Array, angle: Array, inverse: bool = False) -> Array:
    """Apply the yaw rotation (about +z in 2-D, +y in 3-D) to (n, dim) rows
    with explicit multiply-adds.

    NEVER use `@`/matmul here: on TPU a default-precision matmul runs on the
    MXU with bf16 inputs, which rounds every position to bf16 each step —
    particles collapse onto a 2^-8-relative grid, coincident pairs form
    (absorbing states under the d==0 +y fallback, wgsl:243-248), local
    density ratchets up and the simulation detonates. Found the hard way at
    step ~60 of the 256k scene; the elementwise form stays on the VPU in
    full float32 (and is faster than an MXU dispatch for a 3x3 anyway)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    if inverse:
        s = -s
    if x.shape[-1] == 2:
        return jnp.stack([c * x[:, 0] - s * x[:, 1],
                          s * x[:, 0] + c * x[:, 1]], axis=1)
    return jnp.stack([c * x[:, 0] + s * x[:, 2],
                      x[:, 1],
                      -s * x[:, 0] + c * x[:, 2]], axis=1)


def container_at(container: Container, t: Array):
    """Box pose at absolute sim time t: (center, yaw angle)."""
    return (container.center + container.velocity * t,
            container.angle + container.angular_velocity * t)


def collide_container(pos: Array, vel: Array, container: Container,
                      padding: Array, damping: Array, t: Array):
    """Per-axis clamp + velocity flip (simulation.wgsl:284-306), generalized
    to a box posed at time t. Returns (pos, vel)."""
    dim = pos.shape[1]
    center, angle = container_at(container, t)

    # Wall velocity at each particle (translation + spin), for relative
    # reflection. Zero for a static container.
    rel = pos - center[None, :]
    if dim == 2:
        spin = container.angular_velocity * jnp.stack([-rel[:, 1], rel[:, 0]], axis=1)
    else:
        # omega = (0, w, 0);  omega x r = (w*r_z, 0, -w*r_x)
        spin = container.angular_velocity * jnp.stack(
            [rel[:, 2], jnp.zeros_like(rel[:, 0]), -rel[:, 0]], axis=1)
    wall_vel = container.velocity[None, :] + spin

    # Into the local frame (elementwise rotation — see _rotate_yaw for why
    # this must never be a matmul).
    local_pos = _rotate_yaw(rel, angle, inverse=True)
    local_vel = _rotate_yaw(vel - wall_vel, angle, inverse=True)

    lo = -container.half_size + padding
    hi = container.half_size - padding
    below = local_pos < lo[None, :]
    above = local_pos > hi[None, :]
    hit = below | above
    local_pos = jnp.clip(local_pos, lo[None, :], hi[None, :])
    local_vel = jnp.where(hit, local_vel * (-damping), local_vel)

    pos = _rotate_yaw(local_pos, angle) + center[None, :]
    vel = _rotate_yaw(local_vel, angle) + wall_vel
    return pos, vel


def integrate(pos: Array, vel: Array, acc: Array, params: SimParams,
              t_new: Array):
    """One integration step at absolute time t_new (post-step time).

    Returns (pos, vel, predicted)."""
    acc_total = params.gravity[None, :] + acc + field_acceleration(pos, params.field)
    vel = vel + acc_total * params.dt
    # optional speed limiter (params.max_speed > 0): overlap catastrophes
    # (see core/params.py) are bounded instead of cascading to NaN
    speed2 = jnp.sum(vel * vel, axis=-1, keepdims=True)
    limit = params.max_speed
    scale = jnp.where(
        (limit > 0.0) & (speed2 > limit * limit),
        limit * jax.lax.rsqrt(jnp.maximum(speed2, 1e-30)), 1.0)
    vel = vel * scale
    pos = pos + vel * params.dt
    pos, vel = collide_container(pos, vel, params.container,
                                 params.particle_radius,
                                 params.collision_damping, t_new)
    predicted = pos + vel * params.lookahead
    return pos, vel, predicted
