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


def _yaw_matrix(angle: Array, dim: int, dtype) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    if dim == 2:  # rotate about +z
        return jnp.array([[c, -s], [s, c]], dtype)
    # rotate about +y (3-D yaw)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], dtype)


def container_at(container: Container, t: Array):
    """Box pose at absolute sim time t: (center, yaw angle)."""
    return (container.center + container.velocity * t,
            container.angle + container.angular_velocity * t)


def collide_container(pos: Array, vel: Array, container: Container,
                      padding: Array, damping: Array, t: Array):
    """Per-axis clamp + velocity flip (simulation.wgsl:284-306), generalized
    to a box posed at time t. Returns (pos, vel)."""
    dim = pos.shape[1]
    dtype = pos.dtype
    center, angle = container_at(container, t)
    rot = _yaw_matrix(angle, dim, dtype)

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

    # Into the local frame.
    local_pos = rel @ rot  # R^T p  (rot columns are world axes of the box)
    local_vel = (vel - wall_vel) @ rot

    lo = -container.half_size + padding
    hi = container.half_size - padding
    below = local_pos < lo[None, :]
    above = local_pos > hi[None, :]
    hit = below | above
    local_pos = jnp.clip(local_pos, lo[None, :], hi[None, :])
    local_vel = jnp.where(hit, local_vel * (-damping), local_vel)

    pos = local_pos @ rot.T + center[None, :]
    vel = local_vel @ rot.T + wall_vel
    return pos, vel


def integrate(pos: Array, vel: Array, acc: Array, params: SimParams,
              t_new: Array):
    """One integration step at absolute time t_new (post-step time).

    Returns (pos, vel, predicted)."""
    acc_total = params.gravity[None, :] + acc + field_acceleration(pos, params.field)
    vel = vel + acc_total * params.dt
    pos = pos + vel * params.dt
    pos, vel = collide_container(pos, vel, params.container,
                                 params.particle_radius,
                                 params.collision_damping, t_new)
    predicted = pos + vel * params.lookahead
    return pos, vel, predicted
