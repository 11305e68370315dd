"""Dense O(N²) all-pairs SPH passes — the correctness oracle.

Implements exactly the physics of the reference's ``update_density``
(/root/reference/assets/simulation.wgsl:144-195) and ``update_pressure_force``
(simulation.wgsl:198-269) passes, but over *all* pairs instead of the
hashed-cell walk. For true (collision-free) neighborhoods the two are
mathematically identical because the reference distance-filters every
candidate (simulation.wgsl:154,238).

To also emulate the reference's hash-collision *multi-count* semantics —
a pair is accumulated once per neighbor-cell offset whose hash collides with
the pair's cell hash (see SURVEY.md §7 hard part 3) — every pass accepts an
optional ``pair_weight`` (n, n) integer matrix produced by
``ops.hashing.reference_pair_weights``.

These functions are pure and jittable; use for n ≲ 16k (memory is O(N²)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.params import DENSITY_PADDING, KernelCoeffs, SimParams
from . import kernels

Array = jax.Array


def _pairwise_dist(predicted: Array):
    """Pairwise displacement d_ij = p_j - p_i and distances. (n,n,dim)/(n,n)."""
    disp = predicted[None, :, :] - predicted[:, None, :]
    dist = jnp.sqrt(jnp.sum(disp * disp, axis=-1))
    return disp, dist


def density_pass(predicted: Array, params: SimParams, coeffs: KernelCoeffs,
                 pair_weight: Array | None = None):
    """Densities + equation of state (simulation.wgsl:144-195).

    Self-interaction is *included* (the reference's cell walk visits the
    particle itself). Returns (density, near_density, pressure, near_pressure).
    """
    h = params.smoothing_radius
    _, dist = _pairwise_dist(predicted)
    w = jnp.where(kernels.support_mask(dist, h),
                  kernels.w_density(dist, h, coeffs), 0.0)
    wn = jnp.where(kernels.support_mask(dist, h),
                   kernels.w_near(dist, h, coeffs), 0.0)
    if pair_weight is not None:
        w = w * pair_weight
        wn = wn * pair_weight
    density = jnp.sum(w, axis=1) + DENSITY_PADDING
    near_density = jnp.sum(wn, axis=1) + DENSITY_PADDING
    pressure = params.pressure_scalar * (density - params.target_density)
    near_pressure = params.near_pressure_scalar * near_density
    return density, near_density, pressure, near_pressure


def force_pass(predicted: Array, vel: Array, density: Array,
               near_density: Array, pressure: Array, near_pressure: Array,
               params: SimParams, coeffs: KernelCoeffs,
               pair_weight: Array | None = None) -> Array:
    """Pressure + near-pressure + viscosity acceleration
    (simulation.wgsl:198-269). Self pair is skipped (wgsl:231-233).

    Per neighbor j of i (d = |p_j - p_i| <= h):
        dir      = (p_j - p_i)/d, or +ŷ when d == 0 (wgsl:243-248)
        F_p     += dir · (p̄ · W'(d) / ρ_j  +  p̄_near · W'_near(d) / ρ_near_j)
        F_visc  += (v_j - v_i) · W_poly6(d)
        accel    = F_p / ρ_i + μ · F_visc
    """
    n, dim = predicted.shape
    h = params.smoothing_radius
    disp, dist = _pairwise_dist(predicted)

    eye = jnp.eye(n, dtype=bool)
    mask = kernels.support_mask(dist, h) & ~eye
    if pair_weight is not None:
        weight = jnp.where(mask, pair_weight.astype(predicted.dtype), 0.0)
    else:
        weight = mask.astype(predicted.dtype)

    # Direction with the reference's d == 0 fallback of +y (wgsl:243-248).
    up = jnp.zeros((dim,), predicted.dtype).at[1].set(1.0)
    safe = jnp.where(dist > 0.0, dist, 1.0)
    direction = jnp.where((dist > 0.0)[..., None], disp / safe[..., None], up)

    slope = kernels.dw_density(dist, h, coeffs)
    slope_near = kernels.dw_near(dist, h, coeffs)
    shared_p = (pressure[:, None] + pressure[None, :]) * 0.5
    shared_np = (near_pressure[:, None] + near_pressure[None, :]) * 0.5

    scale = weight * (shared_p * slope / density[None, :]
                      + shared_np * slope_near / near_density[None, :])
    pressure_force = jnp.sum(direction * scale[..., None], axis=1)

    w_visc = weight * kernels.w_viscosity(dist, h, coeffs)
    dvel = vel[None, :, :] - vel[:, None, :]
    viscosity_force = jnp.sum(dvel * w_visc[..., None], axis=1)

    return (pressure_force / density[:, None]
            + params.viscosity_strength * viscosity_force)
