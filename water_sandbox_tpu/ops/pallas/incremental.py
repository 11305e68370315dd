"""Incremental plane-resident bucket stepping (pallas mode).

The rebuild-per-step pipeline pays an irreducible XLA scatter tax to place
every particle's features into the bucket planes each step (~14 ns/element
on v5e regardless of batching — benchmarks/micro2_tpu_results.json), plus a
full sort and the gather-back. At a settled state only ~1-5% of particles
change cell per step, so this module keeps the particle state RESIDENT in
the bucket planes across steps:

* the planes carry (predicted, vel, pos) feature rows — 3·dim planes;
* the force pass's plane-layout acceleration output is integrated IN the
  plane layout (ops/integrate.py axes form — identical math to the
  particle-order integrator);
* per-particle state is refreshed by ONE multi-feature gather at the
  particles' known plane addresses;
* only cell-crossing movers are re-inserted: one sort keyed on
  (moved ? new cell : INT_MAX) compacts and groups them, each mover takes
  its column's first free slot (rank 0) or top+rank, and a single combined
  scatter clears old slots (plane-0 _FAR) and writes the new feature rows;
* holes left behind hold _FAR, so the kernels' distance filter absorbs
  them; per-column `top` (max occupied slot + 1, derived from plane 0)
  replaces counts for the occupancy gates;
* a FULL rebuild (the rebuild-per-step build) runs every
  cfg.incremental_rebuild steps, and immediately whenever the mover budget
  overflows, hole debt piles up, or the fluid drifts near the frozen grid
  anchor's clamp range — so physics stays EXACT: between rebuilds cells are
  keyed against the anchor frozen at the last rebuild, with quarter-cell
  drift guards triggering a re-anchor before any clamping the fresh build
  would not also do.

Capacity overflow keeps the single-chip exactness contract: a mover whose
target column is full is marked dropped (sentinel address) and the NEXT
step's rescue pass (ops/rescue.py) computes it exactly, exactly as the
rebuild path does for build-time overflow; it re-attempts insertion every
step. Accounting note: `state.overflow` in this mode counts particles
currently dropped (awaiting their rescue next step), where the rebuild path
counts same-step build drops — totals agree in the steady state (both 0)
but may differ by a step's phase during transients.

Physics parity: pair sets are identical to the rebuild path (same grid,
same distance filter); only the slot ORDER inside columns differs, so
trajectories diverge by float reassociation at the usual chaotic rate —
the same tolerance class as any kernel-schedule change.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core.params import KernelCoeffs, SimConfig, SimParams
from ...core.state import FluidState
from .. import hashing, integrate as integrate_mod
from . import sph_bucket as sb

Array = jax.Array
_I32_MAX = jnp.iinfo(jnp.int32).max


class BucketCache(NamedTuple):
    """Plane-resident bucket state carried across incremental steps."""
    planes: Array   # (3*dim, cap_p, L) f32 — predicted, vel, pos rows
    addr: Array     # (n,) int32: slot*L + PAD + col; cap_p*L = dropped
    origin: Array   # (dim,) f32 — grid anchor frozen at the last rebuild
    ticks: Array    # () int32 — steps since the last full rebuild


def mover_budget(cfg: SimConfig) -> int:
    # Measured settled flagship mover rate is ~22% of n per step (57-58k of
    # 266k; cell h=0.25, dt=1/120, stirred speeds ~1 m/s move predicted
    # across a cell boundary often) — n//4 covers it with headroom.
    if cfg.mover_capacity > 0:
        return min(cfg.mover_capacity, cfg.n)
    return min(sb._round_up(max(4096, cfg.n // 4), 128), cfg.n)


def build_cache(predicted: Array, vel: Array, pos: Array,
                params: SimParams, cfg: SimConfig):
    """Full rebuild: fresh anchor, planes with pos rows, addresses."""
    origin = hashing.grid_origin(predicted, params.smoothing_radius)
    planes, _, addr, _ = sb._build_slab_buckets(
        predicted, vel, params, cfg, extra=pos, origin=origin)
    return BucketCache(planes=planes, addr=addr, origin=origin,
                       ticks=jnp.zeros((), jnp.int32))


def _top_row(planes: Array, cap_p: int):
    """(top, occ_total): per-column max-occupied-slot+1 (1, L) f32 — the
    counts replacement for the occupancy gates once holes exist — and the
    total occupied-slot count (for hole-debt tracking)."""
    occupied = planes[0] < 0.5 * sb._FAR
    slot_no = 1.0 + jax.lax.broadcasted_iota(jnp.float32,
                                             (cap_p, planes.shape[2]), 0)
    top = jnp.max(jnp.where(occupied, slot_no, 0.0), axis=0)[None, :]
    occ_total = jnp.sum(occupied)
    return top, occ_total


def _new_columns(predicted: Array, origin: Array, params: SimParams,
                 cfg: SimConfig, S_pad: int):
    """Slab-strided column key per particle against the frozen anchor
    (same derivation as the build, sph_bucket.py)."""
    dims = cfg.grid_dims
    gz = dims[2] if cfg.dim == 3 else 1
    cell = jnp.floor((predicted - origin) / params.smoothing_radius)
    cell = jnp.clip(cell.astype(jnp.int32), 0,
                    jnp.asarray(dims, jnp.int32) - 1)
    r = cell[:, 1]
    if cfg.dim == 3:
        r = r * gz + cell[:, 2]
    return cell[:, 0] * S_pad + r


def step_inc(state: FluidState, cache: BucketCache, params: SimParams,
             cfg: SimConfig, interpret: bool | None = None):
    """One incremental step. Returns (state', cache')."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dim = cfg.dim
    h = params.smoothing_radius
    gx, gy, gz, S, S_pad, NYC, PAD, L = sb._geometry(cfg)
    cap_p = sb._cap_pad(cfg.cell_capacity)
    PL = cap_p * L
    n = state.n
    coeffs = KernelCoeffs.from_radius(h, dim)
    planes, addr, origin, ticks = cache

    # --- occupancy gates from the plane contents (top covers holes) ---
    top, occ_total = _top_row(planes, cap_p)
    own, m0 = sb.occupancy_bounds(top, gx, S_pad, PAD, gz)

    # --- density / rescue / force / gather-back (shared passes) ---
    dropped = addr == PL
    overflow = jnp.sum(dropped).astype(jnp.int32)
    den, nden, prs, nprs, acc, unrescued, out_c = sb.sph_passes(
        planes, own, m0, addr, dropped, overflow, state.predicted,
        state.vel, params, coeffs, cfg, interpret)

    # --- integrate IN the plane layout (holes stay _FAR / finite) ---
    # On overflow steps the rescue pass corrected `acc` in PARTICLE order
    # (dropped particles' pair forces injected into their resident
    # neighbors, ops/rescue.py) — out_c's acc planes predate that. Scatter
    # the corrected rows back so the in-plane integrate sees them; costs
    # one dim·n-element scatter only under the (transient) overflow cond.
    def _patch_acc(o):
        flat = o.reshape(2 + dim, -1)
        idx = jnp.where(dropped, flat.shape[1], addr)
        return flat.at[2:, idx].set(acc.T, mode="drop").reshape(o.shape)

    out_c = jax.lax.cond(overflow > 0, _patch_acc, lambda o: o, out_c)

    t_new = state.time + params.dt
    occupied = planes[0] < 0.5 * sb._FAR
    np_, nv_, npr_ = integrate_mod.integrate_axes(
        [planes[2 * dim + a] for a in range(dim)],
        [planes[dim + a] for a in range(dim)],
        [out_c[2 + a] for a in range(dim)], params, t_new)
    newplanes = jnp.stack(
        [jnp.where(occupied, npr_[a], sb._FAR) for a in range(dim)]
        + [jnp.where(occupied, nv_[a], 0.0) for a in range(dim)]
        + [jnp.where(occupied, np_[a], 0.0) for a in range(dim)])

    # --- particle order: ONE gather for (predicted, vel, pos) ---
    safe = jnp.minimum(addr, PL - 1)
    rows_p = newplanes.reshape(3 * dim, -1)[:, safe]      # (3*dim, n)
    # dropped particles integrate in particle order from the (rescued) acc
    pos_d, vel_d, pred_d = integrate_mod.integrate(
        state.pos, state.vel, acc, params, t_new)
    dcol = dropped[:, None]
    pred_n = jnp.where(dcol, pred_d, rows_p[:dim].T)
    vel_n = jnp.where(dcol, vel_d, rows_p[dim:2 * dim].T)
    pos_n = jnp.where(dcol, pos_d, rows_p[2 * dim:].T)

    # --- mover detection + compaction (one sort) ---
    newcol = _new_columns(pred_n, origin, params, cfg, S_pad)
    oldcol = addr % L - PAD            # dropped: sentinel%L-PAD = -PAD
    moved = newcol != oldcol
    nm = jnp.sum(moved).astype(jnp.int32)
    M = mover_budget(cfg)
    iota = jnp.arange(n, dtype=jnp.int32)
    skey, sidx = jax.lax.sort(
        (jnp.where(moved, newcol, _I32_MAX), iota), num_keys=1)
    mk, mid = skey[:M], sidx[:M]
    valid = mk < _I32_MAX

    # per-column rank among this step's movers
    miota = jnp.arange(M, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), mk[1:] != mk[:-1]])
    rank = miota - jax.lax.cummax(jnp.where(first, miota, 0))

    # slot: first free slot of the column for rank 0 (hole-filling keeps
    # debt bounded), top+rank above the current top otherwise
    col_safe = jnp.where(valid, mk, 0)
    top_at = top[0, PAD + col_safe].astype(jnp.int32)
    empty_slot = jnp.where(occupied, jnp.float32(cap_p),
                           jax.lax.broadcasted_iota(
                               jnp.float32, (cap_p, L), 0))
    first_free = jnp.min(empty_slot, axis=0)[PAD + col_safe].astype(
        jnp.int32)
    slot = jnp.where(rank == 0, jnp.minimum(first_free, top_at),
                     top_at + rank)
    ok = valid & (slot < cfg.cell_capacity)
    newaddr = jnp.where(ok, slot * L + PAD + (mk * ok), PL)

    # --- combined clear + insert scatter on the flattened planes ---
    OOB = 3 * dim * PL
    oldaddr_m = addr[mid]
    clear_idx = jnp.where(valid & (oldaddr_m < PL), oldaddr_m, OOB)
    rows9 = jnp.concatenate([pred_n, vel_n, pos_n], axis=1)   # (n, 3*dim)
    rows_m = jnp.take(rows9, mid, axis=0)                     # (M, 3*dim)
    ins_idx = [jnp.where(ok, a * PL + newaddr, OOB)
               for a in range(3 * dim)]
    all_idx = jnp.concatenate([clear_idx] + ins_idx)
    all_val = jnp.concatenate(
        [jnp.full((M,), sb._FAR, jnp.float32)]
        + [rows_m[:, a] for a in range(3 * dim)])
    # Indices are provably unique: old addresses are distinct live slots,
    # new addresses are chosen among slots EMPTY before this step (first
    # free / above top), so clears and inserts can never collide — and the
    # unique_indices hint is what keeps XLA on the fast ~14 ns/element
    # scatter path (benchmarks/micro2_tpu_results.json) instead of the
    # slow duplicate-safe one.
    flat = newplanes.reshape(-1).at[all_idx].set(
        all_val, mode="drop", unique_indices=True)
    planes_inc = flat.reshape(3 * dim, cap_p, L)
    addr_inc = addr.at[jnp.where(valid, mid, n)].set(
        jnp.where(ok, newaddr, PL), mode="drop", unique_indices=True)

    # --- rebuild decision ---
    # Anchor-drift guard. Clamped cell keys are a monotone non-expansive
    # map of position, so |cell_i - cell_j| <= 1 holds for any pair within
    # h under ANY anchor — pair completeness (hence physics exactness)
    # never depends on the anchor. What drifting DOES cost is occupancy:
    # a stale anchor clamps more particles into boundary cells than the
    # fresh build would, heating the kernels' slot bounds and the rescue
    # path. Re-anchor when the frozen origin strays from where a fresh
    # build would put it (min - h) by more than 3/4 cell in any axis.
    mins = jnp.min(pred_n, axis=0)
    drift = jnp.any(jnp.abs(origin - (mins - h)) > 0.75 * h)
    debt = jnp.sum(top) - occ_total.astype(jnp.float32)
    k = max(cfg.incremental_rebuild, 1)
    rebuild = ((ticks + 1 >= k) | (nm > M) | drift
               | (debt > jnp.float32(n // 2)))

    def do_rebuild(_):
        return build_cache(pred_n, vel_n, pos_n, params, cfg)

    def keep_inc(_):
        return BucketCache(planes=planes_inc, addr=addr_inc,
                           origin=origin, ticks=ticks + 1)

    cache_out = jax.lax.cond(rebuild, do_rebuild, keep_inc, None)
    overflow_out = jnp.sum(cache_out.addr == PL).astype(jnp.int32)

    state_out = FluidState(
        pos=pos_n, vel=vel_n, predicted=pred_n, acc=acc,
        density=den, near_density=nden, pressure=prs, near_pressure=nprs,
        step_count=state.step_count + 1, time=t_new,
        overflow=overflow_out,
        overflow_total=state.overflow_total + overflow_out.astype(
            jnp.float32))
    return state_out, cache_out


def rollout_inc(state: FluidState, params: SimParams, cfg: SimConfig,
                num_steps: int) -> FluidState:
    """num_steps of incremental stepping under lax.scan; the bucket cache
    is built on entry and discarded at exit (callers that chunk their runs
    amortize one rebuild per chunk)."""
    cache = build_cache(state.predicted, state.vel, state.pos, params, cfg)

    def body(carry, _):
        s, c = carry
        return step_inc(s, c, params, cfg), None

    (state, _), _ = jax.lax.scan(body, (state, cache), None,
                                 length=num_steps)
    return state
