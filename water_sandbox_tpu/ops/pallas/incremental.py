"""Incremental plane-resident bucket stepping (pallas mode).

The rebuild-per-step pipeline pays an irreducible XLA scatter tax to place
every particle's features into the bucket planes each step (~14 ns/element
on v5e regardless of batching — benchmarks/micro2_tpu_results.json), plus a
full sort and a per-step gather-back. At a settled state only ~20% of
particles change cell per step, so this module keeps the particle state
RESIDENT in the bucket planes across steps. One step is ordered

    reinsert movers -> occupancy gates -> density -> force -> integrate
    (all in the plane layout)

with the mover RE-INSERTION at the START of the step, detected against the
previous step's integrated planes:

* the planes carry the standard (predicted, vel) feature rows — positions
  are DERIVED (pos = predicted - vel·lookahead, the exact inverse of the
  integrator's prediction step, ops/integrate.py:163) so the cache stays
  at the rebuild path's 2·dim rows;
* ONE multi-feature gather at step start reads every particle's
  (predicted, vel) from the carried planes. Because the carry is a
  materialized scan buffer, the gathered bits are EXACTLY the plane bits —
  mover re-insertion scatters the same bits back, so plane and particle
  state can never drift apart. (Detecting movers from a freshly-computed
  integrate output instead lets XLA rematerialize the chain inside the
  gather with different fma contraction — plane and shadow state end up a
  ulp apart, enough to flip a cell key at an exact boundary. Found the
  hard way; the start-of-step order makes the race impossible by
  construction.)
* only cell-crossing movers are re-inserted: one sort keyed on
  (moved ? new cell : INT_MAX) compacts and groups them, and a single
  combined scatter clears old slots (plane-0 _FAR) and writes the new
  feature rows;
* insertion fills HOLES first: per column, the step's rank-0 mover takes
  the FIRST free slot and rank-1 the SECOND (one fused pass over the
  occupancy mask computes both), so vacated slots are recycled within a
  step or two and the per-column `top` (max occupied slot + 1, the counts
  replacement for the occupancy gates) stays at occupancy + O(1).
  Stacking movers at top+rank instead was measured to grow `top`
  monotonically and the window-max occupancy bounds with it — the kernels
  slowed 2-10x over a 24-step window (benchmarks/micro11_inc_results.json
  round-3 history);
* the force pass's plane-layout acceleration output is integrated IN the
  plane layout (ops/integrate.py axes form — identical math to the
  particle-order integrator); per-particle densities/acc are gathered
  ONLY on the rollout's last step, and the intermediate scan states carry
  one-step-stale shadows of the resident particles (the planes are the
  authoritative state; the exit state is trued up by the last step's
  materialize gather);
* a FULL rebuild replaces the reinserted planes every
  cfg.incremental_rebuild steps, and immediately whenever the mover
  budget overflows, hole debt piles up, or the frozen grid anchor strays
  from where a fresh build would anchor. The anchor guard is a
  PERFORMANCE guard, not an exactness one: clamped cell keys are a
  monotone non-expansive map of position, so two particles within h land
  within one cell ring of each other under ANY anchor — pair coverage
  (hence physics) never depends on it. What drifting costs is
  boundary-cell pileup, which heats the occupancy bounds.

Capacity overflow keeps the single-chip exactness contract: a mover whose
target column is full is marked dropped (sentinel address) and the SAME
step's rescue pass (ops/rescue.py) computes it exactly, exactly as the
rebuild path does for build-time overflow; its particle-order state is
kept current under the overflow cond and it re-attempts insertion every
step. `state.overflow` counts currently-dropped particles, like the
rebuild path's same-step build drops.

Physics parity: pair sets are identical to the rebuild path (same grid,
same distance filter); only the slot ORDER inside columns differs, so
trajectories diverge by float reassociation at the usual chaotic rate —
the same tolerance class as any kernel-schedule change. One semantic
delta, same class: derived positions re-round once per step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core.params import DENSITY_PADDING, KernelCoeffs, SimConfig, SimParams
from ...core.state import FluidState
from .. import hashing, integrate as integrate_mod
from . import sph_bucket as sb

Array = jax.Array
_I32_MAX = jnp.iinfo(jnp.int32).max


class BucketCache(NamedTuple):
    """Plane-resident bucket state carried across incremental steps."""
    planes: Array   # (2*dim, cap_p, L) f32 — predicted, vel rows
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


def build_cache(predicted: Array, vel: Array, params: SimParams,
                cfg: SimConfig):
    """Full rebuild: fresh anchor, standard feature planes, addresses."""
    origin = hashing.grid_origin(predicted, params.smoothing_radius)
    planes, _, addr, _ = sb._build_slab_buckets(
        predicted, vel, params, cfg, origin=origin)
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


def _column_state(planes: Array, cap_p: int):
    """One pass over the plane-0 occupancy mask producing everything the
    step needs per column: (top (1, L) f32, occupancy BITMASKS lo/hi
    (L,) uint32 with bit s = slot s (s-32 in hi) occupied, occ_total).

    The bitmasks replace the v2 slot-pick's three full-plane min
    reductions (first/second free slot) with ~10 elementwise bit ops on
    only the mover columns — measured 16 ms -> ~1 ms at the flagship.
    Requires cap_p <= 64."""
    if cap_p > 64:
        raise ValueError(f"bitmask slot pick needs cell capacity <= 64; "
                         f"got padded capacity {cap_p}")
    L = planes.shape[2]
    occupied = planes[0] < 0.5 * sb._FAR
    slot_no = 1.0 + jax.lax.broadcasted_iota(jnp.float32, (cap_p, L), 0)
    top = jnp.max(jnp.where(occupied, slot_no, 0.0), axis=0)[None, :]
    s = jnp.arange(cap_p, dtype=jnp.uint32)[:, None]
    w_lo = jnp.where(s < 32, jnp.uint32(1) << (s % 32), jnp.uint32(0))
    w_hi = jnp.where(s >= 32, jnp.uint32(1) << (s % 32), jnp.uint32(0))
    lo = jnp.sum(jnp.where(occupied, w_lo, jnp.uint32(0)), axis=0,
                 dtype=jnp.uint32)
    hi = jnp.sum(jnp.where(occupied, w_hi, jnp.uint32(0)), axis=0,
                 dtype=jnp.uint32)
    occ_total = jnp.sum(occupied)
    return top, lo, hi, occ_total


def _ctz32(x: Array) -> Array:
    """Count trailing zeros of uint32; 32 for x == 0 (popcount of the
    all-ones mask (0 & -0) - 1)."""
    return jax.lax.population_count(
        (x & (jnp.uint32(0) - x)) - jnp.uint32(1)).astype(jnp.int32)


def _first_second_free(lo: Array, hi: Array):
    """(first, second) free slot indices from per-column occupancy
    bitmasks (elementwise; >= 64 means none)."""
    free_lo = ~lo
    free_hi = ~hi
    lo1 = _ctz32(free_lo)
    first = jnp.where(lo1 < 32, lo1, 32 + _ctz32(free_hi))
    free_lo2 = free_lo & (free_lo - jnp.uint32(1))
    free_hi2 = free_hi & (free_hi - jnp.uint32(1))
    lo2 = _ctz32(free_lo2)
    second = jnp.where(
        lo2 < 32, lo2,
        jnp.where(lo1 < 32, 32 + _ctz32(free_hi), 32 + _ctz32(free_hi2)))
    return first, second


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
             cfg: SimConfig, materialize: Array | bool = False,
             interpret: bool | None = None):
    """One incremental step. Returns (state', cache').

    ``materialize`` (traced bool): gather the post-step per-particle
    state (positions, velocities, densities, accelerations) this step —
    the rollout's last step. Steady steps keep the planes authoritative
    and carry one-step-stale particle shadows (see module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dim = cfg.dim
    h = params.smoothing_radius
    g = sb._geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    cap_p = sb._cap_pad(cfg.cell_capacity)
    PL = cap_p * L
    n = state.n
    coeffs = KernelCoeffs.from_radius(h, dim)
    params_vec = sb._param_vector(params, coeffs)
    look = params.lookahead
    planes, addr, origin, ticks = cache
    materialize = jnp.asarray(materialize)

    # --- current particle state: ONE gather from the carried planes
    # (bit-exact plane reads); dropped particles live in the state ---
    was_dropped = addr == PL
    safe = jnp.minimum(addr, PL - 1)
    rows = planes.reshape(2 * dim, -1)[:, safe]           # (2*dim, n)
    dcol = was_dropped[:, None]
    pred_c = jnp.where(dcol, state.predicted, rows[:dim].T)
    vel_c = jnp.where(dcol, state.vel, rows[dim:].T)
    pos_c = jnp.where(dcol, state.pos, pred_c - vel_c * look)

    # --- mover detection + compaction (one sort; dropped always retry) ---
    newcol = _new_columns(pred_c, origin, params, cfg, S_pad)
    oldcol = addr % L - PAD            # dropped: sentinel%L-PAD != any col
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

    # Hole-filling slot pick: rank 0 -> first free slot, rank 1 -> second
    # free slot, rank >= 2 -> above both the column top and the second
    # free slot (cannot collide: first/second are the ONLY free slots
    # <= max(top, second)). New slots are always free-BEFORE-clears, so
    # insert indices never collide with this step's clears
    # (unique_indices stays valid) and vacated slots become next step's
    # first/second free. The free slots come from per-column occupancy
    # BITMASKS computed in the same reduction pass as `top`, then ~10 bit
    # ops on just the mover columns (_first_second_free) — the v2
    # full-plane min reductions here measured 16 ms at the flagship.
    top0, occ_lo, occ_hi, occ_total = _column_state(planes, cap_p)
    col_safe = jnp.where(valid, mk, 0)
    top_at = top0[0, PAD + col_safe].astype(jnp.int32)
    first_free, second_free = _first_second_free(
        occ_lo[PAD + col_safe], occ_hi[PAD + col_safe])
    slot = jnp.where(
        rank == 0, first_free,
        jnp.where(rank == 1, second_free,
                  jnp.maximum(top_at, second_free + 1) + (rank - 2)))
    ok = valid & (slot < cfg.cell_capacity)
    newaddr = jnp.where(ok, slot * L + PAD + (mk * ok), PL)

    # --- combined clear + insert scatter on the flattened planes ---
    OOB = 2 * dim * PL
    oldaddr_m = addr[mid]
    clear_idx = jnp.where(valid & (oldaddr_m < PL), oldaddr_m, OOB)
    rows_m = jnp.concatenate([pred_c, vel_c], axis=1)[mid]   # (M, 2*dim)
    ins_idx = [jnp.where(ok, a * PL + newaddr, OOB)
               for a in range(2 * dim)]
    all_idx = jnp.concatenate([clear_idx] + ins_idx)
    all_val = jnp.concatenate(
        [jnp.full((M,), sb._FAR, jnp.float32)]
        + [rows_m[:, a] for a in range(2 * dim)])
    # Indices are provably unique: old addresses are distinct live slots,
    # new addresses are chosen among slots EMPTY before this step, so
    # clears and inserts can never collide — and the unique_indices hint
    # keeps XLA on the fast ~14 ns/element scatter path
    # (benchmarks/micro2_tpu_results.json).
    flat = planes.reshape(-1).at[all_idx].set(
        all_val, mode="drop", unique_indices=True)
    planes_r = flat.reshape(2 * dim, cap_p, L)
    addr_r = addr.at[jnp.where(valid, mid, n)].set(
        jnp.where(ok, newaddr, PL), mode="drop", unique_indices=True)

    # --- rebuild decision (replaces the reinserted planes wholesale) ---
    # Anchor-drift guard: re-anchor when the frozen origin strays from
    # where a fresh build would put it (min - h) by more than 3/4 cell in
    # any axis (a perf guard — see module docstring).
    mins = jnp.min(pred_c, axis=0)
    drift = jnp.any(jnp.abs(origin - (mins - h)) > 0.75 * h)
    debt = jnp.sum(top0) - occ_total.astype(jnp.float32)
    k = max(cfg.incremental_rebuild, 1)
    rebuild = ((ticks >= k) | (nm > M) | drift
               | (debt > jnp.float32(n // 2)))

    def do_rebuild(_):
        c = build_cache(pred_c, vel_c, params, cfg)
        return c.planes, c.addr, c.origin, jnp.zeros((), jnp.int32)

    def keep_inc(_):
        return planes_r, addr_r, origin, ticks

    planes_r, addr_r, origin, ticks = jax.lax.cond(
        rebuild, do_rebuild, keep_inc, None)

    # --- occupancy gates + SPH passes on the reinserted planes ---
    dropped = addr_r == PL
    overflow = jnp.sum(dropped).astype(jnp.int32)
    top, _ = _top_row(planes_r, cap_p)
    own, m0 = sb.occupancy_bounds(top, g)

    dens = sb._run_density(planes_r, own, m0, params_vec, cfg, interpret)

    # Rescue-corrected per-particle densities: the corrected rows scatter
    # back into the planes for RESIDENTS (so the force kernels read them),
    # but dropped particles have no plane slot — their corrected values
    # must ride out of the cond per particle or the fill value
    # (target_density) would poison their pressures/forces.
    zeros1 = jnp.zeros((n,), jnp.float32)
    den_r = nden_r = zeros1
    rescued = jnp.zeros((n,), bool)
    if cfg.rescue_capacity > 0:
        from .. import rescue as rescue_mod
        small = rescue_mod.small_budget(cfg)

        def with_rescue(budget):
            def fn(dens):
                dflat = jnp.concatenate(
                    [dens[:2].reshape(2, -1),
                     jnp.asarray([params.target_density, DENSITY_PADDING],
                                 dens.dtype)[:, None]], axis=1)
                den, nden = dflat[0, addr_r], dflat[1, addr_r]
                den, nden, resc, unrescued = rescue_mod.density_rescue(
                    pred_c, dropped, den, nden, params, coeffs, cfg,
                    budget=budget)
                # 1-D flat scatter: a 2-D scatter on the (6, PL) view
                # makes XLA pick a features-minor layout whose (8, 128)
                # tiling pads the operand 25x (13.9 GB at the flagship —
                # instant OOM). Dropped rows mask to a true OOB index
                # (addr_r == PL would alias plane k+1's column 0 here).
                vals = sb.derived_density_planes(den, nden, params)
                idx = jnp.concatenate([
                    jnp.where(dropped, 6 * PL, k * PL + addr_r)
                    for k in range(6)])
                flat = dens.reshape(-1).at[idx].set(
                    vals.reshape(-1), mode="drop", unique_indices=True)
                return flat.reshape(dens.shape), den, nden, resc
            return fn

        dens, den_r, nden_r, rescued = jax.lax.cond(
            overflow > 0,
            lambda d: jax.lax.cond(overflow <= small, with_rescue(small),
                                   with_rescue(cfg.rescue_capacity), d),
            lambda d: (d, zeros1, zeros1, jnp.zeros((n,), bool)), dens)

    out_c = sb._run_force(planes_r, dens, own, m0, params_vec, cfg,
                          interpret)

    # --- transient-only: dropped particles' exact forces, in particle
    # order, and the plane-layout patch so residents near them integrate
    # with the corrected accelerations ---
    t_new = state.time + params.dt

    def _overflow_fix(args):
        out_c, = args
        den, nden, acc = sb.gather_results(out_c, addr_r, dropped, params)
        den = jnp.where(rescued, den_r, den)
        nden = jnp.where(rescued, nden_r, nden)
        if cfg.rescue_capacity > 0:
            from .. import rescue as rescue_mod
            small = rescue_mod.small_budget(cfg)
            prs = params.pressure_scalar * (den - params.target_density)
            nprs = params.near_pressure_scalar * nden

            def f_rescue(budget):
                return lambda a: rescue_mod.force_rescue(
                    pred_c, vel_c, den, nden, prs, nprs,
                    dropped, a, params, coeffs, cfg, budget=budget)

            acc = jax.lax.cond(overflow <= small, f_rescue(small),
                               f_rescue(cfg.rescue_capacity), acc)
        # corrected acc back into the plane layout — 1-D flat scatter
        # (see the density-rescue scatter for the 2-D layout hazard)
        idx = jnp.concatenate([
            jnp.where(dropped, (2 + dim) * PL, (2 + a) * PL + addr_r)
            for a in range(dim)])
        out_c = out_c.reshape(-1).at[idx].set(
            acc.T.reshape(-1), mode="drop",
            unique_indices=True).reshape(out_c.shape)
        # dropped particles integrate in particle order
        pos_d, vel_d, pred_d = integrate_mod.integrate(
            pos_c, vel_c, acc, params, t_new)
        return out_c, pos_d, vel_d, pred_d

    zeros_n = jnp.zeros((n, dim), jnp.float32)
    out_c, pos_d, vel_d, pred_d = jax.lax.cond(
        overflow > 0, _overflow_fix,
        lambda args: (args[0], zeros_n, zeros_n, zeros_n), (out_c,))

    # --- integrate IN the plane layout (holes stay _FAR / zero) ---
    occupied = planes_r[0] < 0.5 * sb._FAR
    np_, nv_, npr_ = integrate_mod.integrate_axes(
        [planes_r[a] - planes_r[dim + a] * look for a in range(dim)],
        [planes_r[dim + a] for a in range(dim)],
        [out_c[2 + a] for a in range(dim)], params, t_new)
    newplanes = jnp.stack(
        [jnp.where(occupied, npr_[a], sb._FAR) for a in range(dim)]
        + [jnp.where(occupied, nv_[a], 0.0) for a in range(dim)])
    del np_  # positions re-derive from (predicted, vel); see module doc

    # --- particle shadows: dropped stay current, residents refresh on
    # materialize (the rollout's last step) ---
    def _gather_state(_):
        den, nden, acc = sb.gather_results(out_c, addr_r, dropped, params)
        den = jnp.where(rescued, den_r, den)
        nden = jnp.where(rescued, nden_r, nden)
        rows2 = newplanes.reshape(2 * dim, -1)[
            :, jnp.minimum(addr_r, PL - 1)]
        pred_m = jnp.where(dropped[:, None], pred_d, rows2[:dim].T)
        vel_m = jnp.where(dropped[:, None], vel_d, rows2[dim:].T)
        pos_m = jnp.where(dropped[:, None], pos_d,
                          pred_m - vel_m * look)
        return den, nden, acc, pred_m, vel_m, pos_m

    def _keep_state(_):
        dc = dropped[:, None]
        return (state.density, state.near_density, state.acc,
                jnp.where(dc, pred_d, pred_c),
                jnp.where(dc, vel_d, vel_c),
                jnp.where(dc, pos_d, pos_c))

    den_s, nden_s, acc_s, pred_s, vel_s, pos_s = jax.lax.cond(
        materialize, _gather_state, _keep_state, None)
    prs_s = params.pressure_scalar * (den_s - params.target_density)
    nprs_s = params.near_pressure_scalar * nden_s

    state_out = FluidState(
        pos=pos_s, vel=vel_s, predicted=pred_s, acc=acc_s,
        density=den_s, near_density=nden_s, pressure=prs_s,
        near_pressure=nprs_s,
        step_count=state.step_count + 1, time=t_new,
        overflow=overflow,
        overflow_total=state.overflow_total + overflow.astype(
            jnp.float32),
        ids=state.ids)
    cache_out = BucketCache(planes=newplanes, addr=addr_r, origin=origin,
                            ticks=ticks + 1)
    return state_out, cache_out


def rollout_inc(state: FluidState, params: SimParams, cfg: SimConfig,
                num_steps: int) -> FluidState:
    """num_steps of incremental stepping under lax.scan; the bucket cache
    is built on entry and discarded at exit (callers that chunk their runs
    amortize one rebuild per chunk). Per-particle results are gathered
    into the state on the LAST step only."""
    cache = build_cache(state.predicted, state.vel, params, cfg)

    def body(carry, idx):
        s, c = carry
        s, c = step_inc(s, c, params, cfg,
                        materialize=idx == num_steps - 1)
        return (s, c), None

    (state, _), _ = jax.lax.scan(
        body, (state, cache), jnp.arange(num_steps, dtype=jnp.int32))
    return state
