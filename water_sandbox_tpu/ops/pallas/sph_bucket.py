"""Fused Pallas TPU kernels for the SPH density and force passes.

This is the performance layer — the TPU-native replacement for the
reference's WGSL compute pipeline (assets/simulation.wgsl entry points
update_density :144-195 and update_pressure_force :198-269). Where the GPU
walks sorted hash runs with data-dependent loops, these kernels work on a
slot-major cell-bucket layout (cell columns on the lane axis, bucket slots
on the sublane axis) built directly in the kernels' slab-padded HBM layout.

Design (v2 — shaped by the measured settled-state occupancy of the flagship
scene: per-CELL occupancy is tiny (mean ~2, p90 3) while a handful of
wall-contact cells reach 40+; benchmarks/occupancy_256k_results.json):

* grid = (x-slab, 256-lane chunk): each program owns a (cap, 256) tile of
  cells and manually DMAs a 3-slab halo window (x±1, ±128-lane margin) from
  HBM — three contiguous strided copies per 8-slot block, no gathers;
* all 3^dim neighbor offsets are *static* lane offsets into the VMEM window
  (flat-axis layout: cell (x, y, z) ↦ lane x·S_pad + y·gz + z, so offset
  (ox,oy,oz) is a lane shift of ox·window + oy·gz + oz; spatially-far
  aliases at row boundaries are removed by the per-pair distance filter);
* candidate slots are processed as STATIC 8-row blocks — every load in the
  pair loop is a static slice (Mosaic's dynamic-sublane ops cost ~12
  instructions per vector register; static slices are ~1-2) — gated per
  (neighbor-slab, 8-slot block) on the occupancy bound of that slab-chunk,
  so the few 40-occupant wall cells only inflate the blocks that actually
  contain them, not every chunk in their 3-slab window;
* query slots run as 8-row blocks under a fori loop bounded by the OWN
  chunk's occupancy (not the window max): chunks neighboring a hot cell pay
  extra candidate blocks only, never extra query blocks;
* empty bucket slots hold a far-away position sentinel, so the distance
  filter subsumes the slot-validity mask — no counts plane, no mask plane,
  no per-slot compare in the hot loop.

The two passes are separate pallas_calls so the force pass reads exact
neighbor densities; the force pass also passes the query densities through
to its output so ONE multi-feature gather returns every per-particle result.
"""

from __future__ import annotations

import functools
import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.params import DENSITY_PADDING, KernelCoeffs, SimConfig, SimParams

Array = jax.Array

_FAR = 1.0e15


class Geom(NamedTuple):
    """Slab-padded lane geometry — a PURE function of SimConfig (see
    `_geometry`). Threaded explicitly through every kernel builder and
    body, so tracing two differently-shaped configs interleaved is safe by
    construction (these were trace-time module globals through round 4 —
    VERDICT r4 weak #6). The first 8 fields keep the historical tuple
    order, so `gx, gy, gz, S, S_pad, NYC, PAD, L = _geometry(cfg)[:8]`
    still works for the benchmark harnesses."""
    gx: int
    gy: int
    gz: int
    S: int
    S_pad: int
    NYC: int
    PAD: int
    L: int
    # Lane-tile knobs. Wide scenes use 1024-lane tiles (see _pick_tile):
    # wider tiles cost more pair-slot padding (chunk-max occupancy gates
    # more lanes) but fewer grid programs and fewer per-tile dynamic-lane
    # loads — measured net win at each widening step (512: micro9b; 1024
    # at the cap-16 grid: micro30). Narrow scenes keep 256 to bound slab
    # padding and occupancy-gate width.
    T: int      # lane-chunk width (one grid program per (slab, chunk))
    M: int      # window lane margin; covers the oy/oz reach (needs gz < M)
    CLW: int    # per-slab window width in the VMEM scratch = T + 2*M


def _pick_tile(S: int, override: int = 0) -> int:
    if override:
        return override
    # wide scenes: 1024 re-measured fastest at the cap-16 grid (the old
    # t1024-loses result was a cap-48 artifact): settled flagship 42.96 ms
    # vs 44.63 @512 / 47.38 @256 — fewer grid programs beat the extra
    # pair-slot padding (benchmarks/micro30_waste_results.json)
    return 1024 if S >= 2048 else 256

# scalar-parameter slots (SMEM (1, 16) f32)
_P_H = 0
_P_POW2 = 1
_P_POW2_DER = 2
_P_POW3 = 3
_P_POW3_DER = 4
_P_SPIKEY = 5
_P_PRESSURE = 6
_P_NEAR_PRESSURE = 7
_P_TARGET_DENSITY = 8
_P_VISCOSITY = 9


def _offsets(dim: int):
    return list(itertools.product((-1, 0, 1), repeat=dim))


def _offsets_yz(dim: int, gz: int):
    """The 3^(dim-1) within-slab offsets as flat-axis lane shifts."""
    if dim == 3:
        return [oy * gz + oz
                for oy, oz in itertools.product((-1, 0, 1), repeat=2)]
    return [-1, 0, 1]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _oy_groups(dys, gz):
    """Group flat-lane shifts dy = oy*gz + oz (oz in {-1, 0, 1}) by oy,
    preserving the input order within and across groups — the wide-load
    kernel variants slice the 3 oz shifts from one (…, T + 2) load per oy
    and must process pairs in exactly the narrow path's order so the
    accumulation stays bit-identical. Needs gz >= 3 (oy recovery)."""
    groups = []
    for dy in dys:
        oy = (dy + gz // 2) // gz
        oz = dy - oy * gz
        if groups and groups[-1][0] == oy:
            groups[-1][1].append(oz)
        else:
            groups.append((oy, [oz]))
    return groups


def _cap_pad(cap: int) -> int:
    """Slot rows in the bucket planes, padded to the kernels' static 8-row
    block size. Rows >= cell_capacity are never written (the build drops at
    slot < cap first) and hold the _FAR fill, and the occupancy gates (counts
    clamp at cap) never enable blocks past ceil(cap/8)."""
    return _round_up(cap, 8)


def _geometry(cfg: SimConfig) -> Geom:
    """Slab-padded layout: flat lane l = PAD + x·S_pad + (y·gz + z);
    PAD = S_pad + 2·M dead/halo lanes at each end so (a) every window the
    edge slabs read exists in-bounds and (b) PAD is a multiple of T, which
    lets the kernels' output tiles use plain BlockSpec pipelining."""
    dims = cfg.grid_dims
    gx, gy = dims[0], dims[1]
    gz = dims[2] if cfg.dim == 3 else 1
    S = gy * gz
    T = _pick_tile(S, cfg.tile_override)
    M = T // 2
    CLW = T + 2 * M
    if gz > M - 1:
        raise ValueError(
            f"pallas path needs grid z-dim < {M}; got {gz} — use the "
            "bucket_grid XLA path or a coarser grid")
    S_pad = _round_up(S, T)
    NYC = S_pad // T
    PAD = S_pad + 2 * M
    L = PAD + gx * S_pad + PAD
    return Geom(gx, gy, gz, S, S_pad, NYC, PAD, L, T, M, CLW)


def _scatter_planes(srows: Array, flat: Array, dim: int, cap_p: int,
                    L: int, dtype, mode: str = "cellmajor") -> Array:
    """Scatter the (n, 2·dim) sorted feature rows into the slab-padded
    planes (2·dim, cap_p, L). Position rows fill with _FAR (the kernels'
    distance filter subsumes slot validity), velocity rows with 0. The
    capacity-overflow sentinel in ``flat`` is cap_p·L — one past the end —
    and is dropped by the scatter mode, never written.

    ``mode`` (cfg.build_scatter) picks the scatter shape; outputs are
    bit-identical in every mode (micro41), so flipping the default never
    regenerates goldens. "stack" (the default — re-adopted late r5):
    slot-major per-feature scatters + jnp.stack. "cellmajor" scatters at
    CELL-MAJOR addresses (consecutive sorted particles -> adjacent
    elements) then transposes back to (cap_p, L); it won the full-step
    A/B at the round-4 WORLD-frame layout (40.28 vs 41.34, micro41) but
    LOSES at the round-5 container-frame layout: the transposed planes
    trigger most of the fresh-operand second-launch tax (micro53) —
    full step 33.19 vs 30.32 ms stack (micro54_stack_retest). "windowed"
    scatters all features in ONE feature-LEADING windowed scatter —
    measured much slower (micro36/39: windowed scatters hit a slow
    path).

    unique_indices caveat: real addresses are unique, but the overflow
    sentinel can repeat across every overflowing particle, technically
    violating the uniqueness promise. All duplicates target the same extra
    element that [:-1]/mode="drop" discards, so any write order yields the
    same kept planes — verified bit-identical across all three modes
    including duplicate sentinels (micro41). The promise is kept for the
    kernels' correctness claim ("exact" refers to in-bounds addressing,
    not uniqueness under overflow)."""
    nf = srows.shape[1]
    if mode == "windowed":
        fills = jnp.asarray([_FAR] * dim + [0.0] * (nf - dim), dtype)
        init = jnp.broadcast_to(fills[:, None], (nf, cap_p * L))
        return init.at[:, flat].set(
            srows.T, mode="drop",
            unique_indices=True).reshape(nf, cap_p, L)

    if mode == "cellmajor":
        # cell-major address: consecutive sorted particles write
        # consecutive elements (same cell -> adjacent slots, next cell ->
        # next cap_p block) — 6 per-feature scatters at LOCAL addresses
        # beat the production slot-major shape by ~1.2 ms in-scan
        # (micro39: 15.53 vs 16.73; the one-scatter features-minor variant
        # loses 2x — windowed scatters hit a slow path). The transpose back
        # to the kernels' (cap_p, L) layout is included in that win. The
        # overflow sentinel cap_p·L maps to the buffer's extra element
        # (in bounds, dropped by [:-1]), so promise_in_bounds is exact.
        # Sentinels break monotonicity, so no indices_are_sorted claim.
        flat2 = jnp.where(flat == cap_p * L, L * cap_p,
                          (flat % L) * cap_p + flat // L)

        def scatter_cm(vals, fill):
            out = jnp.full((L * cap_p + 1,), fill, dtype)
            return out.at[flat2].set(
                vals, mode="promise_in_bounds",
                unique_indices=True)[:-1].reshape(L, cap_p).T

        return jnp.stack([scatter_cm(srows[:, j], _FAR if j < dim else 0.0)
                          for j in range(nf)])

    if mode == "fused":
        # 2·dim scatters into DISJOINT feature regions of ONE flat buffer
        # — the jnp.stack copy never materializes. MEASURED KILL
        # (micro55): the chained same-operand scatters serialize worse
        # than they save — full step 33.45 vs 30.30 ms stack, probe 18.99
        # vs 15.60. Kept (bit-identical, CPU-asserted incl. overflow) so
        # the A/B stays reproducible. The overflow sentinel remaps to the
        # single extra element PAST all regions (a sentinel left at
        # cap_p·L would land inside feature j+1's region).
        PL = cap_p * L
        out = jnp.concatenate(
            [jnp.full((PL,), _FAR if j < dim else 0.0, dtype)
             for j in range(nf)] + [jnp.zeros((1,), dtype)])
        dropped = flat == PL
        for j in range(nf):
            addr = jnp.where(dropped, nf * PL, j * PL + flat)
            out = out.at[addr].set(srows[:, j], mode="promise_in_bounds",
                                   unique_indices=True)
        return out[:-1].reshape(nf, cap_p, L)

    barrier = mode == "stack_barrier"

    def scatter(vals, fill):
        out = jnp.full((cap_p * L + 1,), fill, dtype)
        if barrier:
            # keep the fill a standalone (memset-fast) op: the fused
            # fill+scatter loop writes the 21.6 MB fill at scatter-loop
            # speed — the micro57 trace-guided A/B
            out = jax.lax.optimization_barrier(out)
        return out.at[flat].set(
            vals, mode="promise_in_bounds",
            unique_indices=True)[:-1].reshape(cap_p, L)

    return jnp.stack([scatter(srows[:, j], _FAR if j < dim else 0.0)
                      for j in range(nf)])


def _build_core(predicted: Array, vel: Array, params, cfg: SimConfig,
                carry: Array | None = None, origin: Array | None = None,
                time: Array | None = None):
    """Shared bucket-build core scattering DIRECTLY into the slab-padded
    kernel layout — no relayout copies between the build and the kernels.

    ``carry`` appends (n, k) f32 columns that ride the sorted row gather but
    are NOT scattered into planes (the sorted-state step carries pos +
    bitcast ids this way); ``origin`` pins the grid anchor instead of
    deriving it from the data (the incremental step must keep the anchor
    frozen between rebuilds so cell keys stay comparable).

    Cost-shaped by the measured v5e irregular-op tax
    (benchmarks/micro_tpu_results.json: gathers cost ~13ns per INDEX with
    multi-feature windows nearly free, scatters ~14ns per ELEMENT, so the op
    count is minimized): ONE lax.sort carries the permutation alongside the
    keys, ONE (n, 2·dim + k)-row gather reorders all particle features, and
    2·dim scalar scatters place the feature planes. Empty position slots
    hold _FAR so the kernels' distance filter subsumes slot validity; the
    per-cell occupancy `counts` row only feeds the occupancy bounds.

    Returns (planes (2·dim, cap, L): pos then vel, counts (1, L) f32,
    flat (n,) each SORTED row's plane address — cap·L for capacity-overflow
    rows — order (n,) the sort permutation, srows (n, 2·dim + k) the sorted
    feature+carry rows, overflow ())."""
    from .. import hashing

    n, dim = predicted.shape
    h = params.smoothing_radius
    dims = cfg.grid_dims
    cap = cfg.cell_capacity
    g = _geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    dtype = predicted.dtype

    kpred = hashing.key_coords(predicted, params, cfg, time)
    if origin is None:
        origin = hashing.grid_origin(kpred, h)
    cell = jnp.floor((kpred - origin) / h).astype(jnp.int32)
    cell = jnp.clip(cell, 0, jnp.asarray(dims, jnp.int32) - 1)
    r = cell[:, 1]
    if dim == 3:
        r = r * gz + cell[:, 2]
    col = cell[:, 0] * S_pad + r                       # slab-strided column

    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_col, order = jax.lax.sort((col, iota), num_keys=1)
    ranks = iota
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_col[1:] != sorted_col[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, ranks, 0))
    slot = ranks - run_start
    cap_p = _cap_pad(cap)
    ok = slot < cap
    flat = jnp.where(ok, slot * L + PAD + sorted_col, cap_p * L)

    feats = [predicted, vel] + ([carry] if carry is not None else [])
    rows = jnp.concatenate(feats, axis=1)              # (n, 2·dim [+ k])
    srows = jnp.take(rows, order, axis=0)              # ONE gather

    planes = _scatter_planes(srows[:, :2 * dim], flat, dim, cap_p, L,
                             dtype, mode=cfg.build_scatter)

    # occupied-slot counts derived from the position plane (occupied slots
    # hold real positions, empty ones _FAR) — a cheap streaming reduction
    # instead of a scatter-add's ~2 ms fixed + ~14 ns/element tax. Dropped
    # particles are absent from the planes, so this is intrinsically
    # capacity-clamped (the gated block loops must not overrun cap).
    counts = jnp.sum(jnp.where(planes[0] < _FAR * 0.5, 1.0, 0.0),
                     axis=0, dtype=dtype)[None, :]

    overflow = (n - jnp.sum(ok)).astype(jnp.int32)
    return planes, counts, flat, order, srows, overflow


def _build_slab_buckets(predicted: Array, vel: Array, params, cfg: SimConfig,
                        origin: Array | None = None,
                        time: Array | None = None):
    """Particle-order bucket build (see _build_core): inverts the sort
    permutation so ``addr`` maps PARTICLE i to its plane address — one
    (n,) int32 scatter (~5 ms at 256k; the sorted-state path skips it).

    Returns (planes, counts (1, L), addr (n,) — cap·L for capacity-overflow
    particles — and overflow ())."""
    n = predicted.shape[0]
    planes, counts, flat, order, _, overflow = _build_core(
        predicted, vel, params, cfg, origin=origin, time=time)
    addr = jnp.zeros((n,), jnp.int32).at[order].set(flat, unique_indices=True)
    return planes, counts, addr, overflow


def build_local_slab_buckets(pred: Array, vel: Array, active: Array,
                             origin: Array, gx_loc: int, my_dev,
                             params, cfg_loc: SimConfig):
    """Per-device bucket build for the domain-decomposed step: like
    _build_slab_buckets but over the device's local slab range of the global
    grid (cells outside clamp to the boundary slab — stragglers between
    migrations; the distance filter keeps their included pairs exact) and
    with inactive slots dropped.

    The slab-padded layout leaves PAD dead lanes at each end; the domain
    step writes the ppermuted neighbor boundary slabs into the S_pad-aligned
    positions just inside the pads, and the kernels' halo windows then read
    them with no layout changes (parallel/domain.py)."""
    n, dim = pred.shape
    h = params.smoothing_radius
    cap = cfg_loc.cell_capacity
    g = _geometry(cfg_loc)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    dtype = pred.dtype

    cell = jnp.floor((pred - origin) / h).astype(jnp.int32)
    # clamp y/z into the global grid, x into the local slab range
    cell_x = jnp.clip(cell[:, 0] - my_dev * gx_loc, 0, gx_loc - 1)
    r = jnp.clip(cell[:, 1], 0, gy - 1)
    if dim == 3:
        r = r * gz + jnp.clip(cell[:, 2], 0, gz - 1)
    col = cell_x * S_pad + r

    iota = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(active > 0, col, gx_loc * S_pad)  # inactive sort last
    sorted_key, order = jax.lax.sort((key, iota), num_keys=1)
    sorted_active = sorted_key < gx_loc * S_pad
    ranks = iota
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, ranks, 0))
    slot = ranks - run_start
    cap_p = _cap_pad(cap)
    ok = (slot < cap) & sorted_active
    flat = jnp.where(ok, slot * L + PAD + sorted_key, cap_p * L)

    rows = jnp.concatenate([pred, vel], axis=1)
    srows = jnp.take(rows, order, axis=0)

    planes = _scatter_planes(srows[:, :2 * dim], flat, dim, cap_p, L,
                             dtype, mode=cfg_loc.build_scatter)

    # derived occupied-slot counts — see _build_slab_buckets. The domain
    # step re-derives these from the halo-EXCHANGED planes (free halo
    # counts, no separate counts ppermute); this return covers callers
    # that want local-only counts.
    counts = jnp.sum(jnp.where(planes[0] < _FAR * 0.5, 1.0, 0.0),
                     axis=0, dtype=dtype)[None, :]

    addr = jnp.zeros((n,), jnp.int32).at[order].set(flat, unique_indices=True)
    overflow = (jnp.sum(active) - jnp.sum(ok)).astype(jnp.int32)
    return planes, counts, addr, overflow


def occupancy_bounds(counts: Array, g: Geom) -> tuple[Array, Array]:
    """Occupancy bounds for the gated kernels, from the per-cell counts row.

    Returns (own, m0):
    * own (gx, NYC) int32 — max occupancy over exactly the chunk's own
      lanes. Bounds the QUERY block loop (rows the chunk itself holds).
    * m0 (gx+2, NYC) int32 — per (slab, chunk) max occupancy over the
      chunk's lanes ±(gz+1) margin, rows 0 / gx+1 covering the PAD regions
      (all-zero single-chip; the domain step ppermutes halo counts there).
      Bounds the CANDIDATE blocks per neighbor-slab: a query chunk's true
      candidates in slab x+ox lie within ±(gz+1) lanes of its own range.
      Aliased reads beyond that (flat-axis row wrap) are always distance-
      masked, so they need no occupancy cover.
    """
    gx, S_pad, NYC, PAD, gz, T = g.gx, g.S_pad, g.NYC, g.PAD, g.gz, g.T
    mg = gz + 1
    own = counts[0, PAD:PAD + gx * S_pad].reshape(gx, NYC, T).max(axis=-1)

    # chunk block-max, then the ±mg margin via the neighboring chunks' edge
    # maxes (margins clamp at slab-row ends, like cells do) — three (gx+2,
    # NYC) maxes instead of NYC overlapping row slices
    blk = counts[0, PAD - S_pad:PAD + (gx + 1) * S_pad].reshape(
        gx + 2, NYC, T)
    bmax = blk.max(axis=-1)
    ledge = blk[:, :, :mg].max(axis=-1)     # first mg lanes of each chunk
    redge = blk[:, :, T - mg:].max(axis=-1)
    zero = jnp.zeros_like(bmax[:, :1])
    prev = jnp.concatenate([zero, redge[:, :-1]], axis=1)
    nxt = jnp.concatenate([ledge[:, 1:], zero], axis=1)
    m0 = jnp.maximum(bmax, jnp.maximum(prev, nxt))
    return (jnp.ceil(own).astype(jnp.int32),
            jnp.ceil(m0).astype(jnp.int32))


def _window_dma(refs, scratches, sems, own_ref, m0_ref, *, cap, g,
                dma_prefetch=True, slabs=(0, 1, 2)):
    """Halo-window copies into the parity-doubled VMEM scratch: per (slab
    c, 8-slot block b), gated on that slab-chunk's occupancy bound — empty
    blocks (the common case at per-cell occupancy ~2) move no bytes.
    refs/scratches are parallel lists (the force pass windows two HBM
    arrays); scratches carry a leading parity dim of 2. ``slabs`` restricts
    which window slabs are copied (the symmetric force pass never reads
    slab x-1 — those pairs arrive as slab x-1's candidate writes).

    With ``dma_prefetch`` (cfg.dma_prefetch, default), the window for grid
    step s+1 is issued
    DURING step s's compute (TPU grid steps run sequentially): each step
    waits for its own window (started one step earlier), then immediately
    starts the next step's copies into the other parity buffer before any
    pair math runs. This hides the window-DMA latency — measured in-scan,
    the passes are ~2x their pipelined standalone rate, i.e. roughly half
    of every settled step was exposed DMA wait (benchmarks/micro23 vs
    micro14/28). Semaphores need no parity dim: a slot's signal is always
    consumed (wait for step s) before the same slot is re-armed (issue for
    s+1). Returns the parity index selecting this step's scratch buffer."""
    S_pad, NYC, gx, T, M, CLW = g.S_pad, g.NYC, g.gx, g.T, g.M, g.CLW
    i = pl.program_id(0)
    yc = pl.program_id(1)

    def copies(ii, jj, pp, action):
        own = own_ref[ii, jj]
        for c in slabs:
            occ_c = m0_ref[ii + c, jj]
            start = M + (ii + c) * S_pad + jj * T
            for b in range(cap // 8):
                @pl.when((own > 0) & (occ_c > 8 * b))
                def _(c=c, b=b, start=start):
                    for k, (ref, scr) in enumerate(zip(refs, scratches)):
                        cp = pltpu.make_async_copy(
                            ref.at[:, pl.ds(8 * b, 8), pl.ds(start, CLW)],
                            scr.at[pp, :, pl.ds(8 * b, 8),
                                   pl.ds(c * CLW, CLW)],
                            sems.at[c, b, k],
                        )
                        cp.start() if action == "start" else cp.wait()

    if not dma_prefetch:
        copies(i, yc, 0, "start")
        copies(i, yc, 0, "wait")
        return 0

    s = i * NYC + yc
    par = jax.lax.rem(s, 2)

    @pl.when(s == 0)
    def _prologue():
        copies(i, yc, par, "start")     # par == 0 on step 0

    copies(i, yc, par, "wait")

    @pl.when(s < gx * NYC - 1)
    def _issue_next():
        wrap = yc == NYC - 1
        i2 = jnp.where(wrap, i + 1, i)
        yc2 = jnp.where(wrap, 0, yc + 1)
        copies(i2, yc2, 1 - par, "start")

    return par


# candidate-gating knobs, picked by measurement on the settled flagship
# (benchmarks/micro6_gating.py): structure "slab" nests the within-slab
# offsets INSIDE each gated region (3 slab loops outer), "off" puts every
# neighbor offset outside (27 regions per block like the reference's
# neighborhood walk); block = gated-region row granularity. "qrow" flips
# the axes: the query loop runs per REAL query slot (fori to occ_own, mean
# ~2.7 — not 8-slot blocks) while each vector op covers all `block`
# candidate slots of a gated block as one (block, T) tile, sublane-reduced
# per query row — ~3x fewer vector op-sets at settled occupancy with the
# same branch count as ("slab", 8).
# "qrow2"/"qrow3" are op-trimmed qrow variants (see _force_kernel); qrow3
# additionally shares one wide load per (block, oy) across the 3 oz shifts.
# measured on the settled flagship (benchmarks/micro6_gating_results.json,
# micro6b_results.json, micro9_force_results.json): density slab8 10.8 ms
# (qrow 13.3, off4 18.7); force qrow3 70.2 ms == qrow2 70.4 < qrow 75.5
# < off4 72.1* < slab8 118.9 < slab1 134.3 (*different session).
# "qsym" (_force_sym_kernel) evaluates each pair ONCE (Newton's 3rd law):
# 17.9 ms vs qrow3's 39.5 on the settled flagship at the coverage-fixed
# grid (benchmarks/micro14_qsym_results.json) — the single-chip default.
# The domain-decomposed path pins qrow3 (parallel/domain.py: halo
# candidate-writes would be lost at device boundaries).
_DENSITY_GATE = ("slab", 8)
_FORCE_GATE = ("qsym", 8)


def _gated_slot_loops(occs, do_rows, *, dim, cap, gz, g, struct, block):
    """Emit the gated candidate-slot loops: do_rows(rows) runs inside each
    pl.when region with rows = [(slot, window-lane-start, is_center), ...].
    Regions are gated on the slab-chunk occupancy bound `occs[c] > b0` —
    rows past the bound cost nothing; within a block, rows past it are
    _FAR-masked work."""
    M, CLW = g.M, g.CLW
    if struct == "slab":
        for c in range(3):
            base = c * CLW + M
            for b0 in range(0, cap, block):
                @pl.when(occs[c] > b0)
                def _blk(c=c, b0=b0, base=base):
                    do_rows([(b0 + rr, base + dy, c == 1 and dy == 0)
                             for rr in range(block)
                             for dy in _offsets_yz(dim, gz)])
    else:
        for off in _offsets(dim):
            ox = off[0]
            dy = off[1] * gz + (off[2] if dim == 3 else 0)
            cs = (ox + 1) * CLW + M + dy
            ic = all(o == 0 for o in off)
            for b0 in range(0, cap, block):
                @pl.when(occs[ox + 1] > b0)
                def _blk(b0=b0, cs=cs, ic=ic):
                    do_rows([(b0 + rr, cs, ic) for rr in range(block)])


def _density_kernel(own_ref, m0_ref, params_ref, feats_ref, out_ref,
                    scr2, acc_scr, sems, *, dim, cap, g, gate,
                    dma_prefetch):
    if gate[0] == "grid0":
        # floor probe: completely empty body — measures the grid machinery
        # + whatever output movement the out_specs imply, nothing else
        return
    gz, T, M, CLW = g.gz, g.T, g.M, g.CLW
    i = pl.program_id(0)
    yc = pl.program_id(1)
    occ_own = own_ref[i, yc]
    occs = [m0_ref[i, yc], m0_ref[i + 1, yc], m0_ref[i + 2, yc]]

    par = _window_dma([feats_ref], [scr2], sems, own_ref, m0_ref,
                      cap=cap, g=g, dma_prefetch=dma_prefetch)
    scratch = scr2.at[par]
    if gate[0] == "dma0":
        # floor probe: grid + occupancy-gated window DMA, no compute/writes
        return

    @pl.when(occ_own > 0)
    def _run():
        h = params_ref[0, _P_H]
        pow2 = params_ref[0, _P_POW2]
        pow3 = params_ref[0, _P_POW3]
        target = params_ref[0, _P_TARGET_DENSITY]
        pa = params_ref[0, _P_PRESSURE] * 0.5
        pb = -params_ref[0, _P_PRESSURE] * target * 0.5
        npa = params_ref[0, _P_NEAR_PRESSURE] * 0.5
        qs = CLW + M                 # window-local start of own cells

        # "f"-suffixed gates (e.g. "slabf") fold the kernel-derivative
        # constants into the reciprocal planes; careful: "off" is a base
        # gate name, not a fold variant
        fold = gate[0].endswith("f") and gate[0] != "off"
        pow2_der = params_ref[0, _P_POW2_DER]
        pow3_der = params_ref[0, _P_POW3_DER]

        def write_out(sl, den, nden):
            # 6-plane output: den, nden, EOS half-pressures and
            # reciprocals precomputed ONCE per particle here so the force
            # pass pays no per-pair divides (its hot loop runs ~27x per
            # particle) — den >= DENSITY_PADDING > 0 so both are safe.
            # "f"-suffixed gates fold the kernel-derivative constants into
            # the reciprocal planes (plane4 = pow2_der/den, plane5 =
            # pow3_der/nden), which drops two per-pair multiplies from the
            # force pass ("qrow6"); the query-side 1/rho_self factor is
            # recovered there with one per-ROW multiply by 1/pow2_der.
            out_ref[0, sl, :] = den
            out_ref[1, sl, :] = nden
            out_ref[2, sl, :] = pa * den + pb
            out_ref[3, sl, :] = npa * nden
            if fold:
                out_ref[4, sl, :] = pow2_der / den
                out_ref[5, sl, :] = pow3_der / nden
            else:
                out_ref[4, sl, :] = 1.0 / den
                out_ref[5, sl, :] = 1.0 / nden

        if gate[0] == "noop":
            # diagnostic: window DMA + output writes with the pair math
            # stubbed out — isolates the non-math floor of the pass
            def q_body(qb, _):
                q0 = pl.multiple_of(qb * 8, 8)
                qpos = scratch[0, pl.ds(q0, 8), pl.ds(qs, T)]
                write_out(pl.ds(q0, 8), qpos, qpos)
                return 0

            jax.lax.fori_loop(0, (occ_own + 7) // 8, q_body, 0)
            return

        if gate[0] == "qrow":
            def q_body(q, _):
                qsl = pl.ds(q, 1)
                qpos = [scratch[a, qsl, pl.ds(qs, T)] for a in range(dim)]
                acc_scr[0] = jnp.zeros((8, T), jnp.float32)
                acc_scr[1] = jnp.zeros((8, T), jnp.float32)

                for c in range(3):
                    base = c * CLW + M
                    for b0 in range(0, cap, 8):
                        @pl.when(occs[c] > b0)
                        def _blk(c=c, b0=b0, base=base):
                            den = acc_scr[0]
                            nden = acc_scr[1]
                            for dy in _offsets_yz(dim, gz):
                                dist2 = jnp.zeros((8, T), jnp.float32)
                                for a in range(dim):
                                    d_a = (scratch[a, pl.ds(b0, 8),
                                                   pl.ds(base + dy, T)]
                                           - qpos[a])
                                    dist2 = dist2 + d_a * d_a
                                v = jnp.maximum(h - jnp.sqrt(dist2), 0.0)
                                v2 = v * v
                                den = den + v2 * pow2
                                nden = nden + v2 * v * pow3
                            acc_scr[0] = den
                            acc_scr[1] = nden

                write_out(
                    qsl,
                    jnp.sum(acc_scr[0], axis=0, keepdims=True)
                    + DENSITY_PADDING,
                    jnp.sum(acc_scr[1], axis=0, keepdims=True)
                    + DENSITY_PADDING)
                return 0

            jax.lax.fori_loop(0, occ_own, q_body, 0)
            return

        if gate[0] == "slabw" and dim == 3 and gz >= 3:
            # "slab" with ONE wide (T + 2) load per (row, oy) and the 3 oz
            # shifts sliced from registers (the qrow3 trick): 3x fewer
            # candidate loads, same dys in the same order -> bit-identical
            # to ("slab", block).
            block = gate[1]

            def q_body(qb, _):
                q0 = pl.multiple_of(qb * 8, 8)
                qpos = [scratch[a, pl.ds(q0, 8), pl.ds(qs, T)]
                        for a in range(dim)]
                acc_scr[0] = jnp.zeros((8, T), jnp.float32)
                acc_scr[1] = jnp.zeros((8, T), jnp.float32)

                for c in range(3):
                    base = c * CLW + M
                    for b0 in range(0, cap, block):
                        @pl.when(occs[c] > b0)
                        def _blk(c=c, b0=b0, base=base):
                            den = acc_scr[0]
                            nden = acc_scr[1]
                            for rr in range(block):
                                s = b0 + rr
                                for oy in (-1, 0, 1):
                                    w = [scratch[a, s,
                                                 pl.ds(base + oy * gz - 1,
                                                       T + 2)]
                                         for a in range(dim)]
                                    for sl in (0, 1, 2):
                                        dist2 = jnp.zeros((8, T),
                                                          jnp.float32)
                                        for a in range(dim):
                                            d_a = (w[a][sl:sl + T][None, :]
                                                   - qpos[a])
                                            dist2 = dist2 + d_a * d_a
                                        v = jnp.maximum(
                                            h - jnp.sqrt(dist2), 0.0)
                                        v2 = v * v
                                        den = den + v2 * pow2
                                        nden = nden + v2 * v * pow3
                            acc_scr[0] = den
                            acc_scr[1] = nden

                write_out(pl.ds(q0, 8), acc_scr[0] + DENSITY_PADDING,
                          acc_scr[1] + DENSITY_PADDING)
                return 0

            jax.lax.fori_loop(0, (occ_own + 7) // 8, q_body, 0)
            return

        def q_body(qb, _):
            q0 = pl.multiple_of(qb * 8, 8)
            qpos = [scratch[a, pl.ds(q0, 8), pl.ds(qs, T)]
                    for a in range(dim)]
            # accumulate in a VMEM scratch under pl.when gates: lax.cond
            # with (8, T) carries makes Mosaic shuffle the accumulators
            # through every skipped branch; pl.when has no carries, so the
            # accumulators RMW through VMEM per gated region
            acc_scr[0] = jnp.zeros((8, T), jnp.float32)
            acc_scr[1] = jnp.zeros((8, T), jnp.float32)

            def do_rows(rows):
                den = acc_scr[0]
                nden = acc_scr[1]
                for s, cs, _ in rows:
                    dist2 = jnp.zeros((8, T), jnp.float32)
                    for a in range(dim):
                        d_a = (scratch[a, s, pl.ds(cs, T)][None, :]
                               - qpos[a])
                        dist2 = dist2 + d_a * d_a
                    # empty slots hold _FAR -> v clamps to 0: the distance
                    # filter IS the validity mask. Self-interaction
                    # included, like the reference walk (wgsl:162-183)
                    v = jnp.maximum(h - jnp.sqrt(dist2), 0.0)
                    v2 = v * v
                    den = den + v2 * pow2
                    nden = nden + v2 * v * pow3
                acc_scr[0] = den
                acc_scr[1] = nden

            struct = gate[0][:-1] if fold else gate[0]
            if struct == "slabw":   # 2-D / tiny-gz fallback: plain slab
                struct = "slab"
            _gated_slot_loops(occs, do_rows, dim=dim, cap=cap, gz=gz, g=g,
                              struct=struct, block=gate[1])

            write_out(pl.ds(q0, 8), acc_scr[0] + DENSITY_PADDING,
                      acc_scr[1] + DENSITY_PADDING)
            return 0

        jax.lax.fori_loop(0, (occ_own + 7) // 8, q_body, 0)


def _force_kernel(own_ref, m0_ref, params_ref, feats_ref, dens_ref, out_ref,
                  scr2, dscr2, acc_scr, sems, *, dim, cap, g, gate,
                  dma_prefetch):
    if gate[0] == "grid0":
        # floor probe (micro49/51): completely empty body under the
        # DEFAULT (parallel) grid semantics — the counterpart of the qsym
        # "+grid0" probe, isolating whether the empty-body machinery cost
        # is qsym-class-specific (scratch, arbitrary semantics) or
        # context-level
        return
    gz, T, M, CLW = g.gz, g.T, g.M, g.CLW
    i = pl.program_id(0)
    yc = pl.program_id(1)
    occ_own = own_ref[i, yc]
    occs = [m0_ref[i, yc], m0_ref[i + 1, yc], m0_ref[i + 2, yc]]

    par = _window_dma([feats_ref, dens_ref], [scr2, dscr2], sems,
                      own_ref, m0_ref, cap=cap, g=g,
                      dma_prefetch=dma_prefetch)
    scratch = scr2.at[par]
    dscratch = dscr2.at[par]

    @pl.when(occ_own > 0)
    def _run():
        h = params_ref[0, _P_H]
        h2 = h * h
        pow2_der = params_ref[0, _P_POW2_DER]
        pow3_der = params_ref[0, _P_POW3_DER]
        spikey_visc = (params_ref[0, _P_SPIKEY]
                       * params_ref[0, _P_VISCOSITY])
        qs = CLW + M

        if gate[0] == "noop":
            def q_body(qb, _):
                q0 = pl.multiple_of(qb * 8, 8)
                qden = dscratch[0, pl.ds(q0, 8), pl.ds(qs, T)]
                qpos = scratch[0, pl.ds(q0, 8), pl.ds(qs, T)]
                out_ref[0, pl.ds(q0, 8), :] = qden
                out_ref[1, pl.ds(q0, 8), :] = qden
                for a in range(dim):
                    out_ref[2 + a, pl.ds(q0, 8), :] = qpos
                return 0

            jax.lax.fori_loop(0, (occ_own + 7) // 8, q_body, 0)
            return

        if gate[0] in ("qrow2", "qrow3", "qrow4", "qrow5", "qrow6",
                       "qdiag1", "qdiag2"):
            # op-trimmed qrow (micro9): displacements from the dist2 loop
            # are reused for the force direction (no candidate re-loads),
            # inv = rsqrt(max(dist2, tiny)) replaces the double-where (the
            # only d == 0 cases are the self pair — slot-masked — and
            # coincident distinct particles, handled by the center tile's
            # +y fallback), 1/d is folded into the pressure scale so the
            # per-axis update is one fma, and the d == 0 fallback runs on
            # the center tile only (coincident particles share a cell).
            # "qrow3" additionally loads ONE (8, T+2) tile per (block, oy)
            # and slices the three oz variants from registers.
            # "qrow4"/"qrow5" explicitly broadcast the (1, T) query context
            # to (8, T) once per q (qrow5 also shares oy loads) — probes
            # whether Mosaic re-materializes sublane broadcasts per op.
            # "qdiag1"/"qdiag2" are WRONG-PHYSICS diagnostics (measure
            # only): qdiag1 processes a single dy offset (1/9 the tiles,
            # tests linearity in tile count), qdiag2 drops the viscosity +
            # near-pressure arithmetic (tests arithmetic- vs overhead-
            # bound).
            # "qrow6" = qrow3 + folded derived planes: the density pass
            # ("slabf" gate) stores plane4 = pow2_der/den, plane5 =
            # pow3_der/nden, dropping two per-pair multiplies here; the
            # query-side 1/rho_self is recovered with one per-ROW multiply
            # by 1/pow2_der, and the two kernel terms contract via Horner
            # (v*(a + v*b)) — ~3 fewer VPU ops on the ~39-op pair body.
            shared_oy = gate[0] in ("qrow3", "qrow5", "qrow6") and dim == 3
            bcast = gate[0] in ("qrow4", "qrow5")
            fold = gate[0] == "qrow6"
            diag1 = gate[0] == "qdiag1"
            diag2 = gate[0] == "qdiag2"
            inv_pow2_der = 1.0 / pow2_der

            def q_body(q, _):
                qsl = pl.ds(q, 1)
                qpos = [scratch[a, qsl, pl.ds(qs, T)] for a in range(dim)]
                qvel = [scratch[dim + a, qsl, pl.ds(qs, T)]
                        for a in range(dim)]
                qden = dscratch[0, qsl, pl.ds(qs, T)]
                qnden = dscratch[1, qsl, pl.ds(qs, T)]
                qprs = dscratch[2, qsl, pl.ds(qs, T)]
                qnprs = dscratch[3, qsl, pl.ds(qs, T)]
                qden_inv = dscratch[4, qsl, pl.ds(qs, T)]
                if fold:
                    qden_inv = qden_inv * inv_pow2_der
                out_ref[0, qsl, :] = qden
                out_ref[1, qsl, :] = qnden
                if bcast:
                    qpos = [jnp.broadcast_to(p, (8, T)) for p in qpos]
                    qvel = [jnp.broadcast_to(v, (8, T)) for v in qvel]
                    qprs = jnp.broadcast_to(qprs, (8, T))
                    qnprs = jnp.broadcast_to(qnprs, (8, T))
                    qden_inv = jnp.broadcast_to(qden_inv, (8, T))
                for a in range(dim):
                    acc_scr[a] = jnp.zeros((8, T), jnp.float32)

                def pair_tile(cand, dsc, is_center, force, slot_ids):
                    d = [cand[a] - qpos[a] for a in range(dim)]
                    dist2 = d[0] * d[0]
                    for a in range(1, dim):
                        dist2 = dist2 + d[a] * d[a]
                    sel = dist2 <= h2
                    if is_center:
                        sel = sel & (slot_ids != q)
                    inv = jax.lax.rsqrt(jnp.maximum(dist2, 1e-30))
                    v = dist2 * inv - h
                    shared_p = qprs + dsc[0]
                    if diag2:
                        scale = jnp.where(sel, qden_inv * (
                            shared_p * (v * pow2_der) * dsc[2]), 0.0)
                        scale_i = scale * inv
                        for a in range(dim):
                            force[a] = force[a] + d[a] * scale_i
                        return
                    shared_np = qnprs + dsc[1]
                    if fold:
                        scale = jnp.where(sel, (qden_inv * v) * (
                            shared_p * dsc[2]
                            + v * (shared_np * dsc[3])), 0.0)
                    else:
                        scale = jnp.where(sel, qden_inv * (
                            shared_p * (v * pow2_der) * dsc[2]
                            + shared_np * ((v * v) * pow3_der) * dsc[3]),
                            0.0)
                    scale_i = scale * inv
                    hv = h2 - jnp.minimum(dist2, h2)
                    w_visc = (hv * hv * hv) * spikey_visc
                    for a in range(dim):
                        f = (force[a] + d[a] * scale_i
                             + (cand[dim + a] - qvel[a]) * w_visc)
                        if is_center and a == 1:
                            # +y fallback at d == 0 (wgsl:243-248)
                            zero_dist = (dist2 == 0.0).astype(jnp.float32)
                            f = f + zero_dist * scale
                        force[a] = f

                for c in range(3):
                    base = c * CLW + M
                    for b0 in range(0, cap, 8):
                        @pl.when(occs[c] > b0)
                        def _blk(c=c, b0=b0, base=base):
                            bsl = pl.ds(b0, 8)
                            slot_ids = b0 + jax.lax.broadcasted_iota(
                                jnp.int32, (8, 1), 0)
                            force = [acc_scr[a] for a in range(dim)]
                            if shared_oy:
                                for oy in (-1, 0, 1):
                                    w0 = base + oy * gz - 1
                                    w = [scratch[a, bsl, pl.ds(w0, T + 2)]
                                         for a in range(2 * dim)]
                                    dw = [dscratch[k, bsl,
                                                   pl.ds(w0, T + 2)]
                                          for k in (2, 3, 4, 5)]
                                    for oz in (0, 1, 2):
                                        pair_tile(
                                            [t[:, oz:oz + T] for t in w],
                                            [t[:, oz:oz + T] for t in dw],
                                            c == 1 and oy == 0 and oz == 1,
                                            force, slot_ids)
                            else:
                                dys = [0] if diag1 else _offsets_yz(dim, gz)
                                for dy in dys:
                                    cs = pl.ds(base + dy, T)
                                    pair_tile(
                                        [scratch[a, bsl, cs]
                                         for a in range(2 * dim)],
                                        [dscratch[k, bsl, cs]
                                         for k in (2, 3, 4, 5)],
                                        c == 1 and dy == 0,
                                        force, slot_ids)
                            for a in range(dim):
                                acc_scr[a] = force[a]

                for a in range(dim):
                    out_ref[2 + a, qsl, :] = jnp.sum(
                        acc_scr[a], axis=0, keepdims=True)
                return 0

            jax.lax.fori_loop(0, occ_own, q_body, 0)
            return

        if gate[0] == "qrow":
            def q_body(q, _):
                qsl = pl.ds(q, 1)
                qpos = [scratch[a, qsl, pl.ds(qs, T)] for a in range(dim)]
                qvel = [scratch[dim + a, qsl, pl.ds(qs, T)]
                        for a in range(dim)]
                qden = dscratch[0, qsl, pl.ds(qs, T)]
                qnden = dscratch[1, qsl, pl.ds(qs, T)]
                # EOS half-pressures + reciprocal precomputed by the
                # density pass (planes 2-5) — no per-pair divides here
                qprs = dscratch[2, qsl, pl.ds(qs, T)]
                qnprs = dscratch[3, qsl, pl.ds(qs, T)]
                qden_inv = dscratch[4, qsl, pl.ds(qs, T)]
                out_ref[0, qsl, :] = qden       # den passthrough
                out_ref[1, qsl, :] = qnden      # nden passthrough
                for a in range(dim):
                    acc_scr[a] = jnp.zeros((8, T), jnp.float32)

                for c in range(3):
                    base = c * CLW + M
                    for b0 in range(0, cap, 8):
                        @pl.when(occs[c] > b0)
                        def _blk(c=c, b0=b0, base=base):
                            bsl = pl.ds(b0, 8)
                            slot_ids = b0 + jax.lax.broadcasted_iota(
                                jnp.int32, (8, 1), 0)
                            force = [acc_scr[a] for a in range(dim)]
                            for dy in _offsets_yz(dim, gz):
                                cs = pl.ds(base + dy, T)
                                dist2 = jnp.zeros((8, T), jnp.float32)
                                for a in range(dim):
                                    d_a = scratch[a, bsl, cs] - qpos[a]
                                    dist2 = dist2 + d_a * d_a
                                sel = dist2 <= h2
                                if c == 1 and dy == 0:
                                    # self pair lives at (slot q, same
                                    # lane) of the center tile
                                    sel = sel & (slot_ids != q)
                                inv = jnp.where(
                                    dist2 > 0.0,
                                    jax.lax.rsqrt(jnp.where(
                                        dist2 > 0.0, dist2, 1.0)), 0.0)
                                dc2 = jnp.minimum(dist2, h2)
                                dc = jnp.minimum(dc2 * inv, h)
                                zero_dist = (dist2 == 0.0).astype(
                                    jnp.float32)
                                shared_p = qprs + dscratch[2, bsl, cs]
                                shared_np = qnprs + dscratch[3, bsl, cs]
                                v = dc - h
                                scale = jnp.where(sel, qden_inv * (
                                    shared_p * (v * pow2_der)
                                    * dscratch[4, bsl, cs]
                                    + shared_np * (v * v * pow3_der)
                                    * dscratch[5, bsl, cs]), 0.0)
                                # no viscosity mask: far pairs have
                                # dc2 == h2 exactly -> hv = 0; the self
                                # pair has dvel = 0
                                hv = h2 - dc2
                                w_visc = (hv * hv * hv) * spikey_visc
                                for a in range(dim):
                                    dir_a = (scratch[a, bsl, cs]
                                             - qpos[a]) * inv
                                    if a == 1:
                                        dir_a = dir_a + zero_dist
                                    vel_n = scratch[dim + a, bsl, cs]
                                    force[a] = (force[a] + dir_a * scale
                                                + (vel_n - qvel[a])
                                                * w_visc)
                            for a in range(dim):
                                acc_scr[a] = force[a]

                for a in range(dim):
                    out_ref[2 + a, qsl, :] = jnp.sum(
                        acc_scr[a], axis=0, keepdims=True)
                return 0

            jax.lax.fori_loop(0, occ_own, q_body, 0)
            return

        def q_body(qb, _):
            q0 = pl.multiple_of(qb * 8, 8)
            qden = dscratch[0, pl.ds(q0, 8), pl.ds(qs, T)]
            qnden = dscratch[1, pl.ds(q0, 8), pl.ds(qs, T)]
            # acc = F_pressure/rho_self + mu*F_visc: both per-query factors
            # (1/rho_self into the pressure scale, mu into the viscosity
            # weight) are folded into the per-pair terms so ONE accumulator
            # set carries the whole acceleration. Query context is HOISTED
            # out of the gated regions: measured (micro6 r3) hoisted
            # ("slab", 8) = 74.5 ms vs 118.5 with per-region VMEM re-loads.
            qprs = dscratch[2, pl.ds(q0, 8), pl.ds(qs, T)]
            qnprs = dscratch[3, pl.ds(q0, 8), pl.ds(qs, T)]
            qden_inv = dscratch[4, pl.ds(q0, 8), pl.ds(qs, T)]
            qpos = [scratch[a, pl.ds(q0, 8), pl.ds(qs, T)]
                    for a in range(dim)]
            qvel = [scratch[dim + a, pl.ds(q0, 8), pl.ds(qs, T)]
                    for a in range(dim)]
            out_ref[0, pl.ds(q0, 8), :] = qden      # den passthrough
            out_ref[1, pl.ds(q0, 8), :] = qnden     # nden passthrough

            for a in range(dim):
                acc_scr[a] = jnp.zeros((8, T), jnp.float32)

            def do_rows(rows):
                row_ids = q0 + jax.lax.broadcasted_iota(
                    jnp.int32, (8, 1), 0)
                force = [acc_scr[a] for a in range(dim)]
                for s, cs, is_center in rows:
                    dist2 = jnp.zeros((8, T), jnp.float32)
                    for a in range(dim):
                        d_a = (scratch[a, s, pl.ds(cs, T)][None, :]
                               - qpos[a])
                        dist2 = dist2 + d_a * d_a
                    sel = dist2 <= h2
                    if is_center:
                        # skip the self pair (wgsl:231-233)
                        sel = sel & (row_ids != s)

                    # dist via rsqrt; guard d == 0 (inv, dist -> 0)
                    inv = jnp.where(
                        dist2 > 0.0,
                        jax.lax.rsqrt(
                            jnp.where(dist2 > 0.0, dist2, 1.0)), 0.0)
                    dc2 = jnp.minimum(dist2, h2)
                    dc = jnp.minimum(dc2 * inv, h)
                    zero_dist = (dist2 == 0.0).astype(jnp.float32)

                    # EOS half-pressures/reciprocals precomputed by the
                    # density pass (planes 2-5). SELECT, not mask-multiply:
                    # rows above a chunk's occupancy hold unwritten garbage
                    # (possibly NaN), always distance-masked — but
                    # 0 * NaN = NaN, where() discards it
                    shared_p = qprs + dscratch[2, s, pl.ds(cs, T)][None, :]
                    shared_np = (qnprs
                                 + dscratch[3, s, pl.ds(cs, T)][None, :])
                    v = dc - h
                    scale = jnp.where(sel, qden_inv * (
                        shared_p * (v * pow2_der)
                        * dscratch[4, s, pl.ds(cs, T)][None, :]
                        + shared_np * (v * v * pow3_der)
                        * dscratch[5, s, pl.ds(cs, T)][None, :]), 0.0)
                    # no viscosity mask: far pairs have dc2 == h2 exactly
                    # -> hv = 0; the self pair has dvel = 0
                    hv = h2 - dc2
                    w_visc = (hv * hv * hv) * spikey_visc

                    for a in range(dim):
                        dir_a = (scratch[a, s, pl.ds(cs, T)][None, :]
                                 - qpos[a]) * inv
                        if a == 1:
                            # +y fallback at d == 0 (wgsl:243-248)
                            dir_a = dir_a + zero_dist
                        vel_n = scratch[dim + a, s, pl.ds(cs, T)][None, :]
                        force[a] = (force[a] + dir_a * scale
                                    + (vel_n - qvel[a]) * w_visc)
                for a in range(dim):
                    acc_scr[a] = force[a]

            _gated_slot_loops(occs, do_rows, dim=dim, cap=cap, gz=gz, g=g,
                              struct=gate[0], block=gate[1])

            for a in range(dim):
                out_ref[2 + a, pl.ds(q0, 8), :] = acc_scr[a]
            return 0

        jax.lax.fori_loop(0, (occ_own + 7) // 8, q_body, 0)


def _force_sym_kernel(own_ref, m0_ref, params_ref, feats_ref, dens_ref,
                      out_ref, scr2, dscr2, acc_scr, sameb, nextb,
                      sems, *, dim, cap, g, sym=True,
                      sym_same=True, sym_next=True, wide=False, probe=None,
                      dma_prefetch=True, flush_gated=True):
    """Newton's-third-law force pass ("qsym"): every unordered pair is
    evaluated ONCE and its force applied to BOTH particles.

    The per-pair acceleration splits into an antisymmetric part (the
    pressure term carries 1/(rho_i·rho_j) — symmetric scalar times the
    antisymmetric direction — and viscosity carries (v_j - v_i)·w(d)) plus
    the near-pressure term whose density factor is 1/(rho_i·nrho_j): the
    candidate side re-scales the shared work with the mirrored reciprocals
    (two extra multiplies), so the full mirrored evaluation (~39 VPU ops)
    is never repeated. Processed offsets: the 3^(dim-1) of slab x+1, the
    strictly-positive within-slab shifts of the own slab, and the center
    tile restricted to candidate slot > query slot.

    Candidate-side accumulations cross chunk/slab boundaries. Instead of
    privatized HBM spill buffers + an XLA fold pass, the kernel exploits
    the TPU grid's SEQUENTIAL execution ("arbitrary" dimension semantics)
    and keeps two persistent VMEM accumulators across grid steps:

    * ``sameb`` (dim, NYC, cap, T+256): per-chunk blocks of the own slab.
      Chunk yc's within-slab writes (dy in (0, gz+1]) land entirely in
      block yc (the 128-lane block margins absorb the reach); the part
      spilling past the chunk's lanes is read back by chunk yc+1 — the
      NEXT grid step — via the block-margin overlap.
    * ``nextb`` (2, dim, NYC, cap, T+256): same block layout for slab
      x+1 contributions, ping-ponged by slab parity — partition (i+1)%2
      accumulates while partition i%2 (filled during slab i-1) is read
      into this slab's output tiles and re-zeroed for slab i+1.

    Writes beyond the real grid rows (flat-lane aliases at slab-row ends)
    carry distance-masked zeros and land in the S_pad-S dead lanes, so
    they add nothing. Each block is zeroed immediately after its LAST
    reader (step yc+1), keeping the buffers clean across slab transitions
    with no extra passes."""
    if probe == "grid0":
        # floor probe: completely empty body — measures the grid machinery
        # + whatever output movement the out_specs imply, nothing else
        return
    gz, NYC, T, M, CLW = g.gz, g.NYC, g.T, g.M, g.CLW
    i = pl.program_id(0)
    yc = pl.program_id(1)
    occ_own = own_ref[i, yc]
    occs = [m0_ref[i, yc], m0_ref[i + 1, yc], m0_ref[i + 2, yc]]
    W = T + 256
    wpar = (i + 1) % 2
    rpar = i % 2

    @pl.when((i == 0) & (yc == 0))
    def _init():
        for a in range(dim):
            sameb[a] = jnp.zeros((NYC, cap, W), jnp.float32)
            nextb[0, a] = jnp.zeros((NYC, cap, W), jnp.float32)
            nextb[1, a] = jnp.zeros((NYC, cap, W), jnp.float32)

    slabs = (1, 2) if (sym and sym_next) else (0, 1, 2)
    par = _window_dma([feats_ref, dens_ref], [scr2, dscr2], sems,
                      own_ref, m0_ref, cap=cap, g=g,
                      dma_prefetch=dma_prefetch, slabs=slabs)
    scratch = scr2.at[par]
    dscratch = dscr2.at[par]
    if probe == "dma0":
        # floor probe: grid + occupancy-gated window DMA, no compute/writes
        return

    # acc output tiles must be fully defined even for empty chunks (the
    # flush below may add neighbor-chunk contributions to any row)
    for a in range(dim):
        out_ref[2 + a] = jnp.zeros((cap, T), jnp.float32)

    @pl.when(occ_own > 0)
    def _run():
        h = params_ref[0, _P_H]
        h2 = h * h
        pow2_der = params_ref[0, _P_POW2_DER]
        pow3_der = params_ref[0, _P_POW3_DER]
        spikey_visc = (params_ref[0, _P_SPIKEY]
                       * params_ref[0, _P_VISCOSITY])
        qs = CLW + M

        def q_body(q, _):
            qsl = pl.ds(q, 1)
            qpos = [scratch[a, qsl, pl.ds(qs, T)] for a in range(dim)]
            qvel = [scratch[dim + a, qsl, pl.ds(qs, T)]
                    for a in range(dim)]
            qden = dscratch[0, qsl, pl.ds(qs, T)]
            qnden = dscratch[1, qsl, pl.ds(qs, T)]
            qprs = dscratch[2, qsl, pl.ds(qs, T)]
            qnprs = dscratch[3, qsl, pl.ds(qs, T)]
            qden_inv = dscratch[4, qsl, pl.ds(qs, T)]
            qnden_inv = dscratch[5, qsl, pl.ds(qs, T)]
            out_ref[0, qsl, :] = qden
            out_ref[1, qsl, :] = qnden
            for a in range(dim):
                acc_scr[a] = jnp.zeros((8, T), jnp.float32)

            def pair_tile(cand, dsc, mode, force, slot_ids, cbuf, b0, dy):
                """mode: 0 normal, 1 center (slot>q + d==0 fallback)."""
                d = [cand[a] - qpos[a] for a in range(dim)]
                dist2 = d[0] * d[0]
                for a in range(1, dim):
                    dist2 = dist2 + d[a] * d[a]
                sel = dist2 <= h2
                if mode == 1:
                    sel = sel & ((slot_ids > q) if (sym and sym_same)
                                 else (slot_ids != q))
                inv = jax.lax.rsqrt(jnp.maximum(dist2, 1e-30))
                v = dist2 * inv - h
                shared_p = qprs + dsc[0]
                shared_np = qnprs + dsc[1]
                u = shared_p * (v * pow2_der)
                t_np = shared_np * ((v * v) * pow3_der)
                # scale_i = (1/rho_i)(u/rho_j + t_np/nrho_j);
                # scale_j mirrors the reciprocals; the pressure part
                # (1/rho_i)(1/rho_j)·u is bit-identical in both.
                scale_i = jnp.where(sel, qden_inv * (
                    u * dsc[2] + t_np * dsc[3]), 0.0)
                scale_j = jnp.where(sel, dsc[2] * (
                    u * qden_inv + t_np * qnden_inv), 0.0)
                si = scale_i * inv
                sj = scale_j * inv
                hv = h2 - jnp.minimum(dist2, h2)
                w_visc = (hv * hv * hv) * spikey_visc
                if mode == 1:
                    # the center tile's sel excludes slot <= q pairs that
                    # ARE in range (the mirrored halves) — unlike the
                    # plain kernel (where only the dvel=0 self pair is
                    # masked), viscosity must honor the mask here or
                    # every same-cell pair's viscosity double-counts
                    w_visc = jnp.where(sel, w_visc, 0.0)
                    zero_dist = (dist2 == 0.0).astype(jnp.float32)
                for a in range(dim):
                    dv = cand[dim + a] - qvel[a]
                    fq = d[a] * si + dv * w_visc
                    fc = -(d[a] * sj) - dv * w_visc
                    if mode == 1 and a == 1:
                        # +y fallback at d == 0 (wgsl:243-248): BOTH
                        # coincident particles get pushed +y with their
                        # own scale (the reference evaluates each side
                        # independently)
                        fq = fq + zero_dist * scale_i
                        fc = fc + zero_dist * scale_j
                    force[a] = force[a] + fq
                    if cbuf is not None:
                        lane = pl.ds(128 + dy, T)
                        cbuf[a][pl.ds(b0, 8), lane] = (
                            cbuf[a][pl.ds(b0, 8), lane] + fc)

            slab_list = [1, 2] if (sym and sym_next) else [0, 1, 2]
            for c in slab_list:
                base = c * CLW + M
                dys = _offsets_yz(dim, gz)
                cbuf = None
                if sym and c == 1 and sym_same:
                    # own slab: center (slot>q) + strictly-positive shifts
                    dys = [0] + sorted(dy for dy in dys if dy > 0)
                    cbuf = [sameb.at[a, yc] for a in range(dim)]
                elif sym and c == 2 and sym_next:
                    cbuf = [nextb.at[wpar, a, yc] for a in range(dim)]
                for b0 in range(0, cap, 8):
                    @pl.when(occs[c] > b0)
                    def _blk(c=c, b0=b0, base=base, dys=dys, cbuf=cbuf):
                        bsl = pl.ds(b0, 8)
                        slot_ids = b0 + jax.lax.broadcasted_iota(
                            jnp.int32, (8, 1), 0)
                        force = [acc_scr[a] for a in range(dim)]
                        if wide and dim == 3:
                            # ONE (8, T+2) load per (block, oy) plane,
                            # the 3 oz variants sliced from registers —
                            # the qrow3 trick (micro9) applied to qsym.
                            # Same dys in the same order as the narrow
                            # path, so the accumulation is BIT-IDENTICAL.
                            for oy, ozs in _oy_groups(dys, gz):
                                w0 = pl.ds(base + oy * gz - 1, T + 2)
                                w = [scratch[a, bsl, w0]
                                     for a in range(2 * dim)]
                                dw = [dscratch[k, bsl, w0]
                                      for k in (2, 3, 4, 5)]
                                for oz in ozs:
                                    dy = oy * gz + oz
                                    sl = oz + 1
                                    pair_tile(
                                        [t[:, sl:sl + T] for t in w],
                                        [t[:, sl:sl + T] for t in dw],
                                        1 if (c == 1 and dy == 0) else 0,
                                        force, slot_ids, cbuf, b0, dy)
                        else:
                            for dy in dys:
                                w0 = pl.ds(base + dy, T)
                                pair_tile(
                                    [scratch[a, bsl, w0]
                                     for a in range(2 * dim)],
                                    [dscratch[k, bsl, w0]
                                     for k in (2, 3, 4, 5)],
                                    1 if (c == 1 and dy == 0) else 0,
                                    force, slot_ids, cbuf, b0, dy)
                        for a in range(dim):
                            acc_scr[a] = force[a]

            for a in range(dim):
                out_ref[2 + a, qsl, :] = jnp.sum(
                    acc_scr[a], axis=0, keepdims=True)
            return 0

        jax.lax.fori_loop(0, occ_own, q_body, 0)

    if not sym:
        return

    # ---- flush: own tile += candidate contributions (always, even for
    # empty chunks — neighbors may have written into our lanes). Every
    # writer into block column b of sameb[·, b] / the nextb partition read
    # here was gated on the SAME prefetched bound m0[i+1, b] (own-slab
    # writers use occs[1] at slab i, the x+1 writers occs[2] at slab i-1 —
    # both resolve to m0_ref[i+1, b]), so slot blocks at or above that
    # bound are bit-exactly zero: skipping their adds and re-zero stores
    # changes nothing (x + 0.0 == x for every written value) and drops
    # ~cap/8-1 of the (8, W) tile ops per chunk at settled occupancy. ----
    def _gated_blocks(bound, do_block):
        if not flush_gated:        # A/B knob (cfg.flush_gated, micro27)
            for b0 in range(0, cap, 8):
                do_block(b0)
            return
        for b0 in range(0, cap, 8):
            @pl.when(bound > b0)
            def _(b0=b0):
                do_block(b0)

    def _flush_own(b0):
        bsl = pl.ds(b0, 8)
        for a in range(dim):
            add = (sameb[a, yc, bsl, pl.ds(128, T)]
                   + nextb[rpar, a, yc, bsl, pl.ds(128, T)])
            out_ref[2 + a, bsl, :] = out_ref[2 + a, bsl, :] + add

    _gated_blocks(m0_ref[i + 1, yc], _flush_own)

    @pl.when(yc > 0)
    def _left_margins():
        prev = jnp.maximum(yc - 1, 0)

        def _do(b0):
            bsl = pl.ds(b0, 8)
            for a in range(dim):
                add = (sameb[a, prev, bsl, pl.ds(128 + T, 128)]
                       + nextb[rpar, a, prev, bsl, pl.ds(128 + T, 128)])
                out_ref[2 + a, bsl, pl.ds(0, 128)] = (
                    out_ref[2 + a, bsl, pl.ds(0, 128)] + add)
            # block yc-1's last reader is this step: re-zero for reuse
            for a in range(dim):
                sameb[a, prev, bsl, :] = jnp.zeros((8, W), jnp.float32)
                nextb[rpar, a, prev, bsl, :] = jnp.zeros(
                    (8, W), jnp.float32)

        _gated_blocks(m0_ref[i + 1, prev], _do)

    @pl.when(yc < NYC - 1)
    def _right_margin():
        nxt = jnp.minimum(yc + 1, NYC - 1)

        def _do(b0):
            bsl = pl.ds(b0, 8)
            for a in range(dim):
                out_ref[2 + a, bsl, pl.ds(T - 128, 128)] = (
                    out_ref[2 + a, bsl, pl.ds(T - 128, 128)]
                    + nextb[rpar, a, nxt, bsl, pl.ds(0, 128)])

        _gated_blocks(m0_ref[i + 1, nxt], _do)

    @pl.when(yc == NYC - 1)
    def _zero_last():
        def _do(b0):
            bsl = pl.ds(b0, 8)
            for a in range(dim):
                sameb[a, NYC - 1, bsl, :] = jnp.zeros((8, W), jnp.float32)
                nextb[rpar, a, NYC - 1, bsl, :] = jnp.zeros(
                    (8, W), jnp.float32)

        _gated_blocks(m0_ref[i + 1, NYC - 1], _do)


def _param_vector(params: SimParams, coeffs: KernelCoeffs) -> Array:
    v = jnp.zeros((1, 16), jnp.float32)
    v = v.at[0, _P_H].set(params.smoothing_radius)
    v = v.at[0, _P_POW2].set(coeffs.pow2)
    v = v.at[0, _P_POW2_DER].set(coeffs.pow2_der)
    v = v.at[0, _P_POW3].set(coeffs.pow3)
    v = v.at[0, _P_POW3_DER].set(coeffs.pow3_der)
    v = v.at[0, _P_SPIKEY].set(coeffs.spikey_pow3)
    v = v.at[0, _P_PRESSURE].set(params.pressure_scalar)
    v = v.at[0, _P_NEAR_PRESSURE].set(params.near_pressure_scalar)
    v = v.at[0, _P_TARGET_DENSITY].set(params.target_density)
    v = v.at[0, _P_VISCOSITY].set(params.viscosity_strength)
    return v


def derived_density_planes(den, nden, params: SimParams):
    """Rows for all 6 density-output planes from corrected (den, nden):
    (den, nden, EOS half-pressure, near half-pressure, 1/den, 1/nden) —
    the same derivation the density kernel's write_out performs, used by
    the rescue paths to keep planes 2-5 consistent after they scatter
    corrected densities back into the planes (den/nden >= DENSITY_PADDING
    so the reciprocals are safe)."""
    pa = 0.5 * params.pressure_scalar
    pb = -pa * params.target_density
    npa = 0.5 * params.near_pressure_scalar
    return jnp.stack([den, nden, pa * den + pb, npa * nden,
                      1.0 / den, 1.0 / nden])


def _run_density(planes, own, m0, params_vec, cfg, interpret, gate=None,
                 out_planes=6, out_any=False):
    """``out_planes``/``out_any`` are FLOOR-PROBE knobs (benchmarks only,
    zero-bound runs): shrink the auto-pipelined output window, or park the
    output in HBM with no per-step window movement at all — they bisect the
    zero-work floor into grid machinery vs output-pipeline cost."""
    g = _geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    T, CLW = g.T, g.CLW
    dim, cap = cfg.dim, _cap_pad(cfg.cell_capacity)
    NB = cap // 8
    body = functools.partial(_density_kernel, dim=dim, cap=cap, g=g,
                             gate=gate or cfg.density_gate or _DENSITY_GATE,
                             dma_prefetch=cfg.dma_prefetch)
    if out_any:
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        out_spec = pl.BlockSpec(
            (out_planes, cap, T),
            lambda i, yc, *_: (0, 0, (NYC + 1) + i * NYC + yc),
            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gx, NYC),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i, yc, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, dim, cap, 3 * CLW), jnp.float32),
            pltpu.VMEM((2, 8, T), jnp.float32),
            pltpu.SemaphoreType.DMA((3, NB, 1)),
        ],
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_planes, cap, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(own, m0, params_vec, planes[:dim])


def _run_force(planes, dens, own, m0, params_vec, cfg, interpret, gate=None,
               out_any=False):
    """``out_any`` is a FLOOR-PROBE knob (benchmarks only): park the output
    in HBM with no auto-pipelined window movement (pairs with the "+grid0"
    / "+dma0" gate suffixes, which stub the kernel body)."""
    g = _geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    T, CLW = g.T, g.CLW
    dim, cap = cfg.dim, _cap_pad(cfg.cell_capacity)
    NB = cap // 8
    gate = gate or cfg.force_gate or _FORCE_GATE
    g0, probe = gate[0], None
    if "+" in g0:   # e.g. ("qsym+grid0", 8): probe suffix on a base gate
        g0, probe = g0.split("+", 1)
    sym = g0 in ("qsym", "qsymw", "qsym0", "qsym1", "qsym2")
    if sym:
        if gz + 1 > 128:
            raise ValueError(
                f"qsym force pass needs grid z-dim <= 127 (candidate-write "
                f"block margins are 128 lanes); got {gz}")
        body = functools.partial(_force_sym_kernel, dim=dim, cap=cap,
                                 g=g,
                                 sym=g0 != "qsym0",
                                 sym_same=g0 in ("qsym", "qsymw", "qsym1"),
                                 sym_next=g0 in ("qsym", "qsymw", "qsym2"),
                                 wide=g0 == "qsymw" and gz >= 3,
                                 probe=probe,
                                 dma_prefetch=cfg.dma_prefetch,
                                 flush_gated=cfg.flush_gated)
        extra_scratch = [
            pltpu.VMEM((dim, NYC, cap, T + 256), jnp.float32),
            pltpu.VMEM((2, dim, NYC, cap, T + 256), jnp.float32),
        ]
        semantics = ("arbitrary", "arbitrary")
    else:
        body = functools.partial(_force_kernel, dim=dim, cap=cap, g=g,
                                 gate=(g0, gate[1]),
                                 dma_prefetch=cfg.dma_prefetch)
        extra_scratch = []
        semantics = None
    if out_any:
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        out_spec = pl.BlockSpec(
            (2 + dim, cap, T),
            lambda i, yc, *_: (0, 0, (NYC + 1) + i * NYC + yc),
            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gx, NYC),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i, yc, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, 2 * dim, cap, 3 * CLW), jnp.float32),
            pltpu.VMEM((2, 6, cap, 3 * CLW), jnp.float32),
            pltpu.VMEM((dim, 8, T), jnp.float32),
        ] + extra_scratch + [
            pltpu.SemaphoreType.DMA((3, NB, 2)),
        ],
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2 + dim, cap, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            **({"dimension_semantics": semantics} if semantics else {})),
        interpret=interpret,
    )(own, m0, params_vec, planes, dens)


def gather_results(out_c: Array, addr: Array, dropped: Array, params):
    """ONE multi-feature gather brings all results back to particle order:
    gather cost on v5e is per-index (~13ns), nearly independent of the
    (F, 1) window width (benchmarks/micro2_tpu_results.json) — the force
    kernel passes den/nden through so den+nden+acc ride a single gather.
    Dropped particles (sentinel addr) read a clamped row and get fill
    values via a select — appending a fills column would copy the whole
    (2+dim, cap·L) result array."""
    dim = out_c.shape[0] - 2
    safe = jnp.minimum(addr, out_c.shape[1] * out_c.shape[2] - 1)
    out = out_c.reshape(2 + dim, -1)[:, safe]        # (2+dim, n)
    den = jnp.where(dropped, params.target_density, out[0])
    nden = jnp.where(dropped, DENSITY_PADDING, out[1])
    acc = jnp.where(dropped[:, None], 0.0, out[2:].T)
    return den, nden, acc


def bucket_sph(predicted: Array, vel: Array, params: SimParams,
               coeffs: KernelCoeffs, cfg: SimConfig,
               interpret: bool | None = None,
               time: Array | None = None):
    """Pallas-accelerated bucket SPH: same contract as ops.grid.bucket_sph —
    per-particle (den, nden, prs, nprs, acc, overflow).

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere (so
    neighbor_mode='pallas' stays usable — if slow — on CPU)."""
    g = _geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]

    planes, counts, addr, overflow = _build_slab_buckets(
        predicted, vel, params, cfg, time=time)
    own, m0 = occupancy_bounds(counts, g)
    dropped = addr == _cap_pad(cfg.cell_capacity) * L

    den, nden, prs, nprs, acc, unrescued, _ = sph_passes(
        planes, own, m0, addr, dropped, overflow, predicted, vel,
        params, coeffs, cfg, interpret)
    return den, nden, prs, nprs, acc, unrescued


def bucket_sph_sorted(pos: Array, vel: Array, predicted: Array, ids: Array,
                      params: SimParams, coeffs: KernelCoeffs,
                      cfg: SimConfig, interpret: bool | None = None,
                      time: Array | None = None):
    """``bucket_sph`` for the sorted-state step (cfg.sorted_state): all
    per-particle results come back in THIS step's bucket (cell-sorted) order
    together with the same-order (pos, vel, ids) rows, instead of being
    inverted back to the caller's order — which skips the (n,) addr
    inversion scatter the particle-order path pays (~5 ms at 256k on v5e,
    benchmarks/micro2_tpu_results.json). Particle identity rides ``ids``:
    row r of every output belongs to particle ids[r].

    pos and ids travel as extra carry columns of the build's single
    multi-feature row gather (ids bitcast int32→f32 — gathers are
    bit-preserving data movement, and multi-feature windows are ~free at
    the per-index gather cost), so no second gather is paid.

    Returns (den, nden, prs, nprs, acc, unrescued, s_pos, s_vel, s_ids),
    everything in sorted order."""
    g = _geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    dim = cfg.dim

    ids_f = jax.lax.bitcast_convert_type(ids, jnp.float32)[:, None]
    carry = jnp.concatenate([pos, ids_f], axis=1)
    planes, counts, flat, _, srows, overflow = _build_core(
        predicted, vel, params, cfg, carry=carry, time=time)
    own, m0 = occupancy_bounds(counts, g)
    dropped = flat == _cap_pad(cfg.cell_capacity) * L

    s_pred = srows[:, :dim]
    s_vel = srows[:, dim:2 * dim]
    s_pos = srows[:, 2 * dim:3 * dim]
    s_ids = jax.lax.bitcast_convert_type(srows[:, 3 * dim], jnp.int32)

    den, nden, prs, nprs, acc, unrescued, _ = sph_passes(
        planes, own, m0, flat, dropped, overflow, s_pred, s_vel,
        params, coeffs, cfg, interpret)
    return den, nden, prs, nprs, acc, unrescued, s_pos, s_vel, s_ids


def sph_passes(planes: Array, own: Array, m0: Array, addr: Array,
               dropped: Array, overflow: Array, predicted: Array,
               vel: Array, params: SimParams, coeffs: KernelCoeffs,
               cfg: SimConfig, interpret: bool | None = None):
    """Density + rescue + force + gather-back on pre-built bucket planes.

    Shared by ``bucket_sph`` (planes rebuilt every step) and the
    incremental step (planes maintained in place,
    ops/pallas/incremental.py). ``planes`` may carry extra feature rows
    after the 2·dim the kernels read. Returns
    (den, nden, prs, nprs, acc, unrescued, out_c) — out_c is the force
    kernel's plane-layout output (den/nden passthrough + acc planes), which
    the incremental step integrates in place."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dim = cfg.dim
    cap = cfg.cell_capacity
    g = _geometry(cfg)
    gx, gy, gz, S, S_pad, NYC, PAD, L = g[:8]
    n = predicted.shape[0]
    params_vec = _param_vector(params, coeffs)

    dens = _run_density(planes, own, m0, params_vec, cfg, interpret)

    if cfg.rescue_capacity > 0:
        # exact overflow rescue (ops/rescue.py): correct densities BEFORE
        # the force pass. All of it — including the per-particle density
        # gather it needs — runs under the overflow cond, so overflow-free
        # steps (the steady state) pay nothing.
        from .. import rescue as rescue_mod

        small = rescue_mod.small_budget(cfg)

        def with_rescue(budget):
            def fn(dens):
                dflat = jnp.concatenate(
                    [dens[:2].reshape(2, -1),
                     jnp.asarray([params.target_density, DENSITY_PADDING],
                                 dens.dtype)[:, None]], axis=1)
                den, nden = dflat[0, addr], dflat[1, addr]
                den, nden, rescued, unrescued = rescue_mod.density_rescue(
                    predicted, dropped, den, nden, params, coeffs, cfg,
                    budget=budget)
                # scatter the corrected rows into ALL 6 planes so the
                # force pass reads pressures/reciprocals consistent with
                # the corrected densities (sentinel addr is OOB -> drop)
                flat = dens.reshape(6, -1)
                flat = flat.at[:, addr].set(
                    derived_density_planes(den, nden, params), mode="drop")
                return (flat.reshape(dens.shape), den, nden,
                        rescued, unrescued)
            return fn

        def no_rescue(dens):
            zeros = jnp.zeros((n,), dens.dtype)
            return dens, zeros, zeros, jnp.zeros((n,), bool), overflow

        dens, den_r, nden_r, rescued, unrescued = jax.lax.cond(
            overflow > 0,
            lambda d: jax.lax.cond(overflow <= small, with_rescue(small),
                                   with_rescue(cfg.rescue_capacity), d),
            no_rescue, dens)
    else:
        rescued = None
        unrescued = overflow

    out_c = _run_force(planes[:2 * dim], dens, own, m0, params_vec, cfg,
                       interpret)

    den, nden, acc = gather_results(out_c, addr, dropped, params)

    if rescued is not None:
        den = jnp.where(rescued, den_r, den)
        nden = jnp.where(rescued, nden_r, nden)
        prs = params.pressure_scalar * (den - params.target_density)
        nprs = params.near_pressure_scalar * nden

        def f_rescue(budget):
            return lambda a: rescue_mod.force_rescue(
                predicted, vel, den, nden, prs, nprs, dropped, a, params,
                coeffs, cfg, budget=budget)

        small = rescue_mod.small_budget(cfg)
        acc = jax.lax.cond(
            overflow > 0,
            lambda a: jax.lax.cond(overflow <= small, f_rescue(small),
                                   f_rescue(cfg.rescue_capacity), a),
            lambda a: a, acc)
        return den, nden, prs, nprs, acc, unrescued, out_c

    prs = params.pressure_scalar * (den - params.target_density)
    nprs = params.near_pressure_scalar * nden
    return den, nden, prs, nprs, acc, overflow, out_c
