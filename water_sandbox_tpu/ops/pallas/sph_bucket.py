"""Fused Pallas TPU kernels for the SPH density and force passes.

This is the performance layer — the TPU-native replacement for the
reference's WGSL compute pipeline (assets/simulation.wgsl entry points
update_density :144-195 and update_pressure_force :198-269). Where the GPU
walks sorted hash runs with data-dependent loops, these kernels work on the
slot-major cell-bucket layout built by ops.grid.build_bucket_grid:

* the flat cell axis is laid out in x-slabs padded to a 128-lane stride
  (S_pad), so every DMA window offset is tiling-aligned by construction
  (Mosaic requires provably 128-divisible dynamic lane offsets);
* each program owns one x-slab and manually DMAs a 3-slab halo window
  (x-1, x, x+1, each with a 128-cell margin) from HBM into VMEM — three
  contiguous strided copies, no per-row gathers;
* all 3^dim neighbor offsets become *static* slices of the VMEM window
  (the flat-offset trick of ops.grid._roll_shifts; spatially-far aliases at
  row wrap are removed by the per-pair distance filter);
* pair math runs as dense masked (C × S_pad) blocks with a fori loop over
  the candidate slot, keeping temporaries small and the lane dimension
  (cells) wide.

The two passes are separate pallas_calls so the force pass reads exact
neighbor densities without recomputing halo densities.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.params import DENSITY_PADDING, KernelCoeffs, SimConfig, SimParams
from .. import grid as grid_mod

Array = jax.Array

_FAR = grid_mod._FAR
_M = 128  # window margin cells (covers oy/oz reach-back; keeps alignment)

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
    import itertools
    return list(itertools.product((-1, 0, 1), repeat=dim))


def _slot_loop(occ, body, init):
    """Candidate-slot loop bounded by the *occupancy* of the window, not the
    static capacity — empty bucket rows are skipped at runtime (the dominant
    waste: settled SPH fluid fills ~1-8 of capacity-24 slots)."""
    return jax.lax.fori_loop(0, occ, body, init)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _geometry(cfg: SimConfig):
    dims = cfg.grid_dims
    gx, gy = dims[0], dims[1]
    gz = dims[2] if cfg.dim == 3 else 1
    if gz > _M - 1:
        raise ValueError(
            f"pallas path needs grid z-dim < {_M}; got {gz} — use the "
            "bucket_grid XLA path or a coarser grid")
    S = gy * gz
    # ≥2 lane tiles per slab: Mosaic's dynamic-sublane loads reject unaligned
    # lane offsets when the slice is a single 128-lane tile (hits 2-D grids)
    S_pad = max(_round_up(S, _M), 2 * _M)
    CL = S_pad + 2 * _M        # chunk stride in the VMEM window
    PAD = S_pad + _M           # front/back padding of the HBM layout
    return gx, gy, gz, S, S_pad, CL, PAD


def _build_slab_buckets(predicted: Array, vel: Array, params, cfg: SimConfig):
    """Bucket build scattering DIRECTLY into the slab-padded kernel layout
    (column = x·S_pad + y·gz + z, plus PAD ends) — no relayout copies
    between the build and the kernels.

    Cost-shaped by the measured v5e irregular-op tax
    (benchmarks/micro_tpu_results.json: each gather costs ~13ns per INDEX
    with multi-feature windows nearly free, each scatter ~14ns per ELEMENT,
    so the op count is minimized):

    * ONE lax.sort carries the permutation alongside the keys;
    * ONE (n, 2·dim)-row gather reorders all particle features;
    * 2·dim scalar scatters place the feature planes (the irreducible
      per-element scatter cost);
    * the per-cell occupancy row `counts` replaces the mask PLANE — one
      scatter-add of n ones instead of a (cap, L) plane, and the kernels
      derive candidate masks as `slot < counts[col]`.

    Returns (feat planes (2·dim, cap, L): pos then vel, counts (1, L) f32,
    addr_out (n,) into the kernels' un-end-padded output planes,
    overflow ())."""
    from .. import hashing

    n, dim = predicted.shape
    h = params.smoothing_radius
    dims = cfg.grid_dims
    cap = cfg.cell_capacity
    gx, gy, gz, S, S_pad, CL, PAD = _geometry(cfg)
    L = PAD + gx * S_pad + PAD
    dtype = predicted.dtype

    origin = hashing.grid_origin(predicted, h)
    cell = jnp.floor((predicted - origin) / h).astype(jnp.int32)
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
    ok = slot < cap
    flat = jnp.where(ok, slot * L + PAD + sorted_col, cap * L)

    rows = jnp.concatenate([predicted, vel], axis=1)   # (n, 2·dim)
    srows = jnp.take(rows, order, axis=0)              # ONE gather

    def scatter(vals):
        out = jnp.zeros((cap * L + 1,), dtype)
        return out.at[flat].set(
            vals, mode="promise_in_bounds",
            unique_indices=True)[:-1].reshape(cap, L)

    planes = jnp.stack([scatter(srows[:, j]) for j in range(2 * dim)])

    counts = jnp.zeros((1, L), dtype).at[0, PAD + col].add(
        1.0, mode="promise_in_bounds")
    # clamp to capacity: dropped particles are NOT in the slot planes, and
    # an unclamped count would both overrun the slot fori bound and pass
    # the mask for nonexistent rows
    counts = jnp.minimum(counts, float(cap))

    # address into the kernels' output planes (no PAD ends there)
    out_flat = jnp.where(ok, slot * (gx * S_pad) + sorted_col,
                         cap * gx * S_pad)
    addr_out = jnp.zeros((n,), jnp.int32).at[order].set(out_flat,
                                                        unique_indices=True)
    overflow = (n - jnp.sum(ok)).astype(jnp.int32)
    return planes, counts, addr_out, overflow


def build_local_slab_buckets(pred: Array, vel: Array, active: Array,
                             origin: Array, gx_loc: int, my_dev,
                             params, cfg_loc: SimConfig):
    """Per-device bucket build for the domain-decomposed step: like
    _build_slab_buckets but over the device's local slab range of the global
    grid (cells outside clamp to the boundary slab — stragglers between
    migrations; the distance filter keeps their included pairs exact) and
    with inactive slots dropped.

    The slab-padded layout leaves PAD = S_pad + _M dead columns at each end;
    the domain step writes the ppermuted neighbor boundary slabs into the
    S_pad-aligned pad positions, and the kernels' halo windows then read
    them with no layout changes (parallel/domain.py).
    """
    n, dim = pred.shape
    h = params.smoothing_radius
    dims = cfg_loc.grid_dims            # (gx_loc, gy[, gz]) — local
    cap = cfg_loc.cell_capacity
    gx, gy, gz, S, S_pad, CL, PAD = _geometry(cfg_loc)
    L = PAD + gx_loc * S_pad + PAD
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
    ok = (slot < cap) & sorted_active
    flat = jnp.where(ok, slot * L + PAD + sorted_key, cap * L)

    rows = jnp.concatenate([pred, vel], axis=1)
    srows = jnp.take(rows, order, axis=0)

    def scatter(vals):
        out = jnp.zeros((cap * L + 1,), dtype)
        return out.at[flat].set(
            vals, mode="promise_in_bounds",
            unique_indices=True)[:-1].reshape(cap, L)

    planes = jnp.stack([scatter(srows[:, j]) for j in range(2 * dim)])

    counts = jnp.zeros((1, L), dtype).at[0, PAD + col].add(
        active, mode="promise_in_bounds")
    counts = jnp.minimum(counts, float(cap))  # see _build_slab_buckets

    out_flat = jnp.where(ok, slot * (gx_loc * S_pad) + sorted_key,
                         cap * gx_loc * S_pad)
    addr_out = jnp.zeros((n,), jnp.int32).at[order].set(out_flat,
                                                        unique_indices=True)
    overflow = (jnp.sum(active) - jnp.sum(ok)).astype(jnp.int32)
    return planes, counts, addr_out, overflow


def halo_window_occupancy(counts_ext: Array, gx_loc: int, S_pad: int,
                          PAD: int, gz: int = _M - 1) -> Array:
    """Domain-path alias: window_occupancy already reads halo counts
    ppermuted into the pad regions (it reads one slab into each pad)."""
    return window_occupancy(counts_ext, gx_loc, S_pad, PAD, gz)


def _window_dma(feats_ref, scratch, sems, counts_ref, cnt_scratch, cnt_sems,
                i, *, S_pad, CL):
    """Start+wait the three halo-slab copies for slab i (feature planes and
    the occupancy-counts row). In the padded HBM layout, chunk c's window
    starts at (i + c)·S_pad — always 128-aligned."""
    copies = []
    for c in range(3):
        start = (i + c) * S_pad
        copies.append(pltpu.make_async_copy(
            feats_ref.at[:, :, pl.ds(start, CL)],
            scratch.at[:, :, pl.ds(c * CL, CL)],
            sems.at[c],
        ))
        copies.append(pltpu.make_async_copy(
            counts_ref.at[:, pl.ds(start, CL)],
            cnt_scratch.at[:, pl.ds(c * CL, CL)],
            cnt_sems.at[c],
        ))
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()


def _cand_start(off, *, CL, gz):
    """Static window-local column of the first candidate cell for a query at
    the tile start, for neighbor offset `off`."""
    if len(off) == 3:
        ox, oy, oz = off
    else:
        ox, oy = off
        oz = 0
    return (ox + 1) * CL + _M + oy * gz + oz


# Query rows are processed in sublane-tile-sized chunks; chunks whose rows
# lie entirely above the window occupancy are skipped (settled fluid fills
# 1-8 of 16 slots, so this typically halves the pair math).
_QROWS = 8

# Lane-chunk target width: occupancy is bounded per (slab, lane-chunk), so
# empty air above a settled pool costs nothing even inside occupied slabs.
# 256 (the Mosaic minimum slice width here) bounds ~2x tighter than 512:
# the slot loop runs to the WINDOW max, and typical cells hold far fewer
# particles than the window's hotspot cell.
_YC = 256


def _lane_chunks(S_pad: int):
    """Static (start, width) lane chunks covering [0, S_pad).

    Every chunk is ≥ 2 lane tiles (256) wide: Mosaic rejects dynamic-sublane
    loads at statically-unaligned lane offsets when the slice is a single
    128-lane tile (same constraint that forces S_pad ≥ 2·_M in _geometry)."""
    out = []
    s = 0
    while s < S_pad:
        w = min(_YC, S_pad - s)
        if S_pad - (s + w) in range(1, 256):  # tail would be a thin chunk
            w = S_pad - s
        out.append((s, w))
        s += w
    return out


def _density_kernel(occ_ref, params_ref, feats_ref, counts_ref, out_ref,
                    scratch, sems, cnt_scratch, cnt_sems, scratch_out,
                    out_sem, *, dim, cap, gz, S_pad, CL):
    i = pl.program_id(0)
    _window_dma(feats_ref, scratch, sems, counts_ref, cnt_scratch, cnt_sems,
                i, S_pad=S_pad, CL=CL)

    h = params_ref[0, _P_H]
    h2 = h * h
    pow2 = params_ref[0, _P_POW2]
    pow3 = params_ref[0, _P_POW3]

    qs = CL + _M  # window-local start of this slab's real cells
    Q = _QROWS

    for yc, (y0, T) in enumerate(_lane_chunks(S_pad)):
        occ = occ_ref[i, yc]

        for q0 in range(0, cap, Q):
            @pl.when(occ > q0)
            def _compute(q0=q0, y0=y0, T=T, occ=occ):
                qpos = [scratch[a, q0:q0 + Q, pl.ds(qs + y0, T)]
                        for a in range(dim)]
                den = jnp.zeros((Q, T), jnp.float32)
                nden = jnp.zeros((Q, T), jnp.float32)
                for off in _offsets(dim):
                    cs = _cand_start(off, CL=CL, gz=gz) + y0
                    # counts slice is per-offset, not per-slot — load once
                    cnt_row = cnt_scratch[0, pl.ds(cs, T)][None, :]

                    def n_body(n, carry, cnt_row=cnt_row):
                        den, nden = carry
                        dist2 = jnp.zeros((Q, T), jnp.float32)
                        for a in range(dim):
                            d_a = (scratch[a, n, pl.ds(cs, T)][None, :]
                                   - qpos[a])
                            dist2 = dist2 + d_a * d_a
                        # slot occupied iff n < counts[col] (the counts row
                        # replaces a whole mask plane)
                        mask_n = jnp.where(
                            cnt_row > n.astype(jnp.float32), 1.0, 0.0)
                        # self-interaction included, like the reference walk
                        # (simulation.wgsl:162-183)
                        m = jnp.where(dist2 <= h2, mask_n, 0.0)
                        # clamp: sentinel distances overflow (h-d)^3 into
                        # inf and the masked product would be 0*inf = NaN
                        v = h - jnp.sqrt(jnp.minimum(dist2, h2))
                        den = den + m * (v * v * pow2)
                        nden = nden + m * (v * v * v * pow3)
                        return den, nden

                    den, nden = _slot_loop(occ, n_body, (den, nden))

                scratch_out[0, q0:q0 + Q, pl.ds(y0, T)] = den + DENSITY_PADDING
                scratch_out[1, q0:q0 + Q, pl.ds(y0, T)] = (nden
                                                           + DENSITY_PADDING)

            @pl.when(occ <= q0)
            def _default(q0=q0, y0=y0, T=T):
                # these bucket rows are empty everywhere in the sub-window
                zero = jnp.zeros((Q, T), jnp.float32)
                scratch_out[0, q0:q0 + Q, pl.ds(y0, T)] = zero
                scratch_out[1, q0:q0 + Q, pl.ds(y0, T)] = zero

    cp = pltpu.make_async_copy(
        scratch_out, out_ref.at[:, :, pl.ds(i * S_pad, S_pad)], out_sem)
    cp.start()
    cp.wait()


def _force_kernel(occ_ref, params_ref, feats_ref, counts_ref, out_ref,
                  scratch, sems, cnt_scratch, cnt_sems, scratch_out,
                  out_sem, *, dim, cap, gz, S_pad, CL):
    i = pl.program_id(0)
    _window_dma(feats_ref, scratch, sems, counts_ref, cnt_scratch, cnt_sems,
                i, S_pad=S_pad, CL=CL)

    h = params_ref[0, _P_H]
    h2 = h * h
    pow2_der = params_ref[0, _P_POW2_DER]
    pow3_der = params_ref[0, _P_POW3_DER]
    spikey = params_ref[0, _P_SPIKEY]
    viscosity = params_ref[0, _P_VISCOSITY]
    target = params_ref[0, _P_TARGET_DENSITY]
    # pressures are EOS-affine in the densities — derived per row here
    # (half-scaled: shared pressure is the pair mean, wgsl:251-259)
    pa = params_ref[0, _P_PRESSURE] * 0.5
    pb = -params_ref[0, _P_PRESSURE] * target * 0.5
    npa = params_ref[0, _P_NEAR_PRESSURE] * 0.5

    # feats plane layout (bucket_sph below):
    #   [0:dim) pos | [dim:2dim) vel | 2dim den | 2dim+1 nden
    # (candidate masks come from the counts row, not a mask plane)
    VEL = dim
    DEN = 2 * dim
    NDEN = 2 * dim + 1

    qs = CL + _M
    Q = _QROWS

    for yc, (y0, T) in enumerate(_lane_chunks(S_pad)):
        occ = occ_ref[i, yc]

        for q0 in range(0, cap, Q):
            @pl.when(occ > q0)
            def _compute(q0=q0, y0=y0, T=T, occ=occ):
                qpos = [scratch[a, q0:q0 + Q, pl.ds(qs + y0, T)]
                        for a in range(dim)]
                qvel = [scratch[VEL + a, q0:q0 + Q, pl.ds(qs + y0, T)]
                        for a in range(dim)]
                qden = scratch[DEN, q0:q0 + Q, pl.ds(qs + y0, T)]
                qnden = scratch[NDEN, q0:q0 + Q, pl.ds(qs + y0, T)]
                qprs = pa * qden + pb
                qnprs = npa * qnden

                pforce = [jnp.zeros((Q, T), jnp.float32) for _ in range(dim)]
                vforce = [jnp.zeros((Q, T), jnp.float32) for _ in range(dim)]
                row_ids = q0 + jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0)

                for off in _offsets(dim):
                    cs = _cand_start(off, CL=CL, gz=gz) + y0
                    is_center = all(o == 0 for o in off)
                    cnt_row = cnt_scratch[0, pl.ds(cs, T)][None, :]

                    def n_body(n, carry, cnt_row=cnt_row):
                        pforce, vforce = carry
                        disp = []
                        dist2 = jnp.zeros((Q, T), jnp.float32)
                        for a in range(dim):
                            d_a = (scratch[a, n, pl.ds(cs, T)][None, :]
                                   - qpos[a])
                            disp.append(d_a)
                            dist2 = dist2 + d_a * d_a
                        mask_n = jnp.where(
                            cnt_row > n.astype(jnp.float32), 1.0, 0.0)
                        m = jnp.where(dist2 <= h2, mask_n, 0.0)
                        if is_center:
                            # skip the self pair (simulation.wgsl:231-233)
                            m = m * (row_ids != n).astype(jnp.float32)

                        # dist via rsqrt; guard d == 0 (inv -> 0, dist -> 0)
                        inv = jnp.where(dist2 > 0.0, jax.lax.rsqrt(
                            jnp.where(dist2 > 0.0, dist2, 1.0)), 0.0)
                        dc2 = jnp.minimum(dist2, h2)  # sentinel overflow guard
                        dc = dc2 * jnp.where(dist2 > 0.0, inv, 0.0)
                        dc = jnp.minimum(dc, h)
                        zero_dist = (dist2 == 0.0).astype(jnp.float32)

                        den_n = scratch[DEN, n, pl.ds(cs, T)][None, :]
                        nden_n = scratch[NDEN, n, pl.ds(cs, T)][None, :]
                        deninv_n = jnp.where(
                            den_n > 0.0,
                            1.0 / jnp.where(den_n > 0.0, den_n, 1.0), 0.0)
                        ndeninv_n = jnp.where(
                            nden_n > 0.0,
                            1.0 / jnp.where(nden_n > 0.0, nden_n, 1.0), 0.0)

                        shared_p = qprs + (pa * den_n + pb)
                        shared_np = qnprs + npa * nden_n
                        v = dc - h
                        scale = m * (shared_p * (v * pow2_der) * deninv_n
                                     + shared_np * (v * v * pow3_der)
                                     * ndeninv_n)

                        hv = h2 - dc2
                        w_visc = m * (hv * hv * hv * spikey)

                        for a in range(dim):
                            dir_a = disp[a] * inv
                            if a == 1:
                                # +y fallback at d == 0 (wgsl:243-248)
                                dir_a = dir_a + zero_dist
                            pforce[a] = pforce[a] + dir_a * scale
                            vel_n = scratch[VEL + a, n,
                                            pl.ds(cs, T)][None, :]
                            vforce[a] = vforce[a] + (vel_n - qvel[a]) * w_visc
                        return pforce, vforce

                    pforce, vforce = _slot_loop(occ, n_body, (pforce, vforce))

                qden_inv = jnp.where(
                    qden > 0.0, 1.0 / jnp.where(qden > 0.0, qden, 1.0), 0.0)
                for a in range(dim):
                    scratch_out[a, q0:q0 + Q, pl.ds(y0, T)] = (
                        pforce[a] * qden_inv + viscosity * vforce[a])

            @pl.when(occ <= q0)
            def _default(q0=q0, y0=y0, T=T):
                zero = jnp.zeros((Q, T), jnp.float32)
                for a in range(dim):
                    scratch_out[a, q0:q0 + Q, pl.ds(y0, T)] = zero

    cp = pltpu.make_async_copy(
        scratch_out, out_ref.at[:, :, pl.ds(i * S_pad, S_pad)], out_sem)
    cp.start()
    cp.wait()


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


def window_occupancy(counts: Array, gx: int, S_pad: int, PAD: int,
                     gz: int = _M - 1) -> Array:
    """Per-(slab, lane-chunk) max cell occupancy over the 3-slab window with
    the EXACT candidate lane reach ±(gz+1) — the runtime bound for the
    candidate-slot loops. Pure reductions, no scatters. Lane chunking means
    empty air above a settled pool is skipped even inside occupied slabs,
    and the exact margin keeps a single hotspot from inflating the bound of
    far-away chunks.

    counts: (1, L) per-cell occupancy row in the slab-padded layout. The
    span read includes one slab's worth of the PAD regions, so halo counts
    ppermuted into the pads by the domain-decomposed step
    (parallel/domain.py) are included too (single-chip builds leave the
    pads zero). Returns (gx, NYC) int32."""
    mg = min(gz + 1, _M)
    span = counts[0, PAD - S_pad:PAD + (gx + 1) * S_pad]
    c2 = span.reshape(gx + 2, S_pad)
    # lane margins: a chunk's candidates reach ±(gz+1) lanes, which at
    # slab edges live in the adjacent slab's rows
    zl = jnp.zeros((1, mg), c2.dtype)
    left = jnp.concatenate([zl, c2[:-1, S_pad - mg:]], axis=0)
    right = jnp.concatenate([c2[1:, :mg], zl], axis=0)
    c2e = jnp.concatenate([left, c2, right], axis=1)
    cols = [jnp.max(c2e[:, y0:y0 + T + 2 * mg], axis=1)
            for (y0, T) in _lane_chunks(S_pad)]
    m0 = jnp.stack(cols, axis=1)                       # (gx+2, NYC)
    occ = jnp.maximum(jnp.maximum(m0[:-2], m0[1:-1]), m0[2:])
    return jnp.ceil(occ).astype(jnp.int32)


def _run_pass(kernel_body, feats: Array, counts: Array, occ_win: Array,
              params_vec: Array, cfg: SimConfig, n_out: int, interpret: bool):
    gx, gy, gz, S, S_pad, CL, PAD = _geometry(cfg)
    dim, cap = cfg.dim, cfg.cell_capacity
    if cap % _QROWS:
        raise ValueError(
            f"cell_capacity must be a multiple of {_QROWS} (sublane tile); "
            f"got {cap}")
    F = feats.shape[0]

    # feats arrive already in the slab-padded layout (F, cap, L)
    body = functools.partial(kernel_body, dim=dim, cap=cap, gz=gz,
                             S_pad=S_pad, CL=CL)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gx,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((F, cap, 3 * CL), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((1, 3 * CL), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((n_out, cap, S_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    window_bytes = (F * cap * 3 * CL + n_out * cap * S_pad) * 4
    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, cap, gx * S_pad), jnp.float32),
        # large grids (256k+ scenes) need headroom above the default 16 MB
        # scoped budget for the window + live pair temporaries
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * window_bytes + 8 * 2**20, 128 * 2**20)),
        interpret=interpret,
    )(occ_win, params_vec, feats, counts)
    return out


def bucket_sph(predicted: Array, vel: Array, params: SimParams,
               coeffs: KernelCoeffs, cfg: SimConfig,
               interpret: bool | None = None):
    """Pallas-accelerated bucket SPH: same contract as ops.grid.bucket_sph —
    per-particle (den, nden, prs, nprs, acc, overflow).

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere (so
    neighbor_mode='pallas' stays usable — if slow — on CPU)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dim = cfg.dim
    gx, gy, gz, S, S_pad, CL, PAD = _geometry(cfg)

    planes, counts, addr_out, overflow = _build_slab_buckets(
        predicted, vel, params, cfg)
    params_vec = _param_vector(params, coeffs)
    occ_win = window_occupancy(counts, gx, S_pad, PAD, gz)

    # density pass: planes [pos] → (den, nden); pressures are EOS-affine in
    # the densities, derived per row inside the force kernel and per
    # particle after the gather-back — never materialized as planes
    dens = _run_pass(_density_kernel, planes[:dim], counts, occ_win,
                     params_vec, cfg, 2, interpret)

    if cfg.rescue_capacity > 0:
        # exact overflow rescue (ops/rescue.py): correct densities BEFORE
        # the force pass (scattered back into the planes), add pair-force
        # corrections after. Only overflowing steps pay the sweep.
        from .. import rescue as rescue_mod

        sentinel = cfg.cell_capacity * gx * S_pad
        dropped = addr_out == sentinel
        dfills = jnp.asarray([params.target_density, DENSITY_PADDING],
                             dens.dtype)
        dflat = jnp.concatenate(
            [dens.reshape(2, -1), dfills[:, None]], axis=1)
        den, nden = dflat[0, addr_out], dflat[1, addr_out]

        small = rescue_mod.small_budget(cfg)

        def with_rescue(budget):
            def fn(den, nden, dens):
                den, nden, rescued, unrescued = rescue_mod.density_rescue(
                    predicted, dropped, den, nden, params, coeffs, cfg,
                    budget=budget)
                flat = dens.reshape(2, -1)
                flat = flat.at[0, addr_out].set(den, mode="drop")
                flat = flat.at[1, addr_out].set(nden, mode="drop")
                return den, nden, flat.reshape(dens.shape), unrescued
            return fn

        # two-tier budget: see ops/grid.py — the full O(budget·n) sweep only
        # runs when the small tier cannot cover the overflow count
        den, nden, dens, unrescued = jax.lax.cond(
            overflow > 0,
            lambda *a: jax.lax.cond(overflow <= small, with_rescue(small),
                                    with_rescue(cfg.rescue_capacity), *a),
            lambda den, nden, dens: (den, nden, dens, overflow),
            den, nden, dens)
        prs = params.pressure_scalar * (den - params.target_density)
        nprs = params.near_pressure_scalar * nden

        dens_padded = jnp.pad(dens, ((0, 0), (0, 0), (PAD, PAD)))
        feats_f = jnp.concatenate([planes, dens_padded], axis=0)
        acc_c = _run_pass(_force_kernel, feats_f, counts, occ_win,
                          params_vec, cfg, dim, interpret)
        aflat = jnp.concatenate(
            [acc_c.reshape(dim, -1),
             jnp.zeros((dim, 1), acc_c.dtype)], axis=1)
        acc = aflat[:, addr_out].T

        def f_rescue(budget):
            return lambda a: rescue_mod.force_rescue(
                predicted, vel, den, nden, prs, nprs, dropped, a, params,
                coeffs, cfg, budget=budget)

        acc = jax.lax.cond(
            overflow > 0,
            lambda a: jax.lax.cond(overflow <= small, f_rescue(small),
                                   f_rescue(cfg.rescue_capacity), a),
            lambda a: a, acc)
        return den, nden, prs, nprs, acc, unrescued

    # force pass: planes [pos | vel | den | nden]; density outputs lack the
    # PAD ends — restore them with a zero pad (the end cells are empty,
    # their values never pass the counts mask)
    dens_padded = jnp.pad(dens, ((0, 0), (0, 0), (PAD, PAD)))
    feats_f = jnp.concatenate([planes, dens_padded], axis=0)
    acc_c = _run_pass(_force_kernel, feats_f, counts, occ_win, params_vec,
                      cfg, dim, interpret)

    # ONE multi-feature gather brings all results back to particle order:
    # gather cost on v5e is per-index (~13ns), nearly independent of the
    # (F, 1) window width (benchmarks/micro2_tpu_results.json), so stacking
    # den/nden/acc into one plane array is ~dim+1 gathers saved
    fills = jnp.asarray(
        [params.target_density, DENSITY_PADDING] + [0.0] * dim,
        dens.dtype)
    stacked = jnp.concatenate([dens, acc_c], axis=0).reshape(2 + dim, -1)
    stacked = jnp.concatenate([stacked, fills[:, None]], axis=1)
    out = stacked[:, addr_out]                       # (2+dim, n)
    den, nden = out[0], out[1]
    acc = out[2:].T
    # pressures are pure EOS of the densities — recompute per particle
    # instead of two more bucket-plane gathers
    prs = params.pressure_scalar * (den - params.target_density)
    nprs = params.near_pressure_scalar * nden
    return den, nden, prs, nprs, acc, overflow
