"""Pallas TPU kernel for FarnebackUpdateMatrices' displaced fetch + M assembly.

Why: the update step needs R1 at per-pixel integer-displaced coordinates
(`R1[clip(round(y+dy)), clip(round(x+dx))]`).  XLA lowers that to a
per-element HBM gather, which measures ~35 ms per 1080p frame on v5e —
~80% of total pipeline time.  TPUs have no fast global gather, but Mosaic
supports an intra-tile lane shuffle (`take_along_axis` on an (8, 128)
block).  This kernel exploits the smoothness of blurred flow:

  * Per 8-row band, one dynamic window (5, WIN_H, W) of R1 is DMA'd from
    HBM, anchored at the band's minimum fetched row (anchors precomputed
    at XLA level and scalar-prefetched so windows double-buffer).
  * Within each 128-lane subtile the fetch is resolved over a static
    V_MAX x T_MAX block of (relative-row, 128-lane-tile) candidates —
    blurred flow is smooth, so the per-subtile spread of
    `source_row - own_row` is ~0..2.  Each relative-row candidate's source
    rows form one contiguous diagonal block, loaded as an aligned 16-row
    block + dynamic sublane rotate, then lane-shuffled per tile candidate.
  * Pixels outside the candidate block (fast motion boundaries) are
    flagged; a bounded XLA gather+scatter correction fixes up to VIOL_MAX
    of them, and a full-XLA third tier covers pathological flow fields —
    exactness is never sacrificed (bit-identical to the XLA path).
  * Displacements that leave the image entirely take OpenCV's R0-only
    fallback (no fetch), matching `update_matrices` semantics exactly.

The caller remains `core.update_matrices`-compatible: same M output, same
border down-weighting, same residual sign conventions.
"""

from __future__ import annotations

import functools
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optical_flow_tpu.models.farneback.core import (
    BORDER,
    BORDER_WEIGHTS,
    border_scale_field_traced,
)

TILE_H = 8
TILE_W = 128
WIN_H = 32          # source-window rows (spread budget per band)
V_MAX = 4           # static relative-row candidates per subtile (pass 1)
V2_MAX = 12         # pass-2 candidates (motion-boundary ramps), gated
T_MAX = 2           # static 128-lane-tile candidates per subtile
VIOL_MAX = 16384    # max spilled pixels fixed by the XLA correction

# fused-loop 'store' layout offsets (see pallas/fused_iterate.py): arrays
# are shifted so the blur kernel's replicate halo lives inside the array
ROW_OFF = 16
COL_OFF = 8

# R1 displaced-fetch window double-buffer gate: above this width the
# (n_slots, 5, WIN_H, w) window scratch is single-buffered.  2048 dates
# from the default-16 MB-scoped-VMEM era; the builds now set an analytic
# vmem_limit_bytes, so n_slots=2 FITS at 4K — but measured perf says it
# does not pay there (benchmarks/exp_fused_slots_4k.py on v5e: 35.7 vs
# 35.4 pairs/s, noise; the 2x-wider window DMA already hides under the
# band compute).  Module-global for the A/B harness.
DBUF_W_LIMIT = 2048

# Observability: how often the exactness tiers fire (tier 2 = bounded
# gather+scatter correction, tier 3 = full XLA recompute).  Content that
# silently falls off the fast path (dense noise, fast global motion) shows
# up here; bench.py and the metrics logs surface the counts.
#
# The counts are DEVICE-SIDE: every update call computes a (2,) int32
# "tiers" vector (tier2 fired, tier3 fired) from data it already has (the
# per-frame violation counts), threaded out of the jitted programs as an
# auxiliary output.  No host callbacks — the dev transport (axon_pjrt)
# rejects send/recv callbacks, and debug.callback descriptors also poison
# the persistent compilation cache key (round-2 advisor finding) — and no
# cross-thread races: callers stash each call's device vector with
# note_tier_stats() and later fold them into TIER_COUNTS with
# consume_tier_stats() (the only point that forces a device->host read).
TIER_COUNTS = {"tier2": 0, "tier3": 0}

# pending per-call (2,) int32 device vectors; bounded so a metrics-blind
# long run cannot accumulate host-side references without limit.  On
# overflow the OLDEST entry is folded into TIER_COUNTS (it is thousands of
# dispatches old, so the forced read cannot stall the pipeline) — counts
# stay exact instead of silently undercounting (round-3 advisor).
_PENDING_TIERS: deque = deque()
_PENDING_MAX = 4096


def reset_tier_counts() -> None:
    TIER_COUNTS["tier2"] = 0
    TIER_COUNTS["tier3"] = 0
    _PENDING_TIERS.clear()


def tier_flags(n_viol_per):
    """(2,) int32 [tier2 fired, tier3 fired] from per-frame spill counts —
    the same predicates that route the lax.cond correction tiers."""
    mx = jnp.max(n_viol_per)
    t3 = mx > VIOL_MAX
    t2 = (jnp.sum(n_viol_per) > 0) & jnp.logical_not(t3)
    return jnp.stack([t2, t3]).astype(jnp.int32)


def note_tier_stats(tiers) -> None:
    """Stash one call's tier vector — (2,) int32, or (n, 2) per-shard
    vectors from a mesh step — as a concrete device array; tracers are
    ignored (traced callers must thread the vector out of their program
    and note the executed result instead)."""
    import jax.core as _core
    if isinstance(tiers, _core.Tracer):
        return
    if len(_PENDING_TIERS) >= _PENDING_MAX:
        _fold_one(_PENDING_TIERS.popleft())
    _PENDING_TIERS.append(tiers)


def _fold_one(t) -> None:
    if getattr(t, "is_fully_addressable", True):
        v = np.asarray(t).reshape(-1, 2).sum(axis=0)
    else:
        # multi-host sharded step: a global array spans devices this
        # process cannot read — fold in OUR shards only (per-process
        # counts; each host observes its own work)
        v = np.sum([np.asarray(s.data).reshape(-1, 2).sum(axis=0)
                    for s in t.addressable_shards], axis=0)
    TIER_COUNTS["tier2"] += int(v[0])
    TIER_COUNTS["tier3"] += int(v[1])


def consume_tier_stats() -> dict:
    """Fold every pending device vector into TIER_COUNTS (forces the
    pending results) and return a copy of the totals."""
    while _PENDING_TIERS:
        _fold_one(_PENDING_TIERS.popleft())
    return dict(TIER_COUNTS)


# Band-uniform fast path (see _update_kernel): on by default; the
# experiment harness flips it to A/B the candidate-block cost.
FAST_UNIFORM = True

# Split non-uniform branch (see _update_kernel.split_passes): a band that
# fails the uniformity pre-sweep (e.g. it straddles a motion boundary)
# runs the vmax=1 quick fill everywhere and a per-subtile-GATED fori pass
# only where pixels remain.  Output is bitwise-identical to the unrolled
# branch, but it is OFF: the on-device A/B (v5e, 1080p B=16) measured it
# a large net LOSS on both configs — smooth 122.7 -> 75.2 pairs/s,
# motion-boundary 85.9 -> 66.2 — i.e. merely *containing* the gated
# V2_MAX fori in pass 1 wrecks Mosaic's scheduling of the uniform arm
# too (the branch never even fires on smooth content).  Kept for the A/B
# harness (benchmarks/exp_update_variants.py) so the result stays
# reproducible; see docs/KERNELS.md "failed experiments".
SPLIT_NONUNIFORM = False


def _analytic_sc(ys, xs, H: int, W: int):
    """Analytic in-kernel border scale: the field is a separable product
    of two 5-tap border ramps over the logical coords the kernel already
    holds (ys, xs) — identical multiply sequence to
    core._border_axis_weights_traced, so bitwise-equal to the HBM field
    this replaces (one (tile_h, W) f32 read per band per iteration
    deleted from the fused loop)."""
    wy = jnp.where((ys >= 0) & (ys <= H - 1), 1.0, 0.0).astype(jnp.float32)
    wx = jnp.where((xs >= 0) & (xs <= W - 1), 1.0, 0.0).astype(jnp.float32)
    for k in range(min(BORDER, H)):
        bw = jnp.float32(BORDER_WEIGHTS[k])
        wy = wy * jnp.where(ys == k, bw, 1.0)
        wy = wy * jnp.where(ys == H - 1 - k, bw, 1.0)
    for k in range(min(BORDER, W)):
        bw = jnp.float32(BORDER_WEIGHTS[k])
        wx = wx * jnp.where(xs == k, bw, 1.0)
        wx = wx * jnp.where(xs == W - 1 - k, bw, 1.0)
    return wy * wx


def _update_kernel(anchors_ref, r0_ref, flow_ref, sc_ref, r1_hbm,
                   m_ref, viol_ref, win, win2, fbuf, sem, sem2, *,
                   h_real: int, w_real: int, n_bands: int, n_slots: int,
                   row_off: int = 0, col_off: int = 0,
                   tile_h: int = TILE_H, win_h: int = WIN_H,
                   fast: bool = True,
                   split: bool = True, blur=None, mbuf=None,
                   viol_counts: bool = False, poly=None,
                   frame_off: int = 0, winf=None, r_bf16: bool = False):
    """Grid: (B * H/TILE_H,) row bands.  Each step processes an (TILE_H, W)
    band of one batch element: one dynamic-window DMA (5, WIN_H, W)
    anchored at the band's minimum fetched row (precomputed at XLA level
    and scalar-prefetched so windows double-buffer across bands), then per
    128-lane subtile a static candidate block resolves the fetch with the
    native lane shuffle + sublane rotate.  Spilled pixels (e.g. the second
    motion cluster at object boundaries) get an in-kernel second-chance
    pass with its own window anchored at the spilled cluster, gated per
    band; only the residual after both passes goes to the XLA correction.
    """
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    i = gi % n_bands
    Hp = r1_hbm.shape[-2]
    n_sub = r1_hbm.shape[-1] // TILE_W
    Wp_full = r1_hbm.shape[-1]
    H = h_real            # clip/inside logic uses REAL image bounds
    W = w_real

    if poly is None:
        # frame_off: R1 windows read frame b + frame_off of r1_hbm — the
        # chained visualizer passes ONE (N, 5, Hs, Ws) store array as
        # both operands with frame_off=1 (pair i = frames (i, i+1)), so
        # neither R operand is ever sliced or padded at XLA level
        def dma(slot_, step):
            return pltpu.make_async_copy(
                r1_hbm.at[step // n_bands + frame_off, :,
                          pl.ds(pl.multiple_of(anchors_ref[step], 8),
                                win_h), :],
                win.at[slot_], sem.at[slot_])
    else:
        # fused-polyexp mode: r1_hbm is the padded INPUT image ip1
        # (B, Hs, Ws — image row y at ip row y + pe_pad, see
        # polyexp.build_ip_store); windows of RAW pixels are DMA'd and
        # the polyexp moment passes run in-kernel, writing the 5-channel
        # R window into `win` (the same shape the candidate machinery
        # reads).  Per-pixel op order matches poly_exp_pallas exactly
        # (pallas/polyexp.moment_band), so the computed R values — and
        # therefore M, the tiers and the blurred flow — are bitwise
        # equal to the materialized-R path.  ip row of store row r is
        # r - row_off + pe_pad = r - 8 (pe_pad == col_off == 8).
        from optical_flow_tpu.pallas.polyexp import moment_band
        pe = poly["pe"]
        raw1, raw0, raw2 = poly["raw1"], poly["raw0"], poly["raw2"]
        ip0_hbm = poly["ip0"]
        rwin1 = win_h + 16          # raw rows per R1 window
        rwin0 = tile_h + 16         # raw rows per R0 band window

        def dma(slot_, step):       # R1 raw window at the band's anchor
            return pltpu.make_async_copy(
                r1_hbm.at[step // n_bands,
                          pl.ds(pl.multiple_of(anchors_ref[step] - 16, 8),
                                rwin1), :],
                raw1.at[slot_], sem.at[slot_])

        def dma0(slot_, step):      # R0 raw window (static band rows)
            st = jnp.maximum((step % n_bands) * tile_h - 16, 0)
            return pltpu.make_async_copy(
                ip0_hbm.at[step // n_bands,
                           pl.ds(pl.multiple_of(st, 8), rwin0), :],
                raw0.at[slot_], poly["sem0"].at[slot_])

    slot = jax.lax.rem(gi, n_slots)
    nslot = jax.lax.rem(gi + 1, n_slots)

    @pl.when(gi == 0)
    def _():
        dma(slot, gi).start()
        if poly is not None:
            dma0(slot, gi).start()

    @pl.when((n_slots > 1) & (gi + 1 < n_total))
    def _():
        dma(nslot, gi + 1).start()
        if poly is not None:
            dma0(nslot, gi + 1).start()

    @pl.when((n_slots == 1) & (gi > 0))
    def _():
        dma(slot, gi).start()
        if poly is not None:
            dma0(slot, gi).start()

    def wait_windows():
        """Wait for this band's window(s); in fused-polyexp mode also run
        the moment passes that turn the raw windows into R windows."""
        dma(slot, gi).wait()
        if poly is None:
            if r_bf16:
                # bf16 R mode: the window arrives in bf16 (half the HBM
                # read) and is widened ONCE to the f32 scratch the fetch
                # passes read — bf16 -> f32 is exact, so everything
                # downstream is bitwise the f32 pipeline on quantized R
                winf[...] = win[slot].astype(jnp.float32)
            return
        dma0(slot, gi).wait()

        def emit1(x0, cw, outs):
            for c in range(5):
                win[c, :, 8 + x0: 8 + x0 + cw] = outs[c]

        moment_band(raw1[slot], win_h, emit1,
                    abs_row0=anchors_ref[gi] - 16,
                    aux_rows=poly["aux1"], **pe)

        def emit0(x0, cw, outs):
            for c in range(5):
                r0_ref[c, :, 8 + x0: 8 + x0 + cw] = outs[c]

        moment_band(raw0[slot], tile_h, emit0,
                    abs_row0=jnp.maximum(i * tile_h - 16, 0),
                    aux_rows=poly["aux0"], **pe)
        # R0's lane halos feed (r * sc) with sc == 0 — any FINITE value;
        # the emits never write them, so zero them (VMEM scratch is
        # uninitialized and NaN * 0 would poison M)
        for c in range(5):
            r0_ref[c, :, :8] = jnp.zeros((tile_h, 8), jnp.float32)
            r0_ref[c, :, Wp_full - 8:] = jnp.zeros((tile_h, 8),
                                                   jnp.float32)

    dx = flow_ref[0, 0]
    dy = flow_ref[0, 1]
    Wp = n_sub * TILE_W
    ys = (i * tile_h - row_off
          + jax.lax.broadcasted_iota(jnp.int32, (tile_h, Wp), 0)
          ).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, Wp), 1) - col_off
          ).astype(jnp.float32)
    x1 = jnp.round(xs + dx)
    y1 = jnp.round(ys + dy)
    # halo/pad pixels (own coords outside the real image) never fetch —
    # they take the R0 fallback (and are zeroed by sc == 0 there anyway)
    inside = ((x1 >= 0) & (x1 <= W - 1) & (y1 >= 0) & (y1 <= H - 1)
              & (xs >= 0) & (xs <= W - 1) & (ys >= 0) & (ys <= H - 1))
    # fetch coordinates in the storage layout
    xi = jnp.clip(x1, 0, W - 1).astype(jnp.int32) + col_off
    yi = jnp.clip(y1, 0, H - 1).astype(jnp.int32) + row_off

    row_in_band = jax.lax.broadcasted_iota(jnp.int32, (tile_h, Wp), 0)
    xt = xi // TILE_W
    lane = xi % TILE_W

    def emit_viol(mask=None):
        # viol_counts: the fused update+blur path never consumes the
        # mask (spilled frames replay the exact two-kernel path), so a
        # per-band SMEM scalar count replaces the full f32 band — one
        # mask write + one XLA re-read of iterate traffic deleted.  The
        # SMEM block is (1, n_bands) (Mosaic requires full-or-128 last
        # dims), revisited by all of a frame's steps; slot i is written
        # exactly once per frame.
        if viol_counts:
            viol_ref[0, 0, i] = (jnp.float32(0.0) if mask is None
                                 else jnp.sum(mask.astype(jnp.float32)))
        else:
            viol_ref[0, 0] = (jnp.zeros((tile_h, Wp), jnp.float32)
                              if mask is None
                              else mask.astype(jnp.float32))

    def fetch_pass(load, sy, active, gated=False, vmax=V_MAX,
                   sub_scalars=None):
        """One candidate-block pass over all (8, 128) subtiles.

        `load(c, v8, off)` returns a (16, TILE_W) window block.  Writes
        fetched values for covered pixels of `active` into fbuf and
        returns the combined covered mask (tile_h, Wp).  Candidates stay
        per-(8, 128)-subtile even when the band is taller (tile_h == 16
        in the fused loop) so the per-subtile spread budget is unchanged.
        gated=True skips subtiles with no active pixels (second-chance
        pass: most subtiles of a spilled band are clean).  sub_scalars:
        precomputed per-subtile (v_lo, t_lo) scalars (the uniformity
        pre-sweep already paid for them)."""
        lr = yi - sy
        in_w = (lr >= 0) & (lr < win_h)
        act = active & in_w
        rel = lr - row_in_band
        covered_rows = []
        for rg in range(tile_h // 8):
            rsl = slice(rg * 8, rg * 8 + 8)
            covered_cols = []
            for j in range(n_sub):
                sl = slice(j * TILE_W, (j + 1) * TILE_W)
                aj = act[rsl, sl]
                relj = rel[rsl, sl]
                xtj = xt[rsl, sl]
                lnj = lane[rsl, sl]
                if sub_scalars is not None:
                    v_lo, t_lo = sub_scalars[rg * n_sub + j]
                else:
                    v_lo = jnp.min(jnp.where(aj, relj, win_h))
                    t_lo = jnp.min(jnp.where(aj, xtj, n_sub - 1))
                cov = (aj & (relj < v_lo + vmax) & (xtj < t_lo + T_MAX))
                covered_cols.append(cov)

                def subtile_work(v_lo=v_lo, t_lo=t_lo, cov=cov, relj=relj,
                                 xtj=xtj, lnj=lnj, rsl=rsl, sl=sl, rg=rg,
                                 seed_fbuf=gated):
                    # accumulate in registers; fbuf is read/written once
                    # per subtile instead of once per candidate
                    if seed_fbuf:
                        acc = tuple(fbuf[c, rsl, sl] for c in range(5))
                    else:
                        acc = tuple(jnp.zeros((8, TILE_W), jnp.float32)
                                    for _ in range(5))

                    def kv_body(kv, acc):
                        # candidate v is relative to the band-local row;
                        # this subtile's rows sit 8*rg below the band top
                        vv = v_lo + kv + 8 * rg
                        v8 = pl.multiple_of(
                            jnp.clip((vv // 8) * 8, 0, win_h - 16), 8)
                        sh = vv - v8
                        for kt in range(T_MAX):
                            t = jnp.minimum(t_lo + kt, n_sub - 1)
                            sel = cov & (relj == v_lo + kv) & (xtj == t)
                            off = pl.multiple_of(t * TILE_W, TILE_W)
                            new = []
                            for c in range(5):
                                blk16 = load(c, v8, off)
                                diag = pltpu.roll(blk16, -sh, 0)[:8]
                                vals = jnp.take_along_axis(diag, lnj,
                                                           axis=1)
                                new.append(jnp.where(sel, vals, acc[c]))
                            acc = tuple(new)
                        return acc

                    if gated:
                        # cold path (spilled subtiles only): a fori keeps
                        # the compiled body ~12x smaller at no hot-path
                        # cost
                        acc = jax.lax.fori_loop(0, vmax, kv_body, acc)
                    else:
                        # hot path: static unroll, no loop machinery
                        for kv in range(vmax):
                            acc = kv_body(kv, acc)
                    for c in range(5):
                        fbuf[c, rsl, sl] = acc[c]

                if gated:
                    pl.when(jnp.any(aj))(subtile_work)
                else:
                    subtile_work()
            covered_rows.append(jnp.concatenate(covered_cols, axis=-1))
        return (covered_rows[0] if tile_h == 8
                else jnp.concatenate(covered_rows, axis=0))

    def load_win1(c, v8, off):
        if poly is not None:    # computed R window: no slot axis
            return win[c, pl.ds(v8, 16), pl.ds(off, TILE_W)]
        if r_bf16:              # widened copy (see wait_windows)
            return winf[c, pl.ds(v8, 16), pl.ds(off, TILE_W)]
        return win[slot, c, pl.ds(v8, 16), pl.ds(off, TILE_W)]

    def full_passes(sub_scalars=None):
        """Original structure: V_MAX x T_MAX pass 1, gated second-chance
        pass 2, residual violation mask for the XLA correction tier."""
        covered1 = fetch_pass(load_win1, anchors_ref[gi], inside,
                              sub_scalars=sub_scalars)
        spill = inside & jnp.logical_not(covered1)

        @pl.when(jnp.any(spill))
        def _():
            # second chance: window anchored at the spilled cluster
            sy2 = pl.multiple_of(jnp.clip(
                (jnp.min(jnp.where(spill, yi, Hp - 1)) // 8) * 8,
                16 if poly is not None else 0, Hp - win_h), 8)
            if poly is None:
                cp2 = pltpu.make_async_copy(
                    r1_hbm.at[gi // n_bands + frame_off, :,
                              pl.ds(sy2, win_h), :],
                    win2, sem2)
                cp2.start()
                cp2.wait()
                if r_bf16:
                    # pass 1 has fully consumed the widened pass-1 window
                    # by now — reuse winf for the re-anchored window
                    winf[...] = win2[...].astype(jnp.float32)
            else:
                cp2 = pltpu.make_async_copy(
                    r1_hbm.at[gi // n_bands,
                              pl.ds(pl.multiple_of(sy2 - 16, 8), rwin1),
                              :], raw2, sem2)
                cp2.start()
                cp2.wait()

                def emit2(x0, cw, outs):
                    for c in range(5):
                        win2[c, :, 8 + x0: 8 + x0 + cw] = outs[c]

                moment_band(raw2[...], win_h, emit2, abs_row0=sy2 - 16,
                            aux_rows=poly["aux1"], **pe)
            w2 = winf if r_bf16 else win2
            covered2 = fetch_pass(
                lambda c, v8, off: w2[c, pl.ds(v8, 16),
                                      pl.ds(off, TILE_W)],
                sy2, spill, gated=True, vmax=V2_MAX)
            emit_viol(spill & jnp.logical_not(covered2))

        @pl.when(jnp.logical_not(jnp.any(spill)))
        def _():
            emit_viol()

    def split_passes(sub_scalars):
        """Non-uniform band, split form (SPLIT_NONUNIFORM): quick vmax=1
        fill over all subtiles (identical to the uniform arm's work),
        then a per-subtile-GATED fori pass over the residual — on a
        motion-boundary band only the 1-2 subtiles the blur ramp crosses
        have any residual, so the statically-unrolled V_MAX block is
        never paid band-wide.  Residual after the in-window gated pass
        goes to the re-anchored second-chance window exactly as in
        full_passes; the violation mask (and therefore the tier
        semantics) is computed the same way."""
        covered_q = fetch_pass(load_win1, anchors_ref[gi], inside, vmax=1,
                               sub_scalars=sub_scalars)
        rem = inside & jnp.logical_not(covered_q)
        covered_g = fetch_pass(load_win1, anchors_ref[gi], rem,
                               gated=True, vmax=V2_MAX)
        spill = rem & jnp.logical_not(covered_g)

        @pl.when(jnp.any(spill))
        def _():
            sy2 = pl.multiple_of(jnp.clip(
                (jnp.min(jnp.where(spill, yi, Hp - 1)) // 8) * 8,
                16 if poly is not None else 0, Hp - win_h), 8)
            if poly is None:
                cp2 = pltpu.make_async_copy(
                    r1_hbm.at[gi // n_bands + frame_off, :,
                              pl.ds(sy2, win_h), :],
                    win2, sem2)
                cp2.start()
                cp2.wait()
                if r_bf16:
                    # pass 1 has fully consumed the widened pass-1 window
                    # by now — reuse winf for the re-anchored window
                    winf[...] = win2[...].astype(jnp.float32)
            else:
                cp2 = pltpu.make_async_copy(
                    r1_hbm.at[gi // n_bands,
                              pl.ds(pl.multiple_of(sy2 - 16, 8), rwin1),
                              :], raw2, sem2)
                cp2.start()
                cp2.wait()

                def emit2(x0, cw, outs):
                    for c in range(5):
                        win2[c, :, 8 + x0: 8 + x0 + cw] = outs[c]

                moment_band(raw2[...], win_h, emit2, abs_row0=sy2 - 16,
                            aux_rows=poly["aux1"], **pe)
            w2 = winf if r_bf16 else win2
            covered2 = fetch_pass(
                lambda c, v8, off: w2[c, pl.ds(v8, 16),
                                      pl.ds(off, TILE_W)],
                sy2, spill, gated=True, vmax=V2_MAX)
            emit_viol(spill & jnp.logical_not(covered2))

        @pl.when(jnp.logical_not(jnp.any(spill)))
        def _():
            emit_viol()

    if fast:
        # Band-uniformity pre-sweep: box-blurred flow is constant across
        # most subtiles of real content, so the V_MAX x T_MAX candidate
        # block (the kernel's dominant vector cost) usually collapses to
        # ONE relative-row candidate.  Compute per-subtile spread scalars
        # up front and branch ONCE per band (per-candidate conds measured
        # 2x slower; a single band-level scf.if amortizes to noise).  The
        # fast branch needs no spill machinery: uniform spread means
        # every in-window pixel is covered, and the pre-sweep predicate
        # includes full window containment.
        lr1 = yi - anchors_ref[gi]
        in_w1 = (lr1 >= 0) & (lr1 < win_h)
        act1 = inside & in_w1
        rel1 = lr1 - row_in_band
        scalars1 = []
        uniform = jnp.all(in_w1 | jnp.logical_not(inside))
        for rg in range(tile_h // 8):
            rsl = slice(rg * 8, rg * 8 + 8)
            for j in range(n_sub):
                sl = slice(j * TILE_W, (j + 1) * TILE_W)
                aj = act1[rsl, sl]
                relj = rel1[rsl, sl]
                xtj = xt[rsl, sl]
                v_lo = jnp.min(jnp.where(aj, relj, win_h))
                v_hi = jnp.max(jnp.where(aj, relj, -1))
                t_lo = jnp.min(jnp.where(aj, xtj, n_sub - 1))
                t_hi = jnp.max(jnp.where(aj, xtj, 0))
                scalars1.append((v_lo, t_lo))
                uniform = uniform & (v_hi <= v_lo) & (t_hi < t_lo + T_MAX)

        wait_windows()

        @pl.when(uniform)
        def _():
            fetch_pass(load_win1, anchors_ref[gi], inside, vmax=1,
                       sub_scalars=scalars1)
            emit_viol()

        @pl.when(jnp.logical_not(uniform))
        def _():
            if split:
                split_passes(sub_scalars=scalars1)
            else:
                full_passes(sub_scalars=scalars1)
    else:
        wait_windows()
        full_passes()

    fetched = jnp.stack([fbuf[c] for c in range(5)])

    r0 = r0_ref[0] if poly is None else r0_ref[...]
    if r_bf16:
        # one exact widen per band; the M arithmetic below stays f32
        r0 = r0.astype(jnp.float32)
    f0 = fetched[0]
    f1 = fetched[1]
    r4 = jnp.where(inside, (r0[2] + fetched[2]) * 0.5, r0[2])
    r5 = jnp.where(inside, (r0[3] + fetched[3]) * 0.5, r0[3])
    r6 = jnp.where(inside, (r0[4] + fetched[4]) * 0.25, r0[4] * 0.5)
    r2 = (r0[0] - jnp.where(inside, f0, 0.0)) * 0.5 + (r4 * dy + r6 * dx)
    r3 = (r0[1] - jnp.where(inside, f1, 0.0)) * 0.5 + (r6 * dy + r5 * dx)

    if sc_ref is None:
        sc = _analytic_sc(ys, xs, H, W)
    else:
        sc = sc_ref[:]
    r2 = r2 * sc
    r3 = r3 * sc
    r4 = r4 * sc
    r5 = r5 * sc
    r6 = r6 * sc

    mvals = (r4 * r4 + r6 * r6,
             (r4 + r5) * r6,
             r5 * r5 + r6 * r6,
             r4 * r2 + r6 * r3,
             r6 * r2 + r5 * r3)
    if col_off:
        # store layout: write the column replicate halos in-register so the
        # blur kernel's border taps read valid values with no XLA-side pad
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, Wp), 1)
        left = col < col_off
        right = col >= col_off + W
        mvals = tuple(
            jnp.where(left, v[:, col_off:col_off + 1],
                      jnp.where(right, v[:, col_off + W - 1:col_off + W], v))
            for v in mvals)
    if blur is None:
        for c in range(5):
            m_ref[0, c] = mvals[c]
    else:
        # fused blur+solve (software-pipelined): M never reaches HBM —
        # see _fused_blur_emit.  m_ref is the FLOW output here.
        _fused_blur_emit(m_ref, mbuf, mvals, i, n_bands=n_bands,
                         tile_h=tile_h, Wp=Wp, h_img=H, row_off=row_off,
                         **blur)


@functools.lru_cache(maxsize=64)
def _build(batch: int, h: int, w: int, h_real: int, w_real: int,
           row_off: int = 0, col_off: int = 0, tile_h: int = TILE_H,
           fast: bool = True, split: bool = True):
    n_bands = h // tile_h

    def bmap(gi, _anchors):
        return (gi // n_bands, 0, gi % n_bands, 0)

    def scmap(gi, _anchors):
        return (gi % n_bands, 0)

    n_slots = 2 if w <= DBUF_W_LIMIT else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch * n_bands,),
        in_specs=[
            pl.BlockSpec((1, 5, tile_h, w), bmap,
                         memory_space=pltpu.VMEM),          # R0 band
            pl.BlockSpec((1, 2, tile_h, w), bmap,
                         memory_space=pltpu.VMEM),          # flow band
            pl.BlockSpec((tile_h, w), scmap,
                         memory_space=pltpu.VMEM),          # border scale
            pl.BlockSpec(memory_space=pl.ANY),           # R1 full (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, 5, tile_h, w), bmap,
                         memory_space=pltpu.VMEM),          # M band
            pl.BlockSpec((1, 1, tile_h, w), bmap,
                         memory_space=pltpu.VMEM),          # violation mask
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, 5, WIN_H, w), jnp.float32),
            pltpu.VMEM((5, WIN_H, w), jnp.float32),
            pltpu.VMEM((5, tile_h, w), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # analytic scoped-VMEM limit (Mosaic's 16 MB default is a compiler
    # soft cap, not the 128 MiB v5e hardware — see _build_fused_blur)
    scratch_rows = n_slots * 5 * WIN_H + 5 * WIN_H + 5 * tile_h
    block_rows = 2 * (5 * tile_h + 2 * tile_h + tile_h
                      + 5 * tile_h + tile_h)
    vmem_need = (scratch_rows + block_rows) * w * 4
    params = pltpu.CompilerParams(
        vmem_limit_bytes=max(vmem_need + (8 << 20), 16 << 20))
    kernel = pl.pallas_call(
        functools.partial(_update_kernel, h_real=h_real, w_real=w_real,
                          n_bands=n_bands, n_slots=n_slots,
                          row_off=row_off, col_off=col_off, tile_h=tile_h,
                          fast=fast, split=split),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, 5, h, w), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, h, w), jnp.float32),
        ],
        compiler_params=params,
    )
    return kernel


# ---------------------------------------------------------------------------
# Fused update + blur + solve (software-pipelined M ring)
#
# Per iteration the two-kernel store loop moves M (5 ch f32) to HBM and
# back with a 2x read halo — 15 of its 37 analytic byte-units at L0
# (docs/KERNELS.md roofline), on a kernel already running at 84% of the
# DMA ceiling.  TPU grid steps execute sequentially on a core and scratch
# persists across steps, so the M round-trip can be deleted outright:
# step i computes M band i into a persistent 3-band VMEM ring and emits
# the blurred/solved FLOW for band i-1, whose (2*_PAD_S + tile_h)-row
# window is then fully resident — no overcompute, no halo refetch.  The
# flow out_spec maps step i to band (i-1) % n_bands: step 0 writes the
# last (pure-halo, zero) band, steps 1..n-1 write bands 0..n-2, so every
# band is written exactly once per frame.  The store layout's replicate
# M row halos (XLA-level 8-row copies in update_matrices_store) become
# in-kernel ring patches at STATIC band indices (h is static).
#
# Exactness: the in-kernel tiers (pass 1 + gated pass 2) are unchanged;
# the violation mask still comes out.  Because the blur consumes M
# before the XLA correction could fix it, any frame with spills must be
# recomputed via the exact two-kernel path — the caller lax.conds on the
# spill count (untaken conds are free in-pipeline; the bench configs
# measure tier2/tier3 = 0/0, so the fallback replay is off the hot path
# and tier semantics are bit-identical).


def _fused_blur_emit(fl_ref, mbuf, mvals, i, *, n_bands, tile_h, Wp,
                     h_img, row_off, m, taps, inv_area, fac):
    from optical_flow_tpu.pallas.blur_solve import _blur_solve_body
    PAD = COL_OFF                       # == blur_solve._PAD_S
    # image row 0 sits at band-local row loc0 of band i0: loc0 == 0 in
    # the classic tile_h == row_off layout (bands align with the top
    # halo), loc0 == row_off when tile_h == 2*row_off (32-row bands over
    # the same 16-row store offset; asserted in the build)
    loc0 = row_off % tile_h
    # 1. shift the ring up one band, append this band's M
    for c in range(5):
        rolled = mbuf[c, tile_h:3 * tile_h, :]
        mbuf[c, 0:2 * tile_h, :] = rolled
        mbuf[c, 2 * tile_h:3 * tile_h, :] = mvals[c]

    # 2. replicate M row-halo patches (the store layout's 8-row top and
    # bottom fixes, update_matrices_store:1097-1100).  Top: store rows
    # [row_off-8, row_off) <- image row 0.  loc0 == 0: image row 0 is
    # band 1's row 0 and the halo is band 0's last 8 rows — band 0 sits
    # at ring rows [tile_h, 2*tile_h) post-shift at i == 1.  loc0 > 0:
    # halo and image row 0 are both inside band 0, patched in the
    # just-appended slot at i == 0.
    if loc0 == 0:
        @pl.when(i == 1)
        def _():
            for c in range(5):
                mbuf[c, 2 * tile_h - 8:2 * tile_h, :] = jnp.broadcast_to(
                    mvals[c][0:1], (8, Wp))
    else:
        @pl.when(i == 0)
        def _():
            for c in range(5):
                mbuf[c, 2 * tile_h + loc0 - 8:2 * tile_h + loc0, :] = \
                    jnp.broadcast_to(mvals[c][loc0:loc0 + 1], (8, Wp))

    # Bottom: store rows (rb, rb+8] <- row rb (the last image row); they
    # span this band (n1 rows, patched from mvals at i == i_b) and
    # possibly the next (n2 = 8-n1 rows, patched from the ring one step
    # later, when band i_b sits at ring rows [tile_h, 2*tile_h)).  Rows
    # beyond rb+8 stay 0 (sc == 0 there), matching the XLA fix exactly.
    rb = row_off + h_img - 1
    i_b, rb_l = rb // tile_h, rb % tile_h
    n1 = min(8, tile_h - 1 - rb_l)
    if n1 > 0:
        @pl.when(i == i_b)
        def _():
            for c in range(5):
                mbuf[c, 2 * tile_h + rb_l + 1:
                     2 * tile_h + rb_l + 1 + n1, :] = jnp.broadcast_to(
                    mvals[c][rb_l:rb_l + 1], (n1, Wp))
    n2 = 8 - n1
    if n2 > 0:
        @pl.when(i == i_b + 1)
        def _():
            for c in range(5):
                src = mbuf[c, tile_h + rb_l:tile_h + rb_l + 1, :]
                mbuf[c, 2 * tile_h:2 * tile_h + n2, :] = jnp.broadcast_to(
                    src, (n2, Wp))

    # 3. emit flow band i-1 (blur_solve_store semantics: the pure-halo
    # top/bottom rows are zeros).  loc0 == 0: bands 0 and n_bands-1 are
    # entirely halo, written as zeros at i == 1 and i == 0.  loc0 > 0:
    # only band n_bands-1 (i == 0) is pure halo; band 0 (i == 1) blurs
    # normally and then zeroes its top loc0 halo rows.
    blur_from = 2 if loc0 == 0 else 1

    @pl.when(i < blur_from)
    def _():
        fl_ref[0, 0] = jnp.zeros((tile_h, Wp), jnp.float32)
        fl_ref[0, 1] = jnp.zeros((tile_h, Wp), jnp.float32)

    @pl.when(i >= blur_from)
    def _():
        fl_ref[0, 0, :, :PAD] = jnp.zeros((tile_h, PAD), jnp.float32)
        fl_ref[0, 1, :, :PAD] = jnp.zeros((tile_h, PAD), jnp.float32)
        fl_ref[0, 0, :, Wp - PAD:] = jnp.zeros((tile_h, PAD), jnp.float32)
        fl_ref[0, 1, :, Wp - PAD:] = jnp.zeros((tile_h, PAD), jnp.float32)
        # band i-1's window = ring rows [tile_h-8, 2*tile_h+8): the last
        # 8 rows of band i-2, all of band i-1, the first 8 of band i
        _blur_solve_body(mbuf, fl_ref, m=m, pad=PAD, out_w=Wp - 2 * PAD,
                         col0=PAD, inv_area=inv_area, taps=taps, fac=fac,
                         out_rows=tile_h, row0=tile_h - 8)
        if loc0:
            # band 0's top loc0 rows are the store's top halo (they also
            # read ring garbage from the nonexistent band -1): zero them
            @pl.when(i == 1)
            def _():
                fl_ref[0, 0, :loc0, :] = jnp.zeros((loc0, Wp), jnp.float32)
                fl_ref[0, 1, :loc0, :] = jnp.zeros((loc0, Wp), jnp.float32)


def _update_blur_kernel(anchors_ref, r0_ref, flow_ref, r1_hbm,
                        fl_ref, viol_ref, win, win2, *scratch, **kw):
    """Fused variant: same update machinery, the M slot is the flow
    output, the extra mbuf scratch is the persistent M ring, and the
    border scale is computed analytically in-kernel (sc_ref=None).
    bf16-R builds add a winf f32 scratch (the once-per-band widened
    window) between win2 and fbuf."""
    if len(scratch) == 5:
        winf, fbuf, mbuf, sem, sem2 = scratch
    else:
        fbuf, mbuf, sem, sem2 = scratch
        winf = None
    _update_kernel(anchors_ref, r0_ref, flow_ref, None, r1_hbm,
                   fl_ref, viol_ref, win, win2, fbuf, sem, sem2,
                   mbuf=mbuf, winf=winf, **kw)


# VMEM gate: the fused kernel adds the (5, 3*tile_h, Ws) f32 M ring to
# the update kernel's scratch (~12.5 MB total at Ws=2048).  Mosaic's
# DEFAULT scoped-VMEM budget (16 MB) capped this at Ws=2304 originally;
# _build_fused_blur now raises vmem_limit_bytes to the analytic need, so
# the gate sits at MAX_WP — the width where the update itself switches
# to the column-chunked variant.  Verified on v5e
# (benchmarks/exp_fused_blur_4k.py): the Ws=3968 kernel compiles and
# runs, 29.1 -> 35.5 pairs/s at 4K batch 4, bitwise-identical flow.
FUSED_BLUR_WS_LIMIT = 4096


def fused_blur_supported(h: int, w: int, winsize: int) -> bool:
    Ws = _ceil(w + 2 * COL_OFF, TILE_W)
    return (3 <= winsize <= 2 * COL_OFF + 1 and supported_shape(h, w)
            and Ws <= FUSED_BLUR_WS_LIMIT)


@functools.lru_cache(maxsize=16)
def _build_fused_blur(batch: int, h: int, w: int, h_real: int, w_real: int,
                      winsize: int, gaussian: bool, tile_h: int = 16,
                      fast: bool = True, split: bool = True,
                      frame_off: int = 0, r_bf16: bool = False):
    from optical_flow_tpu.models.farneback.core import gaussian_window_kernel
    from optical_flow_tpu.pallas.blur_solve import _PAD_S, _factor
    # tile_h == ROW_OFF is the classic band-aligned layout; 2*ROW_OFF
    # (32-row bands, round 4) halves the window DMA count and cuts the
    # R1 overfetch from 2.0x to 1.5x (win_h = tile_h + 16 either way)
    assert _PAD_S == COL_OFF and tile_h in (ROW_OFF, 2 * ROW_OFF)
    assert h % tile_h == 0
    win_h = tile_h + 16
    m = winsize // 2
    if gaussian:
        taps = tuple(float(t) for t in gaussian_window_kernel(winsize))
        inv_area, fac = 1.0, None
    else:
        taps = None
        inv_area, fac = 1.0 / (winsize * winsize), _factor(winsize)
    n_bands = h // tile_h

    def bmap(gi, _anchors):
        return (gi // n_bands, 0, gi % n_bands, 0)

    def smap(gi, _anchors):      # flow: band i-1 (i == 0 -> last band)
        return (gi // n_bands, 0, (gi % n_bands - 1) % n_bands, 0)

    def vmap_(gi, _anchors):     # per-band spill counts (SMEM row)
        return (gi // n_bands, 0, 0)

    n_slots = 2 if w <= DBUF_W_LIMIT else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch * n_bands,),
        in_specs=[
            pl.BlockSpec((1, 5, tile_h, w), bmap,
                         memory_space=pltpu.VMEM),          # R0 band
            pl.BlockSpec((1, 2, tile_h, w), bmap,
                         memory_space=pltpu.VMEM),          # flow band
            pl.BlockSpec(memory_space=pl.ANY),           # R1 full (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, 2, tile_h, w), smap,
                         memory_space=pltpu.VMEM),          # flow out
            pl.BlockSpec((1, 1, n_bands), vmap_,
                         memory_space=pltpu.SMEM),          # spill counts
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, 5, win_h, w),
                       jnp.bfloat16 if r_bf16 else jnp.float32),
            pltpu.VMEM((5, win_h, w),
                       jnp.bfloat16 if r_bf16 else jnp.float32),
        ] + ([pltpu.VMEM((5, win_h, w), jnp.float32)]    # winf (widened)
             if r_bf16 else []) + [
            pltpu.VMEM((5, tile_h, w), jnp.float32),
            pltpu.VMEM((5, 3 * tile_h, w), jnp.float32),    # M ring
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # Mosaic's DEFAULT scoped-VMEM budget is 16 MB — a compiler soft
    # limit, not the hardware (v5e VMEM is 128 MiB).  The fused kernel's
    # scratch is O(Ws): windows + win2 + fbuf + the M ring sum to
    # (n_slots*160 + 160 + 80 + 240) f32 rows of Ws lanes, plus the
    # double-buffered in/out blocks.  Past ~2K widths that exceeds the
    # default, so raise the limit to the analytic need + headroom — this
    # is what lifts FUSED_BLUR_WS_LIMIT from 2304 (the old default-budget
    # ceiling) to MAX_WP.
    rb = 2 if r_bf16 else 4      # R bytes (windows + R0 blocks)
    scratch_bytes = ((n_slots * 5 * win_h + 5 * win_h) * rb
                     + (5 * win_h * 4 if r_bf16 else 0)   # winf
                     + (5 * tile_h + 5 * 3 * tile_h) * 4)
    block_bytes = 2 * (5 * tile_h * rb + (2 * tile_h + 2 * tile_h) * 4)
    vmem_need = (scratch_bytes + block_bytes) * w
    params = pltpu.CompilerParams(
        vmem_limit_bytes=max(vmem_need + (8 << 20), 16 << 20))
    kernel = pl.pallas_call(
        functools.partial(_update_blur_kernel, h_real=h_real,
                          w_real=w_real, n_bands=n_bands, n_slots=n_slots,
                          row_off=ROW_OFF, col_off=COL_OFF, tile_h=tile_h,
                          win_h=win_h,
                          fast=fast, split=split, viol_counts=True,
                          frame_off=frame_off, r_bf16=r_bf16,
                          blur=dict(m=m, taps=taps, inv_area=inv_area,
                                    fac=fac)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, 2, h, w), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, n_bands), jnp.float32),
        ],
        compiler_params=params,
    )
    return kernel


def fused_update_blur_store(R0p, R1p, flowp, h: int, w: int,
                            winsize: int, gaussian: bool = False,
                            tile_h: int = 16, frame_off: int = 0):
    """One fully-fused iterate step in the store layout: displaced-fetch
    update + winsize box/Gaussian blur + regularized 2x2 solve in ONE
    kernel (optflowgf.cpp runs FarnebackUpdateMatrices +
    FarnebackUpdateFlow_Blur per iteration behind the reference's cv2
    call, optical_flow.py:53-59).  M lives only in the kernel's VMEM
    ring, the violation output is a per-band SMEM spill COUNT rather
    than the mask (nothing here consumes the mask; spilled frames are
    replayed whole), and the border-scale field is computed
    analytically in-kernel (no sc operand).  Returns
    (flow_st, n_viol_per).
    flow_st is bitwise equal to
    blur_solve_store(update_matrices_store(...)[0]) whenever
    n_viol_per == 0; frames with spills MUST be recomputed by the caller
    via the exact two-kernel path (the blur consumed uncorrected M) —
    see fused_iterate.update_flow_fused.

    frame_off: pair b reads R0p frame b and R1p frame b + frame_off —
    the chained visualizer passes ONE (N, 5, Hs, Ws) array as both
    operands with frame_off=1 (zero R slices/pads); the batch is sized
    by flowp."""
    B = flowp.shape[0]
    _, _, Hs, Ws = R0p.shape
    assert R0p.shape[0] >= B and R1p.shape[0] >= B + frame_off
    r_bf16 = R0p.dtype == jnp.bfloat16
    assert R1p.dtype == R0p.dtype
    win_h = tile_h + 16
    n_bands = Hs // tile_h
    cols = jnp.arange(Ws)
    col_real = (cols >= COL_OFF) & (cols < COL_OFF + w)
    ys_log = jnp.arange(Hs, dtype=jnp.float32)[None, :, None] - ROW_OFF
    row_real = (ys_log >= 0) & (ys_log <= h - 1)
    yi_st = jnp.clip(jnp.round(ys_log + flowp[:, 1]), 0, h - 1) + ROW_OFF
    yi_st = jnp.where(row_real & col_real[None, None, :], yi_st,
                      jnp.float32(h - 1 + ROW_OFF))
    ymin = jnp.min(yi_st.reshape(B, n_bands, tile_h, Ws), axis=(2, 3))
    anchors = jnp.clip((ymin.astype(jnp.int32) // 8) * 8, 0, Hs - win_h)
    anchors = anchors.reshape(B * n_bands)
    flow_st, counts = _build_fused_blur(
        B, Hs, Ws, h, w, winsize, bool(gaussian), tile_h=tile_h,
        fast=FAST_UNIFORM, split=SPLIT_NONUNIFORM, frame_off=frame_off,
        r_bf16=r_bf16)(
            anchors, R0p, flowp, R1p)     # sc computed in-kernel
    # per-band f32 counts are exact integers (<= 16*Ws < 2^24 per band)
    n_viol_per = jnp.sum(counts, axis=(1, 2)).astype(jnp.int32)
    return flow_st, n_viol_per


def _update_blur_poly_kernel(*refs, has_aux: bool, pe, blur, kw):
    """Fused polyexp + update + blur + solve: the R operands are never
    materialized in HBM — raw padded-image windows (polyexp.build_ip_store
    layout) are DMA'd per band and polyexp.moment_band turns them into
    the R0 band / anchored R1 window in VMEM, bitwise-equal to
    poly_exp_pallas's output (same per-pixel op order).  Everything
    downstream (candidate block, tiers, M ring, blur) is the fused
    update+blur kernel unchanged."""
    if has_aux:
        (anchors_ref, flow_ref, aux0_ref, aux1_ref, ip0, ip1, fl_ref,
         viol_ref, winR, win2R, r0R, fbuf, mbuf, raw1, raw0, raw2,
         sem1, sem0, sem2r) = refs
        aux0 = (aux0_ref[0, 0:1, :], aux0_ref[0, 1:2, :])
        aux1 = (aux1_ref[0, 0:1, :], aux1_ref[0, 1:2, :])
    else:
        (anchors_ref, flow_ref, ip0, ip1, fl_ref, viol_ref, winR, win2R,
         r0R, fbuf, mbuf, raw1, raw0, raw2, sem1, sem0, sem2r) = refs
        aux0 = aux1 = None
    poly = dict(pe=pe, raw1=raw1, raw0=raw0, raw2=raw2, ip0=ip0,
                sem0=sem0, aux0=aux0, aux1=aux1)
    _update_kernel(anchors_ref, r0R, flow_ref, None, ip1, fl_ref,
                   viol_ref, winR, win2R, fbuf, sem1, sem2r,
                   mbuf=mbuf, blur=blur, poly=poly, **kw)


@functools.lru_cache(maxsize=16)
def _build_fused_blur_poly(batch: int, h: int, w: int, h_real: int,
                           w_real: int, winsize: int, gaussian: bool,
                           poly_n: int, poly_sigma: float, pre_taps,
                           in_bf16: bool, tile_h: int = 16,
                           fast: bool = True, split: bool = True):
    from optical_flow_tpu.models.farneback.core import gaussian_window_kernel
    from optical_flow_tpu.models.farneback.params import poly_exp_weights
    from optical_flow_tpu.pallas.blur_solve import _PAD_S, _factor
    assert _PAD_S == COL_OFF and tile_h == ROW_OFF
    pe_pad = ((max(poly_n, 1) + 7) // 8) * 8
    assert pe_pad == COL_OFF, "fused polyexp needs the polyexp pad to " \
        "match the store column offset (poly_n <= 8)"
    win_h = tile_h + 16
    g, xg, xxg, ig11, ig03, ig33, ig55 = poly_exp_weights(poly_n,
                                                          poly_sigma)
    pe = dict(n=poly_n, pad=pe_pad, out_w=w - 2 * pe_pad,
              g=tuple(float(x) for x in g),
              xg=tuple(float(x) for x in xg),
              xxg=tuple(float(x) for x in xxg),
              ig11=ig11, ig03=ig03, ig33=ig33, ig55=ig55,
              pre=pre_taps, h_real=h_real, w_real=w_real,
              in_bf16=in_bf16)
    m = winsize // 2
    if gaussian:
        taps = tuple(float(t) for t in gaussian_window_kernel(winsize))
        inv_area, fac = 1.0, None
    else:
        taps = None
        inv_area, fac = 1.0 / (winsize * winsize), _factor(winsize)
    n_bands = h // tile_h
    has_aux = pre_taps is not None
    raw_dtype = jnp.bfloat16 if in_bf16 else jnp.float32

    def bmap(gi, _anchors):
        return (gi // n_bands, 0, gi % n_bands, 0)

    def smap(gi, _anchors):      # flow: band i-1 (i == 0 -> last band)
        return (gi // n_bands, 0, (gi % n_bands - 1) % n_bands, 0)

    def vmap_(gi, _anchors):     # per-band spill counts (SMEM row)
        return (gi // n_bands, 0, 0)

    def amap(gi, _anchors):      # aux: per-frame v-smoothed edge rows
        return (gi // n_bands, 0, 0)

    n_slots = 2 if w <= DBUF_W_LIMIT else 1
    in_specs = [pl.BlockSpec((1, 2, tile_h, w), bmap,
                             memory_space=pltpu.VMEM)]          # flow band
    if has_aux:
        in_specs += [pl.BlockSpec((1, 2, w), amap,
                                  memory_space=pltpu.VMEM)] * 2  # aux0/1
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),              # ip0
                 pl.BlockSpec(memory_space=pl.ANY)]              # ip1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch * n_bands,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 2, tile_h, w), smap,
                         memory_space=pltpu.VMEM),          # flow out
            pl.BlockSpec((1, 1, n_bands), vmap_,
                         memory_space=pltpu.SMEM),          # spill counts
        ],
        scratch_shapes=[
            pltpu.VMEM((5, win_h, w), jnp.float32),          # R1 window
            pltpu.VMEM((5, win_h, w), jnp.float32),          # pass-2 win
            pltpu.VMEM((5, tile_h, w), jnp.float32),         # R0 band
            pltpu.VMEM((5, tile_h, w), jnp.float32),         # fbuf
            pltpu.VMEM((5, 3 * tile_h, w), jnp.float32),     # M ring
            pltpu.VMEM((n_slots, win_h + 16, w), raw_dtype),  # raw R1
            pltpu.VMEM((n_slots, tile_h + 16, w), raw_dtype),  # raw R0
            pltpu.VMEM((win_h + 16, w), raw_dtype),          # raw pass-2
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    raw_frac = 0.5 if in_bf16 else 1.0
    scratch_rows = (2 * 5 * win_h + 5 * tile_h + 5 * tile_h
                    + 5 * 3 * tile_h
                    + raw_frac * (n_slots * (win_h + 16)
                                  + n_slots * (tile_h + 16)
                                  + (win_h + 16))
                    # moment_band live temporaries: 24 f32 rows per RAW
                    # window row (polyexp._build's calibrated form) at
                    # EACH of the three in-kernel call sites (R1 window,
                    # R0 band, pass-2 window) — Mosaic stack-allocates
                    # them without cross-call reuse (576x1024 measured
                    # 19.76M scoped vs 7.5M with a single-site term)
                    + 24 * ((win_h + 16) + (tile_h + 16) + (win_h + 16)))
    block_rows = 2 * (2 * tile_h + 2 * tile_h + (2 * 2 if has_aux else 0))
    vmem_need = int((scratch_rows + block_rows) * w * 4)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=max(vmem_need + (8 << 20), 16 << 20))
    kw = dict(h_real=h_real, w_real=w_real, n_bands=n_bands,
              n_slots=n_slots, row_off=ROW_OFF, col_off=COL_OFF,
              tile_h=tile_h, win_h=win_h, fast=fast, split=split,
              viol_counts=True)
    kernel = pl.pallas_call(
        functools.partial(_update_blur_poly_kernel, has_aux=has_aux,
                          pe=pe, blur=dict(m=m, taps=taps,
                                           inv_area=inv_area, fac=fac),
                          kw=kw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, 2, h, w), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, n_bands), jnp.float32),
        ],
        compiler_params=params,
    )
    return kernel


def fused_update_blur_store_poly(ip0, ip1, aux0, aux1, flowp, h: int,
                                 w: int, winsize: int,
                                 gaussian: bool = False, *,
                                 poly_n: int, poly_sigma: float,
                                 pre_taps=None, in_bf16: bool = False):
    """One fully-fused polyexp + iterate step in the store layout: the
    5-channel R fields never exist in HBM.  ip0/ip1 are the frames'
    padded polyexp inputs (polyexp.build_ip_store, (B, Hs, Ws) — Hs/Ws
    must match flowp's store layout), aux0/aux1 the level-0 v-smoothed
    edge rows (None unless pre_taps).  Returns (flow_st, n_viol_per),
    bitwise equal to fused_update_blur_store on R = poly_exp_pallas(img)
    whenever n_viol_per == 0; spilled frames MUST be replayed by the
    caller through the exact materialized-R path (fused_iterate)."""
    B, _, Hs, Ws = flowp.shape
    assert ip0.shape == (B, Hs, Ws) and ip1.shape == (B, Hs, Ws)
    tile_h = 16
    win_h = tile_h + 16
    n_bands = Hs // tile_h
    cols = jnp.arange(Ws)
    col_real = (cols >= COL_OFF) & (cols < COL_OFF + w)
    ys_log = jnp.arange(Hs, dtype=jnp.float32)[None, :, None] - ROW_OFF
    row_real = (ys_log >= 0) & (ys_log <= h - 1)
    yi_st = jnp.clip(jnp.round(ys_log + flowp[:, 1]), 0, h - 1) + ROW_OFF
    yi_st = jnp.where(row_real & col_real[None, None, :], yi_st,
                      jnp.float32(h - 1 + ROW_OFF))
    ymin = jnp.min(yi_st.reshape(B, n_bands, tile_h, Ws), axis=(2, 3))
    anchors = jnp.clip((ymin.astype(jnp.int32) // 8) * 8, 16,
                       Hs - win_h)
    anchors = anchors.reshape(B * n_bands)
    kernel = _build_fused_blur_poly(
        B, Hs, Ws, h, w, winsize, bool(gaussian), int(poly_n),
        float(poly_sigma),
        None if pre_taps is None else tuple(float(t) for t in pre_taps),
        bool(in_bf16), fast=FAST_UNIFORM, split=SPLIT_NONUNIFORM)
    if pre_taps is not None:
        flow_st, counts = kernel(anchors, flowp, aux0, aux1, ip0, ip1)
    else:
        flow_st, counts = kernel(anchors, flowp, ip0, ip1)
    n_viol_per = jnp.sum(counts, axis=(1, 2)).astype(jnp.int32)
    return flow_st, n_viol_per


def _fused_blur_emit_chunked(fl_ref, mbuf, mvals, i, jx, x0, *, n_bands: int,
                             n_x: int, cw: int, tile_h: int, h_img: int,
                             w_img: int, row_off: int, col_off: int, m,
                             taps, inv_area, fac):
    """Chunked twin of _fused_blur_emit: the M ring is FULL-WIDTH
    (5, 3*tile_h, Ws) while the update computes (tile_h, cw) chunks, so
    the ring shifts once per band (first chunk) and the blurred/solved
    flow for band i-1 is emitted full-width at the band's LAST chunk step
    — at which point band i-1's (tile_h + 2*8)-row window is fully
    resident, including band i's just-completed top rows.  All replicate
    halo patches (columns and the top/bottom row fixes) are applied to
    the ring at the emission step with static indices, reading sources
    from the ring itself (full band i is available there, unlike the
    per-chunk register values)."""
    from optical_flow_tpu.pallas.blur_solve import _blur_solve_body
    PAD = col_off                       # == blur_solve._PAD_S
    Ws = mbuf.shape[2]

    # 1. at the band's first chunk, shift the ring up one band
    @pl.when(jx == 0)
    def _():
        for c in range(5):
            rolled = mbuf[c, tile_h:3 * tile_h, :]
            mbuf[c, 0:2 * tile_h, :] = rolled

    # 2. append this chunk's M to the current band's slot (x0 = jx*cw is
    # dynamic: lane-tile aligned because cw is a 128-multiple)
    xds = pl.ds(pl.multiple_of(x0, TILE_W), cw)
    for c in range(5):
        mbuf[c, 2 * tile_h:3 * tile_h, xds] = mvals[c]

    rb = row_off + h_img - 1            # last real image store row
    i_b, rb_l = rb // tile_h, rb % tile_h
    n1 = min(8, tile_h - 1 - rb_l)
    n2 = 8 - n1

    @pl.when(jx == n_x - 1)
    def _():
        # 3. replicate halo patches on the completed band i (full-width,
        # static indices).  Column halos first so the row patches below
        # broadcast already-patched rows.
        for c in range(5):
            mbuf[c, 2 * tile_h:3 * tile_h, 0:col_off] = jnp.broadcast_to(
                mbuf[c, 2 * tile_h:3 * tile_h, col_off:col_off + 1],
                (tile_h, col_off))
            mbuf[c, 2 * tile_h:3 * tile_h, col_off + w_img:] = \
                jnp.broadcast_to(
                    mbuf[c, 2 * tile_h:3 * tile_h,
                         col_off + w_img - 1:col_off + w_img],
                    (tile_h, Ws - col_off - w_img))

        # top row halo: store rows [row_off-8, row_off) <- image row 0
        # (= band 1's row 0 = ring row 2*tile_h at i == 1); band 0's last
        # 8 rows sit at ring rows [2*tile_h-8, 2*tile_h) post-shift
        @pl.when(i == 1)
        def _():
            for c in range(5):
                mbuf[c, 2 * tile_h - 8:2 * tile_h, :] = jnp.broadcast_to(
                    mbuf[c, 2 * tile_h:2 * tile_h + 1, :], (8, Ws))

        # bottom row halo: store rows (rb, rb+8] <- row rb; n1 rows in
        # band i_b, n2 in band i_b+1 (sourced from the ring one band
        # later).  Rows beyond rb+8 stay 0 (sc == 0 there).
        if n1 > 0:
            @pl.when(i == i_b)
            def _():
                for c in range(5):
                    mbuf[c, 2 * tile_h + rb_l + 1:
                         2 * tile_h + rb_l + 1 + n1, :] = jnp.broadcast_to(
                        mbuf[c, 2 * tile_h + rb_l:2 * tile_h + rb_l + 1, :],
                        (n1, Ws))
        if n2 > 0:
            @pl.when(i == i_b + 1)
            def _():
                for c in range(5):
                    src = mbuf[c, tile_h + rb_l:tile_h + rb_l + 1, :]
                    mbuf[c, 2 * tile_h:2 * tile_h + n2, :] = \
                        jnp.broadcast_to(src, (n2, Ws))

        # 4. emit flow band i-1 (bands 0 and n_bands-1 are pure halo)
        @pl.when(i < 2)
        def _():
            fl_ref[0, 0] = jnp.zeros((tile_h, Ws), jnp.float32)
            fl_ref[0, 1] = jnp.zeros((tile_h, Ws), jnp.float32)

        @pl.when(i >= 2)
        def _():
            fl_ref[0, 0, :, :PAD] = jnp.zeros((tile_h, PAD), jnp.float32)
            fl_ref[0, 1, :, :PAD] = jnp.zeros((tile_h, PAD), jnp.float32)
            fl_ref[0, 0, :, Ws - PAD:] = jnp.zeros((tile_h, PAD),
                                                   jnp.float32)
            fl_ref[0, 1, :, Ws - PAD:] = jnp.zeros((tile_h, PAD),
                                                   jnp.float32)
            # band i-1's window = ring rows [tile_h-8, 2*tile_h+8)
            _blur_solve_body(mbuf, fl_ref, m=m, pad=PAD,
                             out_w=Ws - 2 * PAD, col0=PAD,
                             inv_area=inv_area, taps=taps, fac=fac,
                             out_rows=tile_h, row0=tile_h - 8)


def _update_blur_kernel_chunked(ay_ref, ax_ref, r0_ref, flow_ref, r1_hbm,
                                fl_ref, viol_ref, win, win2, fbuf, mbuf,
                                sem, sem2, **kw):
    """Fused chunked variant: same chunked update machinery, the M slot is
    the full-width flow output, the extra mbuf scratch is the persistent
    full-width M ring, and the border scale is analytic in-kernel."""
    _update_kernel_chunked(ay_ref, ax_ref, r0_ref, flow_ref, None, r1_hbm,
                           fl_ref, viol_ref, win, win2, fbuf, sem, sem2,
                           mbuf=mbuf, **kw)


def fused_blur_chunked_supported(h: int, w: int, winsize: int) -> bool:
    """Widths beyond the full-width fused kernel (> MAX_WP padded lanes,
    e.g. 5K-8K frames) where the column-chunked fused variant applies."""
    Ws0 = _ceil(w + 2 * COL_OFF, TILE_W)
    return (3 <= winsize <= 2 * COL_OFF + 1
            and FUSED_BLUR_WS_LIMIT < Ws0 <= MAX_WP_CHUNKED
            and _ceil(h, TILE_H) >= WIN_H)


@functools.lru_cache(maxsize=8)
def _build_fused_blur_chunked(batch: int, Hs: int, Ws: int, h_real: int,
                              w_real: int, winsize: int, gaussian: bool,
                              n_x: int, cw: int, xwin: int,
                              tile_h: int = 16):
    from optical_flow_tpu.models.farneback.core import gaussian_window_kernel
    from optical_flow_tpu.pallas.blur_solve import _PAD_S, _factor
    assert _PAD_S == COL_OFF and tile_h == ROW_OFF and n_x * cw == Ws
    m = winsize // 2
    if gaussian:
        taps = tuple(float(t) for t in gaussian_window_kernel(winsize))
        inv_area, fac = 1.0, None
    else:
        taps = None
        inv_area, fac = 1.0 / (winsize * winsize), _factor(winsize)
    n_bands = Hs // tile_h

    def bmap(gi, _ay, _ax):
        return (gi // (n_bands * n_x), 0, (gi // n_x) % n_bands, gi % n_x)

    def smap(gi, _ay, _ax):     # flow: band i-1, full width
        return (gi // (n_bands * n_x), 0,
                ((gi // n_x) % n_bands - 1) % n_bands, 0)

    def vmap_(gi, _ay, _ax):    # per-band spill counts (SMEM row)
        return (gi // (n_bands * n_x), 0, 0)

    n_slots = 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch * n_bands * n_x,),
        in_specs=[
            pl.BlockSpec((1, 5, tile_h, cw), bmap,
                         memory_space=pltpu.VMEM),          # R0 chunk
            pl.BlockSpec((1, 2, tile_h, cw), bmap,
                         memory_space=pltpu.VMEM),          # flow chunk
            pl.BlockSpec(memory_space=pl.ANY),           # R1 full (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, 2, tile_h, Ws), smap,
                         memory_space=pltpu.VMEM),          # flow band out
            pl.BlockSpec((1, 1, n_bands), vmap_,
                         memory_space=pltpu.SMEM),          # spill counts
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, 5, WIN_H, xwin), jnp.float32),
            pltpu.VMEM((5, WIN_H, xwin), jnp.float32),
            pltpu.VMEM((5, tile_h, cw), jnp.float32),
            pltpu.VMEM((5, 3 * tile_h, Ws), jnp.float32),   # M ring
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # analytic scoped-VMEM need: chunk-sized window/fbuf/in-blocks plus
    # the full-width ring and (double-buffered) full-width flow out block
    vmem_need = ((n_slots * 5 * WIN_H + 5 * WIN_H) * xwin
                 + (5 * tile_h + 2 * (5 * tile_h + 2 * tile_h)) * cw
                 + (5 * 3 * tile_h + 2 * 2 * tile_h) * Ws) * 4
    params = pltpu.CompilerParams(
        vmem_limit_bytes=max(vmem_need + (8 << 20), 16 << 20))
    kernel = pl.pallas_call(
        functools.partial(_update_blur_kernel_chunked, h_real=h_real,
                          w_real=w_real, n_bands=n_bands, n_x=n_x, cw=cw,
                          xwin=xwin, n_slots=n_slots, row_off=ROW_OFF,
                          col_off=COL_OFF, tile_h=tile_h,
                          viol_counts=True,
                          blur=dict(m=m, taps=taps, inv_area=inv_area,
                                    fac=fac)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, 2, Hs, Ws), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, n_bands), jnp.float32),
        ],
        compiler_params=params,
    )
    return kernel


def fused_update_blur_store_chunked(R0p, R1p, flowp, h: int, w: int,
                                    winsize: int, gaussian: bool = False):
    """Column-chunked twin of fused_update_blur_store for wide frames
    (padded width > MAX_WP, e.g. 5K-8K).  Same contract: one fully-fused
    iterate step in the store layout, M only ever in the kernel's VMEM
    ring, (flow_st, n_viol_per) out; frames with spills MUST be replayed
    by the caller through the exact two-kernel path.  The store layout's
    Ws must equal n_x * cw from _chunk_geometry (fused_iterate pads
    accordingly)."""
    B, _, Hs, Ws = R0p.shape
    tile_h = 16
    n_bands = Hs // tile_h
    n_x, cw, xwin = _chunk_geometry(Ws)
    assert n_x * cw == Ws, (
        "caller must pad Ws to n_x*cw from _chunk_geometry "
        f"(got Ws={Ws}, n_x={n_x}, cw={cw})")
    cols = jnp.arange(Ws)
    col_real = (cols >= COL_OFF) & (cols < COL_OFF + w)
    ys_log = jnp.arange(Hs, dtype=jnp.float32)[None, :, None] - ROW_OFF
    row_real = (ys_log >= 0) & (ys_log <= h - 1)
    real = row_real & col_real[None, None, :]
    yi_st = jnp.clip(jnp.round(ys_log + flowp[:, 1]), 0, h - 1) + ROW_OFF
    yi_st = jnp.where(real, yi_st, jnp.float32(h - 1 + ROW_OFF))
    ymin = jnp.min(yi_st.reshape(B, n_bands, tile_h, n_x, cw), axis=(2, 4))
    ay = jnp.clip((ymin.astype(jnp.int32) // 8) * 8, 0, Hs - WIN_H)
    xs_log = jnp.arange(Ws, dtype=jnp.float32)[None, None, :] - COL_OFF
    xi_st = jnp.clip(jnp.round(xs_log + flowp[:, 0]), 0, w - 1) + COL_OFF
    xi_st = jnp.where(real, xi_st, jnp.float32(w - 1 + COL_OFF))
    xmin = jnp.min(xi_st.reshape(B, n_bands, tile_h, n_x, cw), axis=(2, 4))
    ax = jnp.clip((xmin.astype(jnp.int32) // TILE_W) * TILE_W,
                  0, Ws - xwin)
    flow_st, counts = _build_fused_blur_chunked(
        B, Hs, Ws, h, w, winsize, bool(gaussian), n_x, cw, xwin)(
            ay.reshape(-1), ax.reshape(-1), R0p, flowp, R1p)
    n_viol_per = jnp.sum(counts, axis=(1, 2)).astype(jnp.int32)
    return flow_st, n_viol_per


def _update_kernel_chunked(ay_ref, ax_ref, r0_ref, flow_ref, sc_ref, r1_hbm,
                           m_ref, viol_ref, win, win2, fbuf, sem, sem2, *,
                           h_real: int, w_real: int, n_bands: int, n_x: int,
                           cw: int, xwin: int, n_slots: int,
                           row_off: int = 0, col_off: int = 0,
                           tile_h: int = TILE_H, blur=None, mbuf=None,
                           viol_counts: bool = False):
    """Column-chunked twin of _update_kernel for wide frames (> MAX_WP).

    Grid: (B * H/tile_h * n_x,) — each step one (tile_h, cw) block.  The
    R1 window is anchored in BOTH axes ((5, WIN_H, xwin) at the block's
    min fetched row and min fetched lane-tile, both precomputed and
    scalar-prefetched), so VMEM and Mosaic program size are O(cw),
    independent of W — the two quantities that made the full-width kernel
    top out at ~4K widths.  Source pixels outside the x-window spill
    exactly like out-of-row-window ones: in-kernel second-chance pass
    (re-anchored in both axes), then the bounded XLA correction — the
    three-tier exactness contract is unchanged.  Kept separate from
    _update_kernel so the tuned <=4K path stays byte-for-byte and
    instruction-for-instruction identical.

    row_off/col_off/tile_h/blur/mbuf/viol_counts: the fused store-layout
    mode (see _fused_blur_emit_chunked) — operands arrive in the shifted
    'store' layout, M chunks accumulate in a persistent full-width 3-band
    VMEM ring, and each band's last chunk step emits the blurred/solved
    flow for band i-1 full-width.  Defaults preserve the plain wide-frame
    path bit-for-bit.
    """
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    jx = gi % n_x
    i = (gi // n_x) % n_bands
    Hp = r1_hbm.shape[2]
    n_sub_tot = r1_hbm.shape[3] // TILE_W
    wl_tot = r1_hbm.shape[3]
    H, W = h_real, w_real
    xt_tiles = xwin // TILE_W

    def dma(slot, step):
        return pltpu.make_async_copy(
            r1_hbm.at[step // (n_bands * n_x), :,
                      pl.ds(pl.multiple_of(ay_ref[step], 8), WIN_H),
                      pl.ds(pl.multiple_of(ax_ref[step], TILE_W), xwin)],
            win.at[slot], sem.at[slot])

    slot = jax.lax.rem(gi, n_slots)
    nslot = jax.lax.rem(gi + 1, n_slots)

    @pl.when(gi == 0)
    def _():
        dma(slot, gi).start()

    @pl.when(gi + 1 < n_total)
    def _():
        dma(nslot, gi + 1).start()

    dx = flow_ref[0, 0]
    dy = flow_ref[0, 1]
    x0 = jx * cw
    ys = (i * tile_h - row_off
          + jax.lax.broadcasted_iota(jnp.int32, (tile_h, cw), 0)
          ).astype(jnp.float32)
    xs = (x0 - col_off
          + jax.lax.broadcasted_iota(jnp.int32, (tile_h, cw), 1)
          ).astype(jnp.float32)
    x1 = jnp.round(xs + dx)
    y1 = jnp.round(ys + dy)
    inside = ((x1 >= 0) & (x1 <= W - 1) & (y1 >= 0) & (y1 <= H - 1)
              & (xs <= W - 1) & (ys <= H - 1))
    if row_off or col_off:
        # store layout: halo pixels (own coords outside the real image)
        # never fetch — R0 fallback, zeroed by sc == 0 there
        inside = inside & (xs >= 0) & (ys >= 0)
    xi = jnp.clip(x1, 0, W - 1).astype(jnp.int32) + col_off
    yi = jnp.clip(y1, 0, H - 1).astype(jnp.int32) + row_off

    row_in_band = jax.lax.broadcasted_iota(jnp.int32, (tile_h, cw), 0)
    xt = xi // TILE_W               # global lane-tile of the source
    lane = xi % TILE_W

    def emit_viol(mask=None):
        if viol_counts:
            # per-band SMEM count, accumulated across the band's chunks
            cnt = (jnp.float32(0.0) if mask is None
                   else jnp.sum(mask.astype(jnp.float32)))
            prev = jnp.where(jx == 0, jnp.float32(0.0), viol_ref[0, 0, i])
            viol_ref[0, 0, i] = prev + cnt
        else:
            viol_ref[0, 0] = (jnp.zeros((tile_h, cw), jnp.float32)
                              if mask is None
                              else mask.astype(jnp.float32))

    def fetch_pass(load, sy, axt, active, gated=False, vmax=V_MAX,
                   sub_scalars=None):
        """Candidate-block pass; same shape as _update_kernel.fetch_pass
        plus the x-window containment (xt within [axt, axt + xt_tiles))."""
        lr = yi - sy
        in_w = (lr >= 0) & (lr < WIN_H) & (xt >= axt) \
            & (xt < axt + xt_tiles)
        act = active & in_w
        rel = lr - row_in_band
        covered_rows = []
        for rg in range(tile_h // 8):
            rsl = slice(rg * 8, rg * 8 + 8)
            covered_cols = []
            for j in range(cw // TILE_W):
                sl = slice(j * TILE_W, (j + 1) * TILE_W)
                aj = act[rsl, sl]
                relj = rel[rsl, sl]
                xtj = xt[rsl, sl]
                lnj = lane[rsl, sl]
                if sub_scalars is not None:
                    v_lo, t_lo = sub_scalars[rg * (cw // TILE_W) + j]
                else:
                    v_lo = jnp.min(jnp.where(aj, relj, WIN_H))
                    t_lo = jnp.min(jnp.where(aj, xtj, axt + xt_tiles - 1))
                cov = (aj & (relj < v_lo + vmax) & (xtj < t_lo + T_MAX))
                covered_cols.append(cov)

                def subtile_work(v_lo=v_lo, t_lo=t_lo, cov=cov, relj=relj,
                                 xtj=xtj, lnj=lnj, rsl=rsl, sl=sl, rg=rg,
                                 seed_fbuf=gated):
                    if seed_fbuf:
                        acc = tuple(fbuf[c, rsl, sl] for c in range(5))
                    else:
                        acc = tuple(jnp.zeros((8, TILE_W), jnp.float32)
                                    for _ in range(5))

                    def kv_body(kv, acc):
                        # candidate v is relative to the band-local row;
                        # this subtile's rows sit 8*rg below the band top
                        vv = v_lo + kv + 8 * rg
                        v8 = pl.multiple_of(
                            jnp.clip((vv // 8) * 8, 0, WIN_H - 16), 8)
                        sh = vv - v8
                        for kt in range(T_MAX):
                            t = jnp.clip(t_lo + kt, axt,
                                         axt + xt_tiles - 1)
                            sel = cov & (relj == v_lo + kv) & (xtj == t)
                            off = pl.multiple_of((t - axt) * TILE_W,
                                                 TILE_W)
                            new = []
                            for c in range(5):
                                blk16 = load(c, v8, off)
                                diag = pltpu.roll(blk16, -sh, 0)[:8]
                                vals = jnp.take_along_axis(diag, lnj,
                                                           axis=1)
                                new.append(jnp.where(sel, vals, acc[c]))
                            acc = tuple(new)
                        return acc

                    if gated:
                        acc = jax.lax.fori_loop(0, vmax, kv_body, acc)
                    else:
                        for kv in range(vmax):
                            acc = kv_body(kv, acc)
                    for c in range(5):
                        fbuf[c, rsl, sl] = acc[c]

                if gated:
                    pl.when(jnp.any(aj))(subtile_work)
                else:
                    subtile_work()
            covered_rows.append(jnp.concatenate(covered_cols, axis=-1))
        return (covered_rows[0] if tile_h == 8
                else jnp.concatenate(covered_rows, axis=0))

    def load_win1(c, v8, off):
        return win[slot, c, pl.ds(v8, 16), pl.ds(off, TILE_W)]

    ay1 = ay_ref[gi]
    ax1 = ax_ref[gi] // TILE_W       # window origin tile (pass 1)

    def split_passes(sub_scalars):
        """Split non-uniform branch (see _update_kernel.split_passes):
        quick vmax=1 fill, per-subtile-gated in-window fori pass over the
        residual, then the re-anchored second-chance window."""
        covered_q = fetch_pass(load_win1, ay1, ax1, inside, vmax=1,
                               sub_scalars=sub_scalars)
        rem = inside & jnp.logical_not(covered_q)
        covered_g = fetch_pass(load_win1, ay1, ax1, rem, gated=True,
                               vmax=V2_MAX)
        spill = rem & jnp.logical_not(covered_g)

        @pl.when(jnp.any(spill))
        def _():
            sy2 = pl.multiple_of(jnp.clip(
                (jnp.min(jnp.where(spill, yi, Hp - 1)) // 8) * 8,
                0, Hp - WIN_H), 8)
            sx2 = pl.multiple_of(jnp.clip(
                jnp.min(jnp.where(spill, xt, n_sub_tot - 1)) * TILE_W,
                0, wl_tot - xwin), TILE_W)
            cp2 = pltpu.make_async_copy(
                r1_hbm.at[gi // (n_bands * n_x), :, pl.ds(sy2, WIN_H),
                          pl.ds(sx2, xwin)], win2, sem2)
            cp2.start()
            cp2.wait()
            covered2 = fetch_pass(
                lambda c, v8, off: win2[c, pl.ds(v8, 16),
                                        pl.ds(off, TILE_W)],
                sy2, sx2 // TILE_W, spill, gated=True, vmax=V2_MAX)
            emit_viol(spill & jnp.logical_not(covered2))

        @pl.when(jnp.logical_not(jnp.any(spill)))
        def _():
            emit_viol()

    # band-uniformity pre-sweep (see _update_kernel): one branch per block
    lr1 = yi - ay1
    in_w1 = ((lr1 >= 0) & (lr1 < WIN_H) & (xt >= ax1)
             & (xt < ax1 + xt_tiles))
    act1 = inside & in_w1
    rel1 = lr1 - row_in_band
    scalars1 = []
    uniform = jnp.all(in_w1 | jnp.logical_not(inside))
    for rg in range(tile_h // 8):
        rsl = slice(rg * 8, rg * 8 + 8)
        for j in range(cw // TILE_W):
            sl = slice(j * TILE_W, (j + 1) * TILE_W)
            aj = act1[rsl, sl]
            relj = rel1[rsl, sl]
            xtj = xt[rsl, sl]
            v_lo = jnp.min(jnp.where(aj, relj, WIN_H))
            v_hi = jnp.max(jnp.where(aj, relj, -1))
            t_lo = jnp.min(jnp.where(aj, xtj, ax1 + xt_tiles - 1))
            t_hi = jnp.max(jnp.where(aj, xtj, 0))
            scalars1.append((v_lo, t_lo))
            uniform = uniform & (v_hi <= v_lo) & (t_hi < t_lo + T_MAX)

    dma(slot, gi).wait()

    @pl.when(uniform)
    def _():
        fetch_pass(load_win1, ay1, ax1, inside, vmax=1,
                   sub_scalars=scalars1)
        emit_viol()

    @pl.when(jnp.logical_not(uniform))
    def _():
        split_passes(sub_scalars=scalars1)

    fetched = jnp.stack([fbuf[c] for c in range(5)])

    r0 = r0_ref[0]
    f0 = fetched[0]
    f1 = fetched[1]
    r4 = jnp.where(inside, (r0[2] + fetched[2]) * 0.5, r0[2])
    r5 = jnp.where(inside, (r0[3] + fetched[3]) * 0.5, r0[3])
    r6 = jnp.where(inside, (r0[4] + fetched[4]) * 0.25, r0[4] * 0.5)
    r2 = (r0[0] - jnp.where(inside, f0, 0.0)) * 0.5 + (r4 * dy + r6 * dx)
    r3 = (r0[1] - jnp.where(inside, f1, 0.0)) * 0.5 + (r6 * dy + r5 * dx)

    if sc_ref is None:
        sc = _analytic_sc(ys, xs, H, W)
    else:
        sc = sc_ref[:]
    r2 = r2 * sc
    r3 = r3 * sc
    r4 = r4 * sc
    r5 = r5 * sc
    r6 = r6 * sc

    mvals = (r4 * r4 + r6 * r6,
             (r4 + r5) * r6,
             r5 * r5 + r6 * r6,
             r4 * r2 + r6 * r3,
             r6 * r2 + r5 * r3)
    if blur is None:
        for c in range(5):
            m_ref[0, c] = mvals[c]
    else:
        # fused blur+solve: M chunks accumulate in the full-width VMEM
        # ring; band i's last chunk step emits flow band i-1.  m_ref is
        # the (full-width) FLOW output block here.
        _fused_blur_emit_chunked(m_ref, mbuf, mvals, i, jx, x0,
                                 n_bands=n_bands, n_x=n_x, cw=cw,
                                 tile_h=tile_h, h_img=H, w_img=W,
                                 row_off=row_off, col_off=col_off, **blur)


def _chunk_geometry(wp: int):
    """(n_x, cw, xwin) for the column-chunked kernel: n_x chunks of cw
    lanes (cw a 128-multiple, wp padded to n_x * cw by the caller) with an
    (cw + XWIN_EXTRA_TILES*128)-lane x-anchored window."""
    n_x = max(1, -(-wp // XCHUNK_TARGET))
    cw = _ceil(-(-wp // n_x), TILE_W)
    xwin = cw + XWIN_EXTRA_TILES * TILE_W
    return n_x, cw, xwin


@functools.lru_cache(maxsize=32)
def _build_chunked(batch: int, h: int, wp2: int, h_real: int, w_real: int,
                   n_x: int, cw: int, xwin: int):
    n_bands = h // TILE_H

    def bmap(gi, _ay, _ax):
        return (gi // (n_bands * n_x), 0, (gi // n_x) % n_bands, gi % n_x)

    def scmap(gi, _ay, _ax):
        return ((gi // n_x) % n_bands, gi % n_x)

    n_slots = 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch * n_bands * n_x,),
        in_specs=[
            pl.BlockSpec((1, 5, TILE_H, cw), bmap,
                         memory_space=pltpu.VMEM),          # R0 block
            pl.BlockSpec((1, 2, TILE_H, cw), bmap,
                         memory_space=pltpu.VMEM),          # flow block
            pl.BlockSpec((TILE_H, cw), scmap,
                         memory_space=pltpu.VMEM),          # border scale
            pl.BlockSpec(memory_space=pl.ANY),           # R1 full (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, 5, TILE_H, cw), bmap,
                         memory_space=pltpu.VMEM),          # M block
            pl.BlockSpec((1, 1, TILE_H, cw), bmap,
                         memory_space=pltpu.VMEM),          # violation mask
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, 5, WIN_H, xwin), jnp.float32),
            pltpu.VMEM((5, WIN_H, xwin), jnp.float32),
            pltpu.VMEM((5, TILE_H, cw), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_update_kernel_chunked, h_real=h_real,
                          w_real=w_real, n_bands=n_bands, n_x=n_x, cw=cw,
                          xwin=xwin, n_slots=n_slots),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, 5, h, wp2), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, h, wp2), jnp.float32),
        ],
    )
    return kernel


def _correct_violations(M, viol, R0, R1, flow, sc):
    """Fix out-of-window pixels with a bounded XLA gather + scatter."""
    _, H, W = R0.shape
    dx = flow[0]
    dy = flow[1]
    flat_mask = viol.reshape(-1)
    idx = jnp.nonzero(flat_mask, size=VIOL_MAX, fill_value=0)[0]
    valid = flat_mask[idx]

    py = (idx // W).astype(jnp.int32)
    px = (idx % W).astype(jnp.int32)
    dxv = flow[0].reshape(-1)[idx]
    dyv = flow[1].reshape(-1)[idx]
    x1 = jnp.round(px.astype(jnp.float32) + dxv)
    y1 = jnp.round(py.astype(jnp.float32) + dyv)
    xi = jnp.clip(x1, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(y1, 0, H - 1).astype(jnp.int32)
    src = yi * W + xi

    R1f = R1.reshape(5, -1)
    R0f = R0.reshape(5, -1)
    scf = sc.reshape(-1)
    fetched = R1f[:, src]          # (5, VIOL_MAX) — small gather
    r0 = R0f[:, idx]
    # violating pixels are always `inside` (outside-image pixels never
    # consult the window), so no fallback branch here
    r4 = (r0[2] + fetched[2]) * 0.5
    r5 = (r0[3] + fetched[3]) * 0.5
    r6 = (r0[4] + fetched[4]) * 0.25
    r2 = (r0[0] - fetched[0]) * 0.5 + (r4 * dyv + r6 * dxv)
    r3 = (r0[1] - fetched[1]) * 0.5 + (r6 * dyv + r5 * dxv)
    s = scf[idx]
    r2 = r2 * s
    r3 = r3 * s
    r4 = r4 * s
    r5 = r5 * s
    r6 = r6 * s
    mvals = jnp.stack([
        r4 * r4 + r6 * r6,
        (r4 + r5) * r6,
        r5 * r5 + r6 * r6,
        r4 * r2 + r6 * r3,
        r6 * r2 + r5 * r3,
    ])                              # (5, VIOL_MAX)

    Mf = M.reshape(5, -1)
    mvals = jnp.where(valid[None, :], mvals, Mf[:, idx])
    Mf = Mf.at[:, idx].set(mvals)
    return Mf.reshape(5, H, W)


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


# Width ceiling for the FULL-WIDTH update kernels (padded lanes).  The
# per-band buffers (two (5, WIN_H, Wp) windows + fbuf + the M/R0/flow/viol
# blocks) total ~2.5 KB/lane-column; past ~4K-class widths they blow the
# 16 MB VMEM budget AND the statically-unrolled per-subtile candidate
# block (Wp/128 subtiles) grows the Mosaic program super-linearly —
# measured: 8K (Wp 7808, 61 subtiles) crashes the compiler outright.
# Wider frames take the COLUMN-CHUNKED variant below (its window is
# anchored in x as well as y, so VMEM and program size are O(chunk), not
# O(W)); only beyond MAX_WP_CHUNKED does the XLA gather path run (exact,
# same numerics either way).
MAX_WP = 4096
MAX_WP_CHUNKED = 16384
# target lanes per column chunk (n_x = ceil(Wp / XCHUNK_TARGET) chunks;
# 8K -> 6 chunks of 1280 lanes = 10 subtiles per program step)
XCHUNK_TARGET = 1280
# extra lane tiles in the x-anchored window beyond the chunk itself:
# T_MAX tiles of slack for the dx-displaced source columns (smooth-flow
# spread within one chunk is small, same argument as the row window)
XWIN_EXTRA_TILES = 2


def supported_shape(h: int, w: int, chunked: bool = False) -> bool:
    """True if the kernel handles this (unpadded) shape.

    chunked=True also admits the column-chunked wide-frame variant
    (standalone batched entry only — the fused store-layout loop keeps
    the full-width limit, so it must call with the default)."""
    wp = _ceil(w + 2 * COL_OFF, TILE_W)
    cap = MAX_WP_CHUNKED if chunked else MAX_WP
    return _ceil(h, TILE_H) >= WIN_H and wp <= cap


def update_matrices_pallas_batched_stats(R0, R1, flow):
    """Batched drop-in replacement for vmap(core.update_matrices), with
    tier observability: returns (M, tiers) where tiers is the (2,) int32
    vector of `tier_flags`.

    R0, R1: (B, 5, H, W); flow: (B, 2, H, W).  Arbitrary H, W with
    ceil(H, 8) >= WIN_H; inputs are zero-padded to (8, 128) multiples (pad
    pixels are outside the real bounds, so they never fetch or count as
    violations) and the result is sliced back.
    """
    B, _, H, W = R0.shape
    if not supported_shape(H, W, chunked=True):
        raise ValueError(f"shape ({H},{W}) not supported by the kernel")
    Hp = _ceil(H, TILE_H)
    Wp = _ceil(W, TILE_W)
    chunked = Wp > MAX_WP
    if chunked:
        # wide frames: pad the lane count to n_x equal chunks
        n_x, cw, xwin = _chunk_geometry(Wp)
        Wp = n_x * cw
    if (Hp, Wp) != (H, W):
        pad = [(0, 0), (0, 0), (0, Hp - H), (0, Wp - W)]
        R0p = jnp.pad(R0, pad)
        R1p = jnp.pad(R1, pad)
        flowp = jnp.pad(flow, pad)
    else:
        R0p, R1p, flowp = R0, R1, flow
    # traced border field: O(1) program size (the host constant was 8 MB
    # at 1080p / 132 MB at 8K baked into every executable)
    sc = border_scale_field_traced(H, W)
    scp = border_scale_field_traced(H, W, Hp, Wp)
    # per-band window anchors, precomputed so the kernel can prefetch
    n_bands = Hp // TILE_H
    ys_all = jnp.arange(Hp, dtype=jnp.float32)[None, :, None]
    yi_all = jnp.clip(jnp.round(ys_all + flowp[:, 1]), 0, H - 1)
    if chunked:
        # per-(band, column-chunk) anchors in BOTH axes
        ymin = jnp.min(yi_all.reshape(B, n_bands, TILE_H, n_x, cw),
                       axis=(2, 4))
        ay = jnp.clip((ymin.astype(jnp.int32) // 8) * 8, 0, Hp - WIN_H)
        xs_all = jnp.arange(Wp, dtype=jnp.float32)[None, None, :]
        xi_all = jnp.clip(jnp.round(xs_all + flowp[:, 0]), 0, W - 1)
        xmin = jnp.min(xi_all.reshape(B, n_bands, TILE_H, n_x, cw),
                       axis=(2, 4))
        ax = jnp.clip((xmin.astype(jnp.int32) // TILE_W) * TILE_W,
                      0, Wp - xwin)
        Mp, violp = _build_chunked(B, Hp, Wp, H, W, n_x, cw, xwin)(
            ay.reshape(-1), ax.reshape(-1), R0p, flowp, scp, R1p)
    else:
        ymin = jnp.min(yi_all.reshape(B, n_bands, TILE_H, Wp), axis=(2, 3))
        anchors = jnp.clip((ymin.astype(jnp.int32) // 8) * 8, 0, Hp - WIN_H)
        anchors = anchors.reshape(B * n_bands)
        Mp, violp = _build(B, Hp, Wp, H, W, fast=FAST_UNIFORM,
                           split=SPLIT_NONUNIFORM)(
            anchors, R0p, flowp, scp, R1p)
    M = Mp[:, :, :H, :W]
    viol = violp[:, 0, :H, :W] > 0.5

    # three-tier exactness: fast path only (no spills); bounded
    # gather+scatter correction (<= VIOL_MAX spilled pixels per frame);
    # full XLA recompute (pathological flow fields, e.g. dense noise)
    n_viol_per = jnp.sum(viol, axis=(-2, -1))
    n_viol = jnp.sum(n_viol_per)

    def corrected(m):
        return jax.vmap(_correct_violations)(
            m, viol, R0, R1, flow,
            jnp.broadcast_to(sc, (B,) + sc.shape))

    from optical_flow_tpu.models.farneback import core as _core

    def full_recompute(m):
        return _core.update_matrices(R0, R1, flow)

    M = jax.lax.cond(
        jnp.max(n_viol_per) > VIOL_MAX,
        full_recompute,
        lambda m: jax.lax.cond(n_viol > 0, corrected, lambda x: x, m),
        M)
    return M, tier_flags(n_viol_per)


def update_matrices_pallas_batched(R0, R1, flow):
    """Stats-free twin of update_matrices_pallas_batched_stats (same M).
    Eager calls still tick TIER_COUNTS (traced calls must use the _stats
    variant and thread the vector out of their program)."""
    M, tiers = update_matrices_pallas_batched_stats(R0, R1, flow)
    note_tier_stats(tiers)
    return M


def update_matrices_pallas(R0, R1, flow):
    """Single-frame wrapper around the batched kernel."""
    return update_matrices_pallas_batched(
        R0[None], R1[None], flow[None])[0]


def _correct_violations_store(M, viol, R0, R1, flow, sc, *, h, w):
    """Store-layout twin of _correct_violations (fused iterate loop).

    Operands live in the shifted store layout; violating pixels are always
    real-image pixels (the kernel masks halo pixels out of `inside`), so
    logical coordinates are recovered by subtracting the offsets.
    """
    _, Hs, Ws = R0.shape
    flat_mask = viol.reshape(-1)
    idx = jnp.nonzero(flat_mask, size=VIOL_MAX, fill_value=0)[0]
    valid = flat_mask[idx]

    py = (idx // Ws).astype(jnp.int32) - ROW_OFF
    px = (idx % Ws).astype(jnp.int32) - COL_OFF
    dxv = flow[0].reshape(-1)[idx]
    dyv = flow[1].reshape(-1)[idx]
    x1 = jnp.round(px.astype(jnp.float32) + dxv)
    y1 = jnp.round(py.astype(jnp.float32) + dyv)
    xi = jnp.clip(x1, 0, w - 1).astype(jnp.int32) + COL_OFF
    yi = jnp.clip(y1, 0, h - 1).astype(jnp.int32) + ROW_OFF
    src = yi * Ws + xi

    R1f = R1.reshape(5, -1)
    R0f = R0.reshape(5, -1)
    scf = sc.reshape(-1)
    fetched = R1f[:, src]
    r0 = R0f[:, idx]
    r4 = (r0[2] + fetched[2]) * 0.5
    r5 = (r0[3] + fetched[3]) * 0.5
    r6 = (r0[4] + fetched[4]) * 0.25
    r2 = (r0[0] - fetched[0]) * 0.5 + (r4 * dyv + r6 * dxv)
    r3 = (r0[1] - fetched[1]) * 0.5 + (r6 * dyv + r5 * dxv)
    s = scf[idx]
    r2 = r2 * s
    r3 = r3 * s
    r4 = r4 * s
    r5 = r5 * s
    r6 = r6 * s
    mvals = jnp.stack([
        r4 * r4 + r6 * r6,
        (r4 + r5) * r6,
        r5 * r5 + r6 * r6,
        r4 * r2 + r6 * r3,
        r6 * r2 + r5 * r3,
    ])

    Mf = M.reshape(5, -1)
    mvals = jnp.where(valid[None, :], mvals, Mf[:, idx])
    Mf = Mf.at[:, idx].set(mvals)
    return Mf.reshape(5, Hs, Ws)


def _fix_col_halos(m, w):
    m = m.at[:, :, :, :COL_OFF].set(m[:, :, :, COL_OFF:COL_OFF + 1])
    m = m.at[:, :, :, COL_OFF + w:].set(
        m[:, :, :, COL_OFF + w - 1:COL_OFF + w])
    return m


def update_matrices_store(R0p, R1p, flowp, scp, h: int, w: int):
    """FarnebackUpdateMatrices in the fused-loop 'store' layout.

    All operands are pre-shifted by (ROW_OFF, COL_OFF) with alignment halos
    (see pallas/fused_iterate.py); sc is zero outside the real region, so
    halo pixels produce M == 0 before the replicate-halo fixes.  Returns M
    in store layout with valid replicate halos (column halos written by the
    kernel; the 8-row top/bottom halos — whose replicate source rows live
    in other grid bands — via two small in-place row copies).  Exactness
    tiers match update_matrices_pallas_batched (bit-identical to
    core.update_matrices on the real region).  Returns (Mst, tiers) with
    tiers the (2,) int32 `tier_flags` vector (device-side observability).
    """
    B, _, Hs, Ws = R0p.shape
    tile_h = 16                     # taller bands: half the grid steps and
    n_bands = Hs // tile_h          # half the window-DMA overlap vs 8
    cols = jnp.arange(Ws)
    col_real = (cols >= COL_OFF) & (cols < COL_OFF + w)
    ys_log = jnp.arange(Hs, dtype=jnp.float32)[None, :, None] - ROW_OFF
    row_real = (ys_log >= 0) & (ys_log <= h - 1)
    yi_st = jnp.clip(jnp.round(ys_log + flowp[:, 1]), 0, h - 1) + ROW_OFF
    yi_st = jnp.where(row_real & col_real[None, None, :], yi_st,
                      jnp.float32(h - 1 + ROW_OFF))
    ymin = jnp.min(yi_st.reshape(B, n_bands, tile_h, Ws), axis=(2, 3))
    anchors = jnp.clip((ymin.astype(jnp.int32) // 8) * 8, 0, Hs - WIN_H)
    anchors = anchors.reshape(B * n_bands)
    Mst, violp = _build(B, Hs, Ws, h, w, ROW_OFF, COL_OFF, tile_h,
                        fast=FAST_UNIFORM, split=SPLIT_NONUNIFORM)(
                            anchors, R0p, flowp, scp, R1p)
    viol = violp[:, 0] > 0.5

    n_viol_per = jnp.sum(viol, axis=(-2, -1))
    n_viol = jnp.sum(n_viol_per)

    def corrected(m):
        m = jax.vmap(functools.partial(
            _correct_violations_store, h=h, w=w))(
                m, viol, R0p, R1p, flowp,
                jnp.broadcast_to(scp, (B,) + scp.shape))
        # corrections may touch edge pixels: refresh the column halos
        return _fix_col_halos(m, w)

    def full_recompute(m):
        from optical_flow_tpu.models.farneback import core as _core
        sl = (slice(None), slice(None), slice(ROW_OFF, ROW_OFF + h),
              slice(COL_OFF, COL_OFF + w))
        mr = _core.update_matrices(R0p[sl], R1p[sl], flowp[sl])
        return _fix_col_halos(jnp.zeros_like(m).at[sl].set(mr), w)

    Mst = jax.lax.cond(
        jnp.max(n_viol_per) > VIOL_MAX,
        full_recompute,
        lambda m: jax.lax.cond(n_viol > 0, corrected, lambda x: x, m),
        Mst)
    # top/bottom replicate row halos (8 rows each — tiny in-place copies)
    Mst = Mst.at[:, :, ROW_OFF - 8:ROW_OFF].set(
        Mst[:, :, ROW_OFF:ROW_OFF + 1])
    Mst = Mst.at[:, :, ROW_OFF + h:ROW_OFF + h + 8].set(
        Mst[:, :, ROW_OFF + h - 1:ROW_OFF + h])
    return Mst, tier_flags(n_viol_per)
