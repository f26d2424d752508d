"""Fused padded-layout Farnebäck iterate loop (update -> blur+solve).

The standalone kernel wrappers (update_matrices_pallas_batched,
update_flow_blur_solve_pallas) pad and slice their operands at XLA level on
every call; at 1080p x16 those relayout copies measure ~17 ms per iteration
on v5e — as much as the blur kernel itself.  This driver keeps all loop
state in one shared "store" layout for the whole iterations loop, so the
two kernels chain with zero XLA-side relayout copies:

    store row = logical row + ROW_OFF (16)
    store col = logical col + COL_OFF (8)
    Hs = ceil(h, 16) + 32        (16-row top halo band + >=16 bottom rows)
    Ws = ceil(w + 16, 128)       (8-col halos, lane-aligned)

The 8-deep replicate halo that the blur kernel's border taps need is
maintained inside the M array itself: the update kernel writes the column
halos in-register, and two 8-row in-place copies refresh the top/bottom
row halos (their replicate source rows live in other grid bands, which a
band-parallel kernel cannot read).  Flow halos hold finite don't-care
values; the update kernel masks them out of `inside` via its own-coordinate
bounds, and sc == 0 outside the real region zeroes their M contribution.

Semantics are identical to core.update_flow (OpenCV's per-level iterate
loop: FarnebackUpdateMatrices + FarnebackUpdateFlow_Blur in
modules/video/src/optflowgf.cpp — the loop behind the frozen-parameter
calls at reference optical_flow.py:51-59 / visualize_optical_flow.py:38-46);
exactness is preserved through the update kernel's three-tier spill
handling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from optical_flow_tpu.models.farneback.core import border_scale_field_traced
from optical_flow_tpu.pallas.blur_solve import _PAD_S, blur_solve_store
from optical_flow_tpu.pallas.update_gather import (
    COL_OFF,
    ROW_OFF,
    _chunk_geometry,
    fused_blur_chunked_supported,
    fused_blur_supported,
    fused_update_blur_store,
    fused_update_blur_store_chunked,
    supported_shape,
    tier_flags,
    update_matrices_store,
)


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


# Fully-fused update+blur+solve step (update_gather.fused_update_blur_store):
# M stays in a VMEM ring instead of round-tripping HBM — a ~40% byte cut
# on an iterate that the round-4 roofline measured at 84% of the DMA
# ceiling.  Frames whose update spills (tier 2/3) are recomputed through
# the exact two-kernel path via lax.cond (untaken conds are free
# in-pipeline; the bench configs measure tier fires 0/0), so flow output
# and tier semantics stay bit-identical.  Module-global for the A/B
# harness (benchmarks/exp_fused_blur.py).
FUSE_UPDATE_BLUR = True

# Round-4 final fusion attempt: compute the polynomial expansion INSIDE
# the update kernel (pallas/update_gather._update_blur_poly_kernel) —
# the 5-channel f32 R fields never exist in HBM.  Deletes the polyexp
# stage's store + the iterate's R reads (R0 5ch + R1 windows 10ch-units
# of the 19-unit fused iterate) in exchange for re-deriving R from
# 1-channel raw windows each iteration.  Output bitwise-equal to the
# materialized-R fused path (same moment_band op order).  MEASURED A
# DECISIVE LOSS on v5e (benchmarks/exp_fused_polyexp.py, one process,
# honest sync, 1080p B=16): smooth 151.1 -> 102.0 pairs/s (-32%),
# boundary 98.0 -> 64.1 (-35%), outputs bitwise equal in both configs.
# The polyexp split profiler's "compute is nearly free" verdict does
# not transfer into this kernel: three moment_band call sites per band
# (R1 window, R0 band, pass-2 window) triple the vertical-pass work at
# window height (48 raw rows per 16 output rows), their ~24-rows/raw-row
# VMEM temporaries (19.8 MB scoped at 576x1024) crowd out the DMA
# overlap, and the rederivation repeats 3x per level what the
# materialized path stores once.  OFF by default; kept behind the flag
# so the A/B harness reproduces the measurement (same policy as
# SPLIT_NONUNIFORM).  See docs/KERNELS.md "Roofline".
FUSE_POLYEXP = False

# 32-row bands for the fused step: half the window DMAs and a 2.0x ->
# 1.5x R1 overfetch (win_h = tile_h + 16 rows fetched per tile_h output
# rows) — analytically ~12% less L0 iterate traffic.  MEASURED A LOSS
# on v5e (benchmarks/exp_fused_tileh.py, 1080p B=16, bitwise-equal
# outputs): smooth 149.8 -> 145.9 pairs/s with 32-row bands at L0+L1,
# 148.2 restricted to L0 only; boundary flat.  The taller window DMA
# plus the ~1.6x VMEM scratch (worse double-buffer overlap) eat the
# byte cut — same verdict as the polyexp tile-height and 4K dbuf A/Bs:
# the iterate is at its structural floor.  Default stays 16; the knob
# and the 32-band emit machinery remain for the harness.
FUSED_TILE_H_LARGE = 16
FUSED_TILE32_MIN_H = 512


def supported(h: int, w: int, winsize: int) -> bool:
    """True if the fused loop handles this level (both kernels eligible
    and the box half-width fits the baked-in 8-deep store halo).  Wide
    frames (> MAX_WP padded lanes, e.g. 5K-8K) qualify only through the
    column-chunked fused step, so they require FUSE_UPDATE_BLUR."""
    if not 3 <= winsize <= 2 * _PAD_S + 1:
        return False
    if supported_shape(h, w):
        return True
    return FUSE_UPDATE_BLUR and fused_blur_chunked_supported(h, w, winsize)




def fused_store_geometry(h: int, w: int, winsize: int,
                         chain: bool = False):
    """(Hs, Ws) of the store layout update_flow_fused will use for an
    (h, w) level, or None when the level takes a layout a store-emitting
    producer cannot target (the column-chunked wide-frame path repacks
    Ws; the 32-row-band experiment layout changes Hs).  chain=True
    additionally requires the fully-fused step (the chained single-array
    frame offset is a fused-kernel feature, see update_flow_fused's
    r1_frame_off)."""
    if not 3 <= winsize <= 2 * _PAD_S + 1:
        return None
    use_fused = FUSE_UPDATE_BLUR and fused_blur_supported(h, w, winsize)
    if not (use_fused or (supported_shape(h, w) and not chain)):
        return None
    if (use_fused and FUSED_TILE_H_LARGE == 32
            and h >= FUSED_TILE32_MIN_H):
        return None
    return _ceil(h, 16) + 32, _ceil(w + 2 * COL_OFF, 128)


def bf16_store_ok(h: int, w: int, winsize: int) -> bool:
    """True when a bf16 R store may feed this level's iterate: the bf16
    window/band widening lives in the fully-fused step only (the
    two-kernel store path keeps f32 operands), so bf16 emission requires
    it — same gate shape as fused_store_geometry(chain=True)."""
    return FUSE_UPDATE_BLUR and fused_blur_supported(h, w, winsize)


def update_flow_fused(R0, R1, flow, winsize: int, iterations: int,
                      gaussian: bool = False, *, store_layout: bool = False,
                      r1_frame_off: int = 0):
    """Drop-in for core.update_flow on (B, 5/2, h, w) operands: shift into
    the store layout once, run the iterate loop copy-free, slice once.
    Returns (flow, tiers) with tiers the (2,) int32 sum of per-iteration
    `tier_flags` (device-side exactness-tier observability).

    store_layout=True: R0/R1 are ALREADY (B, 5, Hs, Ws) store-layout
    arrays (polyexp.poly_exp_pallas_store emits them directly, deleting
    the R relayout pads below); flow stays logical.  Their shape must
    match fused_store_geometry(h, w, winsize).

    r1_frame_off (store_layout only, fully-fused step only): pair b
    reads R0 frame b and R1 frame b + r1_frame_off — the chained
    visualizer passes ONE (N, 5, Hs, Ws) store array as BOTH operands
    with r1_frame_off=1 and an (N-1)-batch flow, so the overlapping
    Rb[:-1]/Rb[1:] slices never materialize."""
    B, _, h, w = flow.shape
    Hs = _ceil(h, 16) + 32
    Ws = _ceil(w + 2 * COL_OFF, 128)
    use_fused = FUSE_UPDATE_BLUR and fused_blur_supported(h, w, winsize)
    tile_h = (32 if (use_fused and FUSED_TILE_H_LARGE == 32
                     and h >= FUSED_TILE32_MIN_H) else 16)
    if tile_h == 32:
        # 32-band layout: Hs a 32-multiple with the last band pure halo
        # (rows >= Hs-32 must blur to exact zeros, which needs their
        # 17-row windows past the replicated bottom M patch at rows
        # <= ROW_OFF+h+7 — i.e. Hs >= h+64).  The two-kernel replay path
        # runs tile-16 banding on the same layout (Hs is 16-aligned too)
        # and zeroes only [Hs-16, Hs) outright; rows [Hs-32, Hs-16) have
        # all-zero M windows there, so both schemes emit bitwise zeros.
        Hs = _ceil(h + 64, 32)
    use_fused_chunked = (not use_fused and FUSE_UPDATE_BLUR
                         and fused_blur_chunked_supported(h, w, winsize))
    if use_fused_chunked:
        # the chunked kernel needs the padded width to split into n_x
        # equal lane chunks (extra right padding is dead: sc == 0 there)
        n_x, cw, _xwin = _chunk_geometry(Ws)
        Ws = n_x * cw
    pad = [(0, 0), (0, 0), (ROW_OFF, Hs - ROW_OFF - h),
           (COL_OFF, Ws - COL_OFF - w)]
    if store_layout:
        if R0.shape[-2:] != (Hs, Ws):
            raise ValueError(
                f"store-layout R {R0.shape[-2:]} does not match this "
                f"level's iterate layout {(Hs, Ws)} — gate the producer "
                "on fused_store_geometry")
        R0p, R1p = R0, R1
    else:
        R0p = jnp.pad(R0, pad)
        R1p = jnp.pad(R1, pad)
    if r1_frame_off and not (store_layout and use_fused):
        raise ValueError(
            "r1_frame_off needs store-layout operands and the fully-"
            "fused step — gate on fused_store_geometry(chain=True)")
    if R0p.dtype == jnp.bfloat16 and not (store_layout and use_fused):
        raise ValueError(
            "bf16 R operands need the store layout and the fully-fused "
            "step — gate the producer on bf16_store_ok")
    flowp = jnp.pad(flow, pad)

    # scan, not a Python loop: the iteration body (the Mosaic kernels)
    # is compiled ONCE per level instead of `iterations` times — XLA does
    # not CSE identical pallas custom-calls, and the update kernel is the
    # most expensive Mosaic compile in the pipeline (~12 s at 1080p).
    if use_fused:
        scp = border_scale_field_traced(h, w, Hs, Ws, ROW_OFF, COL_OFF)

        def body(fl, _):
            flp, nvp = fused_update_blur_store(R0p, R1p, fl, h, w,
                                               winsize, gaussian,
                                               tile_h=tile_h,
                                               frame_off=r1_frame_off)

            def slow(fl_in):
                # exact recompute: the fused blur consumed M before the
                # spill correction could run (rare; free when untaken).
                # Chained single-array operands slice here — the copies
                # materialize only when the cond fires.  bf16 R widens
                # to f32 here too (exact embedding): the two-kernel
                # replay then reproduces the fused step's values bitwise
                Mst, _t = update_matrices_store(
                    R0p[:B].astype(jnp.float32),
                    R1p[r1_frame_off:r1_frame_off + B].astype(jnp.float32),
                    fl_in, scp, h, w)
                return blur_solve_store(Mst, winsize, gaussian)

            fl_next = jax.lax.cond(jnp.sum(nvp) > 0, slow,
                                   lambda _fl: flp, fl)
            return fl_next, tier_flags(nvp)
    elif use_fused_chunked:
        from optical_flow_tpu.pallas.blur_solve import (
            update_flow_blur_solve_pallas)
        from optical_flow_tpu.pallas.update_gather import (
            update_matrices_pallas_batched_stats)
        sl = (slice(None), slice(None), slice(ROW_OFF, ROW_OFF + h),
              slice(COL_OFF, COL_OFF + w))

        def body(fl, _):
            flp, nvp = fused_update_blur_store_chunked(
                R0p, R1p, fl, h, w, winsize, gaussian)

            def slow(fl_in):
                # exact recompute for spilled frames through the same
                # wide-frame two-kernel path production used pre-fusion
                # (chunked Pallas update + its tier corrections, then the
                # standalone blur) — bitwise-identical results
                M, _t = update_matrices_pallas_batched_stats(
                    R0p[sl], R1p[sl], fl_in[sl])
                fl_log = update_flow_blur_solve_pallas(M, winsize,
                                                       gaussian)
                return jnp.zeros_like(fl_in).at[sl].set(fl_log)

            fl_next = jax.lax.cond(jnp.sum(nvp) > 0, slow,
                                   lambda _fl: flp, fl)
            return fl_next, tier_flags(nvp)
    else:
        scp = border_scale_field_traced(h, w, Hs, Ws, ROW_OFF, COL_OFF)

        def body(fl, _):
            Mst, tiers = update_matrices_store(R0p, R1p, fl, scp, h, w)
            return blur_solve_store(Mst, winsize, gaussian), tiers

    flowp, tiers = jax.lax.scan(body, flowp, None, length=iterations)
    return (flowp[:, :, ROW_OFF:ROW_OFF + h, COL_OFF:COL_OFF + w],
            jnp.sum(tiers, axis=0))


def poly_fused_supported(h: int, w: int, winsize: int, poly_n: int) -> bool:
    """The polyexp-fused iterate: full-width fused shapes only, and the
    polyexp halo must equal the store column offset (poly_n <= 8)."""
    return (FUSE_POLYEXP and fused_blur_supported(h, w, winsize)
            and 3 <= winsize <= 2 * _PAD_S + 1
            and ((max(poly_n, 1) + 7) // 8) * 8 == COL_OFF)


def update_flow_fused_poly(imgs0, imgs1, flow, winsize: int,
                           iterations: int, gaussian: bool = False, *,
                           poly_n: int, poly_sigma: float, pre_taps=None,
                           exact_u8: bool = False):
    """update_flow_fused with the polynomial expansion fused into the
    update kernel: imgs0/imgs1 are the LEVEL IMAGES ((B, h, w); raw
    frames when pre_taps carries the level-0 3-tap smooth), not R.
    Spilled frames replay the exact materialized-R two-kernel path
    (poly_exp_pallas + update_matrices_store + blur_solve_store) under
    lax.cond, so flow and tier semantics stay bit-identical."""
    from optical_flow_tpu.pallas.polyexp import (build_ip_store,
                                                 poly_exp_pallas)
    from optical_flow_tpu.pallas.update_gather import (
        fused_update_blur_store_poly)
    B, h, w = imgs0.shape
    Hs = _ceil(h, 16) + 32
    Ws = _ceil(w + 2 * COL_OFF, 128)
    padf = [(0, 0), (0, 0), (ROW_OFF, Hs - ROW_OFF - h),
            (COL_OFF, Ws - COL_OFF - w)]
    flowp = jnp.pad(flow, padf)
    pre_t = (None if pre_taps is None
             else tuple(float(t) for t in pre_taps))
    in_bf16 = bool(exact_u8) and pre_t is not None
    ip0, aux0 = build_ip_store(imgs0, Hs, Ws, poly_n, pre_t, in_bf16)
    ip1, aux1 = build_ip_store(imgs1, Hs, Ws, poly_n, pre_t, in_bf16)
    scp = border_scale_field_traced(h, w, Hs, Ws, ROW_OFF, COL_OFF)

    def body(fl, _):
        flp, nvp = fused_update_blur_store_poly(
            ip0, ip1, aux0, aux1, fl, h, w, winsize, gaussian,
            poly_n=poly_n, poly_sigma=poly_sigma, pre_taps=pre_t,
            in_bf16=in_bf16)

        def slow(fl_in):
            # exact recompute for spilled frames: materialize R the
            # production way and run the two-kernel store path
            R0 = poly_exp_pallas(imgs0, poly_n, poly_sigma,
                                 pre_taps=pre_t, exact_u8=exact_u8)
            R1 = poly_exp_pallas(imgs1, poly_n, poly_sigma,
                                 pre_taps=pre_t, exact_u8=exact_u8)
            Mst, _t = update_matrices_store(jnp.pad(R0, padf),
                                            jnp.pad(R1, padf),
                                            fl_in, scp, h, w)
            return blur_solve_store(Mst, winsize, gaussian)

        fl_next = jax.lax.cond(jnp.sum(nvp) > 0, slow,
                               lambda _fl: flp, fl)
        return fl_next, tier_flags(nvp)

    flowp, tiers = jax.lax.scan(body, flowp, None, length=iterations)
    return (flowp[:, :, ROW_OFF:ROW_OFF + h, COL_OFF:COL_OFF + w],
            jnp.sum(tiers, axis=0))
