"""Fused polynomial-expansion Pallas kernel (FarnebackPolyExp).

Computes the 5-channel quadratic-fit field R from a grayscale image in one
VMEM pass per 8-row band: the separable (g, x*g, x^2*g) correlation pairs
are evaluated as static shifted slices over a replicate-padded window, and
the inverse-Gram combination is applied in registers.  Window DMAs are
double-buffered across bands so HBM latency overlaps compute.

Semantics identical to core.poly_exp (f32, replicate borders);
differential-tested in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optical_flow_tpu.models.farneback.params import poly_exp_weights

# Band height.  32 measured fastest at 1080p B=16 on v5e (whole-pipeline
# A/B, benchmarks/exp_polyexp_prod.py: 111.6 pairs/s at 16 rows -> 114.5
# at 32, bitwise-identical flow) — the kernel is data-movement bound
# (see docs/KERNELS.md), so halving the grid-step count and cutting the
# window halo overfetch from 2x to 1.5x beats the 16-row default the
# store kernels use.  Taller bands, unlocked by the analytic
# vmem_limit_bytes, are a STANDALONE win only (exp_polyexp_tileh.py on
# v5e: L0 polyexp 76.9 -> 63.8 -> 57.1 ms at 32/48/64 rows, bitwise
# equal) — the whole pipeline is flat (146.6/147.2/146.0 pairs/s, noise)
# because XLA already overlaps polyexp with the iterate-bound critical
# path, so 32 stays.
TILE_H = 32

# 32-row-band width gate.  Originally 2304: Mosaic's DEFAULT scoped-VMEM
# budget is 16 MB and the kernel's in-kernel temporaries grow with
# band_height x padded width (19.65 MB measured at 4K wp=3968).  _build
# now sets vmem_limit_bytes analytically (the default is a compiler soft
# cap, not the 128 MiB v5e hardware), so the gate sits at 4096 = the
# widest single-chunk update width.  Verified on v5e
# (benchmarks/exp_polyexp_4k.py): 4K tile-32 compiles, R and flow
# bitwise-identical to tile-16, whole-pipeline 35.1 -> 35.9 pairs/s.
# Beyond 4096 (8K-class) the 16-row fallback remains.
TILE32_WP_LIMIT = 4096

# Fold the inverse-Gram combination into the correlation taps (see
# _kernel): saves one horizontal accumulator and the whole per-chunk
# combine stage.  Module-global so the A/B harness can flip it.
FUSED_IG = True

# Fuse the pyramid level-0 3-tap pre-smooth into this kernel (the
# separate blur pass measured 14-20 ms at 1080p B=32 on v5e — far above
# its bandwidth floor — while the in-window smooth is a handful of
# vector ops).  Module-global for the A/B harness.
FUSE_PRE_SMOOTH = True

# How the padded input array is materialized before the kernel:
#   "zdus"   — one constant (zero) pad + thin in-place dynamic-update-slice
#              writes for the replicate/reflect borders (bitwise-identical
#              array; measured ~0.8 ms/call cheaper than the edge-mode pad
#              at 1080p B=16 on v5e — jnp.pad(mode='edge'/concatenate)
#              lowers to slow multi-pass copies on this backend)
#   "legacy" — jnp.pad(mode='edge') / concatenate (kept for A/B)
PAD_BUILDER = "zdus"

# Window-DMA pipeline depth (in-flight band windows).  The round-3
# split profiler found the DMA-plus-store skeleton alone costs 9.6 of
# 17 ms at 1080p B=16 — per-band latency, not bandwidth — so prefetching
# more than one band ahead is the lever.  Module-global for the A/B
# harness (benchmarks/exp_polyexp_prod.py, configs like zdus/32/s3/u8).
N_SLOTS = 2

# Images per grid step (1, 2, or 4).  polyexp L0 is DMA issue-latency
# bound, not byte bound (docs/KERNELS.md roofline: 18% of the DMA
# ceiling, and N_SLOTS depth 3/4 measured a no-op) — each band pays a
# fixed window-DMA + store turnaround.  Processing n_imgs batch images
# per grid step issues ONE strided window DMA covering n_imgs images'
# same band rows and divides the grid-step count by n_imgs, amortizing
# the per-step latency.  Module-global for the A/B harness
# (benchmarks/exp_pair_step.py).
PAIR_STEP = 1

# Emit R directly in the fused iterate's padded store layout
# (poly_exp_pallas_store), deleting the per-level jnp.pad(R0)/jnp.pad(R1)
# relayout copies in update_flow_fused — the ~6 ms/batch the round-4
# roofline measured for the store-layout pads (docs/KERNELS.md).
# Module-global for the A/B harness (benchmarks/exp_store_emit.py).
STORE_EMIT = True

# Store R in bfloat16 (store-emit + fully-fused-iterate levels only): R is
# the pipeline's dominant HBM traffic (polyexp writes it once, the iterate
# reads it 3x per level — docs/KERNELS.md roofline), and quantizing it to
# bf16 costs ~0.002 px of EPE vs cv2 (1080p: 0.2933 -> 0.2952 smooth,
# 0.2803 -> 0.2799 boundary; gate is 0.5) while halving those bytes.  The
# consumer kernels widen to f32 immediately after load, so the flow is
# BITWISE equal to the f32 pipeline run on quantize_r_bf16(R) — the
# differential tests use exactly that oracle.  Module-global for the A/B
# harness (benchmarks/exp_r_bf16.py).
R_BF16 = False


def quantize_r_bf16(R):
    """The exact rounding the bf16 R store applies: one f32->bf16->f32
    round trip (round-to-nearest-even, same as Mosaic's in-kernel cast).
    The XLA twin applies this to core.poly_exp output to reproduce the
    bf16 pipeline bitwise."""
    return R.astype(jnp.bfloat16).astype(jnp.float32)


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


def _kernel_fused(ip_hbm, aux_ref, r_ref, win, sem, *, n: int, pad: int,
                  wp: int, out_w: int, n_bands: int, tile_h: int, g,
                  xg, xxg, ig11, ig03, ig33, ig55, ns: int = 2, pre=None,
                  h_real: int = 0, w_real: int = 0, in_bf16: bool = False,
                  out_col_off: int = 0, row_shift: int = 0,
                  out_bf16: bool = False, n_imgs: int = 1):
    """ig-folded variant: the five outputs are separable correlations with
    COMBINED weights, so the inverse-Gram scalars vanish into the taps —

      b_y  = (xg_v ⊗ ig11·g_h)            on moment row rB = Σ xg·t
      b_x  = (g_v  ⊗ ig11·xg_h)           on moment row rA = Σ g·t
      a_yy = ((ig03·g + ig33·xxg)_v ⊗ g_h) on combined row rC
      a_xx = (g_v  ⊗ (ig03·g + ig33·xxg)_h) on rA
      a_xy = (xg_v ⊗ ig55·xg_h)           on rB

    — 5 horizontal accumulators instead of 6 and no final combine muls
    (~15% fewer vector ops/band than the direct form below).

    pre = (t0, t1, t2): fuse the pyramid level-0 3-tap pre-smooth into
    the same VMEM pass (the input window is then RAW pixels with
    REFLECT_101 rows/cols adjacent to the image, see poly_exp_pallas).
    The replicate-of-SMOOTHED border the moment passes require is
    restored in-register: out-of-image rows take the vertically-smoothed
    edge rows handed in via `aux_ref` (they cross band boundaries, so
    they cannot come from the local window), out-of-image columns take
    the fully-smoothed edge columns (static slices of the local block).
    """
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    rows = 2 * pad + tile_h

    def dma(slot, step):
        b = step // n_bands
        i = step % n_bands
        if n_imgs > 1:
            # one strided copy covering n_imgs images' same band rows —
            # n_imgs contiguous row blocks, a single DMA issue
            src = ip_hbm.at[pl.ds(b * n_imgs, n_imgs),
                            pl.ds(i * tile_h, rows), :]
        else:
            src = ip_hbm.at[b, pl.ds(i * tile_h, rows), :]
        return pltpu.make_async_copy(src, win.at[slot], sem.at[slot])

    slot = jax.lax.rem(gi, ns)

    @pl.when(gi == 0)
    def _():
        # fill the pipeline: steps 0..ns-2 (step gi+ns-1 comes from the
        # every-step start below, so ns windows are in flight steady-state)
        for k in range(min(ns - 1, n_total)):
            dma(k, k).start()

    @pl.when(gi + ns - 1 < n_total)
    def _():
        dma(jax.lax.rem(gi + ns - 1, ns), gi + ns - 1).start()

    dma(slot, gi).wait()

    odt = jnp.bfloat16 if out_bf16 else jnp.float32

    for im in range(n_imgs):
        def emit(x0, cw, outs, im=im):
            # out_bf16: the one f32->bf16 rounding of the bf16 R store
            # (the moment math above stays f32; consumers widen back to
            # f32 on load)
            o_by, o_bx, o_ayy, o_axx, o_axy = (o.astype(odt) for o in outs)
            osl = slice(out_col_off + x0, out_col_off + x0 + cw)
            r_ref[im, 0, :, osl] = o_by
            r_ref[im, 1, :, osl] = o_bx
            r_ref[im, 2, :, osl] = o_ayy
            r_ref[im, 3, :, osl] = o_axx
            r_ref[im, 4, :, osl] = o_axy

        if out_col_off:
            # store layout: lane halos feed the update kernel's (r * sc)
            # with sc == 0 — any FINITE value works, but the VMEM out
            # block is uninitialized (NaN * 0 would poison M), so zero
            z = jnp.zeros((tile_h, out_col_off), odt)
            for c in range(5):
                r_ref[im, c, :, :out_col_off] = z
                r_ref[im, c, :, out_col_off + out_w:] = z

        aux_rows = None if pre is None else (aux_ref[im, 0:1, :],
                                             aux_ref[im, 1:2, :])
        wblk = win[slot, im] if n_imgs > 1 else win[slot]
        moment_band(wblk, tile_h, emit, n=n, pad=pad, out_w=out_w,
                    g=g, xg=xg, xxg=xxg, ig11=ig11, ig03=ig03, ig33=ig33,
                    ig55=ig55, pre=pre, aux_rows=aux_rows,
                    abs_row0=(gi % n_bands) * tile_h - row_shift,
                    h_real=h_real, w_real=w_real, in_bf16=in_bf16)


def moment_band(w, nr, emit, *, n, pad, out_w, g, xg, xxg, ig11, ig03,
                ig33, ig55, pre=None, aux_rows=None, abs_row0=0,
                h_real=0, w_real=0, in_bf16=False):
    """The polyexp band body on an explicit window.

    w: (nr + 2*pad, wp) padded-input window (image col 0 at lane `pad`;
    row r of the window is ip row abs_row0 + r, where ip row `pad` is
    image row 0).  Computes the 5 channels for `nr` output rows and
    hands each XCHUNK column block to `emit(x0, cw, (by, bx, ayy, axx,
    axy))` with out lane 0 == image col 0.  Per-output-pixel op order is
    position-independent, so any caller slicing windows out of the SAME
    padded input array (pallas/update_gather's fused-polyexp update
    does, at flow-dependent offsets) reproduces poly_exp_pallas's
    values bitwise.  pre/aux_rows: the fused level-0 3-tap pre-smooth
    and its v-smoothed edge rows (see _kernel_fused docstring)."""
    rows = nr + 2 * pad
    wp = w.shape[-1]
    cwv = tuple(ig03 * g[j] + ig33 * xxg[j] for j in range(2 * n + 1))
    if in_bf16:
        # bf16 window DMA (half the HBM read); exact when the input is
        # u8-valued (integers <= 255 are exactly representable in bf16),
        # all arithmetic stays f32 after this one conversion
        w = w.astype(jnp.float32)
    if pre is not None:
        t0p, t1p, t2p = (jnp.float32(t) for t in pre)
        # vertical 3-tap; first/last window rows have no neighbors and
        # are never read by the moment passes (pad - n - 1 >= 1)
        zrow = jnp.zeros((1, wp), jnp.float32)
        sm = jnp.concatenate(
            [zrow, w[:-2] * t0p + w[1:-1] * t1p + w[2:] * t2p, zrow],
            axis=0)
        # rows beyond the image: replicate-of-smoothed via the
        # precomputed v-smoothed edge rows (aux), which the horizontal
        # pass below then smooths like every other row
        abs_row = (abs_row0
                   + jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0))
        sm = jnp.where(abs_row < pad, aux_rows[0], sm)
        sm = jnp.where(abs_row > pad + h_real - 1, aux_rows[1], sm)
        # horizontal 3-tap (same zero-edge trick on the lane axis)
        zcol = jnp.zeros((rows, 1), jnp.float32)
        w = jnp.concatenate(
            [zcol, sm[:, :-2] * t0p + sm[:, 1:-1] * t1p + sm[:, 2:] * t2p,
             zcol], axis=1)
        # cols beyond the image: replicate the fully-smoothed edge cols
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
        w = jnp.where(col_idx < pad, w[:, pad:pad + 1], w)
        w = jnp.where(col_idx >= pad + w_real,
                      w[:, pad + w_real - 1:pad + w_real], w)
    rA = rB = rC = None
    for j in range(2 * n + 1):
        t = w[pad - n + j: pad - n + j + nr, :]
        a = t * jnp.float32(g[j])
        b = t * jnp.float32(xg[j])
        c = t * jnp.float32(cwv[j])
        rA = a if rA is None else rA + a
        rB = b if rB is None else rB + b
        rC = c if rC is None else rC + c

    XCHUNK = min(out_w, 1024)
    for x0 in range(0, out_w, XCHUNK):
        cw = min(XCHUNK, out_w - x0)
        o_by = o_bx = o_ayy = o_axx = o_axy = None
        for k in range(2 * n + 1):
            sl = slice(pad - n + k + x0, pad - n + k + x0 + cw)
            aA = rA[:, sl]
            aB = rB[:, sl]
            aC = rC[:, sl]
            u_bx = aA * jnp.float32(ig11 * xg[k])
            u_axx = aA * jnp.float32(ig03 * g[k] + ig33 * xxg[k])
            u_by = aB * jnp.float32(ig11 * g[k])
            u_axy = aB * jnp.float32(ig55 * xg[k])
            u_ayy = aC * jnp.float32(g[k])
            o_bx = u_bx if o_bx is None else o_bx + u_bx
            o_axx = u_axx if o_axx is None else o_axx + u_axx
            o_by = u_by if o_by is None else o_by + u_by
            o_axy = u_axy if o_axy is None else o_axy + u_axy
            o_ayy = u_ayy if o_ayy is None else o_ayy + u_ayy
        emit(x0, cw, (o_by, o_bx, o_ayy, o_axx, o_axy))


def _kernel(ip_hbm, r_ref, win, sem, *, n: int, pad: int, wp: int,
            out_w: int, n_bands: int, tile_h: int, g, xg, xxg, ig11,
            ig03, ig33, ig55, ns: int = 2):
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    rows = 2 * pad + tile_h

    def dma(slot, step):
        b = step // n_bands
        i = step % n_bands
        return pltpu.make_async_copy(
            ip_hbm.at[b, pl.ds(i * tile_h, rows), :], win.at[slot],
            sem.at[slot])

    slot = jax.lax.rem(gi, ns)

    @pl.when(gi == 0)
    def _():
        # fill the pipeline: steps 0..ns-2 (step gi+ns-1 comes from the
        # every-step start below, so ns windows are in flight steady-state)
        for k in range(min(ns - 1, n_total)):
            dma(k, k).start()

    @pl.when(gi + ns - 1 < n_total)
    def _():
        dma(jax.lax.rem(gi + ns - 1, ns), gi + ns - 1).start()

    dma(slot, gi).wait()

    w = win[slot]                                 # (rows, wp)
    # vertical pass: 3 moment rows, taps j=0..2n at row offset pad-n+j
    row0 = row1 = row2 = None
    for j in range(2 * n + 1):
        t = w[pad - n + j: pad - n + j + tile_h, :]
        a0 = t * jnp.float32(g[j])
        a1 = t * jnp.float32(xg[j])
        a2 = t * jnp.float32(xxg[j])
        row0 = a0 if row0 is None else row0 + a0
        row1 = a1 if row1 is None else row1 + a1
        row2 = a2 if row2 is None else row2 + a2

    # horizontal pass: output lane x corresponds to padded col x + pad;
    # width-chunked so the unrolled-tap temporaries fit the VMEM stack at
    # 4K (same scheme as blur_solve.py)
    XCHUNK = min(out_w, 1024)
    for x0 in range(0, out_w, XCHUNK):
        cw = min(XCHUNK, out_w - x0)
        b1 = b2 = b3 = b4 = b5 = b6 = None
        for k in range(2 * n + 1):
            sl = slice(pad - n + k + x0, pad - n + k + x0 + cw)
            t0 = row0[:, sl]
            t1 = row1[:, sl]
            t2 = row2[:, sl]
            u1 = t0 * jnp.float32(g[k])
            u2 = t0 * jnp.float32(xg[k])
            u3 = t1 * jnp.float32(g[k])
            u4 = t0 * jnp.float32(xxg[k])
            u5 = t2 * jnp.float32(g[k])
            u6 = t1 * jnp.float32(xg[k])
            b1 = u1 if b1 is None else b1 + u1
            b2 = u2 if b2 is None else b2 + u2
            b3 = u3 if b3 is None else b3 + u3
            b4 = u4 if b4 is None else b4 + u4
            b5 = u5 if b5 is None else b5 + u5
            b6 = u6 if b6 is None else b6 + u6

        osl = slice(x0, x0 + cw)
        r_ref[0, 0, :, osl] = b3 * jnp.float32(ig11)               # b_y
        r_ref[0, 1, :, osl] = b2 * jnp.float32(ig11)               # b_x
        r_ref[0, 2, :, osl] = (b1 * jnp.float32(ig03)
                               + b5 * jnp.float32(ig33))           # a_yy
        r_ref[0, 3, :, osl] = (b1 * jnp.float32(ig03)
                               + b4 * jnp.float32(ig33))           # a_xx
        r_ref[0, 4, :, osl] = b6 * jnp.float32(ig55)               # a_xy


@functools.lru_cache(maxsize=64)
def _build(batch: int, h: int, w: int, poly_n: int, poly_sigma: float,
           fused_ig: bool = True, pre: tuple = None,
           in_bf16: bool = False, store: tuple = None,
           out_bf16: bool = False, n_imgs: int = 1):
    g, xg, xxg, ig11, ig03, ig33, ig55 = poly_exp_weights(poly_n, poly_sigma)
    pad = _ceil(max(poly_n, 1), 8)
    if store is not None:
        # store-layout emission (poly_exp_pallas_store): the out array IS
        # the fused iterate's (B, 5, Hs, Ws) store — image origin at
        # (ROW_OFF, COL_OFF) == (16, 8), bands tile the FULL padded
        # height (halo rows emit finite replicate-border values), lane
        # halos zeroed in-kernel.  Requires the ig-folded kernel and
        # pad == COL_OFF.
        assert fused_ig and pad == 8
        Hs, Ws = store
        assert Ws % 128 == 0 and Hs % 16 == 0
        wp = Ws
        tile_h = (TILE_H if Hs % TILE_H == 0 and wp <= TILE32_WP_LIMIT
                  else 16)
        hp = Hs
        out_col_off, row_shift = pad, 16
        out_block_w = Ws
    else:
        wp = _ceil(w + 2 * pad, 128)
        # wide frames fall back to 16-row bands (scoped-VMEM gate, see
        # TILE32_WP_LIMIT)
        tile_h = TILE_H if wp <= TILE32_WP_LIMIT else min(TILE_H, 16)
        hp = _ceil(h, tile_h)
        out_col_off, row_shift = 0, 0
        out_block_w = wp - 2 * pad
    out_w = wp - 2 * pad
    rows = 2 * pad + tile_h
    n_bands = hp // tile_h
    ns = N_SLOTS
    assert n_imgs in (1, 2, 4) and (n_imgs == 1 or fused_ig)
    if batch % n_imgs:
        n_imgs = 1

    def omap(gi):
        # block units: with an n_imgs-deep batch block, batch blocks
        # count pairs/quads, so the same map covers every n_imgs
        return (gi // n_bands, 0, gi % n_bands, 0)

    assert not (out_bf16 and store is None)
    common = dict(n=poly_n, pad=pad, wp=wp, out_w=out_w, n_bands=n_bands,
                  tile_h=tile_h, ns=ns, n_imgs=n_imgs,
                  g=tuple(float(x) for x in g),
                  xg=tuple(float(x) for x in xg),
                  xxg=tuple(float(x) for x in xxg),
                  ig11=ig11, ig03=ig03, ig33=ig33, ig55=ig55)
    off = dict(out_col_off=out_col_off, row_shift=row_shift,
               out_bf16=out_bf16)
    if pre is not None:
        assert fused_ig and len(pre) == 3 and poly_n + 1 < pad
        body = functools.partial(_kernel_fused, pre=pre, h_real=h,
                                 w_real=w, in_bf16=in_bf16, **off, **common)
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_imgs, 2, wp), lambda gi: (gi // n_bands, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        if fused_ig:
            inner = functools.partial(_kernel_fused, **off, **common)

            def body(ip_hbm, r_ref, win, sem):
                inner(ip_hbm, None, r_ref, win, sem)
        else:
            assert store is None
            common.pop("n_imgs")
            body = functools.partial(_kernel, **common)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]

    # Mosaic's DEFAULT scoped-VMEM budget is 16 MB — a compiler soft
    # limit, not the v5e hardware (128 MiB VMEM).  Size the limit from
    # the analytic need (window scratch + double-buffered out/aux
    # blocks) so band height is chosen by perf, not by the default
    # budget (see TILE32_WP_LIMIT).
    in_bytes = 2 if in_bf16 else 4
    vmem_need = (ns * n_imgs * rows * wp * in_bytes   # window scratch
                 + 2 * n_imgs * 5 * tile_h * out_block_w * 4  # out (dbuf)
                 + (2 * n_imgs * 2 * wp * 4 if pre is not None else 0)
                 # in-kernel live temporaries: the vertical-pass moment
                 # planes plus horizontal accumulators — Mosaic counts
                 # these against the scoped budget too, and they are
                 # what actually overflowed the default at tile 32/4K
                 # (19.65 MB measured vs ~1.1 MB of scratch_shapes).
                 # The n_imgs sub-bands run sequentially, so these are
                 # live once, not n_imgs times
                 + 24 * tile_h * wp * 4)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=max(vmem_need + (8 << 20), 16 << 20))
    win_shape = ((ns, n_imgs, rows, wp) if n_imgs > 1
                 else (ns, rows, wp))
    kernel = pl.pallas_call(
        body,
        grid=(batch // n_imgs * n_bands,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_imgs, 5, tile_h, out_block_w), omap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (batch, 5, hp, out_block_w),
            jnp.bfloat16 if out_bf16 else jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(win_shape,
                       jnp.bfloat16 if in_bf16 else jnp.float32),
            pltpu.SemaphoreType.DMA((ns,)),
        ],
        compiler_params=params,
    )
    return kernel, pad, hp, wp


def poly_exp_pallas(img, poly_n: int, poly_sigma: float, pre_taps=None,
                    exact_u8: bool = False):
    """Batched fused polyexp: img (B, H, W) f32 -> R (B, 5, H, W) f32.

    pre_taps: optional length-3 smoothing taps — computes
    poly_exp(gaussian_blur_reflect101(img, pre_taps)) in ONE kernel pass
    (the pyramid's level-0 pre-smooth; saves the separate full-res blur
    pass and its HBM round trip).

    exact_u8: caller asserts img holds exact uint8 values (0..255
    integers, e.g. decoded frames cast to f32).  The pre-smooth path then
    stages the padded input and window DMAs in bfloat16 — integers up to
    256 are exactly representable in bf16 and every arithmetic op stays
    f32 after the in-kernel widen, so the output is BITWISE IDENTICAL to
    the f32 staging while the dominant input-side HBM traffic halves.
    """
    B, H, W = img.shape
    if pre_taps is not None and (not FUSE_PRE_SMOOTH or not FUSED_IG
                                 or len(pre_taps) != 3 or H < 3 or W < 3):
        from optical_flow_tpu.models.farneback.core import (
            gaussian_blur_reflect101)
        return poly_exp_pallas(
            gaussian_blur_reflect101(img, np.asarray(pre_taps)),
            poly_n, poly_sigma)
    pre = tuple(float(t) for t in pre_taps) if pre_taps is not None else None
    use_bf16 = bool(exact_u8) and pre is not None and PAD_BUILDER == "zdus"
    kernel, pad, hp, wp = _build(B, H, W, poly_n, poly_sigma,
                                 fused_ig=FUSED_IG, pre=pre,
                                 in_bf16=use_bf16,
                                 n_imgs=PAIR_STEP if FUSED_IG else 1)
    if pre is None:
        if PAD_BUILDER == "zdus" and H >= 1 and W >= 1:
            # zero-pad once, then write the pad-deep replicate bands with
            # in-place dynamic-update-slices (broadcasts of the edge
            # row/col); bitwise-identical to the edge pad below but avoids
            # its slow multi-pass lowering.  Column bands are written last
            # so corners replicate the corner pixel like mode='edge'.
            ip = jnp.pad(img, [(0, 0), (pad, hp - H + pad),
                               (pad, wp - W - pad)])
            top = jnp.broadcast_to(ip[:, pad:pad + 1, :], (B, pad, wp))
            bot = jnp.broadcast_to(ip[:, pad + H - 1:pad + H, :],
                                   (B, pad, wp))
            ip = jax.lax.dynamic_update_slice(ip, top, (0, 0, 0))
            ip = jax.lax.dynamic_update_slice(ip, bot, (0, pad + H, 0))
            rows_p = hp + 2 * pad
            left = jnp.broadcast_to(ip[:, :, pad:pad + 1], (B, rows_p, pad))
            right = jnp.broadcast_to(ip[:, :, pad + W - 1:pad + W],
                                     (B, rows_p, pad))
            ip = jax.lax.dynamic_update_slice(ip, left, (0, 0, 0))
            ip = jax.lax.dynamic_update_slice(ip, right, (0, 0, pad + W))
        else:
            ip = jnp.pad(img, [(0, 0), (pad, pad), (pad, pad)], mode="edge")
            ip = jnp.pad(ip, [(0, 0), (0, hp - H),
                              (0, wp - (W + 2 * pad))])
        return kernel(ip)[:, :, :H, :W]

    # RAW input with the REFLECT_101 rows/cols the in-window smooth needs
    # adjacent to the image; everything further out is rewritten by the
    # kernel's border logic, so it can stay zero
    if PAD_BUILDER == "zdus":
        # same array as the concatenate builder below, built as one zero
        # pad + four 1-px dynamic-update-slices (cols first, then rows, so
        # the reflected rows carry the reflected corner values).  Under
        # exact_u8 the staging array is bf16 (exact for u8 values; the
        # cast fuses into the pad copy, halving its write and the window
        # DMAs) — aux below is computed in f32 regardless.
        base = img.astype(jnp.bfloat16) if use_bf16 else img
        ip = jnp.pad(base, [(0, 0), (pad, hp - H + pad), (pad, wp - W - pad)])
        ip = jax.lax.dynamic_update_slice(
            ip, ip[:, :, pad + 1:pad + 2], (0, 0, pad - 1))
        ip = jax.lax.dynamic_update_slice(
            ip, ip[:, :, pad + W - 2:pad + W - 1], (0, 0, pad + W))
        ip = jax.lax.dynamic_update_slice(
            ip, ip[:, pad + 1:pad + 2, :], (0, pad - 1, 0))
        ip = jax.lax.dynamic_update_slice(
            ip, ip[:, pad + H - 2:pad + H - 1, :], (0, pad + H, 0))
    else:
        z = lambda *s: jnp.zeros(s, img.dtype)  # noqa: E731
        rs = jnp.concatenate(
            [z(B, pad - 1, W), img[:, 1:2], img, img[:, H - 2:H - 1],
             z(B, hp + pad - H - 1, W)], axis=1)      # (B, hp + 2*pad, W)
        ip = jnp.concatenate(
            [z(B, hp + 2 * pad, pad - 1), rs[:, :, 1:2], rs,
             rs[:, :, W - 2:W - 1], z(B, hp + 2 * pad, wp - W - pad - 1)],
            axis=2)                                   # (B, hp + 2*pad, wp)
    # v-smoothed edge rows (image rows 0 and H-1), on the padded column
    # grid; the kernel's horizontal pass smooths them like any other row.
    # The f32 widen of the (exact) row values keeps aux bitwise-equal to
    # the all-f32 staging when ip is bf16.
    t0, t1, t2 = pre
    r32 = lambda r: ip[:, r].astype(jnp.float32)  # noqa: E731
    aux = jnp.stack([
        r32(pad - 1) * t0 + r32(pad) * t1 + r32(pad + 1) * t2,
        (r32(pad + H - 2) * t0 + r32(pad + H - 1) * t1
         + r32(pad + H) * t2)], axis=1)               # (B, 2, wp)
    return kernel(ip, aux)[:, :, :H, :W]


def build_ip_store(img, Hs: int, Ws: int, poly_n: int, pre_taps=None,
                   exact_u8: bool = False, row0: int = None):
    """Padded polyexp input in the tall 'store-aligned' layout for the
    fused-polyexp update kernel (pallas/update_gather.py) and the
    store-emitting polyexp (poly_exp_pallas_store).

    Returns (ip, aux): ip is (B, Hs, Ws) with image pixel (0, 0) at
    (row0, pad), row0 defaulting to pad — identical border construction
    to poly_exp_pallas's builders (so any window sliced from it
    reproduces the production kernel's input bitwise), just taller: rows
    beyond the original hp + 2*pad stay zero/replicate and only ever
    feed outputs the update kernel discards (sc == 0 / never-selected
    fetch rows).  pad == 8 == the store layout's COL_OFF, and Ws equals
    the store width, so ip lanes align with store lanes.  aux is the
    (B, 2, Ws) v-smoothed edge-row pair for the fused level-0
    pre-smooth (None when pre_taps is None)."""
    B, H, W = img.shape
    pad = _ceil(max(poly_n, 1), 8)
    if row0 is None:
        row0 = pad
    assert Ws >= W + 2 * pad and Hs >= H + row0 + pad
    if pre_taps is None:
        # replicate borders (levels k > 0: f32 smoothed-resized images)
        ip = jnp.pad(img, [(0, 0), (row0, Hs - H - row0),
                           (pad, Ws - W - pad)])
        top = jnp.broadcast_to(ip[:, row0:row0 + 1, :], (B, row0, Ws))
        bot = jnp.broadcast_to(ip[:, row0 + H - 1:row0 + H, :],
                               (B, Hs - H - row0, Ws))
        ip = jax.lax.dynamic_update_slice(ip, top, (0, 0, 0))
        ip = jax.lax.dynamic_update_slice(ip, bot, (0, row0 + H, 0))
        left = jnp.broadcast_to(ip[:, :, pad:pad + 1], (B, Hs, pad))
        right = jnp.broadcast_to(ip[:, :, pad + W - 1:pad + W],
                                 (B, Hs, pad))
        ip = jax.lax.dynamic_update_slice(ip, left, (0, 0, 0))
        ip = jax.lax.dynamic_update_slice(ip, right, (0, 0, pad + W))
        return ip, None
    # level 0: RAW pixels with the REFLECT_101 rows/cols the in-window
    # 3-tap smooth needs adjacent to the image (same zdus construction
    # as poly_exp_pallas; everything further out is rewritten by
    # moment_band's border logic, so it stays zero)
    use_bf16 = bool(exact_u8)
    base = img.astype(jnp.bfloat16) if use_bf16 else img
    ip = jnp.pad(base, [(0, 0), (row0, Hs - H - row0), (pad, Ws - W - pad)])
    ip = jax.lax.dynamic_update_slice(
        ip, ip[:, :, pad + 1:pad + 2], (0, 0, pad - 1))
    ip = jax.lax.dynamic_update_slice(
        ip, ip[:, :, pad + W - 2:pad + W - 1], (0, 0, pad + W))
    ip = jax.lax.dynamic_update_slice(
        ip, ip[:, row0 + 1:row0 + 2, :], (0, row0 - 1, 0))
    ip = jax.lax.dynamic_update_slice(
        ip, ip[:, row0 + H - 2:row0 + H - 1, :], (0, row0 + H, 0))
    t0, t1, t2 = (float(t) for t in pre_taps)
    r32 = lambda r: ip[:, r].astype(jnp.float32)  # noqa: E731
    aux = jnp.stack([
        r32(row0 - 1) * t0 + r32(row0) * t1 + r32(row0 + 1) * t2,
        (r32(row0 + H - 2) * t0 + r32(row0 + H - 1) * t1
         + r32(row0 + H) * t2)], axis=1)              # (B, 2, Ws)
    return ip, aux


def store_emit_supported(h: int, w: int, poly_n: int) -> bool:
    """True if poly_exp_pallas_store can target the iterate store layout
    for an (h, w) level: the polyexp halo must equal the store column
    offset (poly_n <= 8) and the kernel must be in its ig-folded form."""
    return (STORE_EMIT and FUSED_IG and min(h, w) >= 32
            and _ceil(max(poly_n, 1), 8) == 8)


def poly_exp_pallas_store(img, Hs: int, Ws: int, poly_n: int,
                          poly_sigma: float, pre_taps=None,
                          exact_u8: bool = False, out_bf16: bool = False):
    """Batched fused polyexp emitting R DIRECTLY in the fused iterate's
    store layout: img (B, H, W) -> R (B, 5, Hs, Ws) f32 with image pixel
    (0, 0) at (ROW_OFF, COL_OFF) == (16, 8) (pallas/fused_iterate.py's
    shared layout).

    The real region is bitwise-identical to poly_exp_pallas(img, ...)
    (same moment_band op order on the same window values); every halo
    cell is FINITE — lane halos are zeroed in-kernel, row halos hold
    replicate-border polyexp values, consumed only multiplied by the
    zero border-scale field / never selected by the update kernel's
    clipped fetches (update_gather.py:314-315).  This deletes the
    iterate driver's per-level jnp.pad(R0)/jnp.pad(R1) relayout copies
    (the ~6 ms/batch at 1080p B=16 that benchmarks/exp_iterate_pads.py
    measured; STORE_EMIT gates the production path).
    """
    B, H, W = img.shape
    assert store_emit_supported(H, W, poly_n)
    if pre_taps is not None and (not FUSE_PRE_SMOOTH or len(pre_taps) != 3
                                 or H < 3 or W < 3):
        from optical_flow_tpu.models.farneback.core import (
            gaussian_blur_reflect101)
        return poly_exp_pallas_store(
            gaussian_blur_reflect101(img, np.asarray(pre_taps)),
            Hs, Ws, poly_n, poly_sigma, out_bf16=out_bf16)
    pad = _ceil(max(poly_n, 1), 8)
    pre = tuple(float(t) for t in pre_taps) if pre_taps is not None else None
    use_bf16 = bool(exact_u8) and pre is not None
    kernel, pad, hp, wp = _build(B, H, W, poly_n, poly_sigma,
                                 fused_ig=True, pre=pre, in_bf16=use_bf16,
                                 store=(Hs, Ws), out_bf16=out_bf16,
                                 n_imgs=PAIR_STEP)
    # window DMA i reads ip rows [i*tile_h, i*tile_h + tile_h + 2*pad):
    # the input needs 2*pad extra rows over the Hs output rows, with the
    # image origin at row pad + ROW_OFF so window row `pad` lands on the
    # band's first output row (store row i*tile_h == image row
    # i*tile_h - ROW_OFF)
    ip, aux = build_ip_store(img, Hs + 2 * pad, Ws, poly_n, pre,
                             exact_u8=use_bf16, row0=pad + 16)
    return kernel(ip, aux) if pre is not None else kernel(ip)
