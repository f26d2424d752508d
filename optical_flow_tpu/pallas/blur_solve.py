"""Fused box-blur + 2x2-solve Pallas kernel (FarnebackUpdateFlow_Blur).

The iterate step blurs the 5-channel M field with a winsize x winsize box
(replicate borders) and solves a regularized 2x2 system per pixel.  In XLA
this costs ~20 ms per 1080p x8 batch per iteration (separable passes each
round-trip HBM).  One kernel pass per 16-row band does both separable sums
in VMEM with static shifted slices and writes flow directly: ~3x less HBM
traffic and no intermediate fields.

Two entry points share the kernel body:

  * update_flow_blur_solve_pallas — standalone: M is replicate-padded at
    XLA level, flow comes back unpadded.
  * blur_solve_store — fused-loop variant (pallas/fused_iterate.py): M
    arrives in the shared 'store' layout with its replicate halos already
    inside the array (written by the update kernel), and flow is emitted
    in the same layout, so the iterate loop chains with zero XLA-side
    pad/slice copies (~17 ms/iteration at 1080p x16 on v5e).

Supports the Gaussian window variant (OPTFLOW_FARNEBACK_GAUSSIAN) with
weighted taps.  Semantics identical to core.box_sum_replicate + solve_flow
(f32 sums; OpenCV accumulates the running sums in f64, a <=1e-5-relative
difference gated by the parity tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optical_flow_tpu.models.farneback.core import gaussian_window_kernel

TILE_H = 16


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


def _factor(n: int):
    # factored box sums: with 2m+1 = a*b, first compute the a-tap partial
    # sums once (shared across output positions), then b strided adds —
    # a+b-2 adds per element instead of 2m
    for a in (5, 4, 3):
        if n % a == 0 and n // a > 1:
            return a, n // a
    return None


def _box_v(arr, out_rows, *, m, pad, taps, fac):
    # vertical taps j=0..2m at row offset pad-m+j (+r per output row)
    if fac is None:
        acc = None
        for k in range(2 * m + 1):
            t = arr[pad - m + k: pad - m + k + out_rows, :]
            t = t if taps is None else t * jnp.float32(taps[k])
            acc = t if acc is None else acc + t
        return acc
    a, b = fac
    ext = out_rows + (b - 1) * a
    sa = None
    for i in range(a):
        t = arr[pad - m + i: pad - m + i + ext, :]
        sa = t if sa is None else sa + t
    acc = None
    for j in range(b):
        t = sa[j * a: j * a + out_rows, :]
        acc = t if acc is None else acc + t
    return acc


def _box_h(arr, out_cols, *, m, pad, taps, fac):
    if fac is None:
        acc = None
        for k in range(2 * m + 1):
            t = arr[:, pad - m + k: pad - m + k + out_cols]
            t = t if taps is None else t * jnp.float32(taps[k])
            acc = t if acc is None else acc + t
        return acc
    a, b = fac
    ext = out_cols + (b - 1) * a
    sa = None
    for i in range(a):
        t = arr[:, pad - m + i: pad - m + i + ext]
        sa = t if sa is None else sa + t
    acc = None
    for j in range(b):
        t = sa[:, j * a: j * a + out_cols]
        acc = t if acc is None else acc + t
    return acc


def _blur_solve_body(window, flow_ref, *, m, pad, out_w, col0, inv_area,
                     taps, fac, out_rows=TILE_H, row0=0):
    """Shared band body: window (5, >=row0+out_rows+2*pad, >=out_w+2*pad)
    -> flow band written at column offset col0 (chunked so temporaries
    fit VMEM).  row0: first window row of the band (nonzero when the
    window is a taller persistent ring, e.g. the fused update+blur
    kernel's M ring in pallas/update_gather.py)."""
    rows = out_rows + 2 * pad
    XCHUNK = min(out_w, 1024)
    for x0 in range(0, out_w, XCHUNK):
        cw = min(XCHUNK, out_w - x0)
        outs = []
        for c in range(5):
            wc = window[c, row0: row0 + rows,
                        x0: x0 + cw + 2 * pad]         # (rows, cw+2pad)
            v = _box_v(wc, out_rows, m=m, pad=pad, taps=taps, fac=fac)
            hsum = _box_h(v, cw, m=m, pad=pad, taps=taps, fac=fac)
            outs.append(hsum * jnp.float32(inv_area))

        g11, g12, g22, h1, h2 = outs
        idet = 1.0 / (g11 * g22 - g12 * g12 + jnp.float32(1e-3))
        flow_ref[0, 0, :, col0 + x0: col0 + x0 + cw] = (g11 * h2
                                                        - g12 * h1) * idet
        flow_ref[0, 1, :, col0 + x0: col0 + x0 + cw] = (g22 * h1
                                                        - g12 * h2) * idet


def _kernel(mp_hbm, flow_ref, win, sem, *, m: int, pad: int, wp: int,
            n_bands: int, inv_area: float, taps):
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    rows = 2 * pad + TILE_H

    def dma(slot, step):
        b = step // n_bands
        i = step % n_bands
        return pltpu.make_async_copy(
            mp_hbm.at[b, :, pl.ds(i * TILE_H, rows), :], win.at[slot],
            sem.at[slot])

    slot = jax.lax.rem(gi, 2)
    nslot = jax.lax.rem(gi + 1, 2)

    @pl.when(gi == 0)
    def _():
        dma(slot, gi).start()

    @pl.when(gi + 1 < n_total)
    def _():
        dma(nslot, gi + 1).start()

    dma(slot, gi).wait()

    fac = None if taps is not None else _factor(2 * m + 1)
    _blur_solve_body(win[slot], flow_ref, m=m, pad=pad, out_w=wp - 2 * pad,
                     col0=0, inv_area=inv_area, taps=taps, fac=fac)


def _omap(n_bands):
    def omap(gi):
        return (gi // n_bands, 0, gi % n_bands, 0)
    return omap


@functools.lru_cache(maxsize=64)
def _build(batch: int, h: int, w: int, winsize: int, gaussian: bool):
    m = winsize // 2
    pad = _ceil(max(m, 1), 8)
    hp = _ceil(h, TILE_H)
    wp = _ceil(w + 2 * pad, 128)
    rows = 2 * pad + TILE_H
    out_w = wp - 2 * pad

    if gaussian:
        taps = tuple(float(t) for t in gaussian_window_kernel(winsize))
        inv_area = 1.0
    else:
        taps = None
        inv_area = 1.0 / (winsize * winsize)

    n_bands = hp // TILE_H
    kernel = pl.pallas_call(
        functools.partial(_kernel, m=m, pad=pad, wp=wp, n_bands=n_bands,
                          inv_area=inv_area, taps=taps),
        grid=(batch * n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # padded M (HBM)
        out_specs=pl.BlockSpec((1, 2, TILE_H, out_w), _omap(n_bands),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 2, hp, out_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return kernel, pad, hp, wp, out_w


def update_flow_blur_solve_pallas(M, winsize: int, gaussian: bool = False):
    """Batched fused blur+solve: M (B, 5, H, W) -> flow (B, 2, H, W)."""
    B, _, H, W = M.shape
    kernel, pad, hp, wp, out_w = _build(B, H, W, winsize, gaussian)
    # replicate-pad rows/cols by `pad` (edge semantics == OpenCV's running
    # sums), plus alignment padding (values never read)
    Mp = jnp.pad(M, [(0, 0), (0, 0), (pad, pad), (pad, pad)], mode="edge")
    Mp = jnp.pad(Mp, [(0, 0), (0, 0), (0, hp - H), (0, wp - (W + 2 * pad))])
    flow = kernel(Mp)
    return flow[:, :, :H, :W]


# ---------------------------------------------------------------------------
# store-layout variant (fused iterate loop)

_PAD_S = 8   # halo depth baked into the store layout (requires m <= 8)


def _kernel_store(mst_hbm, flow_ref, win, sem, *, m: int, Ws: int,
                  n_bands: int, inv_area: float, taps, tile_h: int):
    """Bands are the tile_h-row groups of the store layout.  Band b's
    outputs (store rows [T*b, T*b+T), i.e. logical rows [T*b-ROW_OFF, ...))
    tap store rows [T*b-7+rr .. T*b+7+rr), all inside the window anchored
    at T*b - 8 — the tap arithmetic is identical to _kernel's, with the
    store row shift playing the role of the replicate pad.  Bands 0 and
    n_bands-1 are pure halo (requires ROW_OFF >= tile_h): written as
    zeros, which also keeps every middle band's window anchor T*b - 8
    in-bounds without clipping."""
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    Hs = mst_hbm.shape[2]
    rows = 2 * _PAD_S + tile_h

    def dma(slot, step):
        b = step // n_bands
        i = step % n_bands
        a = jnp.clip(i * tile_h - _PAD_S, 0, Hs - rows)
        return pltpu.make_async_copy(
            mst_hbm.at[b, :, pl.ds(pl.multiple_of(a, 8), rows), :],
            win.at[slot], sem.at[slot])

    slot = jax.lax.rem(gi, 2)
    nslot = jax.lax.rem(gi + 1, 2)

    @pl.when(gi == 0)
    def _():
        dma(slot, gi).start()

    @pl.when(gi + 1 < n_total)
    def _():
        dma(nslot, gi + 1).start()

    dma(slot, gi).wait()

    i = gi % n_bands
    is_halo = (i == 0) | (i == n_bands - 1)

    @pl.when(is_halo)
    def _():
        flow_ref[0, 0] = jnp.zeros((tile_h, Ws), jnp.float32)
        flow_ref[0, 1] = jnp.zeros((tile_h, Ws), jnp.float32)

    @pl.when(jnp.logical_not(is_halo))
    def _():
        # column halos of the flow output: don't-care, kept finite (zero)
        flow_ref[0, 0, :, :_PAD_S] = jnp.zeros((tile_h, _PAD_S), jnp.float32)
        flow_ref[0, 1, :, :_PAD_S] = jnp.zeros((tile_h, _PAD_S), jnp.float32)
        flow_ref[0, 0, :, Ws - _PAD_S:] = jnp.zeros((tile_h, _PAD_S),
                                                    jnp.float32)
        flow_ref[0, 1, :, Ws - _PAD_S:] = jnp.zeros((tile_h, _PAD_S),
                                                    jnp.float32)
        fac = None if taps is not None else _factor(2 * m + 1)
        _blur_solve_body(win[slot], flow_ref, m=m, pad=_PAD_S,
                         out_w=Ws - 2 * _PAD_S, col0=_PAD_S,
                         inv_area=inv_area, taps=taps, fac=fac,
                         out_rows=tile_h)


@functools.lru_cache(maxsize=64)
def _build_store(batch: int, Hs: int, Ws: int, winsize: int, gaussian: bool,
                 tile_h: int = TILE_H):
    m = winsize // 2
    if m > _PAD_S:
        raise ValueError(f"store layout supports winsize <= {2*_PAD_S+1}")
    if tile_h > 2 * _PAD_S:
        # the store layout's halo bands are ROW_OFF == 2*_PAD_S rows deep;
        # a taller band would mark real output rows as pure halo (zeroed)
        raise ValueError(
            f"tile_h={tile_h} exceeds the store halo depth {2 * _PAD_S}")
    if Hs % tile_h:
        raise ValueError(f"Hs={Hs} not divisible by tile_h={tile_h}")
    rows = 2 * _PAD_S + tile_h

    if gaussian:
        taps = tuple(float(t) for t in gaussian_window_kernel(winsize))
        inv_area = 1.0
    else:
        taps = None
        inv_area = 1.0 / (winsize * winsize)

    n_bands = Hs // tile_h
    kernel = pl.pallas_call(
        functools.partial(_kernel_store, m=m, Ws=Ws, n_bands=n_bands,
                          inv_area=inv_area, taps=taps, tile_h=tile_h),
        grid=(batch * n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # M store (HBM)
        out_specs=pl.BlockSpec((1, 2, tile_h, Ws), _omap(n_bands),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 2, Hs, Ws), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, rows, Ws), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return kernel


def blur_solve_store(Mst, winsize: int, gaussian: bool = False,
                     tile_h: int = TILE_H):
    """Fused blur+solve on store-layout M: (B, 5, Hs, Ws) -> flow
    (B, 2, Hs, Ws) in the same layout.  M must carry valid replicate
    halos (update_matrices_store provides them); no XLA-side copies.

    tile_h = 32 (requires a store layout whose first/last 32-row bands are
    pure halo) halves the grid-step count.  Measured perf-neutral at 1080p
    on v5e — the kernel is vector-compute-bound, not step-overhead-bound —
    so the fused loop keeps the default 16."""
    B, _, Hs, Ws = Mst.shape
    if Hs % tile_h or tile_h > 2 * _PAD_S:
        tile_h = TILE_H
    return _build_store(B, Hs, Ws, winsize, gaussian, tile_h)(Mst)
