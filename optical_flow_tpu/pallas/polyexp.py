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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optical_flow_tpu.models.farneback.params import poly_exp_weights

TILE_H = 16

# Fold the inverse-Gram combination into the correlation taps (see
# _kernel): saves one horizontal accumulator and the whole per-chunk
# combine stage.  Module-global so the A/B harness can flip it.
FUSED_IG = True


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


def _kernel_fused(ip_hbm, r_ref, win, sem, *, n: int, pad: int, wp: int,
                  out_w: int, n_bands: int, g, xg, xxg, ig11, ig03, ig33,
                  ig55):
    """ig-folded variant: the five outputs are separable correlations with
    COMBINED weights, so the inverse-Gram scalars vanish into the taps —

      b_y  = (xg_v ⊗ ig11·g_h)            on moment row rB = Σ xg·t
      b_x  = (g_v  ⊗ ig11·xg_h)           on moment row rA = Σ g·t
      a_yy = ((ig03·g + ig33·xxg)_v ⊗ g_h) on combined row rC
      a_xx = (g_v  ⊗ (ig03·g + ig33·xxg)_h) on rA
      a_xy = (xg_v ⊗ ig55·xg_h)           on rB

    — 5 horizontal accumulators instead of 6 and no final combine muls
    (~15% fewer vector ops/band than the direct form below)."""
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    rows = 2 * pad + TILE_H

    def dma(slot, step):
        b = step // n_bands
        i = step % n_bands
        return pltpu.make_async_copy(
            ip_hbm.at[b, pl.ds(i * TILE_H, rows), :], win.at[slot],
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

    cwv = tuple(ig03 * g[j] + ig33 * xxg[j] for j in range(2 * n + 1))
    w = win[slot]                                 # (rows, wp)
    rA = rB = rC = None
    for j in range(2 * n + 1):
        t = w[pad - n + j: pad - n + j + TILE_H, :]
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

        osl = slice(x0, x0 + cw)
        r_ref[0, 0, :, osl] = o_by
        r_ref[0, 1, :, osl] = o_bx
        r_ref[0, 2, :, osl] = o_ayy
        r_ref[0, 3, :, osl] = o_axx
        r_ref[0, 4, :, osl] = o_axy


def _kernel(ip_hbm, r_ref, win, sem, *, n: int, pad: int, wp: int,
            out_w: int, n_bands: int, g, xg, xxg, ig11, ig03, ig33, ig55):
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    rows = 2 * pad + TILE_H

    def dma(slot, step):
        b = step // n_bands
        i = step % n_bands
        return pltpu.make_async_copy(
            ip_hbm.at[b, pl.ds(i * TILE_H, rows), :], win.at[slot],
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

    w = win[slot]                                 # (rows, wp)
    # vertical pass: 3 moment rows, taps j=0..2n at row offset pad-n+j
    row0 = row1 = row2 = None
    for j in range(2 * n + 1):
        t = w[pad - n + j: pad - n + j + TILE_H, :]
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
           fused_ig: bool = True):
    g, xg, xxg, ig11, ig03, ig33, ig55 = poly_exp_weights(poly_n, poly_sigma)
    pad = _ceil(max(poly_n, 1), 8)
    hp = _ceil(h, TILE_H)
    wp = _ceil(w + 2 * pad, 128)
    out_w = wp - 2 * pad
    rows = 2 * pad + TILE_H
    n_bands = hp // TILE_H

    def omap(gi):
        return (gi // n_bands, 0, gi % n_bands, 0)

    kernel = pl.pallas_call(
        functools.partial(
            _kernel_fused if fused_ig else _kernel,
            n=poly_n, pad=pad, wp=wp, out_w=out_w, n_bands=n_bands,
            g=tuple(float(x) for x in g),
            xg=tuple(float(x) for x in xg),
            xxg=tuple(float(x) for x in xxg),
            ig11=ig11, ig03=ig03, ig33=ig33, ig55=ig55),
        grid=(batch * n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 5, TILE_H, out_w), omap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 5, hp, out_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return kernel, pad, hp, wp


def poly_exp_pallas(img, poly_n: int, poly_sigma: float):
    """Batched fused polyexp: img (B, H, W) f32 -> R (B, 5, H, W) f32."""
    B, H, W = img.shape
    kernel, pad, hp, wp = _build(B, H, W, poly_n, poly_sigma,
                                 fused_ig=FUSED_IG)
    ip = jnp.pad(img, [(0, 0), (pad, pad), (pad, pad)], mode="edge")
    ip = jnp.pad(ip, [(0, 0), (0, hp - H), (0, wp - (W + 2 * pad))])
    R = kernel(ip)
    return R[:, :, :H, :W]
