"""Separable Gaussian blur Pallas kernel (pyramid level smoothing).

cv2's pyramid smooths the full-resolution image once per level with a
level-dependent Gaussian (BORDER_REFLECT_101).  The XLA shifted-slice
formulation costs ~16 ms per (32, 1080p) batch even for a 3-tap kernel;
this kernel does both passes in one VMEM visit per 16-row band with
double-buffered window DMAs.  The reflect border is applied by the
wrapper's jnp.pad (mode='reflect' == REFLECT_101).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16

# Input builder: "zdus" = zero-pad + thin flipped-DUS reflect bands
# (bitwise-identical, avoids the slow mode='reflect' lowering);
# "legacy" = jnp.pad(mode='reflect').  Module-global for A/B harnesses.
PAD_BUILDER = "zdus"


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


def _kernel(ip_hbm, o_ref, win, sem, *, r: int, pad: int, out_w: int,
            n_bands: int, taps):
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

    w = win[slot]
    # width-chunked so the unrolled-tap temporaries fit the VMEM stack at
    # 8K (19 full-width (16, 7808) f32 temps billed 16.39M scoped — BENCH
    # round 4; same scheme as polyexp.py/blur_solve.py).  Bitwise
    # identical: per-pixel adds are unchanged, only temp shapes differ.
    XCHUNK = min(out_w, 1024)
    for x0 in range(0, out_w, XCHUNK):
        cw = min(XCHUNK, out_w - x0)
        v = None
        for j in range(2 * r + 1):
            t = (w[pad - r + j: pad - r + j + TILE_H,
                   pad - r + x0: pad - r + x0 + cw + 2 * r]
                 * jnp.float32(taps[j]))
            v = t if v is None else v + t
        o = None
        for k in range(2 * r + 1):
            t = v[:, k: k + cw] * jnp.float32(taps[k])
            o = t if o is None else o + t
        o_ref[0, :, x0:x0 + cw] = o


@functools.lru_cache(maxsize=64)
def _build(batch: int, h: int, w: int, taps: tuple):
    r = (len(taps) - 1) // 2
    pad = _ceil(max(r, 1), 8)
    hp = _ceil(h, TILE_H)
    wp = _ceil(w + 2 * pad, 128)
    out_w = wp - 2 * pad
    rows = 2 * pad + TILE_H
    n_bands = hp // TILE_H

    kernel = pl.pallas_call(
        functools.partial(_kernel, r=r, pad=pad, out_w=out_w,
                          n_bands=n_bands, taps=taps),
        grid=(batch * n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, out_w),
            lambda gi: (gi // n_bands, gi % n_bands, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, hp, out_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return kernel, pad, hp, wp


def gaussian_blur_pallas(img, kernel_taps):
    """img (B, H, W) f32, separable taps (len 2r+1) -> blurred (B, H, W).

    BORDER_REFLECT_101 like cv2.GaussianBlur.
    """
    B, H, W = img.shape
    taps = tuple(float(t) for t in kernel_taps)
    r = (len(taps) - 1) // 2
    if r == 0:
        return img
    kern, pad, hp, wp = _build(B, H, W, taps)
    if PAD_BUILDER == "zdus" and H > r and W > r:
        # zero-pad once + four thin flipped DUS writes for the
        # REFLECT_101 bands (bitwise-identical to the mode='reflect' pad
        # below, which lowers to slow multi-pass copies on this backend —
        # same finding as pallas/polyexp.py's builder).  Columns first,
        # then rows from the column-fixed array, so corner regions get
        # the reflect-of-reflect values.
        ip = jnp.pad(img, [(0, 0), (pad, hp + pad - H), (pad, wp - pad - W)])
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, :, pad + 1:pad + 1 + r], 2), (0, 0, pad - r))
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, :, pad + W - 1 - r:pad + W - 1], 2),
            (0, 0, pad + W))
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, pad + 1:pad + 1 + r, :], 1), (0, pad - r, 0))
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, pad + H - 1 - r:pad + H - 1, :], 1),
            (0, pad + H, 0))
    else:
        ip = jnp.pad(img, [(0, 0), (r, r), (r, r)], mode="reflect")
        ip = jnp.pad(ip, [(0, 0), (pad - r, pad - r), (pad - r, pad - r)])
        ip = jnp.pad(ip, [(0, 0), (0, hp + 2 * pad - ip.shape[1]),
                          (0, wp - ip.shape[2])])
    out = kern(ip)
    return out[:, :H, :W]
