"""Fused Gaussian smooth + bilinear 2^k downsample Pallas kernel.

cv2's pyramid builds level k by smoothing the FULL-RESOLUTION frame with a
level-dependent Gaussian and bilinearly resizing by scale = pyr_scale^k
(SURVEY.md 2d item 1).  Done separately (pallas/gauss.py + ops/resize.py)
that costs a full-resolution two-pass blur PLUS a resize per level — the
blurred values are only ever read at the sampled positions.

For the production parameterization pyr_scale = 0.5 and dimensions where
level_dim * 2^k == full_dim exactly, the bilinear sample positions are
  in = s*out + s/2 - 1 + fy,   fy = 0.5 exactly (half-pixel convention),
so blur+lerp collapses into ONE even-length separable filter applied at
stride s:
  t[j] = 0.5*(g[j] + g[j-1]),  j = 0..2r+1   (g = Gaussian taps).

Layout trick: the s-strided vertical reads become CONTIGUOUS by
restriding the input to phase-major (B, s, H/s, W) once in XLA (a cheap
HBM copy); the kernel then runs the vertical pass over per-phase plane
windows (one small DMA per phase, double-buffered) and the horizontal
pass densely; the s-strided column select is an XLA slice on the
(s-fold row-reduced) output.  Equivalent to resize_bilinear(gauss(x)) up
to f32 reassociation — differential-tested in tests/test_pallas_kernels.py.
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
PAD_BUILDER = "zdus"        # output rows per grid step


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


def _kernel(ip_hbm, o_ref, win, sem, *, taps, s: int, a0: int,
            win_rows: int, offs, n_bands: int, in_bf16: bool = False):
    """Grid: (batch * n_out_bands,).  ip_hbm is phase-major
    (B, s, Hr, wp); offs[j] = (phase, plane_row_offset - a0) per tap.
    Each step produces TILE_H output rows.  in_bf16: windows arrive as
    bfloat16 (exact for u8-valued frames) and are widened to f32 once
    per plane before the unaligned sublane slicing."""
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    nt = len(taps)
    wp = o_ref.shape[2]

    def dma(slot, step, p):
        b = step // n_bands
        i = step % n_bands
        return pltpu.make_async_copy(
            ip_hbm.at[b, p, pl.ds(i * TILE_H + a0, win_rows), :],
            win.at[slot, p], sem.at[slot, p])

    slot = jax.lax.rem(gi, 2)
    nslot = jax.lax.rem(gi + 1, 2)

    @pl.when(gi == 0)
    def _():
        for p in range(s):
            dma(slot, gi, p).start()

    @pl.when(gi + 1 < n_total)
    def _():
        for p in range(s):
            dma(nslot, gi + 1, p).start()

    for p in range(s):
        dma(slot, gi, p).wait()

    if in_bf16:
        planes = [win[slot, p].astype(jnp.float32) for p in range(s)]
        plane_rows = lambda p, off: planes[p][off:off + TILE_H, :]  # noqa: E731
    else:
        plane_rows = lambda p, off: win[slot, p, off:off + TILE_H, :]  # noqa: E731

    # vertical combined filter: tap j reads TILE_H contiguous rows of its
    # phase plane — all slices are (TILE_H, wp), nothing strided
    v = None
    for j in range(nt):
        p, off = offs[j]
        t = plane_rows(p, off) * jnp.float32(taps[j])
        v = t if v is None else v + t
    # dense horizontal pass; the s-strided column select is an XLA slice
    o = None
    for j in range(nt):
        t = v[:, j:j + wp - nt + 1] * jnp.float32(taps[j])
        o = t if o is None else o + t
    o_ref[0, :, :wp - nt + 1] = o
    o_ref[0, :, wp - nt + 1:] = jnp.zeros((TILE_H, nt - 1), jnp.float32)


@functools.lru_cache(maxsize=64)
def _build(batch: int, hr: int, wp: int, out_h_p: int,
           taps: tuple, s: int, a0: int, offs: tuple,
           in_bf16: bool = False):
    n_bands = out_h_p // TILE_H
    max_off = max(o for _, o in offs)
    # bf16 VMEM tiles are (16, 128): round the window and keep the DMA
    # row starts (i*16 + a0, a0 forced to a 16-multiple by the wrapper)
    # tile-aligned
    win_rows = _ceil(max_off + TILE_H, 16 if in_bf16 else 8)

    return pl.pallas_call(
        functools.partial(_kernel, taps=taps, s=s, a0=a0,
                          win_rows=win_rows, offs=offs, n_bands=n_bands,
                          in_bf16=in_bf16),
        grid=(batch * n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, wp),
            lambda gi: (gi // n_bands, gi % n_bands, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, out_h_p, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, s, win_rows, wp),
                       jnp.bfloat16 if in_bf16 else jnp.float32),
            pltpu.SemaphoreType.DMA((2, s)),
        ],
    )


def supported(h: int, w: int, out_h: int, out_w: int, s: int) -> bool:
    """Fast path applies when the level dims divide the full dims exactly
    by s = 2^k (then the bilinear fractions are exactly 0.5)."""
    return (s >= 2 and h == s * out_h and w == s * out_w
            and min(out_h, out_w) >= 8)


def gaussian_blur_resize_pallas(img, kernel_taps, s: int,
                                exact_u8: bool = False):
    """img (B, H, W) f32, Gaussian taps (len 2r+1), integer stride s —
    returns (B, H/s, W/s) f32 == resize_bilinear(gauss_reflect101(img))
    for the exact-division case (up to f32 reassociation).

    exact_u8: caller asserts img holds exact uint8 values; the padded
    phase-major staging array and window DMAs then use bfloat16 (exact
    for integers <= 255; the kernel widens to f32 before any arithmetic,
    so the output is bitwise-identical while the full-res input traffic
    — the dominant cost of the pyramid levels — halves)."""
    B, H, W = img.shape
    out_h, out_w = H // s, W // s
    g = tuple(float(t) for t in kernel_taps)
    r = (len(g) - 1) // 2
    # combined blur+lerp taps (even length 2r+2)
    taps = tuple(0.5 * (g[j] if j <= 2 * r else 0.0)
                 + 0.5 * (g[j - 1] if j >= 1 else 0.0)
                 for j in range(2 * r + 2))
    nt = len(taps)

    # reflect-101 border for the Gaussian reach (like pallas/gauss.py)
    pad_edge = r + 1
    use_bf16 = (bool(exact_u8) and PAD_BUILDER == "zdus"
                and H > pad_edge and W > pad_edge)

    out_h_p = _ceil(out_h, TILE_H)
    # input row of tap j for output row Y: first + s*Y + j, with
    # first = s/2 - 1 - r + pad_edge = s/2 (pad_edge == r + 1)
    first = s // 2
    # phase-major decomposition: first + j = s*a_j + p_j
    offs_raw = [((first + j) % s, (first + j) // s) for j in range(nt)]
    a_min = min(a for _, a in offs_raw)
    a_max = max(a for _, a in offs_raw)
    # DMA row starts are 16*i + a0: bf16 VMEM tiles are (16, 128), so a0
    # must be a 16-multiple there (f32 needs 8)
    a0 = (a_min // 16) * 16 if use_bf16 else (a_min // 8) * 8
    offs = tuple((p, a - a0) for p, a in offs_raw)

    # rows needed in phase-major planes: band i covers plane rows
    # [16*i + a0, 16*i + a0 + win_rows); pad the row count to cover the
    # over-read of the padded band/window grid
    win_rows = _ceil((a_max - a0) + TILE_H, 16 if use_bf16 else 8)
    hr = out_h_p + a0 + win_rows          # plane rows (generous bound)
    wp = _ceil(W + 2 * pad_edge, 128)
    if use_bf16:
        img = img.astype(jnp.bfloat16)
    if PAD_BUILDER == "zdus" and H > pad_edge and W > pad_edge:
        # zero-pad to the final shape + four thin flipped DUS writes for
        # the REFLECT_101 bands (bitwise-identical to the mode='reflect'
        # pad below, which lowers to slow multi-pass copies on this
        # backend; same finding as pallas/polyexp.py).  Columns first,
        # then rows from the column-fixed array.
        p = pad_edge
        ip = jnp.pad(img, [(0, 0), (p, hr * s - H - p), (p, wp - W - p)])
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, :, p + 1:2 * p + 1], 2), (0, 0, 0))
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, :, p + W - 1 - p:p + W - 1], 2),
            (0, 0, p + W))
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, p + 1:2 * p + 1, :], 1), (0, 0, 0))
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, p + H - 1 - p:p + H - 1, :], 1),
            (0, p + H, 0))
    else:
        ip = jnp.pad(img, [(0, 0), (pad_edge, pad_edge),
                           (pad_edge, pad_edge)], mode="reflect")
        ip = jnp.pad(ip, [(0, 0), (0, hr * s - ip.shape[1]),
                          (0, wp - ip.shape[2])])
    # phase-major restride: (B, hr*s, wp) -> (B, s, hr, wp); one cheap
    # XLA HBM copy replaces all strided VMEM access in the kernel
    ip_ph = ip.reshape(B, hr, s, wp).transpose(0, 2, 1, 3)

    out = _build(B, hr, wp, out_h_p, taps, s, a0, offs,
                 in_bf16=use_bf16)(ip_ph)
    col0 = s // 2 - 1 - r + pad_edge
    return out[:, :out_h, col0:col0 + s * out_w:s]
