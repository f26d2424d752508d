"""Bilinear resize replicating cv2.resize INTER_LINEAR semantics.

Two engines, matching OpenCV's two code paths:

  * `resize_bilinear_f32` — float path (half-pixel centers, edge clamp),
    used inside the Farnebäck pyramid (cv2 resizes the smoothed float image
    per level).  Within 2 ulp of cv2 (cv2's AVX2 accumulation order is not
    reproducible bit-for-bit; tolerance-tested).
  * `resize_u8_cv` — uint8 fixed-point path: Q11 coefficients computed from
    the f32 sample position (rint, i.e. half-to-even), horizontal pass in
    int32, vertical pass `((b0*(r0>>4))>>16 + (b1*(r1>>4))>>16 + 2) >> 2`.
    Bit-exact vs cv2 for downscale and interior (verified empirically);
    cv2 5.0's upscale border rows use a separate path that may differ by 1.

The reference resizes frames at `optical_flow.py:25-31` (`resize_frame`,
aspect-preserving to --frame_width, BGR uint8) before grayscale conversion.

Sample-index/weight tables are static per (src, dst) shape and precomputed
with numpy at trace time, so the device op is two gathers + multiply-adds.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _coeffs_f32(s_len: int, d_len: int):
    scale = s_len / d_len
    f = (np.arange(d_len) + 0.5) * scale - 0.5
    s0 = np.floor(f).astype(np.int32)
    t = (f - s0).astype(np.float32)
    t[s0 < 0] = 0.0
    s0[s0 < 0] = 0
    t[s0 >= s_len - 1] = 1.0
    s0[s0 >= s_len - 1] = max(s_len - 2, 0)
    s1 = np.minimum(s0 + 1, s_len - 1)
    return s0, s1, t


@functools.lru_cache(maxsize=256)
def _coeffs_u8(s_len: int, d_len: int):
    """Q11 fixed-point coefficients from the f32 sample position (cv2 u8 path)."""
    scale = s_len / d_len
    f = ((np.arange(d_len) + 0.5) * scale - 0.5).astype(np.float32)
    s0 = np.floor(f).astype(np.int32)
    t = f - s0.astype(np.float32)
    t[s0 < 0] = 0.0
    s0[s0 < 0] = 0
    t[s0 >= s_len - 1] = 1.0
    s0[s0 >= s_len - 1] = max(s_len - 2, 0)
    a1 = np.rint(t * np.float32(2048)).astype(np.int32)
    a0 = np.rint((np.float32(1.0) - t) * np.float32(2048)).astype(np.int32)
    s1 = np.minimum(s0 + 1, s_len - 1)
    return s0, s1, a0, a1


def resize_bilinear_f32(src, dw: int, dh: int):
    """cv2.resize(src_f32, (dw, dh), INTER_LINEAR) float-path semantics.

    src: (..., H, W) float32.  Resizes the trailing two axes.
    """
    sh, sw = src.shape[-2:]
    if (dw, dh) == (sw, sh):
        return src
    sx0, sx1, tx = _coeffs_f32(sw, dw)
    sy0, sy1, ty = _coeffs_f32(sh, dh)
    tx = jnp.asarray(tx)
    ty = jnp.asarray(ty)
    row = (jnp.take(src, sx0, axis=-1) * (1.0 - tx)
           + jnp.take(src, sx1, axis=-1) * tx)
    out = (jnp.take(row, sy0, axis=-2) * (1.0 - ty)[:, None]
           + jnp.take(row, sy1, axis=-2) * ty[:, None])
    return out.astype(jnp.float32)


def resize_u8_cv(src, dw: int, dh: int, channels_last: bool | None = None):
    """cv2.resize uint8 INTER_LINEAR fixed-point path, bit-exact (downscale).

    src: (H, W) uint8, or (H, W, C) uint8 when channels_last=True (the
    default for 3-D input).  Batch with jax.vmap.
    """
    if channels_last is None:
        channels_last = src.ndim == 3
    if channels_last and src.ndim == 3:
        h_ax, w_ax = 0, 1
    else:
        h_ax, w_ax = src.ndim - 2, src.ndim - 1
    sh, sw = src.shape[h_ax], src.shape[w_ax]
    if (dw, dh) == (sw, sh):
        return src
    sx0, sx1, ax0, ax1 = _coeffs_u8(sw, dw)
    sy0, sy1, by0, by1 = _coeffs_u8(sh, dh)
    s = src.astype(jnp.int32)
    shape_w = [1] * s.ndim
    shape_w[w_ax] = dw
    row = (jnp.take(s, sx0, axis=w_ax) * jnp.asarray(ax0).reshape(shape_w)
           + jnp.take(s, sx1, axis=w_ax) * jnp.asarray(ax1).reshape(shape_w))
    r0 = jnp.take(row, sy0, axis=h_ax) >> 4
    r1 = jnp.take(row, sy1, axis=h_ax) >> 4
    shape_h = [1] * s.ndim
    shape_h[h_ax] = dh
    acc = ((jnp.asarray(by0).reshape(shape_h) * r0) >> 16) + (
        (jnp.asarray(by1).reshape(shape_h) * r1) >> 16)
    out = (acc + 2) >> 2
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def aspect_preserving_size(src_h: int, src_w: int, frame_width: int):
    """Target (width, height) exactly as the reference computes it.

    `optical_flow.py:25-29`: ratio = W/H; new_h = int(frame_width / ratio)
    (truncation).
    """
    ratio = src_w / src_h
    return frame_width, int(frame_width / ratio)


def resize_frame_u8(frame, frame_width: int):
    """`resize_frame` (reference `optical_flow.py:25-31`): aspect-preserving
    uint8 resize of an (H, W[, C]) frame to the given width."""
    if frame.ndim == 3:
        sh, sw = frame.shape[0], frame.shape[1]
    else:
        sh, sw = frame.shape[-2], frame.shape[-1]
    dw, dh = aspect_preserving_size(sh, sw, frame_width)
    return resize_u8_cv(frame, dw, dh)


@functools.lru_cache(maxsize=128)
def _area_weights(s_len: int, d_len: int):
    """Dense per-axis INTER_AREA weight matrix (d_len, s_len), numpy f32.

    True area averaging for downscale (each output pixel averages its
    source footprint with fractional-overlap weights); for upscale cv2
    falls back to bilinear, and so do we.
    """
    if d_len >= s_len:
        return None
    scale = s_len / d_len
    Wm = np.zeros((d_len, s_len), dtype=np.float64)
    for d in range(d_len):
        lo = d * scale
        hi = (d + 1) * scale
        i0 = int(np.floor(lo))
        i1 = int(np.ceil(hi))
        for i in range(i0, min(i1, s_len)):
            ov = min(hi, i + 1) - max(lo, i)
            if ov > 0:
                Wm[d, i] = ov
    Wm /= scale
    return Wm.astype(np.float32)


def resize_area_f32(src, dw: int, dh: int):
    """cv2.resize INTER_AREA semantics for float inputs.

    src: (..., H, W) float32.  Used by OPTFLOW_USE_INITIAL_FLOW's initial
    flow downsample (OpenCV resizes flow0 with INTER_AREA).
    """
    sh, sw = src.shape[-2:]
    if (dw, dh) == (sw, sh):
        return src
    out = src
    wy = _area_weights(sh, dh)
    wx = _area_weights(sw, dw)
    if wy is not None:
        out = jnp.einsum("ij,...jk->...ik", jnp.asarray(wy), out)
    elif dh != sh:
        out = resize_bilinear_f32(out, out.shape[-1], dh)
    if wx is not None:
        out = jnp.einsum("...jk,lk->...jl", out, jnp.asarray(wx))
    elif dw != sw:
        out = resize_bilinear_f32(out, dw, out.shape[-2])
    return out.astype(jnp.float32)
