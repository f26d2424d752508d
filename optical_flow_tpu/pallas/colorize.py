"""Fused flow -> BGR colorization Pallas kernel (the visualizer hot path).

One VMEM pass per row band does cartToPolar (fastAtan2 polynomial), the
reference's uint8 hue double-wrap, min-max value scaling, and the 8-bit
HSV->BGR sector math, writing planar uint8 BGR directly — the XLA path
(`ops/colorize.py:flow_to_bgr_u8`) spans two HBM fusions (reduce + map)
plus a layout change.  Matches the XLA path up to the +-1-level
FMA-contraction wobble on ~1e-4 of pixels that the XLA path itself
documents vs cv2 (ops/color.py:_fma) — differential-tested in
tests/test_pallas_kernels.py.  Semantics replicate the reference's HSV
assembly at `visualize_optical_flow.py:48-55` including the quirks in
SURVEY.md section 2c (#1 hue double-wrap, #2 value truncation).

The per-frame min/max reduction stays in XLA (a cheap single fusion);
scale/shift arrive as per-frame scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optical_flow_tpu.ops.color import _SECTOR_DATA

TILE_H = 8

# fastAtan2 polynomial constants in degrees (ops/polar.py keeps the
# canonical copies; duplicated here as plain floats for the kernel body).
_P1 = np.float32(0.9997878412794807 * (180.0 / 3.141592653589793))
_P3 = np.float32(-0.3258083974640975 * (180.0 / 3.141592653589793))
_P5 = np.float32(0.1555786518463281 * (180.0 / 3.141592653589793))
_P7 = np.float32(-0.04432655554792128 * (180.0 / 3.141592653589793))
_DBL_EPS = np.float32(2.220446049250313e-16)
_RAD_PER_DEG = np.float32(3.141592653589793 / 180.0)
_DEG_PER_RAD = np.float32(180.0 / 3.141592653589793)
_INV255 = np.float32(1.0 / 255.0)


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


def _colorize_kernel(flow_ref, ss_ref, bgr_ref, *, n_bands: int):
    fx = flow_ref[0, 0]
    fy = flow_ref[0, 1]
    mag = jnp.sqrt(fx * fx + fy * fy)
    frame = pl.program_id(0) // n_bands

    # fastAtan2 (degrees), then the f32 deg->rad->deg round-trip the
    # reference performs via cartToPolar + `ang * 180/pi`
    ax = jnp.abs(fx)
    ay = jnp.abs(fy)
    lo = jnp.minimum(ax, ay)
    hi = jnp.maximum(ax, ay)
    c = lo / (hi + _DBL_EPS)
    c2 = c * c
    poly = (((_P7 * c2 + _P5) * c2 + _P3) * c2 + _P1) * c
    a = jnp.where(ax >= ay, poly, jnp.float32(90.0) - poly)
    a = jnp.where(fx < 0, jnp.float32(180.0) - a, a)
    a = jnp.where(fy < 0, jnp.float32(360.0) - a, a)
    hue_f = (a * _RAD_PER_DEG) * _DEG_PER_RAD
    # uint8 assignment: truncate toward zero, wrap mod 256 (quirk #1)
    h = jnp.mod(jnp.floor(hue_f), jnp.float32(256.0))

    # value: per-frame min-max normalize, truncation cast (quirk #2)
    scale = ss_ref[frame, 0]
    shift = ss_ref[frame, 1]
    value = jnp.clip(jnp.floor(mag * scale + shift), 0.0, 255.0)

    # 8-bit HSV->BGR, cv2 vectorized-path semantics (hue mod 180 via the
    # 6.0/180 scaling + >=6 wrap; s==255 kept in the generic formula so
    # rounding matches ops/color.py:hsv2bgr_u8 bit-for-bit)
    s = jnp.float32(255.0) * _INV255
    v = value * _INV255
    hh = h * jnp.float32(6.0 / 180.0)
    hh = jnp.where(hh >= 6.0, hh - jnp.float32(6.0), hh)
    sector = jnp.floor(hh)
    hfrac = hh - sector
    one = jnp.float32(1.0)
    tabs = (v,
            v * (one - s),
            v * (-s * hfrac + one),
            v * (-s * (one - hfrac) + one))

    for ch in range(3):
        out = tabs[_SECTOR_DATA[5][ch]]
        for k in range(4, -1, -1):
            out = jnp.where(sector == k, tabs[_SECTOR_DATA[k][ch]], out)
        # Mosaic has no direct f32->u8 cast on v5e; go through i32
        bgr_ref[0, ch] = jnp.clip(jnp.floor(out * jnp.float32(255.0)),
                                  0.0, 255.0).astype(jnp.int32) \
            .astype(jnp.uint8)


@functools.lru_cache(maxsize=64)
def _build(batch: int, h: int, w: int):
    n_bands = h // TILE_H

    def fmap(gi):
        return (gi // n_bands, 0, gi % n_bands, 0)

    return pl.pallas_call(
        functools.partial(_colorize_kernel, n_bands=n_bands),
        grid=(batch * n_bands,),
        in_specs=[
            pl.BlockSpec((1, 2, TILE_H, w), fmap,
                         memory_space=pltpu.VMEM),     # flow band
            # full (B, 2) scalar table, unblocked: Mosaic requires SMEM
            # blocks to cover the array (a (1, 2) window is not a legal
            # block for B not in {1, 8k}); indexed by program id instead
            pl.BlockSpec((batch, 2), lambda gi: (0, 0),
                         memory_space=pltpu.SMEM),     # (scale, shift)
        ],
        out_specs=pl.BlockSpec((1, 3, TILE_H, w), fmap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 3, h, w), jnp.uint8),
    )


def flow_to_bgr_planar_pallas(flow_planar):
    """flow (B, 2, H, W) f32 -> planar BGR uint8 (B, 3, H, W).

    Matches `ops.colorize.flow_to_bgr_u8` (modulo the channel layout:
    planar here, interleaved there) up to the documented FMA wobble.
    """
    B, _, H, W = flow_planar.shape
    fx = flow_planar[:, 0]
    fy = flow_planar[:, 1]
    mag = jnp.sqrt(fx * fx + fy * fy)
    smin = jnp.min(mag, axis=(-2, -1))
    smax = jnp.max(mag, axis=(-2, -1))
    rng = smax - smin
    scale = jnp.where(rng > _DBL_EPS, jnp.float32(255.0) / rng,
                      jnp.float32(0.0))
    shift = -smin * scale
    ss = jnp.stack([scale, shift], axis=-1)            # (B, 2)

    Hp = _ceil(H, TILE_H)
    Wp = _ceil(W, 128)
    if (Hp, Wp) != (H, W):
        flow_planar = jnp.pad(
            flow_planar, [(0, 0), (0, 0), (0, Hp - H), (0, Wp - W)])
    bgr = _build(B, Hp, Wp)(flow_planar, ss)
    return bgr[:, :, :H, :W]
