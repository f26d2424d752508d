"""Fused flow -> BGR colorization (the visualizer's HSV assembly).

Replicates the exact byte-level behavior of the reference's HSV image
assembly (`visualize_optical_flow.py:48-55`):

  mag, ang = cv2.cartToPolar(flow_x, flow_y)      # ang f32 radians [0, 2pi)
  hsv[..., 0] = ang * 180 / np.pi                  # float -> uint8: C-cast
                                                   # truncation, wraps mod 256
                                                   # ("hue double-wrap" quirk,
                                                   # SURVEY.md 2c #1)
  hsv[..., 1] = 255
  hsv[..., 2] = cv2.normalize(mag, None, 0, 255, NORM_MINMAX)  # trunc cast
  bgr = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)

Numpy evaluates `ang_f32 * (180/np.pi)` in float64; we compute the hue in
f32 from the fastAtan2 degrees (the deg->rad->deg round-trip reproduced in
f32 is within ~3e-5 deg of the f64 value, which can flip the truncated byte
on ~1e-4 of pixels; the golden tests gate that explicitly).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from optical_flow_tpu.ops.color import hsv2bgr_u8
from optical_flow_tpu.ops.polar import fast_atan2_deg, normalize_minmax_u8_value

_RAD_PER_DEG = np.float32(3.141592653589793 / 180.0)
_DEG_PER_RAD = np.float32(180.0 / 3.141592653589793)


def flow_to_bgr_u8(flow):
    """flow (..., H, W, 2) f32 -> BGR uint8 (..., H, W, 3) visualization.

    Hue encodes angle (with the reference's double-wrap), value encodes
    per-frame min-max-normalized magnitude, saturation is 255.
    """
    fx = flow[..., 0]
    fy = flow[..., 1]
    mag = jnp.sqrt(fx * fx + fy * fy)
    # cv2.cartToPolar produces radians = f32(deg * pi/180); numpy then
    # multiplies by float64 180/pi.  Reproduce the round-trip in f32.
    deg = fast_atan2_deg(fy, fx)
    rad = deg * _RAD_PER_DEG
    hue_f = rad * _DEG_PER_RAD                     # ~deg, in [0, 360)
    # uint8 assignment: truncate toward zero, wrap mod 256.
    hue = jnp.mod(jnp.floor(hue_f), 256.0).astype(jnp.uint8)
    value = jnp.floor(normalize_minmax_u8_value(mag))
    value = jnp.clip(value, 0, 255).astype(jnp.uint8)
    sat = jnp.full_like(hue, 255)
    hsv = jnp.stack([hue, sat, value], axis=-1)
    return hsv2bgr_u8(hsv)
