"""cartToPolar and min-max normalization with OpenCV-exact semantics.

The reference converts flow to polar at `optical_flow.py:61` and
`visualize_optical_flow.py:48`, and per-frame min-max normalizes magnitude
into [0,255] at `visualize_optical_flow.py:54`.

Calibration notes (empirical, local cv2):
  * cv2.cartToPolar angle uses OpenCV's fastAtan2 polynomial (max error
    ~0.3 degrees vs true atan2), computed in degrees then scaled by
    f32(pi/180).  angle(0,0) == 0.  Magnitude is f32 sqrt(x*x + y*y).
  * cv2.normalize NORM_MINMAX computes scale/shift in f64 from the f32
    min/max, casts both to f32, and applies one fused multiply-add per
    element (single rounding).  Constant input -> all zeros.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# fastAtan2 polynomial constants (degrees).
_P1 = np.float32(0.9997878412794807 * (180.0 / 3.141592653589793))
_P3 = np.float32(-0.3258083974640975 * (180.0 / 3.141592653589793))
_P5 = np.float32(0.1555786518463281 * (180.0 / 3.141592653589793))
_P7 = np.float32(-0.04432655554792128 * (180.0 / 3.141592653589793))
_DBL_EPS = np.float32(2.220446049250313e-16)
_DEG2RAD = np.float32(3.141592653589793 / 180.0)


def fast_atan2_deg(y, x):
    """OpenCV fastAtan2: angle in degrees [0, 360), f32 polynomial."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    lo = jnp.minimum(ax, ay)
    hi = jnp.maximum(ax, ay)
    c = lo / (hi + _DBL_EPS)
    c2 = c * c
    poly = (((_P7 * c2 + _P5) * c2 + _P3) * c2 + _P1) * c
    a = jnp.where(ax >= ay, poly, jnp.float32(90.0) - poly)
    a = jnp.where(x < 0, jnp.float32(180.0) - a, a)
    a = jnp.where(y < 0, jnp.float32(360.0) - a, a)
    return a


def cart_to_polar(x, y):
    """cv2.cartToPolar(x, y): (magnitude, angle-in-radians [0, 2*pi))."""
    mag = jnp.sqrt(x * x + y * y)
    ang = fast_atan2_deg(y, x) * _DEG2RAD
    return mag, ang


def normalize_minmax_u8_value(mag):
    """cv2.normalize(mag, None, 0, 255, NORM_MINMAX) -> f32 in [0, 255].

    Per-frame affine map; constant input maps to all zeros (verified
    empirically, see SURVEY.md 2c).  Reference: `visualize_optical_flow.py:54`.
    """
    smin = jnp.min(mag, axis=(-2, -1), keepdims=True)
    smax = jnp.max(mag, axis=(-2, -1), keepdims=True)
    rng = smax - smin
    scale = jnp.where(rng > jnp.float32(2.220446049250313e-16),
                      jnp.float32(255.0) / rng, jnp.float32(0.0))
    shift = -smin * scale
    return mag * scale + shift
