"""JPEG output matching cv2.imwrite defaults.

cv2.imwrite('x.jpeg', bgr) uses libjpeg quality 95 (verified: default output
is byte-identical to explicit quality=95, and PIL at quality 95 produces the
same bytes — all three use stock libjpeg tables/4:2:0).  Reference call
sites: `visualize_optical_flow.py:59-60`.
"""

from __future__ import annotations

import ctypes

import numpy as np


def write_jpeg_bgr(path: str, bgr: np.ndarray, quality: int = 95) -> None:
    bgr = np.ascontiguousarray(bgr, dtype=np.uint8)
    h, w = bgr.shape[:2]
    try:
        from optical_flow_tpu.io.native import get_lib
        lib = get_lib()
        ok = lib.ofio_jpeg_write(
            str(path).encode(),
            bgr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
            int(quality))
        if ok:
            return
    except Exception:
        pass
    # fallback: PIL (byte-identical to cv2 at same quality, verified)
    from PIL import Image
    Image.fromarray(bgr[..., ::-1]).save(str(path), quality=int(quality))
