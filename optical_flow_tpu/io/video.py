"""VideoReader — cv2.VideoCapture-compatible frame-index access.

Replaces the reference's decode layer (`optical_flow.py:71,75-76,36-37`,
`visualize_optical_flow.py:14-17,23-24`) with the native libav runtime:

  * `fps`, `frame_count`, `width`, `height` — the properties the reference
    reads via CAP_PROP_FPS / CAP_PROP_FRAME_COUNT;
  * `read_at(pos)` — seek-by-frame-index + decode; accepts float positions
    and decodes frame floor(pos), matching the verified CAP_PROP_POS_FRAMES
    behavior (SURVEY.md 2c #4); returns (ret, BGR uint8 (H, W, 3) | None)
    exactly like `vid.read()`.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from optical_flow_tpu.io.native import get_lib
from optical_flow_tpu.utils.logging import get_logger

logger = get_logger("io.video")


class VFRStreamError(IOError):
    """Raised when a stream has variable frame rate and fps-based
    frame-index seeks would silently select wrong frames.

    Distinct from generic IOError so the corpus driver can treat one VFR
    video as a logged per-video skip instead of aborting the whole run
    (the pinned cv2 4.2 reference would process it — deterministically,
    but fps-indexed; set OFIO_ALLOW_VFR=1 to reproduce that)."""


class VideoReader:
    def __init__(self, path: str):
        self._lib = get_lib()
        self._h = self._lib.ofio_open(str(path).encode())
        self.path = path
        self.rotation_degrees = 0.0
        self.is_vfr = False
        if self._h:
            fps = ctypes.c_double()
            cnt = ctypes.c_int64()
            w = ctypes.c_int()
            ht = ctypes.c_int()
            self._lib.ofio_props(self._h, ctypes.byref(fps), ctypes.byref(cnt),
                                 ctypes.byref(w), ctypes.byref(ht))
            self.fps = fps.value
            self.frame_count = int(cnt.value)
            self.width = int(w.value)
            self.height = int(ht.value)
            rot = ctypes.c_double()
            vfr = ctypes.c_int()
            self._lib.ofio_meta(self._h, ctypes.byref(rot), ctypes.byref(vfr))
            self.rotation_degrees = float(rot.value)
            self.is_vfr = bool(vfr.value)
            # Frame-index <-> time mapping uses ONE fps value (the same
            # CFR assumption as cv2's CAP_PROP_POS_FRAMES seek).  On a
            # VFR stream that mapping selects different frames than the
            # timestamps imply — silently wrong output for a feature
            # extractor — so fail loudly instead (round-2 VERDICT item 7).
            if self.is_vfr and os.environ.get("OFIO_ALLOW_VFR") != "1":
                self.release()
                raise VFRStreamError(
                    f"'{path}': variable frame rate stream (non-constant "
                    "frame intervals in the stream head): frame-index "
                    "seeks are fps-based and would select wrong frames. "
                    "Re-encode to constant frame rate, or set "
                    "OFIO_ALLOW_VFR=1 to force cv2-style fps-based "
                    "indexing anyway.")
            if self.rotation_degrees:
                # decode stays UNROTATED — the reference's pinned cv2
                # 4.2 behavior (auto-rotation arrived in cv2 4.5); warn
                # because modern players/decoders will disagree
                logger.warning(
                    "'%s' carries a displaymatrix rotation of %g deg; "
                    "decoding unrotated for cv2-4.2 parity "
                    "(reference pins opencv-python==4.2.0.32)",
                    path, self.rotation_degrees)
        else:
            self.fps = 0.0
            self.frame_count = 0
            self.width = 0
            self.height = 0

    def is_opened(self) -> bool:
        return bool(self._h)

    def read_at(self, pos: float):
        """Decode frame floor(pos).  Returns (ret, frame_bgr | None)."""
        if not self._h:
            return False, None
        buf = np.empty((self.height, self.width, 3), np.uint8)
        ok = self._lib.ofio_read_frame(
            self._h, float(pos),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if not ok:
            return False, None
        return True, buf

    def release(self) -> None:
        if self._h:
            self._lib.ofio_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass
