"""Streamed decode with decode-ahead and double-buffered device staging.

The reference decodes synchronously inside its per-pair loop
(`optical_flow.py:83-99`, SURVEY.md 3.1 — the dominant I/O cost).  Here a
background thread runs the native decoder ahead of the consumer through a
bounded queue, and batches are staged to the device asynchronously
(jax.device_put) while the previous batch computes — so at 1080p/4K the
TPU never waits on H.264 decode unless decode is strictly slower than
flow.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Tuple

import jax
import numpy as np

from optical_flow_tpu.io.video import VideoReader


class DecodePrefetcher:
    """Background decode of a list of frame positions, in order.

    Yields (pos, frame_bgr | None); a failed read yields (pos, None) and
    stops (the reference's early-break contract).
    """

    def __init__(self, v_path: str, positions: Iterable[float],
                 depth: int = 16):
        self._positions = list(positions)
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(
            target=self._run, args=(v_path,), daemon=True)
        self._thread.start()

    def _run(self, v_path: str) -> None:
        vid = VideoReader(v_path)
        try:
            for pos in self._positions:
                ret, frame = vid.read_at(pos)
                if not ret:
                    self._q.put((pos, None))
                    return
                self._q.put((pos, frame))
            self._q.put(None)          # sentinel: all done
        finally:
            vid.release()

    def __iter__(self) -> Iterator[Tuple[float, Optional[np.ndarray]]]:
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item
            if item[1] is None:
                return


def pair_chunk_for(h: int, w: int, budget_pixels: int = 32 << 20,
                   cap: int = 128) -> int:
    """Frame pairs per device dispatch, bounded by an HBM pixel budget.

    ~32M pixels keeps the 5-channel f32 fields of both frames, the
    iterate-loop intermediates, and the colorization temporaries inside a
    v5e's 16 GB with headroom (16 pairs at 1080p, 4 at 4K — both validated
    on hardware; 32 pairs at 1080p OOMed with colorization live)."""
    return max(1, min(cap, budget_pixels // (h * w)))


class DeviceStager:
    """Double-buffered host->device staging: device_put of the next batch
    overlaps the current batch's compute (JAX dispatch is async)."""

    def __init__(self):
        self._pending = None

    def stage(self, *arrays):
        staged = tuple(jax.device_put(a) for a in arrays)
        prev = self._pending
        self._pending = staged
        return prev, staged
