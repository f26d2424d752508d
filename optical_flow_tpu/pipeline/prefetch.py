"""Streamed decode with parallel segment readers and decode-ahead.

The reference decodes synchronously inside its per-pair loop
(`optical_flow.py:83-99`, SURVEY.md 3.1 — the dominant I/O cost).  Here the
position list is split into contiguous segments, each decoded by its own
native VideoReader on its own thread (H.264 decode of disjoint ranges is
embarrassingly parallel), feeding bounded queues that the consumer drains
strictly in order — so the reference's early-break contract (first failed
read aborts everything after it) is preserved exactly while decode runs
Nx wide.  An optional `transform` runs in the worker threads (host-side
resize/grayscale), overlapping post-processing with decode and shrinking
the host->device upload.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, Tuple

import jax
import numpy as np

from optical_flow_tpu.io.video import VideoReader


def default_decode_workers(n_positions: int) -> int:
    """Segment count for parallel decode.

    Scales with the host's cores instead of a fixed constant (round-2
    advisory: a 4-worker cap tuned on this dev box starves many-core
    production hosts on the decode-dominated full-res extractor).  Each
    worker is a libav decode thread-group doing real work; past ~16
    segments per video the per-segment seek overhead outweighs decode
    overlap.  `OFT_DECODE_WORKERS` overrides for measurement or
    containers with misleading cpu_count."""
    env = os.environ.get("OFT_DECODE_WORKERS")
    if env:
        return max(1, int(env))
    if n_positions < 8:
        return 1
    cap = min(16, max(1, n_positions // 8))
    return max(1, min(cap, os.cpu_count() or 1))


class DecodePrefetcher:
    """Background decode of a list of frame positions, yielded in order.

    Yields (pos, frame_or_transform(frame) | None); a failed read yields
    (pos, None) and stops (the reference's early-break contract, even when
    later segments decoded successfully).
    """

    def __init__(self, v_path: str, positions: Iterable[float],
                 depth: int = 16,
                 transform: Optional[Callable[[np.ndarray], object]] = None,
                 workers: Optional[int] = None):
        self._positions = list(positions)
        n = len(self._positions)
        if workers is None:
            workers = default_decode_workers(n)
        workers = max(1, min(workers, max(n, 1)))
        self._stop = threading.Event()
        self._queues = []
        qdepth = max(2, depth // workers)
        bounds = [round(i * n / workers) for i in range(workers + 1)]
        for i in range(workers):
            seg = self._positions[bounds[i]:bounds[i + 1]]
            if not seg:
                continue
            q: "queue.Queue" = queue.Queue(maxsize=qdepth)
            self._queues.append(q)
            threading.Thread(target=self._run,
                             args=(v_path, seg, q, transform),
                             daemon=True).start()
        if not self._queues:           # empty position list
            q = queue.Queue(maxsize=1)
            q.put(None)
            self._queues.append(q)

    def _run(self, v_path: str, seg, q: "queue.Queue", transform) -> None:
        def put(item) -> bool:
            # bounded put that aborts when the consumer went away
            while not self._stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    pass
            return False

        vid = VideoReader(v_path)
        try:
            for pos in seg:
                if self._stop.is_set():
                    return
                ret, frame = vid.read_at(pos)
                if not ret:
                    put((pos, None))
                    return
                out = transform(frame) if transform is not None else frame
                if not put((pos, out)):
                    return
            put(None)                  # sentinel: segment done
        finally:
            vid.release()

    def __iter__(self) -> Iterator[Tuple[float, Optional[object]]]:
        try:
            for q in self._queues:
                while True:
                    item = q.get()
                    if item is None:
                        break          # segment exhausted, next one
                    yield item
                    if item[1] is None:
                        return         # failed read: drop the tail
        finally:
            self._stop.set()


_REF_HBM_BYTES = 16 << 30       # v5e, where the 32M-pixel budget was tuned


def _device_hbm_bytes() -> Optional[int]:
    """The accelerator's memory capacity, or None when unknown (CPU
    devices and transports without memory_stats)."""
    try:
        stats = jax.devices()[0].memory_stats()
        limit = stats.get("bytes_limit") if stats else None
        return int(limit) if limit else None
    except Exception:
        return None


def pair_chunk_for(h: int, w: int, budget_pixels: Optional[int] = None,
                   cap: int = 128) -> int:
    """Frame pairs per device dispatch, bounded by an HBM pixel budget.

    The default budget scales ~32M pixels (tuned on a 16 GB v5e: keeps the
    5-channel f32 fields of both frames, the iterate-loop intermediates,
    and the colorization temporaries resident with headroom — 16 pairs at
    1080p, 4 at 4K, both validated on hardware; 32 pairs at 1080p OOMed
    with colorization live) by the actual device memory from
    `memory_stats()["bytes_limit"]`, so smaller-HBM devices shrink their
    chunks instead of OOMing and larger ones batch deeper.  Unknown
    capacity (CPU meshes, restricted transports) uses the v5e constant."""
    if budget_pixels is None:
        hbm = _device_hbm_bytes()
        scale = (hbm / _REF_HBM_BYTES) if hbm else 1.0
        # TPU allocators report usable HBM a little below the nominal
        # 16 GiB the budget was tuned against; snap near-1 factors to
        # exactly 1.0 so the tuning device reproduces the hardware-
        # validated chunk sizes (16 pairs at 1080p, 4 at 4K) instead of
        # silently dispatching off-by-one shapes (round-3 advisor)
        if 0.85 <= scale <= 1.15:
            scale = 1.0
        budget_pixels = int((32 << 20) * scale)
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
