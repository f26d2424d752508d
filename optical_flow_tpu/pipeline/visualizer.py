"""Shot-window flow visualizer (TPU re-expression of
`visualize_optical_flow.py:9-63`).

Behavioral contract:
  * `start_frame = fps*start_ms/1000` stays FLOAT, `end_frame` and the step
    are truncated ints (`visualize_optical_flow.py:15-17`); seeks receive
    float indices and decode floor(pos) (SURVEY.md 2c #4);
  * loop `while ts < end_frame`, advancing by the step; first failed read
    breaks (`:21-27`);
  * flow is computed between consecutive *sampled* frames (~step_size ms
    apart, `:62-63`), at FULL native resolution (no resize);
  * outputs `flow_<ms>.jpeg` + `source_<ms>.jpeg` with
    `ms = int(ts/fps*1000)`, starting from the SECOND sampled timestamp
    (`:29-31,57-60`); extension `.jpeg`;
  * hue = angle with the uint8 double-wrap quirk, value = per-frame
    min-max-normalized magnitude, saturation 255 (`:51-54`, SURVEY.md 2c).

TPU-first difference: sampled frames are decoded once, grayscale conversion
and the Farnebäck pyramid + colorization run batched on device; JPEG encode
is host-side (native libjpeg), overlapping the next batch's compute.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from optical_flow_tpu.io.jpeg import write_jpeg_bgr
from optical_flow_tpu.io.video import VideoReader
from optical_flow_tpu.models.farneback import calc_flow_batched
from optical_flow_tpu.ops import bgr2gray_u8, flow_to_bgr_u8
from optical_flow_tpu.utils.config import VisualizerConfig

PAIR_CHUNK = 8   # full-res pairs per device dispatch


def visualize_shot(v_path: str, images_path: str, start_ms: int, end_ms: int,
                   config: Optional[VisualizerConfig] = None) -> int:
    """Write flow/source JPEG pairs for one shot.  Returns #pairs written."""
    config = config or VisualizerConfig()
    if not os.path.isdir(images_path):
        os.makedirs(images_path)

    vid = VideoReader(v_path)
    fps = vid.fps
    start_frame = fps * start_ms / 1000          # float, like the reference
    end_frame = int(fps * end_ms / 1000)
    step = int(fps * config.step_size / 1000)
    if step <= 0:
        raise ValueError(
            f"step_size={config.step_size}ms is shorter than one frame at "
            f"fps={fps}")

    # sample the shot (host decode, sequential-friendly seeks)
    stamps = []
    frames = []
    ts = start_frame
    while ts < end_frame:
        ret, frame = vid.read_at(ts)
        if not ret:
            break
        stamps.append(ts)
        frames.append(frame)
        ts += step
    vid.release()

    if len(frames) < 2:
        return 0

    bgr = np.stack(frames)                       # (N, H, W, 3)
    gray = np.asarray(_gray_batch(jnp.asarray(bgr)))
    written = 0
    for c0 in range(1, len(frames), PAIR_CHUNK):
        idx = list(range(c0, min(c0 + PAIR_CHUNK, len(frames))))
        prev = jnp.asarray(gray[[i - 1 for i in idx]])
        nxt = jnp.asarray(gray[idx])
        flow = calc_flow_batched(prev, nxt, config.farneback)
        flow_bgr = np.asarray(flow_to_bgr_u8(flow))
        for j, i in enumerate(idx):
            ms = int(stamps[i] / fps * 1000)
            write_jpeg_bgr(os.path.join(images_path, f"flow_{ms}.jpeg"),
                           flow_bgr[j], config.jpeg_quality)
            write_jpeg_bgr(os.path.join(images_path, f"source_{ms}.jpeg"),
                           bgr[i], config.jpeg_quality)
            written += 1
    return written


def _gray_batch(bgr):
    return bgr2gray_u8(bgr)
