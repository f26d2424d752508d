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

TPU-first difference: sampled frames stream through a decode-ahead thread,
grayscale conversion and the Farnebäck pyramid + colorization run batched
on device (async dispatch overlaps the next frames' decode); JPEG encode
is host-side (native libjpeg).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax.numpy as jnp
import numpy as np

from optical_flow_tpu.io.jpeg import write_jpeg_bgr
from optical_flow_tpu.io.video import VideoReader
from optical_flow_tpu.models.farneback import calc_flow_bgr_chain_batched
from optical_flow_tpu.ops.host import bgr2gray_host
from optical_flow_tpu.pipeline.prefetch import DecodePrefetcher, pair_chunk_for
from optical_flow_tpu.utils.config import VisualizerConfig
from optical_flow_tpu.utils.metrics import PipelineMetrics


def visualize_shot(v_path: str, images_path: str, start_ms: int, end_ms: int,
                   config: Optional[VisualizerConfig] = None) -> int:
    """Write flow/source JPEG pairs for one shot.  Returns #pairs written."""
    config = config or VisualizerConfig()
    if not os.path.isdir(images_path):
        os.makedirs(images_path)

    vid = VideoReader(v_path)
    fps = vid.fps
    if not vid.is_opened() or fps <= 0:
        # reference parity: an unopenable video yields fps=0, which makes
        # its while-loop vacuous — it silently writes nothing
        # (`visualize_optical_flow.py:14-21`)
        vid.release()
        return 0
    start_frame = fps * start_ms / 1000          # float, like the reference
    end_frame = int(fps * end_ms / 1000)
    step = int(fps * config.step_size / 1000)
    if step <= 0:
        raise ValueError(
            f"step_size={config.step_size}ms is shorter than one frame at "
            f"fps={fps}")

    metrics = PipelineMetrics("visualize")
    # sample positions exactly like the reference's while loop
    positions = []
    ts = start_frame
    while ts < end_frame:
        positions.append(ts)
        ts += step
    h, w = vid.height, vid.width
    vid.release()
    if len(positions) < 2:
        return 0

    # grayscale runs host-side in the decode workers (bit-exact numpy twin
    # of the device op): the flow path uploads 1 gray channel, not 3 BGR
    prefetch = DecodePrefetcher(v_path, positions,
                                transform=lambda f: (f, bgr2gray_host(f)))
    chunk_size = pair_chunk_for(h or 1080, w or 1920)
    # JPEG encode is host-side CPU work (libjpeg releases the GIL);
    # a small pool keeps it off the decode/compute critical path
    pool = ThreadPoolExecutor(max_workers=4)
    encodes = []

    stamps = []
    gray = []           # device gray frames (freed once consumed)
    written = 0
    pend = []           # pair indices awaiting dispatch
    validate_sample = []   # first gray pair, host copies (--validate)

    inflight = []          # (pend, device flow image) awaiting download

    def write_planar(path, planar_u8, quality):
        # (3, H, W) -> HWC contiguous inside the worker, off the hot path
        write_jpeg_bgr(path, np.ascontiguousarray(
            planar_u8.transpose(1, 2, 0)), quality)

    def drain_one():
        nonlocal written
        dpend, dev = inflight.pop(0)
        with metrics.stage("download"):
            flow_bgr = np.asarray(dev)         # planar (B, 3, H, W) uint8
        with metrics.stage("encode"):
            for j, i in enumerate(dpend):
                ms = int(stamps[i] / fps * 1000)
                encodes.append(pool.submit(
                    write_planar,
                    os.path.join(images_path, f"flow_{ms}.jpeg"),
                    flow_bgr[j], config.jpeg_quality))
                written += 1

    def drain():
        while inflight:
            drain_one()

    def flush(pend):
        with metrics.stage("flow"):
            # pyramid + colorization fused into one device program
            # (Pallas colorize kernel on TPU): async device dispatch.
            # pend is consecutive (i-1, i) pairs, so the CHAINED entry
            # applies everywhere: each interior frame is smoothed/
            # expanded once, not twice.  On a multi-device host the chain
            # is dp-sharded as overlapping per-shard sub-chains (one
            # duplicated frame per shard) so the optimization survives
            # sharding (round-2 VERDICT item 3).
            from optical_flow_tpu.pipeline.extractor import _dp_mesh
            mesh = _dp_mesh()
            frames = jnp.stack([gray[pend[0] - 1]]
                               + [gray[i] for i in pend])
            if mesh is not None:
                from optical_flow_tpu.parallel.mesh import (
                    chain_shards, sharded_bgr_chain_step)
                dev = sharded_bgr_chain_step(
                    mesh, chain_shards(frames, mesh.devices.size),
                    config.farneback)[:len(pend)]
            else:
                dev = calc_flow_bgr_chain_batched(frames, config.farneback)
        metrics.add("frame_pairs", len(pend))
        for i in pend:
            gray[i - 1] = None     # frame pairs are consecutive; i-1 done
        inflight.append((list(pend), dev))
        if len(inflight) > 1:
            drain_one()

    with metrics.stage("stream"):
        for pos, item in prefetch:
            if item is None:
                break
            frame, gray_np = item
            stamps.append(pos)
            i = len(gray)
            if config.validate and i < 2:
                validate_sample.append(np.asarray(gray_np))
            gray.append(jnp.asarray(gray_np))   # async gray upload
            if i >= 1:
                # source image written on arrival (bounded host memory at 4K)
                ms = int(pos / fps * 1000)
                encodes.append(pool.submit(
                    write_jpeg_bgr,
                    os.path.join(images_path, f"source_{ms}.jpeg"),
                    frame, config.jpeg_quality))
                pend.append(i)
                if len(pend) >= chunk_size:
                    flush(pend)
                    pend = []
        if pend:
            flush(pend)
        drain()
        for f in encodes:
            f.result()                  # surface encode errors
        pool.shutdown()
    if len(validate_sample) == 2:
        from optical_flow_tpu.utils.validate import log_validation, sampled_epe
        epe = sampled_epe(validate_sample[0], validate_sample[1],
                          config.farneback)
        log_validation(epe, f"visualize:{os.path.basename(v_path)}")
        if epe is not None:
            metrics.counters["validate_mean_epe"] = epe
    metrics.log_summary()
    return written
