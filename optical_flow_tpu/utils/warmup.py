"""Ahead-of-time compilation warmup.

XLA compiles one executable per (frame shape, batch size, Farnebäck
config); on TPU transports with remote compilation the first video of a
new resolution can pay minutes of latency.  `warmup()` triggers those
compiles up front (e.g., at worker start, before the corpus loop), and the
persistent compilation cache (JAX_COMPILATION_CACHE_DIR) makes them
one-time per cluster.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import numpy as np

from optical_flow_tpu.models.farneback import calc_flow_batched
from optical_flow_tpu.ops import bgr2gray_u8, flow_to_bgr_u8, resize_frame_u8
from optical_flow_tpu.ops.polar import cart_to_polar
from optical_flow_tpu.pipeline.prefetch import pair_chunk_for
from optical_flow_tpu.utils.config import ExtractorConfig, FarnebackConfig
from optical_flow_tpu.utils.logging import get_logger

logger = get_logger("optical_flow_tpu.warmup")


def warmup_flow(h: int, w: int, batch: Optional[int] = None,
                config: FarnebackConfig = FarnebackConfig()) -> None:
    """Compile the batched flow pyramid for (batch, h, w)."""
    import jax.numpy as jnp

    b = batch or pair_chunk_for(h, w)
    z = np.zeros((b, h, w), np.uint8)
    flow = calc_flow_batched(z, z, config)
    mag, _ = cart_to_polar(flow[..., 0], flow[..., 1])
    float(jnp.sum(mag))
    logger.info("warmed flow executable for (%d, %d, %d)", b, h, w)


def warmup_extractor(src_h: int, src_w: int,
                     config: ExtractorConfig = ExtractorConfig()) -> None:
    """Compile everything the extractor needs for a source resolution."""
    import jax.numpy as jnp

    frame = np.zeros((src_h, src_w, 3), np.uint8)
    g = bgr2gray_u8(resize_frame_u8(jnp.asarray(frame), config.frame_width)
                    if config.frame_width else jnp.asarray(frame))
    gh, gw = g.shape
    warmup_flow(gh, gw, config=config.farneback)


def warmup_visualizer(src_h: int, src_w: int,
                      config: FarnebackConfig = FarnebackConfig()) -> None:
    """Compile everything the visualizer needs for a source resolution."""
    import jax.numpy as jnp

    b = pair_chunk_for(src_h, src_w)
    z = np.zeros((b, src_h, src_w), np.uint8)
    flow = calc_flow_batched(z, z, config)
    float(jnp.sum(jnp.asarray(flow_to_bgr_u8(flow), jnp.int32)))
    logger.info("warmed visualizer executables for (%d, %d)", src_h, src_w)
