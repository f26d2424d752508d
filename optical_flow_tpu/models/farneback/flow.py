"""Farnebäck dense optical flow: the public model entry points.

`calc_flow(prev, next, config)` matches cv2.calcOpticalFlowFarneback's
contract: two (H, W) uint8 (or float) grayscale frames in, (H, W, 2)
float32 flow out (x-displacement, y-displacement) — the computation the
reference delegates to OpenCV at `optical_flow.py:51-59` and
`visualize_optical_flow.py:38-46`.

TPU-first structure: a Python loop over the (static) pyramid schedule, all
per-level work expressed as fused stencil math over (C, H, W) arrays;
`calc_flow_batched` vmaps the whole pyramid over a leading batch of frame
pairs so a shot's pairs run as one XLA program.  Jitted executables are
cached per (shape, config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from optical_flow_tpu.models.farneback import core
from optical_flow_tpu.models.farneback.params import (
    FarnebackPlan,
    build_plan,
    gaussian_kernel,
)
from optical_flow_tpu.ops.resize import resize_bilinear_f32
from optical_flow_tpu.utils.config import FarnebackConfig


def _flow_pyramid(prev_f, next_f, plan: FarnebackPlan):
    """Run the full coarse-to-fine schedule on one (H, W) f32 frame pair."""
    cfg = plan.config
    flow = None
    for lv in plan.levels:
        R = []
        for img in (prev_f, next_f):
            kern = gaussian_kernel(lv.smooth_ksize, lv.smooth_sigma)
            sm = core.gaussian_blur_reflect101(img, kern)
            I = resize_bilinear_f32(sm, lv.width, lv.height)
            R.append(core.poly_exp(I, cfg.poly_n, cfg.poly_sigma))
        R0, R1 = R

        if flow is None:
            flow = jnp.zeros((2, lv.height, lv.width), jnp.float32)
        else:
            flow = resize_bilinear_f32(flow, lv.width, lv.height)
            flow = flow * jnp.float32(1.0 / cfg.pyr_scale)

        flow = core.update_flow(R0, R1, flow, cfg.winsize, cfg.iterations,
                                gaussian=cfg.gaussian_window)
    return flow


@functools.lru_cache(maxsize=64)
def _jitted_single(h: int, w: int, config: FarnebackConfig):
    plan = build_plan(h, w, config)

    def fn(prev, nxt):
        flow = _flow_pyramid(prev.astype(jnp.float32),
                             nxt.astype(jnp.float32), plan)
        return jnp.moveaxis(flow, 0, -1)   # (H, W, 2), cv2 layout

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _jitted_batched(h: int, w: int, config: FarnebackConfig):
    plan = build_plan(h, w, config)

    def one(prev, nxt):
        flow = _flow_pyramid(prev.astype(jnp.float32),
                             nxt.astype(jnp.float32), plan)
        return jnp.moveaxis(flow, 0, -1)

    return jax.jit(jax.vmap(one))


def calc_flow(prev, nxt, config: FarnebackConfig = FarnebackConfig()):
    """Dense Farnebäck flow for one frame pair.

    prev, nxt: (H, W) uint8/float grayscale.  Returns (H, W, 2) float32.
    """
    if prev.shape != nxt.shape:
        raise ValueError(f"frame shapes differ: {prev.shape} vs {nxt.shape}")
    if prev.ndim != 2:
        raise ValueError(f"expected (H, W) grayscale, got {prev.shape}")
    if config.use_initial_flow:
        raise NotImplementedError(
            "OPTFLOW_USE_INITIAL_FLOW is not implemented yet; the reference "
            "always passes flow=None (optical_flow.py:52)")
    h, w = prev.shape
    return _jitted_single(h, w, config)(prev, nxt)


def calc_flow_batched(prev, nxt, config: FarnebackConfig = FarnebackConfig()):
    """Dense Farnebäck flow for a batch of frame pairs.

    prev, nxt: (B, H, W).  Returns (B, H, W, 2) float32.  The whole batch is
    one XLA program (vmapped pyramid), the unit of work for TPU batching.
    """
    if prev.shape != nxt.shape:
        raise ValueError(f"frame shapes differ: {prev.shape} vs {nxt.shape}")
    if prev.ndim != 3:
        raise ValueError(f"expected (B, H, W), got {prev.shape}")
    if config.use_initial_flow:
        raise NotImplementedError("OPTFLOW_USE_INITIAL_FLOW not implemented")
    _, h, w = prev.shape
    return _jitted_batched(h, w, config)(prev, nxt)
