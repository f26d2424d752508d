"""Farnebäck dense optical flow: the public model entry points.

`calc_flow(prev, next, config)` matches cv2.calcOpticalFlowFarneback's
contract: two (H, W) uint8 (or float) grayscale frames in, (H, W, 2)
float32 flow out (x-displacement, y-displacement) — the computation the
reference delegates to OpenCV at `optical_flow.py:51-59` and
`visualize_optical_flow.py:38-46`.

TPU-first structure: a Python loop over the (static) pyramid schedule with
all per-level work batch-native over (B, C, H, W) arrays — one XLA program
per (shape, config), no vmap — so the Pallas displaced-fetch kernel (the
hot update step) can use its own batch grid.  On TPU backends the update
step runs the Pallas kernel for shapes it supports; everywhere else (CPU
tests, tiny levels) the XLA gather path is used.  Both are exact.
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
from optical_flow_tpu.ops.resize import resize_area_f32, resize_bilinear_f32
from optical_flow_tpu.utils.config import FarnebackConfig


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _pick_update_fn_stats(h: int, w: int):
    """The Pallas displaced-fetch kernel's (M, tiers) variant on TPU when
    the level shape qualifies and is large enough to matter; None means
    use the XLA gather (no tiers)."""
    if _on_tpu() and min(h, w) >= 64:
        from optical_flow_tpu.pallas.update_gather import (
            supported_shape, update_matrices_pallas_batched_stats)
        if supported_shape(h, w, chunked=True):
            return update_matrices_pallas_batched_stats
    return None


def _pick_poly_exp_fn(h: int, w: int):
    """Fused Pallas polyexp on TPU for non-trivial shapes."""
    if _on_tpu() and min(h, w) >= 32:
        from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
        return poly_exp_pallas
    return core.poly_exp


def _pick_gauss_fn(h: int, w: int):
    """Fused Pallas separable Gaussian on TPU for non-trivial shapes."""
    if _on_tpu() and min(h, w) >= 32:
        from optical_flow_tpu.pallas.gauss import gaussian_blur_pallas
        return gaussian_blur_pallas
    return core.gaussian_blur_reflect101


def _pick_gauss_resize_fn(h: int, w: int, out_h: int, out_w: int, s: int,
                          ksize: int = 19, bf16: bool = False):
    """Fused Pallas smooth+downsample (one kernel instead of full-res blur
    + separate resize) when the level dims divide exactly by s = 2^k and
    the width-proportional window scratch fits scoped VMEM (8K-wide s=8
    levels fall back to gauss + resize)."""
    if _on_tpu() and min(h, w) >= 64:
        from optical_flow_tpu.pallas.gauss_resize import (
            gaussian_blur_resize_pallas, supported)
        if supported(h, w, out_h, out_w, s, ksize=ksize, bf16=bf16):
            return gaussian_blur_resize_pallas
    return None


def _pick_blur_solve_fn(h: int, w: int, winsize: int, gaussian: bool):
    """Fused Pallas blur+solve on TPU for non-trivial shapes."""
    if _on_tpu() and min(h, w) >= 32 and winsize >= 3:
        from optical_flow_tpu.pallas.blur_solve import (
            update_flow_blur_solve_pallas)
        return lambda M: update_flow_blur_solve_pallas(
            M, winsize, gaussian=gaussian)
    return None


def _pick_fused_update_flow(h: int, w: int, winsize: int):
    """Fused store-layout iterate loop (update + blur chained with zero
    XLA-side relayout copies) when both kernels qualify."""
    if _on_tpu() and min(h, w) >= 64:
        from optical_flow_tpu.pallas.fused_iterate import (
            supported, update_flow_fused)
        if supported(h, w, winsize):
            return update_flow_fused
    return None


def _pick_poly_fused_update_flow(h: int, w: int, cfg):
    """Polyexp-fused iterate loop (R never materialized in HBM) when the
    full-width fused step, the Pallas polyexp and the fused-polyexp flag
    all apply to this level."""
    if _on_tpu() and min(h, w) >= 64:
        from optical_flow_tpu.pallas.fused_iterate import (
            FUSE_UPDATE_BLUR, poly_fused_supported, update_flow_fused_poly)
        if (FUSE_UPDATE_BLUR
                and poly_fused_supported(h, w, cfg.winsize, cfg.poly_n)
                and _pick_poly_exp_fn(h, w) is not core.poly_exp):
            return update_flow_fused_poly
    return None


def _flow_pyramid(prev_f, nxt_f, plan: FarnebackPlan, use_pallas: bool,
                  initial_flow=None, chain: bool = False, sp_kernels=None,
                  input_u8: bool = False):
    """Run the full coarse-to-fine schedule on (B, H, W) f32 frame batches.

    initial_flow: optional (B, 2, H, W) seed used at the coarsest level
    (OPTFLOW_USE_INITIAL_FLOW: OpenCV downsamples flow0 with INTER_AREA
    and scales it to the level).  Returns (B, 2, H, W) flow.

    chain=True: prev_f is a batch of N CONSECUTIVE frames (nxt_f must be
    None) and flow is computed for the N-1 pairs (i, i+1).  Each interior
    frame's smoothing/resize/polynomial expansion is computed ONCE instead
    of twice — the visualizer's workload shape
    (`visualize_optical_flow.py:62`: prev = curr chains every sampled
    frame into the next pair).

    sp_kernels: optional parallel.halo.HaloKernels — the spatially-sharded
    stencil entries (shard_map + ppermute halo exchange).  When set, every
    stage (gauss / polyexp / displaced-fetch update / blur+solve) runs as
    a halo-exchanged per-shard kernel (Pallas per shard on TPU) and only
    the fused single-chip iterate variant is disabled; the update's
    out-of-halo fetches go through a bounded global correction
    (parallel/halo.py, VERDICT r3 #6).

    Returns (flow, tiers): tiers is the (2,) int32 sum of the update
    kernel's exactness-tier flags over all levels/iterations ([tier-2
    bounded-correction fires, tier-3 full-recompute fires]; zeros on the
    XLA paths, which have no tiers).  Callers thread it out of their
    jitted program and hand it to update_gather.note_tier_stats.
    """
    cfg = plan.config
    if chain:
        assert nxt_f is None
        B = prev_f.shape[0] - 1
    else:
        B = prev_f.shape[0]
    flow = None
    tiers_total = jnp.zeros((2,), jnp.int32)
    # MULTI-LEVEL gauss_resize (round 5): ONE kernel pass reads each
    # full-res band window once and emits every downsampled level,
    # replacing the per-level pad copy + window sweep (the three
    # gauss_resize stages were ~24 ms of the 95.5 ms 1080p batch,
    # ROOFLINE_r04_storeemit.json).  Bitwise-identical per level to
    # gaussian_blur_resize_pallas.  Applies only when the FULL level set
    # fits the VMEM gate (1080p/4K: +4-5% whole-pipeline, bitwise-equal,
    # GAUSSMULTI_AB_r05.json); partial fusion was measured a ~2% LOSS at
    # 8K (L2+L3 fused, L1 separate: 8.97 -> 8.77 pairs/s on v5e), so
    # wider-than-gate frames keep the per-level kernels outright.
    multi_imgs = {}
    h_full, w_full = prev_f.shape[-2:]
    if use_pallas and sp_kernels is None and _on_tpu():
        from optical_flow_tpu.pallas import gauss_resize as _gr
        down = [lv for lv in plan.levels if lv.k > 0]
        if _gr.MULTI and len(down) >= 2:
            specs = tuple(
                (2 ** lv.k, tuple(float(t) for t in gaussian_kernel(
                    lv.smooth_ksize, lv.smooth_sigma)))
                for lv in down)       # coarse -> fine (strides descending)
            if _gr.multi_supported(h_full, w_full, specs,
                                   bf16=bool(input_u8)):
                both0 = (prev_f if chain
                         else jnp.concatenate([prev_f, nxt_f], axis=0))
                outs = _gr.gaussian_blur_resize_multi(
                    both0, specs, exact_u8=input_u8)
                multi_imgs = {s: o for (s, _), o in zip(specs, outs)}
    for lv in plan.levels:
        if sp_kernels is not None:
            poly_fn = sp_kernels.poly_exp
        else:
            poly_fn = (_pick_poly_exp_fn(lv.height, lv.width)
                       if use_pallas else core.poly_exp)
        kern = gaussian_kernel(lv.smooth_ksize, lv.smooth_sigma)
        h_full, w_full = prev_f.shape[-2:]
        if sp_kernels is not None:
            gauss_fn = sp_kernels.gauss
        else:
            gauss_fn = (_pick_gauss_fn(h_full, w_full)
                        if use_pallas else core.gaussian_blur_reflect101)
        # unique frames as one batch for the shared smoothing/polyexp
        both = prev_f if chain else jnp.concatenate([prev_f, nxt_f], axis=0)
        gauss_resize_fn = (_pick_gauss_resize_fn(
            h_full, w_full, lv.height, lv.width, 2 ** lv.k,
            ksize=len(kern), bf16=bool(input_u8))
            if use_pallas and sp_kernels is None else None)
        # the polyexp-fused iterate consumes level IMAGES (it derives R
        # in-kernel, pallas/fused_iterate.update_flow_fused_poly); the
        # other paths materialize Rb below
        poly_fused_fn = (_pick_poly_fused_update_flow(lv.height, lv.width,
                                                      cfg)
                         if use_pallas and sp_kernels is None else None)
        imgs, pre_t, exact = None, None, False
        if 2 ** lv.k in multi_imgs:
            imgs = multi_imgs.pop(2 ** lv.k)
        elif gauss_resize_fn is not None:
            # smooth + downsample in one kernel (s-fold compute saving);
            # u8 frames stage the full-res input reads in bf16 (exact)
            imgs = gauss_resize_fn(both, kern, 2 ** lv.k,
                                   exact_u8=input_u8)
        elif (lv.height, lv.width) == (h_full, w_full):
            # k == 0: resize is the identity
            if (use_pallas and len(kern) == 3
                    and poly_fn is not core.poly_exp):
                # level-0 fast path: the 3-tap pre-smooth runs inside the
                # polyexp kernel's VMEM pass (the separate full-res blur
                # measured ~10 ms net at 1080p B=32); input_u8 additionally
                # stages the window DMAs in bf16 (exact for u8 frames)
                imgs = both
                pre_t = tuple(float(t) for t in kern)
                exact = bool(input_u8)
            else:
                imgs = gauss_fn(both, kern)
        else:
            sm = gauss_fn(both, kern)
            imgs = resize_bilinear_f32(sm, lv.width, lv.height)
        fused_fn = (_pick_fused_update_flow(lv.height, lv.width, cfg.winsize)
                    if use_pallas and sp_kernels is None else None)
        store_geom = None
        if (poly_fused_fn is None and fused_fn is not None
                and poly_fn is not core.poly_exp):
            from optical_flow_tpu.pallas.polyexp import store_emit_supported
            if store_emit_supported(lv.height, lv.width, cfg.poly_n):
                from optical_flow_tpu.pallas.fused_iterate import (
                    fused_store_geometry)
                store_geom = fused_store_geometry(lv.height, lv.width,
                                                  cfg.winsize, chain=chain)
        if poly_fused_fn is None:
            if store_geom is not None:
                # STORE_EMIT: polyexp writes R directly in the iterate's
                # store layout, deleting the fused driver's per-level
                # 5-channel jnp.pad(R) relayout copies.  Chained: ONE
                # (N, 5, Hs, Ws) array is both iterate operands (pair i
                # = frames (i, i+1) via r1_frame_off), so the
                # overlapping Rb[:-1]/Rb[1:] slices vanish too.
                # Non-chain: one kernel per frame half — slicing the
                # level batch is a 1-channel copy that fuses into the
                # ip pad builders
                from optical_flow_tpu.pallas import polyexp as _pe
                from optical_flow_tpu.pallas.fused_iterate import (
                    bf16_store_ok)
                kw = (dict(pre_taps=pre_t, exact_u8=exact)
                      if pre_t is not None else {})
                # R_BF16: store R in bf16 where the fully-fused step
                # consumes it (it widens back to f32 on load) — halves
                # the pipeline's dominant HBM traffic for ~0.002 px EPE
                # (see polyexp.R_BF16)
                kw["out_bf16"] = (_pe.R_BF16 and bf16_store_ok(
                    lv.height, lv.width, cfg.winsize))
                Hs, Ws = store_geom
                if chain:
                    Rbp = _pe.poly_exp_pallas_store(
                        imgs, Hs, Ws, cfg.poly_n, cfg.poly_sigma, **kw)
                    R0 = R1 = Rbp
                else:
                    R0 = _pe.poly_exp_pallas_store(
                        imgs[:B], Hs, Ws, cfg.poly_n, cfg.poly_sigma,
                        **kw)
                    R1 = _pe.poly_exp_pallas_store(
                        imgs[B:], Hs, Ws, cfg.poly_n, cfg.poly_sigma,
                        **kw)
            elif pre_t is not None:
                Rb = poly_fn(imgs, cfg.poly_n, cfg.poly_sigma,
                             pre_taps=pre_t, exact_u8=exact)
            else:
                Rb = poly_fn(imgs, cfg.poly_n, cfg.poly_sigma)
            if store_geom is None:
                # chain slices are free: the iterate loop pads (copies)
                # its R operands anyway, and pad-of-slice fuses into the
                # same copy
                R0, R1 = (Rb[:-1], Rb[1:]) if chain else (Rb[:B], Rb[B:])

        if flow is None:
            if initial_flow is not None:
                scale = jnp.float32(cfg.pyr_scale ** lv.k)
                flow = resize_area_f32(initial_flow, lv.width,
                                       lv.height) * scale
            else:
                flow = jnp.zeros((B, 2, lv.height, lv.width), jnp.float32)
        else:
            flow = resize_bilinear_f32(flow, lv.width, lv.height)
            flow = flow * jnp.float32(1.0 / cfg.pyr_scale)

        if poly_fused_fn is not None:
            img0, img1 = ((imgs[:-1], imgs[1:]) if chain
                          else (imgs[:B], imgs[B:]))
            flow, tiers = poly_fused_fn(
                img0, img1, flow, cfg.winsize, cfg.iterations,
                gaussian=cfg.gaussian_window, poly_n=cfg.poly_n,
                poly_sigma=cfg.poly_sigma, pre_taps=pre_t, exact_u8=exact)
            tiers_total = tiers_total + tiers
            continue
        if fused_fn is not None:
            flow, tiers = fused_fn(R0, R1, flow, cfg.winsize, cfg.iterations,
                                   gaussian=cfg.gaussian_window,
                                   store_layout=store_geom is not None,
                                   r1_frame_off=int(
                                       chain and store_geom is not None))
            tiers_total = tiers_total + tiers
            continue
        if sp_kernels is not None:
            # halo-sharded update (replicate-halo fetch + seam correction,
            # parallel/halo.py): per-shard Pallas on TPU, XLA elsewhere
            update_fn_stats = sp_kernels.update_matrices_stats
        else:
            update_fn_stats = (_pick_update_fn_stats(lv.height, lv.width)
                               if use_pallas else None)
        if sp_kernels is not None:
            blur_solve_fn = (lambda M: sp_kernels.blur_solve(
                M, cfg.winsize, cfg.gaussian_window))
        else:
            blur_solve_fn = (_pick_blur_solve_fn(lv.height, lv.width,
                                                 cfg.winsize,
                                                 cfg.gaussian_window)
                             if use_pallas else None)
        if update_fn_stats is not None:
            flow, tiers = core.update_flow(
                R0, R1, flow, cfg.winsize, cfg.iterations,
                gaussian=cfg.gaussian_window,
                update_fn_stats=update_fn_stats,
                blur_solve_fn=blur_solve_fn)
            tiers_total = tiers_total + tiers
        else:
            flow = core.update_flow(R0, R1, flow, cfg.winsize,
                                    cfg.iterations,
                                    gaussian=cfg.gaussian_window,
                                    blur_solve_fn=blur_solve_fn)
    return flow, tiers_total


def _note_tiers(tiers) -> None:
    """Stash a finished call's device tier vector for the observability
    drain (update_gather.consume_tier_stats)."""
    from optical_flow_tpu.pallas.update_gather import note_tier_stats
    note_tier_stats(tiers)


@functools.lru_cache(maxsize=64)
def _jitted_batched(h: int, w: int, config: FarnebackConfig):
    plan = build_plan(h, w, config)
    use_pallas = _on_tpu()

    def fn(prev, nxt):
        flow, tiers = _flow_pyramid(prev.astype(jnp.float32),
                                    nxt.astype(jnp.float32), plan,
                                    use_pallas,
                                    input_u8=prev.dtype == jnp.uint8)
        return jnp.moveaxis(flow, 1, -1), tiers  # (B, H, W, 2), cv2 layout

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _jitted_batched_bgr(h: int, w: int, config: FarnebackConfig):
    """Pyramid + colorization in ONE program: (B, H, W) gray pairs ->
    planar BGR uint8 (B, 3, H, W), never materializing the flow field in
    an interleaved layout.  On TPU the colorization runs as the fused
    Pallas kernel (pallas/colorize.py); elsewhere the XLA path."""
    plan = build_plan(h, w, config)
    use_pallas = _on_tpu()

    def fn(prev, nxt):
        flow, tiers = _flow_pyramid(prev.astype(jnp.float32),
                                    nxt.astype(jnp.float32), plan,
                                    use_pallas,
                                    input_u8=prev.dtype == jnp.uint8)
        if use_pallas and min(h, w) >= 32:
            from optical_flow_tpu.pallas.colorize import (
                flow_to_bgr_planar_pallas)
            return flow_to_bgr_planar_pallas(flow), tiers
        from optical_flow_tpu.ops.colorize import flow_to_bgr_u8
        return jnp.moveaxis(flow_to_bgr_u8(jnp.moveaxis(flow, 1, -1)),
                            -1, 1), tiers

    return jax.jit(fn)


def calc_flow_bgr_batched(prev, nxt,
                          config: FarnebackConfig = FarnebackConfig()):
    """Dense flow + reference-exact colorization for a batch of pairs.

    prev, nxt: (B, H, W) uint8/float grayscale.  Returns planar BGR uint8
    (B, 3, H, W) — byte-identical to `flow_to_bgr_u8(calc_flow_batched(...))`
    modulo the channel layout.  The visualizer hot path
    (`visualize_optical_flow.py:38-55`) as one device program.
    """
    if prev.shape != nxt.shape:
        raise ValueError(f"frame shapes differ: {prev.shape} vs {nxt.shape}")
    if prev.ndim != 3:
        raise ValueError(f"expected (B, H, W), got {prev.shape}")
    _, h, w = prev.shape
    bgr, tiers = _jitted_batched_bgr(h, w, config)(prev, nxt)
    _note_tiers(tiers)
    return bgr


@functools.lru_cache(maxsize=64)
def _jitted_chain(h: int, w: int, config: FarnebackConfig):
    plan = build_plan(h, w, config)
    use_pallas = _on_tpu()

    def fn(frames):
        flow, tiers = _flow_pyramid(frames.astype(jnp.float32), None, plan,
                                    use_pallas, chain=True,
                                    input_u8=frames.dtype == jnp.uint8)
        return jnp.moveaxis(flow, 1, -1), tiers  # (N-1, H, W, 2)

    return jax.jit(fn)


def calc_flow_chain_batched(frames,
                            config: FarnebackConfig = FarnebackConfig()):
    """Dense flow for the N-1 consecutive pairs of an (N, H, W) frame
    batch: returns (N-1, H, W, 2) == calc_flow_batched(frames[:-1],
    frames[1:]) with each interior frame's smooth/resize/polyexp computed
    once instead of twice (the visualizer's chained workload,
    `visualize_optical_flow.py:62`)."""
    if frames.ndim != 3:
        raise ValueError(f"expected (N, H, W), got {frames.shape}")
    if frames.shape[0] < 2:
        raise ValueError("chain needs at least 2 frames")
    _, h, w = frames.shape
    flow, tiers = _jitted_chain(h, w, config)(frames)
    _note_tiers(tiers)
    return flow


@functools.lru_cache(maxsize=64)
def _jitted_chain_bgr(h: int, w: int, config: FarnebackConfig):
    plan = build_plan(h, w, config)
    use_pallas = _on_tpu()

    def fn(frames):
        flow, tiers = _flow_pyramid(frames.astype(jnp.float32), None, plan,
                                    use_pallas, chain=True,
                                    input_u8=frames.dtype == jnp.uint8)
        if use_pallas and min(h, w) >= 32:
            from optical_flow_tpu.pallas.colorize import (
                flow_to_bgr_planar_pallas)
            return flow_to_bgr_planar_pallas(flow), tiers
        from optical_flow_tpu.ops.colorize import flow_to_bgr_u8
        return jnp.moveaxis(flow_to_bgr_u8(jnp.moveaxis(flow, 1, -1)),
                            -1, 1), tiers

    return jax.jit(fn)


def calc_flow_bgr_chain_batched(frames,
                                config: FarnebackConfig = FarnebackConfig()):
    """Chained-pair flow + reference-exact colorization: (N, H, W) gray
    frames -> planar BGR uint8 (N-1, 3, H, W) for the pairs (i, i+1)."""
    if frames.ndim != 3:
        raise ValueError(f"expected (N, H, W), got {frames.shape}")
    if frames.shape[0] < 2:
        raise ValueError("chain needs at least 2 frames")
    _, h, w = frames.shape
    bgr, tiers = _jitted_chain_bgr(h, w, config)(frames)
    _note_tiers(tiers)
    return bgr


@functools.lru_cache(maxsize=64)
def _jitted_batched_seeded(h: int, w: int, config: FarnebackConfig):
    plan = build_plan(h, w, config)
    use_pallas = _on_tpu()

    def fn(prev, nxt, flow0):
        flow, tiers = _flow_pyramid(prev.astype(jnp.float32),
                                    nxt.astype(jnp.float32), plan,
                                    use_pallas,
                                    initial_flow=jnp.moveaxis(flow0, -1, 1),
                                    input_u8=prev.dtype == jnp.uint8)
        return jnp.moveaxis(flow, 1, -1), tiers

    return jax.jit(fn)


def calc_flow(prev, nxt, config: FarnebackConfig = FarnebackConfig(),
              initial_flow=None):
    """Dense Farnebäck flow for one frame pair.

    prev, nxt: (H, W) uint8/float grayscale.  Returns (H, W, 2) float32.
    initial_flow: optional (H, W, 2) seed, used when config.flags has
    OPTFLOW_USE_INITIAL_FLOW (cv2's flow-in/flow-out contract).
    """
    if prev.shape != nxt.shape:
        raise ValueError(f"frame shapes differ: {prev.shape} vs {nxt.shape}")
    if prev.ndim != 2:
        raise ValueError(f"expected (H, W) grayscale, got {prev.shape}")
    h, w = prev.shape
    if config.use_initial_flow:
        if initial_flow is None:
            raise ValueError(
                "flags include OPTFLOW_USE_INITIAL_FLOW but no initial_flow "
                "was provided")
        flow, tiers = _jitted_batched_seeded(h, w, config)(
            prev[None], nxt[None], initial_flow[None])
        _note_tiers(tiers)
        return flow[0]
    flow, tiers = _jitted_batched(h, w, config)(prev[None], nxt[None])
    _note_tiers(tiers)
    return flow[0]


def calc_flow_batched(prev, nxt, config: FarnebackConfig = FarnebackConfig(),
                      initial_flow=None):
    """Dense Farnebäck flow for a batch of frame pairs.

    prev, nxt: (B, H, W).  Returns (B, H, W, 2) float32.  The whole batch is
    one XLA program, the unit of work for TPU batching.
    """
    if prev.shape != nxt.shape:
        raise ValueError(f"frame shapes differ: {prev.shape} vs {nxt.shape}")
    if prev.ndim != 3:
        raise ValueError(f"expected (B, H, W), got {prev.shape}")
    _, h, w = prev.shape
    if config.use_initial_flow:
        if initial_flow is None:
            raise ValueError(
                "flags include OPTFLOW_USE_INITIAL_FLOW but no initial_flow "
                "was provided")
        flow, tiers = _jitted_batched_seeded(h, w, config)(prev, nxt,
                                                           initial_flow)
        _note_tiers(tiers)
        return flow
    flow, tiers = _jitted_batched(h, w, config)(prev, nxt)
    _note_tiers(tiers)
    return flow
