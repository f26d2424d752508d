"""Device meshes and sharded flow steps.

The reference has no parallelism at all — its corpus loop is sequential
Python (`optical_flow.py:137`) and frames are processed one pair at a time
(SURVEY.md 2e).  This module is the new TPU-native surface:

  * data parallelism: the frame-pair batch axis is sharded across the
    'data' mesh axis (a shot's pairs spread over chips);
  * spatial parallelism: the image height axis can additionally be sharded
    across the 'spatial' mesh axis — the separable Farnebäck stencils run
    as halo-exchanged shard_map regions (ppermute over ICI, Pallas kernels
    per shard on TPU; parallel/halo.py), while the displaced-fetch update
    and the resizes stay GSPMD (the scaling-book recipe: pick a mesh,
    annotate, let XLA place the remaining collectives);
  * TP/PP/EP are N/A for this workload (no weights, no experts — documented
    in SURVEY.md 2e) — batch + spatial are the physically meaningful axes.

All functions work on any device set (real TPUs or
--xla_force_host_platform_device_count CPU devices for tests/dry runs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optical_flow_tpu.models.farneback.flow import _flow_pyramid
from optical_flow_tpu.models.farneback.params import build_plan
from optical_flow_tpu.ops.polar import cart_to_polar
from optical_flow_tpu.utils.config import FarnebackConfig


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_spatial
    if n_data * n_spatial != n_total:
        raise ValueError(
            f"mesh {n_data}x{n_spatial} != {n_total} devices")
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def shard_pairs(mesh: Mesh, batch):
    """Place a (B, H, W) batch with B over 'data' and H over 'spatial'."""
    sharding = NamedSharding(mesh, P("data", "spatial", None))
    return jax.device_put(batch, sharding)


@functools.lru_cache(maxsize=32)
def _sharded_flow_fn(mesh: Mesh, h: int, w: int, config: FarnebackConfig):
    plan = build_plan(h, w, config)
    in_s = NamedSharding(mesh, P("data", "spatial", None))
    out_s = NamedSharding(mesh, P("data", "spatial", None, None))
    n_spatial = mesh.shape["spatial"]

    if n_spatial == 1:
        # pure data parallelism: shard_map over 'data' so each chip runs
        # the full per-shard pyramid locally — including the Pallas
        # kernels on TPU backends (each shard is an independent batch)
        from optical_flow_tpu.models.farneback.flow import _on_tpu
        use_pallas = _on_tpu()

        def per_shard(prev, nxt):
            flow, tiers = _flow_pyramid(prev.astype(jnp.float32),
                                        nxt.astype(jnp.float32), plan,
                                        use_pallas=use_pallas,
                                        input_u8=prev.dtype == jnp.uint8)
            return jnp.moveaxis(flow, 1, -1), tiers[None]

        fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("data", None, None), P("data", None, None)),
            out_specs=(P("data", None, None, None), P("data", None)),
            check_vma=False)
        return jax.jit(fn)

    # spatial sharding: the separable stencil stages run as halo-exchanged
    # shard_map regions (ppermute over 'spatial'; Pallas kernels per shard
    # on TPU backends — parallel/halo.py); the displaced-fetch update and
    # the resizes stay GSPMD, where XLA places the collectives
    from optical_flow_tpu.models.farneback.flow import _on_tpu
    from optical_flow_tpu.parallel.halo import HaloKernels
    sp_kernels = HaloKernels(mesh, use_pallas=_on_tpu())

    def fn(prev, nxt):
        flow, tiers = _flow_pyramid(prev.astype(jnp.float32),
                                    nxt.astype(jnp.float32), plan,
                                    use_pallas=False, sp_kernels=sp_kernels)
        return jnp.moveaxis(flow, 1, -1), tiers[None]

    return jax.jit(fn, in_shardings=(in_s, in_s),
                   out_shardings=(out_s, None))


def _note_shard_tiers(tiers) -> None:
    """Stash per-shard (n, 2) tier vectors for the observability drain
    (summed host-side in consume_tier_stats; no extra device dispatch)."""
    from optical_flow_tpu.pallas.update_gather import note_tier_stats
    note_tier_stats(tiers)


def sharded_flow_step(mesh: Mesh, prev, nxt,
                      config: FarnebackConfig = FarnebackConfig()):
    """(B, H, W) uint8 pairs -> (B, H, W, 2) f32 flow, dp+sp sharded."""
    _, h, w = prev.shape
    flow, tiers = _sharded_flow_fn(mesh, h, w, config)(prev, nxt)
    _note_shard_tiers(tiers)
    return flow


@functools.lru_cache(maxsize=32)
def _sharded_bgr_fn(mesh: Mesh, h: int, w: int, config: FarnebackConfig):
    """The visualizer's device step, dp-sharded: flow pyramid + the
    reference-exact colorization per shard (Pallas kernels on TPU)."""
    plan = build_plan(h, w, config)
    from optical_flow_tpu.models.farneback.flow import _on_tpu
    use_pallas = _on_tpu()

    def per_shard(prev, nxt):
        flow, tiers = _flow_pyramid(prev.astype(jnp.float32),
                                    nxt.astype(jnp.float32), plan,
                                    use_pallas=use_pallas,
                                    input_u8=prev.dtype == jnp.uint8)
        if use_pallas and min(h, w) >= 32:
            from optical_flow_tpu.pallas.colorize import (
                flow_to_bgr_planar_pallas)
            return flow_to_bgr_planar_pallas(flow), tiers[None]
        from optical_flow_tpu.ops.colorize import flow_to_bgr_u8
        return jnp.moveaxis(flow_to_bgr_u8(jnp.moveaxis(flow, 1, -1)),
                            -1, 1), tiers[None]

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, None)),
        out_specs=(P("data", None, None, None), P("data", None)),
        check_vma=False)
    return jax.jit(fn)


def sharded_bgr_step(mesh: Mesh, prev, nxt,
                     config: FarnebackConfig = FarnebackConfig()):
    """(B, H, W) gray pairs -> planar BGR uint8 (B, 3, H, W), dp sharded
    (the per-frame min-max normalize is per-image, so dp is exact)."""
    _, h, w = prev.shape
    bgr, tiers = _sharded_bgr_fn(mesh, h, w, config)(prev, nxt)
    _note_shard_tiers(tiers)
    return bgr


def chain_shards(frames, n: int):
    """(N, H, W) consecutive frames -> (n, k+1, H, W) overlapping
    sub-chains for sharded_bgr_chain_step: shard i gets frames
    [i*k, (i+1)*k] inclusive, so its last frame is shard i+1's first
    (k = ceil((N-1)/n) pairs per shard; the tail is padded by repeating
    the last frame and those pair outputs are discarded by the caller).
    The one-frame-per-shard duplication is the whole cost of keeping the
    chained-pair optimization under dp sharding (docs/ARCHITECTURE.md)."""
    frames = jnp.asarray(frames)
    N = frames.shape[0]
    k = -(-(N - 1) // n)
    total = n * k + 1
    if total > N:
        pad = jnp.broadcast_to(frames[-1:],
                               (total - N,) + frames.shape[1:])
        frames = jnp.concatenate([frames, pad])
    idx = np.arange(n)[:, None] * k + np.arange(k + 1)[None, :]
    return frames[idx]


@functools.lru_cache(maxsize=32)
def _sharded_bgr_chain_fn(mesh: Mesh, k: int, h: int, w: int,
                          config: FarnebackConfig):
    """The visualizer's chained device step, dp-sharded: each shard runs
    the CHAIN pyramid on its (k+1)-frame sub-chain — every interior frame
    smoothed/polyexp'd once, not twice (the +12% structural win of
    calc_flow_chain_batched, kept under multi-chip dp; round-2 VERDICT
    item 3).  Reference workload: `visualize_optical_flow.py:62`."""
    plan = build_plan(h, w, config)
    from optical_flow_tpu.models.farneback.flow import _on_tpu
    use_pallas = _on_tpu()

    def per_shard(frames):             # (1, k+1, h, w) local shard
        flow, tiers = _flow_pyramid(frames[0].astype(jnp.float32), None,
                                    plan, use_pallas=use_pallas,
                                    chain=True,
                                    input_u8=frames.dtype == jnp.uint8)
        if use_pallas and min(h, w) >= 32:
            from optical_flow_tpu.pallas.colorize import (
                flow_to_bgr_planar_pallas)
            bgr = flow_to_bgr_planar_pallas(flow)
        else:
            from optical_flow_tpu.ops.colorize import flow_to_bgr_u8
            bgr = jnp.moveaxis(flow_to_bgr_u8(jnp.moveaxis(flow, 1, -1)),
                               -1, 1)
        return bgr[None], tiers[None]

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("data", None, None, None),),
        out_specs=(P("data", None, None, None, None), P("data", None)),
        check_vma=False)
    return jax.jit(fn)


def sharded_bgr_chain_step(mesh: Mesh, frames_nk,
                           config: FarnebackConfig = FarnebackConfig()):
    """(n_data, k+1, H, W) overlapping sub-chains (chain_shards) ->
    planar BGR uint8 (n_data*k, 3, H, W) for the n*k consecutive pairs of
    the underlying chain, in order.  Equal to
    calc_flow_bgr_chain_batched on the flat chain (per-pair compute is
    batch-independent and the colorize normalization is per-image)."""
    n, k1, h, w = frames_nk.shape
    bgr, tiers = _sharded_bgr_chain_fn(mesh, k1 - 1, h, w, config)(
        frames_nk)
    _note_shard_tiers(tiers)
    return bgr.reshape(n * (k1 - 1), 3, h, w)


@functools.lru_cache(maxsize=32)
def _sharded_extract_fn(mesh: Mesh, h: int, w: int, config: FarnebackConfig):
    plan = build_plan(h, w, config)
    in_s = NamedSharding(mesh, P("data", "spatial", None))
    out_s = NamedSharding(mesh, P("data"))
    n_spatial = mesh.shape["spatial"]

    if n_spatial == 1:
        # pure data parallelism: shard_map over 'data' so each chip runs
        # the full per-shard pyramid locally — INCLUDING the Pallas kernels
        # on TPU backends (round-1 review: this path used to silently fall
        # back to the XLA gather the kernels exist to avoid)
        from optical_flow_tpu.models.farneback.flow import _on_tpu
        use_pallas = _on_tpu()

        def per_shard(prev, nxt):
            flow, tiers = _flow_pyramid(prev.astype(jnp.float32),
                                        nxt.astype(jnp.float32), plan,
                                        use_pallas=use_pallas,
                                        input_u8=prev.dtype == jnp.uint8)
            mag, _ = cart_to_polar(flow[:, 0], flow[:, 1])
            return jnp.sum(mag, axis=(-2, -1)), tiers[None]

        fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("data", None, None), P("data", None, None)),
            out_specs=(P("data"), P("data", None)),
            check_vma=False)
        return jax.jit(fn)

    # spatial sharding (HBM relief at 8K-class frames): halo-exchanged
    # shard_map stencils with Pallas kernels per shard on TPU backends
    # (parallel/halo.py), including the displaced-fetch update itself
    # (replicate-halo + analytic seam mask + bounded correction,
    # parallel/halo.py:update_matrices_sharded); only the resizes stay
    # GSPMD — see docs/ARCHITECTURE.md "which path runs on hardware"
    from optical_flow_tpu.models.farneback.flow import _on_tpu
    from optical_flow_tpu.parallel.halo import HaloKernels
    sp_kernels = HaloKernels(mesh, use_pallas=_on_tpu())

    def fn(prev, nxt):
        flow, tiers = _flow_pyramid(prev.astype(jnp.float32),
                                    nxt.astype(jnp.float32), plan,
                                    use_pallas=False, sp_kernels=sp_kernels)
        mag, _ = cart_to_polar(flow[:, 0], flow[:, 1])
        return jnp.sum(mag, axis=(-2, -1)), tiers[None]

    return jax.jit(fn, in_shardings=(in_s, in_s),
                   out_shardings=(out_s, None))


def sharded_extract_step(mesh: Mesh, prev, nxt,
                         config: FarnebackConfig = FarnebackConfig()):
    """The extractor's device step: (B, H, W) pairs -> (B,) summed
    magnitudes (`np.sum(mag)` of `optical_flow.py:64`), dp+sp sharded."""
    _, h, w = prev.shape
    sums, tiers = _sharded_extract_fn(mesh, h, w, config)(prev, nxt)
    _note_shard_tiers(tiers)
    return sums
