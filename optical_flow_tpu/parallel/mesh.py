"""Device meshes and sharded flow steps.

The reference has no parallelism at all — its corpus loop is sequential
Python (`optical_flow.py:137`) and frames are processed one pair at a time
(SURVEY.md 2e).  This module is the new TPU-native surface:

  * data parallelism: the frame-pair batch axis is sharded across the
    'data' mesh axis (a shot's pairs spread over chips);
  * spatial parallelism: the image height axis can additionally be sharded
    across the 'spatial' mesh axis — XLA partitions the Farnebäck stencils
    and inserts halo exchanges/collectives over ICI automatically from the
    sharding annotations (the scaling-book recipe: pick a mesh, annotate,
    let XLA place collectives);
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
            flow = _flow_pyramid(prev.astype(jnp.float32),
                                 nxt.astype(jnp.float32), plan,
                                 use_pallas=use_pallas)
            return jnp.moveaxis(flow, 1, -1)

        fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("data", None, None), P("data", None, None)),
            out_specs=P("data", None, None, None),
            check_vma=False)
        return jax.jit(fn)

    def fn(prev, nxt):
        # spatial sharding: XLA SPMD partitions the whole pyramid (stencil
        # halos become collective-permutes over ICI); the Pallas kernels
        # are not spatially partitionable, so the XLA path is used
        flow = _flow_pyramid(prev.astype(jnp.float32),
                             nxt.astype(jnp.float32), plan, use_pallas=False)
        return jnp.moveaxis(flow, 1, -1)

    return jax.jit(fn, in_shardings=(in_s, in_s), out_shardings=out_s)


def sharded_flow_step(mesh: Mesh, prev, nxt,
                      config: FarnebackConfig = FarnebackConfig()):
    """(B, H, W) uint8 pairs -> (B, H, W, 2) f32 flow, dp+sp sharded."""
    _, h, w = prev.shape
    return _sharded_flow_fn(mesh, h, w, config)(prev, nxt)


@functools.lru_cache(maxsize=32)
def _sharded_bgr_fn(mesh: Mesh, h: int, w: int, config: FarnebackConfig):
    """The visualizer's device step, dp-sharded: flow pyramid + the
    reference-exact colorization per shard (Pallas kernels on TPU)."""
    plan = build_plan(h, w, config)
    from optical_flow_tpu.models.farneback.flow import _on_tpu
    use_pallas = _on_tpu()

    def per_shard(prev, nxt):
        flow = _flow_pyramid(prev.astype(jnp.float32),
                             nxt.astype(jnp.float32), plan,
                             use_pallas=use_pallas)
        if use_pallas and min(h, w) >= 32:
            from optical_flow_tpu.pallas.colorize import (
                flow_to_bgr_planar_pallas)
            return flow_to_bgr_planar_pallas(flow)
        from optical_flow_tpu.ops.colorize import flow_to_bgr_u8
        return jnp.moveaxis(flow_to_bgr_u8(jnp.moveaxis(flow, 1, -1)),
                            -1, 1)

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, None)),
        out_specs=P("data", None, None, None),
        check_vma=False)
    return jax.jit(fn)


def sharded_bgr_step(mesh: Mesh, prev, nxt,
                     config: FarnebackConfig = FarnebackConfig()):
    """(B, H, W) gray pairs -> planar BGR uint8 (B, 3, H, W), dp sharded
    (the per-frame min-max normalize is per-image, so dp is exact)."""
    _, h, w = prev.shape
    return _sharded_bgr_fn(mesh, h, w, config)(prev, nxt)


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
            flow = _flow_pyramid(prev.astype(jnp.float32),
                                 nxt.astype(jnp.float32), plan,
                                 use_pallas=use_pallas)
            mag, _ = cart_to_polar(flow[:, 0], flow[:, 1])
            return jnp.sum(mag, axis=(-2, -1))

        fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("data", None, None), P("data", None, None)),
            out_specs=P("data"),
            check_vma=False)
        return jax.jit(fn)

    def fn(prev, nxt):
        # spatial sharding (HBM relief at 4K+): XLA SPMD partitions the
        # pyramid; the Pallas kernels are not spatially partitionable, so
        # the XLA path is used — see docs/ARCHITECTURE.md "which path runs
        # on hardware"
        flow = _flow_pyramid(prev.astype(jnp.float32),
                             nxt.astype(jnp.float32), plan, use_pallas=False)
        mag, _ = cart_to_polar(flow[:, 0], flow[:, 1])
        return jnp.sum(mag, axis=(-2, -1))

    return jax.jit(fn, in_shardings=(in_s, in_s), out_shardings=out_s)


def sharded_extract_step(mesh: Mesh, prev, nxt,
                         config: FarnebackConfig = FarnebackConfig()):
    """The extractor's device step: (B, H, W) pairs -> (B,) summed
    magnitudes (`np.sum(mag)` of `optical_flow.py:64`), dp+sp sharded."""
    _, h, w = prev.shape
    return _sharded_extract_fn(mesh, h, w, config)(prev, nxt)
