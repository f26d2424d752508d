"""Halo-exchanged spatially-sharded stencil stages (shard_map + ppermute).

The spatial axis shards image HEIGHT across the mesh's 'spatial' axis for
HBM relief at frame sizes where a full pyramid per chip doesn't fit
(SURVEY.md 2e; the reference processes whole frames single-threaded,
`optical_flow.py:51-59`).  Each separable stencil stage runs inside a
`shard_map` manual region: shards exchange `r` boundary rows with their
mesh neighbors over ICI via `lax.ppermute`, synthesize the global image
border (REFLECT_101 or replicate, matching the stage's cv2 semantics) at
the outermost shards, run the stage's kernel on the halo-extended local
block, and keep the center rows.  On TPU backends the per-shard compute
is the stage's Pallas kernel (pallas/{gauss,polyexp,blur_solve}.py);
elsewhere it is the bit-equivalent XLA twin from models/farneback/core —
the exchange/edge machinery is identical either way, so the CPU-mesh
tests and the multichip dryrun exercise the same decomposition the TPU
pod runs.

Exactness: a kernel applied to the halo-extended block applies its own
border handling at the BLOCK edges, which only affects output rows within
`r` of the block edge — exactly the halo rows that are discarded.  Kept
rows see true neighbor data (interior shards) or the synthesized global
border (edge shards), so the sharded result equals the single-device
result up to float reassociation.

The displaced-fetch matrix update (core.update_matrices) is deliberately
NOT decomposed here: its gather displacement is unbounded (cv2 clamps to
the full image), so an exact sharded fetch needs global access — XLA's
SPMD partitioner handles it from the sharding annotations.  This is also
self-consistent with the single-chip design point: at the 8K-class widths
that motivate spatial sharding, the Pallas update kernel is already gated
off by MAX_WP (pallas/update_gather.py), so the XLA update path is what
runs with or without sp.  See docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from optical_flow_tpu.models.farneback import core


def _synth_border(x, r: int, mode: str, top: bool):
    """The r rows the global image border would contribute beyond this
    block's edge: REFLECT_101 (cv2 GaussianBlur) or replicate/'edge'
    (polyexp correlation, box running sums)."""
    if mode == "reflect101":
        # virtual row -k = row k  /  virtual row H-1+k = row H-1-k
        rows = x[..., 1:r + 1, :] if top else x[..., -r - 1:-1, :]
        return jnp.flip(rows, axis=-2)
    if mode == "edge":
        edge = x[..., :1, :] if top else x[..., -1:, :]
        return jnp.broadcast_to(edge, edge.shape[:-2] + (r,) + edge.shape[-1:])
    raise ValueError(f"unknown border mode {mode!r}")


def halo_extend(x, r: int, n_sp: int, mode: str,
                axis_name: str = "spatial"):
    """(..., h, W) local block -> (..., h + 2r, W) with r true neighbor
    rows on each side (ppermute over `axis_name`); the outermost shards
    get the synthesized global border instead.  Requires r <= h - 1
    (halos come from the IMMEDIATE neighbor only)."""
    if r == 0:
        return x
    h = x.shape[-2]
    if r > h - 1:
        raise ValueError(f"halo depth {r} needs local height > {r}, got {h}")
    if n_sp == 1:
        return jnp.concatenate([_synth_border(x, r, mode, top=True), x,
                                _synth_border(x, r, mode, top=False)],
                               axis=-2)
    # shard i's bottom r rows become shard i+1's top halo, and vice versa;
    # ppermute leaves un-targeted shards (the global edges) at zero, which
    # the where() below replaces with the synthesized border
    from_above = lax.ppermute(x[..., -r:, :], axis_name,
                              [(i, i + 1) for i in range(n_sp - 1)])
    from_below = lax.ppermute(x[..., :r, :], axis_name,
                              [(i + 1, i) for i in range(n_sp - 1)])
    idx = lax.axis_index(axis_name)
    top = jnp.where(idx == 0, _synth_border(x, r, mode, top=True),
                    from_above)
    bot = jnp.where(idx == n_sp - 1, _synth_border(x, r, mode, top=False),
                    from_below)
    return jnp.concatenate([top, x, bot], axis=-2)


class HaloKernels:
    """Per-stage spatially-sharded stencil entries for _flow_pyramid.

    Each method takes/returns GLOBAL arrays inside a jitted program over
    `mesh` and internally opens a shard_map manual region over
    ('data', 'spatial').  Shapes that don't decompose (height not
    divisible by n_spatial, or local height too small for the halo) fall
    back to the plain global op, which XLA's partitioner handles — the
    coarse pyramid levels typically take this path.
    """

    def __init__(self, mesh: Mesh, use_pallas: bool):
        self.mesh = mesh
        self.n_sp = int(mesh.shape["spatial"])
        self.n_dp = int(mesh.shape["data"])
        self.use_pallas = use_pallas

    def _plan(self, n: int, h: int, w: int, r: int):
        """(shardable, use_pallas_kernel) for a (n, h, w)-shaped stage
        with halo depth r."""
        if self.n_sp <= 1 or h % self.n_sp or n % self.n_dp:
            return False, False
        hl = h // self.n_sp
        if r > hl - 1:
            return False, False
        return True, (self.use_pallas and hl >= 32 and w >= 32)

    # -- pyramid smoothing: separable Gaussian, REFLECT_101 --------------
    def gauss(self, x, taps):
        r = (len(taps) - 1) // 2
        n, h, w = x.shape
        ok, use_p = self._plan(n, h, w, r)
        if not ok or r == 0:
            return core.gaussian_blur_reflect101(x, taps)

        def per_shard(xl):
            ext = halo_extend(xl, r, self.n_sp, "reflect101")
            if use_p:
                from optical_flow_tpu.pallas.gauss import gaussian_blur_pallas
                out = gaussian_blur_pallas(ext, taps)
            else:
                out = core.gaussian_blur_reflect101(ext, taps)
            return out[..., r:r + xl.shape[-2], :]

        return jax.shard_map(
            per_shard, mesh=self.mesh,
            in_specs=P("data", "spatial", None),
            out_specs=P("data", "spatial", None), check_vma=False)(x)

    # -- polynomial expansion: replicate-border correlation ---------------
    def poly_exp(self, img, poly_n: int, poly_sigma: float):
        n, h, w = img.shape
        ok, use_p = self._plan(n, h, w, poly_n)
        if not ok:
            return core.poly_exp(img, poly_n, poly_sigma)

        def per_shard(xl):
            ext = halo_extend(xl, poly_n, self.n_sp, "edge")
            if use_p:
                from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
                R = poly_exp_pallas(ext, poly_n, poly_sigma)
            else:
                R = core.poly_exp(ext, poly_n, poly_sigma)
            return R[..., poly_n:poly_n + xl.shape[-2], :]

        return jax.shard_map(
            per_shard, mesh=self.mesh,
            in_specs=P("data", "spatial", None),
            out_specs=P("data", None, "spatial", None), check_vma=False)(img)

    # -- fused window blur + 2x2 solve: replicate-border sums -------------
    def blur_solve(self, M, winsize: int, gaussian: bool):
        b, _, h, w = M.shape
        m = winsize // 2
        ok, use_p = self._plan(b, h, w, m)
        use_p = use_p and winsize >= 3
        if not ok or m == 0:
            return self._fallback_blur(M, winsize, gaussian)

        def per_shard(Ml):
            ext = halo_extend(Ml, m, self.n_sp, "edge")
            if use_p:
                from optical_flow_tpu.pallas.blur_solve import (
                    update_flow_blur_solve_pallas)
                flow = update_flow_blur_solve_pallas(ext, winsize,
                                                     gaussian=gaussian)
            else:
                flow = self._fallback_blur(ext, winsize, gaussian)
            return flow[..., m:m + Ml.shape[-2], :]

        return jax.shard_map(
            per_shard, mesh=self.mesh,
            in_specs=P("data", None, "spatial", None),
            out_specs=P("data", None, "spatial", None), check_vma=False)(M)

    @staticmethod
    def _fallback_blur(M, winsize: int, gaussian: bool):
        if gaussian:
            k = core.gaussian_window_kernel(winsize)
            return core.solve_flow(
                core._corr1d(core._corr1d(M, k, axis=-1), k, axis=-2), 1.0)
        return core.solve_flow(core.box_sum_replicate(M, winsize),
                               1.0 / (winsize * winsize))
