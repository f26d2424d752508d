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

The displaced-fetch matrix update IS decomposed (update_matrices_stats;
VERDICT r3 #6 — sp used to forfeit it to the GSPMD global gather), via
three observations that make the per-shard run of the UNMODIFIED update
(Pallas kernel on TPU, core.update_matrices elsewhere) globally exact:

  1. a WIN_H-row replicate-synthesized halo makes the local clamped
     fetch equal the GLOBAL clamped fetch for every displacement that
     lands within the halo (edge shards' replicate rows ARE the rows the
     global clamp would return);
  2. every M term is a product of two sc-scaled values, so the global
     row border ramp the local run cannot see (its own ramp lands
     entirely inside the discarded halo rows, since WIN_H > BORDER) is
     a pure post-multiply by roww^2 on the first/last BORDER rows;
  3. pixels where local and global semantics CAN disagree — the fetch
     leaves the halo, or the pre-clip coordinate is outside the global
     image but inside the replicate halo (fallback vs fetch) — are an
     analytically computable mask, fixed by the same bounded
     gather+scatter tier the single-chip kernel uses (VIOL_MAX), with a
     full global recompute above it.  Exactness is never sacrificed.
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


def _correct_seams(M, unsafe, gin, R0, R1, flow, sc):
    """Global-semantics fix for the sp update's seam-mismatch pixels —
    update_gather._correct_violations plus the inside/fallback branch
    (a seam pixel can be one whose GLOBAL semantics is the R0-only
    fallback while the replicate halo made the local run fetch)."""
    from optical_flow_tpu.pallas.update_gather import VIOL_MAX

    _, H, W = R0.shape
    flat = unsafe.reshape(-1)
    idx = jnp.nonzero(flat, size=VIOL_MAX, fill_value=0)[0]
    valid = flat[idx]
    py = (idx // W).astype(jnp.int32)
    px = (idx % W).astype(jnp.int32)
    dxv = flow[0].reshape(-1)[idx]
    dyv = flow[1].reshape(-1)[idx]
    x1 = jnp.round(px.astype(jnp.float32) + dxv)
    y1 = jnp.round(py.astype(jnp.float32) + dyv)
    xi = jnp.clip(x1, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(y1, 0, H - 1).astype(jnp.int32)
    src = yi * W + xi
    R1f = R1.reshape(5, -1)
    R0f = R0.reshape(5, -1)
    fetched = R1f[:, src]
    r0 = R0f[:, idx]
    insi = gin.reshape(-1)[idx]
    f0 = jnp.where(insi, fetched[0], 0.0)
    f1 = jnp.where(insi, fetched[1], 0.0)
    r4 = jnp.where(insi, (r0[2] + fetched[2]) * 0.5, r0[2])
    r5 = jnp.where(insi, (r0[3] + fetched[3]) * 0.5, r0[3])
    r6 = jnp.where(insi, (r0[4] + fetched[4]) * 0.25, r0[4] * 0.5)
    r2 = (r0[0] - f0) * 0.5 + (r4 * dyv + r6 * dxv)
    r3 = (r0[1] - f1) * 0.5 + (r6 * dyv + r5 * dxv)
    s = sc.reshape(-1)[idx]
    r2 = r2 * s
    r3 = r3 * s
    r4 = r4 * s
    r5 = r5 * s
    r6 = r6 * s
    mvals = jnp.stack([
        r4 * r4 + r6 * r6,
        (r4 + r5) * r6,
        r5 * r5 + r6 * r6,
        r4 * r2 + r6 * r3,
        r6 * r2 + r5 * r3,
    ])
    Mf = M.reshape(5, -1)
    mvals = jnp.where(valid[None, :], mvals, Mf[:, idx])
    return Mf.at[:, idx].set(mvals).reshape(5, H, W)


def tiers_flags_sum(tiers_sh, n_per):
    """Combine the per-shard inner tier vectors with the seam-correction
    tier flags into one (2,) int32 vector."""
    from optical_flow_tpu.pallas.update_gather import tier_flags
    return jnp.sum(tiers_sh.reshape(-1, 2), axis=0) + tier_flags(n_per)


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

    # -- displaced-fetch matrix update (see module docstring pt. 1-3) ----
    def update_matrices_stats(self, R0, R1, flow):
        """Halo-sharded FarnebackUpdateMatrices: (M, tiers), globally
        exact (matches core.update_matrices up to float reassociation).

        Always callable under sp: shapes that don't decompose fall back
        to the plain global op (GSPMD partitioning), tiers = zeros."""
        from optical_flow_tpu.pallas.update_gather import (
            VIOL_MAX, WIN_H, supported_shape, tier_flags,
            update_matrices_pallas_batched_stats)

        b, _, h, w = R0.shape
        r = WIN_H
        ok, _ = self._plan(b, h, w, r)
        if not ok:
            return (core.update_matrices(R0, R1, flow),
                    jnp.zeros((2,), jnp.int32))
        hl = h // self.n_sp
        ext_h = hl + 2 * r
        use_p = (self.use_pallas and min(ext_h, w) >= 64
                 and supported_shape(ext_h, w, chunked=True))

        def per_shard(R0l, R1l, fl):
            R0e = halo_extend(R0l, r, self.n_sp, "edge")
            R1e = halo_extend(R1l, r, self.n_sp, "edge")
            fle = halo_extend(fl, r, self.n_sp, "edge")
            if use_p:
                Ml, t = update_matrices_pallas_batched_stats(R0e, R1e, fle)
            else:
                Ml = core.update_matrices(R0e, R1e, fle)
                t = jnp.zeros((2,), jnp.int32)
            return Ml[..., r:r + hl, :], t[None]

        M, tiers_sh = jax.shard_map(
            per_shard, mesh=self.mesh,
            in_specs=(P("data", None, "spatial", None),) * 3,
            out_specs=(P("data", None, "spatial", None),
                       P(("data", "spatial"), None)),
            check_vma=False)(R0, R1, flow)

        # (2) global row border ramp (sc is separable; M quadratic in sc)
        roww = core._border_axis_weights_traced(h, h, 0)
        M = M * (roww * roww)[None, None, :, None]

        # (3) seam-mismatch pixels: global-inside XOR locally-fetchable
        dx = flow[:, 0]
        dy = flow[:, 1]
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        x1 = jnp.round(xs + dx)
        y1 = jnp.round(ys + dy)
        xin = (x1 >= 0) & (x1 <= w - 1)
        gin = xin & (y1 >= 0) & (y1 <= h - 1)
        shard_of_row = (jnp.arange(h, dtype=jnp.int32) // hl)[None, :, None]
        lin = (xin & (y1 >= (shard_of_row * hl - r))
               & (y1 <= (shard_of_row * hl + hl + r - 1)))
        unsafe = gin != lin
        n_per = jnp.sum(unsafe, axis=(-2, -1))
        sc = core.border_scale_field_traced(h, w)

        def corrected(m):
            return jax.vmap(_correct_seams)(
                m, unsafe, gin, R0, R1, flow,
                jnp.broadcast_to(sc, (b,) + sc.shape))

        def full_recompute(m):
            return core.update_matrices(R0, R1, flow)

        M = jax.lax.cond(
            jnp.max(n_per) > VIOL_MAX,
            full_recompute,
            lambda m: jax.lax.cond(jnp.sum(n_per) > 0, corrected,
                                   lambda x: x, m),
            M)
        return M, tiers_flags_sum(tiers_sh, n_per)

    @staticmethod
    def _fallback_blur(M, winsize: int, gaussian: bool):
        if gaussian:
            k = core.gaussian_window_kernel(winsize)
            return core.solve_flow(
                core._corr1d(core._corr1d(M, k, axis=-1), k, axis=-2), 1.0)
        return core.solve_flow(core.box_sum_replicate(M, winsize),
                               1.0 / (winsize * winsize))
