"""Differential tests of the Pallas TPU kernels against the XLA reference
implementations, run in Pallas interpret mode on CPU (the real-hardware
path is exercised by bench.py and the TPU deployment)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def interpret_mode():
    """Force pallas_call into interpreter mode for CPU execution."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pl.pallas_call = patched
    import optical_flow_tpu.pallas.update_gather as ug
    import optical_flow_tpu.pallas.blur_solve as bs
    import optical_flow_tpu.pallas.polyexp as pe
    import optical_flow_tpu.pallas.gauss as ga
    import optical_flow_tpu.pallas.colorize as cz
    import optical_flow_tpu.pallas.gauss_resize as gr
    for m in (ug, bs, pe, ga, cz, gr):
        m._build.cache_clear()
    bs._build_store.cache_clear()
    ug._build_chunked.cache_clear()
    ug._build_fused_blur.cache_clear()
    ug._build_fused_blur_chunked.cache_clear()
    gr._build_multi.cache_clear()
    yield
    pl.pallas_call = orig
    for m in (ug, bs, pe, ga, cz, gr):
        m._build.cache_clear()
    bs._build_store.cache_clear()
    ug._build_chunked.cache_clear()
    ug._build_fused_blur.cache_clear()
    ug._build_fused_blur_chunked.cache_clear()
    gr._build_multi.cache_clear()


class TestUpdateGatherKernel:
    def _check(self, H, W, flow_mod=None, B=2):
        from optical_flow_tpu.pallas.update_gather import (
            update_matrices_pallas_batched)
        from optical_flow_tpu.models.farneback import core
        rng = np.random.default_rng(0)
        R0 = jnp.asarray(rng.standard_normal((B, 5, H, W)).astype(np.float32))
        R1 = jnp.asarray(rng.standard_normal((B, 5, H, W)).astype(np.float32))
        flow = rng.standard_normal((B, 2, H, W)).astype(np.float32) * 2
        if flow_mod is not None:
            flow_mod(flow)
        flow = jnp.asarray(flow)
        out = np.asarray(update_matrices_pallas_batched(R0, R1, flow))
        ref = np.asarray(core.update_matrices(R0, R1, flow))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)

    @pytest.mark.slow
    def test_smooth_flow_aligned_shape(self):
        self._check(64, 512)

    @pytest.mark.slow
    def test_unaligned_shape_padding(self):
        self._check(60, 130)

    @pytest.mark.slow
    def test_out_of_image_displacement_fallback(self):
        def mod(flow):
            flow[:, 0, 10:14, 30:60] = 500.0   # leaves the image entirely
        self._check(64, 512, mod)

    @pytest.mark.slow
    def test_window_violation_correction(self):
        # slow: test_tier_counters_fire runs this exact spilled config in
        # the default suite (plus the counter contract)
        def mod(flow):
            flow[:, 1, 30:32, 100:160] = 45.0  # escapes the 32-row window
        self._check(64, 512, mod)

    @pytest.mark.slow
    def test_second_cluster_in_kernel_pass(self):
        # a bimodal band (hard motion boundary): second cluster handled by
        # the in-kernel second-chance window
        def mod(flow):
            flow[:, 1, :, 256:] = 40.0
            flow[:, 0, :, 256:] = -30.0
        self._check(96, 512, mod)

    @pytest.mark.slow
    def test_three_clusters_residual_correction(self):
        # three widely separated clusters in one band: residual after the
        # second pass must be fixed by the XLA correction
        def mod(flow):
            flow[:, 1, 4:, 128:256] = 40.0
            flow[:, 1, 4:, 384:] = 80.0
        self._check(96, 512, mod)

    def test_tier_counters_fire(self):
        # observability contract: spilled content ticks TIER_COUNTS via
        # the device-side counters (no host callbacks — works on every
        # transport, including ones that reject send/recv callbacks)
        from optical_flow_tpu.pallas import update_gather as ug
        ug.reset_tier_counts()

        def smooth(flow):
            flow[:] = 1.5                        # constant: nothing spills
        self._check(64, 512, smooth)
        counts = ug.consume_tier_stats()
        assert counts["tier2"] == 0 and counts["tier3"] == 0

        def spilled(flow):
            flow[:, 1, 30:32, 100:160] = 45.0    # escapes the window
        self._check(64, 512, spilled)
        counts = ug.consume_tier_stats()
        assert counts["tier2"] >= 1
        ug.reset_tier_counts()


class TestUpdateGatherChunked:
    """Column-chunked wide-frame variant (VERDICT r3 #3: frames past
    MAX_WP used to forfeit the displaced-fetch kernel entirely).  The
    chunk geometry is shrunk via monkeypatch so interpret mode exercises
    real multi-chunk grids (n_x >= 3) at CPU-feasible sizes; hardware
    truth at full 8K width comes from the selftest (utils/selftest.py)."""

    def _check_chunked(self, H, W, flow_mod=None, B=1, target=256,
                       rtol=1e-5):
        import optical_flow_tpu.pallas.update_gather as ug
        from optical_flow_tpu.models.farneback import core
        orig_maxwp, orig_tgt = ug.MAX_WP, ug.XCHUNK_TARGET
        ug.MAX_WP, ug.XCHUNK_TARGET = 256, target
        try:
            rng = np.random.default_rng(1)
            R0 = jnp.asarray(
                rng.standard_normal((B, 5, H, W)).astype(np.float32))
            R1 = jnp.asarray(
                rng.standard_normal((B, 5, H, W)).astype(np.float32))
            flow = rng.standard_normal((B, 2, H, W)).astype(np.float32) * 2
            if flow_mod is not None:
                flow_mod(flow)
            flow = jnp.asarray(flow)
            out, tiers = ug.update_matrices_pallas_batched_stats(
                R0, R1, flow)
            ref = np.asarray(core.update_matrices(R0, R1, flow))
            np.testing.assert_allclose(np.asarray(out), ref,
                                       atol=1e-4, rtol=rtol)
        finally:
            ug.MAX_WP, ug.XCHUNK_TARGET = orig_maxwp, orig_tgt
            ug._build_chunked.cache_clear()

    @pytest.mark.slow
    def test_smooth_flow_multichunk(self):
        # slow: test_unaligned_width covers the same multi-chunk grid
        # plus the pad path in the default suite
        self._check_chunked(40, 800)           # n_x=4, cw=256

    @pytest.mark.slow
    def test_unaligned_width(self):
        # slow: the chunked variant only engages past MAX_WP (5K+ widths),
        # off the default 1080p/4K path; selftest covers it on device
        self._check_chunked(40, 777)           # pad to chunk multiple

    @pytest.mark.slow
    def test_cross_chunk_displacement(self):
        # dx pushes sources across chunk boundaries (x-window slack path)
        self._check_chunked(40, 800,
                            flow_mod=lambda f: f.__setitem__(
                                (slice(None), 0), 140.0))

    @pytest.mark.slow
    def test_large_displacement_spills_to_correction(self):
        # far-out sources exceed the x-window: pass-2 + XLA correction
        def mod(f):
            f[:, 0, :, :400] = 600.0
            f[:, 1, :, 200:300] = 33.0
        self._check_chunked(48, 800, flow_mod=mod)

    @pytest.mark.slow
    def test_out_of_image_fallback(self):
        # rtol 1e-3: with |dy|=1e6 the r4*dy/r6*dx intermediates reach
        # ~1e6 and f32 association order costs ~4e-4 relative — verified
        # identical through the UNCHUNKED kernel on this same shape, i.e.
        # a pre-existing scale artifact of the fallback path, not a
        # chunking difference
        self._check_chunked(40, 800, rtol=1e-3,
                            flow_mod=lambda f: f.__setitem__(
                                (slice(None), 1), 1e6))


class TestBlurSolveKernel:
    def _psd_M(self, B, H, W, seed=0):
        """Realistic positive-semidefinite M (like real update output)."""
        rng = np.random.default_rng(seed)
        r4 = rng.standard_normal((B, H, W)).astype(np.float32)
        r5 = rng.standard_normal((B, H, W)).astype(np.float32)
        r6 = rng.standard_normal((B, H, W)).astype(np.float32)
        r2 = rng.standard_normal((B, H, W)).astype(np.float32)
        r3 = rng.standard_normal((B, H, W)).astype(np.float32)
        return jnp.asarray(np.stack([
            r4 * r4 + r6 * r6, (r4 + r5) * r6, r5 * r5 + r6 * r6,
            r4 * r2 + r6 * r3, r6 * r2 + r5 * r3], axis=1))

    @pytest.mark.parametrize("H,W,ws", [(24, 256, 15), (64, 130, 15),
                                        (40, 256, 7), (33, 257, 21)])
    def test_matches_xla_box(self, H, W, ws):
        from optical_flow_tpu.pallas.blur_solve import (
            update_flow_blur_solve_pallas)
        from optical_flow_tpu.models.farneback import core
        M = self._psd_M(2, H, W)
        out = np.asarray(update_flow_blur_solve_pallas(M, ws))
        ref = np.asarray(core.solve_flow(
            core.box_sum_replicate(M, ws), 1.0 / (ws * ws)))
        np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)

    def test_gaussian_window(self):
        from optical_flow_tpu.pallas.blur_solve import (
            update_flow_blur_solve_pallas)
        from optical_flow_tpu.models.farneback import core
        M = self._psd_M(1, 32, 256)
        ws = 15
        k = core.gaussian_window_kernel(ws)
        out = np.asarray(update_flow_blur_solve_pallas(M, ws, gaussian=True))
        ref = np.asarray(core.solve_flow(
            core._corr1d(core._corr1d(M, k, axis=-1), k, axis=-2), 1.0))
        np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
class TestFusedIterate:
    """The store-layout iterate loop must match core.update_flow exactly
    (same three-tier spill handling as the standalone update kernel)."""

    def _check(self, H, W, ws=15, iters=3, gaussian=False, flow_mod=None,
               B=2, atol=2e-3):
        from optical_flow_tpu.pallas.fused_iterate import (
            supported, update_flow_fused)
        from optical_flow_tpu.models.farneback import core
        assert supported(H, W, ws)
        rng = np.random.default_rng(7)
        # realistic R fields: polyexp of smooth images (keeps the 2x2
        # systems well-conditioned like real frames do)
        img = rng.uniform(0, 255, (2 * B, H, W)).astype(np.float32)
        R = core.poly_exp(jnp.asarray(img), 5, 1.2)
        R0, R1 = R[:B], R[B:]
        flow = rng.standard_normal((B, 2, H, W)).astype(np.float32) * 1.5
        if flow_mod is not None:
            flow_mod(flow)
        flow = jnp.asarray(flow)
        out_fl, tiers = update_flow_fused(R0, R1, flow, ws, iters,
                                          gaussian=gaussian)
        out = np.asarray(out_fl)
        assert np.asarray(tiers).shape == (2,)
        ref = np.asarray(core.update_flow(R0, R1, flow, ws, iters,
                                          gaussian=gaussian))
        np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-3)

    def test_aligned_shape(self):
        self._check(64, 512, iters=2)

    def test_unaligned_shape(self):
        self._check(70, 257, iters=2)

    def test_three_iterations(self):
        self._check(64, 256, iters=3)

    def test_gaussian_window(self):
        self._check(64, 256, iters=2, gaussian=True)

    def test_winsize_7(self):
        self._check(64, 256, ws=7, iters=2)

    def test_spill_paths(self):
        # window escapes trigger the in-kernel second pass / correction
        def mod(flow):
            flow[:, 1, 30:34, 100:200] = 45.0
        self._check(64, 512, iters=2, flow_mod=mod)

    def test_unsupported_winsize_gated(self):
        from optical_flow_tpu.pallas.fused_iterate import supported
        assert not supported(64, 256, 21)   # halo budget is 8


class TestFusedUpdateBlur:
    """fused_update_blur_store (software-pipelined M ring) performs the
    same adds in the same order as blur_solve_store(
    update_matrices_store(...)) on spill-free content — M just never
    round-trips HBM — and update_flow_fused must route spilled frames
    through the exact two-kernel path (identical flow + tiers).

    On real TPU hardware the two paths are BITWISE equal (enforced by
    utils/selftest.py's fused_blur cases, verified on v5e).  Interpret
    mode compiles each pallas body as a separate XLA:CPU computation,
    and LLVM's FMA contraction makes different mul+add fusing choices
    per compilation — the M channels built from r2/r3 chains land one
    ulp apart, which the near-singular 2x2 solve amplifies to ~1e-4
    relative on near-zero flow.  The CPU assertions therefore gate at
    tight tolerance instead of equality."""

    ATOL, RTOL = 1e-6, 5e-4

    def _close(self, out, ref):
        return np.all(np.abs(out - ref) <= self.ATOL
                      + self.RTOL * np.abs(ref))

    def _store_pair(self, H, W, B=2, winsize=15, gaussian=False, seed=0,
                    tile_h=16):
        import optical_flow_tpu.pallas.blur_solve as bs
        import optical_flow_tpu.pallas.update_gather as ug
        from optical_flow_tpu.models.farneback import core
        rng = np.random.default_rng(seed)
        R0 = rng.standard_normal((B, 5, H, W)).astype(np.float32)
        R1 = rng.standard_normal((B, 5, H, W)).astype(np.float32)
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        fl0 = np.stack([1.3 + xs / W + 0.5 * ys / H, -0.8 + ys / H])[None]
        flow = np.broadcast_to(fl0, (B, 2, H, W)).astype(np.float32)
        if tile_h == 32:
            # 32-band layout: last band pure halo (fused_iterate rule)
            Hs = ((H + 64 + 31) // 32) * 32
        else:
            Hs = ((H + 15) // 16) * 16 + 32
        Ws = ((W + 2 * ug.COL_OFF + 127) // 128) * 128
        pad = [(0, 0), (0, 0), (ug.ROW_OFF, Hs - ug.ROW_OFF - H),
               (ug.COL_OFF, Ws - ug.COL_OFF - W)]
        R0p = jnp.pad(jnp.asarray(R0), pad)
        R1p = jnp.pad(jnp.asarray(R1), pad)
        flp = jnp.pad(jnp.asarray(flow), pad)
        scp = core.border_scale_field_traced(H, W, Hs, Ws,
                                             ug.ROW_OFF, ug.COL_OFF)
        Mst, _t = ug.update_matrices_store(R0p, R1p, flp, scp, H, W)
        ref = np.asarray(bs.blur_solve_store(Mst, winsize, gaussian))
        out, nvp = ug.fused_update_blur_store(R0p, R1p, flp, H, W,
                                              winsize, gaussian,
                                              tile_h=tile_h)
        return np.asarray(out), ref, int(np.asarray(nvp).sum())

    def test_smooth_min(self):
        # small fast-suite smoke for the full-width fused step (the
        # larger cases and the on-device selftest are the full truth)
        out, ref, nv = self._store_pair(33, 130, B=1)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_smooth(self):
        out, ref, nv = self._store_pair(64, 200)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_tileh32_smooth_min(self):
        # 32-row bands (win_h = 48, loc0 = 16 emit discipline): image
        # row 0 mid-band, bottom patch split across bands at H=41.
        # slow: the 32-band layout only engages at 4K-class heights
        # (FUSED_TILE32_MIN_H), off the default 1080p path; interpret-mode
        # compile costs ~40 s that the fast suite shouldn't pay.
        out, ref, nv = self._store_pair(41, 130, B=1, tile_h=32)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_tileh32_unaligned(self):
        out, ref, nv = self._store_pair(57, 130, B=1, seed=1, tile_h=32)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_tileh32_gaussian(self):
        out, ref, nv = self._store_pair(48, 200, B=1, gaussian=True,
                                        seed=3, tile_h=32)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_tileh32_spill_fallback(self):
        """update_flow_fused on the 32-band layout: spilled frames must
        replay the exact two-kernel path (flow + tiers match the unfused
        loop)."""
        import optical_flow_tpu.pallas.fused_iterate as fi
        rng = np.random.default_rng(4)
        B, H, W = 1, 64, 200
        R0 = jnp.asarray(rng.standard_normal((B, 5, H, W))
                         .astype(np.float32))
        R1 = jnp.asarray(rng.standard_normal((B, 5, H, W))
                         .astype(np.float32))
        fl = np.full((B, 2, H, W), 1.5, np.float32)
        fl[:, 1, 30:32, 100:160] = 45.0      # escapes the window
        outs = {}
        orig = (fi.FUSE_UPDATE_BLUR, fi.FUSED_TILE32_MIN_H)
        try:
            fi.FUSED_TILE32_MIN_H = 40       # let H=64 take the 32 path
            for fuse in (False, True):
                fi.FUSE_UPDATE_BLUR = fuse
                out, tiers = fi.update_flow_fused(
                    R0, R1, jnp.asarray(fl), 15, 2)
                outs[fuse] = (np.asarray(out), np.asarray(tiers))
        finally:
            fi.FUSE_UPDATE_BLUR, fi.FUSED_TILE32_MIN_H = orig
        assert outs[True][1][0] == 1          # tier 2 fired
        assert np.all(np.abs(outs[True][0] - outs[False][0])
                      <= self.ATOL + self.RTOL * np.abs(outs[False][0]))
        assert np.array_equal(outs[True][1], outs[False][1])

    @pytest.mark.slow
    def test_unaligned_split_bottom_patch(self):
        # h=57: last image store row rb=72, rb%16=8 -> the 8-row bottom
        # replicate halo spans two bands (7 rows this band, 1 the next)
        out, ref, nv = self._store_pair(57, 130, seed=1)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_gaussian_window(self):
        out, ref, nv = self._store_pair(64, 200, gaussian=True, seed=2)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_spill_fallback_matches_twokernel_loop(self):
        import optical_flow_tpu.pallas.fused_iterate as fi
        from optical_flow_tpu.models.farneback import core
        rng = np.random.default_rng(4)
        B, H, W = 1, 64, 200
        R0 = jnp.asarray(rng.standard_normal((B, 5, H, W))
                         .astype(np.float32))
        R1 = jnp.asarray(rng.standard_normal((B, 5, H, W))
                         .astype(np.float32))
        fl = np.full((B, 2, H, W), 1.5, np.float32)
        fl[:, 1, 30:32, 100:160] = 45.0      # escapes the window
        outs = {}
        orig = fi.FUSE_UPDATE_BLUR
        try:
            for fuse in (False, True):
                fi.FUSE_UPDATE_BLUR = fuse
                out, tiers = fi.update_flow_fused(
                    R0, R1, jnp.asarray(fl), 15, 2)
                outs[fuse] = (np.asarray(out), np.asarray(tiers))
        finally:
            fi.FUSE_UPDATE_BLUR = orig
        assert outs[True][1][0] == 1          # tier 2 fired
        # flow: tolerance on CPU (iteration 1 is spill-free, so its
        # fused result feeds iteration 2 with the interpret-mode ulp
        # skew); tiers are integer and must match exactly
        assert np.all(np.abs(outs[True][0] - outs[False][0])
                      <= self.ATOL + self.RTOL * np.abs(outs[False][0]))
        assert np.array_equal(outs[True][1], outs[False][1])


class TestFusedUpdateBlurPoly:
    """update_flow_fused_poly (polyexp fused into the update kernel; R
    never in HBM) must match poly_exp_pallas + update_flow_fused — the
    in-kernel moment_band shares the per-pixel op order, so hardware is
    bitwise equal (asserted by benchmarks/exp_fused_polyexp.py on v5e);
    interpret mode gates at the usual one-ulp-per-compilation tolerance.
    The path is OFF in production (FUSE_POLYEXP=False: measured -32%
    smooth / -35% boundary, see docs/KERNELS.md) — these tests keep the
    flagged code exact so the A/B harness stays reproducible."""

    ATOL, RTOL = 1e-6, 5e-4

    def _pair(self, H, W, B=1, winsize=15, iterations=2, seed=0,
              spill=False):
        import optical_flow_tpu.pallas.fused_iterate as fi
        from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
        rng = np.random.default_rng(seed)
        imgs0 = jnp.asarray(
            (rng.random((B, H, W)) * 255).astype(np.float32))
        imgs1 = jnp.asarray(
            (rng.random((B, H, W)) * 255).astype(np.float32))
        if spill:
            # two spill patches > WIN_H apart (same construction as the
            # chunked spill test): the single re-anchored pass-2 window
            # cannot cover both, forcing the tier-2 replay branch — the
            # poly kernel's taller raw windows absorb a single 45-row
            # patch that spills the materialized-R kernel
            fl = np.full((B, 2, H, W), 1.5, np.float32)
            fl[:, 1, 4:6, 100:160] = 36.0    # target row ~40
            fl[:, 1, 4:6, 160:190] = 100.0   # target row ~104
        else:
            fl = np.zeros((B, 2, H, W), np.float32)
            fl[:, 0] = 1.3
            fl[:, 1] = -0.8
        flow = jnp.asarray(fl)
        out_p, tiers_p = fi.update_flow_fused_poly(
            imgs0, imgs1, flow, winsize, iterations,
            poly_n=5, poly_sigma=1.2)
        R0 = poly_exp_pallas(imgs0, 5, 1.2)
        R1 = poly_exp_pallas(imgs1, 5, 1.2)
        orig = fi.FUSE_UPDATE_BLUR
        try:
            fi.FUSE_UPDATE_BLUR = True
            out_m, tiers_m = fi.update_flow_fused(
                R0, R1, flow, winsize, iterations)
        finally:
            fi.FUSE_UPDATE_BLUR = orig
        return (np.asarray(out_p), np.asarray(tiers_p),
                np.asarray(out_m), np.asarray(tiers_m))

    def _close(self, out, ref):
        return np.all(np.abs(out - ref) <= self.ATOL
                      + self.RTOL * np.abs(ref))

    @pytest.mark.slow
    def test_smooth_min(self):
        # slow (81s interpret-mode compile) and the path is OFF in
        # production (FUSE_POLYEXP=False); full-scale truth is the
        # on-device A/B (which asserts bitwise equality of whole-pipeline
        # flow)
        out_p, tiers_p, out_m, tiers_m = self._pair(33, 130)
        assert tiers_p.sum() == 0 and tiers_m.sum() == 0
        assert self._close(out_p, out_m)

    @pytest.mark.slow
    def test_unaligned(self):
        out_p, tiers_p, out_m, tiers_m = self._pair(57, 150, seed=1,
                                                    iterations=3)
        assert self._close(out_p, out_m)
        assert np.array_equal(tiers_p, tiers_m)

    @pytest.mark.slow
    def test_spill_replays_materialized_path(self):
        out_p, tiers_p, out_m, tiers_m = self._pair(128, 200, seed=2,
                                                    spill=True)
        assert tiers_p[0] >= 1               # tier 2 fired (scan-summed)
        assert np.array_equal(tiers_p, tiers_m)
        assert self._close(out_p, out_m)


class TestFusedUpdateBlurChunked:
    """fused_update_blur_store_chunked: the column-chunked fused step
    (wide frames > MAX_WP) must perform the same adds in the same order
    as blur_solve_store(update_matrices_store(...)) — the unchunked
    reference runs fine at these test sizes on the SAME (chunk-padded)
    store layout, since the extra dead right padding has sc == 0.  Chunk
    geometry is shrunk via monkeypatch so interpret mode exercises real
    multi-chunk grids (n_x >= 3); hardware truth at full 8K width comes
    from the selftest.  Same CPU tolerance story as TestFusedUpdateBlur
    (separate interpret compilations land one ulp apart)."""

    ATOL, RTOL = 1e-6, 5e-4

    def _close(self, out, ref):
        return np.all(np.abs(out - ref) <= self.ATOL
                      + self.RTOL * np.abs(ref))

    def _store_pair_chunked(self, H, W, B=1, winsize=15, gaussian=False,
                            seed=0, target=256):
        import optical_flow_tpu.pallas.blur_solve as bs
        import optical_flow_tpu.pallas.update_gather as ug
        from optical_flow_tpu.models.farneback import core
        orig = (ug.FUSED_BLUR_WS_LIMIT, ug.XCHUNK_TARGET)
        ug.FUSED_BLUR_WS_LIMIT, ug.XCHUNK_TARGET = 256, target
        try:
            rng = np.random.default_rng(seed)
            R0 = rng.standard_normal((B, 5, H, W)).astype(np.float32)
            R1 = rng.standard_normal((B, 5, H, W)).astype(np.float32)
            ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
            fl0 = np.stack([1.3 + xs / W + 0.5 * ys / H,
                            -0.8 + ys / H])[None]
            flow = np.broadcast_to(fl0, (B, 2, H, W)).astype(np.float32)
            Hs = ((H + 15) // 16) * 16 + 32
            Ws0 = ((W + 2 * ug.COL_OFF + 127) // 128) * 128
            n_x, cw, _xw = ug._chunk_geometry(Ws0)
            assert n_x >= 3, "test must exercise a real multi-chunk grid"
            Ws = n_x * cw
            pad = [(0, 0), (0, 0), (ug.ROW_OFF, Hs - ug.ROW_OFF - H),
                   (ug.COL_OFF, Ws - ug.COL_OFF - W)]
            R0p = jnp.pad(jnp.asarray(R0), pad)
            R1p = jnp.pad(jnp.asarray(R1), pad)
            flp = jnp.pad(jnp.asarray(flow), pad)
            scp = core.border_scale_field_traced(H, W, Hs, Ws,
                                                 ug.ROW_OFF, ug.COL_OFF)
            Mst, _t = ug.update_matrices_store(R0p, R1p, flp, scp, H, W)
            ref = np.asarray(bs.blur_solve_store(Mst, winsize, gaussian))
            out, nvp = ug.fused_update_blur_store_chunked(
                R0p, R1p, flp, H, W, winsize, gaussian)
            return np.asarray(out), ref, int(np.asarray(nvp).sum())
        finally:
            ug.FUSED_BLUR_WS_LIMIT, ug.XCHUNK_TARGET = orig
            ug._build_fused_blur_chunked.cache_clear()

    @pytest.mark.slow
    def test_smooth_multichunk_min(self):
        # smallest real multi-chunk geometry (Ws0 = 384 -> n_x=3 chunks
        # of 128 lanes, Hs = 64 -> 4 bands): ~25 s in interpret mode; the
        # larger geometries below and the on-device selftest are the full
        # truth.  slow: chunking engages only past MAX_WP (5K+ widths),
        # off the default path the fast suite guards.
        out, ref, nv = self._store_pair_chunked(17, 340, target=128)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_smooth_multichunk(self):
        # Ws0 = 768 -> n_x=3 chunks of 256 lanes
        out, ref, nv = self._store_pair_chunked(48, 700)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_unaligned_split_bottom_patch(self):
        # h=57: the 8-row bottom replicate halo spans two bands (n1=7,
        # n2=1 -> the cross-band ring patch); W=530 pads Ws0 640 -> 768
        # (dead right padding past the chunk multiple)
        out, ref, nv = self._store_pair_chunked(57, 530, seed=1)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_gaussian_window(self):
        out, ref, nv = self._store_pair_chunked(48, 700, gaussian=True,
                                                seed=2)
        assert nv == 0
        assert self._close(out, ref)

    @pytest.mark.slow
    def test_spill_fallback_matches_twokernel_loop(self):
        """update_flow_fused's chunked branch: spilled frames replay the
        exact wide-frame two-kernel path; tiers must match the unfused
        loop exactly."""
        import optical_flow_tpu.pallas.fused_iterate as fi
        import optical_flow_tpu.pallas.update_gather as ug
        rng = np.random.default_rng(4)
        B, H, W = 1, 128, 700
        R0 = jnp.asarray(rng.standard_normal((B, 5, H, W))
                         .astype(np.float32))
        R1 = jnp.asarray(rng.standard_normal((B, 5, H, W))
                         .astype(np.float32))
        fl = np.full((B, 2, H, W), 1.5, np.float32)
        # two spill patches in one band, both above the pass-1 window and
        # > WIN_H store rows apart, so the single re-anchored pass-2
        # window (anchored at the min spilled row) cannot cover both —
        # the in-kernel tiers are defeated and the lax.cond fallback MUST
        # replay the frame
        fl[:, 1, 4:6, 100:160] = 36.0        # target row ~40
        fl[:, 1, 4:6, 300:360] = 100.0       # target row ~104
        outs = {}
        orig_fuse = fi.FUSE_UPDATE_BLUR
        orig = (ug.FUSED_BLUR_WS_LIMIT, ug.XCHUNK_TARGET)
        ug.FUSED_BLUR_WS_LIMIT, ug.XCHUNK_TARGET = 256, 256
        try:
            for fuse in (False, True):
                fi.FUSE_UPDATE_BLUR = fuse
                out, tiers = fi.update_flow_fused(
                    R0, R1, jnp.asarray(fl), 15, 2)
                outs[fuse] = (np.asarray(out), np.asarray(tiers))
        finally:
            fi.FUSE_UPDATE_BLUR = orig_fuse
            ug.FUSED_BLUR_WS_LIMIT, ug.XCHUNK_TARGET = orig
            ug._build_fused_blur_chunked.cache_clear()
            ug._build_chunked.cache_clear()
        assert outs[True][1][0] >= 1          # tier 2 fired (scan-summed)
        assert np.all(np.abs(outs[True][0] - outs[False][0])
                      <= self.ATOL + self.RTOL * np.abs(outs[False][0]))


class TestGaussKernel:
    @pytest.mark.parametrize("ksize,sigma", [(3, 0.0), (9, 1.5), (19, 3.5)])
    def test_matches_xla_reflect_blur(self, ksize, sigma):
        from optical_flow_tpu.pallas.gauss import gaussian_blur_pallas
        from optical_flow_tpu.models.farneback import core
        from optical_flow_tpu.models.farneback.params import gaussian_kernel
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (2, 50, 200)).astype(np.float32))
        taps = gaussian_kernel(ksize, sigma)
        out = np.asarray(gaussian_blur_pallas(img, taps))
        ref = np.asarray(core.gaussian_blur_reflect101(img, taps))
        np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)


class TestPolyExpKernel:
    @pytest.mark.parametrize("H,W", [
        (32, 256),
        (40, 130),        # unaligned
        (32, 1200),       # crosses the 1024 horizontal chunk boundary
    ])
    def test_matches_core(self, H, W):
        from optical_flow_tpu.models.farneback import core
        from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.float32))
        out = np.asarray(poly_exp_pallas(img, 5, 1.2))
        ref = np.asarray(core.poly_exp(img, 5, 1.2))
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-5)


class TestPolyExpPairStep:
    """PAIR_STEP=n processes n batch images per grid step (one strided
    window DMA, 1/n grid steps — the latency-amortization lever for the
    issue-latency-bound polyexp).  The sub-bands run the identical
    moment_band body sequentially, so every variant must be BITWISE
    equal to PAIR_STEP=1, and batches not divisible by n must fall back
    to the single-image grid."""

    @pytest.mark.parametrize("n_imgs", [2, 4])
    def test_bitwise_equal_all_paths(self, n_imgs):
        from optical_flow_tpu.models.farneback.params import gaussian_kernel
        import optical_flow_tpu.pallas.polyexp as pe
        rng = np.random.default_rng(11)
        H, W = 48, 160
        img = jnp.asarray(rng.uniform(0, 255, (4, H, W)).astype(np.float32))
        img_u8 = jnp.asarray(
            rng.integers(0, 256, (4, H, W)).astype(np.float32))
        taps = tuple(gaussian_kernel(3, 0.0))
        Hs, Ws = ((H + 15) // 16) * 16 + 32, ((W + 16 + 127) // 128) * 128

        def run():
            pe._build.cache_clear()
            return (
                np.asarray(pe.poly_exp_pallas(img, 5, 1.2)),
                np.asarray(pe.poly_exp_pallas(img_u8, 5, 1.2,
                                              pre_taps=taps,
                                              exact_u8=True)),
                np.asarray(pe.poly_exp_pallas_store(img, Hs, Ws, 5, 1.2)),
                np.asarray(pe.poly_exp_pallas_store(
                    img_u8, Hs, Ws, 5, 1.2, pre_taps=taps, exact_u8=True)),
                # batch 3 not divisible by n: single-image fallback
                np.asarray(pe.poly_exp_pallas(img[:3], 5, 1.2)),
            )

        orig = pe.PAIR_STEP
        try:
            pe.PAIR_STEP = 1
            base = run()
            pe.PAIR_STEP = n_imgs
            got = run()
        finally:
            pe.PAIR_STEP = orig
            pe._build.cache_clear()
        for b, g in zip(base, got):
            np.testing.assert_array_equal(b, g)


class TestPolyExpPreSmooth:
    @pytest.mark.parametrize("H,W", [
        (32, 256),
        (40, 130),        # unaligned width
        (33, 257),        # partial last band: bottom-border rewrite path
        (17, 140),        # two bands, image ends mid-second-band
    ])
    def test_fused_pre_smooth_matches_blur_then_polyexp(self, H, W):
        """pre_taps fuses the pyramid's level-0 3-tap smooth into the
        polyexp kernel; must equal blur(REFLECT_101) -> polyexp(edge)
        including the replicate-of-smoothed borders."""
        from optical_flow_tpu.models.farneback import core
        from optical_flow_tpu.models.farneback.params import gaussian_kernel
        from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.float32))
        taps = gaussian_kernel(3, 0.0)
        out = np.asarray(poly_exp_pallas(img, 5, 1.2,
                                         pre_taps=tuple(taps)))
        ref = np.asarray(core.poly_exp(
            core.gaussian_blur_reflect101(img, taps), 5, 1.2))
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-5)

    @pytest.mark.parametrize("H,W", [(32, 256), (33, 257)])
    def test_exact_u8_bf16_staging_is_bitwise_equal(self, H, W):
        """exact_u8=True stages the pre-smooth window DMAs in bf16; for
        u8-valued input (exactly representable in bf16) the output must be
        BITWISE identical to the f32 staging."""
        from optical_flow_tpu.models.farneback.params import gaussian_kernel
        from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
        rng = np.random.default_rng(6)
        img = jnp.asarray(
            rng.integers(0, 256, (2, H, W)).astype(np.float32))
        taps = tuple(gaussian_kernel(3, 0.0))
        a = np.asarray(poly_exp_pallas(img, 5, 1.2, pre_taps=taps))
        b = np.asarray(poly_exp_pallas(img, 5, 1.2, pre_taps=taps,
                                       exact_u8=True))
        np.testing.assert_array_equal(a, b)

    @pytest.mark.slow
    def test_exact_u8_full_pyramid_is_bitwise_equal(self):
        """input_u8 threads bf16 staging through the L0 pre-smooth AND the
        gauss_resize levels; on u8 frames the flow must be bitwise equal
        to the f32 staging."""
        from optical_flow_tpu.models.farneback.flow import _flow_pyramid
        from optical_flow_tpu.models.farneback.params import build_plan
        from optical_flow_tpu.utils.config import FarnebackConfig
        rng = np.random.default_rng(7)
        prev = jnp.asarray(
            rng.integers(0, 256, (2, 128, 256)).astype(np.float32))
        nxt = jnp.asarray(
            rng.integers(0, 256, (2, 128, 256)).astype(np.float32))
        plan = build_plan(128, 256, FarnebackConfig())
        a, _ = _flow_pyramid(prev, nxt, plan, use_pallas=True,
                             input_u8=False)
        b, _ = _flow_pyramid(prev, nxt, plan, use_pallas=True,
                             input_u8=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPolyExpStoreEmit:
    """poly_exp_pallas_store emits R directly in the fused iterate's
    (B, 5, Hs, Ws) store layout (image origin at (ROW_OFF, COL_OFF)):
    the real region must be BITWISE identical to poly_exp_pallas, every
    halo cell finite, lane halos zero — and the store-layout iterate
    must reproduce the padded-R iterate exactly."""

    @staticmethod
    def _geom(H, W):
        return ((H + 15) // 16) * 16 + 32, ((W + 16 + 127) // 128) * 128

    @pytest.mark.parametrize("H,W", [
        (48, 200),        # Hs = 80: 16-row store bands
        (64, 112),        # Hs = 96: 32-row store bands (Hs % 32 == 0)
    ])
    def test_real_region_bitwise_halos_finite(self, H, W):
        from optical_flow_tpu.pallas.polyexp import (poly_exp_pallas,
                                                     poly_exp_pallas_store)
        rng = np.random.default_rng(8)
        img = jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.float32))
        Hs, Ws = self._geom(H, W)
        ref = np.asarray(poly_exp_pallas(img, 5, 1.2))
        out = np.asarray(poly_exp_pallas_store(img, Hs, Ws, 5, 1.2))
        assert out.shape == (2, 5, Hs, Ws)
        np.testing.assert_array_equal(out[:, :, 16:16 + H, 8:8 + W], ref)
        assert np.isfinite(out).all()
        assert (out[:, :, :, :8] == 0).all()
        assert (out[:, :, :, Ws - 8:] == 0).all()

    def test_pre_smooth_store_bitwise(self):
        """Level-0 fused 3-tap pre-smooth through the store layout, f32
        and bf16 (exact_u8) stagings."""
        from optical_flow_tpu.models.farneback.params import gaussian_kernel
        from optical_flow_tpu.pallas.polyexp import (poly_exp_pallas,
                                                     poly_exp_pallas_store)
        rng = np.random.default_rng(9)
        H, W = 33, 140    # partial last band: border rewrite path
        img = jnp.asarray(rng.integers(0, 256, (2, H, W)).astype(np.float32))
        Hs, Ws = self._geom(H, W)
        taps = tuple(gaussian_kernel(3, 0.0))
        ref = np.asarray(poly_exp_pallas(img, 5, 1.2, pre_taps=taps))
        for exact in (False, True):
            out = np.asarray(poly_exp_pallas_store(
                img, Hs, Ws, 5, 1.2, pre_taps=taps, exact_u8=exact))
            np.testing.assert_array_equal(out[:, :, 16:16 + H, 8:8 + W], ref)
            assert np.isfinite(out).all()

    def test_store_layout_iterate_matches_padded(self):
        """update_flow_fused(store_layout=True) on store-emitted R must
        equal the padded-R path bitwise (same kernels, same operand
        values in the real region; halos only ever multiply sc == 0)."""
        from optical_flow_tpu.pallas.fused_iterate import (
            fused_store_geometry, update_flow_fused)
        from optical_flow_tpu.pallas.polyexp import (poly_exp_pallas,
                                                     poly_exp_pallas_store)
        rng = np.random.default_rng(10)
        H, W = 48, 112
        geom = fused_store_geometry(H, W, 15)
        assert geom == self._geom(H, W)
        img0 = jnp.asarray(rng.uniform(0, 255, (1, H, W)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, (1, H, W)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((1, 2, H, W)) * 0.5).astype(np.float32))
        R0 = poly_exp_pallas(img0, 5, 1.2)
        R1 = poly_exp_pallas(img1, 5, 1.2)
        fl_a, t_a = update_flow_fused(R0, R1, flow, 15, 2)
        R0s = poly_exp_pallas_store(img0, *geom, 5, 1.2)
        R1s = poly_exp_pallas_store(img1, *geom, 5, 1.2)
        fl_b, t_b = update_flow_fused(R0s, R1s, flow, 15, 2,
                                      store_layout=True)
        np.testing.assert_array_equal(np.asarray(fl_a), np.asarray(fl_b))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))

    @pytest.mark.slow
    def test_store_layout_spill_replay_matches(self):
        """Spilled frames replay the two-kernel path on the SAME store
        arrays (non-zero finite row halos): flow and tiers must match the
        padded-R loop exactly."""
        from optical_flow_tpu.pallas.fused_iterate import (
            fused_store_geometry, update_flow_fused)
        from optical_flow_tpu.pallas.polyexp import (poly_exp_pallas,
                                                     poly_exp_pallas_store)
        rng = np.random.default_rng(11)
        H, W = 64, 200
        geom = fused_store_geometry(H, W, 15)
        img0 = jnp.asarray(rng.uniform(0, 255, (1, H, W)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, (1, H, W)).astype(np.float32))
        fl = np.full((1, 2, H, W), 1.5, np.float32)
        fl[:, 1, 30:32, 100:160] = 45.0      # escapes the window
        flow = jnp.asarray(fl)
        R0 = poly_exp_pallas(img0, 5, 1.2)
        R1 = poly_exp_pallas(img1, 5, 1.2)
        fl_a, t_a = update_flow_fused(R0, R1, flow, 15, 2)
        R0s = poly_exp_pallas_store(img0, *geom, 5, 1.2)
        R1s = poly_exp_pallas_store(img1, *geom, 5, 1.2)
        fl_b, t_b = update_flow_fused(R0s, R1s, flow, 15, 2,
                                      store_layout=True)
        assert np.asarray(t_a).sum() > 0     # spill exercised
        np.testing.assert_array_equal(np.asarray(fl_a), np.asarray(fl_b))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))

    def test_chain_single_array_frame_offset_matches(self):
        """Chained mode: ONE (N, 5, Hs, Ws) store array as both iterate
        operands with r1_frame_off=1 must equal the sliced padded-R
        path bitwise (pair i = frames (i, i+1))."""
        from optical_flow_tpu.pallas.fused_iterate import (
            fused_store_geometry, update_flow_fused)
        from optical_flow_tpu.pallas.polyexp import (poly_exp_pallas,
                                                     poly_exp_pallas_store)
        rng = np.random.default_rng(13)
        H, W, N = 48, 112, 3
        geom = fused_store_geometry(H, W, 15, chain=True)
        assert geom == self._geom(H, W)
        frames = jnp.asarray(
            rng.uniform(0, 255, (N, H, W)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((N - 1, 2, H, W)) * 0.5)
            .astype(np.float32))
        Rb = poly_exp_pallas(frames, 5, 1.2)
        fl_a, t_a = update_flow_fused(Rb[:-1], Rb[1:], flow, 15, 2)
        Rbp = poly_exp_pallas_store(frames, *geom, 5, 1.2)
        fl_b, t_b = update_flow_fused(Rbp, Rbp, flow, 15, 2,
                                      store_layout=True, r1_frame_off=1)
        np.testing.assert_array_equal(np.asarray(fl_a), np.asarray(fl_b))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))

    @pytest.mark.slow
    def test_chain_spill_replay_matches(self):
        """Chained single-array mode with spills: the two-kernel replay
        slices the shared array under lax.cond; flow and tiers must
        match the sliced padded-R loop exactly."""
        from optical_flow_tpu.pallas.fused_iterate import (
            fused_store_geometry, update_flow_fused)
        from optical_flow_tpu.pallas.polyexp import (poly_exp_pallas,
                                                     poly_exp_pallas_store)
        rng = np.random.default_rng(14)
        H, W, N = 64, 200, 3
        geom = fused_store_geometry(H, W, 15, chain=True)
        frames = jnp.asarray(
            rng.uniform(0, 255, (N, H, W)).astype(np.float32))
        fl = np.full((N - 1, 2, H, W), 1.5, np.float32)
        fl[:, 1, 30:32, 100:160] = 45.0      # escapes the window
        flow = jnp.asarray(fl)
        Rb = poly_exp_pallas(frames, 5, 1.2)
        fl_a, t_a = update_flow_fused(Rb[:-1], Rb[1:], flow, 15, 2)
        Rbp = poly_exp_pallas_store(frames, *geom, 5, 1.2)
        fl_b, t_b = update_flow_fused(Rbp, Rbp, flow, 15, 2,
                                      store_layout=True, r1_frame_off=1)
        assert np.asarray(t_a).sum() > 0     # spill exercised
        np.testing.assert_array_equal(np.asarray(fl_a), np.asarray(fl_b))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))

    @pytest.mark.slow
    def test_production_wiring_bitwise(self):
        """_flow_pyramid with the TPU picks forced on CPU: STORE_EMIT on
        vs off must produce bitwise-identical flow through the full
        pyramid (the flow.py gate + split polyexp calls + store-layout
        iterate wiring)."""
        import optical_flow_tpu.models.farneback.flow as fl
        import optical_flow_tpu.pallas.polyexp as pe
        from optical_flow_tpu.models.farneback.params import build_plan
        from optical_flow_tpu.utils.config import FarnebackConfig
        rng = np.random.default_rng(12)
        H, W = 96, 160
        prev = jnp.asarray(rng.integers(0, 256, (2, H, W)).astype(np.uint8))
        nxt = jnp.asarray(rng.integers(0, 256, (2, H, W)).astype(np.uint8))
        plan = build_plan(H, W, FarnebackConfig())
        orig_on_tpu, orig_emit = fl._on_tpu, pe.STORE_EMIT
        outs = {}
        chain_outs = {}
        frames = jnp.concatenate([prev, nxt[:1]], axis=0)
        try:
            fl._on_tpu = lambda: True
            for emit in (False, True):
                pe.STORE_EMIT = emit
                flow, tiers = fl._flow_pyramid(
                    prev.astype(jnp.float32), nxt.astype(jnp.float32),
                    plan, use_pallas=True, input_u8=True)
                outs[emit] = np.asarray(flow)
                cflow, _ct = fl._flow_pyramid(
                    frames.astype(jnp.float32), None, plan,
                    use_pallas=True, chain=True, input_u8=True)
                chain_outs[emit] = np.asarray(cflow)
        finally:
            fl._on_tpu, pe.STORE_EMIT = orig_on_tpu, orig_emit
        np.testing.assert_array_equal(outs[True], outs[False])
        np.testing.assert_array_equal(chain_outs[True], chain_outs[False])

    @pytest.mark.slow
    def test_multi_gauss_wiring_bitwise(self):
        """_flow_pyramid with the TPU picks forced on CPU: the fused
        multi-level gauss_resize (gauss_resize.MULTI) on vs off must be
        bitwise-identical through the full pyramid, batched and chained
        (covers the flow.py hoisting/pop plumbing, not just the kernel —
        the device A/B asserts the same on real Mosaic,
        GAUSSMULTI_AB_r05.json)."""
        import optical_flow_tpu.models.farneback.flow as fl
        import optical_flow_tpu.pallas.gauss_resize as gr
        from optical_flow_tpu.models.farneback.params import build_plan
        from optical_flow_tpu.utils.config import FarnebackConfig
        rng = np.random.default_rng(13)
        H, W = 128, 256         # two downsampled levels, exact division
        prev = jnp.asarray(rng.integers(0, 256, (2, H, W)).astype(np.uint8))
        nxt = jnp.asarray(rng.integers(0, 256, (2, H, W)).astype(np.uint8))
        plan = build_plan(H, W, FarnebackConfig())
        assert plan.levels[0].k >= 2    # multi actually engages
        orig_on_tpu, orig_multi = fl._on_tpu, gr.MULTI
        outs, chain_outs = {}, {}
        frames = jnp.concatenate([prev, nxt[:1]], axis=0)
        try:
            fl._on_tpu = lambda: True
            for multi in (False, True):
                gr.MULTI = multi
                flow, _t = fl._flow_pyramid(
                    prev.astype(jnp.float32), nxt.astype(jnp.float32),
                    plan, use_pallas=True, input_u8=True)
                outs[multi] = np.asarray(flow)
                cflow, _ct = fl._flow_pyramid(
                    frames.astype(jnp.float32), None, plan,
                    use_pallas=True, chain=True, input_u8=True)
                chain_outs[multi] = np.asarray(cflow)
        finally:
            fl._on_tpu, gr.MULTI = orig_on_tpu, orig_multi
        np.testing.assert_array_equal(outs[True], outs[False])
        np.testing.assert_array_equal(chain_outs[True], chain_outs[False])


class TestRBf16:
    """bf16 R storage (polyexp.R_BF16): the store-emitting polyexp casts
    R once to bf16 (round-to-nearest-even) and the fully-fused iterate
    widens it back to f32 immediately on load, so every output is
    BITWISE the f32 pipeline run on quantize_r_bf16(R) — quantization is
    the ONLY numerical change (measured ~0.002 px EPE vs cv2 at 1080p,
    gate 0.5)."""

    @staticmethod
    def _geom(H, W):
        return ((H + 15) // 16) * 16 + 32, ((W + 16 + 127) // 128) * 128

    def test_store_emit_bf16_is_quantized_store(self):
        from optical_flow_tpu.pallas.polyexp import (poly_exp_pallas,
                                                     poly_exp_pallas_store,
                                                     quantize_r_bf16)
        rng = np.random.default_rng(21)
        H, W = 48, 200
        img = jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.float32))
        Hs, Ws = self._geom(H, W)
        out = poly_exp_pallas_store(img, Hs, Ws, 5, 1.2, out_bf16=True)
        assert out.dtype == jnp.bfloat16
        ref = np.asarray(quantize_r_bf16(poly_exp_pallas(img, 5, 1.2)))
        outf = np.asarray(out.astype(jnp.float32))
        np.testing.assert_array_equal(outf[:, :, 16:16 + H, 8:8 + W], ref)
        assert np.isfinite(outf).all()
        assert (outf[:, :, :, :8] == 0).all()
        assert (outf[:, :, :, Ws - 8:] == 0).all()

    def test_fused_iterate_bf16_bitwise_vs_widened(self):
        """The fused step on bf16 operands must equal the same step on
        the pre-widened f32 copies bitwise (widen-on-load exactness)."""
        from optical_flow_tpu.pallas.fused_iterate import (
            fused_store_geometry, update_flow_fused)
        from optical_flow_tpu.pallas.polyexp import poly_exp_pallas_store
        rng = np.random.default_rng(22)
        H, W = 48, 112
        geom = fused_store_geometry(H, W, 15)
        assert geom == self._geom(H, W)
        img0 = jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((2, 2, H, W)) * 0.5).astype(np.float32))
        R0b = poly_exp_pallas_store(img0, *geom, 5, 1.2, out_bf16=True)
        R1b = poly_exp_pallas_store(img1, *geom, 5, 1.2, out_bf16=True)
        fl_a, t_a = update_flow_fused(R0b, R1b, flow, 15, 2,
                                      store_layout=True)
        fl_b, t_b = update_flow_fused(R0b.astype(jnp.float32),
                                      R1b.astype(jnp.float32), flow, 15, 2,
                                      store_layout=True)
        np.testing.assert_array_equal(np.asarray(fl_a), np.asarray(fl_b))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))

    @pytest.mark.slow
    def test_bf16_spill_replay_bitwise(self):
        """Spilled frames (pass-2 + the two-kernel lax.cond replay) under
        bf16 operands: the replay widens at XLA level; flow and tiers
        must still match the pre-widened run exactly."""
        from optical_flow_tpu.pallas.fused_iterate import (
            fused_store_geometry, update_flow_fused)
        from optical_flow_tpu.pallas.polyexp import poly_exp_pallas_store
        rng = np.random.default_rng(23)
        H, W = 64, 200
        geom = fused_store_geometry(H, W, 15)
        img0 = jnp.asarray(rng.uniform(0, 255, (1, H, W)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, (1, H, W)).astype(np.float32))
        fl = np.full((1, 2, H, W), 1.5, np.float32)
        fl[:, 1, 30:32, 100:160] = 45.0      # escapes the window
        flow = jnp.asarray(fl)
        R0b = poly_exp_pallas_store(img0, *geom, 5, 1.2, out_bf16=True)
        R1b = poly_exp_pallas_store(img1, *geom, 5, 1.2, out_bf16=True)
        fl_a, t_a = update_flow_fused(R0b, R1b, flow, 15, 2,
                                      store_layout=True)
        fl_b, t_b = update_flow_fused(R0b.astype(jnp.float32),
                                      R1b.astype(jnp.float32), flow, 15, 2,
                                      store_layout=True)
        assert np.asarray(t_a).sum() > 0     # spill exercised
        np.testing.assert_array_equal(np.asarray(fl_a), np.asarray(fl_b))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))

    def test_chain_bf16_single_array(self):
        """Chained single-array mode with bf16 stores: frame offset plus
        widen-on-load, against the pre-widened chained run."""
        from optical_flow_tpu.pallas.fused_iterate import (
            fused_store_geometry, update_flow_fused)
        from optical_flow_tpu.pallas.polyexp import poly_exp_pallas_store
        rng = np.random.default_rng(24)
        H, W, N = 48, 112, 3
        geom = fused_store_geometry(H, W, 15, chain=True)
        frames = jnp.asarray(
            rng.uniform(0, 255, (N, H, W)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((N - 1, 2, H, W)) * 0.5)
            .astype(np.float32))
        Rbp = poly_exp_pallas_store(frames, *geom, 5, 1.2, out_bf16=True)
        fl_a, t_a = update_flow_fused(Rbp, Rbp, flow, 15, 2,
                                      store_layout=True, r1_frame_off=1)
        Rw = Rbp.astype(jnp.float32)
        fl_b, t_b = update_flow_fused(Rw, Rw, flow, 15, 2,
                                      store_layout=True, r1_frame_off=1)
        np.testing.assert_array_equal(np.asarray(fl_a), np.asarray(fl_b))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))

    @pytest.mark.slow
    def test_production_wiring_r_bf16(self):
        """_flow_pyramid with R_BF16 on (TPU picks forced on CPU): runs
        end-to-end in both batch and chain shapes, and deviates from the
        f32 store path only by the R quantization (small, bounded)."""
        import optical_flow_tpu.models.farneback.flow as fl
        import optical_flow_tpu.pallas.polyexp as pe
        from optical_flow_tpu.models.farneback.flow import build_plan
        from optical_flow_tpu.utils.config import FarnebackConfig
        rng = np.random.default_rng(25)
        H, W = 48, 112
        prev = jnp.asarray(rng.integers(0, 256, (2, H, W)).astype(np.float32))
        nxt = jnp.asarray(rng.integers(0, 256, (2, H, W)).astype(np.float32))
        plan = build_plan(H, W, FarnebackConfig())
        frames = jnp.concatenate([prev, nxt[:1]], axis=0)
        orig_on_tpu, orig_bf16 = fl._on_tpu, pe.R_BF16
        outs, chain_outs = {}, {}
        try:
            fl._on_tpu = lambda: True
            for bf16 in (False, True):
                pe.R_BF16 = bf16
                flow, _t = fl._flow_pyramid(
                    prev.astype(jnp.float32), nxt.astype(jnp.float32),
                    plan, use_pallas=True, input_u8=True)
                outs[bf16] = np.asarray(flow)
                cflow, _ct = fl._flow_pyramid(
                    frames.astype(jnp.float32), None, plan,
                    use_pallas=True, chain=True, input_u8=True)
                chain_outs[bf16] = np.asarray(cflow)
        finally:
            fl._on_tpu, pe.R_BF16 = orig_on_tpu, orig_bf16
        for a, b in ((outs[True], outs[False]),
                     (chain_outs[True], chain_outs[False])):
            assert np.isfinite(a).all()
            assert np.abs(a - b).max() < 0.1   # quantization only


class TestGaussResizeKernel:
    @pytest.mark.parametrize("H,W,s,ks,sigma", [
        (64, 256, 2, 3, 0.5),       # level 1 params
        (128, 256, 4, 9, 1.5),      # level 2
        (256, 384, 8, 17, 3.5),     # level 3
        (48, 136, 2, 3, 0.5),       # non-128-multiple width
    ])
    def test_matches_gauss_then_resize(self, H, W, s, ks, sigma):
        from optical_flow_tpu.models.farneback.core import (
            gaussian_blur_reflect101)
        from optical_flow_tpu.models.farneback.params import gaussian_kernel
        from optical_flow_tpu.ops.resize import resize_bilinear_f32
        from optical_flow_tpu.pallas.gauss_resize import (
            gaussian_blur_resize_pallas, supported)
        assert supported(H, W, H // s, W // s, s)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.float32))
        taps = gaussian_kernel(ks, sigma)
        ref = resize_bilinear_f32(gaussian_blur_reflect101(img, taps),
                                  W // s, H // s)
        out = gaussian_blur_resize_pallas(img, taps, s)
        # f32 reassociation only (combined taps vs blur-then-lerp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-5)

    @pytest.mark.parametrize("H,W,exact_u8", [
        (128, 256, False),   # single band (H/8 = 16), f32 staging
        (192, 384, True),    # two bands with cropping, bf16 staging
    ])
    def test_multi_bitwise_vs_per_level(self, H, W, exact_u8):
        """The fused multi-level pass must be BITWISE identical to the
        per-level kernels (same combined taps, same accumulation order,
        shared P-wide reflect band holds identical values); one band
        geometry per staging dtype (the full f32 x bf16 cross runs on
        real Mosaic in the on-device selftest)."""
        from optical_flow_tpu.models.farneback.params import gaussian_kernel
        from optical_flow_tpu.pallas.gauss_resize import (
            gaussian_blur_resize_multi, gaussian_blur_resize_pallas,
            multi_supported)
        rng = np.random.default_rng(11)
        img = jnp.asarray(
            rng.integers(0, 256, (2, H, W)).astype(np.float32))
        specs = tuple((2 ** k, tuple(gaussian_kernel(ks, sg)))
                      for k, ks, sg in
                      [(3, 19, 3.5), (2, 9, 1.5), (1, 3, 0.5)])
        assert multi_supported(H, W, specs, bf16=exact_u8)
        outs = gaussian_blur_resize_multi(img, specs, exact_u8=exact_u8)
        for (s, g), o in zip(specs, outs):
            ref = gaussian_blur_resize_pallas(img, g, s,
                                              exact_u8=exact_u8)
            assert o.shape == (2, H // s, W // s)
            np.testing.assert_array_equal(np.asarray(o),
                                          np.asarray(ref))

    def test_multi_two_level_subset(self):
        """A coarse-level subset (the 8K fallback shape: L2+L3 fused,
        L1 dropped) is still bitwise per level."""
        from optical_flow_tpu.models.farneback.params import gaussian_kernel
        from optical_flow_tpu.pallas.gauss_resize import (
            gaussian_blur_resize_multi, gaussian_blur_resize_pallas,
            multi_supported)
        rng = np.random.default_rng(12)
        img = jnp.asarray(
            rng.integers(0, 256, (2, 128, 256)).astype(np.float32))
        specs = tuple((2 ** k, tuple(gaussian_kernel(ks, sg)))
                      for k, ks, sg in [(3, 19, 3.5), (2, 9, 1.5)])
        assert multi_supported(128, 256, specs, bf16=False)
        outs = gaussian_blur_resize_multi(img, specs)
        for (s, g), o in zip(specs, outs):
            np.testing.assert_array_equal(
                np.asarray(o),
                np.asarray(gaussian_blur_resize_pallas(img, g, s)))

    def test_multi_supported_gates(self):
        """Production shapes: all three levels fuse at 1080p/4K; the 8K
        full set overflows scoped VMEM and the L2+L3 subset passes;
        inexact division and single-level sets are rejected."""
        from optical_flow_tpu.models.farneback.params import gaussian_kernel
        from optical_flow_tpu.pallas.gauss_resize import multi_supported
        full = tuple((2 ** k, tuple(gaussian_kernel(ks, sg)))
                     for k, ks, sg in
                     [(3, 19, 3.5), (2, 9, 1.5), (1, 3, 0.5)])
        assert multi_supported(1080, 1920, full, bf16=True)
        assert multi_supported(1080, 1920, full, bf16=False)
        assert multi_supported(2160, 3840, full, bf16=True)
        assert not multi_supported(4320, 7680, full, bf16=True)
        assert multi_supported(4320, 7680, full[:-1], bf16=True)
        assert not multi_supported(135, 240, full, bf16=False)
        assert not multi_supported(1080, 1920, full[:1], bf16=False)

    def test_rejects_inexact_division(self):
        from optical_flow_tpu.pallas.gauss_resize import supported
        assert not supported(135, 240, 67, 120, 2)   # odd height
        assert not supported(64, 256, 64, 256, 1)    # s == 1

    def test_vmem_gate(self):
        """The (2, s, win_rows, Wp) window scratch is width-proportional.
        With the in-kernel compute width-chunked, every production level
        up to 8K width fits the 16 MB scoped-VMEM budget (verified
        compiling + running on v5e, round 4); beyond-8K s=8 levels must
        fall back to gauss + resize."""
        from optical_flow_tpu.pallas.gauss_resize import supported
        # every 8K/4K/1080p production level keeps the fused path
        assert supported(4320, 7680, 540, 960, 8, ksize=19, bf16=True)
        assert supported(4320, 7680, 540, 960, 8, ksize=19, bf16=False)
        assert supported(4320, 7680, 1080, 1920, 4, ksize=9, bf16=True)
        assert supported(4320, 7680, 2160, 3840, 2, ksize=3, bf16=True)
        assert supported(2160, 3840, 270, 480, 8, ksize=19, bf16=True)
        assert supported(1080, 1920, 135, 240, 8, ksize=19, bf16=False)
        # 12K-wide s=8 overflows the window scratch -> fallback
        assert not supported(6480, 11520, 810, 1440, 8, ksize=19,
                             bf16=False)


class TestColorizeKernel:
    def _check(self, flow_np):
        from optical_flow_tpu.pallas.colorize import flow_to_bgr_planar_pallas
        from optical_flow_tpu.ops.colorize import flow_to_bgr_u8
        flow_planar = jnp.asarray(flow_np)                    # (B, 2, H, W)
        out = np.asarray(flow_to_bgr_planar_pallas(flow_planar))
        ref = np.asarray(flow_to_bgr_u8(jnp.moveaxis(flow_planar, 1, -1)))
        ref = np.moveaxis(ref, -1, 1)
        # identical up to the +-1-level FMA-contraction wobble the XLA path
        # itself documents vs cv2 (ops/color.py:_fma): truncation casts can
        # flip one byte on ~1e-4 of pixels depending on a*b+c fusion
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() <= 1e-3

    @pytest.mark.slow
    def test_random_flow_byte_exact(self):
        # slow: test_unaligned_shape keeps random-flow byte-exactness in
        # the default suite on an unaligned shape
        rng = np.random.default_rng(0)
        self._check(rng.standard_normal((2, 2, 40, 130)).astype(np.float32)
                    * 10)

    def test_zero_flow(self):
        # constant magnitude -> normalize maps to all zeros (SURVEY 2c);
        # angle(0,0) == 0
        self._check(np.zeros((1, 2, 16, 128), np.float32))

    def test_hue_double_wrap_angles(self):
        # directions spanning all sectors incl. the 256-degree wrap point
        ang = np.linspace(0, 2 * np.pi, 24 * 128, endpoint=False,
                          dtype=np.float32).reshape(24, 128)
        mag = np.linspace(0.5, 8.0, 24 * 128,
                          dtype=np.float32).reshape(24, 128)
        flow = np.stack([mag * np.cos(ang), mag * np.sin(ang)])[None]
        self._check(flow.astype(np.float32))

    def test_unaligned_shape(self):
        rng = np.random.default_rng(1)
        self._check(rng.standard_normal((1, 2, 33, 150)).astype(np.float32)
                    * 3)
