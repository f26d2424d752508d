"""Halo-exchanged spatial sharding (parallel/halo.py) on the 8 virtual
CPU devices: each stage's shard_map decomposition must equal the global
single-device op, for interior shards (true ppermute'd neighbor rows)
and edge shards (synthesized global border) alike.

The integration path (the full sp>1 pyramid) is covered by
tests/test_parallel.py::test_dp_sp_flow_matches_single_device, which now
runs these stages; here each stage is pinned in isolation, plus the
Pallas-kernels-inside-shard_map combination in interpret mode."""

import numpy as np
import pytest

from optical_flow_tpu.models.farneback import core
from optical_flow_tpu.parallel import make_mesh
from optical_flow_tpu.parallel.halo import HaloKernels
from optical_flow_tpu.models.farneback.params import gaussian_kernel


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 255, (4, 64, 128)).astype(np.float32)


def _mesh(n_dp, n_sp):
    import jax
    return make_mesh(n_dp, n_sp, devices=jax.devices()[:n_dp * n_sp])


class TestStageEquality:
    """XLA twins inside the halo decomposition vs the plain global op."""

    @pytest.mark.parametrize("ks,sigma", [(9, 1.5), (5, 1.1), (3, 0.0)])
    def test_gauss(self, imgs, ks, sigma):
        hk = HaloKernels(_mesh(2, 4), use_pallas=False)
        taps = gaussian_kernel(ks, sigma)
        out = np.asarray(hk.gauss(imgs, taps))
        ref = np.asarray(core.gaussian_blur_reflect101(imgs, taps))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-6)

    @pytest.mark.parametrize("n_sp", [2, 4])
    @pytest.mark.slow
    def test_poly_exp(self, imgs, n_sp):
        hk = HaloKernels(_mesh(8 // n_sp, n_sp), use_pallas=False)
        out = np.asarray(hk.poly_exp(imgs, 5, 1.2))
        ref = np.asarray(core.poly_exp(imgs, 5, 1.2))
        np.testing.assert_allclose(out, ref, atol=1e-2, rtol=1e-5)

    @pytest.mark.parametrize("ws,gaussian", [(15, False), (21, False),
                                             (15, True)])
    @pytest.mark.slow
    def test_blur_solve(self, ws, gaussian):
        rng = np.random.default_rng(1)
        r4, r5, r6, r2, r3 = (rng.standard_normal((4, 64, 128))
                              .astype(np.float32) for _ in range(5))
        M = np.stack([r4 * r4 + r6 * r6, (r4 + r5) * r6,
                      r5 * r5 + r6 * r6, r4 * r2 + r6 * r3,
                      r6 * r2 + r5 * r3], axis=1)
        hk = HaloKernels(_mesh(2, 4), use_pallas=False)
        out = np.asarray(hk.blur_solve(M, ws, gaussian))
        ref = np.asarray(HaloKernels._fallback_blur(M, ws, gaussian))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def _update_inputs(self, h=128, w=128, B=2, seed=6):
        rng = np.random.default_rng(seed)
        img = rng.uniform(0, 255, (2 * B, h, w)).astype(np.float32)
        R = np.asarray(core.poly_exp(img, 5, 1.2))
        flow = rng.standard_normal((B, 2, h, w)).astype(np.float32) * 2
        return R[:B], R[B:], flow

    @pytest.mark.slow
    def test_update_smooth_flow(self):
        """All fetches land inside the WIN_H replicate halo: the sharded
        update must equal the global op everywhere, incl. the border-ramp
        rows the local runs cannot see (VERDICT r3 #6)."""
        R0, R1, flow = self._update_inputs()
        # keep the global-border fetches in-image: a pixel whose pre-clip
        # coordinate leaves the image is a (correct, bounded) seam
        # correction, exercised by the edge_fallback test below
        flow[:, 1, :8] = 0.3
        flow[:, 1, -8:] = -0.3
        hk = HaloKernels(_mesh(2, 2), use_pallas=False)
        assert hk._plan(2, 128, 128, 32)[0]    # really sharded, not the
        out, tiers = hk.update_matrices_stats(R0, R1, flow)  # fallback
        ref = np.asarray(core.update_matrices(R0, R1, flow))
        np.testing.assert_allclose(np.asarray(out), ref,
                                   atol=1e-4, rtol=1e-5)
        assert np.asarray(tiers).tolist() == [0, 0]

    @pytest.mark.slow
    def test_update_cross_seam_spill(self):
        """Displacements past the halo (|dy| > WIN_H across a shard seam)
        must go through the bounded seam correction and still match.
        slow: sp only engages at 8K-class frames, off the default path;
        the in-halo sp update test above stays in the fast suite."""
        R0, R1, flow = self._update_inputs()
        flow[:, 1, 60:64, 40:90] = 45.0        # shard 0 -> deep in shard 1
        hk = HaloKernels(_mesh(2, 2), use_pallas=False)
        out, tiers = hk.update_matrices_stats(R0, R1, flow)
        ref = np.asarray(core.update_matrices(R0, R1, flow))
        np.testing.assert_allclose(np.asarray(out), ref,
                                   atol=1e-4, rtol=1e-5)
        assert np.asarray(tiers)[0] >= 1       # tier-2 fired

    @pytest.mark.slow
    def test_update_edge_fallback_vs_replicate_halo(self):
        """Pre-clip coordinates just OUTSIDE the global image but inside
        the top shard's replicate halo: global semantics is the R0-only
        fallback while the local run fetches — the analytic seam mask
        must catch and fix every such pixel."""
        R0, R1, flow = self._update_inputs()
        flow[:, 1, :8, :] = -6.0               # y1 < 0 for the top rows
        hk = HaloKernels(_mesh(2, 2), use_pallas=False)
        out, _ = hk.update_matrices_stats(R0, R1, flow)
        ref = np.asarray(core.update_matrices(R0, R1, flow))
        np.testing.assert_allclose(np.asarray(out), ref,
                                   atol=1e-4, rtol=1e-5)

    @pytest.mark.slow
    def test_update_out_of_image(self):
        R0, R1, flow = self._update_inputs()
        flow[:, 1] = 1e4                       # fallback everywhere
        hk = HaloKernels(_mesh(2, 2), use_pallas=False)
        out, _ = hk.update_matrices_stats(R0, R1, flow)
        ref = np.asarray(core.update_matrices(R0, R1, flow))
        np.testing.assert_allclose(np.asarray(out), ref,
                                   atol=1e-4, rtol=1e-4)

    @pytest.mark.slow
    def test_update_four_shards(self):
        R0, R1, flow = self._update_inputs(h=256, B=1)
        flow[:, 1, 120:128, :30] = 50.0
        hk = HaloKernels(_mesh(1, 4), use_pallas=False)
        assert hk._plan(1, 256, 128, 32)[0]
        out, _ = hk.update_matrices_stats(R0, R1, flow)
        ref = np.asarray(core.update_matrices(R0, R1, flow))
        np.testing.assert_allclose(np.asarray(out), ref,
                                   atol=1e-4, rtol=1e-5)

    def test_update_fallback_on_shallow_shards(self):
        # hl=16 < WIN_H+1: must fall back to the plain global op exactly
        R0, R1, flow = self._update_inputs()
        hk = HaloKernels(_mesh(1, 8), use_pallas=False)
        out, tiers = hk.update_matrices_stats(R0, R1, flow)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(core.update_matrices(R0, R1, flow)))
        assert np.asarray(tiers).tolist() == [0, 0]

    def test_fallback_on_indivisible_height(self):
        # h=66 % 4 != 0 -> the plain global op must run (and be exact)
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 255, (4, 66, 128)).astype(np.float32)
        hk = HaloKernels(_mesh(2, 4), use_pallas=False)
        taps = gaussian_kernel(9, 1.5)
        np.testing.assert_array_equal(
            np.asarray(hk.gauss(x, taps)),
            np.asarray(core.gaussian_blur_reflect101(x, taps)))

    def test_fallback_on_deep_halo(self):
        # local height 8 can't host a 10-row halo (ws=21) -> fallback
        rng = np.random.default_rng(3)
        M = rng.standard_normal((4, 5, 64, 128)).astype(np.float32)
        hk = HaloKernels(_mesh(1, 8), use_pallas=False)
        assert not hk._plan(4, 64, 128, 10)[0]
        np.testing.assert_array_equal(
            np.asarray(hk.blur_solve(M, 21, False)),
            np.asarray(HaloKernels._fallback_blur(M, 21, False)))


class TestPallasInsideShardMap:
    """The TPU-pod configuration — Pallas kernels per shard under the
    halo exchange — run in interpret mode on the CPU mesh."""

    @pytest.fixture(scope="class", autouse=True)
    def interpret_mode(self):
        from jax.experimental import pallas as pl
        import optical_flow_tpu.pallas.blur_solve as bs
        import optical_flow_tpu.pallas.gauss as ga
        import optical_flow_tpu.pallas.polyexp as pe
        import optical_flow_tpu.pallas.update_gather as ug

        orig = pl.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        def clear():
            for m in (bs, ga, pe, ug):
                m._build.cache_clear()
            bs._build_store.cache_clear()
            ug._build_chunked.cache_clear()

        pl.pallas_call = patched
        clear()
        yield
        pl.pallas_call = orig
        clear()

    @pytest.fixture(scope="class")
    def big(self):
        rng = np.random.default_rng(4)
        return rng.uniform(0, 255, (2, 128, 128)).astype(np.float32)

    def test_gauss_pallas(self, big):
        hk = HaloKernels(_mesh(2, 2), use_pallas=True)
        assert hk._plan(2, 128, 128, 4) == (True, True)
        taps = gaussian_kernel(9, 1.5)
        out = np.asarray(hk.gauss(big, taps))
        ref = np.asarray(core.gaussian_blur_reflect101(big, taps))
        np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)

    def test_poly_exp_pallas(self, big):
        hk = HaloKernels(_mesh(2, 2), use_pallas=True)
        out = np.asarray(hk.poly_exp(big, 5, 1.2))
        ref = np.asarray(core.poly_exp(big, 5, 1.2))
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-5)

    def test_blur_solve_pallas(self, big):
        R = np.asarray(core.poly_exp(big, 5, 1.2))
        rng = np.random.default_rng(5)
        flow = rng.standard_normal((1, 2, 128, 128)).astype(np.float32)
        M = np.asarray(core.update_matrices(R[:1], R[1:], flow))
        hk = HaloKernels(_mesh(1, 2), use_pallas=True)
        out = np.asarray(hk.blur_solve(M, 15, False))
        ref = np.asarray(HaloKernels._fallback_blur(M, 15, False))
        np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)

    @pytest.mark.slow
    def test_update_pallas(self, big):
        """The pod configuration for the displaced fetch: the PALLAS
        update kernel per shard under the replicate halo + seam
        correction, incl. a cross-seam spill."""
        R = np.asarray(core.poly_exp(big, 5, 1.2))
        rng = np.random.default_rng(6)
        flow = rng.standard_normal((1, 2, 128, 128)).astype(np.float32)
        flow[:, 1, 60:64, 10:60] = 45.0
        hk = HaloKernels(_mesh(1, 2), use_pallas=True)
        out, tiers = hk.update_matrices_stats(R[:1], R[1:], flow)
        ref = np.asarray(core.update_matrices(R[:1], R[1:], flow))
        np.testing.assert_allclose(np.asarray(out), ref,
                                   atol=5e-4, rtol=1e-4)
        assert np.asarray(tiers)[0] >= 1
