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

        orig = pl.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        def clear():
            for m in (bs, ga, pe):
                m._build.cache_clear()
            bs._build_store.cache_clear()

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
