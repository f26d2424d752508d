"""Byte/bit parity tests for the deterministic image ops against cv2.

Every op the reference delegates to OpenCV C++ (SURVEY.md 2b) is compared
against the locally installed cv2 directly.
"""

import cv2
import numpy as np
import pytest

from optical_flow_tpu import ops


def _u8(rng, *shape):
    return rng.integers(0, 256, shape, dtype=np.uint8)


class TestBGR2Gray:
    def test_bit_exact_random(self, rng):
        bgr = _u8(rng, 240, 320, 3)
        ours = np.asarray(ops.bgr2gray_u8(bgr))
        ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(ours, ref)

    def test_bit_exact_extremes(self):
        grid = np.mgrid[0:256:15, 0:256:15, 0:256:15].reshape(3, -1).T
        bgr = grid.astype(np.uint8).reshape(1, -1, 3)
        ours = np.asarray(ops.bgr2gray_u8(bgr))
        ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(ours, ref)


class TestHSV2BGR:
    def test_bit_exact_visualizer_grid(self):
        # The visualizer always uses S=255 (visualize_optical_flow.py:52):
        # test the full (hue, value) grid.
        h, v = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
        hsv = np.stack([h, np.full_like(h, 255), v], axis=-1).astype(np.uint8)
        ours = np.asarray(ops.hsv2bgr_u8(hsv))
        ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        mismatch = (ours != ref).mean()
        # bit-exact up to FMA availability; XLA CPU fuses a*b+c reliably here
        assert mismatch <= 2e-5, f"HSV2BGR mismatch fraction {mismatch}"
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_random_full_hsv(self, rng):
        hsv = _u8(rng, 256, 256, 3)
        ours = np.asarray(ops.hsv2bgr_u8(hsv))
        ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        mismatch = (ours != ref).mean()
        assert mismatch <= 1e-4, f"HSV2BGR mismatch fraction {mismatch}"
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


class TestCartToPolar:
    def test_angle_close_and_mag(self, rng):
        x = (rng.standard_normal((128, 128)) * 3).astype(np.float32)
        y = (rng.standard_normal((128, 128)) * 3).astype(np.float32)
        mag_o, ang_o = ops.cart_to_polar(x, y)
        mag_r, ang_r = cv2.cartToPolar(x, y)
        np.testing.assert_allclose(np.asarray(mag_o), mag_r, atol=1e-5, rtol=1e-6)
        # fastAtan2 replication: ~1e-6 rad agreement (ulp-level)
        np.testing.assert_allclose(np.asarray(ang_o), ang_r, atol=2e-6)

    def test_zero_angle(self):
        z = np.zeros((4, 4), np.float32)
        _, ang = ops.cart_to_polar(z, z)
        np.testing.assert_array_equal(np.asarray(ang), 0.0)


class TestNormalizeMinmax:
    def test_matches_cv2(self, rng):
        m = (rng.standard_normal((64, 96)) * 7).astype(np.float32)
        ours = np.asarray(ops.normalize_minmax_u8_value(m))
        ref = cv2.normalize(m, None, 0, 255, cv2.NORM_MINMAX)
        np.testing.assert_allclose(ours, ref, atol=3e-5)

    def test_constant_input_is_zero(self):
        m = np.full((16, 16), 5.0, np.float32)
        ours = np.asarray(ops.normalize_minmax_u8_value(m))
        np.testing.assert_array_equal(ours, 0.0)


class TestResize:
    def test_u8_downscale_bit_exact(self, rng):
        src = _u8(rng, 214, 386, 3)
        for dsize in [(129, 72), (97, 54), (193, 107)]:
            ours = np.asarray(ops.resize_u8_cv(src, *dsize))
            ref = cv2.resize(src, dsize, interpolation=cv2.INTER_LINEAR)
            np.testing.assert_array_equal(ours, ref, err_msg=f"dsize={dsize}")

    def test_u8_gray_downscale_bit_exact(self, rng):
        src = _u8(rng, 720, 1280)
        ours = np.asarray(ops.resize_u8_cv(src, 129, 72))
        ref = cv2.resize(src, (129, 72), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(ours, ref)

    def test_u8_upscale_near_exact(self, rng):
        # cv2 5.0 uses a distinct border path on upscale: allow +-1 there.
        src = _u8(rng, 53, 97)
        ours = np.asarray(ops.resize_u8_cv(src, 194, 108)).astype(int)
        ref = cv2.resize(src, (194, 108), interpolation=cv2.INTER_LINEAR).astype(int)
        assert np.abs(ours - ref).max() <= 1
        assert (ours != ref).mean() < 0.02

    def test_f32_close(self, rng):
        src = (rng.standard_normal((107, 193)) * 50 + 100).astype(np.float32)
        for dsize in [(97, 54), (386, 214), (129, 72)]:
            ours = np.asarray(ops.resize_bilinear_f32(src, *dsize))
            ref = cv2.resize(src, dsize, interpolation=cv2.INTER_LINEAR)
            np.testing.assert_allclose(ours, ref, atol=1e-4,
                                       err_msg=f"dsize={dsize}")

    def test_resize_frame_matches_reference_semantics(self, rng):
        # reference resize_frame: new_h = int(frame_width / (W/H))
        # (optical_flow.py:25-31), then cv2.resize
        frame = _u8(rng, 360, 640, 3)
        ours = np.asarray(ops.resize_frame_u8(frame, 129))
        ref = cv2.resize(frame, (129, int(129 / (640 / 360))))
        np.testing.assert_array_equal(ours, ref)


class TestFlowColorize:
    def test_matches_cv2_hsv_assembly(self, rng):
        flow = (rng.standard_normal((120, 160, 2)) * 4).astype(np.float32)
        ours = np.asarray(ops.flow_to_bgr_u8(flow))

        mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1])
        hsv = np.zeros((120, 160, 3), np.uint8)
        hsv[..., 1] = 255
        hsv[..., 0] = ang * 180 / np.pi          # truncating uint8 assignment
        hsv[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
        ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)

        diff = np.abs(ours.astype(int) - ref.astype(int))
        frac = (diff > 0).mean()
        # deviations only at hue/value truncation boundaries (f32 vs f64
        # round-trip, SURVEY.md 2c #1-2): rare and bounded.  The byte-level
        # sensitivity gate for the colorizer lives HERE (the pipeline golden
        # test can only gate grossly, since sub-pixel flow differences move
        # hue/value everywhere): a 1-level value shift flips frac to ~1.0,
        # a 1-sector hue shift blows the max bound.
        assert frac <= 1e-3, f"colorize mismatch fraction {frac}"
        assert diff.max() <= 8, f"colorize max diff {diff.max()}"
