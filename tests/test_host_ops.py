"""Host-side (numpy) preprocessing twins must be integer-identical to the
device ops (which are themselves bit-exact vs cv2) and to cv2 directly."""

import numpy as np
import pytest

from optical_flow_tpu.ops import bgr2gray_u8, resize_frame_u8
from optical_flow_tpu.ops.host import (bgr2gray_host, resize_gray_host,
                                       resize_u8_host)
from optical_flow_tpu.ops.resize import resize_u8_cv

cv2 = pytest.importorskip("cv2")


def _frames(seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, (120, 160, 3), np.uint8),
        rng.integers(0, 256, (720, 1280, 3), np.uint8),
        rng.integers(0, 256, (71, 129, 3), np.uint8),
    ]


class TestGrayHost:
    def test_matches_device_op_and_cv2(self):
        for f in _frames():
            host = bgr2gray_host(f)
            np.testing.assert_array_equal(host, np.asarray(bgr2gray_u8(f)))
            np.testing.assert_array_equal(
                host, cv2.cvtColor(f, cv2.COLOR_BGR2GRAY))


class TestResizeHost:
    def test_matches_device_op_and_cv2_downscale(self):
        for f in _frames(1):
            for dw in (129, 64):
                dh = int(dw / (f.shape[1] / f.shape[0]))
                host = resize_u8_host(f, dw, dh)
                np.testing.assert_array_equal(
                    host, np.asarray(resize_u8_cv(f, dw, dh)))
                np.testing.assert_array_equal(
                    host, cv2.resize(f, (dw, dh)))

    def test_2d_input(self):
        g = np.random.default_rng(2).integers(0, 256, (240, 320), np.uint8)
        np.testing.assert_array_equal(
            resize_u8_host(g, 129, 72), np.asarray(resize_u8_cv(g, 129, 72)))

    def test_identity_passthrough(self):
        f = _frames(3)[0]
        assert resize_u8_host(f, 160, 120) is f


class TestResizeGrayHost:
    def test_matches_reference_composition(self):
        """resize_frame + BGR2GRAY exactly as the reference composes them
        (`optical_flow.py:25-31,44`)."""
        for f in _frames(4):
            got = resize_gray_host(f, 129)
            dev = bgr2gray_u8(resize_frame_u8(f, 129))
            np.testing.assert_array_equal(got, np.asarray(dev))
            ratio = f.shape[1] / f.shape[0]
            ref = cv2.cvtColor(cv2.resize(f, (129, int(129 / ratio))),
                               cv2.COLOR_BGR2GRAY)
            np.testing.assert_array_equal(got, ref)


class TestGray42Mode:
    def test_cv42_coefficients_selectable(self, monkeypatch):
        """OFT_CV42_GRAY=1 switches BGR2GRAY to the pinned cv2-4.2 14-bit
        constants (docs/PARITY_42.md); host and device twins must agree
        with the documented formula and stay within 1 level of the 15-bit
        default."""
        f = _frames()[0]
        default = bgr2gray_host(f)
        monkeypatch.setenv("OFT_CV42_GRAY", "1")
        got = bgr2gray_host(f)
        np.testing.assert_array_equal(got, np.asarray(bgr2gray_u8(f)))
        b, g, r = (f[..., i].astype(np.int64) for i in range(3))
        want = ((b * 1868 + g * 9617 + r * 4899 + (1 << 13)) >> 14)
        np.testing.assert_array_equal(got, want.astype(np.uint8))
        assert np.abs(got.astype(int) - default.astype(int)).max() <= 1


class TestParity42Harness:
    @pytest.mark.slow
    def test_round_trip_against_local_cv2(self, tmp_path):
        """The pinned-toolchain harness must round-trip green against the
        locally installed cv2 (docs/PARITY_42.md): dump with the local
        oracle, then check THIS implementation against the dump.  This
        validates the harness mechanics; the real 4.2 dump needs the
        reference's docker env."""
        import subprocess
        import sys
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        harness = os.path.join(repo, "benchmarks", "parity42_harness.py")
        dump = str(tmp_path / "p42.npz")
        r = subprocess.run([sys.executable, harness, "--dump", dump],
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, harness, "--check", dump],
                           capture_output=True, text=True, timeout=1200,
                           env=env, cwd=repo)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "MISMATCH" not in r.stdout, r.stdout
