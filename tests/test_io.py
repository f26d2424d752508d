"""Native decode/encode runtime vs cv2 (VideoCapture / imwrite semantics)."""

import os

import cv2
import numpy as np
import pytest

from optical_flow_tpu.io.jpeg import write_jpeg_bgr
from optical_flow_tpu.io.video import VideoReader
from optical_flow_tpu.oracle.synthetic import write_synthetic_video


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "test.mp4")
    write_synthetic_video(path, n_frames=40, h=120, w=160, fps=25.0)
    return path


class TestVideoReader:
    def test_props_match_cv2(self, synthetic_video):
        vc = cv2.VideoCapture(synthetic_video)
        vr = VideoReader(synthetic_video)
        assert vr.fps == vc.get(cv2.CAP_PROP_FPS)
        assert vr.frame_count == int(vc.get(cv2.CAP_PROP_FRAME_COUNT))
        assert vr.width == int(vc.get(cv2.CAP_PROP_FRAME_WIDTH))
        assert vr.height == int(vc.get(cv2.CAP_PROP_FRAME_HEIGHT))

    @pytest.mark.parametrize("pos", [0, 5, 17.0, 17.9, 3, 39, 38.5, 12.3])
    def test_seek_decode_byte_exact(self, synthetic_video, pos):
        # float positions decode floor(pos) — verified CAP_PROP_POS_FRAMES
        # behavior (SURVEY.md 2c #4)
        vc = cv2.VideoCapture(synthetic_video)
        vc.set(cv2.CAP_PROP_POS_FRAMES, pos)
        r_ref, f_ref = vc.read()
        vr = VideoReader(synthetic_video)
        r_our, f_our = vr.read_at(pos)
        assert r_our == r_ref
        np.testing.assert_array_equal(f_our, f_ref)

    def test_long_jumps_cross_reseek_threshold(self, tmp_path_factory):
        # the native reader re-seeks for jumps > 64 frames and decodes
        # forward otherwise; both paths (and the backward jump) must stay
        # byte-exact with cv2 across a long video (VERDICT r1 weak #8)
        path = str(tmp_path_factory.mktemp("vidlong") / "long.mp4")
        write_synthetic_video(path, n_frames=200, h=96, w=128, fps=25.0)
        vc = cv2.VideoCapture(path)
        vr = VideoReader(path)
        # forward > 64 (seek path), forward < 64 (sequential decode path),
        # backward (always seek), repeat, then a monotone extractor-like
        # scatter with mixed gap sizes
        positions = [0, 100, 130, 199, 20, 20, 85.7, 86, 150, 3]
        for pos in positions:
            vc.set(cv2.CAP_PROP_POS_FRAMES, pos)
            r_ref, f_ref = vc.read()
            r_our, f_our = vr.read_at(pos)
            assert r_our == r_ref, f"ret mismatch at {pos}"
            np.testing.assert_array_equal(f_our, f_ref,
                                          err_msg=f"pos {pos}")

    def test_eof_returns_false(self, synthetic_video):
        vr = VideoReader(synthetic_video)
        ret, frame = vr.read_at(40)
        assert ret is False and frame is None

    def test_unopenable(self, tmp_path):
        vr = VideoReader(str(tmp_path / "nope.mp4"))
        assert not vr.is_opened()


class TestJpeg:
    def test_bytes_match_cv2_default(self, tmp_path, rng):
        img = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
        ours = str(tmp_path / "ours.jpeg")
        ref = str(tmp_path / "ref.jpeg")
        write_jpeg_bgr(ours, img)
        cv2.imwrite(ref, img)   # default quality 95 (verified empirically)
        with open(ours, "rb") as a, open(ref, "rb") as b:
            ours_b, ref_b = a.read(), b.read()
        if ours_b != ref_b:
            # tolerate metadata-only differences: decoded pixels must match
            da = cv2.imread(ours)
            db = cv2.imread(ref)
            np.testing.assert_array_equal(da, db)


class TestStreamMetadata:
    """VFR + rotation handling (round-2 VERDICT item 7): neither case may
    produce silently wrong frames.  Fixtures are box-patched CFR files
    (oracle/mp4edit.py) — no re-encode, so decode remains comparable."""

    def test_rotated_stream_decodes_unrotated_like_cv2_42(self, tmp_path):
        from optical_flow_tpu.oracle.mp4edit import patch_rotation
        base = str(tmp_path / "base.mp4")
        rot = str(tmp_path / "rot.mp4")
        write_synthetic_video(base, n_frames=30, h=120, w=160, fps=25.0,
                              seed=3)
        patch_rotation(base, rot)

        r = VideoReader(rot)
        assert r.is_opened()
        assert abs(r.rotation_degrees) == 90    # surfaced, not silent
        assert not r.is_vfr
        # pinned behavior: UNROTATED decode, byte-equal to cv2 with
        # auto-rotation disabled (cv2 4.2 had no auto-rotation at all;
        # modern cv2 rotates by default — verified: default read returns
        # (160, 120), which is exactly the divergence we refuse to hide)
        cap = cv2.VideoCapture(rot)
        cap.set(cv2.CAP_PROP_ORIENTATION_AUTO, 0)
        cap.set(cv2.CAP_PROP_POS_FRAMES, 5)
        ok_ref, ref = cap.read()
        cap.release()
        ok, ours = r.read_at(5)
        r.release()
        assert ok and ok_ref
        assert ours.shape == (120, 160, 3)
        np.testing.assert_array_equal(ours, ref)

    def test_vfr_stream_fails_loudly(self, tmp_path, monkeypatch):
        from optical_flow_tpu.oracle.mp4edit import patch_vfr
        base = str(tmp_path / "base.mp4")
        vfr = str(tmp_path / "vfr.mp4")
        write_synthetic_video(base, n_frames=30, h=120, w=160, fps=25.0,
                              seed=3)
        patch_vfr(base, vfr)

        with pytest.raises(IOError, match="variable frame rate"):
            VideoReader(vfr)
        # explicit override: cv2-style fps-based indexing, flagged
        monkeypatch.setenv("OFIO_ALLOW_VFR", "1")
        r = VideoReader(vfr)
        assert r.is_opened() and r.is_vfr
        ok, frame = r.read_at(0)
        assert ok and frame.shape == (120, 160, 3)
        r.release()

    def test_cfr_stream_flags_nothing(self, synthetic_video):
        r = VideoReader(synthetic_video)
        assert r.is_opened()
        assert r.rotation_degrees == 0.0 and not r.is_vfr
        r.release()
