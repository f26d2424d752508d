"""Unit tests for pipeline building blocks: prefetcher, chunk sizing,
robust corpus mode, metrics."""

import os

import numpy as np
import pytest

from optical_flow_tpu.oracle.synthetic import write_synthetic_video
from optical_flow_tpu.pipeline.prefetch import DecodePrefetcher, pair_chunk_for
from optical_flow_tpu.utils.config import ExtractorConfig
from optical_flow_tpu.utils.metrics import PipelineMetrics


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("v") / "clip.mp4")
    write_synthetic_video(path, n_frames=30, h=120, w=160, fps=25.0)
    return path


class TestPrefetcher:
    def test_yields_all_in_order(self, video):
        import cv2
        positions = [0, 3, 7, 7.9, 12, 29]
        got = list(DecodePrefetcher(video, positions))
        assert [p for p, _ in got] == positions
        vc = cv2.VideoCapture(video)
        for p, frame in got:
            vc.set(cv2.CAP_PROP_POS_FRAMES, p)
            _, ref = vc.read()
            np.testing.assert_array_equal(frame, ref)

    def test_stops_at_failure(self, video):
        got = list(DecodePrefetcher(video, [0, 5, 30, 10]))
        assert [p for p, _ in got] == [0, 5, 30]
        assert got[-1][1] is None            # failed read, then stop

    def test_parallel_segments_keep_order(self, video):
        import cv2
        positions = list(range(0, 30, 2))
        got = list(DecodePrefetcher(video, positions, workers=4))
        assert [p for p, _ in got] == positions
        vc = cv2.VideoCapture(video)
        for p, frame in got[:3] + got[-3:]:
            vc.set(cv2.CAP_PROP_POS_FRAMES, p)
            _, ref = vc.read()
            np.testing.assert_array_equal(frame, ref)

    def test_parallel_early_break_drops_tail(self, video):
        # failure inside an early segment must suppress later segments'
        # frames even though they decoded fine (reference early-break)
        positions = [0, 5, 77, 10, 12, 14, 16, 18, 20, 22, 24, 26]
        got = list(DecodePrefetcher(video, positions, workers=4))
        assert [p for p, _ in got] == [0, 5, 77]
        assert got[-1][1] is None

    def test_transform_runs_in_workers(self, video):
        got = list(DecodePrefetcher(video, [0, 4, 8, 12],
                                    transform=lambda f: f.shape,
                                    workers=2))
        assert [f for _, f in got] == [(120, 160, 3)] * 4


class TestChunkSizing:
    def test_resolution_scaling(self):
        assert pair_chunk_for(72, 129) == 128         # capped
        assert pair_chunk_for(1080, 1920) == 16
        assert 2 <= pair_chunk_for(2160, 3840) <= 8   # 4K bounded
        assert pair_chunk_for(100000, 100000) == 1    # floor


class TestRobustCorpus:
    def test_failures_skipped_and_reported(self, tmp_path):
        from optical_flow_tpu.pipeline.extractor import run_corpus
        root = str(tmp_path)
        # goodvid has real media; badvid has a corrupt file
        os.makedirs(os.path.join(root, "goodvid", "media"))
        write_synthetic_video(
            os.path.join(root, "goodvid", "media", "goodvid.mp4"),
            n_frames=30, h=120, w=160)
        os.makedirs(os.path.join(root, "badvid", "media"))
        with open(os.path.join(root, "badvid", "media", "badvid.mp4"),
                  "wb") as f:
            f.write(b"not a video")

        failures = run_corpus(root, ["badvid", "goodvid"],
                              ExtractorConfig(), robust=True)
        assert failures == ["badvid"]
        assert os.path.isfile(
            os.path.join(root, "goodvid", "opticalflow", "goodvid.csv"))

        # non-robust mode raises on the bad video (reference behavior)
        with pytest.raises(Exception):
            run_corpus(root, ["badvid"], ExtractorConfig())


class TestVFRCorpus:
    def test_vfr_video_skipped_not_fatal(self, tmp_path):
        """One VFR video must not abort a non-robust corpus run: the
        reference (cv2 4.2, fps-indexed) completes such corpora, and our
        loud VFR failure would otherwise turn into a new corpus-level
        failure mode (round-3 advisor).  It is skipped + reported."""
        from optical_flow_tpu.oracle.mp4edit import patch_vfr
        from optical_flow_tpu.pipeline.extractor import run_corpus

        root = str(tmp_path)
        os.makedirs(os.path.join(root, "goodvid", "media"))
        write_synthetic_video(
            os.path.join(root, "goodvid", "media", "goodvid.mp4"),
            n_frames=30, h=120, w=160)
        os.makedirs(os.path.join(root, "vfrvid", "media"))
        base = str(tmp_path / "base.mp4")
        write_synthetic_video(base, n_frames=30, h=120, w=160)
        patch_vfr(base, os.path.join(root, "vfrvid", "media", "vfrvid.mp4"))

        failures = run_corpus(root, ["vfrvid", "goodvid"],
                              ExtractorConfig())          # robust=False
        assert failures == ["vfrvid"]
        assert os.path.isfile(
            os.path.join(root, "goodvid", "opticalflow", "goodvid.csv"))
        assert not os.path.isfile(
            os.path.join(root, "vfrvid", "opticalflow", "vfrvid.csv"))


class TestValidateMode:
    def test_extractor_validate_logs_epe(self, tmp_path):
        """--validate computes one sampled pair against the cv2 oracle and
        records the EPE (SURVEY.md section 5 metrics row; VERDICT r3 #7)."""
        from optical_flow_tpu.pipeline import extractor

        path = str(tmp_path / "clip.mp4")
        write_synthetic_video(path, n_frames=30, h=96, w=128, fps=25.0)
        cfg = ExtractorConfig(frame_width=0, validate=True)
        extractor.extract_video(path, cfg)
        epe = extractor.LAST_RUN_COUNTERS.get("validate_mean_epe")
        assert epe is not None and epe <= 0.5

    def test_visualizer_validate_logs_epe(self, tmp_path):
        from optical_flow_tpu.pipeline.visualizer import visualize_shot
        from optical_flow_tpu.utils.config import VisualizerConfig

        path = str(tmp_path / "clip.mp4")
        write_synthetic_video(path, n_frames=40, h=96, w=128, fps=25.0)
        n = visualize_shot(path, str(tmp_path / "imgs"), 200, 1400,
                           config=VisualizerConfig(validate=True))
        assert n > 0    # EPE warn-gates, never fails the run

    def test_debug_nans_toggle(self, monkeypatch):
        """OFT_DEBUG_NANS=1 arms jax.debug_nans (the SURVEY section 5
        sanitizer); a clean flow pass must still run under it."""
        import jax
        from optical_flow_tpu.utils.validate import maybe_enable_debug_nans

        assert maybe_enable_debug_nans() is False
        monkeypatch.setenv("OFT_DEBUG_NANS", "1")
        assert maybe_enable_debug_nans() is True
        try:
            from optical_flow_tpu.utils.warmup import warmup_flow
            warmup_flow(48, 64, batch=2)      # runs clean under debug_nans
        finally:
            jax.config.update("jax_debug_nans", False)


class TestShotGranularResume:
    def test_killed_run_resumes_from_high_water_mark(self, tmp_path,
                                                     monkeypatch):
        """--resume (VERDICT r3 #8): kill a run mid-video, resume, and
        the tail alone is redone — outputs match an uninterrupted run."""
        from optical_flow_tpu.io.sidecar import ShotProgress
        from optical_flow_tpu.pipeline import extractor

        path = str(tmp_path / "long.mp4")
        write_synthetic_video(path, n_frames=150, h=96, w=128, fps=25.0,
                              seed=5)
        cfg = ExtractorConfig(frame_width=0)
        ref_mags, ref_ts = extractor.extract_video(path, cfg)
        full_decoded = extractor.LAST_RUN_COUNTERS["frames_decoded"]

        ckpt_path = str(tmp_path / "v.progress")
        monkeypatch.setattr(extractor, "pair_chunk_for", lambda *a, **k: 3)
        real = extractor._magnitude_sums
        calls = {"n": 0}

        def dying(*a, **k):
            calls["n"] += 1
            if calls["n"] >= 4:
                raise RuntimeError("injected kill")
            return real(*a, **k)

        monkeypatch.setattr(extractor, "_magnitude_sums", dying)
        ckpt = ShotProgress(ckpt_path, cfg.done_version)
        with pytest.raises(RuntimeError, match="injected kill"):
            extractor.extract_video(path, cfg, progress_ckpt=ckpt)
        completed = ShotProgress(ckpt_path, cfg.done_version).load()
        assert len(completed) >= 3          # drained chunks survived

        # resume: failure gone; only the tail is decoded/computed
        monkeypatch.setattr(extractor, "_magnitude_sums", real)
        ckpt2 = ShotProgress(ckpt_path, cfg.done_version)
        mags, ts = extractor.extract_video(path, cfg, progress_ckpt=ckpt2)
        assert ts == ref_ts
        np.testing.assert_allclose(mags, ref_mags, rtol=1e-4)
        resumed_decoded = extractor.LAST_RUN_COUNTERS["frames_decoded"]
        assert resumed_decoded < full_decoded  # tail only

        # a stale stamp (changed params) discards the checkpoint
        other = ExtractorConfig(frame_width=0, step_size=600)
        assert ShotProgress(ckpt_path, other.done_version).load() == {}


class TestImportHygiene:
    def test_package_import_initializes_no_backend(self):
        """Importing the package (incl. both CLI modules) must not
        initialize any JAX backend: on the axon TPU tunnel an import-time
        backend dial can hang for minutes when the transport is wedged,
        before the CLI's JAX_PLATFORMS handling ever runs (this exact bug
        hid in a module-level jnp.float32 constant in ops/polar.py)."""
        import subprocess
        import sys
        code = (
            "import optical_flow_tpu.cli.optical_flow, "
            "optical_flow_tpu.cli.visualize_optical_flow, "
            "optical_flow_tpu.pipeline.visualizer\n"
            "import jax._src.xla_bridge as xb\n"
            "assert not xb.backends_are_initialized(), 'backend initialized'\n")
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=120)
        assert res.returncode == 0, res.stderr


class TestTierCounterBounds:
    def test_overflow_folds_instead_of_dropping(self, monkeypatch):
        """When no consumer drains the pending tier vectors, overflow must
        fold the oldest into TIER_COUNTS, keeping totals exact (round-3
        advisor)."""
        from optical_flow_tpu.pallas import update_gather as ug

        monkeypatch.setattr(ug, "_PENDING_MAX", 4)
        ug.reset_tier_counts()
        for _ in range(10):
            ug.note_tier_stats(np.array([1, 0], np.int32))
        assert len(ug._PENDING_TIERS) == 4     # bounded
        counts = ug.consume_tier_stats()
        assert counts["tier2"] == 10 and counts["tier3"] == 0
        ug.reset_tier_counts()


class TestMetrics:
    def test_stage_accumulation(self):
        m = PipelineMetrics("t")
        with m.stage("a"):
            pass
        with m.stage("a"):
            pass
        m.add("frame_pairs", 5)
        assert m.stages["a"].count == 2
        assert m.counters["frame_pairs"] == 5
        m.log_summary()   # should not raise


class TestFaultInjection:
    def test_truncated_video_early_break(self, tmp_path):
        """A video truncated mid-stream must degrade exactly like the
        reference's early break (SURVEY.md section 5 fault injection):
        frames decodable before the cut are used, the tail is dropped."""
        import shutil
        from optical_flow_tpu.io.video import VideoReader
        from optical_flow_tpu.pipeline.extractor import extract_video

        full = str(tmp_path / "full.mp4")
        write_synthetic_video(full, n_frames=60, h=120, w=160, fps=25.0)
        cut = str(tmp_path / "cut.mp4")
        size = os.path.getsize(full)
        with open(full, "rb") as f:
            data = f.read(int(size * 0.5))    # chop the second half
        with open(cut, "wb") as f:
            f.write(data)

        vr = VideoReader(cut)
        if not vr.is_opened():
            # container metadata lost entirely -> clean IOError is also
            # acceptable degradation
            with pytest.raises(Exception):
                extract_video(cut, ExtractorConfig())
            return
        vr.release()
        # decodable prefix -> shorter output, no crash
        mags, (start_ms, end_ms) = extract_video(cut, ExtractorConfig())
        full_mags, (_, full_end) = extract_video(full, ExtractorConfig())
        assert len(mags) <= len(full_mags)
        assert end_ms <= full_end


class TestMemoryBounds:
    def test_long_video_evicts_frames(self, tmp_path, monkeypatch):
        """Device-resident frames must stay bounded by the chunk span +
        decode-ahead depth on long videos (ADVICE r1: the frames dict used
        to grow without bound), without changing the output."""
        from optical_flow_tpu.pipeline import extractor

        path = str(tmp_path / "long.mp4")
        write_synthetic_video(path, n_frames=240, h=96, w=128, fps=25.0,
                              seed=3)
        cfg = ExtractorConfig(frame_width=0)      # full-res, the worst case
        ref_mags, ref_ts = extractor.extract_video(path, cfg)

        monkeypatch.setattr(extractor, "pair_chunk_for", lambda *a, **k: 8)
        mags, ts = extractor.extract_video(path, cfg)
        peak = extractor.LAST_RUN_COUNTERS["peak_live_frames"]
        decoded = extractor.LAST_RUN_COUNTERS["frames_decoded"]
        assert decoded >= 60
        # ~2 endpoints per window over a chunk of 8 windows, plus margin
        assert peak <= 40, f"peak_live_frames={peak} not bounded"
        assert peak < decoded / 3
        # eviction must not change results (rtol headroom: per-device
        # batch shape differs between the two chunk sizes on the dp mesh,
        # and XLA's FMA contraction with it — measured <=2e-5 relative)
        assert ts == ref_ts
        np.testing.assert_allclose(mags, ref_mags, rtol=1e-4)

    def test_pair_chunk_scales_with_device_hbm(self, monkeypatch):
        """The HBM pixel budget adapts to the device's actual memory
        (memory_stats bytes_limit): half the HBM -> half the chunk, and
        unknown capacity falls back to the tuned v5e constant (round-2
        VERDICT item 9)."""
        from optical_flow_tpu.pipeline import prefetch

        monkeypatch.setattr(prefetch, "_device_hbm_bytes",
                            lambda: 16 << 30)
        ref = prefetch.pair_chunk_for(2160, 3840)
        monkeypatch.setattr(prefetch, "_device_hbm_bytes",
                            lambda: 8 << 30)
        small = prefetch.pair_chunk_for(2160, 3840)
        assert small == max(1, ref // 2)
        monkeypatch.setattr(prefetch, "_device_hbm_bytes", lambda: None)
        assert prefetch.pair_chunk_for(2160, 3840) == ref


class TestVisualizerDegenerate:
    def test_unopenable_video_writes_nothing(self, tmp_path):
        """Reference parity: an unreadable video makes the visualizer's
        while-loop vacuous (fps=0) — it silently writes nothing
        (`visualize_optical_flow.py:14-21`, ADVICE r1)."""
        from optical_flow_tpu.pipeline.visualizer import visualize_shot

        bad = str(tmp_path / "bad.mp4")
        with open(bad, "wb") as f:
            f.write(b"not a video")
        out = str(tmp_path / "out")
        assert visualize_shot(bad, out, 0, 1000) == 0
        assert os.path.isdir(out) and os.listdir(out) == []


class TestWarmup:
    @pytest.mark.slow
    def test_warmup_compiles(self):
        # slow: pure smoke at off-production shapes; the two
        # precompiles_production tests below assert the same APIs
        # against the real dispatch cache and stay in the fast suite
        from optical_flow_tpu.utils.warmup import (
            warmup_extractor, warmup_flow, warmup_visualizer)
        warmup_flow(48, 64, batch=2)
        warmup_extractor(96, 128)
        warmup_visualizer(48, 64)

    def test_cache_pack_roundtrip(self, tmp_path, monkeypatch):
        """--pack/--unpack ship the persistent compile cache to fresh
        hosts (cold-start packs).  Round-trip on a synthetic cache dir;
        hostile archive members (paths, dotfiles, dirs) are skipped."""
        import tarfile

        from optical_flow_tpu.utils import warmup as wu

        cache = tmp_path / "cache"
        cache.mkdir()
        monkeypatch.setenv("OFT_COMPILE_CACHE", str(cache))
        (cache / "entry_a").write_bytes(b"xla-exec-a")
        (cache / "entry_b").write_bytes(b"xla-exec-b")
        pack = str(tmp_path / "warm.tgz")
        assert wu.pack_cache(pack) == 2
        for f in cache.iterdir():
            f.unlink()
        # adversarial archive: path-y / hidden members must be skipped
        evil = str(tmp_path / "evil.tgz")
        with tarfile.open(evil, "w:gz") as tf:
            tf.add(str(cache), arcname="sub/dir")       # dir + path
            (tmp_path / ".hidden").write_bytes(b"x")
            tf.add(str(tmp_path / ".hidden"), arcname=".hidden")
        assert wu.unpack_cache(evil) == 0
        assert wu.unpack_cache(pack) == 2
        assert sorted(p.name for p in cache.iterdir()) == [
            "entry_a", "entry_b"]
        assert (cache / "entry_a").read_bytes() == b"xla-exec-a"

    def test_warmup_precompiles_production_visualizer(self, tmp_path,
                                                      monkeypatch):
        """warmup_visualizer must compile THE executable visualize_shot
        dispatches (round-2 VERDICT item 4: it used to warm
        calc_flow_batched while production ran the chained/sharded
        programs).  Asserted via the jit cache: no new entry appears when
        the real pipeline runs after warmup."""
        from optical_flow_tpu.pipeline import visualizer as vz
        from optical_flow_tpu.pipeline.extractor import _dp_mesh
        from optical_flow_tpu.utils import warmup as wu
        from optical_flow_tpu.utils.config import FarnebackConfig

        h, w = 96, 128
        path = str(tmp_path / "clip.mp4")
        # 6 sampled positions -> 5 pairs == the patched chunk size, so
        # the shot dispatches exactly the warmed (chunk+1)-frame stack
        write_synthetic_video(path, n_frames=45, h=h, w=w, fps=25.0)
        monkeypatch.setattr(wu, "pair_chunk_for", lambda *a, **k: 5)
        monkeypatch.setattr(vz, "pair_chunk_for", lambda *a, **k: 5)

        wu.warmup_visualizer(h, w)
        mesh = _dp_mesh()
        if mesh is not None:
            from optical_flow_tpu.parallel import mesh as meshmod
            fn = meshmod._sharded_bgr_chain_fn(mesh, 1, h, w,
                                               FarnebackConfig())
        else:
            from optical_flow_tpu.models.farneback import flow as flowmod
            fn = flowmod._jitted_chain_bgr(h, w, FarnebackConfig())
        warmed = fn._cache_size()
        assert warmed >= 1
        n = vz.visualize_shot(path, str(tmp_path / "imgs"), 0, 1500)
        assert n == 5
        assert fn._cache_size() == warmed, \
            "visualize_shot compiled a program warmup did not"

    def test_warmup_precompiles_production_extractor(self, tmp_path,
                                                     monkeypatch):
        """Same contract for the extractor's device step (mesh path
        included when the host has several devices)."""
        from optical_flow_tpu.pipeline import extractor
        from optical_flow_tpu.utils import warmup as wu
        from optical_flow_tpu.utils.config import ExtractorConfig

        h, w = 120, 160
        path = str(tmp_path / "clip.mp4")
        write_synthetic_video(path, n_frames=80, h=h, w=w, fps=25.0)
        cfg = ExtractorConfig(frame_width=0)
        monkeypatch.setattr(wu, "pair_chunk_for", lambda *a, **k: 4)
        monkeypatch.setattr(extractor, "pair_chunk_for",
                            lambda *a, **k: 4)

        wu.warmup_extractor(h, w, cfg)
        mesh = extractor._dp_mesh()
        if mesh is not None:
            from optical_flow_tpu.parallel import mesh as meshmod
            fn = meshmod._sharded_extract_fn(mesh, h, w, cfg.farneback)
        else:
            from optical_flow_tpu.models.farneback import flow as flowmod
            fn = flowmod._jitted_batched(h, w, cfg.farneback)
        warmed = fn._cache_size()
        assert warmed >= 1
        extractor.extract_video(path, cfg)
        assert fn._cache_size() == warmed, \
            "extract_video compiled a program warmup did not"


class TestCLICompat:
    def test_extractor_args_match_reference(self):
        from optical_flow_tpu.cli.optical_flow import build_parser
        # exactly the reference's surface (optical_flow.py:171-185)
        a = build_parser().parse_args(
            ["/data", "vid1", "vid2", "--frame_width", "200",
             "--step_size", "500", "--window_size", "600",
             "--top_percentile", "10", "--force_run", "True"])
        assert a.features_root == "/data"
        assert a.videoids == ["vid1", "vid2"]
        assert (a.frame_width, a.step_size, a.window_size,
                a.top_percentile) == (200, 500, 600, 10)
        assert a.force_run == "True"          # string, like the reference
        # reference defaults
        d = build_parser().parse_args(["/data"])
        assert (d.frame_width, d.step_size, d.window_size,
                d.top_percentile, d.force_run) == (129, 300, 300, 5, "False")
        assert d.videoids == []

    def test_visualizer_args_match_reference(self):
        from optical_flow_tpu.cli.visualize_optical_flow import build_parser
        a = build_parser().parse_args(["/v/clip.mp4", "/out", "100", "2000"])
        assert a.video_dir == "/v/clip.mp4"
        assert a.images_path == "/out"
        assert (a.shot_begin, a.shot_end) == (100, 2000)

    def test_done_version_format(self):
        # .done content byte-compatible with the reference
        # (optical_flow.py:152)
        cfg = ExtractorConfig(frame_width=129, step_size=300,
                              window_size=300, top_percentile=5)
        assert cfg.done_version == "20201209\n129\n300\n300\n5"


class TestCorpusRace:
    def test_concurrent_workers_idempotent(self, tmp_path):
        """Two workers racing on overlapping videoids must both succeed and
        converge to valid identical outputs (the .done-file model of the
        reference is last-writer-wins with identical content — SURVEY.md
        section 2e 'poor-man's distributed lock')."""
        import threading
        from optical_flow_tpu.pipeline.extractor import run_corpus

        root = str(tmp_path)
        for vid in ["v0", "v1"]:
            os.makedirs(os.path.join(root, vid, "media"))
            write_synthetic_video(
                os.path.join(root, vid, "media", vid + ".mp4"),
                n_frames=30, h=120, w=160, seed=7)

        errs = []

        def worker():
            try:
                run_corpus(root, ["v0", "v1"], ExtractorConfig())
            except Exception as e:          # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=worker) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        for vid in ["v0", "v1"]:
            csv = os.path.join(root, vid, "opticalflow", vid + ".csv")
            with open(csv) as f:
                line = f.read()
            start, end, mags = line.split("\t")
            assert len(mags.split(" ")) > 0
            done = os.path.join(root, vid, "opticalflow", ".done")
            assert os.path.isfile(done)
        # identical inputs -> both videos produce the same magnitudes
        a = open(os.path.join(root, "v0", "opticalflow", "v0.csv")).read()
        b = open(os.path.join(root, "v1", "opticalflow", "v1.csv")).read()
        assert a == b


class TestVideoWorkers:
    def test_parallel_corpus_matches_sequential(self, tmp_path):
        """video_workers>1 overlaps per-video host work; outputs must be
        byte-identical to the sequential loop, and robust mode must still
        isolate failures per video."""
        from optical_flow_tpu.pipeline.extractor import run_corpus

        seq_root = str(tmp_path / "seq")
        par_root = str(tmp_path / "par")
        vids = ["a1", "b2", "c3"]
        for root in (seq_root, par_root):
            for i, v in enumerate(vids):
                os.makedirs(os.path.join(root, v, "media"))
                write_synthetic_video(
                    os.path.join(root, v, "media", v + ".mp4"),
                    n_frames=25 + 5 * i, h=96, w=128, fps=25.0, seed=i)
            # plus one corrupt video for the robust check
            os.makedirs(os.path.join(root, "bad", "media"))
            with open(os.path.join(root, "bad", "media", "bad.mp4"),
                      "wb") as f:
                f.write(b"junk")

        cfg = ExtractorConfig()
        f_seq = run_corpus(seq_root, vids + ["bad"], cfg, robust=True)
        f_par = run_corpus(par_root, vids + ["bad"], cfg, robust=True,
                           video_workers=3)
        assert f_seq == ["bad"] and f_par == ["bad"]
        for v in vids:
            with open(os.path.join(seq_root, v, "opticalflow",
                                   v + ".csv")) as f:
                seq_csv = f.read()
            with open(os.path.join(par_root, v, "opticalflow",
                                   v + ".csv")) as f:
                assert f.read() == seq_csv, v

    def test_parallel_nonrobust_raises(self, tmp_path):
        from optical_flow_tpu.pipeline.extractor import run_corpus
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "bad", "media"))
        with open(os.path.join(root, "bad", "media", "bad.mp4"), "wb") as f:
            f.write(b"junk")
        with pytest.raises(Exception):
            run_corpus(root, ["bad"], ExtractorConfig(), video_workers=2)


class TestVisualizerChainPath:
    def test_single_device_chain_matches_mesh(self, tmp_path, monkeypatch):
        """The single-device visualizer uses the chained-pair entry (each
        interior frame expanded once); its JPEGs must match the dp-mesh
        path byte-for-byte (same math, different batching)."""
        from optical_flow_tpu.pipeline import extractor
        from optical_flow_tpu.pipeline.visualizer import visualize_shot

        video = str(tmp_path / "clip.mp4")
        write_synthetic_video(video, n_frames=40, h=96, w=128, fps=25.0)
        mesh_out = str(tmp_path / "mesh")
        chain_out = str(tmp_path / "chain")

        assert extractor._dp_mesh() is not None
        n_mesh = visualize_shot(video, mesh_out, 200, 1400)

        monkeypatch.setenv("OFT_DISABLE_MESH", "1")
        extractor._dp_mesh.cache_clear()
        try:
            n_chain = visualize_shot(video, chain_out, 200, 1400)
        finally:
            extractor._dp_mesh.cache_clear()

        assert n_mesh == n_chain > 0
        for name in sorted(os.listdir(mesh_out)):
            with open(os.path.join(mesh_out, name), "rb") as a, \
                 open(os.path.join(chain_out, name), "rb") as b:
                am, bm = a.read(), b.read()
            if am != bm:
                # 1-level pre-encode pixel flips (FMA contraction between
                # the two programs) get locally amplified by the JPEG
                # round-trip; gate on decoded pixels staying near-equal
                # (a real sector/scale bug is 50+ levels over whole areas)
                import cv2
                da = cv2.imread(os.path.join(mesh_out, name)).astype(int)
                db = cv2.imread(os.path.join(chain_out, name)).astype(int)
                d = np.abs(da - db)
                assert d.max() <= 12, f"{name}: max {d.max()}"
                assert (d > 2).mean() < 1e-2, f"{name}: {(d > 2).mean()}"
