"""Multi-device sharding tests on the 8 virtual CPU devices
(the standard JAX CI trick, SURVEY.md section 4)."""

import jax
import numpy as np
import pytest

from optical_flow_tpu.oracle import smooth_texture_pair
from optical_flow_tpu.models.farneback import calc_flow_batched
from optical_flow_tpu.parallel import (
    make_mesh, shard_pairs, sharded_extract_step, sharded_flow_step,
    shard_videoids,
)
from optical_flow_tpu.utils.config import FarnebackConfig


@pytest.fixture(scope="module")
def batch():
    pairs = [smooth_texture_pair(96, 128, (1, 2), seed=s) for s in range(8)]
    prev = np.stack([p[0] for p in pairs])
    nxt = np.stack([p[1] for p in pairs])
    return prev, nxt


class TestMesh:
    def test_devices_available(self):
        assert len(jax.devices()) == 8

    def test_dp_flow_matches_single_device(self, batch):
        prev, nxt = batch
        mesh = make_mesh(8, 1)
        out = np.asarray(sharded_flow_step(mesh, shard_pairs(mesh, prev),
                                           shard_pairs(mesh, nxt)))
        ref = np.asarray(calc_flow_batched(prev, nxt))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    @pytest.mark.slow
    def test_dp_sp_flow_matches_single_device(self, batch):
        prev, nxt = batch
        mesh = make_mesh(4, 2)   # dp=4, sp=2 (height split)
        out = np.asarray(sharded_flow_step(mesh, shard_pairs(mesh, prev),
                                           shard_pairs(mesh, nxt)))
        ref = np.asarray(calc_flow_batched(prev, nxt))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    @pytest.mark.slow
    def test_extract_step_sums(self, batch):
        # slow: the 4x2 dp-x-sp mesh; sp engages only at 8K-class frames.
        # The pure-dp 8x1 variant below (the production TPU path) stays
        # in the fast suite.
        prev, nxt = batch
        mesh = make_mesh(4, 2)
        sums = np.asarray(sharded_extract_step(
            mesh, shard_pairs(mesh, prev), shard_pairs(mesh, nxt)))
        flow = np.asarray(calc_flow_batched(prev, nxt))
        ref = np.sqrt((flow ** 2).sum(-1)).sum(axis=(-2, -1))
        np.testing.assert_allclose(sums, ref, rtol=1e-4)

    def test_extract_step_sums_pure_dp(self, batch):
        # the dp shard_map formulation (the path that runs the Pallas
        # kernels per shard on TPU backends)
        prev, nxt = batch
        mesh = make_mesh(8, 1)
        sums = np.asarray(sharded_extract_step(
            mesh, shard_pairs(mesh, prev), shard_pairs(mesh, nxt)))
        flow = np.asarray(calc_flow_batched(prev, nxt))
        ref = np.sqrt((flow ** 2).sum(-1)).sum(axis=(-2, -1))
        np.testing.assert_allclose(sums, ref, rtol=1e-4)

    @pytest.mark.slow
    def test_bgr_chain_matches_single_device(self):
        """The multi-chip visualizer path keeps the chained-pair
        optimization: overlapping per-shard sub-chains must reproduce
        calc_flow_bgr_chain_batched exactly (round-2 VERDICT item 3)."""
        from optical_flow_tpu.models.farneback import (
            calc_flow_bgr_chain_batched)
        from optical_flow_tpu.parallel import (chain_shards,
                                               sharded_bgr_chain_step)
        rng = np.random.default_rng(3)
        base = smooth_texture_pair(96, 128, (1, 2), seed=3)[0]
        frames = np.stack([np.roll(base, (i, 2 * i), (0, 1))
                           + rng.integers(0, 2, base.shape).astype(base.dtype)
                           for i in range(10)])        # 9 pairs
        mesh = make_mesh(8, 1)
        nk = chain_shards(frames, 8)                   # k=2, padded tail
        assert nk.shape == (8, 3, 96, 128)
        # shard i's last frame is shard i+1's first (the overlap)
        np.testing.assert_array_equal(np.asarray(nk[0, -1]),
                                      np.asarray(nk[1, 0]))
        out = np.asarray(sharded_bgr_chain_step(mesh, nk))[:9]
        ref = np.asarray(calc_flow_bgr_chain_batched(frames))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.slow
    def test_graft_dryrun(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)
        g.dryrun_multichip(4)


@pytest.mark.slow
class TestMultiHost:
    def test_two_process_distributed_corpus(self, tmp_path):
        """Two real processes, coordinated via jax.distributed (the DCN
        multi-host slot, SURVEY.md 2e): each must take its own corpus
        shard and the whole corpus must complete."""
        import os
        import socket
        import subprocess
        import sys

        from optical_flow_tpu.oracle.synthetic import write_synthetic_video

        root = str(tmp_path / "corpus")
        vids = [f"v{i}" for i in range(4)]
        for v in vids:
            os.makedirs(os.path.join(root, v, "media"))
            write_synthetic_video(os.path.join(root, v, "media", v + ".mp4"),
                                  n_frames=30, h=120, w=160, seed=1)

        child = tmp_path / "child.py"
        child.write_text(
            "import sys\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from optical_flow_tpu.cli.optical_flow import main\n"
            "main(sys.argv[1:])\n")

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env["OFT_COORDINATOR_ADDRESS"] = f"localhost:{port}"
            env["OFT_NUM_PROCESSES"] = "2"
            env["OFT_PROCESS_ID"] = str(pid)
            env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
            procs.append(subprocess.Popen(
                [sys.executable, str(child), root] + vids,
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True))
        outs = [p.communicate(timeout=600) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err
            # each process must have taken exactly its 2-video shard
            assert "Computing optical flow for 2 videos" in err
        for v in vids:
            assert os.path.isfile(
                os.path.join(root, v, "opticalflow", v + ".csv"))
            assert os.path.isfile(
                os.path.join(root, v, "opticalflow", ".done"))


class TestCorpusSharding:
    def test_round_robin_partition(self):
        vids = [f"v{i}" for i in range(10)]
        shards = [shard_videoids(vids, i, 3) for i in range(3)]
        assert sorted(sum(shards, [])) == sorted(vids)
        assert shards[0] == ["v0", "v3", "v6", "v9"]

    def test_bad_args(self):
        with pytest.raises(ValueError):
            shard_videoids(["a"], 2, 2)
        with pytest.raises(ValueError):
            shard_videoids(["a"], 0, 0)


class TestExtractorMeshPath:
    @pytest.mark.slow
    def test_mesh_matches_single_device(self, tmp_path, monkeypatch):
        """The extractor's device step auto-shards over all local devices
        (BASELINE config 5); dp sharding must not change the CSV-visible
        numbers vs the one-device path."""
        import numpy as np
        from optical_flow_tpu.oracle.synthetic import write_synthetic_video
        from optical_flow_tpu.pipeline import extractor
        from optical_flow_tpu.utils.config import ExtractorConfig

        path = str(tmp_path / "clip.mp4")
        write_synthetic_video(path, n_frames=40, h=120, w=160, fps=25.0)
        cfg = ExtractorConfig()

        assert extractor._dp_mesh() is not None   # 8-device test mesh
        mesh_mags, mesh_ts = extractor.extract_video(path, cfg)

        monkeypatch.setenv("OFT_DISABLE_MESH", "1")
        extractor._dp_mesh.cache_clear()
        try:
            assert extractor._dp_mesh() is None
            solo_mags, solo_ts = extractor.extract_video(path, cfg)
        finally:
            extractor._dp_mesh.cache_clear()

        assert mesh_ts == solo_ts
        np.testing.assert_allclose(mesh_mags, solo_mags, rtol=1e-4)
