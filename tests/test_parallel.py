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

    def test_dp_sp_flow_matches_single_device(self, batch):
        prev, nxt = batch
        mesh = make_mesh(4, 2)   # dp=4, sp=2 (height split)
        out = np.asarray(sharded_flow_step(mesh, shard_pairs(mesh, prev),
                                           shard_pairs(mesh, nxt)))
        ref = np.asarray(calc_flow_batched(prev, nxt))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_extract_step_sums(self, batch):
        prev, nxt = batch
        mesh = make_mesh(4, 2)
        sums = np.asarray(sharded_extract_step(
            mesh, shard_pairs(mesh, prev), shard_pairs(mesh, nxt)))
        flow = np.asarray(calc_flow_batched(prev, nxt))
        ref = np.sqrt((flow ** 2).sum(-1)).sum(axis=(-2, -1))
        np.testing.assert_allclose(sums, ref, rtol=1e-4)

    def test_graft_dryrun(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)
        g.dryrun_multichip(4)


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
