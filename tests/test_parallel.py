"""Sharded search over the 8-device virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vector_store_tpu.core.types import Quantization, SpaceType  # noqa: E402
from vector_store_tpu.parallel import ShardedFlatIndex, make_mesh  # noqa: E402

RNG = np.random.default_rng(21)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, data=2)


class TestShardedFlat:
    def test_exact_search_matches_numpy(self, mesh8):
        n, d = 2048, 32
        idx = ShardedFlatIndex(
            mesh8,
            d,
            space_type=SpaceType.EUCLIDEAN,
            capacity=n,
            block_rows=128,
        )
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        queries = RNG.normal(size=(4, d)).astype(np.float32)
        dists, ids, epochs = idx.search(queries, 10)
        for row in range(4):
            want = np.argsort(((queries[row] - vecs) ** 2).sum(-1))[:10]
            np.testing.assert_array_equal(np.sort(ids[row]), np.sort(want))
            assert np.all(epochs[row] == 0)

    def test_cross_shard_results(self, mesh8):
        # targets planted in every shard must all be found
        n, d = 1024, 16
        idx = ShardedFlatIndex(
            mesh8, d, space_type=SpaceType.EUCLIDEAN, capacity=n, block_rows=128
        )
        per_shard = idx.capacity // 4  # model=4
        vecs = RNG.normal(size=(n, d)).astype(np.float32) * 100
        slots = np.arange(n)
        idx.upsert_batch(slots, np.zeros(n, np.int32), vecs)
        # one special near-zero vector per shard
        special = np.arange(4) * per_shard
        idx.upsert_batch(
            special, np.ones(4, np.int32), np.zeros((4, d), np.float32)
        )
        dists, ids, epochs = idx.search(np.zeros((2, d), np.float32), 4)
        np.testing.assert_array_equal(np.sort(ids[0]), special)
        assert np.all(epochs[0] == 1)

    def test_update_epoch_visible(self, mesh8):
        n, d = 512, 16
        idx = ShardedFlatIndex(
            mesh8, d, space_type=SpaceType.EUCLIDEAN, capacity=n, block_rows=64
        )
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        idx.upsert_batch(
            np.array([5]), np.array([3], np.int32), vecs[5][None] * 0.0
        )
        dists, ids, epochs = idx.search(np.zeros((1, d), np.float32), 1)
        assert ids[0, 0] == 5
        assert epochs[0, 0] == 3
