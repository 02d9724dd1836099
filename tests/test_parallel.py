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


class TestShardedIvf:
    def test_build_and_search(self, mesh8):
        from vector_store_tpu.parallel.ivf_sharded import ShardedIvfIndex

        n, d, b, k = 4096, 32, 16, 10
        rng = np.random.default_rng(3)
        centers = rng.normal(size=(64, d)).astype(np.float32) * 4
        vecs = centers[rng.integers(0, 64, size=n)] + rng.normal(
            size=(n, d)
        ).astype(np.float32)
        idx = ShardedIvfIndex(
            mesh8,
            d,
            space_type=SpaceType.EUCLIDEAN,
            quantization=Quantization.F32,
            nprobe=16,
            kmeans_iters=4,
            interpret=True,
        )
        idx.upsert_batch(np.arange(n), np.full(n, 4, np.int32), vecs)
        idx.build()
        assert idx.nlist % mesh8.shape["model"] == 0
        queries = vecs[rng.integers(0, n, size=b)] + 0.05 * rng.normal(
            size=(b, d)
        ).astype(np.float32)
        dist, slot, epochs = idx.search(queries, k)
        hits = 0
        for row in range(b):
            want = set(
                np.argsort(((queries[row] - vecs) ** 2).sum(-1))[:k].tolist()
            )
            hits += len(want & set(slot[row].tolist()))
        assert hits / (b * k) >= 0.8, hits / (b * k)
        assert (epochs[slot >= 0] == 4).all()
        assert (np.diff(dist, axis=1) >= -1e-5).all()

    def test_post_build_upsert_and_remove(self, mesh8):
        from vector_store_tpu.parallel.ivf_sharded import ShardedIvfIndex

        n, d = 2048, 32
        rng = np.random.default_rng(5)
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        idx = ShardedIvfIndex(
            mesh8,
            d,
            space_type=SpaceType.EUCLIDEAN,
            quantization=Quantization.F32,
            nprobe=64,
            kmeans_iters=3,
            interpret=True,
        )
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        idx.build()
        # new vector after the build -> delta, findable
        new = np.full((1, d), 30.0, np.float32)
        idx.upsert_batch(np.asarray([n]), np.asarray([7]), new)
        dist, slot, epochs = idx.search(new, 3)
        assert slot[0, 0] == n and epochs[0, 0] == 7
        assert dist[0, 0] == pytest.approx(0.0, abs=1e-2)
        # removal from main region
        dist, slot, _ = idx.search(vecs[11:12], 3)
        assert slot[0, 0] == 11
        idx.remove_batch(np.asarray([11]))
        dist, slot, _ = idx.search(vecs[11:12], 3)
        assert 11 not in slot[0]
