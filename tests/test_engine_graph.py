"""GraphDeviceIndex: recall vs exact search, streaming delta, merge, removal."""

import numpy as np
import pytest

pytest.importorskip("jax")

from vector_store_tpu.core.types import Quantization, SpaceType  # noqa: E402
from vector_store_tpu.engine import FlatDeviceIndex, GraphDeviceIndex  # noqa: E402

RNG = np.random.default_rng(3)


def build_index(n=2000, d=32, space=SpaceType.EUCLIDEAN, **kw):
    kw.setdefault("initial_capacity", 4096)
    kw.setdefault("connectivity", 8)
    kw.setdefault("expansion_add", 32)
    kw.setdefault("expansion_search", 48)
    idx = GraphDeviceIndex(d, space_type=space, **kw)
    vecs = RNG.normal(size=(n, d)).astype(np.float32)
    idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
    while idx.merge_delta(max_batch=512):
        pass
    return idx, vecs


def recall_at_k(idx, vecs, queries, k=10, **search_kw):
    oracle = FlatDeviceIndex(
        vecs.shape[1], space_type=idx.space_type, initial_capacity=len(vecs)
    )
    oracle.upsert_batch(np.arange(len(vecs)), np.zeros(len(vecs), np.int32), vecs)
    want = oracle.search(queries, k)
    got = idx.search(queries, k, **search_kw)
    total = 0.0
    for w, g in zip(want, got):
        total += len(set(w.slots) & set(g.slots)) / k
    return total / len(queries)


class TestGraphSearch:
    def test_recall(self):
        idx, vecs = build_index()
        queries = RNG.normal(size=(32, 32)).astype(np.float32)
        r = recall_at_k(idx, vecs, queries, k=10)
        assert r >= 0.9, f"recall {r}"
        assert idx.graph_nodes == 2000
        assert idx.delta_count == 0

    def test_self_recall(self):
        idx, vecs = build_index(n=1000)
        res = idx.search(vecs[:16], k=1)
        hits = sum(1 for i, r in enumerate(res) if r.slots.size and r.slots[0] == i)
        assert hits >= 15

    def test_cosine_recall(self):
        idx, vecs = build_index(space=SpaceType.COSINE, n=1500)
        queries = RNG.normal(size=(16, 32)).astype(np.float32)
        r = recall_at_k(idx, vecs, queries, k=10)
        assert r >= 0.85, f"recall {r}"


class TestStreaming:
    def test_delta_searchable_before_merge(self):
        idx, vecs = build_index(n=500)
        new = RNG.normal(size=(10, 32)).astype(np.float32) + 50.0  # far cluster
        idx.upsert_batch(np.arange(500, 510), np.zeros(10, np.int32), new)
        assert idx.delta_count == 10
        res = idx.search(new[3][None], k=1)[0]
        assert res.slots[0] == 503  # found exactly via delta

    def test_merge_moves_delta_to_graph(self):
        idx, vecs = build_index(n=500)
        new = RNG.normal(size=(10, 32)).astype(np.float32) + 50.0
        idx.upsert_batch(np.arange(500, 510), np.zeros(10, np.int32), new)
        merged = idx.merge_delta()
        assert merged == 10
        assert idx.delta_count == 0
        assert idx.graph_nodes == 510
        res = idx.search(new[3][None], k=1, expansion=64)[0]
        assert res.slots.size and res.slots[0] == 503

    def test_remove_tombstones(self):
        idx, vecs = build_index(n=500)
        target = vecs[7][None]
        assert idx.search(target, k=1)[0].slots[0] == 7
        idx.remove_batch(np.array([7]))
        res = idx.search(target, k=1)[0]
        assert res.slots.size == 0 or res.slots[0] != 7

    def test_remove_from_delta(self):
        idx, _ = build_index(n=100)
        new = RNG.normal(size=(5, 32)).astype(np.float32)
        idx.upsert_batch(np.arange(100, 105), np.zeros(5, np.int32), new)
        idx.remove_batch(np.array([102]))
        assert idx.delta_count == 4

    def test_empty_graph_delta_only(self):
        idx = GraphDeviceIndex(16, initial_capacity=256)
        vecs = RNG.normal(size=(20, 16)).astype(np.float32)
        idx.upsert_batch(np.arange(20), np.zeros(20, np.int32), vecs)
        res = idx.search(vecs[4][None], k=3)[0]
        assert res.slots[0] == 4

    def test_empty_index(self):
        idx = GraphDeviceIndex(16, initial_capacity=256)
        res = idx.search(np.zeros((1, 16), np.float32), k=3)[0]
        assert res.slots.size == 0


class TestFilteredGraph:
    def test_allow_mask(self):
        idx, vecs = build_index(n=600)
        allow = np.zeros(idx.capacity, dtype=bool)
        allow[100:200] = True
        res = idx.search(vecs[5][None], k=10, allow_mask=allow)[0]
        assert res.slots.size > 0
        assert np.all((res.slots >= 100) & (res.slots < 200))

    def test_partitions_rejected(self):
        idx, vecs = build_index(n=100)
        with pytest.raises(ValueError):
            idx.search(vecs[:1], k=1, partitions=np.array([0]))


def test_quantized_graph_recall():
    idx, vecs = build_index(n=1000, quantization=Quantization.BF16)
    queries = RNG.normal(size=(16, 32)).astype(np.float32)
    r = recall_at_k(idx, vecs, queries, k=10)
    assert r >= 0.85, f"recall {r}"


class TestCompaction:
    def test_compact_drops_tombstones(self):
        idx, vecs = build_index(n=600)
        removed = np.arange(0, 600, 3)
        idx.remove_batch(removed)
        n_live = idx.compact()
        assert n_live == 400
        assert idx.graph_nodes == 400
        assert idx.delta_count == 0
        # tombstoned ids never come back; live ids still found
        live_id = 1  # 1 % 3 != 0
        res = idx.search(vecs[live_id][None], k=1)[0]
        assert res.slots[0] == live_id
        res = idx.search(vecs[0][None], k=5)[0]
        assert 0 not in res.slots

    def test_compact_then_insert(self):
        idx, vecs = build_index(n=300)
        idx.remove_batch(np.arange(100))
        idx.compact()
        new = RNG.normal(size=(5, 32)).astype(np.float32) + 30
        idx.upsert_batch(np.arange(300, 305), np.zeros(5, np.int32), new)
        idx.merge_delta()
        res = idx.search(new[2][None], k=1, expansion=64)[0]
        assert res.slots[0] == 302


def test_refine_improves_or_keeps_recall():
    idx, vecs = build_index(n=1200)
    queries = RNG.normal(size=(24, 32)).astype(np.float32)
    before = recall_at_k(idx, vecs, queries, k=10)
    idx.refine(max_batch=512)
    after = recall_at_k(idx, vecs, queries, k=10)
    assert after >= before - 0.02, (before, after)
    # graph membership unchanged
    assert idx.graph_nodes == 1200


class TestBulkBuild:
    def test_bulk_build_matches_incremental_quality(self):
        """bulk_build (exact-kNN + global prune + one reverse pass) must
        produce a searchable graph with recall comparable to incremental
        merges."""
        import numpy as np

        from vector_store_tpu.core.types import Quantization, SpaceType
        from vector_store_tpu.engine import GraphDeviceIndex

        rng = np.random.default_rng(5)
        n, d, k = 6000, 16, 10
        vecs = rng.normal(size=(n, d)).astype(np.float32)

        g = GraphDeviceIndex(
            d, space_type=SpaceType.EUCLIDEAN, quantization=Quantization.F32,
            connectivity=8, expansion_add=32, expansion_search=64,
        )
        g.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        merged = g.bulk_build()
        assert merged == n
        assert g.graph_nodes == n
        assert g.delta_count == 0

        queries = vecs[:64] + 0.05 * rng.normal(size=(64, d)).astype(np.float32)
        d2 = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
        gt = np.argsort(d2, axis=1)[:, :k]
        res = g.search(queries, k, expansion=128)
        recall = np.mean([
            len(set(r.slots.tolist()) & set(gt[i].tolist())) / k
            for i, r in enumerate(res)
        ])
        assert recall >= 0.9, recall

    def test_merge_delta_auto_bulk(self, monkeypatch):
        """An empty graph with a large backlog takes the bulk path."""
        import numpy as np

        from vector_store_tpu.core.types import Quantization, SpaceType
        from vector_store_tpu.engine import GraphDeviceIndex

        monkeypatch.setattr(GraphDeviceIndex, "BULK_BUILD_THRESHOLD", 1000)
        rng = np.random.default_rng(6)
        n, d = 1500, 8
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        g = GraphDeviceIndex(
            d, space_type=SpaceType.COSINE, quantization=Quantization.F32,
            connectivity=8, expansion_add=32,
        )
        g.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        merged = g.merge_delta(128)  # small max_batch must not fragment bulk
        assert merged == n
        assert g.graph_nodes == n
        res = g.search(vecs[:4], 3)
        assert res[0].slots[0] == 0


class TestGraphIdsOnlyPull:
    def test_ids_pull_matches_full_pull(self, monkeypatch):
        """With the store's host mirrors active, graph beam results ship as
        [B,k] int32 ids and must match the full dist/id/epoch pull."""
        import vector_store_tpu.ops.pallas_scan as ps

        orig = ps.pallas_rank_search

        def interp(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)

        monkeypatch.setattr(ps, "pallas_rank_search", interp)

        idx, vecs = build_index(n=1024, d=16)
        queries = vecs[:8] + 0.01 * RNG.normal(size=(8, 16)).astype(np.float32)
        base = idx.search(queries, 5)
        assert not idx.store.host_distances  # CPU default: full pulls

        # force the ids-only path: enable the store's host mirror
        st = idx.store
        st.use_pallas = True
        st.pallas_block = 256
        st.block_rows = 256
        st.host_distances = True
        st._vecs_host = np.zeros((st.capacity, st.dimensions), np.float32)
        # rebuild the mirror from the known vectors
        st._vecs_host[: len(vecs)] = vecs
        pend = idx.search_begin(queries, 5)
        assert pend.graph_ids
        got = idx.search_collect(pend)
        for b, g in zip(base, got):
            assert b.slots[0] == g.slots[0]
            assert set(b.slots) == set(g.slots)
            np.testing.assert_allclose(
                np.sort(b.distances), np.sort(g.distances), atol=2e-2
            )
            assert (np.diff(g.distances) >= -1e-6).all()


class TestGraphRescoring:
    """oversampling/rescoring index options on the graph engine
    (quantization_and_rescoring.rs contract, ENGINE=graph): near-tied
    vectors whose spacing i8 quantization destroys must come back in exact
    order with rescoring (oversampled fetch + exact f32 host re-rank) and
    in storage-precision order with rescoring=False."""

    N = 400
    QUERY = np.array([0.5, 0.3, 0.7] + [0.0] * 13, dtype=np.float32)

    def _near_tied(self):
        # reference generate_test_vectors: query + i*0.001*(2,4,8)
        out = np.tile(self.QUERY, (self.N, 1))
        i = np.arange(self.N, dtype=np.float32)[:, None]
        out[:, :3] += i * 0.001 * np.array([2.0, 4.0, 8.0], np.float32)
        return out

    def _built(self, **kw):
        idx = GraphDeviceIndex(
            16,
            space_type=SpaceType.EUCLIDEAN,
            quantization=Quantization.I8,
            initial_capacity=1024,
            connectivity=8,
            expansion_add=32,
            expansion_search=256,
            **kw,
        )
        vecs = self._near_tied()
        order = np.arange(self.N)
        np.random.default_rng(7).shuffle(order)
        idx.upsert_batch(order, np.zeros(self.N, np.int32), vecs[order])
        while idx.merge_delta(max_batch=256):
            pass
        assert idx.graph_nodes == self.N and idx.delta_count == 0
        return idx

    def test_rescoring_restores_exact_order(self):
        idx = self._built(oversample=5, rescoring=True)
        assert idx.oversample == 5 and idx.rescoring
        res = idx.search(self.QUERY[None, :], k=64)[0]
        # k-contract: the 5x oversampled fetch must not leak past k
        assert res.slots.shape[0] <= 64, res.slots.shape
        got = res.slots.tolist()
        assert got == sorted(got), f"exact order expected, got {got[:12]}..."

    def test_rescoring_false_exposes_storage_order(self):
        idx = self._built(rescoring=False)
        assert idx.oversample == 1 and not idx.rescoring
        res = idx.search(self.QUERY[None, :], k=64)[0]
        got = res.slots[:64].tolist()
        assert got != sorted(got), (
            "i8 storage order should collapse the 0.001-step near-ties; "
            "an exactly sorted result means rescoring=False never reached "
            "the beam resolution"
        )

    def test_default_oversample_for_lossy_quant(self):
        idx = self._built()
        assert idx.oversample == 4 and idx.rescoring
