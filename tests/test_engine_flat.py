"""FlatDeviceIndex behavior: exact recall, upsert/remove/epochs, partitions,
filter masks, capacity growth."""

import numpy as np
import pytest

pytest.importorskip("jax")

from vector_store_tpu.core.types import Quantization, SpaceType  # noqa: E402
from vector_store_tpu.engine import FlatDeviceIndex  # noqa: E402

RNG = np.random.default_rng(7)


def brute_force_l2sq(q, v):
    return ((q[None, :] - v) ** 2).sum(-1)


def make_index(n=500, d=24, **kw):
    kw.setdefault("space_type", SpaceType.EUCLIDEAN)
    kw.setdefault("initial_capacity", 1024)
    kw.setdefault("block_rows", 256)
    idx = FlatDeviceIndex(d, **kw)
    vecs = RNG.normal(size=(n, d)).astype(np.float32)
    idx.upsert_batch(np.arange(n), np.zeros(n, dtype=np.int32), vecs)
    return idx, vecs


class TestExactSearch:
    def test_exact_matches_numpy(self):
        idx, vecs = make_index()
        q = RNG.normal(size=(3, 24)).astype(np.float32)
        res = idx.search(q, k=10)
        for row in range(3):
            want = np.argsort(brute_force_l2sq(q[row], vecs))[:10]
            np.testing.assert_array_equal(np.sort(res[row].slots), np.sort(want))
            np.testing.assert_allclose(
                res[row].distances,
                np.sort(brute_force_l2sq(q[row], vecs))[:10],
                rtol=1e-4,
            )

    def test_cosine(self):
        idx = FlatDeviceIndex(16, space_type=SpaceType.COSINE, block_rows=128, initial_capacity=128)
        vecs = RNG.normal(size=(100, 16)).astype(np.float32)
        idx.upsert_batch(np.arange(100), np.zeros(100, np.int32), vecs)
        q = RNG.normal(size=(1, 16)).astype(np.float32)
        res = idx.search(q, k=5)[0]
        dots = (q[0] @ vecs.T) / (np.linalg.norm(q[0]) * np.linalg.norm(vecs, axis=-1))
        want = np.argsort(1 - dots)[:5]
        np.testing.assert_array_equal(np.sort(res.slots), np.sort(want))

    def test_empty_index(self):
        idx = FlatDeviceIndex(8, initial_capacity=64, block_rows=64)
        res = idx.search(np.zeros((2, 8), np.float32), k=3)
        assert all(r.slots.size == 0 for r in res)

    def test_k_larger_than_live(self):
        idx, _ = make_index(n=4)
        res = idx.search(np.zeros((1, 24), np.float32), k=10)[0]
        assert res.slots.size == 4


class TestMutation:
    def test_remove(self):
        idx, vecs = make_index(n=50)
        q = vecs[7][None, :]
        assert idx.search(q, k=1)[0].slots[0] == 7
        idx.remove_batch(np.array([7]))
        assert idx.search(q, k=1)[0].slots[0] != 7
        assert idx.size == 49

    def test_upsert_overwrites_slot(self):
        idx, vecs = make_index(n=20)
        new_vec = RNG.normal(size=(1, 24)).astype(np.float32) * 100
        idx.upsert_batch(np.array([3]), np.array([5], np.int32), new_vec)
        assert idx.size == 20  # same slot, still 20 live
        res = idx.search(new_vec, k=1)[0]
        assert res.slots[0] == 3
        assert res.epochs[0] == 5  # epoch returned with the hit

    def test_growth(self):
        idx = FlatDeviceIndex(
            8, initial_capacity=64, block_rows=64, reserve_increment=64
        )
        n = 300
        vecs = RNG.normal(size=(n, 8)).astype(np.float32)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        assert idx.capacity >= n
        res = idx.search(vecs[n - 1][None], k=1)[0]
        assert res.slots[0] == n - 1


class TestFiltering:
    def test_partition_mask(self):
        idx = FlatDeviceIndex(8, initial_capacity=128, block_rows=64)
        vecs = RNG.normal(size=(100, 8)).astype(np.float32)
        parts = (np.arange(100) % 4).astype(np.int32)
        idx.upsert_batch(np.arange(100), np.zeros(100, np.int32), vecs, partitions=parts)
        res = idx.search(vecs[2][None], k=10, partitions=np.array([2], np.int32))[0]
        assert np.all(res.slots % 4 == 2)
        # unrestricted (-1) sees all partitions
        res_all = idx.search(vecs[2][None], k=10, partitions=np.array([-1], np.int32))[0]
        assert len(set(res_all.slots % 4)) > 1

    def test_allow_mask(self):
        idx, vecs = make_index(n=100)
        allow = np.zeros(idx.capacity, dtype=bool)
        allow[40:60] = True
        res = idx.search(vecs[5][None], k=10, allow_mask=allow)[0]
        assert np.all((res.slots >= 40) & (res.slots < 60))


@pytest.mark.parametrize(
    "quant", [Quantization.BF16, Quantization.I8, Quantization.B1]
)
def test_quantized_recall(quant):
    """Quantized index must keep recall@10 high on easy clustered data."""
    d = 64
    n = 400
    base = RNG.normal(size=(n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    idx = FlatDeviceIndex(
        d,
        space_type=SpaceType.COSINE,
        quantization=quant,
        initial_capacity=512,
        block_rows=128,
    )
    idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), base)
    q = base[:20] + 0.01 * RNG.normal(size=(20, d)).astype(np.float32)
    res = idx.search(q, k=10)
    dots = q @ base.T
    recall = 0.0
    for row in range(20):
        want = set(np.argsort(-dots[row])[:10])
        got = set(res[row].slots.tolist())
        recall += len(want & got) / 10
    recall /= 20
    # B1 sign-binarization of random gaussians is inherently lossy; the
    # engine's oversample+rescore pass (reference oversampling/rescoring
    # options) recovers most of it — ~0.71 at 4x oversample on this data.
    min_recall = 0.6 if quant is Quantization.B1 else 0.95
    assert recall >= min_recall, f"{quant}: recall {recall}"


class TestDuplicateSlots:
    def test_upsert_duplicates_last_wins(self):
        from vector_store_tpu.core.types import Quantization, SpaceType
        from vector_store_tpu.engine.flat import FlatDeviceIndex

        idx = FlatDeviceIndex(
            8, space_type=SpaceType.EUCLIDEAN, quantization=Quantization.F32
        )
        v1 = np.full((8,), 1.0, np.float32)
        v2 = np.full((8,), 9.0, np.float32)
        idx.upsert_batch(
            np.asarray([5, 5]), np.asarray([1, 2]), np.stack([v1, v2])
        )
        assert idx.size == 1
        res = idx.search(v2[None, :], 1)[0]
        assert res.slots[0] == 5 and res.epochs[0] == 2
        assert res.distances[0] == 0.0
        # duplicate removals decrement once
        idx.remove_batch(np.asarray([5, 5]))
        assert idx.size == 0


class TestPartitionDirectory:
    """O(partition) local search (VERDICT r2 #6): the partition directory
    gathers each query's partition rows instead of masking a full scan."""

    def _mk(self, n=400, d=16, nparts=8):
        idx = FlatDeviceIndex(d, initial_capacity=512, block_rows=64)
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        parts = (np.arange(n) % nparts).astype(np.int32)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs, partitions=parts)
        return idx, vecs, parts

    def test_directory_matches_mask_path(self):
        idx, vecs, parts = self._mk()
        assert idx.part_rows is not None
        q = vecs[10][None]
        res_dir = idx.search(q, k=8, partitions=np.array([2], np.int32))[0]
        # force the mask path for the same query
        idx._part_overflow = True
        res_mask = idx.search(q, k=8, partitions=np.array([2], np.int32))[0]
        idx._part_overflow = False
        assert res_dir.slots.tolist() == res_mask.slots.tolist()
        np.testing.assert_allclose(
            res_dir.distances, res_mask.distances, rtol=1e-5, atol=1e-5
        )

    def test_batch_amortization_crossover(self):
        """Large tables route batches where B*pmax exceeds N to the masked
        scan (it reads the table once for the whole batch); small batches
        keep the O(partition) directory. And the mask path must serve the
        same results the directory does (test_directory_matches_mask_path
        pins value parity)."""
        idx, _, _ = self._mk()
        pmax = idx._part_rows_host.shape[1]
        # small table: always directory
        assert idx._part_directory_wins(2048)
        # large table, small batch: directory (B*pmax << N)
        assert idx._part_directory_wins(8, capacity=1_000_000)
        # large table, batch at the traffic-model crossover (B*pmax = N):
        # STILL directory — measured break-even is ~3x higher
        # (SCALE_RUNS partition-1000k r4: directory wins 1.6x at batch
        # 2048 = 2x the traffic model's crossover)
        assert idx._part_directory_wins(
            (1_000_000 // pmax) + 1, capacity=1_000_000
        )
        # beyond the MEASURED break-even: the masked scan side
        assert not idx._part_directory_wins(
            (3_000_000 // pmax) + 1, capacity=1_000_000
        )

    def test_partition_count_and_moves(self):
        idx, vecs, parts = self._mk(n=100, nparts=4)
        assert idx.partition_count(2) == 25
        # move slot 2 (partition 2) into partition 3
        idx.upsert_batch(
            np.asarray([2]), np.asarray([1], np.int32),
            vecs[2][None], partitions=np.asarray([3], np.int32),
        )
        assert idx.partition_count(2) == 24
        assert idx.partition_count(3) == 26
        res = idx.search(vecs[2][None], k=30, partitions=np.array([3], np.int32))[0]
        assert 2 in res.slots
        res = idx.search(vecs[2][None], k=30, partitions=np.array([2], np.int32))[0]
        assert 2 not in res.slots
        # removal updates counts and search
        idx.remove_batch(np.asarray([2]))
        assert idx.partition_count(3) == 25
        res = idx.search(vecs[2][None], k=30, partitions=np.array([3], np.int32))[0]
        assert 2 not in res.slots

    def test_pmax_growth(self):
        d = 8
        idx = FlatDeviceIndex(d, initial_capacity=512, block_rows=64)
        n = 300  # one partition > _PART_PMAX0=128 -> growth to 512
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        idx.upsert_batch(
            np.arange(n), np.zeros(n, np.int32), vecs,
            partitions=np.zeros(n, np.int32),
        )
        assert idx.part_rows.shape[1] >= n
        assert idx.partition_count(0) == n
        res = idx.search(vecs[7][None], k=5, partitions=np.array([0], np.int32))[0]
        assert res.slots[0] == 7

    def test_overflow_falls_back_to_mask(self, monkeypatch):
        d = 8
        monkeypatch.setattr(FlatDeviceIndex, "_PART_PMAX_CAP", 128)
        idx = FlatDeviceIndex(d, initial_capacity=512, block_rows=64)
        n = 200  # exceeds the capped pmax -> directory disabled
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        idx.upsert_batch(
            np.arange(n), np.zeros(n, np.int32), vecs,
            partitions=np.zeros(n, np.int32),
        )
        assert idx._part_overflow and idx.part_rows is None
        assert idx.partition_count(0) == n  # O(N) fallback count
        res = idx.search(vecs[7][None], k=5, partitions=np.array([0], np.int32))[0]
        assert res.slots[0] == 7  # mask path still serves

    def test_unknown_partition_empty(self):
        idx, vecs, _ = self._mk()
        res = idx.search(vecs[0][None], k=5, partitions=np.array([99], np.int32))[0]
        assert res.slots.size == 0


class TestPartitionKernel:
    """Scalar-prefetch partition kernel path (ops/partition_scan.py) in
    interpret mode: must match the XLA gather path through mutations,
    moves, and geometry growth."""

    def _mk(self, n=400, d=32, nparts=8):
        idx = FlatDeviceIndex(d, initial_capacity=512, block_rows=64)
        idx._part_interpret = True
        # the ids-only kernel path resolves distances from the host mirror
        idx.host_distances = True
        idx._vecs_host = np.zeros((idx.capacity, d), dtype=np.float32)
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        parts = (np.arange(n) % nparts).astype(np.int32)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs, partitions=parts)
        return idx, vecs, parts

    def _compare(self, idx, queries, psel, k=8):
        res_kernel = idx.search(queries, k, partitions=psel)
        assert idx._part_kernel_probed and not idx._part_kernel_failed
        idx._part_interpret = False  # forces the XLA gather path
        res_xla = idx.search(queries, k, partitions=psel)
        idx._part_interpret = True
        for a, b in zip(res_kernel, res_xla):
            # the kernel's group-min fold can drop ONE member of a
            # candidate group holding two true top-k rows (same documented
            # approximation as the flat pallas scan; the serving actor's
            # oversample covers shortfalls) — require exact top-1 and
            # >= k-1 overlap, with matching distances on the overlap
            assert a.slots[0] == b.slots[0], (a.slots, b.slots)
            inter = set(a.slots.tolist()) & set(b.slots.tolist())
            assert len(inter) >= len(b.slots) - 1, (a.slots, b.slots)
            da = {s: d for s, d in zip(a.slots, a.distances)}
            db = {s: d for s, d in zip(b.slots, b.distances)}
            for s in inter:
                np.testing.assert_allclose(da[s], db[s], rtol=1e-4, atol=1e-4)

    def test_kernel_matches_xla_path(self):
        idx, vecs, parts = self._mk()
        assert idx.part_vecs is not None
        q = vecs[10:18]
        self._compare(idx, q, parts[10:18])

    def test_kernel_after_mutations(self):
        idx, vecs, parts = self._mk(n=100, nparts=4)
        # remove, move, and re-add
        idx.remove_batch(np.asarray([8]))
        idx.upsert_batch(
            np.asarray([2]), np.asarray([5], np.int32),
            vecs[2][None], partitions=np.asarray([3], np.int32),
        )
        new = RNG.normal(size=(1, vecs.shape[1])).astype(np.float32)
        idx.upsert_batch(
            np.asarray([100]), np.asarray([1], np.int32),
            new, partitions=np.asarray([0], np.int32),
        )
        q = np.concatenate([vecs[:6], new])
        psel = np.asarray([0, 1, 2, 3, 0, 1, 0], np.int32)
        self._compare(idx, q, psel)
        # the moved slot serves from its NEW partition only
        r = idx.search(vecs[2][None], 30, partitions=np.asarray([3], np.int32))[0]
        assert 2 in r.slots
        r = idx.search(vecs[2][None], 30, partitions=np.asarray([2], np.int32))[0]
        assert 2 not in r.slots

    def test_kernel_after_pmax_growth(self):
        d = 16
        idx = FlatDeviceIndex(d, initial_capacity=1024, block_rows=64)
        idx._part_interpret = True
        idx.host_distances = True
        idx._vecs_host = np.zeros((idx.capacity, d), dtype=np.float32)
        n = 300  # partition 0 outgrows _PART_PMAX0 -> mirror rebuild
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        idx.upsert_batch(
            np.arange(n), np.zeros(n, np.int32), vecs,
            partitions=np.zeros(n, np.int32),
        )
        assert idx.part_vecs.shape[0] == int(np.prod(idx.part_rows.shape))
        self._compare(idx, vecs[5:13], np.zeros(8, np.int32), k=5)


class TestIngestI8:
    def test_i8_staged_ingest_recall(self):
        """i8-staged uplink (VECTOR_STORE_INGEST_I8): rows ship as int8 +
        per-row scale and dequantize to storage on device; search results
        stay correct with exact top-1."""
        n, d = 512, 24
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        a = FlatDeviceIndex(d, initial_capacity=1024, block_rows=64)
        b = FlatDeviceIndex(d, initial_capacity=1024, block_rows=64, ingest_i8=True)
        assert b.ingest_i8
        for idx in (a, b):
            idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        q = vecs[:16] + 0.01 * RNG.normal(size=(16, d)).astype(np.float32)
        ra = a.search(q, 5)
        rb = b.search(q, 5)
        for i, (x, y) in enumerate(zip(ra, rb)):
            assert x.slots[0] == y.slots[0] == i
            # i8 staging perturbs ranking at ~0.4%/component; top-5 overlap
            assert len(set(x.slots.tolist()) & set(y.slots.tolist())) >= 4
