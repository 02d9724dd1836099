"""Device-side bulk ingest: twin generators + upsert_bulk_device.

The scale harness (benchkit/scale.py) ingests synthetic rows generated
ON DEVICE (benchkit/synth.py twins), shipping only scalars over the
host link. These tests pin the two contracts that path relies on:
(1) the host and device generators produce the same rows, and (2) an
index bulk-loaded from the device twin serves the same results as one
built through the ordinary host upsert path.

Reference analog: the benchmark crate's bulk dataset load + add loop
(crates/benchmark/src/data/mod.rs:26-107, usearch.rs:442-443).
"""

import numpy as np
import pytest

from vector_store_tpu.benchkit import synth
from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.engine.flat import FlatDeviceIndex
from vector_store_tpu.engine.ivf import IvfDeviceIndex


def test_synth_twins_agree():
    host = synth.synth_rows_np(7, 100, 612, 64, 32)
    dev = np.asarray(synth.synth_rows_jax(7, 100, 612, 64, 32))
    assert host.shape == dev.shape == (512, 64)
    np.testing.assert_allclose(host, dev, atol=1e-6, rtol=1e-6)
    # clustered: rows sharing an assignment are near their center
    assign = synth.synth_assign_np(7, 100, 612, 32)
    assert len(np.unique(assign)) > 16


def test_synth_chunks_are_consistent():
    whole = synth.synth_rows_np(3, 0, 400, 16, 8)
    parts = np.concatenate(
        [synth.synth_rows_np(3, lo, lo + 100, 16, 8) for lo in (0, 100, 200, 300)]
    )
    np.testing.assert_array_equal(whole, parts)


@pytest.mark.parametrize(
    "space,quant",
    [
        (SpaceType.COSINE, Quantization.BF16),
        (SpaceType.EUCLIDEAN, Quantization.F32),
        (SpaceType.COSINE, Quantization.I8),
        (SpaceType.DOT_PRODUCT, Quantization.F16),
    ],
)
def test_flat_bulk_matches_host_upsert(space, quant):
    n, d, k = 600, 48, 10
    rows_host = synth.synth_rows_np(11, 0, n, d, 16)
    rows_dev = synth.synth_rows_jax(11, 0, n, d, 16)
    queries = rows_host[:32] + 0.05

    ref = FlatDeviceIndex(d, space_type=space, quantization=quant,
                          initial_capacity=n)
    ref.upsert_batch(np.arange(n), np.zeros(n, np.int32), rows_host)

    bulk = FlatDeviceIndex(d, space_type=space, quantization=quant,
                           initial_capacity=n)
    bulk.upsert_bulk_device(0, n, rows_dev, rows_host)

    assert bulk.size == ref.size == n
    r_ref = ref.search(queries, k)
    r_blk = bulk.search(queries, k)
    for a, b in zip(r_ref, r_blk):
        # identical rows up to f32 generator rounding -> identical top-k
        # sets except at quantization-rounding ties; compare by distance
        np.testing.assert_allclose(
            np.sort(a.distances), np.sort(b.distances), atol=2e-3
        )
    overlap = np.mean(
        [
            len(set(a.slots.tolist()) & set(b.slots.tolist())) / k
            for a, b in zip(r_ref, r_blk)
        ]
    )
    assert overlap >= 0.9


def test_flat_bulk_rejects_occupied_slots():
    d = 16
    idx = FlatDeviceIndex(d, space_type=SpaceType.COSINE,
                          quantization=Quantization.BF16, initial_capacity=64)
    idx.upsert_batch(np.array([3]), np.array([0]),
                     np.ones((1, d), np.float32))
    with pytest.raises(ValueError, match="fresh slots"):
        idx.upsert_bulk_device(
            0, 8, synth.synth_rows_jax(1, 0, 8, d, 4),
            synth.synth_rows_np(1, 0, 8, d, 4),
        )


def test_flat_bulk_with_partitions():
    n, d = 128, 16
    rows_host = synth.synth_rows_np(5, 0, n, d, 4)
    rows_dev = synth.synth_rows_jax(5, 0, n, d, 4)
    parts = np.arange(n) % 3
    idx = FlatDeviceIndex(d, space_type=SpaceType.COSINE,
                          quantization=Quantization.BF16, initial_capacity=n)
    idx.upsert_bulk_device(0, n, rows_dev, rows_host, partitions=parts)
    res = idx.search(
        rows_host[:8], k=5, partitions=np.full((8,), 1, np.int32)
    )
    for r in res:
        assert all(int(s) % 3 == 1 for s in r.slots)


def test_ivf_bulk_serves_and_rebuilds():
    n, d, k = 2048, 32, 10
    rows_host = synth.synth_rows_np(23, 0, n, d, 24)
    rows_dev = synth.synth_rows_jax(23, 0, n, d, 24)
    queries = rows_host[:64]

    idx = IvfDeviceIndex(d, space_type=SpaceType.COSINE,
                         quantization=Quantization.BF16,
                         initial_capacity=n, min_build=1024, nprobe=8)
    idx.upsert_bulk_device(0, n, rows_dev, rows_host)
    assert idx.size == n

    # exact ground truth on normalized rows
    norm = rows_host / np.linalg.norm(rows_host, axis=-1, keepdims=True)
    qn = norm[:64]
    gt = np.argsort(1.0 - qn @ norm.T, axis=1)[:, :k]

    # pre-rebuild: everything serves from the delta (exact-ish)
    res = idx.search(queries, k)
    recall = np.mean(
        [len(set(r.slots.tolist()) & set(gt[i].tolist())) / k
         for i, r in enumerate(res)]
    )
    assert recall >= 0.95

    # rebuild moves the block into the clustered main region
    while idx.maintain():
        pass
    assert idx.main_rows() > 0 if hasattr(idx, "main_rows") else True
    res = idx.search(queries, k)
    recall = np.mean(
        [len(set(r.slots.tolist()) & set(gt[i].tolist())) / k
         for i, r in enumerate(res)]
    )
    assert recall >= 0.9

    # post-rebuild mutation on top of the bulk block still works
    idx.upsert_batch(np.array([n + 1]), np.array([1]),
                     rows_host[:1] * 0.5)
    assert idx.size == n + 1


def test_graph_device_bulk_build_matches_host():
    from vector_store_tpu.engine.graph import GraphDeviceIndex

    n, d, k = 2048, 32, 10
    rows_host = synth.synth_rows_np(42, 0, n, d, 24)
    rows_dev = synth.synth_rows_jax(42, 0, n, d, 24)
    norm = rows_host / np.linalg.norm(rows_host, axis=-1, keepdims=True)
    gt = np.argsort(1.0 - norm[:64] @ norm.T, axis=1)[:, :k]

    def build(device):
        idx = GraphDeviceIndex(
            d, space_type=SpaceType.COSINE, quantization=Quantization.BF16,
            initial_capacity=n,
        )
        idx.upsert_bulk_device(0, n, rows_dev, rows_host)
        (idx.bulk_build_device if device else idx.bulk_build)()
        return idx

    def recall(idx):
        res = idx.search(rows_host[:64], k)
        return np.mean(
            [len(set(r.slots.tolist()) & set(gt[i].tolist())) / k
             for i, r in enumerate(res)]
        )

    r_host, r_dev = recall(build(False)), recall(build(True))
    # parity is the contract: the device-chained passes build an
    # equivalent graph (absolute recall here is a property of tight
    # near-duplicate clusters at the default beam width, not the build)
    assert r_dev >= r_host - 0.05, (r_dev, r_host)
    assert r_dev >= 0.7, r_dev

    # no duplicate edges (the forced back-link pass guards membership)
    import jax as _jax

    idx = build(True)
    adj = np.asarray(_jax.device_get(idx.adjacency))[:n]
    dups = sum(
        len(adj[i][adj[i] >= 0]) - len(set(adj[i][adj[i] >= 0]))
        for i in range(n)
    )
    assert dups == 0


def test_ivf_high_dim_oversample_contract():
    """Float storage at >=512 dims fetches 2x ids; results still honor k
    and arrive in exact-rescored (strictly sorted) order."""
    n, d, k = 3072, 512, 10
    rows_host = synth.synth_rows_np(31, 0, n, d, 16)
    rows_dev = synth.synth_rows_jax(31, 0, n, d, 16)
    idx = IvfDeviceIndex(d, space_type=SpaceType.COSINE,
                         quantization=Quantization.BF16,
                         initial_capacity=n, min_build=1024, nprobe=8,
                         interpret=True)
    assert idx.oversample == 2
    idx.upsert_bulk_device(0, n, rows_dev, rows_host)
    while idx.maintain():
        pass
    res = idx.search(rows_host[:32], k)
    norm = rows_host / np.linalg.norm(rows_host, axis=-1, keepdims=True)
    gt = np.argsort(1.0 - norm[:32] @ norm.T, axis=1)[:, :k]
    recall = np.mean(
        [len(set(r.slots.tolist()) & set(gt[i].tolist())) / k
         for i, r in enumerate(res)]
    )
    for r in res:
        assert len(r.slots) <= k
        assert np.all(np.diff(r.distances) >= -1e-6)
    assert recall >= 0.95, recall


def test_ivf_bulk_rejects_overlap():
    d = 16
    idx = IvfDeviceIndex(d, space_type=SpaceType.COSINE,
                         quantization=Quantization.BF16, initial_capacity=64)
    idx.upsert_batch(np.array([2]), np.array([0]), np.ones((1, d), np.float32))
    with pytest.raises(ValueError):
        idx.upsert_bulk_device(
            0, 8, synth.synth_rows_jax(1, 0, 8, d, 4),
            synth.synth_rows_np(1, 0, 8, d, 4),
        )
