"""Preview-guided graph traversal (engine/graph.py preview_dims):
recall parity with the 2-gather baseline kernel, staleness invalidation on
adjacency writes, and the exact final re-rank.

Reference framing: the reference's HNSW traversal reads full vectors per
hop (usearch C++); the preview kernel is a TPU-latency lever, so its
contract is equal-ranking OUTPUT (exact rescore) with approximate
GUIDANCE.
"""

import numpy as np
import pytest

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.engine.graph import GraphDeviceIndex


def _build(n=3000, d=32, preview_dims=0, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    idx = GraphDeviceIndex(
        d,
        space_type=SpaceType.EUCLIDEAN,
        quantization=Quantization.BF16,
        initial_capacity=n + 64,
        max_delta=256,
        preview_dims=preview_dims,
    )
    idx.upsert_batch(
        np.arange(n, dtype=np.int64),
        np.zeros(n, dtype=np.int32),
        vecs,
    )
    while idx.needs_merge():
        idx.maintain()
    return idx, vecs


def _recall(idx, vecs, k=10, nq=64):
    rng = np.random.default_rng(11)
    qs = vecs[:nq] + 0.05 * rng.normal(size=(nq, vecs.shape[1])).astype(
        np.float32
    )
    d2 = ((qs[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]
    res = idx.search(qs, k)
    hits = 0
    for i, r in enumerate(res):
        hits += len(set(r.slots.tolist()) & set(gt[i].tolist()))
    return hits / (nq * k)


class TestGraphPreview:
    def test_recall_parity_with_baseline(self):
        base, vecs = _build(preview_dims=0)
        prev, _ = _build(preview_dims=32)  # pd == d: exact isometry
        r_base = _recall(base, vecs)
        r_prev = _recall(prev, vecs)
        assert r_base >= 0.9
        # at pd == d the projection is an orthonormal rotation, so preview
        # guidance ranks identically up to bf16 noise; the exact final
        # re-rank must keep output recall at baseline
        assert r_prev >= r_base - 0.02, (r_prev, r_base)

    def test_exact_distances_after_rescore(self):
        idx, vecs = _build(preview_dims=16)
        q = vecs[7]
        res = idx.search(q[None, :], 5)[0]
        # distances must be storage-precision exact (bf16 quantization of
        # the true L2), NOT projected-space distances: the self-match is 0
        assert res.slots[0] == 7
        assert float(res.distances[0]) == pytest.approx(0.0, abs=1e-3)

    def test_adjacency_write_invalidates_previews(self):
        idx, vecs = _build(n=2000, preview_dims=16)
        idx.search(vecs[:4], 5)  # builds the preview table
        assert idx._nbr_prev is not None and not idx._prev_dirty
        n = 2000
        newv = np.random.default_rng(5).normal(size=(64, 32)).astype(np.float32)
        idx.upsert_batch(
            np.arange(n, n + 64, dtype=np.int64),
            np.zeros(64, dtype=np.int32),
            newv,
        )
        while idx.delta_count:
            idx.merge_delta()  # merge writes adjacency rows
        assert idx._prev_dirty
        # new rows reachable through the refreshed previews
        res = idx.search(newv[:2], 3)
        assert res[0].slots[0] == n
        assert not idx._prev_dirty

    def test_i8_storage_disables_preview(self):
        idx = GraphDeviceIndex(
            16,
            space_type=SpaceType.EUCLIDEAN,
            quantization=Quantization.I8,
            initial_capacity=128,
            preview_dims=16,
        )
        assert idx.preview_dims == 0
