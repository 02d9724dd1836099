"""Benchmark suite covering the BASELINE.md configurations beyond the
headline SIFT-1M run (bench.py):

  2. GloVe-like: 1.2M x 100-d angular (cosine), recall@10 sweep over
     graph ef_search
  3. DBpedia-like: 1M x 1536-d, bf16 + i8 quantized, recall@10
  4. saturation: concurrent pipelined query load at fixed recall

Each command prints one JSON line. Sizes are env-tunable so smoke runs fit
in CI (SUITE_N, SUITE_BATCH).

Usage: python -m vector_store_tpu.benchkit.suite <cosine-sweep|quantized-highdim|saturation>
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _data(n, d, rng, clusters=256):
    centers = rng.normal(size=(clusters, d)).astype(np.float32) * 4
    out = centers[rng.integers(0, clusters, size=n)] + rng.normal(
        size=(n, d)
    ).astype(np.float32)
    return out


def _gt_cosine(queries, vecs, k, chunk=250_000):
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    best_d = np.full((len(queries), 0), np.inf, dtype=np.float32)
    best_i = np.zeros((len(queries), 0), dtype=np.int64)
    for lo in range(0, len(vecs), chunk):
        block = vecs[lo : lo + chunk]
        bn = block / np.linalg.norm(block, axis=1, keepdims=True)
        dist = 1.0 - qn @ bn.T
        top = np.argpartition(dist, min(k, dist.shape[1] - 1), axis=1)[:, :k]
        best_d = np.concatenate([best_d, np.take_along_axis(dist, top, axis=1)], axis=1)
        best_i = np.concatenate([best_i, top + lo], axis=1)
    order = np.argsort(best_d, axis=1)[:, :k]
    return np.take_along_axis(best_i, order, axis=1)


def _recall(results, gt, k):
    return float(
        np.mean([len(set(r.slots.tolist()) & set(gt[i])) / k for i, r in enumerate(results)])
    )


def cosine_sweep() -> dict:
    """Graph engine recall@10 vs ef_search on angular data (config 2)."""
    from vector_store_tpu.core.types import Quantization, SpaceType
    from vector_store_tpu.engine import GraphDeviceIndex

    n = int(os.environ.get("SUITE_N", 200_000))
    d = 100
    k = 10
    rng = np.random.default_rng(2)
    vecs = _data(n, d, rng)
    queries = _data(64, d, rng)
    gt = _gt_cosine(queries, vecs, k)

    idx = GraphDeviceIndex(
        d,
        space_type=SpaceType.COSINE,
        quantization=Quantization.BF16,
        connectivity=16,
        expansion_add=64,
        initial_capacity=n,
    )
    t0 = time.time()
    step = 8192
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        idx.upsert_batch(np.arange(lo, hi), np.zeros(hi - lo, np.int32), vecs[lo:hi])
        idx.merge_delta(max_batch=4096)
    while idx.merge_delta(max_batch=4096):
        pass
    build_s = time.time() - t0

    sweep = {}
    for ef in (32, 64, 128, 256):
        t0 = time.time()
        res = idx.search(queries, k, expansion=ef)
        dt = time.time() - t0
        sweep[str(ef)] = {
            "recall_at_10": round(_recall(res, gt, k), 4),
            "batch_ms": round(dt * 1e3, 1),
        }
    return {
        "config": "glove-like cosine sweep",
        "n": n,
        "dims": d,
        "build_seconds": round(build_s, 1),
        "build_vectors_per_sec": round(n / build_s, 0),
        "ef_sweep": sweep,
    }


def quantized_highdim() -> dict:
    """bf16 vs i8 recall on 1536-d embeddings (config 3)."""
    from vector_store_tpu.core.types import Quantization, SpaceType
    from vector_store_tpu.engine import FlatDeviceIndex

    n = int(os.environ.get("SUITE_N", 100_000))
    d = 1536
    k = 10
    rng = np.random.default_rng(3)
    vecs = _data(n, d, rng, clusters=128)
    queries = _data(64, d, rng, clusters=128)
    gt = _gt_cosine(queries, vecs, k, chunk=50_000)

    out = {"config": "dbpedia-like 1536-d quantized", "n": n, "dims": d}
    for quant in (Quantization.BF16, Quantization.I8):
        idx = FlatDeviceIndex(
            d,
            space_type=SpaceType.COSINE,
            quantization=quant,
            initial_capacity=n,
            block_rows=16384,
            approx=True,
        )
        step = 50_000
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            idx.upsert_batch(np.arange(lo, hi), np.zeros(hi - lo, np.int32), vecs[lo:hi])
        res = idx.search(queries, k)
        out[quant.value.lower()] = {"recall_at_10": round(_recall(res, gt, k), 4)}
    return out


def saturation() -> dict:
    """Pipelined throughput at fixed recall (config 4 shape)."""
    from vector_store_tpu.core.types import Quantization, SpaceType
    from vector_store_tpu.engine import FlatDeviceIndex

    n = int(os.environ.get("SUITE_N", 500_000))
    d = 96
    k = 10
    batch = int(os.environ.get("SUITE_BATCH", 2048))
    rng = np.random.default_rng(4)
    idx = FlatDeviceIndex(
        d,
        space_type=SpaceType.EUCLIDEAN,
        quantization=Quantization.BF16,
        initial_capacity=n,
        block_rows=65536,
        approx=True,
    )
    step = 125_000
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        idx.upsert_batch(
            np.arange(lo, hi), np.zeros(hi - lo, np.int32), _data(hi - lo, d, rng)
        )
    queries = _data(batch, d, rng)
    idx.search(queries, k)
    iters = 15
    t0 = time.time()
    prev = None
    for _ in range(iters):
        pend = idx.search_begin(queries, k)
        if prev is not None:
            idx.search_collect(prev)
        prev = pend
    idx.search_collect(prev)
    dt = time.time() - t0
    return {
        "config": "deep-like saturation",
        "n": n,
        "dims": d,
        "batch": batch,
        "qps": round(batch * iters / dt, 0),
        "batch_ms": round(dt / iters * 1e3, 2),
    }


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "cosine-sweep"
    fn = {
        "cosine-sweep": cosine_sweep,
        "quantized-highdim": quantized_highdim,
        "saturation": saturation,
    }[cmd]
    print(json.dumps(fn()))


if __name__ == "__main__":
    main()
