"""Diagnose the graph-at-1M recall collapse (SCALE_RUNS: 0.0871 @ ef 512).

Hypothesis: at ~2000 rows/cluster the exact-kNN candidates live in a thin
intra-cluster shell where the alpha rule dominates nothing, so the nearest
`degree` candidates fill every slot and ZERO random bridges survive ->
cluster islands. At 131k/512 centers (~256 rows/cluster) the kNN spread is
wide enough that the alpha rule frees tail slots, which is why the r3
131k validation passed while 1M failed.

Repro: same row count as the passing validation (131k) but 64 centers,
matching the 1M run's per-cluster density. Reports recall@10, cross-cluster
edge fraction, and BFS reachability from the entry set.

Usage: python scripts/graph_diag.py [n] [n_centers]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vector_store_tpu.benchkit import synth
from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.engine.graph import GraphDeviceIndex
from vector_store_tpu.run import _enable_jax_compile_cache


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    n_centers = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    d = 128
    seed = 77
    k, nq = 10, 256
    _enable_jax_compile_cache()
    rng = np.random.default_rng(7)

    index = GraphDeviceIndex(
        d,
        space_type=SpaceType.EUCLIDEAN,
        quantization=Quantization.BF16,
        initial_capacity=n + 1024,
    )
    all_vecs = np.empty((n, d), dtype=np.float32)
    t0 = time.time()
    for lo in range(0, n, 65536):
        hi = min(lo + 65536, n)
        rows_host = synth.synth_rows_np(seed, lo, hi, d, n_centers)
        rows_dev = synth.synth_rows_jax(seed, lo, hi, d, n_centers)
        all_vecs[lo:hi] = rows_host
        index.upsert_bulk_device(lo, hi, rows_dev, rows_host)
    built = index.bulk_build_device()
    print(f"built {built} nodes in {time.time() - t0:.1f}s", flush=True)

    # --- adjacency structure ------------------------------------------------
    adj = np.asarray(index.adjacency)[:n]
    assign = synth.synth_assign_np(seed, 0, n, n_centers)
    valid_e = adj >= 0
    same = np.zeros_like(valid_e)
    safe = np.maximum(adj, 0)
    same[valid_e] = (assign[safe] == assign[:, None])[valid_e]
    deg = valid_e.sum(1)
    cross = (valid_e & ~same).sum()
    print(
        f"deg mean {deg.mean():.1f} min {deg.min()} | "
        f"cross-cluster edges {cross} / {valid_e.sum()} "
        f"({cross / max(valid_e.sum(), 1):.4f}) | "
        f"nodes with >=1 cross edge: {((valid_e & ~same).sum(1) > 0).mean():.4f}",
        flush=True,
    )

    # --- BFS reachability from entries --------------------------------------
    seen = np.zeros(n, dtype=bool)
    frontier = np.asarray([e for e in index._entries if e < n], dtype=np.int64)
    seen[frontier] = True
    while frontier.size:
        nxt = adj[frontier].reshape(-1)
        nxt = nxt[nxt >= 0]
        nxt = np.unique(nxt)
        nxt = nxt[~seen[nxt]]
        seen[nxt] = True
        frontier = nxt
    print(f"reachable from entries: {seen.sum()}/{n} ({seen.mean():.4f})", flush=True)

    # --- recall -------------------------------------------------------------
    held = all_vecs[:nq] + synth.embedding_sigma(d, 0.1) * rng.normal(
        size=(nq, d)
    ).astype(np.float32)
    q2 = (held**2).sum(-1)
    best_d = np.full((nq, 0), np.inf, dtype=np.float32)
    best_i = np.zeros((nq, 0), dtype=np.int64)
    for lo in range(0, n, 500_000):
        hi = min(lo + 500_000, n)
        blk = all_vecs[lo:hi]
        dist = q2[:, None] + (blk**2).sum(-1)[None, :] - 2.0 * held @ blk.T
        top = np.argpartition(dist, k, axis=1)[:, :k]
        best_d = np.concatenate([best_d, np.take_along_axis(dist, top, axis=1)], axis=1)
        best_i = np.concatenate([best_i, top + lo], axis=1)
    gt = np.take_along_axis(best_i, np.argsort(best_d, axis=1)[:, :k], axis=1)

    for ef in (64, 256):
        got = index.search(held, k, expansion=ef)
        rec = float(
            np.mean(
                [
                    len(set(r.slots.tolist()) & set(gt[i].tolist())) / k
                    for i, r in enumerate(got)
                ]
            )
        )
        print(f"recall@10 {rec:.4f} @ ef {ef}", flush=True)


if __name__ == "__main__":
    main()
