"""Headline benchmark: QPS/chip at recall@10 >= 0.95 on SIFT-1M-shaped data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Method: build a 1M x 128-d index on the real TPU chip (BF16 storage — the
reference's equal-memory quantized configuration), verify recall@10 >= 0.95
against exact f32 ground truth on held-out queries, then measure sustained
query throughput at batch 4096 (the per-batch relay fixed cost of ~120 ms amortizes best there; 8192 tips into bandwidth-bound). The serving engine is the IVF index
(engine/ivf.py): device k-means clusters the rows, then each query batch
scans only its nprobe probed clusters with the grouped fused Pallas kernel
(~nprobe/nlist of the data; BENCH_ENGINE=flat opts back into the exact
fused scan). nprobe is walked up automatically until the recall gate
holds.

Transport: the build environment reaches the chip through a relay whose
host<->device bandwidth fluctuates minute-to-minute (2-96 MB/s, 30-100 ms
fixed cost per transfer). The serving loop minimizes bytes per query —
queries ship as int8 + per-row scale (128 B/query), results return as
[B, k] int32 ids in one stacked transfer per window of BENCH_AGG batches
(40 B/query), with exact f32 distances recomputed host-side — and a
collector thread overlaps each window's result pull with the next
window's dispatch. The JSON reports both the end-to-end number (the
headline) and the compute-side rate.

Data: synthetic clustered Gaussians shaped like SIFT-1M (1M x 128d, 256
clusters); ground truth is exact f32 brute force on the same data. (No
real SIFT fbin files ship in this environment; benchkit loads them when
present.)

vs_baseline: the reference publishes no absolute numbers (BASELINE.md), so
the denominator is a 30k QPS estimate for the Rust/USearch sidecar on the
reference's canonical r7i.xlarge deployment at this recall point — the
">= 10x QPS/chip vs the Rust CPU baseline" goal maps to vs_baseline >= 10.

Env knobs: BENCH_N (default 1_000_000), BENCH_BATCH (4096), BENCH_ITERS
(96), BENCH_AGG (8 batches per aggregated pull), BENCH_ENGINE (ivf|flat),
BENCH_NPROBE (32).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPU_BASELINE_QPS = 30_000.0


def main() -> None:
    import jax

    # persistent XLA/Mosaic compilation cache: first-compiles through this
    # environment's relay cost 20-120s per program shape; cached reloads
    # are ~free, so repeat runs spend their time measuring, not compiling
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/root/.cache/jax_vst"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from vector_store_tpu.core.types import Quantization, SpaceType
    from vector_store_tpu.engine import FlatDeviceIndex
    from vector_store_tpu.engine.ivf import IvfDeviceIndex

    n = int(os.environ.get("BENCH_N", 1_000_000))
    batch = int(os.environ.get("BENCH_BATCH", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 96))
    agg = int(os.environ.get("BENCH_AGG", 8))
    engine_kind = os.environ.get("BENCH_ENGINE", "ivf")
    d = 128
    k = 10
    rng = np.random.default_rng(42)

    # SIFT-1M-shaped synthetic data: 256 clusters in 128d
    centers = rng.normal(size=(256, d)).astype(np.float32) * 4
    assign = rng.integers(0, 256, size=n)
    t_ingest = time.time()
    if engine_kind == "ivf":
        index = IvfDeviceIndex(
            d,
            space_type=SpaceType.EUCLIDEAN,
            quantization=Quantization.BF16,
            initial_capacity=n,
            nprobe=int(os.environ.get("BENCH_NPROBE", 32)),
        )
    else:
        index = FlatDeviceIndex(
            d,
            space_type=SpaceType.EUCLIDEAN,
            quantization=Quantization.BF16,
            initial_capacity=n,
            block_rows=131072,
        )
    chunk = 250_000
    held_out = None
    all_vecs = np.empty((n, d), dtype=np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        vecs = (
            centers[assign[lo:hi]]
            + rng.normal(size=(hi - lo, d)).astype(np.float32)
        )
        all_vecs[lo:hi] = vecs
        if held_out is None:
            held_out = vecs[:512] + 0.1 * rng.normal(size=(512, d)).astype(np.float32)
        index.upsert_batch(np.arange(lo, hi), np.zeros(hi - lo, np.int32), vecs)
    ingest_s = time.time() - t_ingest
    print(f"[bench] ingest {n} rows in {ingest_s:.1f}s", file=sys.stderr, flush=True)
    t_cluster = time.time()
    if hasattr(index, "maintain"):
        index.maintain()  # k-means + cluster-major relayout (device-side)
    cluster_s = time.time() - t_cluster
    build_rate = n / (ingest_s + cluster_s)
    print(f"[bench] cluster {cluster_s:.1f}s", file=sys.stderr, flush=True)

    # recall gate vs exact f32 ground truth (host numpy, blocked)
    q2 = (held_out**2).sum(-1)
    best_d = np.full((held_out.shape[0], 0), np.inf, dtype=np.float32)
    best_i = np.zeros((held_out.shape[0], 0), dtype=np.int64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        block = all_vecs[lo:hi]
        dist = (
            q2[:, None]
            + (block**2).sum(-1)[None, :]
            - 2.0 * held_out @ block.T
        )
        idx_top = np.argpartition(dist, k, axis=1)[:, :k]
        dd = np.take_along_axis(dist, idx_top, axis=1)
        best_d = np.concatenate([best_d, dd], axis=1)
        best_i = np.concatenate([best_i, idx_top + lo], axis=1)
    order = np.argsort(best_d, axis=1)[:, :k]
    gt_ids = np.take_along_axis(best_i, order, axis=1)
    # gate queries padded to the serving batch so the recall sweep reuses
    # the ONE compiled program shape the throughput loop needs (every new
    # (batch, s) shape is a fresh Mosaic+XLA compile through the relay)
    nq = held_out.shape[0]
    reps_pad = max(1, -(-batch // nq))
    gate_queries = np.tile(held_out, (reps_pad, 1))[:batch]

    def calc_recall() -> float:
        got = index.search(gate_queries, k)[:nq]
        return float(
            np.mean(
                [
                    len(set(res.slots) & set(gt_ids[row])) / k
                    for row, res in enumerate(got)
                ]
            )
        )

    recall = calc_recall()
    print(f"[bench] recall {recall:.4f} at nprobe {getattr(index, 'nprobe', '-')}", file=sys.stderr, flush=True)
    # IVF: walk nprobe up until the recall gate holds (the reference's
    # ef_search knob plays the same recall/throughput role)
    while (
        recall < 0.95
        and hasattr(index, "nprobe")
        and index.nprobe < min(max(index.nlist, 1), 512)
    ):
        index.nprobe = min(index.nprobe * 2, 512)
        recall = calc_recall()
        print(f"[bench] recall {recall:.4f} at nprobe {index.nprobe}", file=sys.stderr, flush=True)

    queries = centers[rng.integers(0, 256, size=batch)] + rng.normal(
        size=(batch, d)
    ).astype(np.float32)
    index.search(queries, k)  # warm all shapes

    # burst rate: queue a deep window, then ONE aggregated pull for all of
    # it (block_until_ready alone does not reliably force execution through
    # this environment's relay, so the pull is inside the timer — this is
    # the honest upper bound with maximal pull aggregation)
    reps = 24
    t0 = time.time()
    pends = [index.search_begin(queries, k) for _ in range(reps)]
    index.collect_many(pends)
    compute_qps = batch * reps / (time.time() - t0)
    print(f"[bench] burst_qps {compute_qps:.0f}", file=sys.stderr, flush=True)

    # unloaded latency: one batch dispatched and pulled alone (the e2e
    # loop's p50 below is closed-loop saturation latency — inflight depth
    # times window time — not what a lone request would see)
    rtts = []
    for _ in range(3):
        t0 = time.time()
        index.search_collect(index.search_begin(queries, k))
        rtts.append(time.time() - t0)
    rtt_ms = float(np.median(rtts) * 1e3)
    print(f"[bench] single_batch_rtt {rtt_ms:.0f} ms", file=sys.stderr, flush=True)

    # end-to-end: pipelined begins + aggregated result pulls, with a
    # collector thread so window i's device->host pull overlaps window
    # i+1's dispatch/compute (the relay serializes neither direction
    # against device compute)
    import queue as _queue
    import threading

    def e2e_run(run_iters: int, run_agg: int, max_queued: int = 1):
        """Returns (qps, p50_ms, window_qps_median). max_queued bounds how
        many windows may sit waiting for collection — the knob between
        throughput (deep pipeline) and closed-loop latency."""
        lat: list[float] = []
        window_qps: list[float] = []
        windows: _queue.Queue = _queue.Queue(maxsize=max_queued)
        fail: list[BaseException] = []

        def collector() -> None:
            while True:
                item = windows.get()
                if item is None:
                    return
                if fail:  # keep draining so the producer never blocks
                    continue
                pends, starts, w0 = item
                try:
                    index.collect_many(pends)
                except BaseException as exc:  # surface in the main thread
                    fail.append(exc)
                    continue
                now = time.time()
                lat.extend(now - s for s in starts)
                window_qps.append(batch * len(pends) / (now - w0))

        th = threading.Thread(target=collector, daemon=True)
        th.start()
        t0 = time.time()
        pend: list = []
        starts: list[float] = []
        w0 = time.time()
        for i in range(run_iters):
            pend.append(index.search_begin(queries, k))
            starts.append(time.time())
            if len(pend) >= run_agg:
                windows.put((pend, starts, w0))
                pend, starts = [], []
                w0 = time.time()
        if pend:
            windows.put((pend, starts, w0))
        windows.put(None)
        th.join()
        if fail:
            raise fail[0]
        total = time.time() - t0
        return (
            batch * run_iters / total,
            float(np.percentile(lat, 50) * 1e3),
            float(np.median(window_qps)) if window_qps else None,
        )

    inflight = int(os.environ.get("BENCH_INFLIGHT", 1))
    qps, p50_ms, window_med = e2e_run(iters, agg, max_queued=inflight)

    # bounded-latency operating point: the BASELINE metric is QPS *at* a
    # p50 a user would accept, not saturation throughput. Walk the pipeline
    # depth down and report the best QPS whose measured p50 stays under
    # 500 ms (closed-loop p50 ~ inflight depth x window time).
    bounded_qps = None
    bounded_p50 = None
    bounded_cfg = None
    for cfg_agg in (4, 2, 1):
        q_i, p_i, _ = e2e_run(max(12 * cfg_agg, 12), cfg_agg, max_queued=1)
        print(
            f"[bench] bounded sweep agg={cfg_agg}: {q_i:.0f} qps p50 {p_i:.0f} ms",
            file=sys.stderr,
            flush=True,
        )
        if p_i <= 500.0 and (bounded_qps is None or q_i > bounded_qps):
            bounded_qps, bounded_p50, bounded_cfg = q_i, p_i, cfg_agg
        if p_i <= 250.0:
            break  # deeper configs only raise latency

    # compute-side rate with FORCED execution: chain M dependent searches
    # inside one jitted fori_loop — the single final pull cannot complete
    # until every chained search has executed, so the relay's unreliable
    # block_until_ready is irrelevant and both transfers amortize over M.
    # The data dependency (1e-34 * best-rank added to the queries) is
    # below bf16 resolution: numerically a no-op, structurally un-DCE-able.
    compute_side = None
    if engine_kind == "ivf" and getattr(index, "main_vecs", None) is not None:
        import functools

        import jax
        import jax.numpy as jnp

        from vector_store_tpu.ops.ivf import choose_budget, ivf_candidates

        m_chain = int(os.environ.get("BENCH_COMPUTE_CHAIN", 64))
        qs_dev = index._prep_queries(queries)
        s_budget = choose_budget(
            batch, min(index.nprobe, index.nlist), index.nlist
        )
        q_live = jnp.ones((batch,), jnp.bool_)
        kwargs = dict(
            k=16,
            nprobe=min(index.nprobe, index.nlist),
            s=s_budget,
            cmax=index.cmax,
            spherical=index._spherical,
        )

        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(qs0, vecs, paux, cent, *, m):
            def body(_, q):
                packed, _dropped = ivf_candidates(
                    vecs, paux, cent, q, q_live, **kwargs
                )
                bump = (packed[0, :, :1] * 1e-34).astype(q.dtype)
                return q + bump

            q = jax.lax.fori_loop(0, m, body, qs0)
            packed, _dropped = ivf_candidates(
                vecs, paux, cent, q, q_live, **kwargs
            )
            return packed

        args = (qs_dev, index.main_vecs, index.main_paux, index.centroids)
        np.asarray(chain(*args, m=m_chain))  # compile + warm
        t0 = time.time()
        np.asarray(chain(*args, m=m_chain))  # pull forces all m+1 searches
        dt = time.time() - t0
        compute_side = batch * (m_chain + 1) / dt
        print(
            f"[bench] compute_side_qps {compute_side:.0f} "
            f"({dt * 1e3 / (m_chain + 1):.2f} ms/batch of {batch}, chain {m_chain + 1})",
            file=sys.stderr,
            flush=True,
        )

    result = {
        "metric": "QPS/chip at recall@10>=0.95 on SIFT-1M",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / CPU_BASELINE_QPS, 3),
        "recall_at_10": round(recall, 4),
        "recall_gate_passed": bool(recall >= 0.95),
        "p50_query_latency_ms": round(p50_ms, 2),
        "qps_at_p50_500ms": round(bounded_qps, 1) if bounded_qps else None,
        "p50_at_bounded_ms": round(bounded_p50, 1) if bounded_p50 else None,
        "bounded_agg": bounded_cfg,
        "compute_side_qps": round(compute_side, 1) if compute_side else None,
        "burst_qps_agg24": round(compute_qps, 1),
        "single_batch_rtt_ms": round(rtt_ms, 1),
        "window_qps_median": round(window_med, 1) if window_med else None,
        "build_vectors_per_sec": round(build_rate, 0),
        "ingest_seconds": round(ingest_s, 1),
        "cluster_seconds": round(cluster_s, 1),
        "n_vectors": n,
        "batch": batch,
        "agg_pull_batches": agg,
        "engine": (
            f"ivf-bf16 nlist={index.nlist} nprobe={index.nprobe}"
            if engine_kind == "ivf" and getattr(index, "main_vecs", None) is not None
            else "flat-pallas-fused-bf16"
            if getattr(index, "use_pallas", False)
            else f"{engine_kind}-delta-scan-bf16"
        ),
        "query_uplink": "int8" if getattr(index, "query_i8", False) else "bf16",
        "result_pull": "ids-only-int32",
        "data": "synthetic clustered gaussians (SIFT-1M shape), exact f32 ground truth",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit one JSON line for the driver
        print(
            json.dumps(
                {
                    "metric": "QPS/chip at recall@10>=0.95 on SIFT-1M",
                    "value": 0.0,
                    "unit": "qps",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )
        raise SystemExit(1)
