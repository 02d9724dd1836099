"""Sharded-IVF gates past toy size (VERDICT r4 #6): 64k+ rows through the
serving actor on an 8-device CPU mesh.

The round-4 dryrun's sharded corpora topped out at 2,048 rows; nothing
validated sharded k-means geometry, per-shard capacity/cmax, or merge
ranking at scale. This script runs the full actor path (Table ->
VsIndexActor(ivf-sharded) -> SPMD build -> ann_many) at
SHARDED_GATE_N (default 65,536) rows with:

  - a >=0.95 recall@10 gate vs exact ground truth,
  - per-shard placed-row counts + cmax capacity accounting,
  - one low-selectivity filtered request (grouped subset-exact terminal),
  - one local-index request (factory falls back to flat, reference
    parity: per-partition sub-indexes, usearch.rs:626-670).

Appends one JSON line to SCALE_RUNS.jsonl (config sharded-gate-<n>k).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/sharded_scale_gate.py
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the TPU relay plugin registers at interpreter start and overrides
# JAX_PLATFORMS=cpu; re-exec without it (same dance as benchkit.scale)
if os.environ.get("JAX_PLATFORMS") == "cpu" and os.environ.get(
    "PALLAS_AXON_POOL_IPS"
):
    env = dict(os.environ)
    for v in ("PALLAS_AXON_POOL_IPS", "TPU_WORKER_HOSTNAMES", "AXON_LOOPBACK_RELAY"):
        env.pop(v, None)
    os.execve(sys.executable, [sys.executable, *sys.argv], env)


async def main() -> dict:
    import jax

    devices = jax.devices()
    n_dev = len(devices)
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev}"

    from vector_store_tpu.core import (
        DbIndexedValue,
        IndexKey,
        PrimaryKey,
        Timestamp,
        Timestamped,
    )
    from vector_store_tpu.core.filters import Restriction
    from vector_store_tpu.db.fake import make_vs_metadata
    from vector_store_tpu.service.vs_index import VsIndexActor
    from vector_store_tpu.table import Table

    n = int(os.environ.get("SHARDED_GATE_N", 65536))
    d = int(os.environ.get("SHARDED_GATE_D", 16))
    k = 10
    nq = 64
    rng = np.random.default_rng(31)
    out: dict = {"config": f"sharded-gate-{n // 1000}k", "n": n, "d": d, "shards": 8}

    # clustered rows (cosine) + a rare filtering value on ~0.2% of rows
    centers = rng.normal(size=(64, d)).astype(np.float32) * 4
    vecs = centers[rng.integers(0, 64, size=n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    fvals = rng.integers(0, 500, size=n)  # value v matches ~n/500 rows

    md = make_vs_metadata(dimensions=d, filtering_columns=("bucket",))
    table = Table(md)
    actor = VsIndexActor(md, table, engine_kind="ivf-sharded", shards=8)
    engine = actor.engine
    assert type(engine).__name__ == "ShardedIvfServingEngine"
    KEY = IndexKey("ks", "idx")

    t0 = time.time()
    ts0 = Timestamp.from_millis(100)
    chunk = 8192
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        rows = [
            (
                PrimaryKey.from_values((lo + j,)),
                (
                    Timestamped(ts0, DbIndexedValue.vector(vecs[lo + j].tolist())),
                    Timestamped(
                        ts0, DbIndexedValue.filtering(int(fvals[lo + j]))
                    ),
                ),
            )
            for j in range(hi - lo)
        ]
        ops = table.upsert_scan(KEY, rows)
        actor._apply_ops_batch(ops)
        print(f"[gate] ingest {hi}/{n} ({time.time() - t0:.0f}s)", flush=True)
    out["ingest_seconds"] = round(time.time() - t0, 1)
    assert engine.size == n, engine.size

    t0 = time.time()
    engine.maintain()  # SPMD k-means + cluster-sharded layout
    out["build_seconds"] = round(time.time() - t0, 1)
    idx = engine._idx
    assert idx.main_vecs is not None, "sharded build did not run"
    out["nlist"] = idx.nlist
    out["cmax"] = idx.cmax

    # per-shard placed rows + capacity accounting (the pos2slot array is
    # row-sharded over the model axis; shard s owns npos/8 positions)
    p2s = np.asarray(idx.main_pos2slot)
    npos = p2s.shape[0]
    seg = npos // 8
    per_shard = [int((p2s[s * seg : (s + 1) * seg] >= 0).sum()) for s in range(8)]
    out["per_shard_rows"] = per_shard
    out["placed_rows"] = int(sum(per_shard))
    out["delta_spill_rows"] = n - out["placed_rows"]
    out["shard_fill_fraction"] = [round(c / seg, 3) for c in per_shard]
    assert sum(per_shard) + idx._delta_next == n, (
        sum(per_shard),
        idx._delta_next,
    )
    # no shard may exceed its capacity, and the spread should be sane
    assert max(per_shard) <= seg
    assert min(per_shard) > 0, per_shard
    print(f"[gate] per-shard rows {per_shard} (cap {seg}/shard)", flush=True)

    actor.start()
    try:
        # recall gate vs exact cosine ground truth
        held = vecs[:nq] + 0.1 * rng.normal(size=(nq, d)).astype(np.float32)
        qn = held / np.linalg.norm(held, axis=1, keepdims=True)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        dist = 1.0 - qn @ vn.T
        gt = np.argsort(dist, axis=1)[:, :k]

        async def recall() -> float:
            res = await actor.ann_many(held, k)
            hits = 0
            for i, row in enumerate(res):
                got = {pk.values()[0] for pk, _ in row}
                hits += len(got & set(gt[i].tolist()))
            return hits / (nq * k)

        t0 = time.time()
        r = await recall()
        while r < 0.95 and idx.nprobe < min(idx.nlist, 256):
            idx.nprobe = min(idx.nprobe * 2, 256)
            r = await recall()
        out["recall_at_10"] = round(r, 4)
        out["nprobe"] = idx.nprobe
        out["recall_gate_passed"] = bool(r >= 0.95)
        out["search_seconds"] = round(time.time() - t0, 1)
        print(f"[gate] recall@10 {r:.4f} @ nprobe {idx.nprobe}", flush=True)
        assert r >= 0.95, r

        # filtered low-selectivity request -> grouped subset-exact terminal
        v = int(fvals[0])
        matches = np.flatnonzero(fvals == v)
        qf = vecs[matches[0]].tolist()
        ex0 = actor._exact_fallbacks
        res = await actor.filtered_ann(qf, [Restriction.eq("bucket", v)], 5)
        got = [pk.values()[0] for pk, _ in res]
        sub = vn[matches]
        qfn = np.asarray(qf) / np.linalg.norm(qf)
        gt_f = matches[np.argsort(1.0 - sub @ qfn)[:5]].tolist()
        out["filtered_matching_rows"] = int(matches.size)
        out["filtered_exact"] = bool(got == gt_f)
        out["filtered_used_terminal"] = bool(actor._exact_fallbacks > ex0)
        print(
            f"[gate] filtered ({matches.size} matches): got {got} gt {gt_f} "
            f"terminal={out['filtered_used_terminal']}",
            flush=True,
        )
        assert got == gt_f, (got, gt_f)
    finally:
        await actor.stop()

    # local-index request: the sharded factory must fall back to flat
    from vector_store_tpu.core.types import DbIndexPartitioning

    md_l = make_vs_metadata(
        dimensions=d,
        partitioning=DbIndexPartitioning.local(("pk",)),
        keyspace="ks",
        index="lidx",
    )
    table_l = Table(md_l)
    actor_l = VsIndexActor(md_l, table_l, engine_kind="ivf-sharded", shards=8)
    assert type(actor_l.engine).__name__ == "FlatDeviceIndex"
    actor_l.start()
    try:
        ops = []
        for i in range(64):
            ops.extend(
                table_l.upsert(
                    IndexKey("ks", "lidx"),
                    PrimaryKey.from_values((i,)),
                    (
                        Timestamped(
                            ts0, DbIndexedValue.vector(vecs[i].tolist())
                        ),
                    ),
                )
            )
        actor_l.apply_operations(ops)
        deadline = time.time() + 60
        while await actor_l.count() < 64:
            assert time.time() < deadline
            await asyncio.sleep(0.05)
        res = await actor_l.filtered_ann(
            vecs[3].tolist(), [Restriction.eq("pk", 3)], 1
        )
        assert res and res[0][0].values()[0] == 3, res
        out["local_fallback_ok"] = True
        print("[gate] local-index request served by flat fallback", flush=True)
    finally:
        await actor_l.stop()

    out["mesh"] = "8-device CPU mesh (xla_force_host_platform_device_count)"
    out["data"] = "synthetic clustered gaussians, cosine; exact host GT"
    return out


if __name__ == "__main__":
    result = asyncio.run(main())
    line = json.dumps(result)
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_RUNS.jsonl"),
        "a",
    ) as f:
        f.write(line + "\n")
