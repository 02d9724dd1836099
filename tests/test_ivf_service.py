"""IVF engine driven through the full service: auto engine selection,
delegation before the build threshold, a live recluster rebuild scheduled
by the serving actor's maintenance slot, and correct answers throughout.

Covers the reference's engine-default behavior (usearch is the default
serving engine, vs_index/mod.rs:47-68) for the TPU rebuild where `auto`
selects the IVF engine for global float indexes.
"""

import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.core.types import IndexKey
from vector_store_tpu.db.fake import (
    FakeDb,
    FakeIndex,
    FakeTable,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config

RNG = np.random.default_rng(31)
DIMS = 16


async def _wait_serving(client, count, timeout=30.0):
    deadline = asyncio.get_event_loop().time() + timeout
    while True:
        resp = await client.get("/api/v1/indexes/ks/idx/status")
        if resp.status == 200:
            d = await resp.json()
            if d["status"] == "SERVING" and d["count"] == count:
                return
        assert asyncio.get_event_loop().time() < deadline, d
        await asyncio.sleep(0.05)


async def test_auto_engine_is_ivf_and_rebuild_serves(monkeypatch):
    import vector_store_tpu.ops.pallas_scan as ps

    orig = ps.pallas_rank_search

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(ps, "pallas_rank_search", interp)

    n = 1500
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    base = RNG.normal(size=(n, DIMS)).astype(np.float32)
    rows = [vector_row((i,), base[i].tolist(), 100) for i in range(n)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=DIMS), scan=rows))
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        await _wait_serving(client, n)

        entry = service.indexes.get_vs(IndexKey("ks", "idx"))
        actor = entry.actor
        from vector_store_tpu.engine.ivf import IvfDeviceIndex

        assert isinstance(actor.engine, IvfDeviceIndex)
        engine = actor.engine
        # pre-build: delta delegation serves exact answers
        assert engine.main_vecs is None
        resp = await client.post(
            "/api/v1/indexes/ks/idx/ann",
            json={"vector": base[42].tolist(), "limit": 3},
        )
        assert resp.status == 200
        body = await resp.json()
        assert body["primary_keys"]["pk"][0] == 42
        assert body["distances"][0] == pytest.approx(0.0, abs=1e-3)

        # drop the thresholds so the actor's idle maintenance reclusters;
        # force the interpret-mode delta config the engine uses in tests
        engine.min_build = 256
        engine.kmeans_block = 512
        engine.interpret = True
        engine.nprobe = 16
        deadline = asyncio.get_event_loop().time() + 60
        while engine.main_vecs is None:
            assert asyncio.get_event_loop().time() < deadline
            actor._modify_event.set()  # nudge the scheduler
            await asyncio.sleep(0.1)
        assert engine.nlist >= 64

        # post-build: clustered main region serves; self-query still exact
        hits = 0
        for q in (7, 99, 1234):
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={"vector": base[q].tolist(), "limit": 3},
            )
            assert resp.status == 200
            body = await resp.json()
            if body["primary_keys"]["pk"][0] == q:
                hits += 1
                assert body["distances"][0] == pytest.approx(0.0, abs=1e-3)
        assert hits == 3

        # streaming upsert after the build lands in the delta and serves
        dbi = db.db_indexes[("ks", "idx")]
        new_vec = (RNG.normal(size=DIMS) * 10 + 50).astype(np.float32)
        await dbi.push_cdc(vector_row((n,), new_vec.tolist(), 200))
        deadline = asyncio.get_event_loop().time() + 20
        while True:
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={"vector": new_vec.tolist(), "limit": 1},
            )
            body = await resp.json()
            if resp.status == 200 and body["primary_keys"]["pk"] == [n]:
                break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.1)
    finally:
        await client.close()
        await service.stop()


async def test_low_selectivity_filter_uses_exact_escalation(monkeypatch):
    """A filter matching ~0.3% of rows (the reference's selectivity-bucket
    regime) must still return `limit` rows: the actor's oversample steps
    exhaust against the IVF candidate cap and the exact host-mirror
    escalation (search_exact_host) completes the result — with no fresh
    device-program compiles (ADVICE r2: k-escalation compiled new shapes
    and still couldn't exceed the cap)."""
    import vector_store_tpu.ops.pallas_scan as ps

    orig = ps.pallas_rank_search

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(ps, "pallas_rank_search", interp)
    import vector_store_tpu.engine.ivf as ivf_mod

    monkeypatch.setattr(
        ivf_mod.IvfDeviceIndex, "_set_delta_interpret", lambda self: None
    )

    n = 3000
    db = FakeDb()
    db.add_table(
        FakeTable("ks", "tbl", ("pk",), columns={"rare": "int"})
    )
    vecs = RNG.normal(size=(n, DIMS)).astype(np.float32)
    rows = []
    for i in range(n):
        rare = 1 if i % 300 == 0 else 0  # 10 matching rows (~0.33%)
        rows.append(
            vector_row((i,), vecs[i].tolist(), 100, filtering=[(100, rare)])
        )
    md = make_vs_metadata(dimensions=DIMS, filtering_columns=("rare",))
    db.add_index(FakeIndex(metadata=md, scan=rows))
    service = await build_service(
        db, Config(monitor_indexes_interval=0.05, engine_kind="auto")
    )
    # force a small build threshold so IVF clusters at this test size
    entry_wait = asyncio.get_event_loop().time() + 30
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        await _wait_serving(client, n)
        entry = service.indexes.get_vs(("ks", "idx"))
        eng = entry.actor.engine
        # shrink thresholds and cluster NOW so the candidate cap is real
        if hasattr(eng, "min_build"):
            eng.min_build = 1024
            eng.kmeans_block = 1024
            eng.kmeans_iters = 2
            eng.interpret = True
            assert eng.maintain() is True
            eng._warm_queue.clear()
            assert eng.main_vecs is not None
        resp = await client.post(
            "/api/v1/indexes/ks/idx/ann",
            json={
                "vector": vecs[0].tolist(),
                "limit": 10,
                "filter": {
                    "restrictions": [{"type": "==", "lhs": "rare", "rhs": 1}],
                    "allow_filtering": True,
                },
            },
        )
        assert resp.status == 200, await resp.text()
        data = await resp.json()
        got = data["primary_keys"]["pk"]
        assert len(got) == 10, got  # ALL matching rows found
        assert all(pk % 300 == 0 for pk in got), got
    finally:
        await client.close()
        await service.stop()


async def test_begin_window_single_upload_matches_per_batch(monkeypatch):
    """The actor's windowed uplink (_begin_window: several dispatch batches
    behind ONE upload_queries transfer) must resolve exactly what the
    normal per-request path resolves."""
    import vector_store_tpu.ops.pallas_scan as ps

    orig = ps.pallas_rank_search

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(ps, "pallas_rank_search", interp)

    n = 600
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    base = RNG.normal(size=(n, DIMS)).astype(np.float32)
    rows = [vector_row((i,), base[i].tolist(), 100) for i in range(n)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=DIMS), scan=rows))
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    server = TestServer(service.app)
    await server.start_server()
    client = TestClient(server)
    try:
        await _wait_serving(client, n)
        entry = service.indexes.get_vs(IndexKey("ks", "idx"))
        actor = entry.actor
        from vector_store_tpu.service.vs_index import _SearchRequest

        loop = asyncio.get_event_loop()
        qs = base[:24] + 0.01 * RNG.normal(size=(24, DIMS)).astype(np.float32)

        ref = [await actor._submit(q, 3, None, None) for q in qs]

        batches = [
            [
                _SearchRequest(qs[i * 8 + j], 3, None, None, loop.create_future())
                for j in range(8)
            ]
            for i in range(3)
        ]
        items = await loop.run_in_executor(None, actor._begin_window, batches)
        assert len(items) == 3
        await loop.run_in_executor(None, actor._collect_batches, items)
        got = [await r.future for b in batches for r in b]
        assert len(got) == len(ref)
        for rres, gres in zip(ref, got):
            assert [pk for pk, _ in rres] == [pk for pk, _ in gres]
            for (_, rd), (_, gd) in zip(rres, gres):
                assert abs(float(rd.value) - float(gd.value)) < 1e-5
    finally:
        await client.close()
        await service.stop()


async def test_rebuild_progresses_under_continuous_query_load(monkeypatch):
    """The sliced rebuild must START and COMPLETE while queries flow
    continuously (VERDICT r4 #1): concurrent-safe slices (kmeans/assign/
    arrays) dispatch alongside live search batches via maintain_pending;
    only the swap slice waits for a drained pipeline. The reference keeps
    searches non-blocking against its build work the same way
    (worker.rs:44-118, vs_index/mod.rs:30-45)."""
    import vector_store_tpu.ops.pallas_scan as ps

    orig = ps.pallas_rank_search

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(ps, "pallas_rank_search", interp)

    n = 1200
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    base = RNG.normal(size=(n, DIMS)).astype(np.float32)
    rows = [vector_row((i,), base[i].tolist(), 100) for i in range(n)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=DIMS), scan=rows))
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        await _wait_serving(client, n)
        entry = service.indexes.get_vs(IndexKey("ks", "idx"))
        actor = entry.actor
        engine = actor.engine
        assert engine.main_vecs is None
        assert engine.maintain_pending() is None  # below min_build

        # continuous query pressure: keep >= 4 ann calls in flight the
        # whole time, so the old idle-gap scheduler would never run
        stop = asyncio.Event()
        answers: list[int] = []

        async def pound(worker: int) -> None:
            i = worker
            while not stop.is_set():
                q = base[i % n]
                res = await actor.ann(q.tolist(), 3)
                assert res, "query returned empty under rebuild"
                answers.append(i % n)
                i += 7
            # one final correctness check per worker
            res = await actor.ann(base[worker].tolist(), 1)
            assert res[0][0].values()[0] == worker

        pounders = [asyncio.create_task(pound(w)) for w in range(4)]
        await asyncio.sleep(0.2)  # load established

        # now make the rebuild due — it must start AND finish under load
        engine.min_build = 256
        engine.kmeans_block = 512
        engine.interpret = True
        engine.nprobe = 16
        deadline = asyncio.get_event_loop().time() + 90
        while engine.main_vecs is None:
            assert asyncio.get_event_loop().time() < deadline, (
                "rebuild never completed under continuous query load; "
                f"maintain_log={list(engine.maintain_log)}"
            )
            await asyncio.sleep(0.05)
        built_at = len(answers)
        assert built_at > 0, "no queries were answered while building"

        stop.set()
        await asyncio.gather(*pounders)
        # the slice log must show the full phase walk
        phases = [p for p, _ in engine.maintain_log]
        for expected in ("start", "kmeans", "assign", "arrays", "swap"):
            assert expected in phases, phases
        # post-build correctness through the service
        resp = await client.post(
            "/api/v1/indexes/ks/idx/ann",
            json={"vector": base[77].tolist(), "limit": 3},
        )
        assert resp.status == 200
        body = await resp.json()
        assert body["primary_keys"]["pk"][0] == 77
    finally:
        await client.close()
        await service.stop()


class TestRebuildFloor:
    def test_own_spill_does_not_retrigger_rebuild(self, monkeypatch):
        """Regression (r5): a rebuild's cluster-overflow spill re-enters the
        delta; when that spill exceeded the rebuild threshold the absolute
        delta-size trigger rebuilt forever (measured: 189 back-to-back 1M
        rebuilds). The trigger must measure growth ABOVE the post-swap
        floor. Forced here with cmax=1: almost every row spills."""
        import vector_store_tpu.engine.ivf as ivf_mod
        from vector_store_tpu.core.types import Quantization, SpaceType
        from vector_store_tpu.engine.ivf import IvfDeviceIndex

        # capacity nlist*cmax = 2*128 = 256 < 512 rows -> half the rows spill
        monkeypatch.setattr(ivf_mod, "choose_cmax", lambda n, nlist, h: 128)
        monkeypatch.setattr(ivf_mod, "choose_nlist", lambda n: 2)
        rng = np.random.default_rng(4)
        n, d = 512, 8
        idx = IvfDeviceIndex(
            d,
            space_type=SpaceType.EUCLIDEAN,
            quantization=Quantization.BF16,
            initial_capacity=2048,
            min_build=256,
            kmeans_block=64,
            kmeans_iters=2,
            rebuild_fraction=0.05,
        )
        idx.interpret = True  # CPU backend: grouped kernel in interpret mode
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        idx.upsert_batch(
            np.arange(n, dtype=np.int64), np.zeros(n, np.int32), vecs
        )
        assert idx._should_rebuild()
        idx.maintain()  # full build; ~half the rows spill back to delta
        while idx._warm_queue:
            idx.maintain(budget=1)
        assert idx.main_vecs is not None
        spill = idx._rebuild_floor
        assert spill > int(0.05 * n) + 64, spill  # spill >> threshold
        # the bug: this returned True forever; the floor must gate it
        assert not idx._should_rebuild()
        assert not idx.maintain(budget=1)
        # genuinely NEW churn above the floor still triggers a rebuild
        extra = rng.normal(size=(128, d)).astype(np.float32)
        idx.upsert_batch(
            np.arange(n, n + 128, dtype=np.int64),
            np.zeros(128, np.int32),
            extra,
        )
        assert idx._should_rebuild()
        # search correctness with the spill serving from the delta
        res = idx.search(vecs[:4], 3)
        assert [r.slots[0] for r in res] == [0, 1, 2, 3]
