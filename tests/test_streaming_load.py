"""Streaming workload (BASELINE config 5 shape): continuous CDC
upserts + deletes while serving concurrent queries — freshness, correctness,
no deadlocks."""

import asyncio

import numpy as np
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.db.fake import (
    FakeDb,
    FakeIndex,
    FakeTable,
    delete_row,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config

RNG = np.random.default_rng(123)
DIMS = 8


async def test_streaming_upserts_while_querying():
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    base = RNG.normal(size=(50, DIMS)).astype(np.float32)
    rows = [vector_row((i,), base[i].tolist(), 100) for i in range(50)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=DIMS), scan=rows))
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        deadline = asyncio.get_event_loop().time() + 20
        while True:
            resp = await client.get("/api/v1/indexes/ks/idx/status")
            if resp.status == 200:
                d = await resp.json()
                if d["status"] == "SERVING" and d["count"] == 50:
                    break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)

        dbi = db.db_indexes[("ks", "idx")]
        stop = asyncio.Event()
        query_errors = []

        async def querier():
            while not stop.is_set():
                q = RNG.normal(size=DIMS).astype(np.float32)
                resp = await client.post(
                    "/api/v1/indexes/ks/idx/ann",
                    json={"vector": q.tolist(), "limit": 5},
                )
                if resp.status != 200:
                    query_errors.append(await resp.text())
                await asyncio.sleep(0.01)

        async def writer():
            ts = 200
            for i in range(60):
                pk = 100 + i
                vec = RNG.normal(size=DIMS).astype(np.float32)
                await dbi.push_cdc(vector_row((pk,), vec.tolist(), ts))
                ts += 1
                if i % 3 == 0 and i > 0:
                    await dbi.push_cdc(delete_row((100 + i - 1,), ts))
                    ts += 1
                await asyncio.sleep(0.005)

        q_tasks = [asyncio.get_running_loop().create_task(querier()) for _ in range(4)]
        await writer()
        await asyncio.sleep(1.0)
        stop.set()
        await asyncio.gather(*q_tasks)
        assert not query_errors, query_errors[:3]

        # freshness: a late-inserted vector is findable
        late = RNG.normal(size=DIMS).astype(np.float32) * 10
        await dbi.push_cdc(vector_row((999,), late.tolist(), 10_000))
        deadline = asyncio.get_event_loop().time() + 15
        while True:
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={"vector": late.tolist(), "limit": 1},
            )
            data = await resp.json()
            if resp.status == 200 and data["primary_keys"]["pk"] == [999]:
                break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)

        # deleted rows are gone
        counters = await client.get("/api/v1/indexes/ks/idx/status")
        final = await counters.json()
        assert final["count"] > 50  # inserts landed (minus deletes)
    finally:
        await client.close()
        await service.stop()
