"""Validator-equivalent: coexisting_indexes
(crates/validator/src/coexisting_indexes.rs).

The reference creates a vector index, an FTS index, and a secondary index
on ONE table and checks each query form addresses exactly its own index.
The HTTP-surface equivalents: a vector index and an FTS index coexist on
the same table, each route serves from its own engine, both appear in the
index list, and dropping one leaves the other serving.
"""

import asyncio
import math
import uuid as _uuid

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.core.types import (
    DbIndexPartitioning,
    IndexMetadata,
    IndexOptionsFts,
    IndexVersion,
)
from vector_store_tpu.db.fake import (
    FakeDb,
    FakeIndex,
    FakeTable,
    document_row,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config


def fts_metadata(index="fts", table="tbl"):
    return IndexMetadata(
        keyspace_name="ks",
        index_name=index,
        table_name=table,
        primary_key_columns=("pk",),
        partition_key_count=1,
        target_columns=("body",),
        partitioning=DbIndexPartitioning.global_(),
        filtering_columns=(),
        version=IndexVersion(_uuid.uuid1()),
        fts_options=IndexOptionsFts(),
    )


ROWS = [(i, [math.cos(i), math.sin(i), 0.0]) for i in range(6)]
DOCS = ["quick brown fox", "lazy dog", "fox hunts dog", "quiet fox", "dog", "birds"]


async def _wait(client, path, pred, timeout=20.0):
    deadline = asyncio.get_event_loop().time() + timeout
    while True:
        resp = await client.get(path)
        if resp.status == 200 and pred(await resp.json()):
            return
        assert asyncio.get_event_loop().time() < deadline
        await asyncio.sleep(0.05)


async def test_vector_and_fts_coexist_and_drop_independently():
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    vec_rows = [vector_row((pk,), v, 100) for pk, v in ROWS]
    db.add_index(FakeIndex(metadata=make_vs_metadata(index="vec"), scan=vec_rows))
    doc_rows = [document_row((i,), DOCS[i], 100) for i in range(len(DOCS))]
    db.add_index(FakeIndex(metadata=fts_metadata("fts"), scan=doc_rows))

    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        await _wait(
            client,
            "/api/v1/indexes",
            lambda lst: {e["index"] for e in lst} == {"vec", "fts"},
        )
        await _wait(
            client, "/api/v1/indexes/ks/vec/status", lambda s: s["count"] == 6 and s["status"] == "SERVING"
        )
        await _wait(
            client, "/api/v1/indexes/ks/fts/status", lambda s: s["count"] == 6 and s["status"] == "SERVING"
        )

        # ANN addresses ONLY the vector index
        resp = await client.post(
            "/api/v1/indexes/ks/vec/ann",
            json={"vector": ROWS[3][1], "limit": 1},
        )
        assert resp.status == 200
        assert (await resp.json())["primary_keys"]["pk"] == [3]
        # BM25 addresses ONLY the fts index
        resp = await client.post(
            "/api/v1/indexes/ks/fts/bm25",
            json={"query": "fox", "limit": 10},
        )
        assert resp.status == 200
        hits = set((await resp.json())["primary_keys"]["pk"])
        assert hits == {0, 2, 3}
        # cross-addressing is rejected (coexisting_indexes.rs's
        # query_*_rejected cases at the HTTP surface)
        resp = await client.post(
            "/api/v1/indexes/ks/fts/ann",
            json={"vector": ROWS[3][1], "limit": 1},
        )
        assert resp.status in (400, 404)
        resp = await client.post(
            "/api/v1/indexes/ks/vec/bm25",
            json={"query": "fox", "limit": 10},
        )
        assert resp.status in (400, 404)

        # dropping the vector index leaves FTS serving
        db.drop_index(("ks", "vec"))
        await _wait(
            client,
            "/api/v1/indexes",
            lambda lst: {e["index"] for e in lst} == {"fts"},
        )
        resp = await client.post(
            "/api/v1/indexes/ks/fts/bm25",
            json={"query": "dog", "limit": 10},
        )
        assert resp.status == 200
        assert set((await resp.json())["primary_keys"]["pk"]) == {1, 2, 4}
        resp = await client.post(
            "/api/v1/indexes/ks/vec/ann",
            json={"vector": ROWS[3][1], "limit": 1},
        )
        assert resp.status == 404
    finally:
        await client.close()
        await service.stop()


async def test_two_vector_indexes_same_table():
    """Two vector indexes on different columns of one table route by
    index name and serve independently."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    rows_a = [vector_row((pk,), v, 100) for pk, v in ROWS]
    rows_b = [
        vector_row((pk,), [v[1], v[0], 1.0], 100) for pk, v in ROWS
    ]
    db.add_index(
        FakeIndex(
            metadata=make_vs_metadata(index="ia", target_column="emb_a"),
            scan=rows_a,
        )
    )
    db.add_index(
        FakeIndex(
            metadata=make_vs_metadata(index="ib", target_column="emb_b"),
            scan=rows_b,
        )
    )
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        await _wait(
            client,
            "/api/v1/indexes",
            lambda lst: {e["index"] for e in lst} == {"ia", "ib"},
        )
        await _wait(client, "/api/v1/indexes/ks/ia/status", lambda s: s["count"] == 6 and s["status"] == "SERVING")
        await _wait(client, "/api/v1/indexes/ks/ib/status", lambda s: s["count"] == 6 and s["status"] == "SERVING")
        ra = await (
            await client.post(
                "/api/v1/indexes/ks/ia/ann",
                json={"vector": ROWS[2][1], "limit": 1},
            )
        ).json()
        assert ra["primary_keys"]["pk"] == [2]
        qb = [ROWS[2][1][1], ROWS[2][1][0], 1.0]
        rb = await (
            await client.post(
                "/api/v1/indexes/ks/ib/ann", json={"vector": qb, "limit": 1}
            )
        ).json()
        assert rb["primary_keys"]["pk"] == [2]
    finally:
        await client.close()
        await service.stop()
