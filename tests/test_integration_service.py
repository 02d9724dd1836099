"""End-to-end integration: the whole service in-process against FakeDb —
discovery, full scan, serving, ANN over HTTP, status/info routes, metrics.
Parity with the reference's tests/integration suite (db_basic + testclient).
"""

import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.core.types import DbIndexPartitioning
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

RNG = np.random.default_rng(11)


async def start_service(db, **config_kwargs):
    config = Config(monitor_indexes_interval=0.05, **config_kwargs)
    service = await build_service(db, config)
    client = TestClient(TestServer(service.app))
    await client.start_server()
    return service, client


async def wait_for(fn, timeout=10.0, interval=0.02):
    deadline = asyncio.get_event_loop().time() + timeout
    while True:
        result = fn() if not asyncio.iscoroutinefunction(fn) else await fn()
        if result:
            return result
        if asyncio.get_event_loop().time() > deadline:
            raise TimeoutError("condition not met")
        await asyncio.sleep(interval)


async def wait_serving(client, ks, idx, timeout=15.0):
    async def check():
        resp = await client.get(f"/api/v1/indexes/{ks}/{idx}/status")
        if resp.status != 200:
            return False
        data = await resp.json()
        return data["status"] == "SERVING"

    deadline = asyncio.get_event_loop().time() + timeout
    while not await check():
        if asyncio.get_event_loop().time() > deadline:
            raise TimeoutError("index never became SERVING")
        await asyncio.sleep(0.05)


def simple_db(n=50, dims=8, filtering=(), partitioning=None, rows=None):
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    md = make_vs_metadata(
        dimensions=dims, filtering_columns=filtering, partitioning=partitioning
    )
    if rows is None:
        vecs = RNG.normal(size=(n, dims)).astype(np.float32)
        rows = [vector_row((i,), vecs[i].tolist(), 100) for i in range(n)]
        db._test_vecs = vecs
    db.add_index(FakeIndex(metadata=md, scan=rows))
    return db


class TestLifecycle:
    async def test_startup_to_serving(self):
        db = simple_db()
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            resp = await client.get("/api/v1/status")
            assert await resp.json() == "SERVING"
            # index adds apply asynchronously after SERVING (worker jobs in
            # the reference, batched device calls here): poll the count
            deadline = asyncio.get_event_loop().time() + 10
            while True:
                resp = await client.get("/api/v1/indexes/ks/idx/status")
                data = await resp.json()
                if data["count"] == 50:
                    break
                assert asyncio.get_event_loop().time() < deadline
                await asyncio.sleep(0.05)
            assert data["build_progress"] == 100.0
        finally:
            await client.close()
            await service.stop()

    async def test_list_indexes(self):
        db = simple_db()
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            resp = await client.get("/api/v1/indexes")
            data = await resp.json()
            assert len(data) == 1
            assert data[0]["keyspace"] == "ks"
            assert data[0]["options"]["type"] == "vector"
            assert data[0]["options"]["dimensions"] == 8
            assert data[0]["options"]["maximum_node_connections"] == 16
        finally:
            await client.close()
            await service.stop()

    async def test_info_routes(self):
        db = simple_db()
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            resp = await client.get("/api/v1/info")
            info = await resp.json()
            assert info["service"] == "scylla-vector-store"
            resp = await client.get("/api/v1/indexes/ks/idx")
            data = await resp.json()
            assert data["options"]["similarity_function"] == "COSINE"
            resp = await client.get("/api-docs/openapi.json")
            doc = await resp.json()
            assert doc["info"]["version"] == "3.0.0"
            assert "/api/v1/indexes/{keyspace}/{index}/ann" in doc["paths"]
        finally:
            await client.close()
            await service.stop()

    async def test_unknown_index_404(self):
        db = simple_db()
        service, client = await start_service(db)
        try:
            resp = await client.get("/api/v1/indexes/ks/nope/status")
            assert resp.status == 404
            resp = await client.post(
                "/api/v1/indexes/ks/nope/ann", json={"vector": [0.0] * 8}
            )
            assert resp.status == 404
        finally:
            await client.close()
            await service.stop()

    async def test_index_dropped(self):
        db = simple_db()
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            db.drop_index(("ks", "idx"))
            await wait_for(
                lambda: service.indexes.get_vs(("ks", "idx")) is None  # type: ignore[arg-type]
            )
        finally:
            await client.close()
            await service.stop()


class TestAnnSearch:
    async def test_ann_returns_nearest(self):
        db = simple_db(n=40, dims=8)
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            target = db._test_vecs[7]
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={"vector": target.tolist(), "limit": 3},
            )
            assert resp.status == 200
            data = await resp.json()
            assert data["primary_keys"]["pk"][0] == 7
            assert len(data["distances"]) == 3
            assert len(data["similarity_scores"]) == 3
            assert data["distances"][0] == pytest.approx(0.0, abs=1e-3)
            assert data["similarity_scores"][0] == pytest.approx(1.0, abs=1e-3)
        finally:
            await client.close()
            await service.stop()

    async def test_ann_wrong_dimensions_400(self):
        db = simple_db(dims=8)
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann", json={"vector": [0.0] * 5}
            )
            assert resp.status == 400
        finally:
            await client.close()
            await service.stop()

    async def test_ann_malformed_400(self):
        db = simple_db(dims=8)
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            resp = await client.post("/api/v1/indexes/ks/idx/ann", json={})
            assert resp.status == 400
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={"vector": [0.0] * 8, "limit": 0},
            )
            assert resp.status == 400
        finally:
            await client.close()
            await service.stop()

    async def test_not_ready_503(self):
        db = FakeDb()
        db.add_table(FakeTable("ks", "tbl", ("pk",)))
        md = make_vs_metadata(dimensions=4)
        db.add_index(FakeIndex(metadata=md, scan=[], pending=True))
        service, client = await start_service(db)
        try:
            await wait_for(lambda: service.indexes.get_vs(md.key) is not None)
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann", json={"vector": [0.0] * 4}
            )
            assert resp.status == 503
            reason = await resp.json()
            assert reason["reason"] in ("NODE_BOOTSTRAPPING", "INDEX_BUILDING")
            # release and serve
            db.release_scan(md.key)
            await wait_serving(client, "ks", "idx")
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann", json={"vector": [0.0] * 4}
            )
            assert resp.status == 200
        finally:
            await client.close()
            await service.stop()


class TestCdcUpdates:
    async def test_cdc_upsert_and_delete(self):
        db = simple_db(n=10, dims=4)
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            dbi = db.db_indexes[("ks", "idx")]
            # insert a new far-away vector via CDC
            await dbi.push_cdc(vector_row((100,), [9.0, 9.0, 9.0, 9.0], 200))

            async def found():
                resp = await client.post(
                    "/api/v1/indexes/ks/idx/ann",
                    json={"vector": [9.0, 9.0, 9.0, 9.0], "limit": 1},
                )
                data = await resp.json()
                return data["primary_keys"]["pk"] == [100]

            deadline = asyncio.get_event_loop().time() + 10
            while not await found():
                assert asyncio.get_event_loop().time() < deadline
                await asyncio.sleep(0.05)

            # delete it again
            await dbi.push_cdc(delete_row((100,), 300))
            deadline = asyncio.get_event_loop().time() + 10
            while await found():
                assert asyncio.get_event_loop().time() < deadline
                await asyncio.sleep(0.05)
        finally:
            await client.close()
            await service.stop()


class TestFilteredAnn:
    async def test_filtered_search(self):
        dims = 4
        rows = []
        vecs = RNG.normal(size=(20, dims)).astype(np.float32)
        for i in range(20):
            rows.append(
                vector_row((i,), vecs[i].tolist(), 100, filtering=[(100, i % 2)])
            )
        db = FakeDb()
        db.add_table(FakeTable("ks", "tbl", ("pk",)))
        md = make_vs_metadata(dimensions=dims, filtering_columns=("flag",))
        db.add_index(FakeIndex(metadata=md, scan=rows))
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            flt = {
                "restrictions": [{"type": "==", "lhs": "flag", "rhs": 1}],
                "allow_filtering": True,
            }
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={"vector": vecs[0].tolist(), "limit": 5, "filter": flt},
            )
            assert resp.status == 200
            data = await resp.json()
            assert all(pk % 2 == 1 for pk in data["primary_keys"]["pk"])
            # without allow_filtering -> 400
            flt["allow_filtering"] = False
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={"vector": vecs[0].tolist(), "limit": 5, "filter": flt},
            )
            assert resp.status == 400
        finally:
            await client.close()
            await service.stop()


class TestMetrics:
    async def test_metrics_exposed(self):
        db = simple_db(n=5, dims=4)
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            await client.post(
                "/api/v1/indexes/ks/idx/ann", json={"vector": [0.0] * 4}
            )
            resp = await client.get("/metrics")
            text = await resp.text()
            assert "request_latency_seconds_bucket" in text
            assert 'index_size{keyspace="ks",index_name="idx"} 5' in text
            assert "index_modified" in text
        finally:
            await client.close()
            await service.stop()

    async def test_metrics_protobuf_negotiation(self):
        """Accept: application/vnd.google.protobuf -> varint-delimited
        MetricFamily stream (httproutes.rs:577-613)."""
        db = simple_db(n=5, dims=4)
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "idx")
            await client.post(
                "/api/v1/indexes/ks/idx/ann", json={"vector": [0.0] * 4}
            )
            resp = await client.get(
                "/metrics",
                headers={
                    "Accept": "application/vnd.google.protobuf; "
                    "proto=io.prometheus.client.MetricFamily; encoding=delimited"
                },
            )
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith(
                "application/vnd.google.protobuf"
            )
            body = await resp.read()
            # walk the varint-delimited stream and pull family names
            # (field 1, wire type 2 is always the first field emitted)
            names = []
            i = 0
            while i < len(body):
                msg_len, i = _read_varint(body, i)
                msg = body[i : i + msg_len]
                i += msg_len
                assert msg[0] == (1 << 3) | 2  # field 1, length-delimited
                name_len, j = _read_varint(msg, 1)
                names.append(msg[j : j + name_len].decode())
            assert "request_latency_seconds" in names
            assert "index_size" in names
            # text format still served without the Accept header
            resp = await client.get("/metrics")
            assert "text/plain" in resp.headers["Content-Type"]
        finally:
            await client.close()
            await service.stop()

    async def test_swagger_ui_page(self):
        """/swagger-ui serves the interactive docs page
        (httproutes.rs:160-166)."""
        db = simple_db(n=5, dims=4)
        service, client = await start_service(db)
        try:
            resp = await client.get("/swagger-ui/")
            assert resp.status == 200
            html = await resp.text()
            assert "/api-docs/openapi.json" in html
            resp = await client.get("/swagger-ui", allow_redirects=False)
            assert resp.status == 302
        finally:
            await client.close()
            await service.stop()

    async def test_internals_counters(self):
        db = simple_db(n=5, dims=4)
        service, client = await start_service(db)
        try:
            service.internals.increment("test-counter", 3)
            resp = await client.get("/api/internals/counters")
            data = await resp.json()
            assert data["test-counter"] == 3
        finally:
            await client.close()
            await service.stop()


class TestCoexistingIndexes:
    async def test_independent_indexes(self):
        """Multiple indexes over different tables serve independently
        (validator coexisting_indexes parity)."""
        db = FakeDb()
        db.add_table(FakeTable("ks", "t1", ("pk",)))
        db.add_table(FakeTable("ks", "t2", ("pk",)))
        v1 = RNG.normal(size=(10, 4)).astype(np.float32)
        v2 = RNG.normal(size=(10, 6)).astype(np.float32)
        db.add_index(
            FakeIndex(
                metadata=make_vs_metadata(index="i1", table="t1", dimensions=4),
                scan=[vector_row((i,), v1[i].tolist(), 100) for i in range(10)],
            )
        )
        db.add_index(
            FakeIndex(
                metadata=make_vs_metadata(index="i2", table="t2", dimensions=6),
                scan=[vector_row((i,), v2[i].tolist(), 100) for i in range(10)],
            )
        )
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "i1")
            await wait_serving(client, "ks", "i2")
            r1 = await client.post(
                "/api/v1/indexes/ks/i1/ann", json={"vector": v1[3].tolist(), "limit": 1}
            )
            r2 = await client.post(
                "/api/v1/indexes/ks/i2/ann", json={"vector": v2[7].tolist(), "limit": 1}
            )
            assert (await r1.json())["primary_keys"]["pk"] == [3]
            assert (await r2.json())["primary_keys"]["pk"] == [7]
            # dimensions are per-index
            bad = await client.post(
                "/api/v1/indexes/ks/i1/ann", json={"vector": v2[0].tolist(), "limit": 1}
            )
            assert bad.status == 400
            # dropping one leaves the other serving
            db.drop_index(("ks", "i1"))
            await wait_for(lambda: service.indexes.get_vs(("ks", "i1")) is None)
            r2 = await client.post(
                "/api/v1/indexes/ks/i2/ann", json={"vector": v2[7].tolist(), "limit": 1}
            )
            assert r2.status == 200
        finally:
            await client.close()
            await service.stop()


class TestFtsIntegration:
    async def test_bm25_over_http(self):
        """FTS index end-to-end: scan docs, serve BM25 (integration fts.rs
        parity)."""
        from vector_store_tpu.core.types import (
            IndexMetadata,
            IndexOptionsFts,
            IndexVersion,
        )
        import uuid as _uuid
        from vector_store_tpu.db.fake import document_row

        db = FakeDb()
        db.add_table(FakeTable("ks", "docs", ("pk",)))
        md = IndexMetadata(
            keyspace_name="ks",
            index_name="fts",
            table_name="docs",
            primary_key_columns=("pk",),
            partition_key_count=1,
            target_columns=("body",),
            partitioning=DbIndexPartitioning.global_(),
            filtering_columns=(),
            version=IndexVersion(_uuid.uuid1()),
            fts_options=IndexOptionsFts(),
        )
        docs = [
            document_row((1,), "the quick brown fox", 100),
            document_row((2,), "lazy dogs sleep", 100),
            document_row((3,), "quick quick foxes", 100),
        ]
        db.add_index(FakeIndex(metadata=md, scan=docs))
        service, client = await start_service(db)
        try:
            await wait_serving(client, "ks", "fts")
            resp = await client.get("/api/v1/indexes/ks/fts/status")
            data = await resp.json()
            assert data["count"] == 3 or data["count"] == 0  # commit batching
            resp = await client.post(
                "/api/v1/indexes/ks/fts/bm25",
                json={"query": "quick fox", "limit": 2},
            )
            assert resp.status == 200
            data = await resp.json()
            assert 1 in data["primary_keys"]["pk"]
            assert len(data["scores"]) == len(data["primary_keys"]["pk"])
            # listed with fulltext options
            idxs = await (await client.get("/api/v1/indexes")).json()
            fts = [i for i in idxs if i["index"] == "fts"]
            assert fts and fts[0]["options"]["type"] == "fulltext"
            # CDC document update
            dbi = db.db_indexes[("ks", "fts")]
            await dbi.push_cdc(document_row((9,), "zebras gallop quickly", 200))
            deadline = asyncio.get_event_loop().time() + 10
            while True:
                resp = await client.post(
                    "/api/v1/indexes/ks/fts/bm25",
                    json={"query": "zebras", "limit": 1},
                )
                data = await resp.json()
                if resp.status == 200 and data["primary_keys"]["pk"] == [9]:
                    break
                assert asyncio.get_event_loop().time() < deadline
                await asyncio.sleep(0.05)
        finally:
            await client.close()
            await service.stop()


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
