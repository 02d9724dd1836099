"""OpenAPI golden comparison (reference integration openapi.rs) and
quantization modes + memory-limit behavior over HTTP (quantization.rs,
memory_limit.rs parity)."""

import asyncio
import json
import os

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.db.fake import (
    FakeDb,
    FakeIndex,
    FakeTable,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.http.openapi import openapi_doc
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config

RNG = np.random.default_rng(99)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestOpenApiGolden:
    def test_matches_checked_in_artifact(self):
        """The generated document must match api/openapi.json (regenerate
        with http/openapi.py when the API changes, like the reference's
        bin/generate-openapi)."""
        with open(os.path.join(REPO, "api", "openapi.json")) as f:
            golden = json.load(f)
        assert openapi_doc() == golden

    def test_all_routes_documented(self):
        doc = openapi_doc()
        for path in [
            "/api/v1/indexes",
            "/api/v1/indexes/{keyspace}/{index}/status",
            "/api/v1/indexes/{keyspace}/{index}",
            "/api/v1/indexes/{keyspace}/{index}/ann",
            "/api/v1/indexes/{keyspace}/{index}/bm25",
            "/api/v1/info",
            "/api/v1/status",
        ]:
            assert path in doc["paths"], path


async def serve_index(quantization, space=SpaceType.COSINE, n=60, dims=16):
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    vecs = RNG.normal(size=(n, dims)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    rows = [vector_row((i,), vecs[i].tolist(), 100) for i in range(n)]
    md = make_vs_metadata(
        dimensions=dims, quantization=quantization, space_type=space
    )
    db.add_index(FakeIndex(metadata=md, scan=rows))
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    deadline = asyncio.get_event_loop().time() + 15
    while True:
        resp = await client.get("/api/v1/indexes/ks/idx/status")
        if resp.status == 200:
            data = await resp.json()
            if data["status"] == "SERVING" and data["count"] == n:
                break
        assert asyncio.get_event_loop().time() < deadline
        await asyncio.sleep(0.05)
    return service, client, vecs


@pytest.mark.parametrize(
    "quant", [Quantization.F32, Quantization.F16, Quantization.BF16, Quantization.I8, Quantization.B1]
)
async def test_quantization_modes_over_http(quant):
    """All five quantization modes serve correct self-queries over HTTP
    (integration quantization.rs parity)."""
    service, client, vecs = await serve_index(quant)
    try:
        resp = await client.post(
            "/api/v1/indexes/ks/idx/ann",
            json={"vector": vecs[7].tolist(), "limit": 3},
        )
        assert resp.status == 200
        data = await resp.json()
        assert data["primary_keys"]["pk"][0] == 7
        info = await (await client.get("/api/v1/indexes/ks/idx")).json()
        assert info["options"]["quantization"] == quant.value
    finally:
        await client.close()
        await service.stop()


async def test_hbm_budget_drops_adds():
    """Device-HBM accounting: engines register their device-array footprint
    with the governor, and an index outgrowing the per-chip budget flips
    the governor to Cannot BEFORE the device OOMs (memory.rs:23-25 in
    spirit, applied to the actual binding resource on this architecture)."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    vecs = RNG.normal(size=(10, 8)).astype(np.float32)
    rows = [vector_row((i,), vecs[i].tolist(), 100) for i in range(10)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=8), scan=rows))
    service = await build_service(
        db, Config(monitor_indexes_interval=0.05, engine_kind="flat")
    )
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        deadline = asyncio.get_event_loop().time() + 15
        while True:
            resp = await client.get("/api/v1/indexes/ks/idx/status")
            if resp.status == 200 and (await resp.json())["count"] == 10:
                break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)

        # the engine registered at creation and reports real device bytes
        used = service.memory.device_bytes_used()
        assert used > 0
        # shrink the device budget below what's already resident
        service.memory._task.cancel()
        service.memory.device_limit = used // 2
        assert service.memory.check() is False

        dbi = db.db_indexes[("ks", "idx")]
        await dbi.push_cdc(vector_row((100,), [9.0] * 8, 200))
        entry = service.indexes.get_vs(("ks", "idx"))
        deadline = asyncio.get_event_loop().time() + 10
        while entry.actor._dropped_adds == 0:
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)

        # raising the budget relieves pressure
        service.memory.device_limit = used * 10
        assert service.memory.check() is True
    finally:
        await client.close()
        await service.stop()


async def test_host_mirror_accounted():
    """Host-tier accounting: engines report their host-RAM mirror footprint
    (engine.host_bytes — slot bookkeeping + the f32 vector mirror) and the
    configured host limit binds on that attribution (VERDICT r2 #10: the
    mirror was previously invisible to the governor)."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    vecs = RNG.normal(size=(10, 8)).astype(np.float32)
    rows = [vector_row((i,), vecs[i].tolist(), 100) for i in range(10)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=8), scan=rows))
    service = await build_service(
        db, Config(monitor_indexes_interval=0.05, engine_kind="flat")
    )
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        deadline = asyncio.get_event_loop().time() + 15
        while True:
            resp = await client.get("/api/v1/indexes/ks/idx/status")
            if resp.status == 200 and (await resp.json())["count"] == 10:
                break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)

        used_host = service.memory.host_bytes_used()
        assert used_host > 0  # both tiers visible: device AND host
        assert service.memory.device_bytes_used() > 0
        service.memory._task.cancel()
        # a host limit below the engines' own mirrors must flip to Cannot
        # even if MemAvailable still looks healthy
        service.memory.config_limit = max(1, used_host // 2)
        assert service.memory.check() is False
        service.memory.config_limit = None
        assert service.memory.check() is True
    finally:
        await client.close()
        await service.stop()


async def test_memory_limit_drops_adds():
    """When the governor reports Cannot, new vectors are dropped rather
    than indexed (memory_limit.rs / usearch.rs:1156-1177 parity)."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    vecs = RNG.normal(size=(10, 8)).astype(np.float32)
    rows = [vector_row((i,), vecs[i].tolist(), 100) for i in range(10)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=8), scan=rows))
    # flat engine: no background graph merges, so op application timing is
    # deterministic for the governor toggles below
    service = await build_service(
        db, Config(monitor_indexes_interval=0.05, engine_kind="flat")
    )
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        deadline = asyncio.get_event_loop().time() + 15
        while True:
            resp = await client.get("/api/v1/indexes/ks/idx/status")
            if resp.status == 200 and (await resp.json())["count"] == 10:
                break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)

        # flip the governor and push a CDC insert: it must be dropped
        service.memory.can_allocate = False
        service.memory._task.cancel()  # stop periodic checks overriding us
        dbi = db.db_indexes[("ks", "idx")]
        await dbi.push_cdc(vector_row((100,), [9.0] * 8, 200))
        entry = service.indexes.get_vs(("ks", "idx"))
        deadline = asyncio.get_event_loop().time() + 10
        while entry.actor._dropped_adds == 0:
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)
        resp = await client.get("/api/v1/indexes/ks/idx/status")
        assert (await resp.json())["count"] == 10  # unchanged

        # relieve pressure: subsequent adds land
        service.memory.can_allocate = True
        await dbi.push_cdc(vector_row((101,), [8.0] * 8, 300))
        deadline = asyncio.get_event_loop().time() + 10
        while (await (await client.get("/api/v1/indexes/ks/idx/status")).json())[
            "count"
        ] != 11:
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)
    finally:
        await client.close()
        await service.stop()
