"""Validator-equivalent: similarity_functions
(crates/validator/src/similarity_functions.rs).

The reference creates indexes with EUCLIDEAN / COSINE / DOT_PRODUCT (and a
lowercase spelling, and no function at all -> COSINE default) and checks
ANN distances come back in that function's semantics. Here each space type
serves through the live HTTP surface with known vectors, and the
options-parsing path (similarity_function from CREATE INDEX options) is
exercised through the wire driver.
"""

import asyncio
import math

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.core.types import SpaceType
from vector_store_tpu.db.fake import (
    FakeDb,
    FakeIndex,
    FakeTable,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config

from validator_common import WireService, make_schema_handler

VECS = {
    0: [1.0, 0.0, 0.0],
    1: [0.0, 1.0, 0.0],
    2: [1.0, 1.0, 0.0],
    3: [2.0, 0.0, 0.0],
}


async def _serve_space(space: SpaceType):
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    rows = [vector_row((pk,), v, 100) for pk, v in VECS.items()]
    db.add_index(
        FakeIndex(
            metadata=make_vs_metadata(dimensions=3, space_type=space),
            scan=rows,
        )
    )
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    deadline = asyncio.get_event_loop().time() + 20
    while True:
        resp = await client.get("/api/v1/indexes/ks/idx/status")
        if resp.status == 200:
            s = await resp.json()
            if s["count"] == len(VECS) and s["status"] == "SERVING":
                break
        assert asyncio.get_event_loop().time() < deadline
        await asyncio.sleep(0.05)
    return service, client


async def _ann(client, vector, limit=4):
    resp = await client.post(
        "/api/v1/indexes/ks/idx/ann", json={"vector": vector, "limit": limit}
    )
    assert resp.status == 200
    return await resp.json()


async def test_euclidean_distances():
    service, client = await _serve_space(SpaceType.EUCLIDEAN)
    try:
        data = await _ann(client, [1.0, 0.0, 0.0])
        by_pk = dict(zip(data["primary_keys"]["pk"], data["distances"]))
        # squared L2 (USearch L2sq convention)
        assert by_pk[0] == pytest.approx(0.0, abs=1e-5)
        assert by_pk[1] == pytest.approx(2.0, abs=1e-4)
        assert by_pk[2] == pytest.approx(1.0, abs=1e-4)
        assert by_pk[3] == pytest.approx(1.0, abs=1e-4)
        assert data["primary_keys"]["pk"][0] == 0
        # similarity mapping 1/(1+d) (similarity.rs:26-37)
        sim = dict(zip(data["primary_keys"]["pk"], data["similarity_scores"]))
        assert sim[1] == pytest.approx(1.0 / 3.0, abs=1e-4)
    finally:
        await client.close()
        await service.stop()


async def test_cosine_distances():
    service, client = await _serve_space(SpaceType.COSINE)
    try:
        data = await _ann(client, [1.0, 0.0, 0.0])
        by_pk = dict(zip(data["primary_keys"]["pk"], data["distances"]))
        assert by_pk[0] == pytest.approx(0.0, abs=1e-4)
        assert by_pk[3] == pytest.approx(0.0, abs=1e-4)  # same direction
        assert by_pk[1] == pytest.approx(1.0, abs=1e-4)  # orthogonal
        assert by_pk[2] == pytest.approx(1 - math.sqrt(0.5), abs=1e-4)
        sim = dict(zip(data["primary_keys"]["pk"], data["similarity_scores"]))
        # (2 - d) / 2
        assert sim[1] == pytest.approx(0.5, abs=1e-4)
    finally:
        await client.close()
        await service.stop()


async def test_dot_product_distances():
    service, client = await _serve_space(SpaceType.DOT_PRODUCT)
    try:
        data = await _ann(client, [1.0, 0.0, 0.0])
        by_pk = dict(zip(data["primary_keys"]["pk"], data["distances"]))
        # d = 1 - q.v
        assert by_pk[0] == pytest.approx(0.0, abs=1e-4)
        assert by_pk[1] == pytest.approx(1.0, abs=1e-4)
        assert by_pk[3] == pytest.approx(-1.0, abs=1e-4)
        assert data["primary_keys"]["pk"][0] == 3  # largest dot wins
    finally:
        await client.close()
        await service.stop()


async def test_default_is_cosine():
    """similarity_functions.rs::test_similarity_function_default_is_cosine"""
    assert SpaceType.default() is SpaceType.COSINE
    service, client = await _serve_space(SpaceType.default())
    try:
        info = await (await client.get("/api/v1/indexes/ks/idx")).json()
        assert info["options"]["similarity_function"] == "COSINE"
    finally:
        await client.close()
        await service.stop()


async def test_lowercase_option_parses_through_wire():
    """similarity_functions.rs::test_similarity_function_lowercase: the
    CREATE INDEX option value is case-insensitive, parsed end-to-end
    through the CQL options map."""
    rows = [(i, [math.cos(i), math.sin(i), 0.0], 1_000_000) for i in range(4)]
    async with WireService(
        make_schema_handler(
            rows=rows, index_options={"similarity_function": "euclidean"}
        )
    ) as ws:
        await ws.wait_serving()
        await ws.wait_index_count(("ks", "idx"), 4)
        info = await (await ws.http.get("/api/v1/indexes/ks/idx")).json()
        assert info["options"]["similarity_function"] == "EUCLIDEAN"
        resp = await ws.http.post(
            "/api/v1/indexes/ks/idx/ann",
            json={"vector": rows[2][1], "limit": 1},
        )
        data = await resp.json()
        assert data["primary_keys"]["pk"] == [2]
        assert data["distances"][0] == pytest.approx(0.0, abs=1e-4)
