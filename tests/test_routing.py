"""Query routing matrix (parity with the reference's integration
routing.rs): indexes over the same (keyspace, table, target column) form a
routing group and requests are served by the best-scoring member."""

import asyncio
import uuid

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.core.types import DbIndexPartitioning, IndexVersion
from vector_store_tpu.db.fake import (
    FakeDb,
    FakeIndex,
    FakeTable,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config

RNG = np.random.default_rng(77)
DIMS = 4


async def start(db):
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    return service, client


async def wait_serving(client, names, timeout=15.0):
    deadline = asyncio.get_event_loop().time() + timeout
    while True:
        ok = True
        for name in names:
            resp = await client.get(f"/api/v1/indexes/ks/{name}/status")
            if resp.status != 200 or (await resp.json())["status"] != "SERVING":
                ok = False
        if ok:
            return
        assert asyncio.get_event_loop().time() < deadline
        await asyncio.sleep(0.05)


def rows(n=12, parts=3):
    """Rows with a filtering/partition column 'region' cycling 0..parts-1."""
    out = []
    vecs = RNG.normal(size=(n, DIMS)).astype(np.float32)
    for i in range(n):
        out.append(
            vector_row((i,), vecs[i].tolist(), 100, filtering=[(100, i % parts)])
        )
    return out, vecs


def db_with(global_=True, local=True, filtering=("region",)):
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    scan, vecs = rows()
    if global_:
        db.add_index(
            FakeIndex(
                metadata=make_vs_metadata(
                    index="g_idx", dimensions=DIMS, filtering_columns=filtering
                ),
                scan=list(scan),
            )
        )
    if local:
        db.add_index(
            FakeIndex(
                metadata=make_vs_metadata(
                    index="l_idx",
                    dimensions=DIMS,
                    filtering_columns=(),
                    partitioning=DbIndexPartitioning.local(("region",)),
                ),
                scan=list(scan),
            )
        )
    return db, vecs


def eq_region(v, allow=False):
    return {
        "restrictions": [{"type": "==", "lhs": "region", "rhs": v}],
        "allow_filtering": allow,
    }


class TestRouting:
    async def test_partition_eq_routes_to_local(self):
        """A request addressed to the GLOBAL index whose filter pins the
        local index's partition column routes to the local index — no
        ALLOW FILTERING needed (local covers the column)."""
        db, vecs = db_with()
        service, client = await start(db)
        try:
            await wait_serving(client, ["g_idx", "l_idx"])
            resp = await client.post(
                "/api/v1/indexes/ks/g_idx/ann",
                json={"vector": vecs[0].tolist(), "limit": 5, "filter": eq_region(0)},
            )
            assert resp.status == 200, await resp.text()
            data = await resp.json()
            assert all(pk % 3 == 0 for pk in data["primary_keys"]["pk"])
            counters = service.internals.counters()
            assert counters.get("ann-served-request--ks--l_idx", 0) >= 1
        finally:
            await client.close()
            await service.stop()

    async def test_unfiltered_routes_to_global(self):
        db, vecs = db_with()
        service, client = await start(db)
        try:
            await wait_serving(client, ["g_idx", "l_idx"])
            resp = await client.post(
                "/api/v1/indexes/ks/l_idx/ann",
                json={"vector": vecs[0].tolist(), "limit": 3},
            )
            assert resp.status == 200
            counters = service.internals.counters()
            assert counters.get("ann-served-request--ks--g_idx", 0) >= 1
        finally:
            await client.close()
            await service.stop()

    async def test_local_only_unfiltered_400(self):
        db, vecs = db_with(global_=False)
        service, client = await start(db)
        try:
            await wait_serving(client, ["l_idx"])
            resp = await client.post(
                "/api/v1/indexes/ks/l_idx/ann",
                json={"vector": vecs[0].tolist(), "limit": 3},
            )
            assert resp.status == 400
            assert "Global ANN query is not supported" in await resp.text()
        finally:
            await client.close()
            await service.stop()

    async def test_global_filter_needs_allow_filtering(self):
        db, vecs = db_with(local=False)
        service, client = await start(db)
        try:
            await wait_serving(client, ["g_idx"])
            resp = await client.post(
                "/api/v1/indexes/ks/g_idx/ann",
                json={
                    "vector": vecs[0].tolist(),
                    "limit": 3,
                    "filter": eq_region(0, allow=False),
                },
            )
            assert resp.status == 400
            assert "ALLOW FILTERING" in await resp.text()
            resp = await client.post(
                "/api/v1/indexes/ks/g_idx/ann",
                json={
                    "vector": vecs[0].tolist(),
                    "limit": 3,
                    "filter": eq_region(0, allow=True),
                },
            )
            assert resp.status == 200
        finally:
            await client.close()
            await service.stop()

    async def test_uncovered_filter_column_rejected(self):
        db, vecs = db_with(local=False, filtering=())  # no filtering columns
        service, client = await start(db)
        try:
            await wait_serving(client, ["g_idx"])
            resp = await client.post(
                "/api/v1/indexes/ks/g_idx/ann",
                json={
                    "vector": vecs[0].tolist(),
                    "limit": 3,
                    "filter": eq_region(0, allow=True),
                },
            )
            assert resp.status == 400
        finally:
            await client.close()
            await service.stop()

    async def test_version_tie_break(self):
        """Two identical global indexes: the newest version serves."""
        db = FakeDb()
        db.add_table(FakeTable("ks", "tbl", ("pk",)))
        scan, vecs = rows()
        old_v = IndexVersion(uuid.uuid1())
        await asyncio.sleep(0.01)
        new_v = IndexVersion(uuid.uuid1())
        db.add_index(
            FakeIndex(
                metadata=make_vs_metadata(index="old", dimensions=DIMS, version=old_v),
                scan=list(scan),
            )
        )
        db.add_index(
            FakeIndex(
                metadata=make_vs_metadata(index="new", dimensions=DIMS, version=new_v),
                scan=list(scan),
            )
        )
        service, client = await start(db)
        try:
            await wait_serving(client, ["old", "new"])
            resp = await client.post(
                "/api/v1/indexes/ks/old/ann",
                json={"vector": vecs[0].tolist(), "limit": 1},
            )
            assert resp.status == 200
            counters = service.internals.counters()
            assert counters.get("ann-served-request--ks--new", 0) >= 1
        finally:
            await client.close()
            await service.stop()


class TestTypedFilters:
    async def test_type_mismatch_400(self):
        """Filter values are converted against the base table's column
        types; mismatches 400 like the reference's typed JSON conversion."""
        db = FakeDb()
        db.add_table(
            FakeTable("ks", "tbl", ("pk",), columns={"region": "int", "name": "text"})
        )
        scan, vecs = rows()
        db.add_index(
            FakeIndex(
                metadata=make_vs_metadata(
                    index="g_idx", dimensions=DIMS, filtering_columns=("region", "name")
                ),
                scan=list(scan),
            )
        )
        service, client = await start(db)
        try:
            await wait_serving(client, ["g_idx"])
            # wrong type: string for an int column
            resp = await client.post(
                "/api/v1/indexes/ks/g_idx/ann",
                json={
                    "vector": vecs[0].tolist(),
                    "limit": 3,
                    "filter": {
                        "restrictions": [{"type": "==", "lhs": "region", "rhs": "zero"}],
                        "allow_filtering": True,
                    },
                },
            )
            assert resp.status == 400
            assert "expects int" in await resp.text()
            # right type passes
            resp = await client.post(
                "/api/v1/indexes/ks/g_idx/ann",
                json={
                    "vector": vecs[0].tolist(),
                    "limit": 3,
                    "filter": {
                        "restrictions": [{"type": "==", "lhs": "region", "rhs": 1}],
                        "allow_filtering": True,
                    },
                },
            )
            assert resp.status == 200
        finally:
            await client.close()
            await service.stop()
