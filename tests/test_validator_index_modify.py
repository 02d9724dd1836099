"""Validator-equivalent: index_modify / index_create lifecycle
(crates/validator/src/index_modify.rs, index_create.rs).

Altering a vector index's parameters in Scylla produces a NEW index
version (timeuuid) and new options in system_schema.indexes; the monitor
must tear the old index down and rebuild (monitor_indexes.rs:48-153),
except in alter_index_simulator mode where a version-only change keeps
the running index (monitor_indexes.rs:341-372).

Driven through FakeDb (the db_basic equivalent) because the lifecycle
under test — diffing discovered metadata against the known set — lives
entirely above the Db interface; the wire-driver path is covered by the
other validator modules and tests/test_scylla_db.py.
"""

import asyncio
import uuid

import numpy as np
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.core.types import ExpansionSearch, IndexKey, IndexVersion
from vector_store_tpu.db.fake import (
    FakeDb,
    FakeIndex,
    FakeTable,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config

DIMS = 3
KEY = IndexKey("ks", "idx")


def _rows(n: int, seed: int):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, DIMS)).astype(np.float32)
    return [vector_row((i,), vecs[i].tolist(), 100) for i in range(n)]


async def _boot(db, config=None):
    service = await build_service(
        db, config or Config(monitor_indexes_interval=0.05)
    )
    server = TestServer(service.app)
    await server.start_server()
    return service, TestClient(server)


async def _wait(client, *, count=None, status="SERVING", timeout=20.0):
    deadline = asyncio.get_event_loop().time() + timeout
    while True:
        resp = await client.get("/api/v1/indexes/ks/idx/status")
        if resp.status == 200:
            d = await resp.json()
            if d["status"] == status and (count is None or d["count"] == count):
                return d
        assert asyncio.get_event_loop().time() < deadline, (
            resp.status,
            await resp.text(),
        )
        await asyncio.sleep(0.05)


async def test_param_change_rebuilds_index():
    """ALTER-ing search params (new version + new options) must drop and
    rebuild the index with the new metadata and a fresh full scan."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=DIMS), scan=_rows(12, 1)))
    service, client = await _boot(db)
    try:
        await _wait(client, count=12)
        old_entry = service.indexes.get_vs(KEY)

        altered = make_vs_metadata(
            dimensions=DIMS,
            expansion_search=ExpansionSearch(128),
            version=IndexVersion(uuid.uuid1()),
        )
        db.add_index(FakeIndex(metadata=altered, scan=_rows(20, 2)))

        await _wait(client, count=20)
        entry = service.indexes.get_vs(KEY)
        assert entry is not old_entry
        assert int(entry.metadata.vs_options.expansion_search) == 128
        assert entry.metadata.version == altered.version
    finally:
        await client.close()
        await service.stop()


async def test_version_only_change_with_simulator_keeps_index():
    """alter_index_simulator: when ONLY the version changed (same params),
    the running index is kept — no teardown, no rescan
    (monitor_indexes.rs alter_index_simulator predicates)."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    md = make_vs_metadata(dimensions=DIMS)
    db.add_index(FakeIndex(metadata=md, scan=_rows(10, 3)))
    service, client = await _boot(
        db, Config(monitor_indexes_interval=0.05, alter_index_simulator=True)
    )
    try:
        await _wait(client, count=10)
        entry_before = service.indexes.get_vs(KEY)

        bumped = make_vs_metadata(
            dimensions=DIMS, version=IndexVersion(uuid.uuid1())
        )
        assert bumped.discard_version() == md.discard_version()
        # the new scan would yield 25 rows — it must NOT run
        db.add_index(FakeIndex(metadata=bumped, scan=_rows(25, 4)))

        for _ in range(10):  # several discovery ticks
            await asyncio.sleep(0.06)
        d = await _wait(client, count=10)
        assert d["count"] == 10
        assert service.indexes.get_vs(KEY) is entry_before
    finally:
        await client.close()
        await service.stop()


async def test_drop_and_recreate():
    """DROP INDEX tears it down (404); CREATE brings it back with a fresh
    scan (index_create.rs lifecycle)."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=DIMS), scan=_rows(8, 5)))
    service, client = await _boot(db)
    try:
        await _wait(client, count=8)
        db.drop_index(KEY)
        deadline = asyncio.get_event_loop().time() + 10
        while service.indexes.get_vs(KEY) is not None:
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)
        resp = await client.post(
            "/api/v1/indexes/ks/idx/ann",
            json={"vector": [1.0, 0.0, 0.0], "limit": 1},
        )
        assert resp.status == 404

        db.add_index(
            FakeIndex(
                metadata=make_vs_metadata(
                    dimensions=DIMS, version=IndexVersion(uuid.uuid1())
                ),
                scan=_rows(16, 6),
            )
        )
        await _wait(client, count=16)
    finally:
        await client.close()
        await service.stop()
