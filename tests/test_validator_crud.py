"""Validator-equivalent: crud (crates/validator/src/crud.rs).

simple_create_drop_index / _multiple_indexes: indexes appear when created
and vanish (404) when dropped, repeatedly. null_vector_is_not_indexed:
rows whose target column is NULL are not counted or served.
global_add_remove_multiple_add: an add -> remove -> add -> add CDC history
leaves exactly the last value serving.
"""

import asyncio
import math

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

ROWS = [(i, [math.cos(i), math.sin(i), 0.0]) for i in range(4)]


async def _wait(client, path, pred, timeout=20.0):
    deadline = asyncio.get_event_loop().time() + timeout
    while True:
        resp = await client.get(path)
        if resp.status == 200 and pred(await resp.json()):
            return
        assert asyncio.get_event_loop().time() < deadline
        await asyncio.sleep(0.05)


async def _boot(db):
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    return service, client


async def test_create_drop_create_cycle():
    """crud.rs::simple_create_drop_index, driven twice."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    rows = [vector_row((pk,), v, 100) for pk, v in ROWS]
    service, client = await _boot(db)
    try:
        # initially: no indexes
        await _wait(client, "/api/v1/indexes", lambda lst: lst == [])
        for cycle in range(2):
            db.add_index(
                FakeIndex(metadata=make_vs_metadata(index="idx"), scan=list(rows))
            )
            await _wait(
                client,
                "/api/v1/indexes/ks/idx/status",
                lambda s: s["count"] == 4 and s["status"] == "SERVING",
            )
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={"vector": ROWS[1][1], "limit": 1},
            )
            assert resp.status == 200
            assert (await resp.json())["primary_keys"]["pk"] == [1]

            db.drop_index(("ks", "idx"))
            await _wait(client, "/api/v1/indexes", lambda lst: lst == [])
            resp = await client.get("/api/v1/indexes/ks/idx/status")
            assert resp.status == 404
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={"vector": ROWS[1][1], "limit": 1},
            )
            assert resp.status == 404
    finally:
        await client.close()
        await service.stop()


async def test_create_drop_multiple_indexes():
    """crud.rs::simple_create_drop_multiple_indexes: several indexes over
    one table created then dropped one by one."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    names = ["i0", "i1", "i2"]
    service, client = await _boot(db)
    try:
        for j, name in enumerate(names):
            db.add_index(
                FakeIndex(
                    metadata=make_vs_metadata(index=name, target_column=f"emb{j}"),
                    scan=[vector_row((pk,), v, 100) for pk, v in ROWS],
                )
            )
        await _wait(
            client,
            "/api/v1/indexes",
            lambda lst: {e["index"] for e in lst} == set(names),
        )
        for name in names:
            await _wait(
                client,
                f"/api/v1/indexes/ks/{name}/status",
                lambda s: s["count"] == 4 and s["status"] == "SERVING",
            )
        remaining = set(names)
        for name in names:
            db.drop_index(("ks", name))
            remaining.discard(name)
            await _wait(
                client,
                "/api/v1/indexes",
                lambda lst, want=frozenset(remaining): {
                    e["index"] for e in lst
                } == want,
            )
    finally:
        await client.close()
        await service.stop()


async def test_null_vector_is_not_indexed():
    """crud.rs::null_vector_is_not_indexed: a row whose target column is
    NULL is skipped by the scan AND a CDC update nulling the vector
    removes it from serving."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    rows = [vector_row((pk,), v, 100) for pk, v in ROWS]
    rows.append(vector_row((9,), None, 100))  # NULL vector
    db.add_index(FakeIndex(metadata=make_vs_metadata(index="idx"), scan=rows))
    service, client = await _boot(db)
    try:
        await _wait(
            client,
            "/api/v1/indexes/ks/idx/status",
            lambda s: s["count"] == 4 and s["status"] == "SERVING",
        )
        resp = await client.post(
            "/api/v1/indexes/ks/idx/ann",
            json={"vector": ROWS[0][1], "limit": 10},
        )
        assert 9 not in (await resp.json())["primary_keys"]["pk"]

        # CDC: nulling an existing row's vector removes it
        dbi = db.db_indexes[("ks", "idx")]
        await dbi.push_cdc(vector_row((1,), None, 200))
        await _wait(
            client, "/api/v1/indexes/ks/idx/status", lambda s: s["count"] == 3
        )
        resp = await client.post(
            "/api/v1/indexes/ks/idx/ann",
            json={"vector": ROWS[1][1], "limit": 10},
        )
        assert 1 not in (await resp.json())["primary_keys"]["pk"]
    finally:
        await client.close()
        await service.stop()


async def test_global_add_remove_multiple_add():
    """crud.rs::global_add_remove_multiple_add: the LAST write wins after
    an add/remove/add/add history."""
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    rows = [vector_row((pk,), v, 100) for pk, v in ROWS]
    db.add_index(FakeIndex(metadata=make_vs_metadata(index="idx"), scan=rows))
    service, client = await _boot(db)
    try:
        await _wait(
            client,
            "/api/v1/indexes/ks/idx/status",
            lambda s: s["count"] == 4 and s["status"] == "SERVING",
        )
        dbi = db.db_indexes[("ks", "idx")]
        v_a = [0.0, 0.0, 1.0]
        v_b = [0.0, 0.6, 0.8]
        await dbi.push_cdc(vector_row((7,), v_a, 200))
        await dbi.push_cdc(delete_row((7,), 300))
        await dbi.push_cdc(vector_row((7,), v_a, 400))
        await dbi.push_cdc(vector_row((7,), v_b, 500))
        await _wait(
            client, "/api/v1/indexes/ks/idx/status", lambda s: s["count"] == 5
        )
        deadline = asyncio.get_event_loop().time() + 10
        while True:
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann", json={"vector": v_b, "limit": 1}
            )
            data = await resp.json()
            if data.get("primary_keys", {}).get("pk") == [7] and data[
                "distances"
            ][0] < 1e-4:
                break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)
    finally:
        await client.close()
        await service.stop()
