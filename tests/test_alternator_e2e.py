"""Alternator (DynamoDB API) end-to-end: discovery -> full scan -> ANN
serving over an ``alternator_`` keyspace via the real ScyllaDb driver
against the fake CQL server.

Covers the dialect the reference exercises in crates/validator/src/
alternator/: attributes read from the ':attrs' map with
writetime(':attrs'[col]) (db_index_backend.rs:22-62), vector blobs with
leading type tags (4 = JSON array, 5 = big-endian f32s, vector.rs:39-110),
and dimensions resolved from index options instead of the column type
(db_index_backend.rs:118-182).
"""

import asyncio
import json
import struct
import time
import uuid

import numpy as np
import pytest
from aiohttp.test_utils import TestServer

from vector_store_tpu.db.cql import types as ct
from vector_store_tpu.db.cql.session import CqlSession
from vector_store_tpu.db.cql.testing import CannedResult, FakeColumn, FakeCqlServer
from vector_store_tpu.db.scylla import ScyllaDb
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config
from vector_store_tpu.service.node_state import IndexStatus, NodeStatus

KS = "alternator_items"
TBL = "items"
DIMS = 3
SCHEMA_VERSION = uuid.uuid4()

VECS = {
    "a": [1.0, 0.0, 0.0],
    "b": [0.0, 1.0, 0.0],
    "c": [0.0, 0.0, 1.0],
}


def blob_f32(vec):
    """Alternator attribute blob, type tag 5: big-endian f32 array."""
    return bytes([5]) + struct.pack(f"!{len(vec)}f", *vec)


def blob_json(vec):
    """Type tag 4: JSON array."""
    return bytes([4]) + json.dumps(vec).encode()


def make_handler(dimension=str(DIMS)):
    idx_options = {
        "class_name": "vector_index",
        "target": json.dumps({"tc": "v"}),
        "dimension": dimension,
    }

    def handler(cql, values, paging):
        if "system.group0_history" in cql:
            return CannedResult(
                columns=[FakeColumn("state_id", ct.T_TIMEUUID)],
                rows=[(uuid.uuid1(),)],
            )
        if "schema_version" in cql:
            return CannedResult(
                columns=[FakeColumn("schema_version", ct.T_UUID)],
                rows=[(SCHEMA_VERSION,)] if "system.local" in cql else [],
            )
        if "FROM system_schema.indexes" in cql:
            if "kind = 'CUSTOM'" in cql:
                return CannedResult(
                    columns=[
                        FakeColumn("keyspace_name", ct.T_VARCHAR),
                        FakeColumn("index_name", ct.T_VARCHAR),
                        FakeColumn("table_name", ct.T_VARCHAR),
                        FakeColumn("options", ct.T_MAP),
                    ],
                    rows=[(KS, "idx", TBL, dict(idx_options))],
                )
            # options / table lookup by (keyspace, index)
            cols = []
            if "table_name" in cql and "options" in cql:
                cols = [
                    FakeColumn("table_name", ct.T_VARCHAR),
                    FakeColumn("options", ct.T_MAP),
                ]
                rows = [(TBL, dict(idx_options))]
            elif "options" in cql:
                cols = [FakeColumn("options", ct.T_MAP)]
                rows = [(dict(idx_options),)]
            else:
                cols = [FakeColumn("table_name", ct.T_VARCHAR)]
                rows = [(TBL,)]
            return CannedResult(columns=cols, rows=rows)
        if "FROM system_schema.columns" in cql:
            # the driver binds (keyspace, table); serve the cdc log and the
            # base table with the Alternator layout (p + ':attrs' map)
            table = None
            if values and len(values) >= 2 and values[1] is not None:
                table = values[1].decode("utf-8", "replace")
            cols = [
                FakeColumn("column_name", ct.T_VARCHAR),
                FakeColumn("kind", ct.T_VARCHAR),
                FakeColumn("position", ct.T_INT),
                FakeColumn("type", ct.T_VARCHAR),
            ]
            if table and "_scylla_cdc_log" in table:
                return CannedResult(
                    columns=cols,
                    rows=[
                        ("cdc$stream_id", "partition_key", 0, "blob"),
                        ("cdc$time", "clustering", 0, "timeuuid"),
                        ("p", "regular", -1, "text"),
                    ],
                )
            return CannedResult(
                columns=cols,
                rows=[
                    ("p", "partition_key", 0, "text"),
                    (":attrs", "regular", -1, "map<text, blob>"),
                ],
            )
        if "tokens" in cql:
            return CannedResult(
                columns=[FakeColumn("tokens", ct.T_SET, sub_type_id=ct.T_VARCHAR)],
                rows=[(["0"],)] if "system.local" in cql else [],
            )
        if "BYPASS CACHE" in cql:
            assert '":attrs"' in cql and "writetime" in cql, cql
            lo = struct.unpack("!q", values[0])[0]
            cols = [
                FakeColumn("p", ct.T_VARCHAR),
                FakeColumn("v", ct.T_BLOB),
                FakeColumn("wt", ct.T_BIGINT),
            ]
            if lo > 0:
                return CannedResult(columns=cols, rows=[])
            return CannedResult(
                columns=cols,
                rows=[
                    ("a", blob_f32(VECS["a"]), 1_000_000),
                    ("b", blob_f32(VECS["b"]), 1_000_000),
                    ("c", blob_json(VECS["c"]), 1_000_000),
                ],
            )
        if "_scylla_cdc_log" in cql or "cdc_generation" in cql or "cdc_streams" in cql:
            return CannedResult(columns=[FakeColumn("cdc$time", ct.T_TIMEUUID)], rows=[])
        return None

    return handler


class TestAlternatorEndToEnd:
    async def test_discovery_scan_and_ann(self):
        server = FakeCqlServer(make_handler())
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        db = ScyllaDb(session)
        service = await build_service(db, Config(monitor_indexes_interval=0.05))
        http = TestServer(service.app)
        await http.start_server()
        try:
            deadline = time.time() + 20
            while service.node_state.get_status() is not NodeStatus.SERVING:
                assert time.time() < deadline, service.node_state.get_status()
                await asyncio.sleep(0.05)
            entry = service.indexes.get_vs((KS, "idx"))
            assert entry is not None
            assert int(entry.metadata.vs_options.dimensions) == DIMS
            while (
                entry.status is not IndexStatus.SERVING
                or await entry.actor.count() < 3
            ):
                assert time.time() < deadline
                service.engine.update_entries()
                await asyncio.sleep(0.05)

            # both blob dialects (tag 5 f32s, tag 4 JSON) must be searchable
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                for name, vec in VECS.items():
                    res = await client.ann(KS, "idx", vec, limit=1)
                    assert res.primary_keys["p"] == [name], (name, res)
        finally:
            await http.close()
            await service.stop()
            await session.stop()
            await server.stop()


def make_live_handler(state, dimension=str(DIMS)):
    """Stateful Alternator handler: mutable row store + CDC event queue.
    ``state`` = {"rows": {p: (blob, writetime_micros)}, "cdc": [(timeuuid,
    op, p)]}. Optional state keys: "index_present" (False hides the index
    from discovery — update_table delete-index parity). The CDC poll uses
    the ALLOW FILTERING fallback path (no stream generations served)."""
    base = make_handler(dimension)

    def handler(cql, values, paging):
        if "cdc$operation" in cql and "SELECT" in cql:
            rows = state["cdc"]
            state["cdc"] = []
            return CannedResult(
                columns=[
                    FakeColumn("cdc$time", ct.T_TIMEUUID),
                    FakeColumn("cdc$operation", ct.T_TINYINT),
                    FakeColumn("p", ct.T_VARCHAR),
                ],
                rows=rows,
            )
        if "BYPASS CACHE" in cql:
            lo = struct.unpack("!q", values[0])[0]
            cols = [
                FakeColumn("p", ct.T_VARCHAR),
                FakeColumn("v", ct.T_BLOB),
                FakeColumn("wt", ct.T_BIGINT),
            ]
            if lo > 0:
                return CannedResult(columns=cols, rows=[])
            return CannedResult(
                columns=cols,
                rows=[(p, blob, wt) for p, (blob, wt) in state["rows"].items()],
            )
        if 'WHERE "p" = ?' in cql and "BYPASS" not in cql:
            # read-after-CDC fetch of the current row
            p = values[0].decode()
            cols = [
                FakeColumn("v", ct.T_BLOB),
                FakeColumn("wt", ct.T_BIGINT),
            ]
            entry = state["rows"].get(p)
            if entry is None:
                return CannedResult(columns=cols, rows=[])
            return CannedResult(columns=cols, rows=[entry])
        if "kind = 'CUSTOM'" in cql and not state.get("index_present", True):
            return CannedResult(
                columns=[
                    FakeColumn("keyspace_name", ct.T_VARCHAR),
                    FakeColumn("index_name", ct.T_VARCHAR),
                    FakeColumn("table_name", ct.T_VARCHAR),
                    FakeColumn("options", ct.T_MAP),
                ],
                rows=[],
            )
        return base(cql, values, paging)

    return handler


async def _boot_alternator(handler):
    server = FakeCqlServer(handler)
    await server.start()
    session = CqlSession(f"127.0.0.1:{server.port}")
    session.start()
    db = ScyllaDb(
        session, cdc_fine_safety_interval=0.0, cdc_fine_sleep_interval=0.05
    )
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    http = TestServer(service.app)
    await http.start_server()
    return server, session, service, http


async def _teardown(server, session, service, http):
    await http.close()
    await service.stop()
    await session.stop()
    await server.stop()


async def _wait_count(service, n, deadline_s=20):
    entry = None
    deadline = time.time() + deadline_s
    while True:
        entry = service.indexes.get_vs((KS, "idx"))
        if (
            entry is not None
            and entry.status is IndexStatus.SERVING
            and await entry.actor.count() == n
        ):
            return entry
        assert time.time() < deadline, (
            entry and (entry.status, await entry.actor.count())
        )
        service.engine.update_entries()
        await asyncio.sleep(0.05)


class TestAlternatorCdc:
    async def test_cdc_insert_update_delete_on_attrs_rows(self):
        """CDC mutations over the ':attrs' dialect: insert of a new item,
        update of an existing one (new blob + newer writetime), and a
        row-delete — all land in the serving index
        (validator alternator/ put/delete/update_item parity)."""
        from vector_store_tpu.db.scylla import (
            CDC_OP_INSERT,
            CDC_OP_ROW_DELETE,
            CDC_OP_UPDATE,
        )

        state = {
            "rows": {
                "a": (blob_f32(VECS["a"]), 1_000_000),
                "b": (blob_f32(VECS["b"]), 1_000_000),
                "c": (blob_json(VECS["c"]), 1_000_000),
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 3)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                # CDC insert of item "d"
                vd = [0.5, 0.5, 0.0]
                state["rows"]["d"] = (blob_f32(vd), 2_000_000)
                state["cdc"].append((uuid.uuid1(), CDC_OP_INSERT, "d"))
                await _wait_count(service, 4)
                res = await client.ann(KS, "idx", vd, limit=1)
                assert res.primary_keys["p"] == ["d"]

                # CDC update of "b" to a NEW vector (JSON dialect this time)
                vb2 = [0.1, 0.9, 0.1]
                state["rows"]["b"] = (blob_json(vb2), 3_000_000)
                state["cdc"].append((uuid.uuid1(), CDC_OP_UPDATE, "b"))
                deadline = time.time() + 10
                while True:
                    res = await client.ann(KS, "idx", vb2, limit=1)
                    if (
                        res.primary_keys["p"] == ["b"]
                        and res.distances[0] < 1e-3
                    ):
                        break
                    assert time.time() < deadline
                    await asyncio.sleep(0.05)

                # CDC row-delete of "a" (no read-back for deletes)
                del state["rows"]["a"]
                state["cdc"].append((uuid.uuid1(), CDC_OP_ROW_DELETE, "a"))
                await _wait_count(service, 3)
                res = await client.ann(KS, "idx", VECS["a"], limit=3)
                assert "a" not in res.primary_keys["p"]

                # CDC insert whose read-back finds the row GONE => delete
                # (consumer.rs:60-122 read-after-CDC missing-row rule)
                state["cdc"].append((uuid.uuid1(), CDC_OP_INSERT, "zz"))
                await asyncio.sleep(0.5)
                assert await (await _wait_count(service, 3)).actor.count() == 3
        finally:
            await _teardown(server, session, service, http)

    async def test_unrelated_attribute_update_does_not_deindex(self):
        """Alternator physically rewrites the ':attrs' map when ANY attribute
        changes, so CDC emits an update even when the vector attribute did
        not change. The read-after-CDC re-read returns the same blob at the
        same writetime; the LWW table must keep the row indexed with no
        churn (update_item.rs:210 update_item_unrelated_attribute_does_not_
        deindex)."""
        from vector_store_tpu.db.scylla import CDC_OP_INSERT, CDC_OP_UPDATE

        state = {
            "rows": {
                "a": (blob_f32(VECS["a"]), 1_000_000),
                "b": (blob_f32(VECS["b"]), 1_000_000),
                "c": (blob_json(VECS["c"]), 1_000_000),
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 3)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                # unrelated-attr update: CDC fires, row unchanged
                state["cdc"].append((uuid.uuid1(), CDC_OP_UPDATE, "a"))
                # ordering barrier (the reference uses the same trick): a
                # fresh insert behind it proves the update was processed
                vd = [0.5, 0.5, 0.0]
                state["rows"]["d"] = (blob_f32(vd), 2_000_000)
                state["cdc"].append((uuid.uuid1(), CDC_OP_INSERT, "d"))
                await _wait_count(service, 4)
                res = await client.ann(KS, "idx", VECS["a"], limit=1)
                assert res.primary_keys["p"] == ["a"]
                assert res.distances[0] < 1e-3
        finally:
            await _teardown(server, session, service, http)

    async def test_vector_attribute_removal_deindexes(self):
        """UpdateItem REMOVE #vec keeps the item but drops the vector
        attribute: the re-read returns a row whose target cell is NULL,
        which must deindex (update_item.rs:252 remove_vector_and_set_
        unrelated_deindexes; crud.rs null_vector_is_not_indexed)."""
        from vector_store_tpu.db.scylla import CDC_OP_UPDATE

        state = {
            "rows": {
                "a": (blob_f32(VECS["a"]), 1_000_000),
                "b": (blob_f32(VECS["b"]), 1_000_000),
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 2)
            state["rows"]["b"] = (None, None)  # item exists, vector attr gone
            state["cdc"].append((uuid.uuid1(), CDC_OP_UPDATE, "b"))
            await _wait_count(service, 1)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                res = await client.ann(KS, "idx", VECS["b"], limit=2)
                assert res.primary_keys["p"] == ["a"]
        finally:
            await _teardown(server, session, service, http)

    async def test_wrong_dimension_vectors_never_index(self):
        """Vectors whose length differs from the index dimension must be
        dropped row-locally — in the scan AND when a CDC update rewrites a
        previously valid vector to a wrong-length one (the old value must
        go away, not linger at its old epoch). Alternator rejects these at
        the API (update_item.rs:154 ValidationException) but raw CQL writes
        can still produce them, and the engine boundary is the last line."""
        from vector_store_tpu.db.scylla import CDC_OP_UPDATE

        state = {
            "rows": {
                "a": (blob_f32(VECS["a"]), 1_000_000),
                "short": (blob_f32([1.0, 0.0]), 1_000_000),
                "long": (blob_f32([1.0, 0.0, 0.0, 0.0]), 1_000_000),
                "b": (blob_f32(VECS["b"]), 1_000_000),
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 2)  # only a and b index
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                res = await client.ann(KS, "idx", VECS["a"], limit=4)
                assert set(res.primary_keys["p"]) == {"a", "b"}

                # valid -> wrong-dim via CDC: "a" must be deindexed
                state["rows"]["a"] = (blob_f32([9.9] * 7), 2_000_000)
                state["cdc"].append((uuid.uuid1(), CDC_OP_UPDATE, "a"))
                await _wait_count(service, 1)
                res = await client.ann(KS, "idx", VECS["a"], limit=2)
                assert res.primary_keys["p"] == ["b"]
        finally:
            await _teardown(server, session, service, http)

    async def test_batch_write_mixed_validity(self):
        """BatchWriteItem lands several CDC rows in one window; valid items
        index, an invalid one among them is skipped without poisoning the
        batch (batch_write_item.rs:68,136)."""
        from vector_store_tpu.db.scylla import CDC_OP_INSERT

        state = {
            "rows": {"a": (blob_f32(VECS["a"]), 1_000_000)},
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 1)
            vd = [0.5, 0.5, 0.0]
            ve = [0.0, 0.5, 0.5]
            state["rows"]["d"] = (blob_f32(vd), 2_000_000)
            state["rows"]["bad"] = (bytes([9]) + b"junk", 2_000_000)
            state["rows"]["e"] = (blob_json(ve), 2_000_000)
            state["cdc"].extend(
                [
                    (uuid.uuid1(), CDC_OP_INSERT, "d"),
                    (uuid.uuid1(), CDC_OP_INSERT, "bad"),
                    (uuid.uuid1(), CDC_OP_INSERT, "e"),
                ]
            )
            await _wait_count(service, 3)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                for p, vec in (("d", vd), ("e", ve)):
                    res = await client.ann(KS, "idx", vec, limit=1)
                    assert res.primary_keys["p"] == [p]
        finally:
            await _teardown(server, session, service, http)


class TestAlternatorTableLifecycle:
    async def test_index_deleted_via_update_table_is_dropped(self):
        """Deleting the vector index (UpdateTable in Alternator, DROP INDEX
        in CQL) makes it disappear from system_schema.indexes; discovery
        must tear it down and ANN must 404 (update_table.rs:186)."""
        state = {
            "rows": {
                "a": (blob_f32(VECS["a"]), 1_000_000),
                "b": (blob_f32(VECS["b"]), 1_000_000),
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 2)
            state["index_present"] = False
            deadline = time.time() + 10
            while service.indexes.get_vs((KS, "idx")) is not None:
                assert time.time() < deadline
                await asyncio.sleep(0.05)
            import aiohttp

            async with aiohttp.ClientSession() as s:
                async with s.post(
                    f"http://127.0.0.1:{http.port}/api/v1/indexes/{KS}/idx/ann",
                    json={"vector": VECS["a"], "limit": 1},
                ) as resp:
                    assert resp.status == 404
        finally:
            await _teardown(server, session, service, http)

    async def test_bad_dimension_option_skips_only_that_index(self):
        """A sibling index whose Alternator 'dimension' option is garbage
        must be skipped per-index — the valid index still reaches SERVING
        (reference validates per index: db.rs get_index_* -> None; the
        boundary-dimension cases live in create_table.rs:403)."""
        base = make_handler()
        bad_options = {
            "class_name": "vector_index",
            "target": json.dumps({"tc": "v"}),
            "dimension": "oops",
        }

        def handler(cql, values, paging):
            if "FROM system_schema.indexes" in cql and "kind = 'CUSTOM'" in cql:
                return CannedResult(
                    columns=[
                        FakeColumn("keyspace_name", ct.T_VARCHAR),
                        FakeColumn("index_name", ct.T_VARCHAR),
                        FakeColumn("table_name", ct.T_VARCHAR),
                        FakeColumn("options", ct.T_MAP),
                    ],
                    rows=[
                        (
                            KS,
                            "badidx",
                            TBL,
                            dict(bad_options),
                        ),
                        (
                            KS,
                            "idx",
                            TBL,
                            {
                                "class_name": "vector_index",
                                "target": json.dumps({"tc": "v"}),
                                "dimension": str(DIMS),
                            },
                        ),
                    ],
                )
            if "FROM system_schema.indexes" in cql and values and len(values) >= 2:
                name = values[1].decode("utf-8", "replace")
                if name == "badidx":
                    if "table_name" in cql and "options" in cql:
                        return CannedResult(
                            columns=[
                                FakeColumn("table_name", ct.T_VARCHAR),
                                FakeColumn("options", ct.T_MAP),
                            ],
                            rows=[(TBL, dict(bad_options))],
                        )
                    if "options" in cql:
                        return CannedResult(
                            columns=[FakeColumn("options", ct.T_MAP)],
                            rows=[(dict(bad_options),)],
                        )
                    return CannedResult(
                        columns=[FakeColumn("table_name", ct.T_VARCHAR)],
                        rows=[(TBL,)],
                    )
            return base(cql, values, paging)

        server = FakeCqlServer(handler)
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        db = ScyllaDb(session)
        service = await build_service(db, Config(monitor_indexes_interval=0.05))
        http = TestServer(service.app)
        await http.start_server()
        try:
            await _wait_count(service, 3)
            assert service.indexes.get_vs((KS, "badidx")) is None
            assert service.node_state.get_status() is NodeStatus.SERVING
        finally:
            await _teardown(server, session, service, http)

    async def test_boundary_dimension_one(self):
        """dimension=1 from index options must serve (create_table.rs:403
        boundary dimensions)."""
        state = {
            "rows": {
                "lo": (blob_f32([-1.0]), 1_000_000),
                "hi": (blob_f32([1.0]), 1_000_000),
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state, dimension="1")
        )
        try:
            await _wait_count(service, 2)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                res = await client.ann(KS, "idx", [0.9], limit=1)
                assert res.primary_keys["p"] == ["hi"]
        finally:
            await _teardown(server, session, service, http)

    async def test_bad_blob_tag_rows_are_skipped(self):
        """A row whose attribute blob carries an unknown type tag must be
        skipped without breaking the scan (vector.rs:39-110 decode)."""
        state = {
            "rows": {
                "a": (blob_f32(VECS["a"]), 1_000_000),
                "bad": (bytes([9]) + b"garbage", 1_000_000),
                "b": (blob_f32(VECS["b"]), 1_000_000),
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            entry = await _wait_count(service, 2)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                res = await client.ann(KS, "idx", VECS["a"], limit=2)
                assert "bad" not in res.primary_keys["p"]
        finally:
            await _teardown(server, session, service, http)


class TestAlternatorReadSideSemantics:
    """VERDICT r3 #6: the reference suite's read-side semantics —
    update_item attribute mutations, batch_write, TTL expiry -> CDC delete
    -> index removal, and the LWT write flow — each asserting INDEXED
    STATE after the mutation, not just API status."""

    async def test_update_item_vector_element_operations(self):
        """UpdateItem SET vec[i] = x mutates one element of the vector
        attribute; CDC fires and the read-back returns the element-mutated
        blob at a newer writetime — the index must serve the NEW vector
        and stop exact-matching the old one (update_item.rs:327
        update_item_vector_element_operations)."""
        from vector_store_tpu.db.scylla import CDC_OP_UPDATE

        state = {
            "rows": {
                "a": (blob_f32(VECS["a"]), 1_000_000),
                "b": (blob_f32(VECS["b"]), 1_000_000),
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 2)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                # SET vec[2] = 0.8 on "a": [1,0,0] -> [1,0,0.8]
                va2 = [1.0, 0.0, 0.8]
                state["rows"]["a"] = (blob_f32(va2), 2_000_000)
                state["cdc"].append((uuid.uuid1(), CDC_OP_UPDATE, "a"))
                deadline = time.time() + 10
                while True:
                    res = await client.ann(KS, "idx", va2, limit=1)
                    if res.primary_keys["p"] == ["a"] and res.distances[0] < 1e-3:
                        break
                    assert time.time() < deadline
                    await asyncio.sleep(0.05)
                # the OLD value no longer exact-matches (epoch bumped, one
                # live copy): distance to the old vector is now material
                res = await client.ann(KS, "idx", VECS["a"], limit=1)
                assert res.primary_keys["p"] == ["a"]
                assert res.distances[0] > 1e-3
                # a second element op: SET vec[0] = 0 -> [0,0,0.8]
                va3 = [0.0, 0.0, 0.8]
                state["rows"]["a"] = (blob_f32(va3), 3_000_000)
                state["cdc"].append((uuid.uuid1(), CDC_OP_UPDATE, "a"))
                deadline = time.time() + 10
                while True:
                    res = await client.ann(KS, "idx", va3, limit=1)
                    if res.primary_keys["p"] == ["a"] and res.distances[0] < 1e-3:
                        break
                    assert time.time() < deadline
                    await asyncio.sleep(0.05)
        finally:
            await _teardown(server, session, service, http)

    async def test_batch_write_puts_and_deletes_in_one_batch(self):
        """BatchWriteItem mixes PutRequest and DeleteRequest in ONE call;
        every mutation lands in the same CDC window and the indexed state
        must reflect ALL of them (batch_write_item.rs:68
        batch_write_item_updates_index)."""
        from vector_store_tpu.db.scylla import (
            CDC_OP_INSERT,
            CDC_OP_ROW_DELETE,
        )

        state = {
            "rows": {
                "a": (blob_f32(VECS["a"]), 1_000_000),
                "b": (blob_f32(VECS["b"]), 1_000_000),
                "c": (blob_json(VECS["c"]), 1_000_000),
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 3)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                # one batch: put d, put e, delete a — one CDC poll returns
                # all three events together
                vd, ve = [0.5, 0.5, 0.0], [0.0, 0.5, 0.5]
                state["rows"]["d"] = (blob_f32(vd), 2_000_000)
                state["rows"]["e"] = (blob_f32(ve), 2_000_000)
                del state["rows"]["a"]
                state["cdc"].extend(
                    [
                        (uuid.uuid1(), CDC_OP_INSERT, "d"),
                        (uuid.uuid1(), CDC_OP_INSERT, "e"),
                        (uuid.uuid1(), CDC_OP_ROW_DELETE, "a"),
                    ]
                )
                await _wait_count(service, 4)  # b, c, d, e
                res = await client.ann(KS, "idx", vd, limit=1)
                assert res.primary_keys["p"] == ["d"]
                res = await client.ann(KS, "idx", ve, limit=1)
                assert res.primary_keys["p"] == ["e"]
                res = await client.ann(KS, "idx", VECS["a"], limit=4)
                assert "a" not in res.primary_keys["p"]
        finally:
            await _teardown(server, session, service, http)

    async def test_ttl_expiry_cdc_delete_removes_then_reput_reindexes(self):
        """TTL expiry in Scylla surfaces as a CDC delete for the expired
        row; the index must drop it while unexpired rows keep serving, and
        a later re-put of the SAME key must re-index at a fresh epoch
        (ttl.rs:59 ttl_expiration_removes_vector + the re-read rule)."""
        from vector_store_tpu.db.scylla import CDC_OP_INSERT, CDC_OP_ROW_DELETE

        state = {
            "rows": {
                "a": (blob_f32(VECS["a"]), 1_000_000),
                "b": (blob_f32(VECS["b"]), 1_000_000),
                "c": (blob_json(VECS["c"]), 1_000_000),  # carries the TTL
            },
            "cdc": [],
        }
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 3)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                # TTL fires: the row vanishes and CDC emits a delete
                del state["rows"]["c"]
                state["cdc"].append((uuid.uuid1(), CDC_OP_ROW_DELETE, "c"))
                await _wait_count(service, 2)
                res = await client.ann(KS, "idx", VECS["c"], limit=3)
                assert "c" not in res.primary_keys["p"]
                assert set(res.primary_keys["p"]) == {"a", "b"}
                # re-put of the expired key re-indexes at a fresh epoch.
                # The tombstone's timestamp came from the CDC event's
                # timeuuid (real clock), so the re-put's writetime must be
                # NEWER than it — LWW correctly rejects an older writetime
                # (same rule the reference's compare_timestamps enforces).
                vc2 = [0.2, 0.2, 0.9]
                state["rows"]["c"] = (
                    blob_f32(vc2),
                    int(time.time() * 1e6) + 10_000_000,
                )
                state["cdc"].append((uuid.uuid1(), CDC_OP_INSERT, "c"))
                await _wait_count(service, 3)
                res = await client.ann(KS, "idx", vc2, limit=1)
                assert res.primary_keys["p"] == ["c"]
                assert res.distances[0] < 1e-3
        finally:
            await _teardown(server, session, service, http)

    async def test_lwt_write_flow_indexes_and_updates(self):
        """The Alternator LWT path (alternator_always_use_lwt) writes rows
        whose timestamps come from the LWT commit — strictly monotone per
        key. Mirror lwt.rs:51 alternator_with_always_use_lwt: put item-a +
        item-b -> both serve; delete item-b -> only item-a; UpdateItem SET
        on item-a's vector -> ANN ordering follows the new value."""
        from vector_store_tpu.db.scylla import (
            CDC_OP_INSERT,
            CDC_OP_ROW_DELETE,
            CDC_OP_UPDATE,
        )

        state = {"rows": {}, "cdc": []}
        server, session, service, http = await _boot_alternator(
            make_live_handler(state)
        )
        try:
            await _wait_count(service, 0)
            from vector_store_tpu.client import VectorStoreClient

            url = f"http://127.0.0.1:{http.port}"
            async with VectorStoreClient(url) as client:
                va, vb = [1.0, 2.0, 4.0], [4.0, 2.0, 1.0]
                # PutItem item-a, item-b (LWT commit timestamps: monotone)
                state["rows"]["item-a"] = (blob_f32(va), 1_000_000)
                state["cdc"].append((uuid.uuid1(), CDC_OP_INSERT, "item-a"))
                state["rows"]["item-b"] = (blob_f32(vb), 1_000_001)
                state["cdc"].append((uuid.uuid1(), CDC_OP_INSERT, "item-b"))
                await _wait_count(service, 2)

                # DeleteItem item-b
                del state["rows"]["item-b"]
                state["cdc"].append(
                    (uuid.uuid1(), CDC_OP_ROW_DELETE, "item-b")
                )
                await _wait_count(service, 1)
                res = await client.ann(KS, "idx", vb, limit=2)
                assert res.primary_keys["p"] == ["item-a"]

                # UpdateItem SET vec on item-a: ordering follows the update
                va2 = [9.0, 9.0, 9.0]
                state["rows"]["item-a"] = (blob_f32(va2), 1_000_002)
                state["cdc"].append((uuid.uuid1(), CDC_OP_UPDATE, "item-a"))
                deadline = time.time() + 10
                while True:
                    res = await client.ann(KS, "idx", va2, limit=1)
                    if res.primary_keys["p"] == ["item-a"] and res.distances[0] < 1e-3:
                        break
                    assert time.time() < deadline
                    await asyncio.sleep(0.05)
        finally:
            await _teardown(server, session, service, http)
