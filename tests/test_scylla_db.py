"""ScyllaDb layer tests: schema discovery, target-option parsing, token
ranges, full scan row parsing, Alternator vector decoding — against the
in-process fake CQL server."""

import asyncio
import json
import struct
import uuid

import pytest

from vector_store_tpu.core.types import DbIndexKind
from vector_store_tpu.db.cql import types as ct
from vector_store_tpu.db.cql.session import CqlSession
from vector_store_tpu.db.cql.testing import CannedResult, FakeColumn, FakeCqlServer
from vector_store_tpu.db.scylla import (
    ScyllaDb,
    decode_vector_value,
    fullscan_ranges,
    parse_target_option,
    range_scan_query,
    request_query,
)


def schema_handler(cql, values, paging):
    """Simulates system tables for keyspace ks / table tbl with a custom
    vector index."""
    if "system.group0_history" in cql:
        return CannedResult(
            columns=[FakeColumn("state_id", ct.T_TIMEUUID)],
            rows=[(uuid.uuid1(),)],
        )
    if "FROM system_schema.indexes" in cql and "WHERE kind" in cql:
        return CannedResult(
            columns=[
                FakeColumn("keyspace_name", ct.T_VARCHAR),
                FakeColumn("index_name", ct.T_VARCHAR),
                FakeColumn("table_name", ct.T_VARCHAR),
                FakeColumn("options", ct.T_MAP),
            ],
            rows=[
                (
                    "ks",
                    "idx",
                    "tbl",
                    {
                        "class_name": "vector_index",
                        "target": json.dumps({"tc": "emb", "fc": ["flag"]}),
                    },
                ),
                # an unknown class is skipped
                ("ks", "other", "tbl", {"class_name": "weird_index", "target": "emb"}),
            ],
        )
    if "FROM system_schema.columns" in cql:
        # column_name, kind, position, type
        return CannedResult(
            columns=[
                FakeColumn("column_name", ct.T_VARCHAR),
                FakeColumn("kind", ct.T_VARCHAR),
                FakeColumn("position", ct.T_INT),
                FakeColumn("type", ct.T_VARCHAR),
            ],
            rows=[
                ("pk", "partition_key", 0, "int"),
                ("ck", "clustering", 0, "int"),
                ("emb", "regular", -1, "vector<float, 3>"),
                ("flag", "regular", -1, "int"),
            ],
        )
    return None


async def with_db(handler, fn):
    server = FakeCqlServer(handler)
    await server.start()
    session = CqlSession(f"127.0.0.1:{server.port}")
    session.start()
    db = ScyllaDb(session)
    try:
        return await fn(db, server)
    finally:
        await session.stop()
        await server.stop()


class TestDiscovery:
    async def test_schema_version(self):
        async def run(db, server):
            v = await db.latest_schema_version()
            assert isinstance(v, uuid.UUID)

        await with_db(schema_handler, run)

    async def test_get_indexes(self):
        async def run(db, server):
            indexes = await db.get_indexes()
            assert len(indexes) == 1
            idx = indexes[0]
            assert idx.keyspace == "ks" and idx.index == "idx"
            assert idx.primary_key_columns == ("pk", "ck")
            assert idx.partition_key_count == 1
            assert idx.target_columns == ("emb",)
            assert idx.filtering_columns == ("flag",)
            assert idx.partitioning.is_global
            assert idx.kind is DbIndexKind.VECTOR_SEARCH

        await with_db(schema_handler, run)

    async def test_table_schema(self):
        async def run(db, server):
            schema = await db.get_table_schema("ks", "tbl")
            assert schema.partition_key == ["pk"]
            assert schema.clustering_key == ["ck"]
            assert schema.columns["emb"] == "vector<float, 3>"

        await with_db(schema_handler, run)


class TestTargetOption:
    def test_modern_form(self):
        got = parse_target_option(
            json.dumps({"tc": "emb", "pk": ["p"], "fc": ["f1"]}), {"p", "emb", "f1"}, ["p"]
        )
        partitioning, tc, fc = got
        assert not partitioning.is_global
        assert partitioning.local_columns == ("p",)
        assert tc == "emb" and fc == ("f1",)

    def test_legacy_local(self):
        got = parse_target_option(
            json.dumps({"pk": ["p"], "ck": ["emb", "f1"]}), {"p", "emb", "f1"}, ["p"]
        )
        partitioning, tc, fc = got
        assert not partitioning.is_global
        assert tc == "emb" and fc == ("f1",)

    def test_legacy_global(self):
        got = parse_target_option(
            json.dumps({"pk": ["emb"], "ck": ["f1"]}), {"p", "emb", "f1"}, ["p"]
        )
        partitioning, tc, fc = got
        assert partitioning.is_global
        assert tc == "emb" and fc == ("f1",)

    def test_bare_column(self):
        partitioning, tc, fc = parse_target_option("emb", {"emb"}, [])
        assert partitioning.is_global and tc == "emb" and fc == ()

    def test_invalid_pk_column(self):
        assert (
            parse_target_option(
                json.dumps({"tc": "emb", "pk": ["nope"]}), {"emb"}, []
            )
            is None
        )


class TestTokenRanges:
    def test_empty_ring(self):
        assert fullscan_ranges([]) == [(-(2**63), 2**63 - 1)]

    def test_ranges_cover_space(self):
        tokens = [-100, 0, 500]
        ranges = fullscan_ranges(tokens)
        # contiguous, inclusive cover
        assert ranges[0][0] == -(2**63)
        assert ranges[-1][1] == 2**63 - 1
        for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
            assert a2 == b1 + 1


class TestQueries:
    def test_range_scan_query(self):
        q = range_scan_query("ks", "tbl", ["emb", "flag"], ["pk", "ck"], ["pk"])
        assert 'token("pk") >= ?' in q
        assert 'writetime("emb")' in q
        assert "BYPASS CACHE" in q

    def test_alternator_dialect(self):
        q = request_query("alternator_db", "tbl", ["v"], ["pk"])
        assert '":attrs"[\'v\']' in q
        assert 'writetime(":attrs"[\'v\'])' in q


class TestVectorDecode:
    def test_native_list(self):
        assert decode_vector_value([1.0, 2.0], None) == [1.0, 2.0]

    def test_alternator_json_blob(self):
        blob = bytes([4]) + json.dumps([1.5, 2.5]).encode()
        assert decode_vector_value(blob, None) == [1.5, 2.5]

    def test_alternator_f32_blob(self):
        blob = bytes([5]) + struct.pack("!2f", 1.0, 2.0)
        assert list(decode_vector_value(blob, None)) == [1.0, 2.0]

    def test_unknown_tag(self):
        with pytest.raises(ValueError):
            decode_vector_value(bytes([9, 0]), None)


class TestFullScan:
    async def test_scan_feeds_rows(self):
        """End-to-end: ScyllaDbIndex scans ranges and parses rows."""
        from vector_store_tpu.db.fake import make_vs_metadata

        md = make_vs_metadata(dimensions=3)

        def handler(cql, values, paging):
            r = schema_handler(cql, values, paging)
            if r is not None:
                return r
            if "system.local" in cql and "tokens" in cql:
                return CannedResult(
                    columns=[FakeColumn("tokens", ct.T_SET, sub_type_id=ct.T_VARCHAR)],
                    rows=[(["0"],)],
                )
            if "system.peers" in cql and "tokens" in cql:
                return CannedResult(columns=[FakeColumn("tokens", ct.T_SET, sub_type_id=ct.T_VARCHAR)], rows=[])
            if "BYPASS CACHE" in cql:
                lo = struct.unpack("!q", values[0])[0]
                if lo <= 0:  # first range only carries data
                    return CannedResult(
                        columns=[
                            FakeColumn("pk", ct.T_INT),
                            FakeColumn("emb", ct.T_VECTOR, vector_dim=3),
                            FakeColumn("wt", ct.T_BIGINT),
                        ],
                        rows=[(1, [1.0, 2.0, 3.0], 1000000)],
                    )
                return CannedResult(
                    columns=[
                        FakeColumn("pk", ct.T_INT),
                        FakeColumn("emb", ct.T_VECTOR, vector_dim=3),
                        FakeColumn("wt", ct.T_BIGINT),
                    ],
                    rows=[],
                )
            if "_scylla_cdc_log" in cql:
                return CannedResult(
                    columns=[
                        FakeColumn("cdc$time", ct.T_TIMEUUID),
                        FakeColumn("cdc$operation", ct.T_TINYINT),
                        FakeColumn("pk", ct.T_INT),
                    ],
                    rows=[],
                )
            return None

        server = FakeCqlServer(handler)
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        db = ScyllaDb(session)
        started = asyncio.Event()
        finished = asyncio.Event()
        dbi = db.get_db_index(md)
        try:
            dbi.start(started.set, finished.set)
            row, marker = await asyncio.wait_for(dbi.feed.get(), 10)
            assert row.primary_key.values() == (1,)
            assert row.operation.kind == "upsert"
            vec = row.operation.values[0].value
            assert vec.kind == "vector" and list(vec.value) == [1.0, 2.0, 3.0]
            assert row.operation.values[0].timestamp.as_micros() == 1000000
            marker.complete()
            await asyncio.wait_for(finished.wait(), 10)
            assert dbi.full_scan_progress().percentage == 100.0
        finally:
            await dbi.stop()
            await session.stop()
            await server.stop()
