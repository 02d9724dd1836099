"""CDC reader tests: log polling, op classification, dedup, read-after-CDC
row fetch, delete handling — against the fake CQL server."""

import asyncio
import struct
import time
import uuid

import pytest

from vector_store_tpu.db.cql import types as ct
from vector_store_tpu.db.cql.session import CqlSession
from vector_store_tpu.db.cql.testing import CannedResult, FakeColumn, FakeCqlServer
from vector_store_tpu.db.fake import make_vs_metadata
from vector_store_tpu.db.scylla import (
    CDC_OP_INSERT,
    CDC_OP_ROW_DELETE,
    CdcReaderPair,
    ScyllaDb,
    _min_timeuuid,
    _timeuuid_timestamp,
)


def timeuuid_now():
    return _min_timeuuid(time.time() - 1.0)


class TestTimeuuid:
    def test_roundtrip(self):
        now = time.time()
        u = _min_timeuuid(now)
        assert u.version == 1
        ts = _timeuuid_timestamp(u)
        assert abs(ts.as_seconds() - now) < 1e-3

    def test_ordering(self):
        a = _min_timeuuid(100.0)
        b = _min_timeuuid(200.0)
        assert a.time < b.time


async def run_cdc_test(log_rows, base_row, expect):
    """Start a fine CDC reader against canned log/base rows; wait for
    `expect(feed_items)` to pass."""
    md = make_vs_metadata(dimensions=2, primary_key_columns=("pk",))

    def handler(cql, values, paging):
        if "_scylla_cdc_log" in cql:
            return CannedResult(
                columns=[
                    FakeColumn("cdc$time", ct.T_TIMEUUID),
                    FakeColumn("cdc$operation", ct.T_TINYINT),
                    FakeColumn("pk", ct.T_INT),
                ],
                rows=log_rows,
            )
        if "SELECT" in cql and "tbl" in cql:
            return CannedResult(
                columns=[
                    FakeColumn("emb", ct.T_VECTOR, vector_dim=2),
                    FakeColumn("wt", ct.T_BIGINT),
                ],
                rows=[base_row] if base_row is not None else [],
            )
        return None

    server = FakeCqlServer(handler)
    await server.start()
    session = CqlSession(f"127.0.0.1:{server.port}")
    session.start()
    db = ScyllaDb(
        session, cdc_fine_safety_interval=0.0, cdc_fine_sleep_interval=0.05
    )
    feed: asyncio.Queue = asyncio.Queue()
    pair = CdcReaderPair(db, md, feed)
    # only run the fine reader for determinism
    loop = asyncio.get_running_loop()
    task = loop.create_task(pair._reader("fine", 0.0, 0.05))
    items = []
    try:
        deadline = loop.time() + 10
        while not expect(items):
            try:
                item = await asyncio.wait_for(feed.get(), 0.2)
                items.append(item)
            except asyncio.TimeoutError:
                pass
            assert loop.time() < deadline, items
        return items
    finally:
        pair._stopped = True
        task.cancel()
        try:
            await task
        except (asyncio.CancelledError, Exception):
            pass
        await session.stop()
        await server.stop()


class TestCdcReader:
    async def test_insert_read_after_cdc(self):
        t = timeuuid_now()
        items = await run_cdc_test(
            log_rows=[(t, CDC_OP_INSERT, 7)],
            base_row=([1.0, 2.0], 1_000_000),
            expect=lambda items: len(items) >= 1,
        )
        row, marker = items[0]
        assert row.primary_key.values() == (7,)
        assert row.operation.kind == "upsert"
        assert list(row.operation.values[0].value.value) == [1.0, 2.0]
        assert marker.kind == "cdc"

    async def test_delete(self):
        t = timeuuid_now()
        items = await run_cdc_test(
            log_rows=[(t, CDC_OP_ROW_DELETE, 9)],
            base_row=None,
            expect=lambda items: len(items) >= 1,
        )
        row, _ = items[0]
        assert row.operation.kind == "delete"

    async def test_upsert_of_vanished_row_becomes_delete(self):
        t = timeuuid_now()
        items = await run_cdc_test(
            log_rows=[(t, CDC_OP_INSERT, 5)],
            base_row=None,  # row already gone at read-after-CDC time
            expect=lambda items: len(items) >= 1,
        )
        row, _ = items[0]
        assert row.operation.kind == "delete"

    async def test_dedup(self):
        # identical (pk, time, op) rows returned on every poll: one delivery
        t = timeuuid_now()
        items = await run_cdc_test(
            log_rows=[(t, CDC_OP_INSERT, 7), (t, CDC_OP_INSERT, 7)],
            base_row=([1.0, 2.0], 1_000_000),
            expect=lambda items: len(items) >= 1,
        )
        await asyncio.sleep(0)  # the poll loop already ran several times
        assert len(items) == 1

    async def test_stream_generation_aware_reads(self):
        """When the cluster exposes CDC generations, the reader must issue
        per-stream single-partition queries (no ALLOW FILTERING) across ALL
        generations active in the window (db_cdc/actor.rs:439-488)."""
        import datetime as dt

        md = make_vs_metadata(dimensions=2, primary_key_columns=("pk",))
        now = time.time()
        # gen1 active until now-300, gen2 from now-300 on; the reader's
        # 10-minute checkpoint window overlaps both
        gen1 = dt.datetime.fromtimestamp(now - 86400, tz=dt.timezone.utc)
        gen2 = dt.datetime.fromtimestamp(now - 300, tz=dt.timezone.utc)
        s1, s2, s3 = b"\x01" * 16, b"\x02" * 16, b"\x03" * 16
        t = timeuuid_now()
        queried_streams: list[bytes] = []

        def handler(cql, values, paging):
            if "cdc_generation_timestamps" in cql:
                return CannedResult(
                    columns=[FakeColumn("time", ct.T_TIMESTAMP)],
                    rows=[(gen2,), (gen1,)],
                )
            if "cdc_streams_descriptions_v2" in cql:
                # values[0] is the encoded timestamp param
                millis = struct.unpack("!q", values[0])[0]
                streams = [s1, s2] if abs(millis / 1e3 - gen1.timestamp()) < 1 else [s3]
                return CannedResult(
                    columns=[
                        FakeColumn("streams", ct.T_SET, sub_type_id=ct.T_BLOB)
                    ],
                    rows=[(streams,)],
                )
            if "_scylla_cdc_log" in cql:
                assert "ALLOW FILTERING" not in cql, cql
                assert 'cdc$stream_id' in cql, cql
                sid = values[0]
                queried_streams.append(sid)
                if sid == s3:
                    return CannedResult(
                        columns=[
                            FakeColumn("cdc$time", ct.T_TIMEUUID),
                            FakeColumn("cdc$operation", ct.T_TINYINT),
                            FakeColumn("pk", ct.T_INT),
                        ],
                        rows=[(t, CDC_OP_INSERT, 42)],
                    )
                return CannedResult(
                    columns=[
                        FakeColumn("cdc$time", ct.T_TIMEUUID),
                        FakeColumn("cdc$operation", ct.T_TINYINT),
                        FakeColumn("pk", ct.T_INT),
                    ],
                    rows=[],
                )
            if "SELECT" in cql and "tbl" in cql:
                return CannedResult(
                    columns=[
                        FakeColumn("emb", ct.T_VECTOR, vector_dim=2),
                        FakeColumn("wt", ct.T_BIGINT),
                    ],
                    rows=[([3.0, 4.0], 1_000_000)],
                )
            return None

        server = FakeCqlServer(handler)
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        db = ScyllaDb(
            session, cdc_fine_safety_interval=0.0, cdc_fine_sleep_interval=0.05
        )
        feed: asyncio.Queue = asyncio.Queue()
        pair = CdcReaderPair(db, md, feed)
        loop = asyncio.get_running_loop()
        task = loop.create_task(pair._reader("fine", 0.0, 0.05))
        try:
            row, marker = await asyncio.wait_for(feed.get(), 10)
            assert row.primary_key.values() == (42,)
            assert row.operation.kind == "upsert"
            # the 10-min checkpoint window overlaps both generations: all
            # three streams must have been queried individually
            assert {bytes(s) for s in queried_streams} == {s1, s2, s3}
            # and no full-scan fallback was used for the log table
            assert not any(
                "ALLOW FILTERING" in q for q in server.queries if "_scylla_cdc_log" in q
            )
        finally:
            pair._stopped = True
            task.cancel()
            try:
                await task
            except (asyncio.CancelledError, Exception):
                pass
            await session.stop()
            await server.stop()

    async def test_dedup_survives_generation_rotation(self):
        """The bounded two-generation dedup must still reject a duplicate
        arriving right after a rotation (the old wholesale clear() forgot
        everything)."""
        md = make_vs_metadata(dimensions=2, primary_key_columns=("pk",))
        feed: asyncio.Queue = asyncio.Queue()
        pair = CdcReaderPair.__new__(CdcReaderPair)
        pair._dedup_cur = set()
        pair._dedup_prev = set()
        keys = [
            (i.to_bytes(4, "big"), i, 2)
            for i in range(CdcReaderPair.DEDUP_GENERATION + 1)
        ]
        for k in keys:
            assert k not in pair._dedup_cur and k not in pair._dedup_prev
            pair._dedup_cur.add(k)
            if len(pair._dedup_cur) > CdcReaderPair.DEDUP_GENERATION:
                pair._dedup_prev = pair._dedup_cur
                pair._dedup_cur = set()
        # immediately after rotation: every previously-seen key still caught
        assert all(
            (k in pair._dedup_cur or k in pair._dedup_prev) for k in keys[-10:]
        )

    async def test_preimage_skipped(self):
        from vector_store_tpu.db.scylla import CDC_OP_PRE_IMAGE

        t = timeuuid_now()
        t2 = _min_timeuuid(time.time() - 0.5)
        items = await run_cdc_test(
            log_rows=[(t, CDC_OP_PRE_IMAGE, 1), (t2, CDC_OP_INSERT, 2)],
            base_row=([0.5, 0.5], 1_000_000),
            expect=lambda items: len(items) >= 1,
        )
        assert all(r.primary_key.values() != (1,) for r, _ in items)
