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
        assert row.operation.values[0].value.value == [1.0, 2.0]
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
