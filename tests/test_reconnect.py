"""Fault-injection tier: session loss, refused connections, mid-scan
failures, CDC handler errors, and two-node HA — the in-process equivalent
of the reference validator's reconnect.rs / high_availability.rs groups
(connections cut at the socket instead of a firewall)."""

import asyncio
import struct
import time

import pytest

from vector_store_tpu.db.cql import session as session_mod
from vector_store_tpu.db.cql import types as ct
from vector_store_tpu.db.cql.session import CqlSession
from vector_store_tpu.db.cql.testing import CannedResult, FakeColumn, FakeCqlServer
from vector_store_tpu.db.fake import make_vs_metadata
from vector_store_tpu.db.scylla import CDC_OP_INSERT, CdcReaderPair, ScyllaDb, _min_timeuuid


@pytest.fixture(autouse=True)
def fast_reconnect(monkeypatch):
    monkeypatch.setattr(session_mod, "RECONNECT_INTERVAL", 0.05)


def ping_handler(cql, values, paging):
    if "system.local" in cql:
        return CannedResult(columns=[FakeColumn("key", ct.T_VARCHAR)], rows=[("local",)])
    return None


class TestSessionReconnect:
    async def test_drop_all_then_resume(self):
        """Severing every live connection must trigger a reconnect and
        later queries must succeed on the new session (db.rs:278-336)."""
        server = FakeCqlServer(ping_handler)
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        try:
            rs = await session.query("SELECT key FROM system.local")
            assert rs.one() == ("local",)
            first_reconnects = session.reconnects
            server.drop_all_connections()
            # wait until the session notices and re-establishes
            deadline = time.time() + 10
            while session.reconnects <= first_reconnects:
                assert time.time() < deadline
                await asyncio.sleep(0.05)
            rs = await session.query("SELECT key FROM system.local")
            assert rs.one() == ("local",)
        finally:
            await session.stop()
            await server.stop()

    async def test_refused_connections_retry_until_accepted(self):
        """Refused connections accumulate connect_failures; once the server
        accepts again the session comes up (httpserver-style bind retry on
        the client side)."""
        server = FakeCqlServer(ping_handler)
        server.refuse_connections = True
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        try:
            deadline = time.time() + 10
            while session.connect_failures < 2:
                assert time.time() < deadline
                await asyncio.sleep(0.05)
            assert not session.is_connected
            server.refuse_connections = False
            rs = await asyncio.wait_for(
                session.query("SELECT key FROM system.local"), 10
            )
            assert rs.one() == ("local",)
        finally:
            await session.stop()
            await server.stop()

    async def test_prepared_statements_survive_reconnect(self):
        """Prepared ids die with the connection; the session must re-prepare
        transparently on the new one."""
        server = FakeCqlServer(ping_handler)
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        try:
            rs = await session.execute_prepared("SELECT key FROM system.local")
            assert rs.one() == ("local",)
            server.drop_all_connections()
            await asyncio.sleep(0.2)
            rs = await asyncio.wait_for(
                session.execute_prepared("SELECT key FROM system.local"), 10
            )
            assert rs.one() == ("local",)
        finally:
            await session.stop()
            await server.stop()


class TestScanRetry:
    async def test_mid_scan_failure_retries_and_completes(self):
        """A range query that fails transiently must be retried with backoff
        until it succeeds; the scan still reaches 100% (db_index.rs:407-433)."""
        md = make_vs_metadata(dimensions=2)
        fail_remaining = [2]

        def handler(cql, values, paging):
            if "system.local" in cql and "tokens" in cql:
                return CannedResult(
                    columns=[FakeColumn("tokens", ct.T_SET, sub_type_id=ct.T_VARCHAR)],
                    rows=[(["0"],)],
                )
            if "system.peers" in cql and "tokens" in cql:
                return CannedResult(
                    columns=[FakeColumn("tokens", ct.T_SET, sub_type_id=ct.T_VARCHAR)],
                    rows=[],
                )
            if "BYPASS CACHE" in cql:
                lo = struct.unpack("!q", values[0])[0]
                if lo <= 0:
                    if fail_remaining[0] > 0:
                        fail_remaining[0] -= 1
                        raise RuntimeError("simulated range failure")
                    return CannedResult(
                        columns=[
                            FakeColumn("pk", ct.T_INT),
                            FakeColumn("emb", ct.T_VECTOR, vector_dim=2),
                            FakeColumn("wt", ct.T_BIGINT),
                        ],
                        rows=[(3, [0.5, 0.5], 1_000_000)],
                    )
                return CannedResult(
                    columns=[
                        FakeColumn("pk", ct.T_INT),
                        FakeColumn("emb", ct.T_VECTOR, vector_dim=2),
                        FakeColumn("wt", ct.T_BIGINT),
                    ],
                    rows=[],
                )
            if "_scylla_cdc_log" in cql or "cdc_generation" in cql:
                return CannedResult(
                    columns=[FakeColumn("cdc$time", ct.T_TIMEUUID)], rows=[]
                )
            return None

        server = FakeCqlServer(handler)
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        db = ScyllaDb(session)
        dbi = db.get_db_index(md)
        finished = asyncio.Event()
        try:
            dbi.start(lambda: None, finished.set)
            row, marker = await asyncio.wait_for(dbi.feed.get(), 15)
            assert row.primary_key.values() == (3,)
            assert fail_remaining[0] == 0  # both injected failures consumed
            marker.complete()
            await asyncio.wait_for(finished.wait(), 10)
            assert dbi.full_scan_progress().percentage == 100.0
        finally:
            await dbi.stop()
            await session.stop()
            await server.stop()


class TestCdcRecovery:
    async def test_cdc_errors_then_resume(self):
        """CDC polls that error must count handler errors, back off, and
        deliver rows once the log becomes readable again
        (db_cdc/actor.rs:143-183)."""
        md = make_vs_metadata(dimensions=2, primary_key_columns=("pk",))
        t = _min_timeuuid(time.time() - 1.0)
        fail_remaining = [2]

        def handler(cql, values, paging):
            if "_scylla_cdc_log" in cql:
                if fail_remaining[0] > 0:
                    fail_remaining[0] -= 1
                    raise RuntimeError("simulated cdc failure")
                return CannedResult(
                    columns=[
                        FakeColumn("cdc$time", ct.T_TIMEUUID),
                        FakeColumn("cdc$operation", ct.T_TINYINT),
                        FakeColumn("pk", ct.T_INT),
                    ],
                    rows=[(t, CDC_OP_INSERT, 11)],
                )
            if "SELECT" in cql and "tbl" in cql:
                return CannedResult(
                    columns=[
                        FakeColumn("emb", ct.T_VECTOR, vector_dim=2),
                        FakeColumn("wt", ct.T_BIGINT),
                    ],
                    rows=[([1.0, 1.0], 1_000_000)],
                )
            return None

        server = FakeCqlServer(handler)
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        db = ScyllaDb(session, cdc_fine_safety_interval=0.0, cdc_fine_sleep_interval=0.05)
        feed: asyncio.Queue = asyncio.Queue()
        pair = CdcReaderPair(db, md, feed)
        # shrink the error backoff for the test
        loop = asyncio.get_running_loop()
        task = loop.create_task(pair._reader("fine", 0.0, 0.05))
        try:
            row, marker = await asyncio.wait_for(feed.get(), 20)
            assert row.primary_key.values() == (11,)
            assert fail_remaining[0] == 0
        finally:
            pair._stopped = True
            task.cancel()
            try:
                await task
            except (asyncio.CancelledError, Exception):
                pass
            await session.stop()
            await server.stop()


class TestHighAvailability:
    async def test_two_replicas_one_dies(self):
        """The reference's HA model: N identical vector-store nodes each
        build every index independently; a client fails over between them
        (validator high_availability.rs). Two in-process services on one
        loopback, one killed mid-flight."""
        import numpy as np
        from aiohttp.test_utils import TestServer

        from vector_store_tpu.client import VectorStoreClient
        from vector_store_tpu.db.fake import FakeDb, FakeIndex, FakeTable, vector_row
        from vector_store_tpu.run import build_service
        from vector_store_tpu.service.config import Config
        from vector_store_tpu.service.node_state import NodeStatus

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(20, 4)).astype(np.float32)

        async def make_replica():
            db = FakeDb()
            db.add_table(FakeTable("ks", "tbl", ("pk",)))
            rows = [vector_row((i,), vecs[i].tolist(), 100) for i in range(20)]
            db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=4), scan=rows))
            service = await build_service(db, Config(monitor_indexes_interval=0.05))
            server = TestServer(service.app)
            await server.start_server()
            return service, server

        s1, h1 = await make_replica()
        s2, h2 = await make_replica()
        try:
            from vector_store_tpu.service.node_state import IndexStatus

            for svc in (s1, s2):
                deadline = time.time() + 15
                while svc.node_state.get_status() is not NodeStatus.SERVING:
                    assert time.time() < deadline
                    await asyncio.sleep(0.05)
                entry = svc.indexes.get_vs(("ks", "idx"))
                while (
                    entry.status is not IndexStatus.SERVING
                    or await entry.actor.count() < 20
                ):
                    assert time.time() < deadline
                    svc.engine.update_entries()
                    await asyncio.sleep(0.05)

            urls = [f"http://127.0.0.1:{h1.port}", f"http://127.0.0.1:{h2.port}"]

            async def failover_ann(vector, limit):
                last = None
                for url in urls:
                    try:
                        async with VectorStoreClient(url) as c:
                            return await c.ann("ks", "idx", vector, limit=limit)
                    except Exception as e:
                        last = e
                raise last

            res = await failover_ann(vecs[5].tolist(), 2)
            assert res.primary_keys["pk"][0] == 5

            # replica 1 dies; the same query must succeed via replica 2
            await h1.close()
            await s1.stop()
            res = await failover_ann(vecs[5].tolist(), 2)
            assert res.primary_keys["pk"][0] == 5
        finally:
            await h2.close()
            await s2.stop()
