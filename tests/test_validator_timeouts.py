"""Validator-equivalent: connection_timeout + db_timeout
(crates/validator/src/connection_timeout.rs, db_timeout.rs).

connection_timeout: a server that accepts TCP but never answers STARTUP
must fail the attempt client-side (handshake timeout) so the session keeps
retrying and the node stays CONNECTING_TO_DB; once the server answers, the
node recovers to SERVING.

db_timeout: a query whose response never arrives times out client-side on
its own stream while OTHER streams keep flowing (multiplexing), and the
scan-retry machinery drives the index to SERVING once the stall clears.
"""

import asyncio
import math
import time

from vector_store_tpu.service.node_state import NodeStatus

from validator_common import WireService, make_schema_handler

ROWS = [(i, [math.cos(i), math.sin(i), 0.0], 1_000_000) for i in range(5)]


async def test_stalled_startup_times_out_then_recovers():
    """connection_timeout.rs::connection_timeout_triggers_session_failure
    + recovery: handshake attempts fail on timeout (not hang), and the
    node serves after the server starts answering."""

    def cfg(server):
        server.stall_startup = True

    async with WireService(
        make_schema_handler(rows=ROWS),
        configure_server=cfg,
        connect_timeout=0.5,
    ) as ws:
        deadline = time.time() + 15
        while ws.session.connect_failures < 2:
            assert time.time() < deadline
            await asyncio.sleep(0.05)
        assert ws.service.node_state.get_status() is NodeStatus.CONNECTING_TO_DB
        # the server comes back: next attempt handshakes and the node serves
        ws.server.stall_startup = False
        await ws.wait_serving()
        await ws.wait_index_count(("ks", "idx"), 5)


async def test_stalled_query_times_out_without_blocking_other_streams():
    """db_timeout.rs::client_timeout_doesnt_stop_cdc analogue: one stalled
    stream times out client-side; a concurrent query on the same
    connection completes meanwhile."""
    from vector_store_tpu.db.cql.connection import CqlError
    from vector_store_tpu.db.cql.session import CqlSession
    from vector_store_tpu.db.cql.testing import FakeCqlServer
    from vector_store_tpu.db.cql import types as ct
    from vector_store_tpu.db.cql.testing import CannedResult, FakeColumn

    def handler(cql, values, paging):
        return CannedResult(
            columns=[FakeColumn("key", ct.T_VARCHAR)], rows=[("local",)]
        )

    server = FakeCqlServer(handler)
    server.stall_predicate = lambda cql: "SLOW" in cql
    await server.start()
    session = CqlSession(f"127.0.0.1:{server.port}", request_timeout=0.5)
    session.start()
    try:
        slow = asyncio.ensure_future(session.query("SELECT SLOW FROM t"))
        # the fast query on another stream completes while SLOW hangs
        rs = await asyncio.wait_for(session.query("SELECT key FROM system.local"), 5)
        assert rs.one() == ("local",)
        try:
            await slow
            raise AssertionError("stalled query did not time out")
        except CqlError as e:
            assert "timed out" in e.message
        # the connection is still healthy after the timeout
        rs = await asyncio.wait_for(session.query("SELECT key FROM system.local"), 5)
        assert rs.one() == ("local",)
    finally:
        await session.stop()
        await server.stop()


async def test_stalled_scan_retries_after_timeout():
    """A stalled full-scan range query times out and the scan retry loop
    (db_index.rs:407-433 parity) completes the scan once the stall
    clears — the index still reaches SERVING."""
    state = {"stalls": 1}

    def cfg(server):
        def stall(cql):
            if "BYPASS CACHE" in cql and state["stalls"] > 0:
                state["stalls"] -= 1
                return True
            return False

        server.stall_predicate = stall

    async with WireService(
        make_schema_handler(rows=ROWS),
        configure_server=cfg,
        request_timeout=0.5,
    ) as ws:
        await ws.wait_serving(timeout=30)
        await ws.wait_index_count(("ks", "idx"), 5)
        assert state["stalls"] == 0  # the stall was actually consumed
