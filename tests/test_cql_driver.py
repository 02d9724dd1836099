"""CQL protocol driver tests against the in-process fake server."""

import asyncio
import struct
import uuid

import pytest

from vector_store_tpu.db.cql import CqlConnection, CqlError, CqlSession
from vector_store_tpu.db.cql import types as ct
from vector_store_tpu.db.cql.testing import CannedResult, FakeColumn, FakeCqlServer


def make_handler(results: dict):
    def handler(cql, values, paging):
        for key, result in results.items():
            if key in cql:
                return result(cql, values, paging) if callable(result) else result
        return None

    return handler


async def with_server(handler, fn, require_auth=None, **connect_kw):
    server = FakeCqlServer(handler, require_auth=require_auth)
    await server.start()
    conn = CqlConnection("127.0.0.1", server.port)
    try:
        await conn.connect(**connect_kw)
        return await fn(conn, server)
    finally:
        await conn.close()
        await server.stop()


class TestConnection:
    async def test_query_roundtrip(self):
        results = {
            "SELECT name": CannedResult(
                columns=[
                    FakeColumn("name", ct.T_VARCHAR),
                    FakeColumn("n", ct.T_INT),
                ],
                rows=[("alpha", 1), ("beta", 2)],
            )
        }

        async def run(conn, server):
            rs = await conn.query("SELECT name, n FROM t")
            assert rs.rows == [("alpha", 1), ("beta", 2)]
            assert rs.columns.names == ["name", "n"]

        await with_server(make_handler(results), run)

    async def test_typed_values(self):
        u = uuid.uuid4()
        results = {
            "SELECT typed": CannedResult(
                columns=[
                    FakeColumn("b", ct.T_BOOLEAN),
                    FakeColumn("big", ct.T_BIGINT),
                    FakeColumn("f", ct.T_DOUBLE),
                    FakeColumn("u", ct.T_UUID),
                    FakeColumn("v", ct.T_VARINT),
                    FakeColumn("nul", ct.T_INT),
                ],
                rows=[(True, 2**40, 1.5, u, -(2**70), None)],
            )
        }

        async def run(conn, server):
            rs = await conn.query("SELECT typed")
            assert rs.rows[0] == (True, 2**40, 1.5, u, -(2**70), None)

        await with_server(make_handler(results), run)

    async def test_vector_type_decodes(self):
        results = {
            "SELECT emb": CannedResult(
                columns=[FakeColumn("emb", ct.T_VECTOR, vector_dim=3)],
                rows=[([1.0, 2.0, 3.0],)],
            )
        }

        async def run(conn, server):
            rs = await conn.query("SELECT emb FROM t")
            assert list(rs.rows[0][0]) == [1.0, 2.0, 3.0]

        await with_server(make_handler(results), run)

    async def test_bound_values_reach_server(self):
        seen = {}

        def handler(cql, values, paging):
            seen["values"] = values
            return None

        async def run(conn, server):
            await conn.query("INSERT", values=["hello", 42])
            assert seen["values"][0] == b"hello"
            assert seen["values"][1] == struct.pack("!q", 42)

        await with_server(handler, run)

    async def test_error_raises(self):
        def handler(cql, values, paging):
            raise RuntimeError("boom")

        async def run(conn, server):
            with pytest.raises(CqlError, match="boom"):
                await conn.query("SELECT x")

        await with_server(handler, run)

    async def test_prepare_execute(self):
        results = {
            "SELECT p": CannedResult(
                columns=[FakeColumn("x", ct.T_INT)], rows=[(7,)]
            )
        }

        async def run(conn, server):
            prep = await conn.prepare("SELECT p FROM t WHERE k = ?")
            rs = await conn.execute(prep, values=[1])
            assert rs.rows == [(7,)]

        await with_server(make_handler(results), run)

    async def test_auth(self):
        async def run(conn, server):
            rs = await conn.query("SELECT 1")
            assert rs.rows == []

        await with_server(
            make_handler({}),
            run,
            require_auth=("user", "pass"),
            username="user",
            password="pass",
        )

    async def test_bad_auth(self):
        server = FakeCqlServer(make_handler({}), require_auth=("user", "pass"))
        await server.start()
        conn = CqlConnection("127.0.0.1", server.port)
        try:
            with pytest.raises(CqlError):
                await conn.connect(username="user", password="wrong")
        finally:
            await conn.close()
            await server.stop()

    async def test_concurrent_streams(self):
        def handler(cql, values, paging):
            n = int(cql.rsplit(" ", 1)[-1])
            return CannedResult(columns=[FakeColumn("n", ct.T_INT)], rows=[(n,)])

        async def run(conn, server):
            results = await asyncio.gather(
                *[conn.query(f"SELECT n {i}") for i in range(50)]
            )
            assert [rs.rows[0][0] for rs in results] == list(range(50))

        await with_server(handler, run)

    async def test_paging_state(self):
        def handler(cql, values, paging):
            if paging is None:
                return CannedResult(
                    columns=[FakeColumn("n", ct.T_INT)],
                    rows=[(1,)],
                    paging_state=b"page2",
                )
            assert paging == b"page2"
            return CannedResult(columns=[FakeColumn("n", ct.T_INT)], rows=[(2,)])

        async def run(conn, server):
            rs = await conn.query("SELECT n", page_size=1)
            assert rs.rows == [(1,)] and rs.paging_state == b"page2"
            rs2 = await conn.query("SELECT n", page_size=1, paging_state=rs.paging_state)
            assert rs2.rows == [(2,)] and rs2.paging_state is None

        await with_server(handler, run)


class TestSession:
    async def test_session_reconnects(self):
        results = {"SELECT": CannedResult(columns=[FakeColumn("n", ct.T_INT)], rows=[(1,)])}
        server = FakeCqlServer(make_handler(results))
        await server.start()
        session = CqlSession(f"127.0.0.1:{server.port}")
        session.start()
        try:
            rs = await session.query("SELECT n")
            assert rs.rows == [(1,)]
            assert session.is_connected
        finally:
            await session.stop()
            await server.stop()

    async def test_session_waits_for_server(self):
        import socket

        # reserve a free port, start session first, server later
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        session = CqlSession(f"127.0.0.1:{port}")
        session.start()
        server = FakeCqlServer(
            make_handler(
                {"SELECT": CannedResult(columns=[FakeColumn("n", ct.T_INT)], rows=[(9,)])}
            )
        )
        try:
            await asyncio.sleep(1.2)  # let a connect attempt fail
            assert session.connect_failures >= 1

            # bind to the same port now
            server._server = await asyncio.start_server(
                server._client, "127.0.0.1", port
            )
            rs = await session.query("SELECT n")
            assert rs.rows == [(9,)]
        finally:
            await session.stop()
            await server.stop()
