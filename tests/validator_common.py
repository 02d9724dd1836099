"""Shared harness for the validator-equivalent e2e modules
(tests/test_validator_*.py): a canned CQL system-schema for a regular
(non-Alternator) keyspace served by the in-process fake CQL server, and a
helper that boots the FULL service (ScyllaDb wire driver -> discovery ->
scan -> serving -> HTTP) against it.

Mirrors the role of the reference's crates/validator/src/common.rs +
e2etest fixtures: the reference drives real scylla+vector-store binaries
on loopback subnets; here the scylla side is the fake wire server and the
vector-store side is the real service in-process.
"""

from __future__ import annotations

import asyncio
import json
import struct
import time
import uuid

from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.db.cql import types as ct
from vector_store_tpu.db.cql.session import CqlSession
from vector_store_tpu.db.cql.testing import CannedResult, FakeColumn, FakeCqlServer
from vector_store_tpu.db.scylla import ScyllaDb
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config
from vector_store_tpu.service.node_state import NodeStatus

KS = "ks"
TBL = "tbl"
DIMS = 3


def make_schema_handler(
    rows: list[tuple[int, list[float], int]] | None = None,
    index_options: dict | None = None,
    indexes: list[tuple[str, str, dict]] | None = None,
):
    """Handler serving the system tables for keyspace ks/table tbl with a
    custom vector index ``idx`` on column ``emb`` (vector<float, 3>).

    rows: (pk, vector, writetime_micros) full-scan rows.
    index_options: extra CREATE INDEX options (similarity_function, ...).
    indexes: override the full (index_name, table, options) list.
    """
    schema_version = uuid.uuid4()
    scan_rows = rows if rows is not None else []

    def options_for(name: str) -> dict:
        base = {
            "class_name": "vector_index",
            "target": json.dumps({"tc": "emb"}),
        }
        base.update(index_options or {})
        return base

    index_list = indexes if indexes is not None else [("idx", TBL, options_for("idx"))]

    def handler(cql, values, paging):
        if "system.group0_history" in cql:
            return CannedResult(
                columns=[FakeColumn("state_id", ct.T_TIMEUUID)],
                rows=[(uuid.uuid1(),)],
            )
        if "schema_version" in cql:
            return CannedResult(
                columns=[FakeColumn("schema_version", ct.T_UUID)],
                rows=[(schema_version,)] if "system.local" in cql else [],
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
                    rows=[(KS, name, tbl, opts) for name, tbl, opts in index_list],
                )
            # lookup by (keyspace, index): serve table/options as requested
            want_index = None
            if values and len(values) >= 2 and values[1] is not None:
                want_index = values[1].decode("utf-8", "replace")
            match = next(
                (e for e in index_list if e[0] == want_index), index_list[0]
            )
            name, tbl, opts = match
            if "table_name" in cql and "options" in cql:
                return CannedResult(
                    columns=[
                        FakeColumn("table_name", ct.T_VARCHAR),
                        FakeColumn("options", ct.T_MAP),
                    ],
                    rows=[(tbl, opts)],
                )
            if "options" in cql:
                return CannedResult(
                    columns=[FakeColumn("options", ct.T_MAP)], rows=[(opts,)]
                )
            return CannedResult(
                columns=[FakeColumn("table_name", ct.T_VARCHAR)], rows=[(tbl,)]
            )
        if "FROM system_schema.columns" in cql:
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
                        ("pk", "regular", -1, "int"),
                    ],
                )
            if "column_name = ?" in cql:
                # single-column type lookup (dimensions from type)
                return CannedResult(
                    columns=[FakeColumn("type", ct.T_VARCHAR)],
                    rows=[(f"vector<float, {DIMS}>",)],
                )
            return CannedResult(
                columns=cols,
                rows=[
                    ("pk", "partition_key", 0, "int"),
                    ("emb", "regular", -1, f"vector<float, {DIMS}>"),
                ],
            )
        if "tokens" in cql:
            return CannedResult(
                columns=[FakeColumn("tokens", ct.T_SET, sub_type_id=ct.T_VARCHAR)],
                rows=[(["0"],)] if "system.local" in cql else [],
            )
        if "BYPASS CACHE" in cql:
            lo = struct.unpack("!q", values[0])[0]
            cols = [
                FakeColumn("pk", ct.T_INT),
                FakeColumn("emb", ct.T_VECTOR, vector_dim=DIMS),
                FakeColumn("wt", ct.T_BIGINT),
            ]
            if lo > 0:
                return CannedResult(columns=cols, rows=[])
            return CannedResult(
                columns=cols,
                rows=[(pk, vec, wt) for pk, vec, wt in scan_rows],
            )
        if (
            "_scylla_cdc_log" in cql
            or "cdc_generation" in cql
            or "cdc_streams" in cql
        ):
            return CannedResult(
                columns=[FakeColumn("cdc$time", ct.T_TIMEUUID)], rows=[]
            )
        return None

    return handler


class WireService:
    """Full service over the fake CQL wire: server + session + ScyllaDb +
    service + HTTP TestServer."""

    def __init__(
        self,
        handler,
        config: Config | None = None,
        require_auth: tuple[str, str] | None = None,
        **session_kw,
    ):
        self.handler = handler
        self.config = config or Config(monitor_indexes_interval=0.05)
        self.require_auth = require_auth
        self.configure_server = session_kw.pop("configure_server", None)
        self.session_kw = session_kw
        self.server: FakeCqlServer | None = None
        self.session: CqlSession | None = None
        self.service = None
        self.http: TestServer | None = None

    async def __aenter__(self):
        self.server = FakeCqlServer(self.handler, require_auth=self.require_auth)
        if self.configure_server is not None:
            self.configure_server(self.server)
        await self.server.start()
        self.session = CqlSession(
            f"127.0.0.1:{self.server.port}", **self.session_kw
        )
        self.session.start()
        db = ScyllaDb(
            self.session,
            cdc_fine_safety_interval=0.0,
            cdc_fine_sleep_interval=0.05,
        )
        self.service = await build_service(db, self.config)
        self.http = TestClient(TestServer(self.service.app))
        await self.http.start_server()
        return self

    async def __aexit__(self, *exc):
        if self.http:
            await self.http.close()
        if self.service:
            await self.service.stop()
        if self.session:
            await self.session.stop()
        if self.server:
            await self.server.stop()

    async def wait_serving(self, timeout: float = 20.0) -> None:
        deadline = time.time() + timeout
        while self.service.node_state.get_status() is not NodeStatus.SERVING:
            assert time.time() < deadline, (
                f"node stuck in {self.service.node_state.get_status()}"
            )
            await asyncio.sleep(0.05)

    async def wait_index_count(
        self, key: tuple[str, str], n: int, timeout: float = 20.0
    ) -> None:
        from vector_store_tpu.service.node_state import IndexStatus

        deadline = time.time() + timeout
        while True:
            entry = self.service.indexes.get_vs(key)
            if (
                entry is not None
                and await entry.actor.count() >= n
                and entry.status is IndexStatus.SERVING
            ):
                return
            assert time.time() < deadline
            self.service.engine.update_entries()
            await asyncio.sleep(0.05)
