"""Validator-equivalent: auth (crates/validator/src/auth.rs).

The reference asserts a vector-store node without credentials (or with the
wrong ones) stays in ConnectingToDb against an auth-requiring Scylla, and
reaches Serving once granted. Here the fake CQL server requires a
PasswordAuthenticator handshake and the FULL service runs over the real
wire driver.
"""

import asyncio
import math

from vector_store_tpu.service.node_state import NodeStatus

from validator_common import WireService, make_schema_handler

# distinct directions (cosine space): query row 3's exact vector below
ROWS = [
    (i, [math.cos(i), math.sin(i), 0.0], 1_000_000) for i in range(5)
]
CREDS = ("cassandra", "sekrit")


async def test_no_credentials_stays_connecting():
    """auth.rs::vs_doesnt_work_without_permission: handshake rejected ->
    node never leaves CONNECTING_TO_DB; connect failures accumulate."""
    async with WireService(
        make_schema_handler(rows=ROWS), require_auth=CREDS
    ) as ws:
        deadline = asyncio.get_event_loop().time() + 10
        while ws.session.connect_failures < 2:
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)
        assert ws.service.node_state.get_status() is NodeStatus.CONNECTING_TO_DB
        resp = await (await ws.http.get("/api/v1/status")).json()
        assert resp == "CONNECTING_TO_DB"


async def test_wrong_credentials_stays_connecting():
    async with WireService(
        make_schema_handler(rows=ROWS),
        require_auth=CREDS,
        username="cassandra",
        password="wrong",
    ) as ws:
        deadline = asyncio.get_event_loop().time() + 10
        while ws.session.connect_failures < 2:
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)
        assert ws.service.node_state.get_status() is NodeStatus.CONNECTING_TO_DB


async def test_granted_credentials_serves():
    """auth.rs::vs_works_when_permission_granted: with valid credentials
    the node discovers, scans, and serves the index."""
    async with WireService(
        make_schema_handler(rows=ROWS),
        require_auth=CREDS,
        username=CREDS[0],
        password=CREDS[1],
    ) as ws:
        await ws.wait_serving()
        await ws.wait_index_count(("ks", "idx"), 5)
        resp = await ws.http.post(
            "/api/v1/indexes/ks/idx/ann",
            json={"vector": ROWS[3][1], "limit": 1},
        )
        assert resp.status == 200
        data = await resp.json()
        assert data["primary_keys"]["pk"] == [3]
