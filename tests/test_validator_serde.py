"""Validator-equivalent: serde (crates/validator/src/serde.rs).

The reference round-trips every CQL native type through indexing +
filtered ANN: typed JSON conversion (try_from_json), cross-representation
numeric comparison (varint vs int, decimal vs float), decimal primary
keys, and type-mismatch rejections. Here the same surface is driven over
HTTP against a live service with a typed table.
"""

import asyncio
import math
import uuid as _uuid

from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.db.fake import (
    FakeDb,
    FakeIndex,
    FakeTable,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config

DIMS = 3
U1 = _uuid.UUID("11111111-2222-3333-4444-555555555555")
U2 = _uuid.UUID("99999999-8888-7777-6666-555555555555")

COLUMNS = {
    "i": "int",
    "big": "varint",
    "dec": "decimal",
    "f": "double",
    "t": "text",
    "u": "uuid",
    "flag": "boolean",
}

# pk -> filtering values in COLUMNS order
ROWS = {
    0: (7, 2**70, "1.50", 1.5, "alpha", str(U1), True),
    1: (8, -(2**70), "-0.25", -0.25, "beta", str(U2), False),
    2: (7, 123, "42", 42.0, "alpha", str(U1), False),
}


def _decimal(v: str):
    from decimal import Decimal

    return Decimal(v)


async def _boot():
    from decimal import Decimal

    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",), columns=dict(COLUMNS)))
    rows = []
    for pk, vals in ROWS.items():
        conv = []
        for (name, t), v in zip(COLUMNS.items(), vals):
            if t == "decimal":
                conv.append(Decimal(v))
            elif t == "uuid":
                conv.append(_uuid.UUID(v))
            else:
                conv.append(v)
        vec = [math.cos(pk), math.sin(pk), 0.0]
        rows.append(
            vector_row((pk,), vec, 100, filtering=[(100, c) for c in conv])
        )
    db.add_index(
        FakeIndex(
            metadata=make_vs_metadata(
                dimensions=DIMS, filtering_columns=tuple(COLUMNS)
            ),
            scan=rows,
        )
    )
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    deadline = asyncio.get_event_loop().time() + 20
    while True:
        resp = await client.get("/api/v1/indexes/ks/idx/status")
        if resp.status == 200:
            s = await resp.json()
            if s["count"] == len(ROWS) and s["status"] == "SERVING":
                break
        assert asyncio.get_event_loop().time() < deadline
        await asyncio.sleep(0.05)
    return service, client


async def _filtered(client, restrictions, limit=10):
    return await client.post(
        "/api/v1/indexes/ks/idx/ann",
        json={
            "vector": [1.0, 0.0, 0.0],
            "limit": limit,
            "filter": {"restrictions": restrictions, "allow_filtering": True},
        },
    )


async def test_all_types_filter_roundtrip():
    """serde.rs::test_serialization_deserialization_all_types analogue:
    every typed column filters correctly through JSON -> CQL semantics."""
    service, client = await _boot()
    try:
        cases = [
            ([{"type": "==", "lhs": "i", "rhs": 7}], {0, 2}),
            ([{"type": "==", "lhs": "t", "rhs": "beta"}], {1}),
            ([{"type": "==", "lhs": "u", "rhs": str(U1)}], {0, 2}),
            ([{"type": "==", "lhs": "flag", "rhs": True}], {0}),
            ([{"type": "<", "lhs": "f", "rhs": 0}], {1}),
            (
                [
                    {"type": "==", "lhs": "i", "rhs": 7},
                    {"type": "==", "lhs": "flag", "rhs": False},
                ],
                {2},
            ),
            ([{"type": "IN", "lhs": "t", "rhs": ["alpha", "beta"]}], {0, 1, 2}),
        ]
        for restrictions, want in cases:
            resp = await _filtered(client, restrictions)
            assert resp.status == 200, await resp.text()
            got = set((await resp.json())["primary_keys"]["pk"])
            assert got == want, (restrictions, got, want)
    finally:
        await client.close()
        await service.stop()


async def test_varint_filter_big_magnitudes():
    """serde.rs::test_varint_filter: values beyond i64 compare correctly."""
    service, client = await _boot()
    try:
        resp = await _filtered(
            client, [{"type": ">", "lhs": "big", "rhs": 2**69}]
        )
        assert resp.status == 200
        assert set((await resp.json())["primary_keys"]["pk"]) == {0}
        resp = await _filtered(
            client, [{"type": "<", "lhs": "big", "rhs": 0}]
        )
        assert set((await resp.json())["primary_keys"]["pk"]) == {1}
        # exact equality at 2**70 (round-trips through JSON ints)
        resp = await _filtered(
            client, [{"type": "==", "lhs": "big", "rhs": 2**70}]
        )
        assert set((await resp.json())["primary_keys"]["pk"]) == {0}
    finally:
        await client.close()
        await service.stop()


async def test_decimal_filter_cross_representation():
    """serde.rs::test_decimal_filter: decimal columns compare numerically
    against JSON floats and ints (big-number semantics, table/mod.rs
    varint/decimal comparison parity)."""
    service, client = await _boot()
    try:
        resp = await _filtered(
            client, [{"type": "==", "lhs": "dec", "rhs": 1.5}]
        )
        assert set((await resp.json())["primary_keys"]["pk"]) == {0}
        resp = await _filtered(
            client, [{"type": "==", "lhs": "dec", "rhs": 42}]
        )
        assert set((await resp.json())["primary_keys"]["pk"]) == {2}
        resp = await _filtered(
            client, [{"type": ">=", "lhs": "dec", "rhs": 0}]
        )
        assert set((await resp.json())["primary_keys"]["pk"]) == {0, 2}
    finally:
        await client.close()
        await service.stop()


async def test_type_mismatch_rejected():
    """try_from_json parity: a JSON value of the wrong type for the column
    is a 400, not a silent empty result."""
    service, client = await _boot()
    try:
        for restrictions in (
            [{"type": "==", "lhs": "i", "rhs": "seven"}],
            [{"type": "==", "lhs": "t", "rhs": 5}],
            [{"type": "==", "lhs": "flag", "rhs": "yes"}],
            [{"type": "==", "lhs": "u", "rhs": "not-a-uuid"}],
        ):
            resp = await _filtered(client, restrictions)
            assert resp.status == 400, (restrictions, resp.status)
    finally:
        await client.close()
        await service.stop()
