"""Golden CQL protocol-v4 frame fixtures (VERDICT r3 order #10).

The pure-python wire driver has only ever spoken to the builder's own fake
server (db/cql/testing.py), so an encode/decode bug symmetric on both
sides would be invisible. These tests pin the driver against HAND-BUILT
byte fixtures derived from the CQL binary protocol v4 specification
(native_protocol_v4.spec) — the server side here is a scripted socket that
asserts the driver's REQUEST bytes against spec-derived goldens and
replies with spec-derived RESPONSE bytes, sharing zero code with the
driver's encoder.

Reference counterpart: the scylla Rust driver session the reference trusts
(/root/reference/crates/vector-store/src/db.rs:525-661); protocol layouts
from the v4 spec:
  frame   = version u8 | flags u8 | stream i16 | opcode u8 | length u32
  STARTUP = string map {"CQL_VERSION": "3.0.0"}            (opcode 0x01)
  AUTH_RESPONSE = [bytes] sasl-plain \\0user\\0pass          (opcode 0x0F)
  QUERY   = [long string] cql [consistency u16] [flags u8] ...  (0x07)
  RESULT  = kind i32 (Rows=2) | flags | col count | specs | rows   (0x08)
"""

import asyncio
import datetime
import struct
import uuid

import pytest

from vector_store_tpu.db.cql import frame as fr
from vector_store_tpu.db.cql import types as ct
from vector_store_tpu.db.cql.connection import CqlConnection, CqlError
from vector_store_tpu.db.cql.frame import Reader, Writer


# -- spec-derived primitive builders (independent of the driver's Writer) --


def spec_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("!H", len(b)) + b


def spec_long_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("!i", len(b)) + b


def spec_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack("!i", -1)
    return struct.pack("!i", len(b)) + b


def spec_frame(version: int, opcode: int, stream: int, body: bytes) -> bytes:
    return struct.pack("!BBhBI", version, 0, stream, opcode, len(body)) + body


# -- golden request bodies (what a spec-conforming client MUST send) --

GOLDEN_STARTUP_BODY = (
    b"\x00\x01"  # string map: 1 entry
    + spec_string("CQL_VERSION")
    + spec_string("3.0.0")
)

GOLDEN_AUTH_TOKEN = b"\x00cassandra\x00secretpw"  # SASL PLAIN
GOLDEN_AUTH_BODY = spec_bytes(GOLDEN_AUTH_TOKEN)

GOLDEN_CQL = "SELECT pk, name FROM ks.tbl WHERE pk = ?"
GOLDEN_QUERY_BODY = (
    spec_long_string(GOLDEN_CQL)
    + struct.pack("!H", 0x000A)  # consistency LOCAL_ONE
    + b"\x01"  # flags: VALUES
    + struct.pack("!H", 1)  # 1 value
    + spec_bytes(struct.pack("!q", 42))  # bigint 42 (python int -> bigint)
)


def golden_rows_body() -> bytes:
    """RESULT Rows: kind=2, global_tables_spec, 6 columns covering the
    native types the service depends on, 2 rows (second row all NULL)."""
    u = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
    body = struct.pack("!i", 2)  # kind = Rows
    body += struct.pack("!i", 0x0001)  # flags: global_tables_spec
    body += struct.pack("!i", 6)  # column count
    body += spec_string("ks") + spec_string("tbl")
    # col specs: name + type id (+ params)
    body += spec_string("a_int") + struct.pack("!H", 0x0009)
    body += spec_string("a_text") + struct.pack("!H", 0x000D)
    body += spec_string("a_uuid") + struct.pack("!H", 0x000C)
    body += spec_string("a_ts") + struct.pack("!H", 0x000B)
    # map<text, blob>
    body += (
        spec_string("a_map")
        + struct.pack("!H", 0x0021)
        + struct.pack("!H", 0x000D)
        + struct.pack("!H", 0x0003)
    )
    # ScyllaDB vector<float, 3>: CUSTOM with the VectorType class string
    body += (
        spec_string("a_vec")
        + struct.pack("!H", 0x0000)
        + spec_string(
            "org.apache.cassandra.db.marshal.VectorType"
            "(org.apache.cassandra.db.marshal.FloatType, 3)"
        )
    )
    body += struct.pack("!i", 2)  # row count
    # row 1
    body += spec_bytes(struct.pack("!i", 7))
    body += spec_bytes(b"hello")
    body += spec_bytes(u.bytes)
    body += spec_bytes(struct.pack("!q", 1_700_000_000_000))  # epoch millis
    # map: 1 entry {"k": 0xBEEF}
    body += spec_bytes(
        struct.pack("!i", 1) + spec_bytes(b"k") + spec_bytes(b"\xbe\xef")
    )
    # vector<float,3>: fixed-size elements, packed back to back
    body += spec_bytes(struct.pack("!3f", 1.0, 2.0, 3.0))
    # row 2: all NULL
    for _ in range(6):
        body += spec_bytes(None)
    return body


class GoldenServer:
    """Scripted CQL server: asserts each inbound frame against the golden
    request bytes (stream id masked — the driver allocates it), replies
    with golden response bytes on the same stream."""

    def __init__(self):
        self.port = None
        self._server = None
        self.failures: list[str] = []
        # (expected_opcode, expected_body, reply_opcode, reply_body)
        self.script = [
            (fr.OP_STARTUP, GOLDEN_STARTUP_BODY, 0x03, spec_string("PasswordAuthenticator")),
            (fr.OP_AUTH_RESPONSE, GOLDEN_AUTH_BODY, 0x10, spec_bytes(None)),
            (fr.OP_QUERY, GOLDEN_QUERY_BODY, 0x08, golden_rows_body()),
        ]

    async def start(self):
        self._server = await asyncio.start_server(self._handle, "127.0.0.1", 0)
        self.port = self._server.sockets[0].getsockname()[1]

    async def stop(self):
        self._server.close()
        await self._server.wait_closed()

    async def _handle(self, reader, writer):
        try:
            for exp_op, exp_body, rep_op, rep_body in self.script:
                header = await reader.readexactly(9)
                version, flags, stream, opcode, length = struct.unpack(
                    "!BBhBI", header
                )
                body = await reader.readexactly(length)
                if version != 0x04:
                    self.failures.append(f"version {version:#x} != 0x04")
                if opcode != exp_op:
                    self.failures.append(f"opcode {opcode:#x} != {exp_op:#x}")
                if body != exp_body:
                    self.failures.append(
                        f"body mismatch for opcode {opcode:#x}: "
                        f"{body.hex()} != {exp_body.hex()}"
                    )
                writer.write(spec_frame(0x84, rep_op, stream, rep_body))
                await writer.drain()
        except asyncio.IncompleteReadError:
            pass
        finally:
            # 3.12's Server.wait_closed() waits for every transport; a
            # handler that returns without closing its writer hangs it
            writer.close()
            try:
                await writer.wait_closed()
            except Exception:
                pass


async def test_golden_handshake_auth_query_result_roundtrip():
    """The driver's STARTUP, AUTH_RESPONSE, and QUERY frames must match the
    spec-derived golden bytes EXACTLY, and it must decode a spec-built
    RESULT Rows frame (int/text/uuid/timestamp/map/vector + NULL row)."""
    server = GoldenServer()
    await server.start()
    conn = CqlConnection("127.0.0.1", server.port)
    try:
        await conn.connect(username="cassandra", password="secretpw")
        rs = await conn.query(GOLDEN_CQL, values=[42])
        assert server.failures == []
        assert rs.columns.names == [
            "a_int",
            "a_text",
            "a_uuid",
            "a_ts",
            "a_map",
            "a_vec",
        ]
        row = rs.rows[0]
        assert row[0] == 7
        assert row[1] == "hello"
        assert row[2] == uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
        ts = row[3]
        assert isinstance(ts, datetime.datetime)
        assert ts.timestamp() == pytest.approx(1_700_000_000.0)
        assert row[4] == {"k": b"\xbe\xef"}
        assert list(row[5]) == pytest.approx([1.0, 2.0, 3.0])
        assert rs.rows[1] == (None,) * 6
    finally:
        await conn.close()
        await server.stop()


async def test_golden_error_frame_raises_typed_error():
    """ERROR frames (opcode 0x00: code i32 + string message) must surface
    as CqlError with the server's code and message."""
    server = GoldenServer()
    server.script = [
        (fr.OP_STARTUP, GOLDEN_STARTUP_BODY, 0x02, b""),  # READY, no auth
        (
            fr.OP_QUERY,
            GOLDEN_QUERY_BODY,
            0x00,
            struct.pack("!i", 0x2200) + spec_string("unconfigured table tbl"),
        ),
    ]
    await server.start()
    conn = CqlConnection("127.0.0.1", server.port)
    try:
        await conn.connect(username="cassandra", password="secretpw")
        with pytest.raises(CqlError) as ei:
            await conn.query(GOLDEN_CQL, values=[42])
        assert ei.value.code == 0x2200
        assert "unconfigured table" in str(ei.value)
        assert server.failures == []
    finally:
        await conn.close()
        await server.stop()


class TestGoldenValueCodecs:
    """Value-level byte fixtures from the v4 spec's type serializations —
    the edge encodings the service's schema/CDC reads depend on."""

    def test_frame_header_golden(self):
        assert fr.encode_frame(fr.OP_QUERY, 3, b"xyz") == (
            b"\x04\x00\x00\x03\x07\x00\x00\x00\x03xyz"
        )
        version, flags, stream, opcode, length = fr.decode_header(
            b"\x84\x00\x00\x03\x08\x00\x00\x00\x10"
        )
        assert (version, flags, stream, opcode, length) == (
            0x84,
            0,
            3,
            0x08,
            16,
        )

    def test_consistency_local_one_is_spec_value(self):
        assert fr.CL_LOCAL_ONE == 0x000A

    def test_varint_decodings(self):
        # spec: two's-complement big-endian, minimal length
        cases = [
            (b"\x00", 0),
            (b"\x01", 1),
            (b"\xff", -1),
            (b"\x7f", 127),
            (b"\x00\x80", 128),
            (b"\x80", -128),
            (b"\xff\x7f", -129),
        ]
        for data, want in cases:
            assert ct.decode_value(ct.CqlType(ct.T_VARINT), data) == want

    def test_decimal_decoding(self):
        # spec: scale i32 + unscaled varint; 0x0000000201 / scale 2 = 5.13
        from decimal import Decimal

        data = struct.pack("!i", 2) + b"\x02\x01"  # unscaled 513, scale 2
        assert ct.decode_value(ct.CqlType(ct.T_DECIMAL), data) == Decimal(
            "5.13"
        )

    def test_timeuuid_and_date_time(self):
        u = uuid.uuid1()
        assert ct.decode_value(ct.CqlType(ct.T_TIMEUUID), u.bytes) == u

    def test_vector_of_floats_typed_by_native_id(self):
        # Scylla also serves vector<float, n> as native type 0x0017 with a
        # vint dimension (newer servers); both spellings must decode
        r = Reader(
            struct.pack("!H", 0x0017)
            + struct.pack("!H", 0x0008)  # float element
            + b"\x03"  # unsigned vint dim = 3
        )
        typ = ct.read_type(r)
        assert typ.id == ct.T_VECTOR and typ.vector_dim == 3
        out = ct.decode_value(typ, struct.pack("!3f", 0.5, -1.0, 2.0))
        assert list(out) == pytest.approx([0.5, -1.0, 2.0])

    def test_encode_bind_goldens(self):
        # spec serializations the driver writes into QUERY values
        from vector_store_tpu.db.cql.types import Int32, encode_bind

        assert encode_bind(42) == struct.pack("!q", 42)  # python int -> bigint
        assert encode_bind(Int32(42)) == struct.pack("!i", 42)
        assert encode_bind("abc") == b"abc"
        assert encode_bind(b"\x01\x02") == b"\x01\x02"
        assert encode_bind(True) == b"\x01"
        u = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
        assert encode_bind(u) == u.bytes
