"""HTTPS / mTLS endpoint tests (parity with the reference's integration
https.rs / mtls.rs, which use generated certs the same way)."""

import asyncio
import datetime as dt
import ssl

import aiohttp
import pytest

from vector_store_tpu.db.fake import FakeDb, FakeIndex, FakeTable, make_vs_metadata, vector_row
from vector_store_tpu.run import serve
from vector_store_tpu.service.config import Config


def make_cert(tmp_path, name: str, ca=None):
    """Self-signed cert (or CA-signed when ca given) via cryptography."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    subject = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, name)])
    issuer_name = subject if ca is None else ca["cert"].subject
    signing_key = key if ca is None else ca["key"]
    builder = (
        x509.CertificateBuilder()
        .subject_name(subject)
        .issuer_name(issuer_name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(dt.datetime.now(dt.timezone.utc) - dt.timedelta(hours=1))
        .not_valid_after(dt.datetime.now(dt.timezone.utc) + dt.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName("localhost"), x509.DNSName(name)]),
            critical=False,
        )
    )
    if ca is None:
        builder = builder.add_extension(
            x509.BasicConstraints(ca=True, path_length=None), critical=True
        )
    cert = builder.sign(signing_key, hashes.SHA256())
    cert_path = tmp_path / f"{name}.crt"
    key_path = tmp_path / f"{name}.key"
    cert_path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_path.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )
    return {"cert": cert, "key": key, "cert_path": str(cert_path), "key_path": str(key_path)}


def seeded_db():
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    rows = [vector_row((i,), [float(i), 0.0, 0.0], 100) for i in range(5)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=3), scan=rows))
    return db


async def wait_serving(service, timeout=10.0):
    deadline = asyncio.get_event_loop().time() + timeout
    from vector_store_tpu.service.node_state import NodeStatus

    while service.node_state.get_status() is not NodeStatus.SERVING:
        assert asyncio.get_event_loop().time() < deadline
        await asyncio.sleep(0.05)


class TestHttps:
    async def test_https_endpoint(self, tmp_path):
        server_cert = make_cert(tmp_path, "localhost")
        config = Config(
            uri="127.0.0.1:0",
            tls_cert_path=server_cert["cert_path"],
            tls_key_path=server_cert["key_path"],
            monitor_indexes_interval=0.05,
        )
        service = await serve(seeded_db(), config)
        try:
            await wait_serving(service)
            port = service.http_server.main.port
            client_ctx = ssl.create_default_context(cafile=server_cert["cert_path"])
            async with aiohttp.ClientSession() as http:
                resp = await http.get(
                    f"https://localhost:{port}/api/v1/status", ssl=client_ctx
                )
                assert resp.status == 200
                assert await resp.json() == "SERVING"
        finally:
            await service.stop()

    async def test_mtls_endpoint_requires_client_cert(self, tmp_path):
        ca = make_cert(tmp_path, "testca")
        server_cert = make_cert(tmp_path, "localhost", ca=ca)
        client_cert = make_cert(tmp_path, "client", ca=ca)
        config = Config(
            uri="127.0.0.1:0",
            mtls_uri="127.0.0.1:0",
            tls_cert_path=server_cert["cert_path"],
            tls_key_path=server_cert["key_path"],
            mtls_ca_cert_path=ca["cert_path"],
            monitor_indexes_interval=0.05,
        )
        service = await serve(seeded_db(), config)
        try:
            await wait_serving(service)
            mtls_port = service.http_server.mtls.port
            ca_ctx = ssl.create_default_context(cafile=ca["cert_path"])

            # without client cert: handshake rejected
            async with aiohttp.ClientSession() as http:
                with pytest.raises(aiohttp.ClientError):
                    await http.get(
                        f"https://localhost:{mtls_port}/api/v1/status", ssl=ca_ctx
                    )

            # with client cert: accepted
            mctx = ssl.create_default_context(cafile=ca["cert_path"])
            mctx.load_cert_chain(client_cert["cert_path"], client_cert["key_path"])
            async with aiohttp.ClientSession() as http:
                resp = await http.get(
                    f"https://localhost:{mtls_port}/api/v1/status", ssl=mctx
                )
                assert resp.status == 200
        finally:
            await service.stop()


class TestBindRetry:
    async def test_retry_then_success(self):
        import socket

        from aiohttp import web

        from vector_store_tpu.http.server import spawn_server_with_retry

        blocker = socket.socket()
        blocker.bind(("127.0.0.1", 0))
        blocker.listen(1)
        port = blocker.getsockname()[1]

        app = web.Application()

        async def release():
            await asyncio.sleep(0.8)
            blocker.close()

        rel = asyncio.get_running_loop().create_task(release())
        server = await spawn_server_with_retry(app, "127.0.0.1", port)
        await rel
        assert server.port == port
        await server.shutdown()
