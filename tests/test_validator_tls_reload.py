"""Validator-equivalent: tls_reload (crates/validator/src/tls_reload.rs
reloads_tls_identity_after_cert_file_rotation).

The reference rotates the cert+key files IN PLACE and asserts the node
serves HTTPS with the new identity (and stops presenting the old one)
within the file-check interval. Here the live service runs with
tls_file_check_interval=0.1s; the content-hash FileMonitor must trigger a
listener reload presenting the rotated certificate.
"""

import asyncio
import ssl

import aiohttp

from vector_store_tpu.run import serve
from vector_store_tpu.service.config import Config

from test_https_mtls import make_cert, seeded_db, wait_serving


def _shift(tmp_path, name: str, dst_cert: str, dst_key: str):
    """Generate a fresh identity and copy it over the watched paths."""
    import shutil

    fresh = make_cert(tmp_path, name)
    shutil.copy(fresh["cert_path"], dst_cert)
    shutil.copy(fresh["key_path"], dst_key)
    return fresh


async def _serial_over_tls(port: int) -> int:
    """Connect without verification and return the presented certificate's
    serial number."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    reader, writer = await asyncio.open_connection(
        "127.0.0.1", port, ssl=ctx
    )
    try:
        der = writer.get_extra_info("ssl_object").getpeercert(binary_form=True)
    finally:
        writer.close()
        try:
            await writer.wait_closed()
        except Exception:
            pass
    from cryptography import x509

    return x509.load_der_x509_certificate(der).serial_number


async def test_cert_rotation_reloads_listener(tmp_path):
    cert_v1 = make_cert(tmp_path, "localhost")
    config = Config(
        uri="127.0.0.1:0",
        tls_cert_path=cert_v1["cert_path"],
        tls_key_path=cert_v1["key_path"],
        monitor_indexes_interval=0.05,
        tls_file_check_interval=0.1,
    )
    service = await serve(seeded_db(), config)
    try:
        await wait_serving(service)
        port = service.http_server.main.port
        serial_v1 = cert_v1["cert"].serial_number
        assert await _serial_over_tls(port) == serial_v1

        # requests verified against v1 succeed
        v1_ctx = ssl.create_default_context(cafile=cert_v1["cert_path"])
        async with aiohttp.ClientSession() as http:
            resp = await http.get(
                f"https://localhost:{port}/api/v1/status", ssl=v1_ctx
            )
            assert resp.status == 200

        # rotate IN PLACE; the watcher must reload within ~interval
        cert_v2 = _shift(
            tmp_path, "localhost-v2", cert_v1["cert_path"], cert_v1["key_path"]
        )
        deadline = asyncio.get_event_loop().time() + 15
        while True:
            # the listener rebinds on the SAME port after reload
            try:
                serial = await _serial_over_tls(port)
            except (ConnectionError, OSError, ssl.SSLError):
                await asyncio.sleep(0.1)
                continue
            if serial == cert_v2["cert"].serial_number:
                break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.1)

        # new identity serves verified requests; the old CA no longer
        # validates (tls_reload.rs's final wait_for)
        v2_ctx = ssl.create_default_context(cafile=cert_v2["cert_path"])
        async with aiohttp.ClientSession() as http:
            resp = await http.get(
                f"https://localhost:{port}/api/v1/status", ssl=v2_ctx
            )
            assert resp.status == 200
        async with aiohttp.ClientSession() as http:
            try:
                await http.get(
                    f"https://localhost:{port}/api/v1/status", ssl=v1_ctx
                )
                raise AssertionError("old certificate still accepted")
            except aiohttp.ClientError:
                pass
    finally:
        await service.stop()
