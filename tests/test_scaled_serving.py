"""Multi-process serving: owner + SO_REUSEPORT frontend workers over IPC."""

import asyncio
import socket

import aiohttp
import numpy as np
import pytest

from vector_store_tpu.db.fake import FakeDb, FakeIndex, FakeTable, make_vs_metadata, vector_row
from vector_store_tpu.run import serve_scaled
from vector_store_tpu.service.config import Config

RNG = np.random.default_rng(202)


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


async def test_scaled_serving_end_to_end():
    n, dims = 40, 8
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    vecs = RNG.normal(size=(n, dims)).astype(np.float32)
    rows = [vector_row((i,), vecs[i].tolist(), 100) for i in range(n)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=dims), scan=rows))

    port = free_port()
    config = Config(uri=f"127.0.0.1:{port}", monitor_indexes_interval=0.05)
    service = await serve_scaled(db, config, workers=2)
    try:
        url = f"http://127.0.0.1:{port}"
        async with aiohttp.ClientSession() as http:
            # wait for workers to bind + index to serve
            deadline = asyncio.get_event_loop().time() + 30
            while True:
                try:
                    resp = await http.get(f"{url}/api/v1/indexes/ks/idx/status")
                    if resp.status == 200:
                        data = await resp.json()
                        if data["status"] == "SERVING" and data["count"] == n:
                            break
                except aiohttp.ClientError:
                    pass
                assert asyncio.get_event_loop().time() < deadline
                await asyncio.sleep(0.1)

            # node + service info through the frontends
            assert await (await http.get(f"{url}/api/v1/status")).json() == "SERVING"
            info = await (await http.get(f"{url}/api/v1/info")).json()
            assert info["service"] == "scylla-vector-store"

            # concurrent correctness across workers
            async def one(i):
                resp = await http.post(
                    f"{url}/api/v1/indexes/ks/idx/ann",
                    json={"vector": vecs[i % n].tolist(), "limit": 3},
                )
                assert resp.status == 200
                data = await resp.json()
                assert data["primary_keys"]["pk"][0] == i % n
                assert len(data["distances"]) == 3

            await asyncio.gather(*(one(i) for i in range(80)))

            # error paths travel through the IPC too
            resp = await http.post(
                f"{url}/api/v1/indexes/ks/nope/ann", json={"vector": [0.0] * dims}
            )
            assert resp.status == 404
            resp = await http.post(
                f"{url}/api/v1/indexes/ks/idx/ann", json={"vector": [0.0] * 3}
            )
            assert resp.status == 400

            # metrics come from the owner
            text = await (await http.get(f"{url}/metrics")).text()
            assert "request_latency_seconds" in text
    finally:
        await service.stop()


async def test_scaled_serving_with_ipc_batching(monkeypatch):
    """Opt-in IPC batching path (VECTOR_STORE_FRONTEND_BATCH=1)."""
    import os

    monkeypatch.setenv("VECTOR_STORE_FRONTEND_BATCH", "1")
    n, dims = 30, 8
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    vecs = RNG.normal(size=(n, dims)).astype(np.float32)
    rows = [vector_row((i,), vecs[i].tolist(), 100) for i in range(n)]
    db.add_index(FakeIndex(metadata=make_vs_metadata(dimensions=dims), scan=rows))
    port = free_port()
    service = await serve_scaled(
        db, Config(uri=f"127.0.0.1:{port}", monitor_indexes_interval=0.05), workers=2
    )
    try:
        url = f"http://127.0.0.1:{port}"
        async with aiohttp.ClientSession() as http:
            deadline = asyncio.get_event_loop().time() + 30
            while True:
                try:
                    resp = await http.get(f"{url}/api/v1/indexes/ks/idx/status")
                    if resp.status == 200:
                        data = await resp.json()
                        if data["status"] == "SERVING" and data["count"] == n:
                            break
                except aiohttp.ClientError:
                    pass
                assert asyncio.get_event_loop().time() < deadline
                await asyncio.sleep(0.1)

            async def one(i):
                resp = await http.post(
                    f"{url}/api/v1/indexes/ks/idx/ann",
                    json={"vector": vecs[i % n].tolist(), "limit": 2},
                )
                assert resp.status == 200, await resp.text()
                data = await resp.json()
                assert data["primary_keys"]["pk"][0] == i % n

            await asyncio.gather(*(one(i) for i in range(120)))
    finally:
        await service.stop()
