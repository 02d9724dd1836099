"""Learned-ladder seeding on the legacy (non-pipelined) search path.

Engines without search_begin (simulator, opensearch, sharded) run
VsIndexActor._execute_search_batch, which walks the oversample ladder
(1 -> 4 -> 16 -> 64) with one full engine search per rung. The ladder
cache remembers the rung each filter's selectivity needed; a repeat
filter must enter the ladder AT its learned rung instead of paying the
lower rungs again (each rung is a full engine round trip).

The data is constructed so rank order is deterministic: row i sits at a
monotonically increasing angle from the query, and the 4 filter matches
occupy ranks 48/52/56/60 — invisible to the limit*1 and limit*4 rungs,
exactly covered by limit*16.
"""

import asyncio

import numpy as np
import pytest

pytest.importorskip("jax")

from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from vector_store_tpu.db.fake import (  # noqa: E402
    FakeDb,
    FakeIndex,
    FakeTable,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.run import build_service  # noqa: E402
from vector_store_tpu.service.config import Config  # noqa: E402

N, D, LIMIT = 256, 8, 4
MATCHES = (48, 52, 56, 60)


def ranked_vectors() -> np.ndarray:
    """vecs[i] at angle theta_i from e1, theta monotone in i — cosine rank
    order IS index order for the query e1."""
    theta = (np.arange(N) + 1) * (np.pi / 2) / (N + 1)
    out = np.zeros((N, D), dtype=np.float32)
    out[:, 0] = np.cos(theta)
    out[:, 1] = np.sin(theta)
    return out


async def _run() -> None:
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    vecs = ranked_vectors()
    labels = np.zeros(N, dtype=np.int64)
    labels[list(MATCHES)] = 7
    rows = [
        vector_row((i,), vecs[i].tolist(), 100, filtering=[(100, int(labels[i]))])
        for i in range(N)
    ]
    db.add_index(
        FakeIndex(
            metadata=make_vs_metadata(dimensions=D, filtering_columns=("bucket",)),
            scan=rows,
        )
    )
    service = await build_service(
        db, Config(monitor_indexes_interval=0.05, engine_kind="sim")
    )
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        deadline = asyncio.get_event_loop().time() + 30
        while True:
            resp = await client.get("/api/v1/indexes/ks/idx/status")
            if resp.status == 200:
                st = await resp.json()
                if st["status"] == "SERVING" and st["count"] == N:
                    break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)

        actor = service.indexes.get_vs(("ks", "idx")).actor
        assert not actor._pipelined, "simulator must take the legacy path"
        engine = actor.engine
        calls: list[int] = []
        inner = engine.search

        def counting_search(queries, k, partitions=None):
            calls.append(k)
            return inner(queries, k, partitions=partitions)

        engine.search = counting_search

        async def filtered_pks():
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={
                    "vector": [1.0] + [0.0] * (D - 1),
                    "limit": LIMIT,
                    "filter": {
                        "restrictions": [{"type": "==", "lhs": "bucket", "rhs": 7}],
                        "allow_filtering": True,
                    },
                },
            )
            assert resp.status == 200, await resp.text()
            return (await resp.json())["primary_keys"]["pk"]

        # first contact walks the ladder: rungs 1, 4, 16 (3 engine searches)
        pks = await filtered_pks()
        assert pks == list(MATCHES), pks
        assert calls == [LIMIT * 1, LIMIT * 4, LIMIT * 16], calls

        # repeat filter: the learned rung (16) is the ENTRY point — one
        # engine search, no lower rungs
        calls.clear()
        pks = await filtered_pks()
        assert pks == list(MATCHES), pks
        assert calls == [LIMIT * 16], calls
    finally:
        await client.close()
        await service.stop()


def test_legacy_ladder_enters_at_learned_rung():
    asyncio.run(_run())
