"""Validator-equivalent: quantization_and_rescoring
(crates/validator/src/quantization_and_rescoring.rs:98-330).

The reference proves three contracts with 500 vectors whose distance from
the query grows with pk by ~0.001-scale increments (differences that i8
quantization destroys):

1. f32 index (rescoring off) ranks them correctly — full precision is
   enough, results come back sorted by pk.
2. i8 index with `rescoring: false` misranks them — quantization collapses
   near-ties, and with the exact re-rank disabled the storage-precision
   order shows through (NOT sorted by pk).
3. i8 index with rescoring (the default) ranks them correctly again — the
   oversampled fetch + exact re-rank restores the true order.

Rows are inserted in shuffled order (the reference iterates a HashMap, so
its insertion order is effectively random too); otherwise quantized ties
would break by slot id, which equals pk order and would mask scenario 2.

The `oversampling`/`rescoring` knobs travel the same path as the
reference's CREATE INDEX options: index options -> get_index_params ->
IndexOptionsVs -> engine construction (db/scylla.py get_index_params,
service/monitor_indexes.py, service/vs_index.py factory).
"""

import asyncio

import numpy as np
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu.core.types import Quantization
from vector_store_tpu.db.fake import (
    FakeDb,
    FakeIndex,
    FakeTable,
    make_vs_metadata,
    vector_row,
)
from vector_store_tpu.run import build_service
from vector_store_tpu.service.config import Config

N = 500
LIMIT = 100
QUERY = [0.5, 0.3, 0.7]


def _embeddings() -> dict[int, list[float]]:
    # reference generate_test_vectors: query + i*0.001*(2,4,8)
    out = {}
    for i in range(N):
        off = i * 0.001
        out[i] = [QUERY[0] + off * 2.0, QUERY[1] + off * 4.0, QUERY[2] + off * 8.0]
    return out


async def _serve(quantization: Quantization, **vs_kwargs):
    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",)))
    emb = _embeddings()
    order = list(emb)
    np.random.default_rng(7).shuffle(order)
    rows = [vector_row((pk,), emb[pk], 100) for pk in order]
    db.add_index(
        FakeIndex(
            metadata=make_vs_metadata(
                dimensions=3, quantization=quantization, **vs_kwargs
            ),
            scan=rows,
        )
    )
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    deadline = asyncio.get_event_loop().time() + 30
    while True:
        resp = await client.get("/api/v1/indexes/ks/idx/status")
        if resp.status == 200:
            s = await resp.json()
            if s["count"] == N and s["status"] == "SERVING":
                break
        assert asyncio.get_event_loop().time() < deadline
        await asyncio.sleep(0.05)
    return service, client


async def _ann_pks(client) -> list[int]:
    resp = await client.post(
        "/api/v1/indexes/ks/idx/ann", json={"vector": QUERY, "limit": LIMIT}
    )
    assert resp.status == 200
    data = await resp.json()
    pks = data["primary_keys"]["pk"]
    assert len(pks) == LIMIT
    return pks


async def test_non_quantized_index_returns_correctly_ranked_vectors():
    """quantization_and_rescoring.rs:98-155: f32 precision distinguishes
    the 0.001-step vectors; results ordered by pk."""
    service, client = await _serve(
        Quantization.F32, oversampling=5.0, rescoring=False
    )
    try:
        pks = await _ann_pks(client)
        assert pks == sorted(pks), (
            "f32 (full precision) must rank the near-tied vectors "
            f"correctly even without rescoring; got {pks[:12]}..."
        )
    finally:
        await client.close()
        await service.stop()


async def test_quantized_index_misranks_without_rescoring():
    """quantization_and_rescoring.rs:157-230: i8 collapses the small
    differences; with rescoring off the storage-precision order shows
    through and is NOT the true (pk) order."""
    service, client = await _serve(
        Quantization.I8, oversampling=5.0, rescoring=False
    )
    try:
        engine = service.indexes.get_vs(("ks", "idx")).actor.engine
        assert engine.rescoring is False
        assert engine.oversample == 1
        pks = await _ann_pks(client)
        assert pks != sorted(pks), (
            "i8 storage without rescoring must expose quantization ties "
            "(results unexpectedly in exact order — the rescoring=false "
            "option is not reaching the engine)"
        )
    finally:
        await client.close()
        await service.stop()


async def test_rescoring_restores_ranking_for_quantized_index():
    """quantization_and_rescoring.rs:232-330: the oversampled fetch +
    exact re-rank corrects the i8 ranking."""
    service, client = await _serve(
        Quantization.I8, oversampling=5.0, rescoring=True
    )
    try:
        engine = service.indexes.get_vs(("ks", "idx")).actor.engine
        assert engine.rescoring is True
        assert engine.oversample == 5  # ceil(oversampling option)
        pks = await _ann_pks(client)
        assert pks == sorted(pks), (
            "rescoring must restore exact rank order on the i8 index; "
            f"got {pks[:12]}..."
        )
    finally:
        await client.close()
        await service.stop()


async def test_rescoring_default_is_on():
    """No options: lossy storage rescoring defaults on (the engines'
    measured-default oversample factors apply)."""
    service, client = await _serve(Quantization.I8)
    try:
        engine = service.indexes.get_vs(("ks", "idx")).actor.engine
        assert engine.rescoring is True
        assert engine.oversample >= 2
        pks = await _ann_pks(client)
        assert pks == sorted(pks)
    finally:
        await client.close()
        await service.stop()
