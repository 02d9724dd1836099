"""OpenSearch remote engine against a mock server (parity with the
reference's mock_opensearch.rs), and the simulator engine."""

import asyncio
import json
import threading

import numpy as np
import pytest
from aiohttp import web

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.engine.simulator import SimulatorIndex, parse_delays


class MockOpenSearch:
    """Minimal OpenSearch HTTP API: index creation, _bulk, _count,
    knn _search (exact scoring)."""

    def __init__(self):
        self.indices: dict[str, dict] = {}  # name -> {"docs": {id: doc}, "mapping": ...}
        self.app = web.Application()
        self.app.router.add_put("/{index}", self.create_index)
        self.app.router.add_post("/_bulk", self.bulk)
        self.app.router.add_get("/{index}/_count", self.count)
        self.app.router.add_post("/{index}/_search", self.search)

    async def create_index(self, request):
        name = request.match_info["index"]
        body = await request.json()
        if name in self.indices:
            return web.json_response({"error": "exists"}, status=400)
        self.indices[name] = {"docs": {}, "mapping": body}
        return web.json_response({"acknowledged": True})

    async def bulk(self, request):
        text = await request.text()
        lines = [json.loads(l) for l in text.strip().split("\n")]
        i = 0
        while i < len(lines):
            action = lines[i]
            if "index" in action:
                meta = action["index"]
                doc = lines[i + 1]
                self.indices[meta["_index"]]["docs"][meta["_id"]] = doc
                i += 2
            elif "delete" in action:
                meta = action["delete"]
                self.indices[meta["_index"]]["docs"].pop(meta["_id"], None)
                i += 1
            else:
                i += 1
        return web.json_response({"errors": False})

    async def count(self, request):
        name = request.match_info["index"]
        return web.json_response({"count": len(self.indices[name]["docs"])})

    async def search(self, request):
        name = request.match_info["index"]
        body = await request.json()
        q = body["query"]
        part_filter = None
        if "bool" in q:
            part_filter = q["bool"]["filter"][0]["term"]["part"]
            q = q["bool"]["must"][0]
        vec = np.asarray(q["knn"]["emb"]["vector"], dtype=np.float32)
        k = q["knn"]["emb"]["k"]
        docs = self.indices[name]["docs"]
        space = self.indices[name]["mapping"]["mappings"]["properties"]["emb"][
            "method"
        ]["space_type"]
        hits = []
        for doc_id, doc in docs.items():
            if part_filter is not None and doc.get("part") != part_filter:
                continue
            emb = np.asarray(doc["emb"], dtype=np.float32)
            if space == "l2":
                d = float(((vec - emb) ** 2).sum())
                score = 1.0 / (1.0 + d)
            else:  # cosinesimil
                denom = np.linalg.norm(vec) * np.linalg.norm(emb) or 1e-30
                cos = float(vec @ emb / denom)
                score = (1.0 + cos) / 2.0  # opensearch convention
            hits.append({"_id": doc_id, "_score": score, "_source": doc})
        hits.sort(key=lambda h: -h["_score"])
        return web.json_response({"hits": {"hits": hits[:k]}})


@pytest.fixture
async def mock_server(loop):
    mock = MockOpenSearch()
    runner = web.AppRunner(mock.app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = None
    for s in runner.sites:
        server = getattr(s, "_server", None)
        if server and server.sockets:
            port = server.sockets[0].getsockname()[1]
    yield mock, f"http://127.0.0.1:{port}"
    await runner.cleanup()


class TestOpenSearchEngine:
    async def test_upsert_search_remove(self, mock_server):
        mock, url = mock_server
        from vector_store_tpu.engine.opensearch import OpenSearchIndex

        def run():
            idx = OpenSearchIndex(
                url, "ks-idx", 4, space_type=SpaceType.EUCLIDEAN
            )
            vecs = np.eye(4, dtype=np.float32) * 2
            idx.upsert_batch(np.arange(4), np.ones(4, np.int32), vecs)
            assert idx.size == 4
            res = idx.search(vecs[2][None], k=2)[0]
            assert res.slots[0] == 2
            assert res.epochs[0] == 1
            assert res.distances[0] == pytest.approx(0.0, abs=1e-5)
            idx.remove_batch(np.array([2]))
            assert idx.size == 3
            res = idx.search(vecs[2][None], k=1)[0]
            assert res.slots[0] != 2
            return True

        # requests is blocking: run in a thread while the mock serves
        assert await asyncio.get_running_loop().run_in_executor(None, run)


class TestSimulator:
    def test_parse_delays(self):
        assert parse_delays("5ms:1ms:100ms") == (0.005, 0.001, 0.1)
        with pytest.raises(ValueError):
            parse_delays("5ms")

    def test_exact_search(self):
        idx = SimulatorIndex(4, space_type=SpaceType.EUCLIDEAN)
        vecs = np.eye(4, dtype=np.float32)
        idx.upsert_batch(np.arange(4), np.zeros(4, np.int32), vecs)
        res = idx.search(vecs[1][None], k=2)[0]
        assert res.slots[0] == 1
        assert idx.size == 4
        idx.remove_batch(np.array([1]))
        assert idx.search(vecs[1][None], k=1)[0].slots[0] != 1

    def test_partition_filter(self):
        idx = SimulatorIndex(2, space_type=SpaceType.EUCLIDEAN)
        vecs = np.asarray([[0.0, 0.0], [0.1, 0.0], [0.2, 0.0]], np.float32)
        idx.upsert_batch(
            np.arange(3), np.zeros(3, np.int32), vecs, partitions=np.array([0, 1, 1])
        )
        res = idx.search(vecs[0][None], k=3, partitions=np.array([1]))[0]
        assert set(res.slots.tolist()) == {1, 2}

    def test_delay_applied(self):
        import time

        idx = SimulatorIndex(2, delays=(0.02, 0.0, 0.0), space_type=SpaceType.EUCLIDEAN)
        idx.upsert_batch(np.array([0]), np.zeros(1, np.int32), np.zeros((1, 2), np.float32))
        t0 = time.perf_counter()
        idx.search(np.zeros((1, 2), np.float32), k=1)
        assert time.perf_counter() - t0 >= 0.02
