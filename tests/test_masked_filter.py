"""Device-masked filtered ANN: the mid-selectivity regime.

The filtered-serving triage (service/vs_index.py::_begin_window) has three
bands; this file covers the middle one, new in round 4:

- engine level: `IvfDeviceIndex.upload_allow_mask` returns a reusable
  AllowMaskHandle whose masked search must equal both the raw-ndarray
  allow_mask path and the brute-force filtered ranking, while caching the
  masked cluster-major side array across calls (one upload per filter,
  not per batch);
- service level: a filter matching ~10% of rows is too dense for the
  grouped subset-exact terminal and too selective for the post-filter
  oversample ladder (learned step >= 16).  After the ladder proves it
  expensive, the actor promotes it to a device-resident allow-mask and
  serves pre-filtered at k = limit*2; a table write must invalidate the
  mask (stamp) so new matching rows stay reachable.

Reference contrast: usearch.rs:1067-1154 post-filters every selectivity
band identically on the CPU; on TPU the pre-filter mask rides the same
fused grouped scan the unfiltered path uses.
"""

import asyncio

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vector_store_tpu.core.types import Quantization, SpaceType  # noqa: E402

RNG = np.random.default_rng(77)
DIMS = 16


def built_ivf(n=2000, d=DIMS, space=SpaceType.COSINE):
    from vector_store_tpu.engine.ivf import IvfDeviceIndex

    idx = IvfDeviceIndex(
        d,
        space_type=space,
        quantization=Quantization.F32,
        initial_capacity=4096,
        interpret=True,
        query_i8=False,
        min_build=256,
    )
    vecs = RNG.normal(size=(n, d)).astype(np.float32)
    idx.upsert_batch(np.arange(n), np.full(n, 1, np.int32), vecs)
    idx.kmeans_block = 1024
    idx.kmeans_iters = 2
    assert idx.maintain() is True
    idx._warm_queue.clear()
    assert idx.main_vecs is not None
    idx.nprobe = idx.nlist  # full probe: masked search is exact over main
    return idx, vecs


def brute_filtered(vecs, mask, q, k, space=SpaceType.COSINE):
    sub = np.where(mask)[0]
    if space is SpaceType.COSINE:
        qn = q / np.linalg.norm(q)
        vn = vecs[sub] / np.linalg.norm(vecs[sub], axis=1, keepdims=True)
        d = 1.0 - vn @ qn
    else:
        d = ((vecs[sub] - q) ** 2).sum(-1)
    return sub[np.argsort(d, kind="stable")][:k]


class TestAllowMaskHandle:
    def test_handle_equals_raw_mask_equals_brute(self):
        n = 2000
        idx, vecs = built_ivf(n)
        mask = RNG.random(n) < 0.1
        handle = idx.upload_allow_mask(mask)
        qs = vecs[RNG.choice(n, 5, replace=False)] + 0.01
        k = 10

        res_handle = idx.search(qs, k, allow_mask=handle)
        res_raw = idx.search(qs, k, allow_mask=mask)
        for qi in range(len(qs)):
            want = brute_filtered(vecs, mask, qs[qi], k)
            got_h = np.asarray(res_handle[qi].slots)[:k]
            got_r = np.asarray(res_raw[qi].slots)[:k]
            assert np.array_equal(got_h, want), (qi, got_h, want)
            assert np.array_equal(got_r, want), (qi, got_r, want)

    def test_masked_side_array_cached_across_searches(self):
        n = 1000
        idx, vecs = built_ivf(n)
        mask = RNG.random(n) < 0.2
        handle = idx.upload_allow_mask(mask)
        assert handle._masked is None  # lazy until first masked search
        idx.search(vecs[:3], 5, allow_mask=handle)
        first = handle._masked
        assert first is not None
        assert handle._paux_src is idx.main_paux
        idx.search(vecs[3:6], 5, allow_mask=handle)
        assert handle._masked is first  # no recompute, no re-upload

    def test_handle_works_pre_build_via_delta(self):
        """Below min_build the engine delegates to the flat delta; the
        handle must degrade to its host mask (delta positions index a
        different space, translated per call)."""
        from vector_store_tpu.engine.ivf import IvfDeviceIndex

        n = 100
        idx = IvfDeviceIndex(
            DIMS,
            space_type=SpaceType.COSINE,
            quantization=Quantization.F32,
            initial_capacity=256,
            interpret=True,
            query_i8=False,
            min_build=1 << 30,
        )
        vecs = RNG.normal(size=(n, DIMS)).astype(np.float32)
        idx.upsert_batch(np.arange(n), np.full(n, 1, np.int32), vecs)
        mask = RNG.random(n) < 0.3
        handle = idx.upload_allow_mask(mask)
        res = idx.search(vecs[:2] + 0.01, 5, allow_mask=handle)
        for qi in range(2):
            want = brute_filtered(vecs, mask, vecs[qi] + 0.01, 5)
            assert np.array_equal(np.asarray(res[qi].slots)[:5], want)


async def _serve_mid_selectivity():
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

    n, k = 3000, 10
    vecs = RNG.normal(size=(n, DIMS)).astype(np.float32)
    labels = (np.arange(n) % 10 == 3).astype(np.int64)  # 10% selectivity

    db = FakeDb()
    db.add_table(FakeTable("ks", "tbl", ("pk",), columns={"bucket": "int"}))
    rows = [
        vector_row((i,), vecs[i].tolist(), 100, filtering=[(100, int(labels[i]))])
        for i in range(n)
    ]
    db.add_index(
        FakeIndex(
            metadata=make_vs_metadata(dimensions=DIMS, filtering_columns=("bucket",)),
            scan=rows,
        )
    )
    service = await build_service(db, Config(monitor_indexes_interval=0.05))
    client = TestClient(TestServer(service.app))
    await client.start_server()
    try:
        deadline = asyncio.get_event_loop().time() + 60
        while True:
            resp = await client.get("/api/v1/indexes/ks/idx/status")
            if resp.status == 200:
                st = await resp.json()
                if st["status"] == "SERVING" and st["count"] == n:
                    break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.05)

        entry = service.indexes.get_vs(("ks", "idx"))
        actor = entry.actor
        eng = actor.engine
        # cluster NOW (small build threshold) and probe fully so masked
        # answers are exact -> deterministic asserts
        eng.min_build = 1024
        eng.kmeans_block = 1024
        eng.kmeans_iters = 2
        eng.interpret = True
        assert eng.maintain() is True
        eng._warm_queue.clear()
        eng.nprobe = eng.nlist

        mask = labels == 1

        async def filtered(q):
            resp = await client.post(
                "/api/v1/indexes/ks/idx/ann",
                json={
                    "vector": q.tolist(),
                    "limit": k,
                    "filter": {
                        "restrictions": [{"type": "==", "lhs": "bucket", "rhs": 1}],
                        "allow_filtering": True,
                    },
                },
            )
            assert resp.status == 200, await resp.text()
            return (await resp.json())["primary_keys"]["pk"]

        # 1) the FIRST query already promotes: its ladder walk escalates
        # 1 -> 4 -> 16, and at step 16 the requeue triage computes the
        # match set (10% dense) and re-dispatches device-masked
        q0 = vecs[3] + 0.01
        got = await filtered(q0)
        assert list(got) == brute_filtered(vecs, mask, q0, k).tolist()
        assert actor._masked_dispatches >= 1
        assert len(actor._allow_cache) == 1
        sig = next(iter(actor._allow_cache))

        # 2) repeat filter: straight to the device-masked path (the
        # allow-cache marks the filter mask-promoted even at oversample 1)
        before = actor._masked_dispatches
        q1 = vecs[13] + 0.01
        got = await filtered(q1)
        assert list(got) == brute_filtered(vecs, mask, q1, k).tolist()
        assert actor._masked_dispatches > before
        handle = actor._allow_cache[sig][1]

        # 3) more repeats reuse the SAME device-resident handle
        before = actor._masked_dispatches
        for i in (23, 33, 43):
            qi = vecs[i] + 0.01
            got = await filtered(qi)
            assert list(got) == brute_filtered(vecs, mask, qi, k).tolist()
        assert actor._masked_dispatches >= before + 3
        assert actor._allow_cache[sig][1] is handle

        # 4) a write invalidates the stamp: a new matching row (exactly at
        # the query point) must become reachable through a fresh mask
        new_vec = (q1 / np.linalg.norm(q1)).astype(np.float32)
        await db.db_indexes[("ks", "idx")].push_cdc(
            vector_row((n,), new_vec.tolist(), 200, filtering=[(200, 1)])
        )
        deadline = asyncio.get_event_loop().time() + 30
        while True:
            got = await filtered(new_vec)
            if got and got[0] == n:
                break
            assert asyncio.get_event_loop().time() < deadline
            await asyncio.sleep(0.1)
        assert actor._allow_cache[sig][1] is not handle  # rebuilt mask
    finally:
        await client.close()
        await service.stop()


class TestServiceMaskedPath:
    def test_mid_selectivity_promotes_to_device_mask(self, monkeypatch):
        import vector_store_tpu.engine.ivf as ivf_mod
        import vector_store_tpu.ops.pallas_scan as ps

        orig = ps.pallas_rank_search

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(ps, "pallas_rank_search", interp)
        monkeypatch.setattr(
            ivf_mod.IvfDeviceIndex, "_set_delta_interpret", lambda self: None
        )
        asyncio.run(_serve_mid_selectivity())
