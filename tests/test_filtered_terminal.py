"""Grouped terminal path for low-selectivity filtered ANN.

Three layers of the round-4 filtered-serving redesign:
- Table.matching_slots — the bulk (vectorized) form of is_valid_for,
  equivalence-tested against the per-row predicate over random data;
- IvfDeviceIndex.search_exact_host_subset — exact distances over only the
  match set, checked against the full exact ranking;
- VsIndexActor._finish_terminal — ladder-exhausted requests grouped by
  restriction signature answer from ONE subset scan, with the match cache
  short-circuiting later queries carrying the same filter.

Reference contrast: filtered search there over-fetches from the full
index per query (usearch.rs:1067-1154); the reference's 0.1%-selectivity
benchmark bucket (crates/benchmark/src/main.rs:45-49) is the regime this
path exists for.
"""

import asyncio

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vector_store_tpu.core import (  # noqa: E402
    DbIndexedValue,
    IndexKey,
    PrimaryKey,
    Restriction,
    Timestamp,
    Timestamped,
)
from vector_store_tpu.core.ids import PartitionId  # noqa: E402
from vector_store_tpu.core.types import (  # noqa: E402
    DbIndexPartitioning,
    Dimensions,
    IndexMetadata,
    IndexOptionsVs,
    IndexVersion,
    Quantization,
    SpaceType,
)
from vector_store_tpu.table import Table  # noqa: E402

KEY = IndexKey("ks", "idx")
RNG = np.random.default_rng(1234)


def make_metadata(filtering=("f1", "f2")):
    return IndexMetadata(
        keyspace_name="ks",
        index_name="idx",
        table_name="tbl",
        primary_key_columns=("pk", "ck"),
        partition_key_count=1,
        target_columns=("emb",),
        partitioning=DbIndexPartitioning.global_(),
        filtering_columns=tuple(filtering),
        version=IndexVersion.nil(),
        vs_options=IndexOptionsVs(dimensions=Dimensions(3)),
    )


def fval(millis, value):
    return Timestamped(
        Timestamp.from_millis(millis),
        DbIndexedValue.filtering(value) if value is not None else None,
    )


def vec_values(millis, extra):
    return (
        Timestamped(
            Timestamp.from_millis(millis),
            DbIndexedValue.vector([1.0, 2.0, 3.0]),
        ),
        *extra,
    )


def populated_table(n=400):
    """Rows with an int column f1 in 0..9 (some null) and a str column f2."""
    t = Table(make_metadata())
    f1 = RNG.integers(0, 10, size=n)
    nulls = RNG.random(n) < 0.1
    strs = np.array(["ant", "bee", "cat"])[RNG.integers(0, 3, size=n)]
    for i in range(n):
        v1 = None if nulls[i] else int(f1[i])
        t.upsert(
            KEY,
            PrimaryKey.from_values((i, 0)),
            vec_values(100, (fval(100, v1), fval(100, str(strs[i])))),
        )
    return t


def brute_matching(t, pid, restrictions):
    idx = t.indexes[pid.index_id]
    out = []
    for slot in range(len(t.primary_keys)):
        if slot >= len(idx.epochs) or idx.epochs[slot] < 0:
            continue
        from vector_store_tpu.core.ids import PrimaryId

        prim = PrimaryId.new(slot, int(idx.epochs[slot]))
        if all(t.is_valid_for(pid, prim, r) for r in restrictions):
            out.append(slot)
    return np.asarray(out, dtype=np.int64)


class TestMatchingSlots:
    @pytest.mark.parametrize(
        "restrictions",
        [
            [Restriction.eq("f1", 3)],
            [Restriction.in_("f1", (1, 4, 9))],
            [Restriction.lt("f1", 5)],
            [Restriction.gte("f1", 7)],
            [Restriction.eq("f2", "bee")],  # string -> per-row fallback
            [Restriction.eq("pk", 17)],  # pk column -> per-row fallback
            [Restriction.eq("f1", 2), Restriction.eq("f2", "cat")],
            [Restriction.eq("f1", 99)],  # no match
        ],
    )
    def test_agrees_with_is_valid_for(self, restrictions):
        t = populated_table()
        pid = PartitionId.global_for(t.index_id(KEY))
        got = t.matching_slots(pid, restrictions)
        want = brute_matching(t, pid, restrictions)
        assert np.array_equal(np.sort(got), want)

    def test_null_never_matches(self):
        t = Table(make_metadata())
        t.upsert(
            KEY,
            PrimaryKey.from_values((1, 0)),
            vec_values(100, (fval(100, None), fval(100, "x"))),
        )
        pid = PartitionId.global_for(t.index_id(KEY))
        for r in (
            Restriction.eq("f1", 0),
            Restriction.lt("f1", 100),
            Restriction.gte("f1", -100),
        ):
            assert t.matching_slots(pid, [r]).size == 0

    def test_numeric_cache_invalidated_by_mutation(self):
        t = populated_table(64)
        pid = PartitionId.global_for(t.index_id(KEY))
        before = t.matching_slots(pid, [Restriction.eq("f1", 3)])
        # flip one row into the bucket; the float64 view must refresh
        t.upsert(
            KEY,
            PrimaryKey.from_values((999, 0)),
            vec_values(200, (fval(200, 3), fval(200, "zz"))),
        )
        after = t.matching_slots(pid, [Restriction.eq("f1", 3)])
        assert after.size == before.size + 1

    def test_big_int_column_falls_back_exactly(self):
        """Ints beyond 2^53 must not ride the float64 fast path."""
        t = Table(make_metadata())
        a, b = 2**60, 2**60 + 1  # indistinguishable as float64
        t.upsert(
            KEY,
            PrimaryKey.from_values((1, 0)),
            vec_values(100, (fval(100, a), fval(100, "x"))),
        )
        t.upsert(
            KEY,
            PrimaryKey.from_values((2, 0)),
            vec_values(100, (fval(100, b), fval(100, "x"))),
        )
        pid = PartitionId.global_for(t.index_id(KEY))
        got = t.matching_slots(pid, [Restriction.eq("f1", a)])
        assert got.size == 1


class TestSubsetExactHost:
    def make_index(self, d=16, space=SpaceType.COSINE):
        from vector_store_tpu.engine.ivf import IvfDeviceIndex

        return IvfDeviceIndex(
            d,
            space_type=space,
            quantization=Quantization.F32,
            initial_capacity=1024,
            interpret=True,
            query_i8=False,
            min_build=1 << 30,  # stay in the delta/flat regime
        )

    @pytest.mark.parametrize("space", [SpaceType.COSINE, SpaceType.EUCLIDEAN])
    def test_matches_full_exact(self, space):
        n, d = 300, 16
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        idx = self.make_index(d, space)
        idx.upsert_batch(np.arange(n), np.full(n, 1, np.int32), vecs)
        slots = np.sort(RNG.choice(n, size=40, replace=False))
        queries = RNG.normal(size=(3, d)).astype(np.float32)
        dists, epochs = idx.search_exact_host_subset(queries, slots)
        assert dists.shape == (3, 40)
        assert np.array_equal(epochs, np.full(40, 1, np.int32))
        for qi in range(3):
            full = idx.search_exact_host(queries[qi], n)
            by_slot = {int(s): float(dd) for s, dd in zip(full.slots, full.distances)}
            for j, s in enumerate(slots):
                assert abs(dists[qi, j] - by_slot[int(s)]) < 1e-5

    def test_dead_and_out_of_range_slots_are_inf(self):
        n, d = 50, 16
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        idx = self.make_index(d)
        idx.upsert_batch(np.arange(n), np.full(n, 1, np.int32), vecs)
        idx.remove_batch(np.asarray([7]))
        q = RNG.normal(size=(1, d)).astype(np.float32)
        dists, epochs = idx.search_exact_host_subset(
            q, np.asarray([7, 8, 10**9, -1])
        )
        assert np.isinf(dists[0, 0])  # removed
        assert np.isfinite(dists[0, 1])
        assert np.isinf(dists[0, 2]) and np.isinf(dists[0, 3])


class TestServiceTerminalPath:
    """Low-selectivity filter through the REAL service: the ladder
    exhausts, the grouped terminal answers, the match cache serves
    repeats, and a write invalidates it."""

    def test_low_selectivity_end_to_end(self):
        asyncio.run(self._run())

    async def _run(self):
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

        n, d, k = 3000, 8, 10
        rare = 15  # rows matching the filter: ~0.5% selectivity
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        labels = np.zeros(n, dtype=np.int64)
        rare_rows = RNG.choice(n, size=rare, replace=False)
        labels[rare_rows] = 7

        db = FakeDb()
        db.add_table(FakeTable("ks", "tbl", ("pk",)))
        rows = [
            vector_row(
                (i,), vecs[i].tolist(), 100, filtering=[(100, int(labels[i]))]
            )
            for i in range(n)
        ]
        db.add_index(
            FakeIndex(
                metadata=make_vs_metadata(
                    dimensions=d, filtering_columns=("bucket",)
                ),
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

            # exact filtered ground truth (cosine)
            qn = vecs[rare_rows[0]] + 0.01
            sub = vecs[rare_rows]
            d2 = (
                1.0
                - (qn / np.linalg.norm(qn))
                @ (sub / np.linalg.norm(sub, axis=1, keepdims=True)).T
            )
            want = set(rare_rows[np.argsort(d2)][:k].tolist())

            async def filtered_ids():
                resp = await client.post(
                    "/api/v1/indexes/ks/idx/ann",
                    json={
                        "vector": qn.tolist(),
                        "limit": k,
                        "filter": {
                            "restrictions": [
                                {"type": "==", "lhs": "bucket", "rhs": 7}
                            ],
                            "allow_filtering": True,
                        },
                    },
                )
                assert resp.status == 200, await resp.text()
                return set((await resp.json())["primary_keys"]["pk"])

            entry = service.indexes.get_vs(("ks", "idx"))
            actor = entry.actor

            got = await filtered_ids()
            assert got == want
            # ladder exhausted -> grouped terminal -> match cache populated
            assert actor._exact_fallbacks >= 1
            # ...and the debug-counter surface mirrors the filtered-path
            # counters (the reference's internals.rs idiom)
            resp = await client.get("/api/internals/counters")
            assert resp.status == 200
            counters = await resp.json()
            assert counters.get("vs_index_exact_host_fallbacks", 0) >= 1, (
                counters
            )
            assert any(
                v[1].size == rare for v in actor._match_cache.values()
            ), {kk: v[1].size for kk, v in actor._match_cache.items()}

            # repeat: served from the cached match set, same answer
            fallbacks_before = actor._exact_fallbacks
            got2 = await filtered_ids()
            assert got2 == want
            assert actor._exact_fallbacks > fallbacks_before

            # a write moves a new row into the bucket: the stamped cache
            # must refresh and the new row must be reachable
            new_vec = (qn / np.linalg.norm(qn)).astype(np.float32)
            await db.db_indexes[("ks", "idx")].push_cdc(
                vector_row((n,), new_vec.tolist(), 200, filtering=[(200, 7)])
            )
            deadline = asyncio.get_event_loop().time() + 30
            while True:
                got3 = await filtered_ids()
                if n in got3:
                    break
                assert asyncio.get_event_loop().time() < deadline
                await asyncio.sleep(0.1)
        finally:
            await client.close()
            await service.stop()
