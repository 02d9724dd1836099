"""IVF engine: grouped-scan recall vs exact oracle, delta/main lifecycle,
epoch propagation, slot translation (interpret mode on CPU).

The engine contract matches FlatDeviceIndex's: slot-addressed upserts and
removals, ids-only result pulls, exact f32 distances recomputed host-side.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vector_store_tpu.core.types import Quantization, SpaceType  # noqa: E402

RNG = np.random.default_rng(77)


@pytest.fixture
def interp_pallas(monkeypatch):
    """Force the flat engine's pallas kernel into interpret mode (the IVF
    delta region runs through it)."""
    import vector_store_tpu.ops.pallas_scan as ps

    orig = ps.pallas_rank_search

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(ps, "pallas_rank_search", interp)


def make_index(d=32, space=SpaceType.EUCLIDEAN, **kw):
    from vector_store_tpu.engine.ivf import IvfDeviceIndex

    kw.setdefault("min_build", 1024)
    kw.setdefault("kmeans_block", 1024)
    kw.setdefault("nprobe", 16)
    kw.setdefault("kmeans_iters", 4)
    return IvfDeviceIndex(
        d,
        space_type=space,
        quantization=Quantization.F32,
        initial_capacity=4096,
        interpret=True,
        query_i8=False,
        **kw,
    )


def clustered(n, d, n_clusters=64, seed=1):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 4
    assign = rng.integers(0, n_clusters, size=n)
    return (
        centers[assign] + rng.normal(size=(n, d)).astype(np.float32),
        centers,
    )


def exact_topk(queries, vecs, k, space):
    if space is SpaceType.EUCLIDEAN:
        d = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    else:
        qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
        vn = vecs / np.linalg.norm(vecs, axis=-1, keepdims=True)
        d = 1.0 - qn @ vn.T
    return np.argsort(d, axis=1)[:, :k]


class TestIvfBuildAndSearch:
    def test_recall_after_build(self, interp_pallas):
        n, d, b, k = 4096, 32, 32, 10
        vecs, centers = clustered(n, d)
        idx = make_index(d)
        idx.upsert_batch(np.arange(n), np.full(n, 5, np.int32), vecs)
        assert idx.main_vecs is None
        assert idx.maintain() is True
        assert idx.main_vecs is not None
        assert idx.nlist >= 64 or idx.nlist == 64
        queries = vecs[RNG.integers(0, n, size=b)] + 0.05 * RNG.normal(
            size=(b, d)
        ).astype(np.float32)
        res = idx.search(queries, k)
        gt = exact_topk(queries, vecs, k, SpaceType.EUCLIDEAN)
        hits = sum(
            len(set(r.slots.tolist()) & set(gt[i].tolist()))
            for i, r in enumerate(res)
        )
        recall = hits / (b * k)
        assert recall >= 0.85, recall
        for r in res:
            assert (r.epochs == 5).all()
            assert (np.diff(r.distances) >= -1e-6).all()

    def test_delegate_before_build(self, interp_pallas):
        n, d, b, k = 512, 32, 16, 5
        vecs, _ = clustered(n, d)
        idx = make_index(d, min_build=10**9)
        idx.upsert_batch(np.arange(n) * 3, np.full(n, 2, np.int32), vecs)
        assert idx.maintain() is False  # below min_build
        res = idx.search(vecs[:b], k)
        for i, r in enumerate(res):
            assert r.slots[0] == i * 3  # slot translation delta pos -> slot
            assert r.distances[0] == pytest.approx(0.0, abs=1e-3)
            assert (r.epochs == 2).all()

    def test_sampled_kmeans_rebuild(self, interp_pallas):
        """Rebuilds above the sample cap cluster on a row sample and label
        the full set in one assignment pass; recall must hold."""
        n, d, b, k = 4096, 32, 16, 10
        vecs, _ = clustered(n, d)
        idx = make_index(d, kmeans_sample_cap=1024)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        assert idx.maintain()
        queries = vecs[RNG.integers(0, n, size=b)]
        res = idx.search(queries, k)
        gt = exact_topk(queries, vecs, k, SpaceType.EUCLIDEAN)
        hits = sum(
            len(set(r.slots.tolist()) & set(gt[i].tolist()))
            for i, r in enumerate(res)
        )
        assert hits / (b * k) >= 0.8, hits / (b * k)

    def test_cosine_space(self, interp_pallas):
        n, d, b, k = 2048, 32, 16, 5
        vecs, _ = clustered(n, d)
        idx = make_index(d, space=SpaceType.COSINE)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        assert idx.maintain()
        queries = vecs[:b]
        res = idx.search(queries, k)
        gt = exact_topk(queries, vecs, k, SpaceType.COSINE)
        hits = sum(
            len(set(r.slots.tolist()) & set(gt[i].tolist()))
            for i, r in enumerate(res)
        )
        assert hits / (b * k) >= 0.8
        for r in res:
            assert (r.distances >= -1e-6).all() and (r.distances <= 2.0).all()


class TestIvfLifecycle:
    def _built(self, n=2048, d=32):
        vecs, _ = clustered(n, d)
        idx = make_index(d)
        idx.upsert_batch(np.arange(n), np.ones(n, np.int32), vecs)
        assert idx.maintain()
        idx._warm_queue.clear()  # tests drive shapes explicitly
        return idx, vecs

    def test_upsert_after_build_lands_in_delta(self, interp_pallas):
        idx, vecs = self._built()
        n, d = vecs.shape
        new = RNG.normal(size=(8, d)).astype(np.float32) * 20 + 100
        idx.upsert_batch(
            np.arange(n, n + 8), np.full(8, 9, np.int32), new
        )
        assert idx.size == n + 8
        res = idx.search(new, 3)
        for i, r in enumerate(res):
            assert r.slots[0] == n + i
            assert r.epochs[0] == 9
            assert r.distances[0] == pytest.approx(0.0, abs=1e-2)

    def test_remove_from_main_and_delta(self, interp_pallas):
        idx, vecs = self._built()
        n, d = vecs.shape
        # remove a main-resident slot
        assert idx._region[7] == 1  # _MAIN
        idx.remove_batch(np.asarray([7]))
        res = idx.search(vecs[7:8].repeat(8, axis=0), 5)
        assert not any(7 in r.slots for r in res)
        # add to delta, then remove
        new = np.full((1, d), 55.0, np.float32)
        idx.upsert_batch(np.asarray([n]), np.asarray([1]), new)
        idx.remove_batch(np.asarray([n]))
        res = idx.search(new.repeat(8, axis=0), 5)
        assert not any(n in r.slots for r in res)
        assert idx.size == vecs.shape[0] - 1

    def test_upsert_main_slot_moves_to_delta(self, interp_pallas):
        idx, vecs = self._built()
        d = vecs.shape[1]
        new = np.full((1, d), -40.0, np.float32)
        idx.upsert_batch(np.asarray([3]), np.asarray([8]), new)
        assert idx._region[3] == 2  # _DELTA
        res = idx.search(new.repeat(8, axis=0), 3)[0]
        assert res.slots[0] == 3
        assert res.epochs[0] == 8
        # the OLD vector at slot 3 must not be findable anymore
        res_old = idx.search(vecs[3:4].repeat(8, axis=0), 5)
        for r in res_old:
            if 3 in r.slots:
                j = list(r.slots).index(3)
                # it's the new value's distance, not the old one's
                assert r.distances[j] > 1.0

    def test_incremental_rebuild_merges_delta(self, interp_pallas):
        idx, vecs = self._built()
        n, d = vecs.shape
        extra, _ = clustered(1200, d, seed=9)
        idx.upsert_batch(
            np.arange(n, n + 1200), np.zeros(1200, np.int32), extra
        )
        assert idx.maintain() is True  # delta > 20% of live
        # only cluster-overflow spill remains in the delta (< 2% of rows)
        assert int((idx._region == 2).sum()) <= (n + 1200) * 0.02
        res = idx.search(extra[:8], 3)
        for i, r in enumerate(res):
            assert r.slots[0] == n + i

    def test_sliced_rebuild_with_mid_build_mutations(self, interp_pallas):
        """Budgeted maintain() advances the rebuild one bounded slice at a
        time; upserts/removes landing between slices must be reconciled at
        swap (stale snapshot copies tombstoned, current values served)."""
        idx, vecs = self._built()
        n, d = vecs.shape
        extra, _ = clustered(1200, d, seed=11)
        idx.upsert_batch(
            np.arange(n, n + 1200), np.zeros(1200, np.int32), extra
        )
        assert idx.maintain(budget=1) is True  # snapshot slice
        assert idx._build is not None
        # mutations between slices
        new5 = np.full((1, d), 77.0, np.float32)
        idx.upsert_batch(np.asarray([5]), np.asarray([9]), new5)
        idx.remove_batch(np.asarray([6]))
        ns = n + 1200
        new_row = np.full((1, d), -88.0, np.float32)
        idx.upsert_batch(np.asarray([ns]), np.asarray([3]), new_row)
        steps = 0
        while idx._build is not None:
            assert idx.maintain(budget=1) is True
            steps += 1
        assert steps >= 1
        # the swap queued the mid-build mutations for bounded re-entry:
        # during the lag window the STALE snapshot copy of slot 5 must not
        # serve (tombstoned at swap — the reference's stale-epoch-rejection
        # window during CDC lag)
        assert idx.maintain_pending() == "reenter"
        res = idx.search(vecs[5:6].repeat(8, axis=0), 10)
        for rr in res:
            for s, dist in zip(rr.slots, rr.distances):
                if s == 5:
                    assert dist > 1.0
        while idx.maintain_pending() == "reenter":
            assert idx.maintain(budget=1) is True
        # upserted value serves with its new epoch
        r = idx.search(new5.repeat(8, axis=0), 3)[0]
        assert r.slots[0] == 5 and r.epochs[0] == 9
        assert r.distances[0] == pytest.approx(0.0, abs=1e-2)
        # removed slot is gone
        res = idx.search(vecs[6:7].repeat(8, axis=0), 5)
        assert not any(6 in rr.slots for rr in res)
        # slot created mid-build serves
        r = idx.search(new_row.repeat(8, axis=0), 1)[0]
        assert r.slots[0] == ns and r.epochs[0] == 3
        # the stale snapshot copy of slot 5 must not serve at distance 0
        res = idx.search(vecs[5:6].repeat(8, axis=0), 10)
        for rr in res:
            for s, dist in zip(rr.slots, rr.distances):
                if s == 5:
                    assert dist > 1.0
        assert idx.size == n + 1200 + 1 - 1

    def test_allow_mask(self, interp_pallas):
        idx, vecs = self._built()
        allow = np.zeros((idx.capacity,), dtype=bool)
        allow[:100] = True
        res = idx.search(vecs[:8], 10, allow_mask=allow)
        for r in res:
            assert r.slots.size and (r.slots < 100).all()

    def test_collect_many_mixed(self, interp_pallas):
        idx, vecs = self._built()
        p1 = idx.search_begin(vecs[:8], 3)
        p2 = idx.search_begin(vecs[8:16], 3)
        out = idx.collect_many([p1, p2])
        assert out[0][0].slots[0] == 0
        assert out[1][0].slots[0] == 8

    def test_device_bytes_and_size(self, interp_pallas):
        idx, vecs = self._built()
        assert idx.size == vecs.shape[0]
        assert idx.device_bytes > 0


class TestIvfOps:
    def test_ivf_layout_overflow(self):
        from vector_store_tpu.ops.ivf import ivf_layout

        labels = jnp.asarray(np.array([0, 0, 0, 1, 1, 2], dtype=np.int32))
        live = jnp.asarray(np.array([1, 1, 1, 1, 0, 1], dtype=bool))
        pos, overflow = ivf_layout(labels, live, nlist=4, cmax=2)
        pos = np.asarray(pos)
        overflow = np.asarray(overflow)
        # cluster 0 holds rows 0,1 at positions 0,1; row 2 overflows
        assert set(pos[:2].tolist()) == {0, 1}
        assert pos[2] == -1 and overflow[2]
        assert pos[3] == 2  # cluster 1 first slot
        assert pos[4] == -1 and not overflow[4]  # dead row: no spill
        assert pos[5] == 4  # cluster 2 first slot

    def test_ivf_layout_second_choice(self):
        from vector_store_tpu.ops.ivf import ivf_layout

        labels = jnp.asarray(np.array([0, 0, 0, 0, 1, 3], dtype=np.int32))
        labels2 = jnp.asarray(np.array([1, 1, 1, 2, 0, 0], dtype=np.int32))
        live = jnp.asarray(np.ones(6, dtype=bool))
        pos, overflow = ivf_layout(
            labels, live, nlist=4, cmax=2, labels2=labels2
        )
        pos = np.asarray(pos)
        overflow = np.asarray(overflow)
        # rows 0,1 fill cluster 0; row 4 takes cluster 1 slot 0 (round 1).
        assert set(pos[:2].tolist()) == {0, 1}
        assert pos[4] == 2
        assert pos[5] == 6  # cluster 3 first slot
        # overflow rows 2,3: row 2 -> cluster 1 after its round-1 row
        # (position 3); row 3 -> cluster 2 (empty, position 4)
        assert pos[2] == 3 and not overflow[2]
        assert pos[3] == 4 and not overflow[3]
        # second choice saturated: three rows overflowing into one
        # single-slot cluster spill the losers to the delta
        labels = jnp.asarray(np.array([0, 0, 0, 0], dtype=np.int32))
        labels2 = jnp.asarray(np.array([1, 1, 1, 1], dtype=np.int32))
        live = jnp.asarray(np.ones(4, dtype=bool))
        pos, overflow = ivf_layout(
            labels, live, nlist=2, cmax=2, labels2=labels2
        )
        pos = np.asarray(pos)
        overflow = np.asarray(overflow)
        assert set(pos[:2].tolist()) == {0, 1}
        assert (pos[2:] >= 0).sum() == 2  # both cluster-1 slots taken
        assert overflow.sum() == 0
        labels = jnp.asarray(np.array([0, 0, 0, 0, 0], dtype=np.int32))
        labels2 = jnp.asarray(np.array([1, 1, 1, 1, 1], dtype=np.int32))
        live = jnp.asarray(np.ones(5, dtype=bool))
        pos, overflow = ivf_layout(
            labels, live, nlist=2, cmax=2, labels2=labels2
        )
        assert np.asarray(overflow).sum() == 1  # one loser spills

    def test_kmeans_clusters_separate_data(self):
        from vector_store_tpu.ops.ivf import kmeans

        n, d = 1024, 16
        half = n // 2
        x = np.zeros((n, d), np.float32)
        x[:half] = 10.0 + RNG.normal(size=(half, d)).astype(np.float32)
        x[half:] = -10.0 + RNG.normal(size=(half, d)).astype(np.float32)
        cent, labels = kmeans(
            jnp.asarray(x),
            jnp.ones((n,), jnp.float32),
            nlist=2,
            iters=5,
            block=256,
        )
        labels = np.asarray(labels)
        # the two blobs must not share a label
        assert len(set(labels[:half].tolist())) == 1
        assert len(set(labels[half:].tolist())) == 1
        assert labels[0] != labels[-1]

    def test_regroup_packed_matches_argsort_fallback(self):
        """The packed-key sort and the argsort fallback must assign
        identical slots (both rank pairs by (cluster, pair index))."""
        from vector_store_tpu.ops.ivf import _regroup_pairs

        b, nprobe, nlist, s = 64, 8, 16, 16  # saturates several clusters
        probes = jnp.asarray(
            RNG.integers(0, nlist + 1, size=(b, nprobe)).astype(np.int32)
        )  # includes sentinel ids == nlist
        fast = _regroup_pairs(probes, nlist=nlist, s=s, nprobe=nprobe)
        slow = _regroup_pairs(
            probes, nlist=nlist, s=s, nprobe=nprobe, force_fallback=True
        )
        for a, c in zip(fast, slow):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        qtab, filled, row_of_pair = (np.asarray(x) for x in fast)
        # every filled slot's qtab entry must point at a query whose
        # row_of_pair maps back to that slot
        rows = np.flatnonzero(filled)
        for r in rows.tolist():
            q = qtab[r]
            assert r in row_of_pair[q].tolist()

    def test_ivf_candidates_approx_matches_exact_on_cpu(self):
        """approx=True lowers to the exact selector off-TPU; the flag must
        not change the candidate contract (ids + rank values)."""
        from vector_store_tpu.ops.ivf import ivf_candidates

        nlist, cmax, d, b, nprobe, s, k = 8, 128, 16, 32, 4, 16, 8
        rng = np.random.default_rng(7)
        # well-separated cluster geometry: probe choice is unambiguous, so
        # the bf16 affinity plane must pick the same clusters as f32
        cent = (rng.normal(size=(nlist, d)) * 20.0).astype(np.float32)
        labels = rng.integers(0, nlist, size=nlist * cmax)
        vecs = (
            cent[labels] + rng.normal(size=(nlist * cmax, d)) * 0.1
        ).astype(np.float32)
        paux = np.zeros((8, nlist * cmax), np.float32)
        paux[0] = -2.0
        paux[1] = (vecs**2).sum(-1)
        qs = (
            cent[rng.integers(0, nlist, size=b)]
            + rng.normal(size=(b, d)) * 0.1
        ).astype(np.float32)
        q_live = jnp.ones((b,), jnp.bool_)
        kw = dict(
            k=k, nprobe=nprobe, s=s, cmax=cmax, spherical=False,
            interpret=True,
        )
        pe, de = ivf_candidates(
            jnp.asarray(vecs), jnp.asarray(paux), jnp.asarray(cent),
            jnp.asarray(qs), q_live, approx=False, **kw
        )
        pa, da = ivf_candidates(
            jnp.asarray(vecs), jnp.asarray(paux), jnp.asarray(cent),
            jnp.asarray(qs), q_live, approx=True, **kw
        )
        # candidate SETS per query must be near-identical; bf16 affinity
        # may swap near-tie marginal probes (fixed seed => deterministic;
        # the hard recall guarantee is the 1M hardware gate)
        ids_e = np.sort(
            np.asarray(jax.lax.bitcast_convert_type(pe[1], jnp.int32)), 1
        )
        ids_a = np.sort(
            np.asarray(jax.lax.bitcast_convert_type(pa[1], jnp.int32)), 1
        )
        assert (ids_e == ids_a).mean() > 0.9
        np.testing.assert_array_equal(np.asarray(de), np.asarray(da))

    def test_choose_geometry(self):
        from vector_store_tpu.ops.ivf import (
            choose_budget,
            choose_cmax,
            choose_nlist,
        )

        assert choose_nlist(1_000_000) == 2048
        assert choose_nlist(1000) == 64
        cmax = choose_cmax(1_000_000, 2048)
        assert cmax % 128 == 0 and cmax * 2048 >= 1_000_000
        s = choose_budget(2048, 32, 1024)
        assert s >= 2 * (2048 * 32 // 1024) and s % 16 == 0


class TestIvfDroppedPairs:
    def test_duplicate_heavy_batch_retries(self, interp_pallas):
        """A batch of many IDENTICAL queries saturates the probed clusters'
        S query slots; the grouped scan drops the overflow pairs, and the
        engine must detect it and re-dispatch those queries (ADVICE r2
        high: silent drops returned empty results for the later queries)."""
        n, d = 2048, 16
        vecs, _ = clustered(n, d, n_clusters=16)
        idx = make_index(d, nprobe=4)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        assert idx.maintain()
        idx._warm_queue.clear()
        q = vecs[11] + 0.01
        batch = np.repeat(q[None, :], 128, axis=0)  # S=16 << 128 queries
        res = idx.search(batch, 5)
        assert idx.dropped_pair_queries > 0, (
            "test setup no longer provokes drops; shrink S or grow the batch"
        )
        gt = exact_topk(q[None, :], vecs, 5, SpaceType.EUCLIDEAN)[0]
        for r in res:
            # every duplicate query gets the SAME, correct top-1
            assert r.slots.size >= 1
            assert r.slots[0] == gt[0]

    def test_slot_budget_escalates_after_drops(self, interp_pallas):
        """Sustained skew must not pay the retry round trips per batch: the
        first dropping batch bumps s_boost, and the SAME batch re-searched
        at the escalated budget produces zero drops (s caps at b_pad, where
        drops are impossible — one pair per query per cluster)."""
        n, d = 2048, 16
        vecs, _ = clustered(n, d, n_clusters=16)
        idx = make_index(d, nprobe=4)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        assert idx.maintain()
        idx._warm_queue.clear()
        q = vecs[11] + 0.01
        batch = np.repeat(q[None, :], 128, axis=0)
        assert idx.s_boost == 1
        idx.search(batch, 5)
        assert idx.dropped_pair_queries > 0
        assert idx.s_boost > 1, "drops must escalate the slot budget"
        before = idx.dropped_pair_queries
        res = idx.search(batch, 5)
        assert idx.dropped_pair_queries == before, (
            "escalated budget should serve the same skewed batch drop-free"
        )
        gt = exact_topk(q[None, :], vecs, 5, SpaceType.EUCLIDEAN)[0]
        for r in res:
            assert r.slots[0] == gt[0]

    def test_exact_host_escalation(self, interp_pallas):
        n, d, k = 2048, 16, 50
        vecs, _ = clustered(n, d)
        idx = make_index(d)
        idx.upsert_batch(np.arange(n), np.full(n, 4, np.int32), vecs)
        assert idx.maintain()
        q = vecs[123] + 0.01
        res = idx.search_exact_host(q, k)
        gt = exact_topk(q[None, :], vecs, k, SpaceType.EUCLIDEAN)[0]
        assert res.slots.tolist() == gt.tolist()
        assert (res.epochs == 4).all()
        assert (np.diff(res.distances) >= -1e-6).all()
        # full-index k: complete ranking, no device programs involved
        res_all = idx.search_exact_host(q, n)
        assert res_all.slots.size == n


class TestIvfDeltaChurn:
    def test_delta_positions_recycled(self, interp_pallas):
        """remove/re-add churn on a small (never rebuilt) index must not
        grow the delta: freed positions are recycled (ADVICE r2 medium —
        append-only positions were a device-memory leak)."""
        d = 16
        idx = make_index(d, min_build=10**9)
        n = 256
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        high = idx._delta_next
        cap0 = idx._delta.capacity
        for i in range(50):
            idx.remove_batch(np.arange(0, 64))
            idx.upsert_batch(
                np.arange(0, 64),
                np.full(64, i + 1, np.int32),
                RNG.normal(size=(64, d)).astype(np.float32),
            )
        assert idx._delta_next == high  # all churn reused freed positions
        assert idx._delta.capacity == cap0
        assert idx.size == n
        r = idx.search(np.asarray(idx._vecs_host[3])[None, :].repeat(8, 0), 3)[0]
        assert r.slots[0] == 3 and r.epochs[0] == 50


class TestIvfRebuildFailure:
    def test_failed_rebuild_restores_and_keeps_serving(
        self, interp_pallas, monkeypatch
    ):
        """A rebuild that throws mid-swap must restore the previous
        main+delta and keep serving them (_build_fail no longer disables
        IVF when a main region exists; ADVICE r2 low — rows silently
        disappeared from serving until restart)."""
        n, d = 2048, 32
        vecs, _ = clustered(n, d)
        idx = make_index(d)
        idx.upsert_batch(np.arange(n), np.ones(n, np.int32), vecs)
        assert idx.maintain()
        idx._warm_queue.clear()
        extra, _ = clustered(1200, d, seed=5)
        idx.upsert_batch(np.arange(n, n + 1200), np.zeros(1200, np.int32), extra)
        # a point mass larger than any cmax guarantees cluster overflow, so
        # the swap's device-side spill re-entry (the failure surface under
        # test) is certain to fire
        mass = np.full((300, d), 55.0, np.float32)
        idx.upsert_batch(
            np.arange(n + 1200, n + 1500), np.zeros(300, np.int32), mass
        )
        size_before = idx.size

        # start a budgeted rebuild, mutate mid-build, then make the swap's
        # device-side spill re-entry throw once (the swap's only bulk
        # ingest since dirty rows re-enter via bounded post-swap chunks)
        assert idx.maintain(budget=1) is True
        assert idx._build is not None
        new5 = np.full((1, d), 77.0, np.float32)
        idx.upsert_batch(np.asarray([5]), np.asarray([9]), new5)

        from vector_store_tpu.engine.flat import FlatDeviceIndex

        real_bulk = FlatDeviceIndex.upsert_bulk_device
        calls = {"n": 0}

        def boom(self, *a, **kw):
            calls["n"] += 1
            raise RuntimeError("injected swap failure")

        monkeypatch.setattr(FlatDeviceIndex, "upsert_bulk_device", boom)
        while idx._build is not None:
            ok = idx.maintain(budget=1)
            if not ok:
                break
        monkeypatch.setattr(FlatDeviceIndex, "upsert_bulk_device", real_bulk)
        assert calls["n"] == 1  # the spill re-entry fired and failed
        assert idx._build is None
        assert idx._ivf_ok is True  # NOT disabled: old main exists
        assert idx.size == size_before
        # old state serves: pre-rebuild rows AND the mid-build mutation
        r = idx.search(new5.repeat(8, axis=0), 3)[0]
        assert r.slots[0] == 5 and r.epochs[0] == 9
        r = idx.search(extra[:8], 3)
        assert r[0].slots[0] == n
        # and a later rebuild succeeds cleanly
        assert idx.maintain() is True
        idx._warm_queue.clear()
        r = idx.search(new5.repeat(8, axis=0), 3)[0]
        assert r.slots[0] == 5 and r.epochs[0] == 9


class TestIvfDuplicateSlots:
    def test_upsert_duplicates_last_wins(self, interp_pallas):
        idx = make_index(16)
        n = 512
        vecs = RNG.normal(size=(n, 16)).astype(np.float32)
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        v2 = np.full((16,), 7.0, np.float32)
        idx.upsert_batch(
            np.asarray([3, 3]),
            np.asarray([1, 2]),
            np.stack([vecs[3], v2]),
        )
        assert idx.size == n
        res = idx.search(np.repeat(v2[None, :], 8, axis=0), 1)[0]
        assert res.slots[0] == 3 and res.epochs[0] == 2
        idx.remove_batch(np.asarray([3, 3]))
        assert idx.size == n - 1


class TestIvfI8:
    """I8-quantized IVF (VERDICT r2 #3): sub-linear serving for quantized
    global indexes. i8 rows are scanned by true-scale bf16 queries (127x
    scale folded into paux); final distances are exact f32 host-side."""

    @pytest.mark.parametrize(
        "space",
        [SpaceType.EUCLIDEAN, SpaceType.COSINE, SpaceType.DOT_PRODUCT],
    )
    def test_i8_recall(self, interp_pallas, space):
        from vector_store_tpu.engine.ivf import IvfDeviceIndex

        n, d, b, k = 4096, 32, 24, 10
        vecs, _ = clustered(n, d)
        if space is not SpaceType.COSINE:
            # I8 storage uses the USearch [-1, 1] -> [-127, 127] convention
            # (ops/quantize.py): euclidean/dot inputs must be pre-scaled
            # into range or they clip (cosine normalizes first)
            vecs = vecs / np.abs(vecs).max()
        idx = IvfDeviceIndex(
            d,
            space_type=space,
            quantization=Quantization.I8,
            initial_capacity=4096,
            min_build=1024,
            kmeans_block=1024,
            nprobe=16,
            kmeans_iters=4,
            interpret=True,
            query_i8=False,
        )
        idx.upsert_batch(np.arange(n), np.full(n, 3, np.int32), vecs)
        assert idx.maintain() is True
        assert idx.main_vecs is not None
        assert str(idx.main_vecs.dtype) == "int8"
        idx._warm_queue.clear()
        queries = vecs[RNG.integers(0, n, size=b)] + 0.02 * RNG.normal(
            size=(b, d)
        ).astype(np.float32)
        res = idx.search(queries, k)
        if space is SpaceType.DOT_PRODUCT:
            qn = queries
            d_all = 1.0 - qn @ vecs.T
            gt = np.argsort(d_all, axis=1)[:, :k]
        else:
            gt = exact_topk(queries, vecs, k, space)
        hits = sum(
            len(set(r.slots.tolist()) & set(gt[i].tolist()))
            for i, r in enumerate(res)
        )
        recall = hits / (b * k)
        assert recall >= 0.8, (space, recall)
        for r in res:
            assert (r.epochs == 3).all()
            assert (np.diff(r.distances) >= -1e-6).all()

    def test_i8_delta_and_main_merge(self, interp_pallas):
        """Post-build upserts land in the (flat-i8 XLA) delta and merge
        with main-region candidates; distances stay exact f32."""
        from vector_store_tpu.engine.ivf import IvfDeviceIndex

        n, d = 2048, 32
        vecs, _ = clustered(n, d)
        vecs = vecs / np.abs(vecs).max()  # I8 storage expects [-1, 1]
        idx = IvfDeviceIndex(
            d,
            space_type=SpaceType.EUCLIDEAN,
            quantization=Quantization.I8,
            initial_capacity=4096,
            min_build=1024,
            kmeans_block=1024,
            nprobe=16,
            kmeans_iters=4,
            interpret=True,
            query_i8=False,
        )
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        assert idx.maintain()
        idx._warm_queue.clear()
        new = (
            RNG.normal(size=(8, d)).astype(np.float32) * 0.02 + 0.9
        )  # distinct cluster, inside the i8 range
        idx.upsert_batch(np.arange(n, n + 8), np.full(8, 7, np.int32), new)
        res = idx.search(new, 3)
        for i, r in enumerate(res):
            assert r.slots[0] == n + i
            assert r.epochs[0] == 7
            # exact f32 recompute: self-distance reflects only i8 storage
            # rounding of the DELTA copy? no — distances come from the f32
            # host mirror, so the self-hit is exactly 0
            assert r.distances[0] == pytest.approx(0.0, abs=1e-5)

    def test_ivf_supports_i8(self):
        from vector_store_tpu.engine.ivf import ivf_supports

        assert ivf_supports(SpaceType.COSINE, Quantization.I8)
        assert ivf_supports(SpaceType.EUCLIDEAN, Quantization.I8)
        assert not ivf_supports(SpaceType.HAMMING, Quantization.I8)
        assert not ivf_supports(SpaceType.COSINE, Quantization.B1)

    def test_windowed_upload_matches_plain_search(self, interp_pallas):
        """upload_queries + split_query_windows + search_begin(queries_dev=
        slice) — the super-batched uplink (one h2d transfer for W dispatch
        windows) — must return exactly what per-batch search returns, incl.
        a delta region and a cosine variant with host-side normalization."""
        from vector_store_tpu.engine.flat import split_query_windows

        for space in (SpaceType.EUCLIDEAN, SpaceType.COSINE):
            n, d = 2048, 32
            vecs, _ = clustered(n, d, seed=5)
            idx = make_index(d=d, space=space)
            idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
            assert idx.maintain()
            # post-build upserts so the delta region participates too
            extra = clustered(16, d, seed=9)[0]
            idx.upsert_batch(
                np.arange(n, n + 16), np.ones(16, np.int32), extra
            )

            queries = clustered(48, d, seed=7)[0]
            plain = idx.search(queries, 5)

            qs_all = idx.upload_queries(queries)
            slices = split_query_windows(qs_all, 16)
            assert len(slices) == 3
            pends = [
                idx.search_begin(
                    queries[i * 16 : (i + 1) * 16], 5, queries_dev=s
                )
                for i, s in enumerate(slices)
            ]
            windowed = [r for rs in idx.collect_many(pends) for r in rs]
            assert len(windowed) == len(plain)
            for p, w in zip(plain, windowed):
                assert list(p.slots) == list(w.slots)
                assert list(p.epochs) == list(w.epochs)
                np.testing.assert_allclose(
                    p.distances, w.distances, rtol=1e-5, atol=1e-6
                )

    def test_windowed_upload_delegate_path(self, interp_pallas):
        """queries_dev must flow through the pre-build delegate (flat
        delta) path too."""
        from vector_store_tpu.engine.flat import split_query_windows

        n, d = 256, 32
        vecs, _ = clustered(n, d, seed=3)
        idx = make_index(d=d, min_build=100_000)  # never builds: delegate
        idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
        queries = clustered(32, d, seed=11)[0]
        plain = idx.search(queries, 4)
        qs_all = idx.upload_queries(queries)
        slices = split_query_windows(qs_all, 16)
        pends = [
            idx.search_begin(
                queries[i * 16 : (i + 1) * 16], 4, queries_dev=s
            )
            for i, s in enumerate(slices)
        ]
        windowed = [r for rs in idx.collect_many(pends) for r in rs]
        for p, w in zip(plain, windowed):
            assert list(p.slots) == list(w.slots)
            np.testing.assert_allclose(
                p.distances, w.distances, rtol=1e-5, atol=1e-6
            )

    def test_u24_id_packing_roundtrip(self):
        """The packed downlink (ids+1 as 3 little-endian uint8 planes) must
        round-trip every id value incl. the -1 empty sentinel and the
        dropped-count column."""
        import jax.numpy as jnp

        from vector_store_tpu.engine.ivf import _pack_ids_u24

        ids = np.array(
            [[-1, 0, 1, 255, 256, 65535, 65536, (1 << 24) - 2]],
            dtype=np.int32,
        )
        packed = np.asarray(_pack_ids_u24(jnp.asarray(ids)))
        assert packed.dtype == np.uint8 and packed.shape == (1, 8, 3)
        un = (
            packed[..., 0].astype(np.int32)
            | (packed[..., 1].astype(np.int32) << 8)
            | (packed[..., 2].astype(np.int32) << 16)
        ) - 1
        np.testing.assert_array_equal(un, ids)


class TestIvfSwapReentry:
    """Post-swap re-entry design (round 5): the exclusive swap slice ships
    zero vector bytes host->device — cluster-overflow spill re-enters the
    fresh delta by device gather from the build snapshot, and mid-build
    mutations re-enter via bounded concurrent chunks (_reenter_step)."""

    def _built_with_mass(self, mass_rows=300, d=32):
        n = 2048
        vecs, _ = clustered(n, d)
        idx = make_index(d)
        idx.upsert_batch(np.arange(n), np.ones(n, np.int32), vecs)
        # point mass > cmax so the first build itself spills
        mass = np.full((mass_rows, d), 55.0, np.float32)
        idx.upsert_batch(
            np.arange(n, n + mass_rows), np.full(mass_rows, 7, np.int32), mass
        )
        assert idx.maintain() is True
        idx._warm_queue.clear()
        return idx, vecs, mass, n

    def test_spill_reenters_device_side_and_serves(self, interp_pallas):
        idx, vecs, mass, n = self._built_with_mass()
        # overflow rows live in the delta (device re-entry), placed rows in main
        spilled = int((idx._region[: idx.capacity] == 2).sum())  # _DELTA
        assert spilled > 0, "point mass must overflow its cluster"
        assert idx.size == n + mass.shape[0]
        # every mass row is searchable at ~zero distance with its epoch
        res = idx.search(mass[:8], 10)
        for r in res:
            assert r.slots.size
            assert r.distances[0] == pytest.approx(0.0, abs=1e-2)
            assert (r.slots[0] >= n) and r.epochs[0] == 7
        # base rows still serve
        r = idx.search(vecs[:8], 3)
        assert r[0].slots[0] == 0

    def test_reenter_chunks_bounded_and_floor_recomputed(
        self, interp_pallas, monkeypatch
    ):
        idx, vecs, mass, n = self._built_with_mass()
        monkeypatch.setattr(type(idx), "REENTER_CHUNK", 64)
        # enough fresh churn to cross the rebuild growth trigger
        d = vecs.shape[1]
        churn, _ = clustered(1100, d, seed=21)
        idx.upsert_batch(
            np.arange(n + 400, n + 1500), np.full(1100, 2, np.int32), churn
        )
        # force a rebuild with many mid-build mutations
        assert idx.maintain(budget=1) is True  # start snapshot
        assert idx._build is not None
        nd = 300
        newv = np.full((nd, vecs.shape[1]), -33.0, np.float32)
        idx.upsert_batch(
            np.arange(100, 100 + nd), np.full(nd, 5, np.int32), newv
        )
        while idx._build is not None:
            assert idx.maintain(budget=1) is True
        # re-entry queued, trigger paused, chunks bounded
        assert idx.maintain_pending() == "reenter"
        assert idx._should_rebuild() is False
        slices = 0
        while idx.maintain_pending() == "reenter":
            assert idx.maintain(budget=1) is True
            slices += 1
        assert slices >= nd // 64  # bounded chunks, not one mega-upload
        # floor reflects spill + re-entered dirty rows (no instant re-trigger)
        delta_live = int(
            (idx._valid_host[: idx.capacity] & (idx._region == 2)).sum()
        )
        assert idx._rebuild_floor == delta_live
        # mutated rows serve current values
        r = idx.search(newv[:8], 3)[0]
        assert 100 <= r.slots[0] < 100 + nd and r.epochs[0] == 5
        assert r.distances[0] == pytest.approx(0.0, abs=1e-2)

    def test_mutations_during_reenter_lag_win(self, interp_pallas, monkeypatch):
        """A slot upserted (or removed) between the swap and its re-entry
        chunk must keep the NEWER outcome — the chunk skips it."""
        idx, vecs, mass, n = self._built_with_mass()
        monkeypatch.setattr(type(idx), "REENTER_CHUNK", 64)
        d = vecs.shape[1]
        churn, _ = clustered(1100, d, seed=22)
        idx.upsert_batch(
            np.arange(n + 400, n + 1500), np.full(1100, 2, np.int32), churn
        )
        assert idx.maintain(budget=1) is True
        nd = 200
        newv = np.full((nd, d), -33.0, np.float32)
        idx.upsert_batch(np.arange(0, nd), np.full(nd, 5, np.int32), newv)
        while idx._build is not None:
            assert idx.maintain(budget=1) is True
        assert idx.maintain_pending() == "reenter"
        # during the lag window: slot 3 gets a newer value, slot 4 is removed
        newest = np.full((1, d), 99.0, np.float32)
        idx.upsert_batch(np.asarray([3]), np.asarray([9]), newest)
        idx.remove_batch(np.asarray([4]))
        while idx.maintain_pending() == "reenter":
            assert idx.maintain(budget=1) is True
        r = idx.search(newest.repeat(8, axis=0), 3)[0]
        assert r.slots[0] == 3 and r.epochs[0] == 9
        res = idx.search(vecs[4:5].repeat(8, axis=0), 10)
        assert not any(4 in rr.slots for rr in res)

    def test_pad_ladder_stable_shapes(self):
        from vector_store_tpu.engine.ivf import _pad_ladder

        b = 16384
        assert _pad_ladder(1, b) == b
        assert _pad_ladder(b, b) == b
        assert _pad_ladder(b + 1, b) == b + b // 2
        assert _pad_ladder(1_000_000, b) == 1_048_576
        # everything within one ladder step maps to the same shape
        assert _pad_ladder(900_000, b) == _pad_ladder(1_000_000, b)
        # monotone and bounded overhead (< 1.5x)
        for n in (10_000, 50_000, 123_456, 777_777, 2_000_000):
            m = _pad_ladder(n, b)
            assert m >= n and m < 1.5 * n + b

    def test_post_swap_delta_capacity_stable(self, interp_pallas):
        """Rebuild #2+ sizes the fresh delta from the previous cycle's
        high-water mark so repeated swaps reuse compiled scan shapes."""
        idx, vecs, mass, n = self._built_with_mass()
        cap1 = idx._delta.capacity
        d = vecs.shape[1]
        # a churn cycle, then rebuild again
        churn = np.random.default_rng(3).normal(size=(1200, d)).astype(np.float32)
        idx.upsert_batch(
            np.arange(n + 400, n + 1600), np.full(1200, 2, np.int32), churn
        )
        high = idx._delta_next
        assert idx.maintain() is True
        idx._warm_queue.clear()
        cap2 = idx._delta.capacity
        assert cap2 >= min(high, cap1) or cap2 == cap1
        # a second identical cycle lands on the SAME capacity (shape reuse)
        idx.upsert_batch(
            np.arange(n + 400, n + 1600), np.full(1200, 3, np.int32), churn
        )
        assert idx.maintain() is True
        idx._warm_queue.clear()
        assert idx._delta.capacity == cap2
