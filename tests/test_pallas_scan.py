"""Pallas fused scan kernel vs NumPy oracle (interpret mode on CPU).

The kernel contract (ops/pallas_scan.py): rank values are the affine form
a*dot+b streamed via the paux side array; ids are reconstructed from fold
offsets; invalid rows carry an INVALID_BIAS bias and can never win.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vector_store_tpu.core.types import SpaceType  # noqa: E402
from vector_store_tpu.ops.pallas_scan import (  # noqa: E402
    INVALID_BIAS,
    INVALID_CUTOFF,
    apply_allow_to_paux,
    pallas_rank_search,
    paux_coeffs,
    rank_to_distance,
    supports,
)

RNG = np.random.default_rng(55)


def make_paux(space, vecs, valid=None):
    n = vecs.shape[0]
    a, b = paux_coeffs(space, vecs.astype(np.float32))
    if valid is not None:
        b = np.where(valid, b, INVALID_BIAS).astype(np.float32)
    paux = np.zeros((8, n), np.float32)
    paux[0] = a
    paux[1] = b
    return jnp.asarray(paux)


def run_search(vecs, queries, space, k=10, valid=None, allow=None, block_rows=256):
    paux = make_paux(space, vecs, valid)
    if allow is not None:
        paux = apply_allow_to_paux(paux, jnp.asarray(allow))
    packed = np.asarray(
        pallas_rank_search(
            jnp.asarray(vecs),
            paux,
            jnp.asarray(queries),
            k=k,
            block_rows=block_rows,
            interpret=True,
        )
    )
    rank = packed[0]
    ids = packed[1].view(np.int32)
    q2 = (queries.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    dist = rank_to_distance(space, rank, q2)
    dist[rank >= INVALID_CUTOFF] = np.inf
    return dist, ids


class TestPallasScan:
    def test_euclidean_matches_oracle(self):
        # candidate set must be >> k for the group-min reduction to be
        # near-exact (real indexes are 1M+; this is the smallest faithful
        # proportion interpret mode can afford)
        n, d, b, k = 16384, 64, 8, 5
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        queries = RNG.normal(size=(b, d)).astype(np.float32)
        dist, ids = run_search(vecs, queries, SpaceType.EUCLIDEAN, k)
        exact = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
        total = 0
        for row in range(b):
            want = set(np.argsort(exact[row])[:k].tolist())
            got = set(ids[row].tolist())
            total += len(want & got)
        assert total >= b * k - 3, total  # a few group collisions allowed
        # distances of true hits must match the exact metric
        for row in range(b):
            for j in range(k):
                if ids[row, j] >= 0:
                    assert dist[row, j] == pytest.approx(
                        exact[row, ids[row, j]], rel=1e-3, abs=1e-2
                    )

    def test_cosine(self):
        # contract: cosine vectors and queries arrive unit-normalized
        n, d, b, k = 8192, 64, 8, 5
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        queries = RNG.normal(size=(b, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        dist, ids = run_search(vecs, queries, SpaceType.COSINE, k)
        exact = 1.0 - queries @ vecs.T
        total = 0
        for row in range(b):
            want = set(np.argsort(exact[row])[:k].tolist())
            total += len(want & set(ids[row].tolist()))
        assert total >= b * k - 3, total

    def test_invalid_rows_never_win(self):
        n, d, b, k = 4096, 32, 8, 8
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        queries = vecs[:b].copy()  # self-queries
        valid = np.ones(n, dtype=bool)
        valid[:b] = False  # tombstone the exact matches
        dist, ids = run_search(vecs, queries, SpaceType.EUCLIDEAN, k, valid=valid)
        live = ids[ids >= 0]
        assert not np.isin(live, np.arange(b)).any()

    def test_allow_mask_filters(self):
        n, d, b, k = 4096, 32, 8, 8
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        queries = RNG.normal(size=(b, d)).astype(np.float32)
        allow = np.zeros(n, dtype=bool)
        allow[: n // 8] = True
        dist, ids = run_search(vecs, queries, SpaceType.EUCLIDEAN, k, allow=allow)
        live = ids[ids >= 0]
        assert live.size and (live < n // 8).all()

    def test_supports_matrix(self):
        from vector_store_tpu.core.types import Quantization

        assert supports(SpaceType.EUCLIDEAN, Quantization.BF16)
        assert supports(SpaceType.COSINE, Quantization.F32)
        assert not supports(SpaceType.EUCLIDEAN, Quantization.I8)
        assert not supports(SpaceType.HAMMING, Quantization.B1)


class TestEnginePallasPath:
    """Exercise FlatDeviceIndex's pallas postprocess path by forcing
    use_pallas and interpret mode via the kernel seam."""

    def test_engine_pallas_postprocess(self, monkeypatch):
        import vector_store_tpu.ops.pallas_scan as ps
        from vector_store_tpu.core.types import Quantization
        from vector_store_tpu.engine.flat import FlatDeviceIndex

        orig = ps.pallas_rank_search

        def interp(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)

        monkeypatch.setattr(ps, "pallas_rank_search", interp)
        idx = FlatDeviceIndex(
            16,
            space_type=SpaceType.EUCLIDEAN,
            quantization=Quantization.F32,
            use_pallas=True,
            block_rows=256,
        )
        idx.pallas_block = 256
        n = 512
        vecs = RNG.normal(size=(n, 16)).astype(np.float32)
        idx.upsert_batch(np.arange(n), np.full(n, 7, np.int32), vecs)
        res = idx.search(vecs[:8], 3)
        assert len(res) == 8
        for i, r in enumerate(res):
            assert r.slots[0] == i
            assert r.distances[0] == pytest.approx(0.0, abs=1e-3)
            assert (r.epochs == 7).all()
        # removal must drop the self-hit
        idx.remove_batch(np.asarray([0]))
        res = idx.search(vecs[:1][np.newaxis, 0], 3)
        # single query goes through XLA path (b<8); force a batch instead
        res = idx.search(vecs[:8], 3)
        assert res[0].slots[0] != 0

    def test_ids_only_pull_matches_rank_pull(self, monkeypatch):
        """host_distances=True ships [B,k] int32 ids only; results must
        match the full rank-pull path (ids, epochs, exact f32 distances)."""
        import vector_store_tpu.ops.pallas_scan as ps
        from vector_store_tpu.core.types import Quantization
        from vector_store_tpu.engine.flat import FlatDeviceIndex

        orig = ps.pallas_rank_search

        def interp(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)

        monkeypatch.setattr(ps, "pallas_rank_search", interp)
        n, d, b, k = 512, 16, 8, 5
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        queries = RNG.normal(size=(b, d)).astype(np.float32)

        results = {}
        for host_dist in (False, True):
            idx = FlatDeviceIndex(
                d,
                space_type=SpaceType.COSINE,
                quantization=Quantization.F32,
                use_pallas=True,
                block_rows=256,
                host_distances=host_dist,
            )
            idx.pallas_block = 256
            idx.upsert_batch(np.arange(n), np.full(n, 3, np.int32), vecs)
            pend = idx.search_begin(queries, k)
            assert (pend.kind == "ids") == host_dist
            if host_dist:
                assert pend.packed.dtype == jnp.int32
                assert pend.packed.shape[-1] == k
            results[host_dist] = idx.search_collect(pend)

        for ra, rb in zip(results[False], results[True]):
            assert set(ra.slots.tolist()) == set(rb.slots.tolist())
            assert (rb.epochs == 3).all()
            # ids path recomputes exact f32 cosine distances host-side
            np.testing.assert_allclose(
                np.sort(ra.distances), np.sort(rb.distances), atol=2e-3
            )
            assert (np.diff(rb.distances) >= 0).all()

    def test_query_i8_shipping(self, monkeypatch):
        """i8-shipped queries must rank (almost) identically to bf16 ones;
        the device array reaching the kernel is storage dtype."""
        import vector_store_tpu.ops.pallas_scan as ps
        from vector_store_tpu.core.types import Quantization
        from vector_store_tpu.engine.flat import FlatDeviceIndex

        orig = ps.pallas_rank_search

        def interp(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)

        monkeypatch.setattr(ps, "pallas_rank_search", interp)
        n, d, b, k = 1024, 32, 16, 10
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        queries = vecs[:b] + 0.05 * RNG.normal(size=(b, d)).astype(np.float32)

        got = {}
        for qi8 in (False, True):
            idx = FlatDeviceIndex(
                d,
                space_type=SpaceType.EUCLIDEAN,
                quantization=Quantization.F32,
                use_pallas=True,
                block_rows=256,
                host_distances=True,
                query_i8=qi8,
            )
            idx.pallas_block = 256
            assert idx.query_i8 == qi8
            idx.upsert_batch(np.arange(n), np.zeros(n, np.int32), vecs)
            got[qi8] = idx.search(queries, k)
        agree = 0
        for ra, rb in zip(got[False], got[True]):
            assert rb.slots[0] == ra.slots[0]  # nearest survives quantization
            agree += len(set(ra.slots.tolist()) & set(rb.slots.tolist()))
        assert agree >= b * k * 0.9, agree
