"""Pallas fused scan kernel vs NumPy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vector_store_tpu.core.types import Quantization, SpaceType  # noqa: E402
from vector_store_tpu.engine.flat import unpack_results  # noqa: E402
from vector_store_tpu.ops.pallas_scan import pallas_flat_search, supports  # noqa: E402

RNG = np.random.default_rng(55)


def run_search(vecs, queries, space, k=10, valid=None, allow=None):
    n, d = vecs.shape
    aux = np.linalg.norm(vecs, axis=1).astype(np.float32)
    q_aux = np.linalg.norm(queries, axis=1).astype(np.float32)
    if valid is None:
        valid = np.ones(n, dtype=bool)
    if allow is None:
        allow = np.ones(n, dtype=bool)
    packed = pallas_flat_search(
        jnp.asarray(vecs),
        jnp.asarray(aux),
        jnp.asarray(valid),
        jnp.asarray(allow),
        jnp.zeros(n, dtype=jnp.int32),
        jnp.asarray(queries),
        jnp.asarray(q_aux),
        space=space,
        k=k,
        block_rows=256,
        interpret=True,
    )
    return unpack_results(np.asarray(packed))


class TestPallasScan:
    def test_euclidean_matches_oracle(self):
        # candidate set must be >> k for the sub-column reduction to be
        # near-exact (real indexes are 1M+; this is the smallest faithful
        # proportion interpret mode can afford)
        n, d, b, k = 16384, 64, 8, 5
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        queries = RNG.normal(size=(b, d)).astype(np.float32)
        dist, ids, _ = run_search(vecs, queries, SpaceType.EUCLIDEAN, k)
        exact = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
        total = 0
        for row in range(b):
            want = set(np.argsort(exact[row])[:k].tolist())
            got = set(ids[row].tolist())
            total += len(want & got)
        assert total >= b * k - 3, total  # a few sub-column collisions allowed

    def test_cosine(self):
        # the kernel contract: cosine vectors and queries arrive normalized
        # (the engine normalizes at ingest/query time)
        n, d, b, k = 8192, 64, 8, 5
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        queries = RNG.normal(size=(b, d)).astype(np.float32)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        dist, ids, _ = run_search(vn, qn, SpaceType.COSINE, k)
        qs = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        vs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        exact = 1 - qs @ vs.T
        total = 0
        for row in range(b):
            want = set(np.argsort(exact[row])[:k].tolist())
            total += len(want & set(ids[row].tolist()))
        assert total >= b * k - 3, total

    def test_validity_mask(self):
        n, d = 512, 32
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        target = vecs[5][None]
        valid = np.ones(n, dtype=bool)
        valid[5] = False
        dist, ids, _ = run_search(vecs, target, SpaceType.EUCLIDEAN, 3, valid=valid)
        assert 5 not in ids[0]

    def test_allow_mask(self):
        # under selective filters the sub-column reduction yields fewer
        # candidates (the engine routes filtered searches to the exact
        # path); the kernel must still never return disallowed ids
        n, d = 512, 32
        vecs = RNG.normal(size=(n, d)).astype(np.float32)
        allow = np.zeros(n, dtype=bool)
        allow[100:200] = True
        _, ids, _ = run_search(vecs, vecs[:2], SpaceType.EUCLIDEAN, 5, allow=allow)
        live = ids[ids >= 0]
        assert live.size > 0
        assert np.all((live >= 100) & (live < 200))

    def test_supports(self):
        assert supports(SpaceType.EUCLIDEAN, Quantization.BF16)
        assert not supports(SpaceType.HAMMING, Quantization.BF16)
        assert not supports(SpaceType.EUCLIDEAN, Quantization.I8)
