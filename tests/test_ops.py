"""Distance/top-k op tests against NumPy references."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vector_store_tpu.core.types import Quantization, SpaceType  # noqa: E402
from vector_store_tpu.ops import (  # noqa: E402
    merge_min_k,
    min_k,
    pack_b1,
    padded_dim,
    pairwise_distance,
    prepare_queries,
    quantize_for_storage,
    unpack_b1,
    vector_aux,
)

RNG = np.random.default_rng(42)


def np_distances(q, v, space):
    if space is SpaceType.EUCLIDEAN:
        return ((q[:, None, :] - v[None, :, :]) ** 2).sum(-1)
    dot = q @ v.T
    if space is SpaceType.DOT_PRODUCT:
        return 1.0 - dot
    qn = np.linalg.norm(q, axis=-1, keepdims=True)
    vn = np.linalg.norm(v, axis=-1, keepdims=True)
    return 1.0 - dot / np.maximum(qn * vn.T, 1e-30)


def _prep_block(v, space, quant):
    vs = quantize_for_storage(v, quant)
    dp = padded_dim(v.shape[-1], quant)
    pad = dp - vs.shape[-1]
    if pad:
        vs = np.pad(vs, [(0, 0), (0, pad)])
    aux = vector_aux(vs, space, quant)
    return vs, aux


class TestQuantize:
    def test_b1_roundtrip(self):
        x = RNG.normal(size=(5, 37)).astype(np.float32)
        packed = pack_b1(x)
        assert packed.shape == (5, 5)
        bits = unpack_b1(packed, 37)
        np.testing.assert_array_equal(bits, (x > 0).astype(np.float32))

    def test_i8_range(self):
        x = np.array([[-2.0, -1.0, 0.0, 0.5, 1.0, 2.0]], dtype=np.float32)
        q = quantize_for_storage(x, Quantization.I8)
        np.testing.assert_array_equal(q, [[-127, -127, 0, 64, 127, 127]])


@pytest.mark.parametrize("space", [SpaceType.EUCLIDEAN, SpaceType.COSINE, SpaceType.DOT_PRODUCT])
@pytest.mark.parametrize("quant", [Quantization.F32, Quantization.BF16, Quantization.F16])
class TestFloatDistances:
    def test_matches_numpy(self, space, quant):
        d = 48
        q = RNG.normal(size=(4, d)).astype(np.float32)
        v = RNG.normal(size=(64, d)).astype(np.float32)
        qs, q_aux = prepare_queries(q, space, quant)
        vs, v_aux = _prep_block(v, space, quant)
        got = np.asarray(
            pairwise_distance(
                jnp.asarray(qs), jnp.asarray(vs), space, quant, jnp.asarray(q_aux), jnp.asarray(v_aux)
            )
        )
        want = np_distances(q, v, space)
        tol = 5e-5 if quant is Quantization.F32 else 5e-2
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol * 10)


class TestIntDistances:
    def test_i8_cosine(self):
        d = 32
        q = RNG.normal(size=(3, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        v = RNG.normal(size=(16, d)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        qs, q_aux = prepare_queries(q, SpaceType.COSINE, Quantization.I8)
        vs, v_aux = _prep_block(v, SpaceType.COSINE, Quantization.I8)
        got = np.asarray(
            pairwise_distance(
                jnp.asarray(qs), jnp.asarray(vs), SpaceType.COSINE, Quantization.I8,
                jnp.asarray(q_aux), jnp.asarray(v_aux),
            )
        )
        want = np_distances(q, v, SpaceType.COSINE)
        np.testing.assert_allclose(got, want, atol=0.02)

    def test_i8_euclidean(self):
        d = 16
        q = RNG.uniform(-1, 1, size=(2, d)).astype(np.float32)
        v = RNG.uniform(-1, 1, size=(8, d)).astype(np.float32)
        qs, q_aux = prepare_queries(q, SpaceType.EUCLIDEAN, Quantization.I8)
        vs, v_aux = _prep_block(v, SpaceType.EUCLIDEAN, Quantization.I8)
        got = np.asarray(
            pairwise_distance(
                jnp.asarray(qs), jnp.asarray(vs), SpaceType.EUCLIDEAN, Quantization.I8,
                jnp.asarray(q_aux), jnp.asarray(v_aux),
            )
        )
        want = np_distances(q, v, SpaceType.EUCLIDEAN)
        np.testing.assert_allclose(got, want, atol=0.05)

    def test_b1_hamming_exact(self):
        d = 40
        q = RNG.normal(size=(3, d)).astype(np.float32)
        v = RNG.normal(size=(17, d)).astype(np.float32)
        qs, q_aux = prepare_queries(q, SpaceType.COSINE, Quantization.B1)  # B1 forces hamming
        vs, v_aux = _prep_block(v, SpaceType.COSINE, Quantization.B1)
        got = np.asarray(
            pairwise_distance(
                jnp.asarray(qs), jnp.asarray(vs), SpaceType.COSINE, Quantization.B1,
                jnp.asarray(q_aux), jnp.asarray(v_aux),
            )
        )
        qb = (q > 0).astype(np.int32)
        vb = (v > 0).astype(np.int32)
        want = (qb[:, None, :] != vb[None, :, :]).sum(-1)
        np.testing.assert_array_equal(got.astype(np.int64), want)


class TestTopK:
    def test_min_k_exact(self):
        d = jnp.asarray(RNG.normal(size=(2, 100)).astype(np.float32))
        ids = jnp.broadcast_to(jnp.arange(100, dtype=jnp.int32), (2, 100))
        vals, got_ids = min_k(d, ids, 5)
        want = np.sort(np.asarray(d), axis=-1)[:, :5]
        np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(got_ids), np.argsort(np.asarray(d), axis=-1)[:, :5]
        )

    def test_merge_matches_global(self):
        d = RNG.normal(size=(3, 60)).astype(np.float32)
        ids = np.broadcast_to(np.arange(60, dtype=np.int32), (3, 60))
        best_d, best_i = min_k(jnp.asarray(d[:, :30]), jnp.asarray(ids[:, :30]), 4)
        got_d, got_i = merge_min_k(best_d, best_i, jnp.asarray(d[:, 30:]), jnp.asarray(ids[:, 30:]))
        want = np.sort(d, axis=-1)[:, :4]
        np.testing.assert_allclose(np.asarray(got_d), want, rtol=1e-6)
