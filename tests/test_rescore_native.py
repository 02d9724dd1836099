"""The fused gather+rescore C kernel's distance identities (VERDICT r3
weak #7): the serving path's recall at high dimension rests on this
kernel's cosine form 0.5*||q-v||^2, which equals 1-dot on unit rows in
real arithmetic and makes self-matches STRUCTURALLY 0.0. These tests pin
that contract against numpy for all three metrics, plus the clamp, the
negative/out-of-range id handling, and the self-match exactness.

Caller contract: engine/flat.py::ids_postprocess; kernel:
native/rescore_native.cpp.
"""

import numpy as np
import pytest

from vector_store_tpu.core.types import SpaceType
from vector_store_tpu.engine.rescore import native_rescore

RNG = np.random.default_rng(4242)


def make_mirror(cap=200, d=77):
    """Odd d exercises the 8-lane tail loop."""
    v = RNG.normal(size=(cap, d)).astype(np.float32)
    return np.ascontiguousarray(v)


def unit_rows(v):
    return np.ascontiguousarray(
        v / np.linalg.norm(v, axis=1, keepdims=True)
    ).astype(np.float32)


@pytest.fixture(scope="module")
def available():
    v = make_mirror(4, 8)
    ids = np.zeros((1, 1), np.int32)
    q = v[:1].copy()
    if native_rescore(v, ids, q, SpaceType.EUCLIDEAN) is None:
        pytest.skip("native rescore kernel unavailable on this host")
    return True


class TestMetricIdentities:
    def test_euclidean_matches_numpy(self, available):
        vecs = make_mirror()
        q = RNG.normal(size=(5, vecs.shape[1])).astype(np.float32)
        ids = RNG.integers(0, vecs.shape[0], size=(5, 13)).astype(np.int32)
        got = native_rescore(vecs, ids, q, SpaceType.EUCLIDEAN)
        want = ((q[:, None, :] - vecs[ids]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_cosine_identity_half_l2sq_equals_one_minus_dot(self, available):
        """On unit-norm rows and queries: 0.5*||q-v||^2 == 1 - q.v."""
        vecs = unit_rows(make_mirror())
        q = unit_rows(RNG.normal(size=(5, vecs.shape[1])).astype(np.float32))
        ids = RNG.integers(0, vecs.shape[0], size=(5, 13)).astype(np.int32)
        got = native_rescore(vecs, ids, q, SpaceType.COSINE)
        want = 1.0 - np.einsum("bd,bkd->bk", q, vecs[ids])
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)

    def test_cosine_self_match_structurally_zero(self, available):
        """Self-match must be EXACTLY 0.0 (squared-difference form), not
        1-dot's ~1 ulp residue — the service's live exactness check."""
        vecs = unit_rows(make_mirror())
        ids = np.arange(vecs.shape[0], dtype=np.int32)[:, None]
        got = native_rescore(vecs, ids, vecs.copy(), SpaceType.COSINE)
        assert (got == 0.0).all()

    def test_cosine_clamped_at_two(self, available):
        # antipodal unit vectors: 0.5*||q-v||^2 = 2.0 exactly; scaled-up
        # rows (non-unit, as after a stale mirror bug) must still clamp
        v = np.zeros((2, 8), np.float32)
        v[0, 0] = 5.0
        q = np.zeros((1, 8), np.float32)
        q[0, 0] = -5.0
        got = native_rescore(
            np.ascontiguousarray(v), np.zeros((1, 1), np.int32), q,
            SpaceType.COSINE,
        )
        assert got[0, 0] == 2.0

    def test_dot_product_matches_numpy(self, available):
        vecs = make_mirror()
        q = RNG.normal(size=(3, vecs.shape[1])).astype(np.float32)
        ids = RNG.integers(0, vecs.shape[0], size=(3, 9)).astype(np.int32)
        got = native_rescore(vecs, ids, q, SpaceType.DOT_PRODUCT)
        want = 1.0 - np.einsum("bd,bkd->bk", q, vecs[ids])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestIdHandling:
    def test_negative_and_oob_ids_return_finite_junk(self, available):
        """Negative ids clamp to row 0, oversized to cap-1 — the caller
        masks them to +inf; the kernel must only never fault."""
        vecs = make_mirror(16, 24)
        q = RNG.normal(size=(1, 24)).astype(np.float32)
        ids = np.asarray([[-1, 0, 15, 16, 10**7]], dtype=np.int32)
        got = native_rescore(vecs, ids, q, SpaceType.EUCLIDEAN)
        assert np.isfinite(got).all()
        # clamped ids equal their clamp target's distance
        assert got[0, 0] == got[0, 1]
        assert got[0, 3] == got[0, 2] and got[0, 4] == got[0, 2]

    def test_determinism(self, available):
        vecs = make_mirror()
        q = RNG.normal(size=(4, vecs.shape[1])).astype(np.float32)
        ids = RNG.integers(0, vecs.shape[0], size=(4, 21)).astype(np.int32)
        a = native_rescore(vecs, ids, q, SpaceType.COSINE)
        b = native_rescore(vecs, ids, q, SpaceType.COSINE)
        assert (a == b).all()
