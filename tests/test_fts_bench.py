"""Smoke test for the BM25 throughput bench (benchkit/fts_bench.py):
tiny corpus through both implementations, asserting artifact shape and
native/python agreement on hit counts (same corpus, same scoring)."""

import os
from unittest import mock

from vector_store_tpu.benchkit.fts_bench import run


def test_fts_bench_smoke():
    env = {"FTS_DOCS": "400", "FTS_VOCAB": "500", "FTS_QUERIES": "60"}
    with mock.patch.dict(os.environ, env):
        out = run()
    assert out["docs"] == 400
    assert out["python"]["index_docs_per_sec"] > 0
    assert out["python"]["search_qps"] > 0
    assert out["python"]["churn_ops_per_sec"] > 0
    if "native" in out:
        # identical corpus + scoring rules -> identical result cardinality,
        # and churn (delete + re-add) must restore identical size accounting
        assert out["native"]["avg_hits"] == out["python"]["avg_hits"]
        assert out["native"]["size_bytes"] == out["python"]["size_bytes"]
