"""Smoke test for the in-process pipeline benchmark (benchkit/pipeline.py,
reference counterpart crates/vector-store/benches/pipeline.rs): tiny run
through ingest -> query -> mixed phases, asserting the artifact shape and
zero query errors."""

import os
from unittest import mock

from vector_store_tpu.benchkit.pipeline import run


async def test_pipeline_bench_smoke():
    env = {
        "PIPELINE_N": "60",
        "PIPELINE_D": "8",
        "PIPELINE_SECONDS": "0.5",
        "BENCHES_CONCURRENCY": "4",
        "PIPELINE_UPSERT_RATE": "200",
    }
    with mock.patch.dict(os.environ, env):
        out = await run()
    assert out["n"] == 60 and out["d"] == 8
    assert out["ingest_rows_per_sec"] > 0
    for phase in ("query", "mixed"):
        assert out[phase]["qps"] > 0
        assert out[phase]["errors"] == 0
        assert out[phase]["p50_ms"] <= out[phase]["p99_ms"]
    assert out["mixed"]["upserts_per_sec"] > 0
