"""Device-resident ANN index engines.

The TPU-native replacement for the reference's pluggable engines
(vs_index/usearch.rs C++ HNSW, vs_index/diskann.rs): vectors, per-slot
metadata, and cluster/graph structure live in TPU HBM; searches execute as
batched lockstep kernels over the whole query batch.

Engines:
- FlatDeviceIndex: exact blocked matmul + top-k (fused Pallas rank scan on
  TPU). Correctness oracle, the serving engine for small indexes and local
  (per-partition) indexes, and the delta-buffer search of the other two.
- IvfDeviceIndex: k-means-clustered main region + exact delta, searched by
  a grouped fused scan over nprobe clusters per query — the sub-linear
  serving engine for global float indexes (ScaNN-style partitioning
  instead of HNSW pointer chasing).
- GraphDeviceIndex: fixed-degree navigable graph (CAGRA-style) with batched
  lockstep beam search; the opt-in beyond-HBM/sharded path.
"""

from vector_store_tpu.engine.flat import FlatDeviceIndex, SearchResult
from vector_store_tpu.engine.graph import GraphDeviceIndex
from vector_store_tpu.engine.ivf import IvfDeviceIndex

__all__ = [
    "FlatDeviceIndex",
    "GraphDeviceIndex",
    "IvfDeviceIndex",
    "SearchResult",
]
