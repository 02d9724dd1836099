"""Device-resident ANN index engines.

The TPU-native replacement for the reference's pluggable engines
(vs_index/usearch.rs C++ HNSW, vs_index/diskann.rs): vectors, per-slot
metadata, and graph adjacency live in TPU HBM; searches execute as batched
lockstep kernels over the whole query batch.

Engines:
- FlatDeviceIndex: exact blocked matmul + top-k. Correctness oracle, the
  serving engine for small/medium indexes, and the delta-buffer search of the
  graph engine.
- GraphDeviceIndex: fixed-degree navigable graph (CAGRA-style) with batched
  lockstep beam search; sub-linear per query at large N.
"""

from vector_store_tpu.engine.flat import FlatDeviceIndex, SearchResult
from vector_store_tpu.engine.graph import GraphDeviceIndex

__all__ = ["FlatDeviceIndex", "GraphDeviceIndex", "SearchResult"]
