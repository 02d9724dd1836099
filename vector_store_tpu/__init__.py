"""vector-store-tpu: a TPU-native rebuild of ScyllaDB Vector Store.

A standalone service that sits next to a ScyllaDB cluster and provides ANN
vector search (and BM25 full-text search) over data stored in ScyllaDB tables.
The ANN engine is device-resident: vectors and graph adjacency live in TPU HBM
and queries execute as batched JAX/Pallas kernels.

Reference behavior: scylladb/vector-store (Rust), see SURVEY.md.
"""

__version__ = "0.1.0"

SERVICE_NAME = "scylla-vector-store"
# Mirrors the reference's OpenAPI version (httproutes.rs:102).
API_VERSION = "3.0.0"
