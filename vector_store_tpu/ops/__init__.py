"""Device compute ops: batched distances, top-k selection, quantization.

These are the TPU-native replacement for USearch's C++ SIMD distance kernels
(reference vs_index/usearch.rs + the usearch crate): distances are computed as
blocked MXU matmuls over the whole candidate set at once, Hamming as VPU
XOR+popcount, and selection as (approximate or exact) top-k.
"""

from vector_store_tpu.ops.distance import (
    effective_space,
    pairwise_distance,
    prepare_queries,
    query_dtype_for,
    storage_dtype_for,
    vector_aux,
)
from vector_store_tpu.ops.quantize import (
    pack_b1,
    padded_dim,
    quantize_for_storage,
    unpack_b1,
    vector_norms,
)
from vector_store_tpu.ops.topk import merge_min_k, min_k

__all__ = [
    "effective_space",
    "pairwise_distance",
    "prepare_queries",
    "query_dtype_for",
    "storage_dtype_for",
    "vector_aux",
    "pack_b1",
    "padded_dim",
    "quantize_for_storage",
    "unpack_b1",
    "vector_norms",
    "merge_min_k",
    "min_k",
]
