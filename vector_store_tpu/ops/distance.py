"""Batched pairwise distances on the MXU.

TPU-native replacement for USearch's per-pair SIMD distance kernels: a block
of stored vectors is compared against a whole query batch with one matmul
(MXU), with the space-specific distance derived from dot products and
precomputed per-vector auxiliaries:

- EUCLIDEAN: squared L2 (USearch's L2sq convention, usearch.rs:450-501):
  d = |q|^2 + |v|^2 - 2 q.v
- COSINE: d = 1 - q.v / (|q| |v|), range [0, 2]
- DOT_PRODUCT: d = 1 - q.v (USearch IP metric)
- HAMMING (and any B1 index, which forces Hamming): bits are stored packed
  8-per-byte; distance = popcnt(q) + popcnt(v) - 2 * dot(q_bits, v_bits),
  computed by unpacking to {0,1} and using the MXU rather than VPU popcount
  so the hot loop stays on the systolic array.

The per-vector auxiliary ("aux") is: |v| for COSINE, popcnt(v) for
HAMMING/B1, unused otherwise. It is produced at ingest time by
`vector_aux` and lives in a device array next to the vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.ops.quantize import I8_SCALE, storage_dtype, unpack_b1

_EPS = 1e-30


def storage_dtype_for(quantization: Quantization):
    return storage_dtype(quantization)


def query_dtype_for(quantization: Quantization):
    """Dtype queries are converted to before hitting the device: matches
    storage so the MXU runs at the storage precision."""
    q = quantization
    if q is Quantization.I8:
        return jnp.int8
    if q is Quantization.B1:
        return jnp.uint8
    if q is Quantization.F32:
        return jnp.float32
    return storage_dtype(q)


def effective_space(space_type: SpaceType, quantization: Quantization) -> SpaceType:
    """B1 indexes always use Hamming (usearch.rs: B1 => Hamming forced)."""
    if quantization is Quantization.B1:
        return SpaceType.HAMMING
    return space_type


def vector_aux(
    x: np.ndarray, space_type: SpaceType, quantization: Quantization
) -> np.ndarray:
    """Per-vector auxiliary for the storage representation ``x``
    (host-side, at ingest): |v| for cosine, popcount for hamming, zeros
    otherwise. ``x`` is the already-quantized storage array [..., Dp]."""
    space = effective_space(space_type, quantization)
    if space is SpaceType.HAMMING:
        # popcount of packed bytes
        return np.unpackbits(x.view(np.uint8), axis=-1).sum(axis=-1).astype(np.float32)
    if space is SpaceType.COSINE:
        if quantization is Quantization.I8:
            v = x.astype(np.float64) / I8_SCALE
        else:
            v = x.astype(np.float64)
        return np.sqrt((v * v).sum(axis=-1)).astype(np.float32)
    return np.zeros(x.shape[:-1], dtype=np.float32)


def _unpack_bits_device(packed: jax.Array) -> jax.Array:
    """uint8 [..., Db] -> bfloat16 {0,1} [..., Db*8], MSB-first (matches
    np.packbits)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8).astype(jnp.bfloat16)


def pairwise_distance(
    queries: jax.Array,  # [B, Dp] in query dtype (packed for B1)
    block: jax.Array,  # [Nb, Dp] storage dtype
    space_type: SpaceType,
    quantization: Quantization,
    q_aux: jax.Array,  # [B] f32 (norm / popcount, per space)
    v_aux: jax.Array,  # [Nb] f32
) -> jax.Array:
    """Distances [B, Nb] float32."""
    space = effective_space(space_type, quantization)

    if space is SpaceType.HAMMING:
        qb = _unpack_bits_device(queries)
        vb = _unpack_bits_device(block)
        dot = jnp.dot(qb, vb.T, preferred_element_type=jnp.float32)
        return q_aux[:, None] + v_aux[None, :] - 2.0 * dot

    if quantization is Quantization.I8:
        doti = jnp.dot(
            queries.astype(jnp.int32),
            block.T.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        )
        dot = doti.astype(jnp.float32) / (I8_SCALE * I8_SCALE)
    else:
        # F32 storage means exact storage: keep full f32 matmul precision
        # (default TPU precision uses fast bf16 passes, fine for bf16/f16).
        precision = (
            jax.lax.Precision.HIGHEST
            if quantization is Quantization.F32
            else jax.lax.Precision.DEFAULT
        )
        dot = jnp.dot(
            queries, block.T, preferred_element_type=jnp.float32, precision=precision
        )

    if space is SpaceType.DOT_PRODUCT:
        return 1.0 - dot
    if space is SpaceType.COSINE:
        denom = jnp.maximum(q_aux[:, None] * v_aux[None, :], _EPS)
        return 1.0 - dot / denom
    # EUCLIDEAN (squared): |q|^2 + |v|^2 - 2 q.v, with squared norms derived
    # from aux when cosine-style aux is absent. For euclidean we recompute
    # |v|^2 from the block itself so no aux is needed.
    if quantization is Quantization.I8:
        qf = queries.astype(jnp.float32) / I8_SCALE
        vf = block.astype(jnp.float32) / I8_SCALE
    else:
        qf = queries.astype(jnp.float32)
        vf = block.astype(jnp.float32)
    q2 = jnp.sum(qf * qf, axis=-1)
    v2 = jnp.sum(vf * vf, axis=-1)
    d = q2[:, None] + v2[None, :] - 2.0 * dot
    return jnp.maximum(d, 0.0)


def query_block_distance(
    queries: jax.Array,  # [B, Dp] query dtype
    blocks: jax.Array,  # [B, m, Dp] storage dtype (per-query gathered rows)
    space_type: SpaceType,
    quantization: Quantization,
    q_aux: jax.Array,  # [B]
    v_aux: jax.Array,  # [B, m]
) -> jax.Array:
    """Distances [B, m] f32 between each query and its own m gathered
    vectors (the beam-search neighbor-expansion shape)."""
    space = effective_space(space_type, quantization)

    if space is SpaceType.HAMMING:
        qb = _unpack_bits_device(queries)  # [B, D8]
        vb = _unpack_bits_device(blocks)  # [B, m, D8]
        dot = jnp.einsum(
            "bd,bmd->bm", qb, vb, preferred_element_type=jnp.float32
        )
        return q_aux[:, None] + v_aux - 2.0 * dot

    if quantization is Quantization.I8:
        doti = jnp.einsum(
            "bd,bmd->bm",
            queries.astype(jnp.int32),
            blocks.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        )
        dot = doti.astype(jnp.float32) / (I8_SCALE * I8_SCALE)
    else:
        precision = (
            jax.lax.Precision.HIGHEST
            if quantization is Quantization.F32
            else jax.lax.Precision.DEFAULT
        )
        dot = jnp.einsum(
            "bd,bmd->bm",
            queries,
            blocks,
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    if space is SpaceType.DOT_PRODUCT:
        return 1.0 - dot
    if space is SpaceType.COSINE:
        denom = jnp.maximum(q_aux[:, None] * v_aux, _EPS)
        return 1.0 - dot / denom
    # EUCLIDEAN squared
    if quantization is Quantization.I8:
        qf = queries.astype(jnp.float32) / I8_SCALE
        vf = blocks.astype(jnp.float32) / I8_SCALE
    else:
        qf = queries.astype(jnp.float32)
        vf = blocks.astype(jnp.float32)
    q2 = jnp.sum(qf * qf, axis=-1)
    v2 = jnp.sum(vf * vf, axis=-1)
    d = q2[:, None] + v2 - 2.0 * dot
    return jnp.maximum(d, 0.0)


def prepare_queries(
    q: np.ndarray, space_type: SpaceType, quantization: Quantization
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side query preparation: quantize to the storage representation,
    pad to the storage row length, and compute the per-query aux. Returns
    (queries_storage [B, Dp], q_aux [B])."""
    from vector_store_tpu.ops.quantize import padded_dim, quantize_for_storage

    q = np.asarray(q, dtype=np.float32)
    dp = padded_dim(q.shape[-1], quantization)
    qs = quantize_for_storage(q, quantization)
    pad = dp - qs.shape[-1]
    if pad:
        qs = np.pad(qs, [(0, 0)] * (qs.ndim - 1) + [(0, pad)])
    aux = vector_aux(qs, space_type, quantization)
    return qs, aux
