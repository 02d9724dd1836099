"""Scalar-prefetch pallas kernel for O(partition) local-index search.

A local (per-partition) index query must read ONLY its partition's rows.
The XLA formulations both miss that on this hardware:
- masking a full scan streams ALL N rows (O(N) HBM traffic);
- a `vectors[rows]` gather of the partition's rows runs at random-access
  gather bandwidth (~29 GB/s measured) — ~25x off the streaming roofline.

This kernel uses `pltpu.PrefetchScalarGridSpec`: the per-query partition
bucket ids arrive as a scalar-prefetch argument, so each grid step's
BlockSpec index_map selects that query's partition block in the
partition-major storage `[P_cap * pmax, Dp]` and the hardware DMAs it as
ONE contiguous block at stream bandwidth. HBM traffic is exactly
B * pmax * Dp bytes — independent of the table's total row count — and
the inner body is the SAME fused rank kernel as the flat/IVF scans
(pallas_scan._make_kernel: chunked MXU dot + per-group min fold).

Results leave as [B, k] int32 engine-slot ids only (rank order per query
is monotone in true distance, so no distance conversion is needed; the
engine recomputes exact f32 distances from its host mirror).

Reference parity: the TPU-native equivalent of per-partition USearch
sub-indexes (usearch.rs:626-670) — each partition is a contiguous device
block instead of a separate C++ object.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vector_store_tpu.ops.pallas_scan import (
    INVALID_BIAS,
    INVALID_CUTOFF,
    LANES,
    PAUX_ROWS,
    _make_kernel,
)

__all__ = ["partition_rank_scan", "partition_candidates"]


def _chunk_for(pmax: int) -> int:
    for c in (1024, 512, 256, 128):
        if pmax % c == 0:
            return c
    raise ValueError(f"pmax {pmax} not lane-aligned")


@functools.partial(jax.jit, static_argnames=("pmax", "interpret"))
def partition_rank_scan(
    part_vecs: jax.Array,  # [P_cap * pmax, Dp] partition-major storage
    part_paux: jax.Array,  # [8, P_cap * pmax] rank coefficients (a, b)
    queries: jax.Array,  # [B, Dp] query dtype
    bsel: jax.Array,  # [B] i32 partition bucket per query (clamped >= 0)
    *,
    pmax: int,
    interpret: bool = False,
):
    """Per-query partition scan -> ([B, LANES] group-min rank values,
    [B, LANES] within-block winner offsets as f32)."""
    npos, dp = part_vecs.shape
    b = queries.shape[0]
    chunk = _chunk_for(pmax)
    # Mosaic requires sublane-dim blocks divisible by 8: replicate each
    # query to 8 identical rows ON DEVICE (no extra uplink; the MXU
    # processes >= 8 sublanes per pass anyway, so the duplicate rows ride
    # along free) and slice every 8th output row back out.
    queries8 = jnp.repeat(queries, 8, axis=0)  # [b*8, Dp]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((8, dp), lambda i, bs: (i, 0)),
            pl.BlockSpec((pmax, dp), lambda i, bs: (bs[i], 0)),
            pl.BlockSpec((PAUX_ROWS, pmax), lambda i, bs: (0, bs[i])),
        ],
        out_specs=[
            pl.BlockSpec((8, LANES), lambda i, bs: (i, 0)),
            pl.BlockSpec((8, LANES), lambda i, bs: (i, 0)),
        ],
    )
    inner = _make_kernel(pmax, chunk)

    def kern(bsel_ref, q_ref, v_ref, aux_ref, od_ref, oo_ref):
        inner(q_ref, v_ref, aux_ref, od_ref, oo_ref)

    rank8, off8 = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b * 8, LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 8 * pmax * dp,
            bytes_accessed=b * pmax * dp * part_vecs.dtype.itemsize
            + b * (8 * dp * queries.dtype.itemsize + 8 * LANES * 8),
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bsel, queries8, part_vecs, part_paux)
    return rank8[::8], off8[::8]


@functools.partial(jax.jit, static_argnames=("k", "pmax", "interpret"))
def partition_candidates(
    part_vecs: jax.Array,  # [P_cap * pmax, Dp]
    part_paux: jax.Array,  # [8, P_cap * pmax]
    part_rows: jax.Array,  # [P_cap, pmax] i32 position -> engine slot (-1)
    queries: jax.Array,  # [B, Dp]
    bsel: jax.Array,  # [B] i32 (-1 = unknown partition -> empty result)
    *,
    k: int,
    pmax: int,
    interpret: bool = False,
) -> jax.Array:
    """Full partitioned search -> [B, k] i32 engine-slot ids sorted by
    rank (-1 empty). Minimal device->host payload; exact distances and
    epochs are resolved host-side (ids_postprocess)."""
    safe_bsel = jnp.maximum(bsel, 0)
    rank, off = partition_rank_scan(
        part_vecs,
        part_paux,
        queries,
        safe_bsel,
        pmax=pmax,
        interpret=interpret,
    )
    # winner position within the partition block -> engine slot
    pos_in_block = off.astype(jnp.int32) + jnp.arange(
        LANES, dtype=jnp.int32
    )[None, :]
    slot = part_rows[
        safe_bsel[:, None], jnp.minimum(pos_in_block, pmax - 1)
    ]
    rank = jnp.where(bsel[:, None] >= 0, rank, INVALID_BIAS)
    rank = jnp.where(slot >= 0, rank, INVALID_BIAS)
    kk = min(k, LANES)
    neg, sel = jax.lax.top_k(-rank, kk)
    best_slot = jnp.take_along_axis(slot, sel, axis=1)
    best_slot = jnp.where(-neg < INVALID_CUTOFF, best_slot, -1)
    if kk < k:
        b = queries.shape[0]
        best_slot = jnp.concatenate(
            [best_slot, jnp.full((b, k - kk), -1, jnp.int32)], axis=1
        )
    return best_slot
