"""Pallas fused distance + candidate-reduction kernel for flat scans.

Why: the XLA flat path materializes a [B, block] f32 distance matrix in HBM
for every block (16 GB of round-trip traffic for a 1M x B=2048 search),
putting it ~10x off the HBM roofline. This kernel keeps the distance tile
in VMEM and reduces it on the VPU before anything leaves the core: each
block's [B, BN] distances collapse to the per-sub-column minima [B, S]
(S = BN/128 lanes), so HBM sees only the streamed vectors plus a tiny
candidate list. The final exact top-k over [B, nblocks*S] candidates runs
outside the kernel.

Exactness: per-128-row sub-column top-1 is approximate — two true top-k
hits can share a sub-column. With slot-randomized rows the collision
probability at k=10, N=1M is <1%, and the engine's oversampling retry
covers shortfalls; the XLA path remains the exact oracle.

Grid sequencing note (pallas_guide: TPU grids run sequentially): queries
stay resident in VMEM across the whole grid; vector blocks stream with
double buffering handled by pallas block specs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vector_store_tpu.core.types import Quantization, SpaceType

LANES = 128


def _scan_kernel(
    q_ref,  # [B, D] storage dtype
    qa_ref,  # [B, 1] f32 (query aux: norms)
    v_ref,  # [BN, D] storage dtype
    va_ref,  # [BN, 1] f32 (vector aux)
    mask_ref,  # [BN, 1] f32 (1.0 = valid & allowed)
    od_ref,  # [B, S] f32 out
    oi_ref,  # [B, S] i32 out
    *,
    space: SpaceType,
    block_rows: int,
):
    i = pl.program_id(0)
    b = q_ref.shape[0]
    bn = block_rows
    s = bn // LANES

    q = q_ref[:]
    v = v_ref[:]
    dot = jax.lax.dot_general(
        q,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, BN]

    if space is SpaceType.DOT_PRODUCT:
        dist = 1.0 - dot
    elif space is SpaceType.COSINE:
        va = va_ref[:].reshape(1, bn)  # |v| from the engine's aux array
        qa = qa_ref[:]  # [B, 1] |q|
        denom = jnp.maximum(qa * va, 1e-30)
        dist = 1.0 - dot / denom
    else:  # EUCLIDEAN squared: norms computed in-kernel on the VPU
        qf = q.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        q2 = jnp.sum(qf * qf, axis=1, keepdims=True)  # [B, 1]
        v2 = jnp.sum(vf * vf, axis=1).reshape(1, bn)
        dist = jnp.maximum(q2 + v2 - 2.0 * dot, 0.0)

    valid = mask_ref[:].reshape(1, bn)
    dist = jnp.where(valid > 0.5, dist, jnp.float32(jnp.inf))

    d3 = dist.reshape(b, s, LANES)
    mins = jnp.min(d3, axis=2)  # [B, S]
    is_min = d3 == mins[:, :, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, s, LANES), 2)
    arg = jnp.min(jnp.where(is_min, lane, LANES), axis=2)  # [B, S]
    sub = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    ids = i * bn + sub * LANES + arg
    # outputs are [S, B] so the trailing (lane) dim is the 128-aligned
    # query batch, not the tiny sub-column count (Mosaic tiling rule)
    oi_ref[:] = ids.T
    od_ref[:] = mins.T


@functools.partial(
    jax.jit, static_argnames=("space", "k", "block_rows", "interpret")
)
def pallas_flat_search(
    vectors: jax.Array,  # [N, D] float storage dtype (f32/bf16/f16)
    aux: jax.Array,  # [N] f32: |v| for cosine (ignored otherwise)
    valid: jax.Array,  # [N] bool
    allow: jax.Array,  # [N] bool
    epochs: jax.Array,  # [N] i32
    queries: jax.Array,  # [B, D] storage dtype
    q_aux: jax.Array,  # [B] f32: |q| for cosine
    *,
    space: SpaceType,
    k: int,
    block_rows: int = 1024,
    interpret: bool = False,
):
    n, d = vectors.shape
    b = queries.shape[0]
    nblocks = n // block_rows
    s = block_rows // LANES
    mask = (valid & allow).astype(jnp.float32)

    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    kernel = functools.partial(_scan_kernel, space=space, block_rows=block_rows)

    def wrapped(q_ref, qa_ref, v_ref, va_ref, m_ref, od_ref, oi_ref):
        kernel(
            q_ref,
            qa_ref,
            v_ref,
            va_ref,
            m_ref,
            od_ref.at[0],
            oi_ref.at[0],
        )

    cand_d, cand_i = pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, s, b), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, s, b), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * vectors.dtype.itemsize + nblocks * b * s * 8,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            # sequential grid: stack/VMEM reused across steps instead of
            # per-step scoped allocations
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        queries,
        q_aux.reshape(b, 1),
        vectors,
        aux.reshape(n, 1),
        mask.reshape(n, 1),
    )

    # final exact top-k over the candidates
    from vector_store_tpu.ops.topk import min_k

    # [nblocks, S, B] -> [B, nblocks*S]
    cd = cand_d.transpose(2, 0, 1).reshape(b, nblocks * s)
    ci = cand_i.transpose(2, 0, 1).reshape(b, nblocks * s)
    best_d, best_i = min_k(cd, ci, k)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    safe = jnp.maximum(best_i, 0)
    best_e = jnp.where(best_i >= 0, epochs[safe], -1)

    from vector_store_tpu.engine.flat import _pack_results

    return _pack_results(best_d, best_i, best_e)


def supports(space: SpaceType, quant: Quantization) -> bool:
    return quant in (
        Quantization.F32,
        Quantization.BF16,
        Quantization.F16,
    ) and space in (SpaceType.EUCLIDEAN, SpaceType.COSINE, SpaceType.DOT_PRODUCT)
