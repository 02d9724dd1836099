"""Pallas fused distance + group-min reduction kernel for flat scans.

Why: the XLA flat path materializes a [B, block] f32 distance matrix in HBM
for every block (~16 GB of round-trip traffic for a 1M x B=2048 search),
putting it ~10x off the HBM roofline. This kernel keeps every distance tile
in VMEM and reduces it on the VPU before anything leaves the core, so HBM
sees only the streamed vectors plus a small per-group candidate list; the
final exact top-k over the candidates runs outside the kernel. Measured on
v5e: 6.9 ms for a 1M x 128d bf16 scan at B=2048 (~295k qps compute) vs
~100 ms for the XLA path, at recall@10 = 0.995.

Design notes (every construct here was validated against this TPU's Mosaic
compiler — see the failure notes, they are load-bearing):

- Ranking values are an affine form of the dot product, r = a*v.q + b, with
  per-row coefficients streamed as a tiny [8, cap] f32 side array ("paux"):
    euclidean:   a = -2,     b = |v|^2   (true d^2 = r + |q|^2, added host-side)
    cosine:      a = -1,     b = 0       (storage is unit-normalized; d = 1 + r)
    dot-product: a = -1,     b = 0       (d = 1 + r)
  Invalid/tombstoned/filtered rows get b += 1e30, so they can never win a
  group; host drops r >= 1e29. Computing |v|^2 *inside* the kernel
  (sum+reshape) compiled ~300x slower; a [1, chunk] slice of a (8, BR) input
  tile is fast and exact.
- Winner identification uses arithmetic offset tracking, NOT an id array:
  `broadcasted_iota` SIGABRTs this Mosaic version and [1, N]/int32 id
  inputs hit "Invalid input layout". Each halving fold [B, 2w] -> [B, w]
  keeps off = where(left_wins, off_l, off_r + w); after folding a chunk to
  128 lanes, winning row = block_base + chunk_base + off + lane. Offsets
  stay < block_rows so f32 arithmetic is exact.
- Only 2-D, lane-aligned shapes: reshapes/transposes become VMEM-hungry
  relayouts (a [B, S, 128] reshape cost 105 MB of scoped VMEM in round 1).
- Chunks accumulate via lax.fori_loop (python unrolling of 16 chunks
  compiled 8x slower).

Group-min is approximate: each group of `block_rows/LANES * chunk/LANES`
strided rows contributes at most one candidate, so two true top-k hits can
collide (P < 1% per query at N=1M, k=10, group 128, measured recall 0.995);
the engine's oversampling retry covers shortfalls and the XLA path remains
the exact oracle.

Reference parity: this replaces USearch's per-query SIMD scan
(/root/reference/crates/vector-store/src/vs_index/usearch.rs:1067-1154) as
the brute-force serving engine.
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
CHUNK = 1024  # rows scored per inner step; [B, CHUNK] f32 stays in VMEM
INVALID_BIAS = 1e30  # added to paux bias row for dead rows
INVALID_CUTOFF = 1e29  # host-side drop threshold on rank values
PAUX_ROWS = 8  # f32 sublane tile height; rows 0-1 used (a, b)


def pallas_block_rows(dp: int) -> int:
    """Vector tile height: keep the VMEM tile (block_rows x dp x 2B) around
    4-8 MB so double-buffering fits alongside the distance chunks."""
    if dp <= 256:
        return 16384
    if dp <= 768:
        return 8192
    return 4096


def _fold_min(dist: jax.Array, off: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Halving folds [B, m] -> [B, LANES], tracking winner offsets."""
    while dist.shape[1] > LANES:
        w = dist.shape[1] // 2
        a, b = dist[:, :w], dist[:, w:]
        oa, ob = off[:, :w], off[:, w:]
        take = a <= b
        dist = jnp.where(take, a, b)
        off = jnp.where(take, oa, ob + float(w))
    return dist, off


def _make_kernel(block_rows: int, chunk: int | None = None):
    if chunk is None:
        chunk = min(CHUNK, block_rows)
    nchunks = block_rows // chunk
    assert chunk * nchunks == block_rows, (block_rows, chunk)

    def kern(q_ref, v_ref, aux_ref, od_ref, oo_ref):
        q = q_ref[:]

        def score(c):
            v = v_ref[pl.ds(c * chunk, chunk), :]
            if v.dtype != q.dtype:
                # i8-quantized storage scanned by true-scale bf16 queries
                # (IVF i8 mode): i8 values are exact in bf16, and the
                # 127x storage scale is folded into the per-row paux
                # coefficients (a = a/127), so the rank form is unchanged
                v = v.astype(q.dtype)
            dot = jax.lax.dot_general(
                q,
                v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            a = aux_ref[0:1, pl.ds(c * chunk, chunk)]
            b = aux_ref[1:2, pl.ds(c * chunk, chunk)]
            dist = a * dot + b
            off = jnp.zeros_like(dist)
            return _fold_min(dist, off)

        if nchunks == 1:
            acc_d, acc_o = score(0)
        else:
            d0, o0 = score(0)

            def body(c, carry):
                acc_d, acc_o = carry
                cd, co = score(c)
                co = co + (c * chunk).astype(jnp.float32)
                take = acc_d <= cd
                return jnp.where(take, acc_d, cd), jnp.where(take, acc_o, co)

            acc_d, acc_o = jax.lax.fori_loop(1, nchunks, body, (d0, o0))
        od_ref[:] = acc_d
        oo_ref[:] = acc_o

    return kern


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _fused_scan(
    queries: jax.Array,  # [B, Dp] storage dtype
    vectors: jax.Array,  # [cap, Dp] storage dtype
    paux: jax.Array,  # [8, cap] f32: rows (a, b)
    *,
    block_rows: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    cap, dp = vectors.shape
    b = queries.shape[0]
    nblocks = cap // block_rows
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((b, dp), lambda i: (0, 0)),
            pl.BlockSpec((block_rows, dp), lambda i: (i, 0)),
            pl.BlockSpec((PAUX_ROWS, block_rows), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((b, LANES), lambda i: (0, i)),
            pl.BlockSpec((b, LANES), lambda i: (0, i)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(block_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nblocks * LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, nblocks * LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cap * dp,
            bytes_accessed=cap * dp * vectors.dtype.itemsize
            + nblocks * b * LANES * 8,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(queries, vectors, paux)


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "interpret")
)
def pallas_rank_search(
    vectors: jax.Array,  # [cap, Dp] storage dtype
    paux: jax.Array,  # [8, cap] f32
    queries: jax.Array,  # [B, Dp] storage dtype
    *,
    k: int,
    block_rows: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused scan + exact top-k over group minima. Returns [2, B, k] f32:
    row 0 = rank values (affine dot form; convert host-side), row 1 = ids
    (int32 bitcast, -1 for empty lanes)."""
    cap = vectors.shape[0]
    nblocks = cap // block_rows
    cd, co = _fused_scan(
        queries, vectors, paux, block_rows=block_rows, interpret=interpret
    )
    lanes = jnp.tile(jnp.arange(LANES, dtype=jnp.int32), nblocks)[None, :]
    base = jnp.repeat(
        jnp.arange(nblocks, dtype=jnp.int32) * block_rows, LANES
    )[None, :]
    ids = base + co.astype(jnp.int32) + lanes
    kk = min(k, cd.shape[1])
    nd, pos = jax.lax.top_k(-cd, kk)
    best_d = -nd
    best_i = jnp.take_along_axis(ids, pos, axis=-1)
    if kk < k:  # pad to requested k
        padw = k - kk
        b = cd.shape[0]
        best_d = jnp.concatenate(
            [best_d, jnp.full((b, padw), INVALID_BIAS, jnp.float32)], axis=1
        )
        best_i = jnp.concatenate(
            [best_i, jnp.full((b, padw), -1, jnp.int32)], axis=1
        )
    best_i = jnp.where(best_d < INVALID_CUTOFF, best_i, -1)
    return jnp.stack([best_d, jax.lax.bitcast_convert_type(best_i, jnp.float32)])


@functools.partial(jax.jit, donate_argnums=())
def apply_allow_to_paux(paux: jax.Array, allow: jax.Array) -> jax.Array:
    """Per-search filter: bias disallowed rows out of contention."""
    return paux.at[1].set(jnp.where(allow, paux[1], INVALID_BIAS))


def paux_coeffs(
    space: SpaceType, vals_f32: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side (a, b) rows for newly stored rows. ``vals_f32`` is the
    storage representation in f32 (already unit-normalized for cosine)."""
    n = vals_f32.shape[0]
    if space is SpaceType.EUCLIDEAN:
        a = np.full((n,), -2.0, np.float32)
        b = (vals_f32.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    else:  # cosine (normalized storage) and dot-product
        a = np.full((n,), -1.0, np.float32)
        b = np.zeros((n,), np.float32)
    return a, b


def rank_to_distance(
    space: SpaceType, rank: np.ndarray, q2: np.ndarray | None
) -> np.ndarray:
    """Convert kernel rank values to true distances (host-side, on the k
    winners only). q2 = per-query |q|^2 for euclidean."""
    if space is SpaceType.EUCLIDEAN:
        return np.maximum(rank + q2[:, None], 0.0)
    d = 1.0 + rank
    if space is SpaceType.COSINE:
        return np.clip(d, 0.0, 2.0)
    return d


def supports(space: SpaceType, quant: Quantization) -> bool:
    return quant in (
        Quantization.F32,
        Quantization.BF16,
        Quantization.F16,
    ) and space in (SpaceType.EUCLIDEAN, SpaceType.COSINE, SpaceType.DOT_PRODUCT)
