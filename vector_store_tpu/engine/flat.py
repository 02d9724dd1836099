"""Exact (brute-force) device-resident vector index.

This is the TPU engine's foundation: the reference's full-scan-equivalent
correctness oracle (SURVEY §7 step 3) and a serving engine in its own right —
on TPU a blocked MXU matmul over ~1M vectors saturates HBM bandwidth, so
exact search is competitive with CPU HNSW at this scale while giving
recall 1.0.

Device state (all slot-indexed, mirroring the reference's PrimaryId slots):
- vectors [cap, Dp]   quantized storage (bf16/f16/f32/i8/packed-b1)
- aux     [cap]       per-vector norm (cosine) or popcount (hamming)
- epochs  [cap] i32   epoch written at insert; returned with hits so the
                      table can reject stale results (usearch stores the
                      epoch inside its u64 keys, usearch.rs:1067-1154)
- valid   [cap] bool  live mask (False = never written or removed)
- parts   [cap] i32   partition slot for local indexes (-1 = none)

Mutations are functional array updates under jit with donated buffers, so
they are in-place on device. Growth reallocates at reserve increments like
the reference (1M global / 1k local, usearch.rs:442-443).
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.ops.distance import (
    pairwise_distance,
    prepare_queries,
    vector_aux,
)
from vector_store_tpu.ops.quantize import padded_dim, quantize_for_storage, storage_dtype
from vector_store_tpu.ops.topk import merge_min_k, min_k
from vector_store_tpu.utils import hotpath

logger = logging.getLogger(__name__)

GLOBAL_RESERVE_INCREMENT = 1_000_000
LOCAL_RESERVE_INCREMENT = 1_000

# few, coarse batch buckets: every (bucket, k-bucket) pair is a separate
# compiled device program, and a compile through a slow host link stalls
# live queries for its duration — three buckets, all pre-warmed after an
# IVF rebuild, mean no unfiltered query ever hits a cold compile
_BATCH_BUCKETS = (8, 128, 2048)
# k buckets start at 16: the k=1-shaped device programs miscompiled on the
# real Mosaic backend (right group-min value, wrong winner id — only in
# the k=1 compilation context; k>=16 programs are correct and exercised
# by every serving path). Top-k output is sorted, so computing top-16 and
# slicing to the requested k is exact.
_K_BUCKETS = (16, 64, 256, 1024)


def _bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


# mutation batches arrive in arbitrary sizes (actor modify batches, CDC
# bursts, post-swap re-entry chunks); every scatter program is shape-keyed
# by the batch length, and a fresh compile through the host relay stalls
# serving — pad to a coarse ladder by REPEATING the last element (duplicate
# scatter indices with identical values are deterministic and harmless)
_MUT_BUCKETS = (64, 256, 1024, 4096, 16384, 32768, 65536)


def _pad_mutation(n: int, *arrays: np.ndarray) -> list[np.ndarray]:
    """Pad each [n, ...] array to the mutation bucket by repeating its last
    row. Callers must compute live-count/host-mirror updates from the
    UNPADDED arrays first."""
    m = _bucket(n, _MUT_BUCKETS)
    if m == n:
        return list(arrays)
    reps = m - n
    return [
        np.concatenate([a, np.repeat(a[-1:], reps, axis=0)], axis=0)
        for a in arrays
    ]


@dataclass
class SearchResult:
    """Host-side search output; invalid lanes already stripped."""

    slots: np.ndarray  # [k'] int64
    epochs: np.ndarray  # [k'] int32
    distances: np.ndarray  # [k'] float32

    def truncated(self, k: int) -> "SearchResult":
        """First k entries (rows are already distance-ordered)."""
        if self.slots.shape[0] <= k:
            return self
        return SearchResult(
            slots=self.slots[:k],
            epochs=self.epochs[:k],
            distances=self.distances[:k],
        )


@dataclass
class PendingSearch:
    """In-flight device search: packed device array + metadata.

    kind "xla": packed [3, B, k] (dist, ids, epochs).
    kind "pallas": packed [2, B, k] (rank values, ids); distances are
    reconstructed host-side from the affine rank form and epochs come from
    the engine's host mirror (fewer device->host bytes per query).
    kind "ids": packed [B, k] int32 ids only — the minimum possible
    device->host payload. Distances are recomputed exactly in f32 from the
    engine's host vector mirror and epochs come from the host epoch mirror
    (the reference resolves ids host-side the same way,
    usearch.rs:1067-1154)."""

    packed: jax.Array
    b_real: int
    k: int
    kind: str = "xla"
    q2: np.ndarray | None = None  # [B] per-query |q|^2 (pallas euclidean)
    q_f32: np.ndarray | None = None  # [B, D] normalized f32 queries (ids kind)
    engine: "FlatDeviceIndex | None" = None
    ctx: object = None  # engine-specific retry context (e.g. IVF masked paux)


@functools.partial(
    jax.jit,
    static_argnames=("space", "quant", "k", "block_rows", "approx", "use_parts"),
    donate_argnums=(),
)
def _flat_search(
    vectors: jax.Array,
    aux: jax.Array,
    epochs: jax.Array,
    valid: jax.Array,
    parts: jax.Array,
    queries: jax.Array,  # [B, Dp] storage dtype
    q_aux: jax.Array,  # [B]
    psel: jax.Array,  # [B] i32 partition selector (-1 = all)
    allow: jax.Array,  # [cap] bool additional filter mask
    *,
    space: SpaceType,
    quant: Quantization,
    k: int,
    block_rows: int,
    approx: bool,
    use_parts: bool,
):
    cap = vectors.shape[0]
    b = queries.shape[0]
    nblocks = cap // block_rows
    inf = jnp.float32(jnp.inf)

    def body(_, i):
        start = i * block_rows
        vb = jax.lax.dynamic_slice_in_dim(vectors, start, block_rows, 0)
        ab = jax.lax.dynamic_slice_in_dim(aux, start, block_rows, 0)
        valb = jax.lax.dynamic_slice_in_dim(valid, start, block_rows, 0)
        alb = jax.lax.dynamic_slice_in_dim(allow, start, block_rows, 0)
        d = pairwise_distance(queries, vb, space, quant, q_aux, ab)  # [B, blk]
        mask = (valb & alb)[None, :]
        if use_parts:
            pb = jax.lax.dynamic_slice_in_dim(parts, start, block_rows, 0)
            pm = (psel[:, None] < 0) | (pb[None, :] == psel[:, None])
            mask = mask & pm
        d = jnp.where(mask, d, inf)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (b, block_rows), 1)
        # per-block partial top-k only; the cross-block merge happens once
        # after the scan (top_k inside the loop dominated the runtime)
        bd, bi = min_k(d, ids, k, approx=approx)
        return None, (bd, bi)

    _, (blk_d, blk_i) = jax.lax.scan(
        body, None, jnp.arange(nblocks, dtype=jnp.int32)
    )
    # [nblocks, B, k] -> [B, nblocks*k]
    cand_d = jnp.moveaxis(blk_d, 0, 1).reshape(b, nblocks * k)
    cand_i = jnp.moveaxis(blk_i, 0, 1).reshape(b, nblocks * k)
    best_d, best_i = min_k(cand_d, cand_i, k)
    safe_i = jnp.maximum(best_i, 0)
    best_e = jnp.where(best_i >= 0, epochs[safe_i], -1)
    # pack into one f32 array: a single device->host pull per search batch
    # (tiny pulls are pathologically slow through the TPU relay)
    return _pack_results(best_d, best_i, best_e)


@jax.jit
def _part_rebuild_mirror(vectors, paux, rows_flat):
    """Derive the partition-major mirror wholesale from the flat arrays:
    rows_flat [P_cap*pmax] i32 slot per position (-1 empty)."""
    from vector_store_tpu.ops.pallas_scan import INVALID_BIAS

    safe = jnp.maximum(rows_flat, 0)
    pv = vectors[safe]
    pa = jnp.zeros((8, rows_flat.shape[0]), jnp.float32)
    pa = pa.at[0].set(paux[0, safe])
    pa = pa.at[1].set(
        jnp.where(rows_flat >= 0, paux[1, safe], INVALID_BIAS)
    )
    return pv, pa


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _part_refresh_buckets(part_vecs, part_paux, vectors, paux, idx, rows):
    """Re-derive whole buckets (post-removal swaps): idx [m] bucket ids,
    rows [m, pmax] their current slot lists."""
    from vector_store_tpu.ops.pallas_scan import INVALID_BIAS

    m, pmax = rows.shape
    flat_rows = rows.reshape(-1)
    safe = jnp.maximum(flat_rows, 0)
    flatpos = (
        idx[:, None] * pmax + jnp.arange(pmax, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    part_vecs = part_vecs.at[flatpos].set(vectors[safe])
    part_paux = part_paux.at[0, flatpos].set(paux[0, safe])
    part_paux = part_paux.at[1, flatpos].set(
        jnp.where(flat_rows >= 0, paux[1, safe], INVALID_BIAS)
    )
    return part_vecs, part_paux


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _part_apply_adds(part_vecs, part_paux, vectors, paux, pos, slots):
    """Scatter appended rows into the partition-major mirror; the vector
    bytes come from the device flat array (zero extra host uplink)."""
    part_vecs = part_vecs.at[pos].set(vectors[slots])
    part_paux = part_paux.at[0, pos].set(paux[0, slots])
    part_paux = part_paux.at[1, pos].set(paux[1, slots])
    return part_vecs, part_paux


@functools.partial(jax.jit, static_argnames=("space", "quant", "k"))
def _part_search(
    vectors: jax.Array,  # [cap, Dp] storage dtype
    aux: jax.Array,  # [cap] f32
    epochs: jax.Array,  # [cap] i32
    valid: jax.Array,  # [cap] bool
    part_rows: jax.Array,  # [P_cap, pmax] i32 per-partition slot lists
    queries: jax.Array,  # [B, Dp] query dtype
    q_aux: jax.Array,  # [B] f32
    bsel: jax.Array,  # [B] i32 partition bucket per query (-1 = none)
    *,
    space: SpaceType,
    quant: Quantization,
    k: int,
) -> jax.Array:
    """Partition-directory search: gather [B, pmax] candidate slots, score
    with one per-query block distance, top-k. O(B * pmax * Dp) total —
    independent of the table's row count."""
    from vector_store_tpu.ops.distance import query_block_distance

    rows = jnp.where(
        bsel[:, None] >= 0, part_rows[jnp.maximum(bsel, 0)], -1
    )  # [B, pmax]
    safe = jnp.maximum(rows, 0)
    vb = vectors[safe]  # [B, pmax, Dp]
    vaux = aux[safe]
    d = query_block_distance(queries, vb, space, quant, q_aux, vaux)
    ok = (rows >= 0) & valid[safe]
    d = jnp.where(ok, d, jnp.inf)
    kk = min(k, rows.shape[1])
    negd, pos = jax.lax.top_k(-d, kk)
    best_d = -negd
    best_i = jnp.take_along_axis(rows, pos, axis=1)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    best_e = jnp.where(best_i >= 0, epochs[jnp.maximum(best_i, 0)], -1)
    if kk < k:
        b = queries.shape[0]
        padw = k - kk
        best_d = jnp.concatenate(
            [best_d, jnp.full((b, padw), jnp.inf, jnp.float32)], axis=1
        )
        best_i = jnp.concatenate(
            [best_i, jnp.full((b, padw), -1, jnp.int32)], axis=1
        )
        best_e = jnp.concatenate(
            [best_e, jnp.full((b, padw), -1, jnp.int32)], axis=1
        )
    return _pack_results(best_d, best_i, best_e)


@functools.partial(jax.jit, static_argnames=("space", "k"))
def _rescore_stage(
    cand_packed: jax.Array,  # [3, B, K'] from the quantized search
    rescore_vectors: jax.Array,  # [cap, Dp] bf16 originals
    rescore_aux: jax.Array,  # [cap] f32 (|v| for cosine)
    queries: jax.Array,  # [B, Dp] bf16
    q_aux: jax.Array,  # [B] f32
    *,
    space: SpaceType,
    k: int,
) -> jax.Array:
    """Re-rank oversampled quantized candidates with full-precision
    distances (the reference's oversampling/rescoring index options fix
    quantized ranking the same way, validator quantization_and_rescoring)."""
    from vector_store_tpu.core.types import Quantization as _Q
    from vector_store_tpu.ops.distance import query_block_distance

    ci = jax.lax.bitcast_convert_type(cand_packed[1], jnp.int32)  # [B, K']
    ce = cand_packed[2]  # epochs, still f32 bits
    safe = jnp.maximum(ci, 0)
    rows = rescore_vectors[safe]  # [B, K', Dp]
    raux = rescore_aux[safe]
    nd = query_block_distance(queries, rows, space, _Q.BF16, q_aux, raux)
    nd = jnp.where(ci >= 0, nd, jnp.inf)
    negd, pos = jax.lax.top_k(-nd, k)
    best_d = -negd
    best_i = jnp.take_along_axis(ci, pos, axis=1)
    best_eb = jnp.take_along_axis(ce, pos, axis=1)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    best_e = jnp.where(
        best_i >= 0, jax.lax.bitcast_convert_type(best_eb, jnp.int32), -1
    )
    return _pack_results(best_d, best_i, best_e)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _apply_rescore_upserts(vectors_r, aux_r, slots, vals, new_aux):
    return vectors_r.at[slots].set(vals), aux_r.at[slots].set(new_aux)


def _pack_results(d: jax.Array, i: jax.Array, e: jax.Array) -> jax.Array:
    """Stack (distances f32, ids i32, epochs i32) as one [3, B, k] f32 array
    (ints bitcast); host unpacks with np.view."""
    return jnp.stack(
        [
            d,
            jax.lax.bitcast_convert_type(i, jnp.float32),
            jax.lax.bitcast_convert_type(e, jnp.float32),
        ]
    )


def unpack_results(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of _pack_results on host numpy."""
    d = packed[0]
    i = packed[1].view(np.int32)
    e = packed[2].view(np.int32)
    return d, i, e


# The TPU relay's device->host path degrades pathologically for small
# transfers (tiny pulls can cost 100-1000x a 512KB pull); pad every result
# pull up to this many bytes.
_MIN_PULL_BYTES = 576 * 1024


@functools.partial(jax.jit, static_argnames=("pad",))
def _flatten_pad(packed: jax.Array, *, pad: int) -> jax.Array:
    flat = packed.reshape(-1)
    return jnp.concatenate([flat, jnp.zeros((pad,), dtype=flat.dtype)])


def pull_packed(packed: jax.Array) -> np.ndarray:
    """Device array (any rank) -> host numpy, padding the transfer above
    the relay's slow small-transfer threshold."""
    elems = int(np.prod(packed.shape))
    itemsize = np.dtype(packed.dtype).itemsize
    need = _MIN_PULL_BYTES // itemsize - elems
    if need > 0:
        host = np.asarray(_flatten_pad(packed, pad=need))
        return host[:elems].reshape(packed.shape)
    return np.asarray(packed)


@functools.partial(jax.jit, static_argnames=("k",))
def _ids_only(packed: jax.Array, *, k: int) -> jax.Array:
    """[2, B, k_pad] pallas result -> [B, k] int32 ids (minimal pull)."""
    return jax.lax.bitcast_convert_type(packed[1], jnp.int32)[:, :k]


@functools.partial(jax.jit, static_argnames=("dt",))
def _dequant_queries(qi8: jax.Array, scale: jax.Array, *, dt: str) -> jax.Array:
    """i8-shipped queries -> storage-dtype rows on device. Queries cross
    the host->device link as int8 + one f32 scale per row (half the bytes
    of bf16 — the uplink is the serving bottleneck on this hardware) and
    are dequantized device-side so the scan kernels see their usual
    storage-dtype input."""
    return (qi8.astype(jnp.float32) * scale[:, None]).astype(dt)


@functools.partial(jax.jit, static_argnames=("window",))
def _split_windows(qs_all: jax.Array, *, window: int) -> tuple:
    n = qs_all.shape[0]
    return tuple(
        jax.lax.dynamic_slice_in_dim(qs_all, lo, window)
        for lo in range(0, n - window + 1, window)
    )


def split_query_windows(qs_all: jax.Array, window: int) -> list:
    """Slice a super-batch query upload into per-dispatch windows in ONE
    device dispatch (a jitted program with W outputs — no per-slice RPC,
    no transfer). Complements upload_queries: one h2d transfer carries W
    windows, each slice feeds search_begin(queries_dev=...)."""
    n = int(qs_all.shape[0])
    out = list(_split_windows(qs_all, window=window))
    if n % window:
        out.append(
            jax.lax.dynamic_slice_in_dim(
                qs_all, n - (n % window), n % window
            )
        )
    return out


def ids_postprocess(
    vecs_host: np.ndarray,  # [cap, D] f32 storage-representation mirror
    epochs_host: np.ndarray,  # [cap] i32
    space: SpaceType,
    dims: int,
    ids: np.ndarray,  # [b, k] int32 winner ids (-1 empty)
    q_f32: np.ndarray,  # [b, D] f32 queries (normalized for cosine)
    keep_order: bool = False,
) -> list[SearchResult]:
    """Shared ids-only resolution: recompute exact f32 distances from the
    host mirror, attach epochs, restore strict distance order.

    keep_order=True (index option `rescoring: false`) preserves the
    device's storage-precision rank order — only invalid ids are pushed to
    the back. Distances are still the exact f32 recompute (they are the
    only distances the ids-only transport has), so a rescoring=false
    result can show non-monotonic distances; the CONTRACT is the order
    (validator quantization_and_rescoring.rs: quantized order without
    rescoring, exact order with)."""
    from vector_store_tpu.engine.rescore import native_rescore

    i = np.asarray(ids)
    safe = np.maximum(i, 0)
    q = q_f32[:, :dims]
    d = native_rescore(vecs_host, i, q, space)
    if d is None:  # no native toolchain / layout mismatch: numpy fallback
        v = vecs_host[safe]  # [b, k, D]
        if space is SpaceType.EUCLIDEAN:
            d = ((q[:, None, :] - v) ** 2).sum(-1)
        else:
            dot = np.einsum("bd,bkd->bk", q, v)
            d = 1.0 - dot
            if space is SpaceType.COSINE:
                d = np.clip(d, 0.0, 2.0)
    e = epochs_host[safe]
    # one batched stable sort with invalid ids pushed to +inf, then per-row
    # slicing — this loop used to argsort per row, which at 1-core host
    # budgets (20 us/query caps e2e at ~50k QPS) was a measured serving
    # bottleneck, not style
    valid = i >= 0
    d = np.where(valid, d, np.inf).astype(np.float32, copy=False)
    if keep_order:
        # stable sort on the validity flag alone: invalids to the back,
        # device rank order otherwise untouched
        order = np.argsort(np.where(valid, 0, 1), axis=1, kind="stable")
    else:
        order = np.argsort(d, axis=1, kind="stable")
    sl = np.take_along_axis(i, order, 1).astype(np.int64)
    dd = np.take_along_axis(d, order, 1)
    ee = np.take_along_axis(e, order, 1)
    if valid.all():
        # the common case (every fetched id resolved): row views, no
        # per-row count conversion or slicing — 4x cheaper to build
        return [
            SearchResult(slots=sl[row], epochs=ee[row], distances=dd[row])
            for row in range(i.shape[0])
        ]
    counts = valid.sum(1).tolist()
    return [
        SearchResult(
            slots=sl[row, :n],
            epochs=ee[row, :n],
            distances=dd[row, :n],
        )
        for row, n in enumerate(counts)
    ]


def pull_packed_many(packeds: list[jax.Array]) -> list[np.ndarray]:
    """Pull several result arrays in ONE batched transfer. The relay's
    per-transfer fixed cost (~30-40 ms) dominates sequential pulls;
    jax.device_get on a list amortizes it across all arrays (measured:
    8 sequential 240 KB pulls cost up to 100x one device_get of the same
    list). No padding — batched transfers don't hit the tiny-pull
    pathology."""
    if len(packeds) == 1:
        return [pull_packed(packeds[0])]
    return jax.device_get(packeds)


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3, 4, 5),
    static_argnames=("space_kind", "dt", "normalize"),
)
def _bulk_ingest(
    vectors,
    aux,
    epochs,
    valid,
    parts,
    paux,
    rows_f32,  # [n, D] f32 device-resident rows (unnormalized)
    lo,  # scalar i32 first slot (operand, not static: chunks share one program)
    epochs_new,  # [n] i32 per-row epochs
    live_new,  # [n] bool: False rows are shape padding (never valid/ranked)
    parts_new,  # [n] i32 partition slots (-1 = none)
    *,
    space_kind: str,
    dt: str,
    normalize: bool,
):
    """Contiguous device-side ingest: normalize/quantize/aux/paux entirely
    on device and place the block with dynamic_update_slice. The only
    host->device payload for a chunk is three scalars (the rows come from
    a device source — e.g. benchkit.synth's generator — so bulk loads do
    not ride the host link at all)."""
    n, d = rows_f32.shape
    dp = vectors.shape[1]
    x = rows_f32
    if normalize:
        norms = jnp.sqrt((x * x).sum(-1, keepdims=True))
        x = x / jnp.maximum(norms, 1e-30)
    if dp > d:
        x = jnp.pad(x, ((0, 0), (0, dp - d)))
    if dt == "int8":
        vals = jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
        # aux convention (vector_aux): i8 norms live in the /127 domain;
        # paux rank coefficients (paux_coeffs) use the RAW storage values
        aux_f32 = vals.astype(jnp.float32) / 127.0
        rank_f32 = vals.astype(jnp.float32)
    else:
        vals = x.astype(dt)
        aux_f32 = vals.astype(jnp.float32)
        rank_f32 = aux_f32
    if space_kind == "cosine":
        new_aux = jnp.sqrt((aux_f32 * aux_f32).sum(-1))
        a = jnp.full((n,), -1.0, jnp.float32)
        b = jnp.zeros((n,), jnp.float32)
    elif space_kind == "euclid":
        new_aux = jnp.zeros((n,), jnp.float32)
        a = jnp.full((n,), -2.0, jnp.float32)
        b = (rank_f32 * rank_f32).sum(-1)
    else:  # dot
        new_aux = jnp.zeros((n,), jnp.float32)
        a = jnp.full((n,), -1.0, jnp.float32)
        b = jnp.zeros((n,), jnp.float32)
    from vector_store_tpu.ops.pallas_scan import INVALID_BIAS

    # padding rows (live_new False) must never rank: invalid bias on the
    # pallas path, valid False on the XLA path
    b = jnp.where(live_new, b, INVALID_BIAS)
    lo32 = lo.astype(jnp.int32)
    vectors = jax.lax.dynamic_update_slice(vectors, vals, (lo32, 0))
    aux = jax.lax.dynamic_update_slice(aux, new_aux, (lo32,))
    epochs = jax.lax.dynamic_update_slice(epochs, epochs_new, (lo32,))
    valid = jax.lax.dynamic_update_slice(valid, live_new, (lo32,))
    parts = jax.lax.dynamic_update_slice(parts, parts_new, (lo32,))
    paux = jax.lax.dynamic_update_slice(paux, a[None, :], (0, lo32))
    paux = jax.lax.dynamic_update_slice(paux, b[None, :], (1, lo32))
    return vectors, aux, epochs, valid, parts, paux


@functools.partial(
    jax.jit, donate_argnums=(0, 1), static_argnames=("normalize", "cosine")
)
def _bulk_rescore(
    rescore_vectors, rescore_aux, rows_f32, lo, *, normalize: bool, cosine: bool
):
    x = rows_f32
    if normalize:
        norms = jnp.sqrt((x * x).sum(-1, keepdims=True))
        x = x / jnp.maximum(norms, 1e-30)
    dp = rescore_vectors.shape[1]
    if dp > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, dp - x.shape[1])))
    vals = x.astype(jnp.bfloat16)
    if cosine:  # vector_aux: norms for cosine, zeros otherwise
        raux = jnp.sqrt((vals.astype(jnp.float32) ** 2).sum(-1))
    else:
        raux = jnp.zeros((x.shape[0],), jnp.float32)
    lo32 = lo.astype(jnp.int32)
    rescore_vectors = jax.lax.dynamic_update_slice(rescore_vectors, vals, (lo32, 0))
    rescore_aux = jax.lax.dynamic_update_slice(rescore_aux, raux, (lo32,))
    return rescore_vectors, rescore_aux


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _apply_upserts(vectors, aux, epochs, valid, parts, slots, vals, new_aux, new_epochs, new_parts):
    vectors = vectors.at[slots].set(vals)
    aux = aux.at[slots].set(new_aux)
    epochs = epochs.at[slots].set(new_epochs)
    valid = valid.at[slots].set(True)
    parts = parts.at[slots].set(new_parts)
    return vectors, aux, epochs, valid, parts


@functools.partial(jax.jit, donate_argnums=(0,))
def _apply_removes(valid, slots):
    return valid.at[slots].set(False)


@functools.partial(jax.jit, static_argnames=("cap",))
def _init_paux(cap: int):
    """Pallas rank coefficients [8, cap]: row 0 = multiplier a, row 1 =
    bias b (INVALID_BIAS until a row is stored)."""
    from vector_store_tpu.ops.pallas_scan import INVALID_BIAS

    paux = jnp.zeros((8, cap), dtype=jnp.float32)
    return paux.at[1].set(INVALID_BIAS)


@functools.partial(jax.jit, donate_argnums=(0,))
def _apply_paux_upserts(paux, slots, a, b):
    paux = paux.at[0, slots].set(a)
    return paux.at[1, slots].set(b)


@functools.partial(jax.jit, donate_argnums=(0,))
def _apply_paux_removes(paux, slots):
    from vector_store_tpu.ops.pallas_scan import INVALID_BIAS

    return paux.at[1, slots].set(INVALID_BIAS)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("new_cap",))
def _grow_paux(paux, *, new_cap):
    from vector_store_tpu.ops.pallas_scan import INVALID_BIAS

    out = jnp.zeros((8, new_cap), dtype=jnp.float32)
    out = out.at[1].set(INVALID_BIAS)
    return jax.lax.dynamic_update_slice(out, paux, (0, 0))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("new_cap",))
def _grow_2d(arr, *, new_cap):
    out = jnp.zeros((new_cap, arr.shape[1]), dtype=arr.dtype)
    return jax.lax.dynamic_update_slice(out, arr, (0, 0))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("new_cap", "fill"))
def _grow_1d(arr, *, new_cap, fill):
    out = jnp.full((new_cap,), fill, dtype=arr.dtype)
    return jax.lax.dynamic_update_slice(out, arr, (0,))


class FlatDeviceIndex:
    """Exact search over slot-addressed device arrays."""

    def __init__(
        self,
        dimensions: int,
        space_type: SpaceType = SpaceType.COSINE,
        quantization: Quantization = Quantization.F32,
        initial_capacity: int = 8192,
        reserve_increment: int = GLOBAL_RESERVE_INCREMENT,
        block_rows: int = 8192,
        approx: bool = False,
        use_pallas: bool | None = None,
        rescore: bool | None = None,
        oversample: int = 4,
        device: jax.Device | None = None,
        host_distances: bool | None = None,
        query_i8: bool | None = None,
        ingest_i8: bool | None = None,
        rescoring: bool = True,
    ) -> None:
        self.dimensions = dimensions
        self.space_type = space_type
        self.quantization = quantization
        self.block_rows = block_rows
        self.reserve_increment = reserve_increment
        self.approx = approx
        self.device = device or jax.devices()[0]
        self.dp = padded_dim(dimensions, quantization)

        # lossy quantizations keep a bf16 copy for oversample+rescore
        # (reference oversampling/rescoring index options)
        if rescore is None:
            rescore = quantization in (Quantization.I8, Quantization.B1)
        # rescoring=False (index option `rescoring: false`): storage-
        # precision rank order end to end — no device rescore stage, no
        # oversampled fetch, and the ids-only host resolution preserves
        # device order (validator quantization_and_rescoring contract)
        self.rescoring = rescoring
        if not rescoring:
            rescore = False
            oversample = 1
        self.rescore = rescore
        self.oversample = oversample
        self.dp_rescore = padded_dim(dimensions, Quantization.BF16)

        # fused pallas scan: the default serving path for float storage on
        # TPU (ops/pallas_scan.py — ~15x the XLA scan). Auto-enables on a
        # TPU backend; the first search probes the compile and falls back
        # to the XLA path permanently on any Mosaic failure.
        from vector_store_tpu.ops.pallas_scan import pallas_block_rows, supports

        if use_pallas is None:
            use_pallas = self.device.platform == "tpu"
        if use_pallas:
            use_pallas = supports(space_type, quantization)
        self.use_pallas = use_pallas
        self._pallas_probed = False
        self.pallas_block = pallas_block_rows(self.dp)
        if use_pallas:
            # capacity must tile evenly for BOTH scan paths
            self.block_rows = block_rows = int(
                np.lcm(block_rows, self.pallas_block)
            )

        cap = self._round_cap(max(initial_capacity, block_rows))
        dt = storage_dtype(quantization)
        with jax.default_device(self.device):
            self.vectors = jnp.zeros((cap, self.dp), dtype=dt)
            self.aux = jnp.zeros((cap,), dtype=jnp.float32)
            self.epochs = jnp.full((cap,), -1, dtype=jnp.int32)
            self.valid = jnp.zeros((cap,), dtype=jnp.bool_)
            self.parts = jnp.full((cap,), -1, dtype=jnp.int32)
            self.paux = _init_paux(cap)  # [8, cap] pallas rank coefficients
            if self.rescore:
                self.rescore_vectors = jnp.zeros(
                    (cap, self.dp_rescore), dtype=jnp.bfloat16
                )
                self.rescore_aux = jnp.zeros((cap,), dtype=jnp.float32)
        self._live = 0
        # host mirrors, so mutations/result resolution never pull device state
        self._valid_host = np.zeros((cap,), dtype=bool)
        self._epochs_host = np.full((cap,), -1, dtype=np.int32)
        self._allow_all: jax.Array | None = None  # cached all-true mask
        # ids-only result pulls: keep an f32 host mirror of the stored
        # vectors so the device only ships [B, k] int32 winner ids and the
        # host recomputes exact distances locally (the device->host path is
        # the serving bottleneck on this hardware; ids are the minimum
        # information-bearing payload). Defaults on for the pallas path.
        if host_distances is None:
            host_distances = self.use_pallas
        self.host_distances = host_distances and self.use_pallas
        self._vecs_host: np.ndarray | None = (
            np.zeros((cap, dimensions), dtype=np.float32)
            if self.host_distances
            else None
        )
        # i8 query shipping (pallas float path only): halves the uplink
        # bytes per query; ranking error from the ~0.4% per-component
        # quantization is negligible next to bf16 storage rounding
        if query_i8 is None:
            query_i8 = self.device.platform == "tpu"
        self.query_i8 = (
            query_i8
            and self.use_pallas
            and quantization
            in (Quantization.F32, Quantization.BF16, Quantization.F16)
        )
        # i8-staged ingest uplink: rows ship as int8 + per-row scale and
        # dequantize to the storage dtype ON DEVICE — half the bytes of a
        # bf16 upload through the slow host link. Effective storage
        # precision becomes ~i8 (per-row scaled, ~0.4%/component), so it is
        # OPT-IN (env VECTOR_STORE_INGEST_I8 or constructor); exact f32
        # distances still come from the host mirror.
        if ingest_i8 is None:
            import os as _os

            ingest_i8 = _os.environ.get("VECTOR_STORE_INGEST_I8", "") == "1"
        self.ingest_i8 = ingest_i8 and quantization in (
            Quantization.F32,
            Quantization.BF16,
            Quantization.F16,
        )

        # partition directory (local indexes): per-partition row lists on
        # device so a partitioned search gathers O(partition-size) rows
        # instead of masking a full O(N) scan — the TPU equivalent of the
        # reference's per-partition sub-indexes (usearch.rs:626-670,
        # 1k reserve increments). Materialized lazily on the first
        # partitioned upsert; falls back to the mask path permanently if a
        # partition outgrows _PART_PMAX_CAP (a jumbo partition approaches
        # the full scan anyway).
        self._part_bucket: dict[int, int] = {}  # partition slot -> bucket
        self._part_rows_host: np.ndarray | None = None  # [P_cap, pmax] i32
        self._part_count: np.ndarray | None = None  # [P_cap] i32
        self._slot_part = np.full((cap,), -1, dtype=np.int64)
        self._slot_pos = np.full((cap,), -1, dtype=np.int32)
        self.part_rows: jax.Array | None = None
        self._part_overflow = False
        # partition-major device mirror for the scalar-prefetch kernel
        # (ops/partition_scan.py): [P_cap*pmax, Dp] vectors + [8, ...] rank
        # coefficients, kept in sync incrementally. Serving reads exactly
        # the probed partition blocks at stream bandwidth.
        self.part_vecs: jax.Array | None = None
        self.part_paux: jax.Array | None = None
        self._part_interpret = False  # tests force interpret-mode kernels
        self._part_kernel_probed = False
        self._part_kernel_failed = False
        self._part_pending_adds: list[tuple[int, int]] = []  # (pos, slot)
        self._part_refresh: set[int] = set()  # buckets needing re-derive
        self._part_rebuild = False

    # -- capacity ------------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def size(self) -> int:
        """Number of live vectors."""
        return self._live

    @property
    def device_bytes(self) -> int:
        """HBM footprint of this index's device arrays (for the memory
        governor — the relay backend exposes no memory_stats)."""
        cap = self.capacity
        per_row = self.vectors.dtype.itemsize * self.dp + 4 + 4 + 1 + 4  # aux/epochs/valid/parts
        total = cap * per_row + 8 * 4 * cap  # + paux [8, cap] f32
        if self.rescore:
            total += cap * (2 * self.dp_rescore + 4)
        if self.part_rows is not None:
            total += 4 * int(np.prod(self.part_rows.shape))
        if self.part_vecs is not None:
            total += (
                self.part_vecs.dtype.itemsize * int(np.prod(self.part_vecs.shape))
                + 4 * int(np.prod(self.part_paux.shape))
            )
        return total

    @property
    def host_bytes(self) -> int:
        """Host-RAM footprint of the mirrors (epoch/valid + the f32 vector
        mirror used for exact distance recompute). Reported to the memory
        governor so the host tier is attributed, not just device HBM —
        at DBpedia scale the f32 mirror is ~6 GB per 1M x 1536 index."""
        total = self._valid_host.nbytes + self._epochs_host.nbytes
        if self._vecs_host is not None:
            total += self._vecs_host.nbytes
        return total

    def _round_cap(self, n: int) -> int:
        b = self.block_rows
        return ((n + b - 1) // b) * b

    def reserve(self, max_slot: int) -> None:
        """Ensure capacity covers slots [0, max_slot]; grows by the reserve
        increment (reference reserves ahead in 1M/1k steps)."""
        if max_slot < self.capacity:
            return
        new_cap = self._round_cap(
            max(max_slot + 1, self.capacity + self.reserve_increment)
        )
        self.vectors = _grow_2d(self.vectors, new_cap=new_cap)
        self.aux = _grow_1d(self.aux, new_cap=new_cap, fill=0.0)
        self.epochs = _grow_1d(self.epochs, new_cap=new_cap, fill=-1)
        self.valid = _grow_1d(self.valid, new_cap=new_cap, fill=False)
        self.parts = _grow_1d(self.parts, new_cap=new_cap, fill=-1)
        self.paux = _grow_paux(self.paux, new_cap=new_cap)
        if self.rescore:
            self.rescore_vectors = _grow_2d(self.rescore_vectors, new_cap=new_cap)
            self.rescore_aux = _grow_1d(self.rescore_aux, new_cap=new_cap, fill=0.0)
        grown = np.zeros((new_cap,), dtype=bool)
        grown[: self._valid_host.shape[0]] = self._valid_host
        self._valid_host = grown
        egrown = np.full((new_cap,), -1, dtype=np.int32)
        egrown[: self._epochs_host.shape[0]] = self._epochs_host
        self._epochs_host = egrown
        if self._vecs_host is not None:
            vgrown = np.zeros((new_cap, self.dimensions), dtype=np.float32)
            vgrown[: self._vecs_host.shape[0]] = self._vecs_host
            self._vecs_host = vgrown
        pgrown = np.full((new_cap,), -1, dtype=np.int64)
        pgrown[: self._slot_part.shape[0]] = self._slot_part
        self._slot_part = pgrown
        sgrown = np.full((new_cap,), -1, dtype=np.int32)
        sgrown[: self._slot_pos.shape[0]] = self._slot_pos
        self._slot_pos = sgrown
        self._allow_all = None

    # -- mutation --------------------------------------------------------------

    @hotpath.measure
    def upsert_batch(
        self,
        slots: np.ndarray,
        epochs: np.ndarray,
        vectors: np.ndarray,  # [n, D] f32
        partitions: np.ndarray | None = None,  # [n] i32
    ) -> None:
        slots = np.asarray(slots, dtype=np.int32)
        if slots.size == 0:
            return
        uniq = np.unique(slots)
        if uniq.size != slots.size:
            # LWW within the batch: device scatter order for duplicate
            # indices is undefined and the live count would overcount —
            # keep each slot's LAST occurrence
            rev_first = np.unique(slots[::-1], return_index=True)[1]
            keep = np.sort(slots.size - 1 - rev_first)
            slots = slots[keep]
            epochs = np.asarray(epochs)[keep]
            vectors = np.asarray(vectors)[keep]
            if partitions is not None:
                partitions = np.asarray(partitions)[keep]
        self.reserve(int(slots.max()))
        was_valid = self._valid_host[slots]
        vectors = np.asarray(vectors, dtype=np.float32)
        if self.space_type is SpaceType.COSINE and self.quantization not in (
            Quantization.B1,
        ):
            # store unit vectors: cosine is scale-invariant, and normalized
            # storage lets the fused pallas path treat cosine as dot
            norms = np.linalg.norm(vectors, axis=-1, keepdims=True)
            vectors = vectors / np.maximum(norms, 1e-30)
        if partitions is None:
            partitions = np.full((slots.size,), -1, dtype=np.int32)
        # pad the whole device pipeline to the mutation-size ladder
        # (repeat-last: duplicate scatter indices with identical values are
        # deterministic) so arbitrary modify-batch sizes — actor batches,
        # CDC bursts, post-swap re-entry chunks — reuse a handful of
        # compiled upload/scatter programs instead of compiling one per
        # distinct length. Host bookkeeping below uses the UNPADDED arrays.
        slots_p, epochs_p, parts_p, vecs_p = _pad_mutation(
            slots.size,
            slots,
            np.asarray(epochs, dtype=np.int32),
            np.asarray(partitions, dtype=np.int32),
            vectors,
        )
        if self.ingest_i8:
            # wire format: int8 + per-row scale, dequantized to the storage
            # dtype on device (half the uplink bytes of bf16)
            vpad = vecs_p
            pad = self.dp - vpad.shape[-1]
            if pad:
                vpad = np.pad(vpad, [(0, 0), (0, pad)])
            iscale = np.maximum(np.abs(vpad).max(axis=1), 1e-20) / 127.0
            vi8 = np.clip(
                np.rint(vpad / iscale[:, None]), -127, 127
            ).astype(np.int8)
            vals_repr = vi8.astype(np.float32) * iscale[:, None]
            vals_dev = _dequant_queries(
                jnp.asarray(vi8),
                jnp.asarray(iscale.astype(np.float32)),
                dt=np.dtype(storage_dtype(self.quantization)).name,
            )
        else:
            vals = quantize_for_storage(vecs_p, self.quantization)
            pad = self.dp - vals.shape[-1]
            if pad:
                vals = np.pad(vals, [(0, 0), (0, pad)])
            vals_repr = vals.astype(np.float32)
            vals_dev = jnp.asarray(vals)
        new_aux = vector_aux(
            vals_repr
            if self.ingest_i8
            else vals,
            self.space_type,
            self.quantization,
        )
        self.vectors, self.aux, self.epochs, self.valid, self.parts = _apply_upserts(
            self.vectors,
            self.aux,
            self.epochs,
            self.valid,
            self.parts,
            jnp.asarray(slots_p),
            vals_dev,
            jnp.asarray(new_aux),
            jnp.asarray(epochs_p),
            jnp.asarray(parts_p),
        )
        if self.use_pallas or self._part_interpret:
            from vector_store_tpu.ops.pallas_scan import paux_coeffs

            a_row, b_row = paux_coeffs(self.space_type, vals_repr)
            self.paux = _apply_paux_upserts(
                self.paux,
                jnp.asarray(slots_p),
                jnp.asarray(a_row),
                jnp.asarray(b_row),
            )
        if self.rescore:
            rvals = quantize_for_storage(vecs_p, Quantization.BF16)
            rpad = self.dp_rescore - rvals.shape[-1]
            if rpad:
                rvals = np.pad(rvals, [(0, 0), (0, rpad)])
            raux = vector_aux(rvals, self.space_type, Quantization.BF16)
            self.rescore_vectors, self.rescore_aux = _apply_rescore_upserts(
                self.rescore_vectors,
                self.rescore_aux,
                jnp.asarray(slots_p),
                jnp.asarray(rvals),
                jnp.asarray(raux),
            )
        # live count: newly-occupied slots only (upsert of a live slot keeps count)
        self._live += int((~was_valid).sum())
        has_parts = (np.asarray(partitions) >= 0).any()
        if has_parts or self._part_rows_host is not None:
            self._part_upsert(
                slots, np.asarray(partitions, dtype=np.int64), was_valid
            )
        self._valid_host[slots] = True
        self._epochs_host[slots] = np.asarray(epochs, dtype=np.int32)
        if self._vecs_host is not None:
            self._vecs_host[slots] = vectors[:, : self.dimensions]

    def upsert_bulk_device(
        self,
        lo: int,
        hi: int,
        rows_dev: jax.Array,  # [hi-lo, D] f32 ON DEVICE (unnormalized)
        rows_host: np.ndarray,  # [hi-lo, D] f32 host twin of the same rows
        partitions: np.ndarray | None = None,
        epoch: int = 0,
        epochs: np.ndarray | None = None,  # [hi-lo] i32 per-row (wins over epoch)
        n_real: int | None = None,  # rows beyond n_real are shape padding
    ) -> None:
        """Bulk-loader fast path: contiguous fresh slots [lo, hi) whose
        vector payload is ALREADY device-resident (a device-side source —
        benchkit.synth's generator, a sharded transfer, a previous device
        computation). Normalize/quantize/aux all run on device; the
        host->device payload is three scalars. `rows_host` is the f32 twin
        used for the host mirrors (exact-distance rescoring) — it must be
        the same rows up to float rounding. The reference's bulk reserve +
        add loop (usearch.rs:442-443) is the analogous ingest shape.

        `n_real` (default hi-lo) marks trailing rows as SHAPE PADDING:
        they land in the arrays but never become valid/ranked — callers
        ingesting variable-size blocks pad to a coarse size ladder so
        repeated swaps reuse the same compiled programs (a fresh compile
        through the relay stalls serving for its duration)."""
        n = int(hi) - int(lo)
        if n <= 0:
            return
        if n_real is None:
            n_real = n
        if self.quantization is Quantization.B1:
            raise ValueError("bulk device ingest does not support B1 packing")
        if rows_dev.shape != (n, self.dimensions):
            raise ValueError(f"rows_dev shape {rows_dev.shape} != {(n, self.dimensions)}")
        self.reserve(hi - 1)
        if self._valid_host[lo:hi].any():
            raise ValueError("bulk device ingest requires fresh slots")
        if self.space_type is SpaceType.EUCLIDEAN:
            space_kind = "euclid"
        elif self.space_type is SpaceType.COSINE:
            space_kind = "cosine"
        else:
            space_kind = "dot"
        normalize = self.space_type is SpaceType.COSINE
        if partitions is None:
            parts_new = jnp.full((n,), -1, jnp.int32)
        else:
            parts_new = jnp.asarray(np.asarray(partitions, dtype=np.int32))
        dt = np.dtype(storage_dtype(self.quantization)).name
        lo_dev = jnp.int32(lo)
        if epochs is None:
            epochs_h = np.full((n,), epoch, dtype=np.int32)
        else:
            epochs_h = np.zeros((n,), dtype=np.int32)
            epochs_h[:n_real] = np.asarray(epochs, dtype=np.int32)[:n_real]
        live_h = np.zeros((n,), dtype=bool)
        live_h[:n_real] = True
        (
            self.vectors,
            self.aux,
            self.epochs,
            self.valid,
            self.parts,
            self.paux,
        ) = _bulk_ingest(
            self.vectors,
            self.aux,
            self.epochs,
            self.valid,
            self.parts,
            self.paux,
            rows_dev,
            lo_dev,
            jnp.asarray(epochs_h),
            jnp.asarray(live_h),
            parts_new,
            space_kind=space_kind,
            dt=dt,
            normalize=normalize,
        )
        if self.rescore:
            self.rescore_vectors, self.rescore_aux = _bulk_rescore(
                self.rescore_vectors,
                self.rescore_aux,
                rows_dev,
                lo_dev,
                normalize=normalize,
                cosine=self.space_type is SpaceType.COSINE,
            )
        # host mirrors from the numpy twin (padding rows stay invalid)
        hi_real = lo + n_real
        rh = np.asarray(rows_host, dtype=np.float32)[:n_real]
        if normalize:
            norms = np.linalg.norm(rh, axis=-1, keepdims=True)
            rh = rh / np.maximum(norms, 1e-30)
        self._valid_host[lo:hi_real] = True
        self._epochs_host[lo:hi_real] = epochs_h[:n_real]
        if self._vecs_host is not None:
            self._vecs_host[lo:hi_real] = rh[:, : self.dimensions]
        self._live += n_real
        if partitions is not None:
            # fresh partitionless slots need no directory work (_slot_part
            # defaults to -1); partitioned rows go through the normal
            # directory bookkeeping (device mirror syncs by device gather)
            self._part_upsert(
                np.arange(lo, hi, dtype=np.int64),
                np.asarray(partitions, dtype=np.int64),
                np.zeros((n,), dtype=bool),
            )

    def remove_batch(self, slots: np.ndarray) -> None:
        slots = np.asarray(slots, dtype=np.int32)
        if slots.size == 0:
            return
        slots = np.unique(slots[slots < self.capacity])  # dupes would
        if slots.size == 0:  # double-decrement the live count
            return
        was_valid = self._valid_host[slots]
        (slots_p,) = _pad_mutation(slots.size, slots)  # shape-ladder pad
        self.valid = _apply_removes(self.valid, jnp.asarray(slots_p))
        if self.use_pallas or self._part_interpret:
            self.paux = _apply_paux_removes(self.paux, jnp.asarray(slots_p))
        self._valid_host[slots] = False
        self._live -= int(was_valid.sum())
        if self._part_rows_host is not None:
            dirty: set[int] = set()
            for slot, wv in zip(slots.tolist(), was_valid.tolist()):
                if wv and self._slot_part[slot] >= 0:
                    self._part_remove_one(slot, int(self._slot_part[slot]), dirty)
                    self._slot_part[slot] = -1
            self._flush_part_dirty(dirty)

    # -- partition directory ----------------------------------------------------

    _PART_PMAX0 = 128  # initial per-partition row capacity (pow2 ladder)
    _PART_PMAX_CAP = 16384  # beyond this a partition ~= a full scan
    _PART_PCAP0 = 256  # initial bucket count (table reserves 256 partitions)

    def partition_count(self, part_slot: int) -> int:
        """Live rows in one partition (O(1) from the directory; used by the
        serving actor to stop k-escalation once a whole partition has been
        considered)."""
        if self._part_count is not None and not self._part_overflow:
            b = self._part_bucket.get(int(part_slot))
            return int(self._part_count[b]) if b is not None else 0
        valid = self._valid_host[: self._slot_part.shape[0]]
        return int(((self._slot_part == int(part_slot)) & valid).sum())

    def _part_upsert(
        self, slots: np.ndarray, parts: np.ndarray, was_valid: np.ndarray
    ) -> None:
        old_parts = self._slot_part[slots].copy()
        self._slot_part[slots] = parts  # kept current even after overflow
        if self._part_overflow:
            return
        dirty: set[int] = set()
        # bulk fast path for pure adds (the full-scan ingest shape: every
        # row new) — per-partition contiguous appends computed vectorized
        # instead of a per-row Python loop
        is_add = (~was_valid) & (parts >= 0)
        slow = ~is_add
        if is_add.any():
            a_slots = slots[is_add]
            a_parts = parts[is_add]
            order = np.argsort(a_parts, kind="stable")
            sp = a_parts[order]
            ss = a_slots[order]
            uniq, starts, counts = np.unique(
                sp, return_index=True, return_counts=True
            )
            for p, st, c in zip(uniq.tolist(), starts.tolist(), counts.tolist()):
                b = self._part_bucket.get(p)
                if b is None:
                    b = self._part_new_bucket(p)
                base = int(self._part_count[b])
                while base + c > self._part_rows_host.shape[1]:
                    if not self._part_grow_pmax():
                        return  # overflowed: directory disabled
                pmax = self._part_rows_host.shape[1]
                seg = ss[st : st + c]
                self._part_rows_host[b, base : base + c] = seg
                self._slot_pos[seg] = np.arange(base, base + c, dtype=np.int32)
                self._part_count[b] = base + c
                self._part_pending_adds.extend(
                    zip(
                        range(b * pmax + base, b * pmax + base + c),
                        seg.tolist(),
                    )
                )
                dirty.add(b)
        for slot, p, old, wv in zip(
            slots[slow].tolist(),
            parts[slow].tolist(),
            old_parts[slow].tolist(),
            was_valid[slow].tolist(),
        ):
            if wv and old == p:
                continue
            if wv and old >= 0:
                self._part_remove_one(slot, int(old), dirty)
            if p >= 0:
                self._part_add_one(slot, int(p), dirty)
                if self._part_overflow:
                    return
        self._flush_part_dirty(dirty)

    def _part_add_one(self, slot: int, p: int, dirty: set[int]) -> None:
        b = self._part_bucket.get(p)
        if b is None:
            b = self._part_new_bucket(p)
        c = int(self._part_count[b])
        if c >= self._part_rows_host.shape[1]:
            if not self._part_grow_pmax():
                return  # overflowed: directory disabled
        pmax = self._part_rows_host.shape[1]
        self._part_rows_host[b, c] = slot
        self._slot_pos[slot] = c
        self._part_count[b] = c + 1
        self._part_pending_adds.append((b * pmax + c, slot))
        dirty.add(b)

    def _part_remove_one(self, slot: int, p: int, dirty: set[int]) -> None:
        b = self._part_bucket.get(p)
        if b is None:
            return
        pos = int(self._slot_pos[slot])
        c = int(self._part_count[b]) - 1
        if pos < 0 or c < 0:
            return
        last = int(self._part_rows_host[b, c])
        self._part_rows_host[b, pos] = last
        self._slot_pos[last] = pos
        self._part_rows_host[b, c] = -1
        self._part_count[b] = c
        self._slot_pos[slot] = -1
        self._part_refresh.add(b)  # swap-moves re-derive the whole bucket
        dirty.add(b)

    def _part_new_bucket(self, p: int) -> int:
        if self._part_rows_host is None:
            self._part_rows_host = np.full(
                (self._PART_PCAP0, self._PART_PMAX0), -1, dtype=np.int32
            )
            self._part_count = np.zeros((self._PART_PCAP0,), dtype=np.int32)
            with jax.default_device(self.device):
                self.part_rows = jnp.asarray(self._part_rows_host)
        b = len(self._part_bucket)
        if b >= self._part_rows_host.shape[0]:
            pcap = self._part_rows_host.shape[0] * 2
            grown = np.full(
                (pcap, self._part_rows_host.shape[1]), -1, dtype=np.int32
            )
            grown[: self._part_rows_host.shape[0]] = self._part_rows_host
            self._part_rows_host = grown
            cg = np.zeros((pcap,), dtype=np.int32)
            cg[: self._part_count.shape[0]] = self._part_count
            self._part_count = cg
            with jax.default_device(self.device):
                self.part_rows = jnp.asarray(self._part_rows_host)
        self._part_bucket[p] = b
        return b

    def _part_grow_pmax(self) -> bool:
        """Double the per-partition capacity; False (and directory off) if
        the cap is hit — the mask path serves such indexes."""
        pmax = self._part_rows_host.shape[1] * 2
        if pmax > self._PART_PMAX_CAP:
            logger.warning(
                "partition exceeded %d rows; partition-directory search "
                "disabled for this index (full-scan mask path serves it)",
                self._PART_PMAX_CAP,
            )
            self._part_overflow = True
            self._part_rows_host = None
            self._part_count = None
            self.part_rows = None
            return False
        grown = np.full(
            (self._part_rows_host.shape[0], pmax), -1, dtype=np.int32
        )
        grown[:, : self._part_rows_host.shape[1]] = self._part_rows_host
        self._part_rows_host = grown
        with jax.default_device(self.device):
            self.part_rows = jnp.asarray(self._part_rows_host)
        return True

    def _flush_part_dirty(self, dirty: set[int]) -> None:
        """Scatter the changed buckets' row lists to the device copy."""
        if not dirty or self._part_overflow or self.part_rows is None:
            return
        if self.part_rows.shape != self._part_rows_host.shape:
            self.part_rows = jnp.asarray(self._part_rows_host)
        else:
            idx = np.fromiter(dirty, np.int32, len(dirty))
            self.part_rows = self.part_rows.at[jnp.asarray(idx)].set(
                jnp.asarray(self._part_rows_host[idx])
            )
        self._part_device_sync()

    def _part_kernel_enabled(self) -> bool:
        from vector_store_tpu.ops.pallas_scan import supports

        return (
            (self.use_pallas or self._part_interpret)
            and not self._part_kernel_failed
            and supports(self.space_type, self.quantization)
        )

    def _part_device_sync(self) -> None:
        """Bring the partition-major mirror up to date: full rebuild on
        geometry change, per-bucket re-derive after removals/moves, and a
        batched scatter for plain appends. All vector bytes come from the
        DEVICE flat arrays (no second host upload)."""
        if not self._part_kernel_enabled():
            self._part_pending_adds.clear()
            self._part_refresh.clear()
            self._part_rebuild = False
            return
        pmax = self._part_rows_host.shape[1]
        npos = self._part_rows_host.shape[0] * pmax
        if (
            self.part_vecs is None
            or self.part_vecs.shape[0] != npos
            or self._part_rebuild
        ):
            rows = jnp.asarray(self._part_rows_host.reshape(-1))
            self.part_vecs, self.part_paux = _part_rebuild_mirror(
                self.vectors, self.paux, rows
            )
            self._part_rebuild = False
            self._part_pending_adds.clear()
            self._part_refresh.clear()
            return
        if self._part_refresh:
            idx = np.fromiter(
                self._part_refresh, np.int32, len(self._part_refresh)
            )
            self._part_refresh.clear()
            self.part_vecs, self.part_paux = _part_refresh_buckets(
                self.part_vecs,
                self.part_paux,
                self.vectors,
                self.paux,
                jnp.asarray(idx),
                jnp.asarray(self._part_rows_host[idx]),
            )
        if self._part_pending_adds:
            arr = np.asarray(self._part_pending_adds, dtype=np.int64)
            self._part_pending_adds.clear()
            self.part_vecs, self.part_paux = _part_apply_adds(
                self.part_vecs,
                self.part_paux,
                self.vectors,
                self.paux,
                jnp.asarray(arr[:, 0].astype(np.int32)),
                jnp.asarray(arr[:, 1].astype(np.int32)),
            )

    # -- search ----------------------------------------------------------------

    def search(
        self,
        queries: np.ndarray,  # [B, D] f32
        k: int,
        partitions: np.ndarray | None = None,  # [B] i32, -1 = unrestricted
        allow_mask: np.ndarray | None = None,  # [cap] bool
    ) -> list[SearchResult]:
        return self.search_collect(self.search_begin(queries, k, partitions, allow_mask))

    @hotpath.measure
    def search_begin(
        self,
        queries: np.ndarray,
        k: int,
        partitions: np.ndarray | None = None,
        allow_mask: np.ndarray | None = None,
        raw: bool = False,
        queries_dev: jax.Array | None = None,
    ) -> "PendingSearch":
        """Dispatch the device kernel and return a handle without waiting.
        Pipelining `search_begin` of batch N+1 before `search_collect` of
        batch N hides the device->host pull latency behind compute.
        raw=True skips the ids-only conversion so the caller gets the full
        rank/distance device arrays (the IVF engine merges them with its
        own candidates on device). queries_dev, if given, is an already
        device-resident storage-dtype [b_pad, Dp] query array (avoids a
        second uplink when the IVF engine shares one upload across its two
        region scans)."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if self.space_type is SpaceType.COSINE and self.quantization not in (
            Quantization.B1,
        ):
            norms = np.linalg.norm(queries, axis=-1, keepdims=True)
            queries = queries / np.maximum(norms, 1e-30)
        b_real, _ = queries.shape
        b_pad = _bucket(b_real, _BATCH_BUCKETS)
        k_pad = _bucket(k, _K_BUCKETS)
        if b_pad != b_real:
            queries = np.pad(queries, [(0, b_pad - b_real), (0, 0)])
        if queries_dev is not None and int(queries_dev.shape[0]) != b_pad:
            # pad on device so the kernel keeps its bucketed program shape
            # (a fresh shape is a fresh Mosaic/XLA compile on hardware)
            queries_dev = jnp.pad(
                queries_dev,
                [(0, b_pad - int(queries_dev.shape[0])), (0, 0)],
            )
        qs, q_aux = prepare_queries(queries, self.space_type, self.quantization)

        if partitions is None:
            psel = np.full((b_pad,), -1, dtype=np.int32)
            use_parts = False
        else:
            psel = np.full((b_pad,), -1, dtype=np.int32)
            psel[:b_real] = np.asarray(partitions, dtype=np.int32)
            use_parts = True

        if allow_mask is None:
            if self._allow_all is None or self._allow_all.shape[0] != self.capacity:
                self._allow_all = jnp.ones((self.capacity,), dtype=jnp.bool_)
            allow = self._allow_all
        else:
            am = np.zeros((self.capacity,), dtype=bool)
            am[: allow_mask.shape[0]] = allow_mask[: self.capacity]
            allow = jnp.asarray(am)

        if (
            use_parts
            and self.part_rows is not None
            and not self._part_overflow
            and allow_mask is None
            and not (np.asarray(partitions) < 0).any()
            and self._part_directory_wins(b_pad)
        ):
            # every query names a partition: O(partition) directory path
            return self._part_begin(qs, queries, q_aux, psel, b_real, k, k_pad)

        if self.use_pallas and not use_parts and b_pad >= 8:
            pending = self._pallas_begin(
                qs, queries, k_pad, b_real, k, allow_mask, raw=raw,
                queries_dev=queries_dev,
            )
            if pending is not None:
                return pending

        k_search = k_pad
        if self.rescore:
            k_search = _bucket(
                min(k_pad * self.oversample, self.capacity), _K_BUCKETS
            )
        packed = _flat_search(
            self.vectors,
            self.aux,
            self.epochs,
            self.valid,
            self.parts,
            jnp.asarray(qs),
            jnp.asarray(q_aux),
            jnp.asarray(psel),
            allow,
            space=self.space_type,
            quant=self.quantization,
            k=k_search,
            block_rows=self.block_rows,
            approx=self.approx,
            use_parts=use_parts,
        )
        if self.rescore:
            rqs, rq_aux = prepare_queries(
                queries, self.space_type, Quantization.BF16
            )
            rpad = self.dp_rescore - rqs.shape[-1]
            if rpad:
                rqs = np.pad(rqs, [(0, 0), (0, rpad)])
            packed = _rescore_stage(
                packed,
                self.rescore_vectors,
                self.rescore_aux,
                jnp.asarray(rqs),
                jnp.asarray(rq_aux),
                space=self.space_type,
                k=k_pad,
            )
        return PendingSearch(packed=packed, b_real=b_real, k=k)

    def _part_directory_wins(self, b_pad: int, capacity: int | None = None) -> bool:
        """Batch-amortization crossover: the directory path reads each
        query's OWN pmax-row block (O(B*pmax*Dp) HBM traffic), while the
        masked scan reads the table ONCE for the whole batch (O(N*Dp)).
        The pure traffic model puts break-even at B*pmax = N, but the
        MEASURED break-even sits ~3x higher (SCALE_RUNS partition-1000k,
        r4: at 1M rows / pmax=1024 the directory wins 5.4x at batch 8 AND
        1.6x at batch 2048 = 2x the traffic model's crossover — the
        contiguous per-block DMA outruns the masked scan's fused-fold
        epilogue per byte; extrapolating the two points puts parity near
        B*pmax ~ 3.3*N). Route on the measured coefficient; small tables
        (both sub-ms) always keep the directory."""
        cap = self.capacity if capacity is None else capacity
        if cap < 65_536:
            return True
        return b_pad * self._part_rows_host.shape[1] <= 3 * cap

    def _part_begin(
        self,
        qs: np.ndarray,
        queries_f32: np.ndarray,
        q_aux: np.ndarray,
        psel: np.ndarray,  # [b_pad] partition slots (-1 pads)
        b_real: int,
        k: int,
        k_pad: int,
    ) -> "PendingSearch":
        """O(partition) search: gather each query's partition row list from
        the device directory and score only those rows (the reference's
        per-partition sub-indexes serve exactly this shape,
        usearch.rs:626-670). Cost per query is pmax * Dp regardless of the
        table's total row count."""
        bsel = np.fromiter(
            (self._part_bucket.get(int(p), -1) for p in psel),
            np.int32,
            psel.shape[0],
        )
        pmax = self.part_rows.shape[1]

        # fast path: the scalar-prefetch kernel DMAs exactly each query's
        # partition block (ops/partition_scan.py); ids-only downlink with
        # exact host-side distance recompute. Falls back permanently to
        # the XLA gather path on a Mosaic failure.
        if (
            self._part_kernel_enabled()
            and self.part_vecs is not None
            and self._vecs_host is not None
            and k_pad <= 128
        ):
            from vector_store_tpu.ops.partition_scan import (
                partition_candidates,
            )

            try:
                qdev = self._query_device_array(qs, queries_f32)
                ids = partition_candidates(
                    self.part_vecs,
                    self.part_paux,
                    self.part_rows,
                    qdev,
                    jnp.asarray(bsel),
                    k=min(k, k_pad),
                    pmax=pmax,
                    interpret=self._part_interpret,
                )
                if not self._part_kernel_probed:
                    jax.block_until_ready(ids)
                    self._part_kernel_probed = True
                return PendingSearch(
                    packed=ids,
                    b_real=b_real,
                    k=k,
                    kind="ids",
                    q_f32=queries_f32,
                    engine=self,
                )
            except Exception:
                logger.warning(
                    "partition-scan kernel unavailable on this backend; "
                    "serving local searches via the XLA gather path",
                    exc_info=True,
                )
                self._part_kernel_failed = True

        k_search = min(k_pad, pmax)
        if self.rescore:
            k_search = min(
                _bucket(min(k_pad * self.oversample, pmax), _K_BUCKETS), pmax
            )
        packed = _part_search(
            self.vectors,
            self.aux,
            self.epochs,
            self.valid,
            self.part_rows,
            jnp.asarray(qs),
            jnp.asarray(q_aux),
            jnp.asarray(bsel),
            space=self.space_type,
            quant=self.quantization,
            k=k_search,
        )
        if self.rescore:
            rqs, rq_aux = prepare_queries(
                queries_f32, self.space_type, Quantization.BF16
            )
            rpad = self.dp_rescore - rqs.shape[-1]
            if rpad:
                rqs = np.pad(rqs, [(0, 0), (0, rpad)])
            packed = _rescore_stage(
                packed,
                self.rescore_vectors,
                self.rescore_aux,
                jnp.asarray(rqs),
                jnp.asarray(rq_aux),
                space=self.space_type,
                k=min(k_pad, pmax),
            )
        return PendingSearch(packed=packed, b_real=b_real, k=k)

    def _pallas_begin(
        self,
        qs: np.ndarray,
        queries_f32: np.ndarray,
        k_pad: int,
        b_real: int,
        k: int,
        allow_mask: np.ndarray | None,
        raw: bool = False,
        queries_dev: jax.Array | None = None,
    ) -> "PendingSearch | None":
        """Dispatch the fused pallas scan; returns None (caller falls back
        to the XLA path) if the kernel fails to compile on this backend."""
        from vector_store_tpu.ops.pallas_scan import (
            apply_allow_to_paux,
            pallas_rank_search,
        )

        paux = self.paux
        if allow_mask is not None:
            am = np.zeros((self.capacity,), dtype=bool)
            am[: allow_mask.shape[0]] = allow_mask[: self.capacity]
            paux = apply_allow_to_paux(paux, jnp.asarray(am))
        q2 = None
        if self.space_type is SpaceType.EUCLIDEAN:
            q2 = (queries_f32.astype(np.float64) ** 2).sum(-1).astype(np.float32)
        qdev = (
            queries_dev
            if queries_dev is not None
            else self._query_device_array(qs, queries_f32)
        )
        try:
            packed = pallas_rank_search(
                self.vectors,
                paux,
                qdev,
                k=k_pad,
                block_rows=self.pallas_block,
            )
            if not self._pallas_probed:
                # first call: block so a Mosaic compile failure surfaces
                # here (and is caught) instead of at collect time
                jax.block_until_ready(packed)
                self._pallas_probed = True
        except Exception:
            logger.warning(
                "pallas fused scan unavailable on this backend; "
                "falling back to the XLA scan path",
                exc_info=True,
            )
            self.use_pallas = False
            return None
        if not raw and self.host_distances and self._vecs_host is not None:
            # ship ids only; distances are recomputed host-side in exact f32
            return PendingSearch(
                packed=_ids_only(packed, k=min(k, k_pad)),
                b_real=b_real,
                k=k,
                kind="ids",
                q_f32=queries_f32,
                engine=self,
            )
        return PendingSearch(
            packed=packed, b_real=b_real, k=k, kind="pallas", q2=q2, engine=self
        )

    def upload_queries(self, queries_f32: np.ndarray) -> jax.Array:
        """ONE h2d transfer for a whole window of query batches; slices of
        the returned [M, Dp] storage-dtype array (split_query_windows)
        feed search_begin(queries_dev=...). Amortizes the relay's fixed
        per-transfer cost across W dispatch windows, mirroring the
        aggregated result pull (collect_many) on the downlink."""
        q = np.atleast_2d(np.asarray(queries_f32, dtype=np.float32))
        if self.space_type is SpaceType.COSINE and self.quantization not in (
            Quantization.B1,
        ):
            q = q / np.maximum(
                np.linalg.norm(q, axis=-1, keepdims=True), 1e-30
            )
        if self.query_i8:
            return self._query_device_array(None, q)
        qs, _ = prepare_queries(q, self.space_type, self.quantization)
        return jnp.asarray(qs)

    def _query_device_array(
        self, qs: np.ndarray, queries_f32: np.ndarray
    ) -> jax.Array:
        """Queries -> device storage-dtype rows, shipping int8 + scales
        when query_i8 is enabled (half the uplink bytes)."""
        if not self.query_i8:
            return jnp.asarray(qs)
        qpad = queries_f32
        pad = self.dp - qpad.shape[-1]
        if pad:
            qpad = np.pad(qpad, [(0, 0), (0, pad)])
        scale = np.maximum(np.abs(qpad).max(axis=1), 1e-20) / 127.0
        qi8 = np.clip(
            np.rint(qpad / scale[:, None]), -127, 127
        ).astype(np.int8)
        dt = np.dtype(storage_dtype(self.quantization)).name
        return _dequant_queries(
            jnp.asarray(qi8), jnp.asarray(scale.astype(np.float32)), dt=dt
        )

    @hotpath.measure
    def search_collect(self, pending: "PendingSearch") -> list[SearchResult]:
        return self._postprocess(pending, pull_packed(pending.packed))

    def collect_many(
        self, pendings: list["PendingSearch"]
    ) -> list[list[SearchResult]]:
        """Collect several in-flight searches with ONE device->host
        transfer. The relay charges a fixed ~30-100ms per transfer and a
        list device_get costs ~2x a single contiguous pull of the same
        bytes (measured), so same-shaped results are stacked on device
        first and pulled as one array."""
        groups: dict[tuple, list[int]] = {}
        for pos, p in enumerate(pendings):
            groups.setdefault(
                (p.packed.shape, str(p.packed.dtype)), []
            ).append(pos)
        hosts: list[np.ndarray | None] = [None] * len(pendings)
        for members in groups.values():
            if len(members) == 1:
                hosts[members[0]] = pull_packed(pendings[members[0]].packed)
            else:
                stacked = pull_packed(
                    jnp.stack([pendings[m].packed for m in members])
                )
                for j, m in enumerate(members):
                    hosts[m] = stacked[j]
        return [self._postprocess(p, h) for p, h in zip(pendings, hosts)]

    def _postprocess(
        self, pending: "PendingSearch", host: np.ndarray
    ) -> list[SearchResult]:
        b_real, k = pending.b_real, pending.k
        if pending.kind == "ids":
            # [B, k] int32 winner ids; everything else reconstructed host-side
            return ids_postprocess(
                self._vecs_host,
                self._epochs_host,
                self.space_type,
                self.dimensions,
                np.asarray(host)[:b_real],
                pending.q_f32[:b_real],
                keep_order=not self.rescoring,
            )
        if pending.kind == "pallas":
            from vector_store_tpu.ops.pallas_scan import (
                INVALID_CUTOFF,
                rank_to_distance,
            )

            host = np.asarray(host)
            rank = host[0][:b_real, :k]
            i = host[1].view(np.int32)[:b_real, :k]
            d = rank_to_distance(
                self.space_type,
                rank,
                pending.q2[:b_real] if pending.q2 is not None else None,
            )
            e = self._epochs_host[np.maximum(i, 0)]
            valid_rows = rank < INVALID_CUTOFF
            results = []
            for row in range(b_real):
                ok = valid_rows[row] & (i[row] >= 0)
                results.append(
                    SearchResult(
                        slots=i[row][ok].astype(np.int64),
                        epochs=e[row][ok],
                        distances=d[row][ok].astype(np.float32),
                    )
                )
            return results
        d, i, e = unpack_results(host)
        d = d[:b_real, :k]
        i = i[:b_real, :k]
        e = e[:b_real, :k]
        results = []
        for row in range(b_real):
            ok = np.isfinite(d[row]) & (i[row] >= 0)
            results.append(
                SearchResult(
                    slots=i[row][ok].astype(np.int64),
                    epochs=e[row][ok],
                    distances=d[row][ok],
                )
            )
        return results
