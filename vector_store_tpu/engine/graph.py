"""Device-resident navigable-graph ANN index with lockstep beam search.

The TPU-native replacement for USearch's C++ HNSW engine
(vs_index/usearch.rs): instead of one CPU thread chasing pointers per query,
the whole query batch traverses a fixed-degree graph in lockstep —

- adjacency lives in HBM as a padded [cap, degree] int32 array,
- each step expands the best unexpanded beam candidate of EVERY query at
  once: one [B, degree] neighbor gather, one [B, degree, D] vector gather,
  one fused batched distance contraction, one masked top-L beam merge,
- tombstones and filters mask the RESULT accumulator but never the beam, so
  traversal can route through deleted/filtered nodes (the reference's
  filtered_ann filters inside traversal the same way, usearch.rs:224-248).

Streaming updates follow the LSM pattern the north star asks for
("CDC upserts/deletes land without full rebuilds"): new vectors are
immediately searchable through an exact flat *delta buffer* and are wired
into the graph by periodic batched merges —

- merge searches the graph for each pending vector (beam, ef_construction),
- prunes candidates with the Vamana alpha rule (batched on-device greedy),
- writes forward edges, then repairs *reverse* edges host-side in one
  vectorized pass (gather rows of touched targets, merge, scatter back).

Single-layer graph: with batched search the multi-layer HNSW hierarchy buys
little on TPU (entry points + a few extra beam steps replace the descent),
which is the same simplification CAGRA makes on GPUs.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.engine.flat import (
    GLOBAL_RESERVE_INCREMENT,
    FlatDeviceIndex,
    SearchResult,
    _bucket,
    _BATCH_BUCKETS,
    _K_BUCKETS,
    _pack_results,
    PendingSearch,
    pull_packed,
    pull_packed_many,
    unpack_results,
)


from vector_store_tpu.ops.distance import (
    pairwise_distance,
    prepare_queries,
    query_block_distance,
)
from vector_store_tpu.ops.topk import merge_min_k, min_k
from vector_store_tpu.utils import hotpath

DEFAULT_ENTRIES = 32


@dataclass
class GraphPendingSearch:
    """In-flight graph search: dispatched beam-search results plus the
    exact delta-buffer scan, pulled together at collect time."""

    graph_packed: jax.Array | None
    delta_pending: PendingSearch | None
    b_real: int
    k: int
    engine: "GraphDeviceIndex"
    delta_host: np.ndarray | None = None
    # ids-only pull mode: graph_packed is [B, k] int32 winner slots and
    # distances/epochs resolve from the store's host mirrors
    graph_ids: bool = False
    q_f32: np.ndarray | None = None
    # oversampled fetch width (k*oversample, bucketed); 0 = just k
    k_fetch: int = 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "space",
        "quant",
        "k",
        "beam_width",
        "iters",
        "filtered",
        "expand",
    ),
)
def _graph_beam_search(
    vectors: jax.Array,  # [cap, Dp]
    aux: jax.Array,  # [cap]
    epochs: jax.Array,  # [cap]
    valid: jax.Array,  # [cap] bool
    allow: jax.Array,  # [cap] bool (True = may appear in results)
    adjacency: jax.Array,  # [cap, deg] int32, -1 padded
    entries: jax.Array,  # [E] int32, -1 padded
    queries: jax.Array,  # [B, Dp]
    q_aux: jax.Array,  # [B]
    *,
    space: SpaceType,
    quant: Quantization,
    k: int,
    beam_width: int,
    iters: int,
    filtered: bool,
    expand: int = 1,
):
    """Lockstep beam search. ``iters`` is the TOTAL expansion budget;
    ``expand`` nodes are expanded per round (rounds = iters/expand), which
    shortens the serialized HBM-gather dependency chain ``expand``-fold at
    identical bytes gathered — the traversal is gather-latency-bound, not
    bandwidth-bound, at the batch sizes the actor serves. Neighbors drawn
    from the same round's ``expand`` lists are dedup'd by an in-round sort
    so beam slots and result top-k never hold duplicate ids."""
    b = queries.shape[0]
    e = entries.shape[0]
    deg = adjacency.shape[1]
    el = beam_width
    ex = max(1, min(expand, el))
    rounds = max(1, iters // ex)
    inf = jnp.float32(jnp.inf)

    # --- init beam from entry points ---------------------------------------
    evalid = entries >= 0
    evecs = vectors[jnp.maximum(entries, 0)]  # [E, Dp]
    eaux = aux[jnp.maximum(entries, 0)]
    d0 = pairwise_distance(queries, evecs, space, quant, q_aux, eaux)  # [B, E]
    d0 = jnp.where(evalid[None, :], d0, inf)
    eids = jnp.broadcast_to(entries[None, :], (b, e))

    pad = el - e if el > e else 0
    if pad:
        beam_d = jnp.concatenate([d0, jnp.full((b, pad), inf)], axis=1)
        beam_i = jnp.concatenate(
            [eids, jnp.full((b, pad), -1, dtype=jnp.int32)], axis=1
        )
    else:
        beam_d, beam_i = min_k(d0, eids, el)
    expanded = jnp.zeros((b, el), dtype=jnp.bool_)

    # --- init result accumulator (filtered) --------------------------------
    res_ok0 = valid[jnp.maximum(eids, 0)] & evalid[None, :]
    if filtered:
        res_ok0 = res_ok0 & allow[jnp.maximum(eids, 0)]
    rd0 = jnp.where(res_ok0, d0, inf)
    res_d, res_i = min_k(rd0, eids, k)

    visited = jnp.full((b, rounds * ex), -1, dtype=jnp.int32)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]  # [B, 1]

    def body(t, state):
        beam_d, beam_i, expanded, visited, res_d, res_i = state

        cand_d = jnp.where(expanded | (beam_i < 0), inf, beam_d)
        sel_negd, j = jax.lax.top_k(-cand_d, ex)  # [B, ex] nearest unexpanded
        has = jnp.isfinite(-sel_negd)  # [B, ex]
        u = jnp.take_along_axis(beam_i, j, axis=1)  # [B, ex]
        u = jnp.where(has, u, -1)

        # mark expanded + record in visited ring
        expanded = expanded.at[bidx, j].set(
            jnp.take_along_axis(expanded, j, axis=1) | has
        )
        visited = jax.lax.dynamic_update_slice(visited, u, (0, t * ex))

        nbrs = adjacency[jnp.maximum(u, 0)]  # [B, ex, deg]
        nbrs = jnp.where(has[:, :, None], nbrs, -1).reshape(b, ex * deg)
        if ex > 1:
            # dedup neighbors drawn from different expanded nodes this round
            # (cluster neighbors overlap heavily): sort by id, mask repeats
            srt = jnp.sort(nbrs, axis=1)
            rep = jnp.concatenate(
                [
                    jnp.zeros((b, 1), jnp.bool_),
                    (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0),
                ],
                axis=1,
            )
            # map the repeat mask back: a neighbor is kept iff it is the
            # FIRST occurrence of its id — compare each nbr against the
            # sorted-unique set via searchsorted-free trick: mark repeats
            # in sorted order, then scatter back through the argsort
            order = jnp.argsort(nbrs, axis=1)
            dup_intra = jnp.zeros_like(rep)
            dup_intra = dup_intra.at[bidx, order].set(rep)
            nbrs = jnp.where(dup_intra, -1, nbrs)

        # drop duplicates already in beam or already expanded
        dup_beam = jnp.any(nbrs[:, :, None] == beam_i[:, None, :], axis=-1)
        dup_vis = jnp.any(nbrs[:, :, None] == visited[:, None, :], axis=-1)
        fresh = (nbrs >= 0) & ~dup_beam & ~dup_vis

        safe = jnp.maximum(nbrs, 0)
        nvecs = vectors[safe]  # [B, ex*deg, Dp]
        naux = aux[safe]
        nd = query_block_distance(queries, nvecs, space, quant, q_aux, naux)
        nd_beam = jnp.where(fresh, nd, inf)

        nfresh = jnp.where(fresh, nbrs, -1)
        all_d = jnp.concatenate([beam_d, nd_beam], axis=1)
        all_i = jnp.concatenate([beam_i, nfresh], axis=1)
        all_x = jnp.concatenate(
            [expanded, jnp.zeros((b, ex * deg), dtype=jnp.bool_)], axis=1
        )
        negd, pos = jax.lax.top_k(-all_d, el)
        beam_d = -negd
        beam_i = jnp.take_along_axis(all_i, pos, axis=1)
        expanded = jnp.take_along_axis(all_x, pos, axis=1)

        res_ok = fresh & valid[safe]
        if filtered:
            res_ok = res_ok & allow[safe]
        nd_res = jnp.where(res_ok, nd, inf)
        res_d, res_i = merge_min_k(res_d, res_i, nd_res, nfresh)

        return beam_d, beam_i, expanded, visited, res_d, res_i

    state = (beam_d, beam_i, expanded, visited, res_d, res_i)
    _, _, _, _, res_d, res_i = jax.lax.fori_loop(0, rounds, body, state)

    res_i = jnp.where(jnp.isfinite(res_d), res_i, -1)
    safe_i = jnp.maximum(res_i, 0)
    res_e = jnp.where(res_i >= 0, epochs[safe_i], -1)
    return _pack_results(res_d, res_i, res_e)


@functools.partial(
    jax.jit,
    static_argnames=(
        "space",
        "quant",
        "k",
        "beam_width",
        "iters",
        "filtered",
        "expand",
    ),
)
def _graph_beam_search_preview(
    vectors: jax.Array,  # [cap, Dp]
    aux: jax.Array,  # [cap]
    epochs: jax.Array,  # [cap]
    valid: jax.Array,  # [cap] bool
    allow: jax.Array,  # [cap] bool
    adjacency: jax.Array,  # [cap, deg] int32, -1 padded
    nbr_prev: jax.Array,  # [cap, deg*PD] bf16: projected NEIGHBOR vectors
    proj: jax.Array,  # [Dp, PD] bf16 JL projection
    entries: jax.Array,  # [E] int32, -1 padded
    queries: jax.Array,  # [B, Dp]
    q_aux: jax.Array,  # [B]
    *,
    space: SpaceType,
    quant: Quantization,
    k: int,
    beam_width: int,
    iters: int,
    filtered: bool,
    expand: int = 1,
):
    """Preview-guided lockstep beam search (VERDICT r4 #5 lever attempt).

    The baseline kernel's round is TWO dependent HBM gathers deep:
    adjacency[u] -> vectors[neighbors-of-u]. Here every node's record
    carries its neighbors' JL-PROJECTED vectors (nbr_prev[u, j] =
    proj(vectors[adjacency[u, j]])), so one round issues adjacency[u] and
    nbr_prev[u] — both keyed by u, gathered IN PARALLEL — and ranks the
    frontier from the previews with zero second gather. The serialized
    chain is 1 gather per round instead of 2. Exact distances return once
    at the end: one gather of the top k*4 preview candidates + a
    storage-precision re-rank (the existing oversample/rescore contract
    then still applies on the host side)."""
    b = queries.shape[0]
    e = entries.shape[0]
    deg = adjacency.shape[1]
    el = beam_width
    ex = max(1, min(expand, el))
    rounds = max(1, iters // ex)
    rk = min(max(4 * k, k + 16), el + k)  # preview candidates kept for rescore
    inf = jnp.float32(jnp.inf)

    qp = (queries.astype(jnp.bfloat16) @ proj).astype(jnp.float32)  # [B, PD]
    q2 = (qp * qp).sum(-1, keepdims=True)  # [B, 1]

    def preview_dist(pv: jax.Array) -> jax.Array:
        """[B, M, PD] bf16 -> squared L2 to qp, f32 [B, M]."""
        pvf = pv.astype(jnp.float32)
        p2 = (pvf * pvf).sum(-1)
        cross = jnp.einsum(
            "bd,bmd->bm", qp, pvf, preferred_element_type=jnp.float32
        )
        return q2 + p2 - 2.0 * cross

    # --- init beam from entry points (projected, same geometry) -----------
    evalid = entries >= 0
    evecs = vectors[jnp.maximum(entries, 0)]  # [E, Dp] (one-time tiny gather)
    ep = (evecs.astype(jnp.bfloat16) @ proj).astype(jnp.float32)  # [E, PD]
    d0 = (
        q2
        + (ep * ep).sum(-1)[None, :]
        - 2.0 * jnp.einsum("bd,ed->be", qp, ep, preferred_element_type=jnp.float32)
    )
    d0 = jnp.where(evalid[None, :], d0, inf)
    eids = jnp.broadcast_to(entries[None, :], (b, e))

    pad = el - e if el > e else 0
    if pad:
        beam_d = jnp.concatenate([d0, jnp.full((b, pad), inf)], axis=1)
        beam_i = jnp.concatenate(
            [eids, jnp.full((b, pad), -1, dtype=jnp.int32)], axis=1
        )
    else:
        beam_d, beam_i = min_k(d0, eids, el)
    expanded = jnp.zeros((b, el), dtype=jnp.bool_)

    res_ok0 = valid[jnp.maximum(eids, 0)] & evalid[None, :]
    if filtered:
        res_ok0 = res_ok0 & allow[jnp.maximum(eids, 0)]
    rd0 = jnp.where(res_ok0, d0, inf)
    res_d, res_i = min_k(rd0, eids, rk)

    visited = jnp.full((b, rounds * ex), -1, dtype=jnp.int32)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]

    def body(t, state):
        beam_d, beam_i, expanded, visited, res_d, res_i = state

        cand_d = jnp.where(expanded | (beam_i < 0), inf, beam_d)
        sel_negd, j = jax.lax.top_k(-cand_d, ex)
        has = jnp.isfinite(-sel_negd)
        u = jnp.take_along_axis(beam_i, j, axis=1)
        u = jnp.where(has, u, -1)

        expanded = expanded.at[bidx, j].set(
            jnp.take_along_axis(expanded, j, axis=1) | has
        )
        visited = jax.lax.dynamic_update_slice(visited, u, (0, t * ex))

        safe_u = jnp.maximum(u, 0)
        # the round's ONLY dependent HBM traffic: both gathers keyed by u
        nbrs = adjacency[safe_u]  # [B, ex, deg]
        pv = nbr_prev[safe_u]  # [B, ex, deg*PD] (flat tile-aligned rows)
        nbrs = jnp.where(has[:, :, None], nbrs, -1).reshape(b, ex * deg)
        pv = pv.reshape(b, ex * deg, -1)  # split deg*PD -> (deg, PD) rows
        if ex > 1:
            srt = jnp.sort(nbrs, axis=1)
            rep = jnp.concatenate(
                [
                    jnp.zeros((b, 1), jnp.bool_),
                    (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0),
                ],
                axis=1,
            )
            order = jnp.argsort(nbrs, axis=1)
            dup_intra = jnp.zeros_like(rep)
            dup_intra = dup_intra.at[bidx, order].set(rep)
            nbrs = jnp.where(dup_intra, -1, nbrs)

        dup_beam = jnp.any(nbrs[:, :, None] == beam_i[:, None, :], axis=-1)
        dup_vis = jnp.any(nbrs[:, :, None] == visited[:, None, :], axis=-1)
        fresh = (nbrs >= 0) & ~dup_beam & ~dup_vis

        nd = preview_dist(pv)  # no gather: previews rode the u-record
        nd_beam = jnp.where(fresh, nd, inf)

        nfresh = jnp.where(fresh, nbrs, -1)
        all_d = jnp.concatenate([beam_d, nd_beam], axis=1)
        all_i = jnp.concatenate([beam_i, nfresh], axis=1)
        all_x = jnp.concatenate(
            [expanded, jnp.zeros((b, ex * deg), dtype=jnp.bool_)], axis=1
        )
        negd, pos = jax.lax.top_k(-all_d, el)
        beam_d = -negd
        beam_i = jnp.take_along_axis(all_i, pos, axis=1)
        expanded = jnp.take_along_axis(all_x, pos, axis=1)

        safe = jnp.maximum(nbrs, 0)
        res_ok = fresh & valid[safe]
        if filtered:
            res_ok = res_ok & allow[safe]
        nd_res = jnp.where(res_ok, nd, inf)
        res_d, res_i = merge_min_k(res_d, res_i, nd_res, nfresh)

        return beam_d, beam_i, expanded, visited, res_d, res_i

    state = (beam_d, beam_i, expanded, visited, res_d, res_i)
    _, _, _, _, res_d, res_i = jax.lax.fori_loop(0, rounds, body, state)

    # --- exact rescore: ONE final gather of the rk preview winners --------
    res_i = jnp.where(jnp.isfinite(res_d), res_i, -1)
    safe_i = jnp.maximum(res_i, 0)
    vv = vectors[safe_i]  # [B, rk, Dp]
    dx = query_block_distance(queries, vv, space, quant, q_aux, aux[safe_i])
    dx = jnp.where(res_i >= 0, dx, inf)
    out_d, out_i = min_k(dx, res_i, k)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    safe_o = jnp.maximum(out_i, 0)
    out_e = jnp.where(out_i >= 0, epochs[safe_o], -1)
    return _pack_results(out_d, out_i, out_e)


@functools.partial(jax.jit, static_argnames=())
def _build_previews_chunk(
    vectors: jax.Array, adj_chunk: jax.Array, proj: jax.Array
) -> jax.Array:
    """One node block of the preview table: [blk, deg] adjacency ->
    [blk, deg*PD] bf16 previews (flat minor dim so the stored table is
    tile-aligned: deg*PD >= 1024 vs PD=32, which a (8,128) tile would pad
    4x — the padding would ride every search gather)."""
    safe = jnp.maximum(adj_chunk, 0)  # [blk, deg]
    rows = vectors[safe].astype(jnp.bfloat16)  # [blk, deg, Dp]
    out = jnp.einsum(
        "udi,ip->udp", rows, proj, preferred_element_type=jnp.bfloat16
    )
    return out.reshape(out.shape[0], -1)


_PREVIEW_BLOCK = 65536


def _build_previews(
    vectors: jax.Array, adjacency: jax.Array, proj: jax.Array
) -> jax.Array:
    """nbr_prev[u, j*PD:(j+1)*PD] = proj(vectors[adjacency[u, j]]), bf16,
    stored [cap, deg*PD]. Rebuilt whole whenever the adjacency changes,
    which keeps every adjacency-write site free of incremental
    bookkeeping — but CHUNKED over node blocks: a single whole-table
    program gathers cap*deg storage rows into one HLO temp (7.75 GB at
    1M x deg 32 x 128-d) and OOMs a 16 GB chip; per-block temps are
    blk*deg*Dp*2 bytes (~512 MB at blk 65536). The last partial block is
    padded to the block shape so every dispatch reuses one compiled
    program."""
    cap, _deg = adjacency.shape
    blk = min(_PREVIEW_BLOCK, cap)
    if cap <= blk:
        return _build_previews_chunk(vectors, adjacency, proj)
    outs = []
    for s in range(0, cap, blk):
        chunk = adjacency[s : s + blk]
        n = chunk.shape[0]
        if n < blk:
            chunk = jnp.pad(chunk, ((0, blk - n), (0, 0)), constant_values=-1)
        out = _build_previews_chunk(vectors, chunk, proj)
        outs.append(out[:n] if n < blk else out)
    return jnp.concatenate(outs, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "space", "quant"))
def _intra_batch_topk(
    vecs: jax.Array,  # [n, Dp] storage dtype
    aux: jax.Array,  # [n]
    *,
    k: int,
    space: SpaceType,
    quant: Quantization,
):
    """Each batch row's k nearest peers (diagonal excluded), on device."""
    n = vecs.shape[0]
    d = pairwise_distance(vecs, vecs, space, quant, aux, aux)
    d = d + jnp.where(
        jnp.eye(n, dtype=jnp.bool_), jnp.float32(jnp.inf), jnp.float32(0)
    )
    nd, pos = jax.lax.top_k(-d, k)
    return -nd, pos


@functools.partial(jax.jit, static_argnames=("m", "alpha", "space", "quant"))
def _alpha_prune(
    cand_i: jax.Array,  # [B, C] candidate ids sorted by distance asc, -1 pad
    cand_d: jax.Array,  # [B, C] distances to the new node
    cand_vecs: jax.Array,  # [B, C, Dp] candidate vectors (storage dtype)
    cand_aux: jax.Array,  # [B, C]
    *,
    m: int,
    alpha: float,
    space: SpaceType,
    quant: Quantization,
):
    """Batched Vamana-style robust prune: greedily keep candidates, dropping
    any candidate c for which an already-kept s satisfies
    alpha * d(s, c) <= d(u, c). Returns ([B, m] ids, [B, m] dists), -1/inf
    padded."""
    b, c, _ = cand_vecs.shape

    # pairwise distances among candidates: [B, C, C]
    fv = cand_vecs.astype(jnp.float32)
    if quant is Quantization.I8:
        from vector_store_tpu.ops.quantize import I8_SCALE

        fv = fv / I8_SCALE
    eff = space if quant is not Quantization.B1 else SpaceType.HAMMING
    if eff is SpaceType.EUCLIDEAN:
        sq = jnp.sum(fv * fv, axis=-1)
        dots = jnp.einsum("bcd,bed->bce", fv, fv, preferred_element_type=jnp.float32)
        pair = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * dots, 0.0)
    elif eff is SpaceType.COSINE:
        dots = jnp.einsum("bcd,bed->bce", fv, fv, preferred_element_type=jnp.float32)
        denom = jnp.maximum(cand_aux[:, :, None] * cand_aux[:, None, :], 1e-30)
        pair = 1.0 - dots / denom
    elif eff is SpaceType.DOT_PRODUCT:
        dots = jnp.einsum("bcd,bed->bce", fv, fv, preferred_element_type=jnp.float32)
        pair = 1.0 - dots
    else:  # HAMMING on unpacked-from-storage bits is approximated by L2^2
        sq = jnp.sum(fv * fv, axis=-1)
        dots = jnp.einsum("bcd,bed->bce", fv, fv, preferred_element_type=jnp.float32)
        pair = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * dots, 0.0)

    valid_c = cand_i >= 0

    def body(i, state):
        selected, n_sel = state
        # candidate i survives if no selected s dominates it
        dom = jnp.any(
            selected & (alpha * pair[:, i, :] <= cand_d[:, i][:, None]), axis=1
        )
        keep = valid_c[:, i] & ~dom & (n_sel < m)
        selected = selected.at[:, i].set(keep)
        return selected, n_sel + keep.astype(jnp.int32)

    selected, _ = jax.lax.fori_loop(
        0,
        c,
        body,
        (jnp.zeros((b, c), dtype=jnp.bool_), jnp.zeros((b,), dtype=jnp.int32)),
    )

    # compact: selected candidates (they are distance-ascending) into [B, m]
    sel_d = jnp.where(selected, cand_d, jnp.inf)
    out_d, pos = jax.lax.top_k(-sel_d, m)
    out_i = jnp.take_along_axis(cand_i, pos, axis=1)
    out_d = -out_d
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    return out_i, out_d


# --- device-chained bulk build -------------------------------------------------
#
# The host bulk_build round-trips every pass through the host (pull kNN ids,
# push candidate lists, pull pruned rows, pull/push the reverse pass); at 1M
# nodes that is gigabytes over the host link. The device-chained path keeps
# every intermediate in HBM: raw rank/id results feed the alpha-prune in one
# jitted program per chunk, and reverse-edge repair is ONE jitted program
# over the whole graph (edge list -> lexicographic sort -> per-target
# incoming ranks -> dedup -> blocked alpha-reprune -> forced back-links).
# This is the CAGRA construction shape on TPU: exact kNN + prune + reverse,
# all device-resident. Reference: usearch.rs insertion-order HNSW builds the
# same navigable structure one node at a time on CPU threads.


def _ava_u32(x: jax.Array) -> jax.Array:
    """lowbias32 avalanche (deterministic in-jit pseudo-randomness)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


@functools.partial(
    jax.jit,
    static_argnames=("kind", "space", "quant", "m", "alpha", "k", "r_rand", "m_bridge"),
)
def _bulk_prune_chunk(
    packed,  # [2|3, b_pad, k_pad] raw search output (pallas rank / xla dist)
    lo,  # scalar i32: chunk slots are lo + iota (contiguous bulk block)
    base,  # scalar i32: first slot of the whole bulk block
    n_rows,  # scalar i32: total rows in the bulk block (random-bridge range)
    q2b,  # [b_pad] f32 |q|^2 per query row (euclid rank conversion; unused else)
    vectors,
    aux,
    *,
    kind: str,
    space: SpaceType,
    quant: Quantization,
    m: int,
    alpha: float,
    k: int,
    r_rand: int,
    m_bridge: int = 0,
):
    """Raw chunk results -> ([b_pad, m + m_bridge] edge ids, dists), pruned
    on device: the first ``m`` columns are alpha-pruned exact-kNN near
    edges, the last ``m_bridge`` columns are hash-random NSW bridges pruned
    only against EACH OTHER.

    Bridges get their own protected region because on clustered data every
    one of the k nearest neighbors is intra-cluster, and a pure-kNN graph
    fragments into cluster islands (measured: 16.5k of 131k nodes reachable
    from the entry set; recall 0.18). Letting bridges merely COMPETE in one
    alpha prune only works while the kNN shell is wide enough to
    self-dominate: at ~2k rows/cluster nothing dominates, the near
    candidates fill every slot, and zero bridges survive (graph-at-1M
    recall 0.087). The quota makes island re-connection structural."""
    from vector_store_tpu.ops.pallas_scan import INVALID_CUTOFF

    ids = jax.lax.bitcast_convert_type(packed[1][:, :k], jnp.int32)
    if kind == "pallas":
        rank = packed[0][:, :k]
        if space is SpaceType.EUCLIDEAN:
            dist = jnp.maximum(rank + q2b[:, None], 0.0)
        elif space is SpaceType.COSINE:
            dist = jnp.clip(1.0 + rank, 0.0, 2.0)
        else:
            dist = 1.0 + rank
        dist = jnp.where(rank < INVALID_CUTOFF, dist, jnp.inf)
    else:  # xla packed: row 0 is already the true distance
        dist = packed[0][:, :k]
    b = ids.shape[0]
    slots = lo + jnp.arange(b, dtype=jnp.int32)
    bad = (ids == slots[:, None]) | (ids < 0) | ~jnp.isfinite(dist)
    dist = jnp.where(bad, jnp.inf, dist)
    ids = jnp.where(bad, -1, ids)

    dist, ids = jax.lax.sort((dist, ids), num_keys=1, dimension=1)
    safe = jnp.maximum(ids, 0)
    near_i, near_d = _alpha_prune(
        ids, dist, vectors[safe], aux[safe], m=m, alpha=alpha, space=space, quant=quant
    )
    if r_rand <= 0 or m_bridge <= 0:
        return near_i, near_d

    rseed = _ava_u32(
        slots[:, None] * jnp.uint32(r_rand)
        + jnp.arange(r_rand, dtype=jnp.uint32)[None, :]
    )
    rand = base + (
        rseed % jnp.maximum(n_rows.astype(jnp.uint32), 1)
    ).astype(jnp.int32)
    qv = vectors[jnp.minimum(slots, vectors.shape[0] - 1)].astype(
        jnp.float32
    )
    rv = vectors[rand].astype(jnp.float32)  # [b, R, Dp]
    dots = jnp.einsum(
        "bd,brd->br", qv, rv, preferred_element_type=jnp.float32
    )
    if space is SpaceType.EUCLIDEAN:
        rd = jnp.maximum(
            (qv * qv).sum(-1)[:, None] + (rv * rv).sum(-1) - 2.0 * dots,
            0.0,
        )
    else:  # cosine (normalized storage) / dot
        rd = 1.0 - dots
    rd = jnp.where(rand == slots[:, None], jnp.inf, rd)
    # bridges compete only with each other (alpha keeps them in distinct
    # clusters); nearest-first order so the kept set biases mildly local
    rd, rand = jax.lax.sort((rd, rand), num_keys=1, dimension=1)
    rsafe = jnp.maximum(rand, 0)
    br_i, br_d = _alpha_prune(
        rand,
        rd,
        vectors[rsafe],
        aux[rsafe],
        m=m_bridge,
        alpha=alpha,
        space=space,
        quant=quant,
    )
    # a random draw can collide with a kept near edge; rows must stay
    # duplicate-free (the beam dedup logic and the forced-back-link guard
    # both assume it)
    dup = jnp.any(br_i[:, :, None] == near_i[:, None, :], axis=-1)
    br_i = jnp.where(dup, -1, br_i)
    br_d = jnp.where(dup, jnp.inf, br_d)
    return (
        jnp.concatenate([near_i, br_i], axis=1),
        jnp.concatenate([near_d, br_d], axis=1),
    )


def _segment_rank(keys: jax.Array) -> jax.Array:
    """Position of each element within its run of equal keys (keys sorted)."""
    idx = jnp.arange(keys.shape[0], dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), keys[1:] != keys[:-1]]
    )
    starts = jax.lax.cummax(jnp.where(first, idx, 0))
    return idx - starts


@functools.partial(
    jax.jit,
    static_argnames=("space", "quant", "m", "r", "alpha", "max_forced", "row_block"),
)
def _bulk_reverse(
    adjacency,  # [cap, m] i32 forward edges of every live node (-1 pads)
    vectors,
    aux,
    live,  # [cap] bool
    *,
    space: SpaceType,
    quant: Quantization,
    m: int,
    r: int,
    alpha: float,
    max_forced: int,
    row_block: int,
):
    """One whole-graph reverse-edge pass on device. For every target of a
    forward edge: merge its current edges with up to ``r`` nearest incoming
    back-links, dedup, alpha-reprune to degree ``m``, then force each new
    node into the tail of its nearest neighbor's row (in-degree floor, at
    most ``max_forced`` per target) so outliers stay reachable."""
    cap = adjacency.shape[0]
    nb = cap // row_block
    dp = vectors.shape[1]

    # edge distances d(i, adjacency[i, j]) — blocked gather to bound HBM
    def _edge_blk(i):
        lo = i * row_block
        rows = jax.lax.dynamic_slice(adjacency, (lo, 0), (row_block, m))
        srcv = jax.lax.dynamic_slice(vectors, (lo, 0), (row_block, dp))
        sauxb = jax.lax.dynamic_slice(aux, (lo,), (row_block,))
        safe = jnp.maximum(rows, 0)
        d = query_block_distance(
            srcv, vectors[safe], space, quant, sauxb, aux[safe]
        )
        return jnp.where(rows >= 0, d, jnp.inf)

    edge_d = jax.lax.map(_edge_blk, jnp.arange(nb, dtype=jnp.int32))
    edge_d = edge_d.reshape(cap, m)

    src = jax.lax.broadcasted_iota(jnp.int32, (cap, m), 0).reshape(-1)
    tgt = adjacency.reshape(-1)
    dist = edge_d.reshape(-1)
    ok = (tgt >= 0) & live[jnp.maximum(src, 0)] & jnp.isfinite(dist)
    tgt_s = jnp.where(ok, tgt, cap)  # invalid edges sort to the end
    dist_s = jnp.where(ok, dist, jnp.inf)
    tgt_s, dist_s, src_s = jax.lax.sort((tgt_s, dist_s, src), num_keys=2)
    pos = _segment_rank(tgt_s)
    keep = (pos < r) & (tgt_s < cap)
    wt = jnp.where(keep, tgt_s, cap)
    wp = jnp.where(keep, pos, 0)
    inc_i = (
        jnp.full((cap, r), -1, jnp.int32).at[wt, wp].set(src_s, mode="drop")
    )
    inc_d = (
        jnp.full((cap, r), jnp.inf, jnp.float32)
        .at[wt, wp]
        .set(dist_s, mode="drop")
    )
    touched = jnp.zeros((cap,), jnp.bool_).at[wt].set(True, mode="drop")

    # candidate sets per target: current edges + incoming, dedup by id
    all_i = jnp.concatenate([adjacency, inc_i], axis=1)
    all_d = jnp.concatenate(
        [jnp.where(adjacency >= 0, edge_d, jnp.inf), inc_d], axis=1
    )
    si, sd = jax.lax.sort((all_i, all_d), num_keys=2, dimension=1)
    dup = jnp.concatenate(
        [
            jnp.zeros((cap, 1), jnp.bool_),
            (si[:, 1:] == si[:, :-1]) & (si[:, 1:] >= 0),
        ],
        axis=1,
    )
    sd = jnp.where(dup | (si < 0), jnp.inf, sd)
    sd, si = jax.lax.sort((sd, si), num_keys=1, dimension=1)
    si = jnp.where(jnp.isfinite(sd), si, -1)

    def _prune_blk(i):
        lo = i * row_block
        ci = jax.lax.dynamic_slice(si, (lo, 0), (row_block, m + r))
        cd = jax.lax.dynamic_slice(sd, (lo, 0), (row_block, m + r))
        safe = jnp.maximum(ci, 0)
        oi, _ = _alpha_prune(
            ci, cd, vectors[safe], aux[safe], m=m, alpha=alpha,
            space=space, quant=quant,
        )
        return oi

    new_rows = jax.lax.map(_prune_blk, jnp.arange(nb, dtype=jnp.int32))
    new_rows = new_rows.reshape(cap, m)

    # in-degree floor: force node u into the tail of its top-1 target's row,
    # nearest-first, at most max_forced per target
    top_v = adjacency[:, 0]
    d0 = edge_d[:, 0]
    u_ok = live & (top_v >= 0) & jnp.isfinite(d0)
    tv = jnp.where(u_ok, top_v, cap)
    d0_s = jnp.where(u_ok, d0, jnp.inf)
    tv, d0_s, us = jax.lax.sort(
        (tv, d0_s, jnp.arange(cap, dtype=jnp.int32)), num_keys=2
    )
    fpos = _segment_rank(tv)
    f_ok = (fpos < max_forced) & (tv < cap)
    # skip nodes already kept as an edge of their target (the reverse merge
    # usually keeps the back-link) — forcing a duplicate would evict a
    # long-range diversity edge from the tail
    trows = new_rows[jnp.where(f_ok, tv, 0)]
    f_ok &= ~jnp.any(trows == us[:, None], axis=1)
    wt2 = jnp.where(f_ok, tv, cap)  # cap row is dropped by mode="drop"
    wc2 = m - 1 - jnp.where(f_ok, fpos, 0)
    new_rows = new_rows.at[wt2, wc2].set(us, mode="drop")

    return jnp.where(touched[:, None], new_rows, adjacency)


class GraphDeviceIndex:
    """Navigable-graph ANN index over a FlatDeviceIndex's storage, plus an
    exact delta buffer for not-yet-merged streaming inserts."""

    def __init__(
        self,
        dimensions: int,
        space_type: SpaceType = SpaceType.COSINE,
        quantization: Quantization = Quantization.F32,
        connectivity: int = 16,
        expansion_add: int = 128,
        expansion_search: int = 64,
        initial_capacity: int = 8192,
        reserve_increment: int = GLOBAL_RESERVE_INCREMENT,
        n_entries: int = DEFAULT_ENTRIES,
        alpha: float = 1.2,
        max_delta: int = 65536,
        device: jax.Device | None = None,
        oversample: int | None = None,
        rescoring: bool = True,
        preview_dims: int | None = None,
    ) -> None:
        # oversampling/rescoring index options (reference validator
        # quantization_and_rescoring.rs): with a lossy storage quantization
        # the beam returns k*oversample candidates ranked at storage
        # precision and the ids-only host resolution re-ranks them with
        # exact f32 distances; rescoring=False keeps storage-precision
        # order end to end (and disables the oversampled fetch)
        if not rescoring:
            oversample = 1
        elif oversample is None:
            oversample = (
                4 if quantization in (Quantization.I8, Quantization.B1) else 1
            )
        self.oversample = max(1, int(oversample))
        self.rescoring = rescoring
        self.store = FlatDeviceIndex(
            dimensions,
            space_type=space_type,
            quantization=quantization,
            initial_capacity=initial_capacity,
            reserve_increment=reserve_increment,
            device=device,
            rescoring=rescoring,
        )
        # exact-rescore host mirror: on backends where the store's ids-only
        # mirror is off (no pallas), the beam's device distances are storage
        # precision — the rescoring contract still requires an exact f32
        # re-rank of lossy-quantized candidates, so the graph keeps its own
        # f32 rows (same memory the flat mirror would have used)
        self._rescore_host: np.ndarray | None = None
        if (
            self.rescoring
            and quantization in (Quantization.I8, Quantization.B1)
            and self.store._vecs_host is None
        ):
            self._rescore_host = np.zeros(
                (self.store.capacity, dimensions), dtype=np.float32
            )
        self.space_type = space_type
        self.quantization = quantization
        self.dimensions = dimensions
        self.connectivity = connectivity
        self.degree = 2 * connectivity  # like HNSW level-0 (2*M)
        # Protected long-range region: the LAST bridge_q columns of every
        # adjacency row hold hash-random NSW bridges that near-neighbor
        # pruning may never evict. Rationale (measured, scripts/graph_diag.py):
        # at ~2k rows/cluster the exact-kNN candidates sit in a thin
        # intra-cluster shell where the alpha rule dominates nothing, so the
        # nearest `degree` candidates fill every slot and ZERO random bridges
        # survive -> cluster islands (graph-at-1M recall collapsed to 0.087
        # while the same build at ~256 rows/cluster measured 0.985). A quota
        # makes cross-cluster navigability structural instead of hoping the
        # alpha rule leaves tail slots free.
        self.bridge_q = max(2, self.degree // 8)
        self.near_deg = self.degree - self.bridge_q
        # expansions per lockstep round (see _graph_beam_search: shortens
        # the serialized gather chain at identical bytes gathered)
        self.beam_expand = 4
        # optional cap on lockstep rounds; None = ef rounds (safe default).
        # With expand=4 the frontier usually converges in far fewer rounds
        # than ef, and each round is a serialized expand*degree-row gather —
        # the engine's dominant serving cost.
        self.search_iters: int | None = None
        self.expansion_add = expansion_add
        self.expansion_search = expansion_search
        self.alpha = alpha
        self.n_entries = n_entries
        self.max_delta = max_delta

        # preview-guided traversal (VERDICT r4 #5 lever): >0 enables the
        # 1-gather-per-round kernel with PD-dim JL previews of every node's
        # neighbors riding its adjacency record. Float storages only (i8/b1
        # previews would need the aux scale folded in).
        self.preview_dims = preview_dims if preview_dims is not None else int(
            os.environ.get("VECTOR_STORE_GRAPH_PREVIEW", "0") or 0
        )
        if self.quantization in (Quantization.I8, Quantization.B1):
            self.preview_dims = 0
        self._nbr_prev: jax.Array | None = None
        self._prev_R: jax.Array | None = None

        cap = self.store.capacity
        with jax.default_device(self.store.device):
            self.adjacency = jnp.full((cap, self.degree), -1, dtype=jnp.int32)

        self._entries: list[int] = []  # host-side entry point slots
        self._entries_seen = 0  # reservoir-sampling counter
        self._rng = np.random.default_rng(0xC0FFEE)
        self._graph_nodes = 0
        self._graph_slots: list[int] = []  # all merged slots (for random edges)
        self._members = np.zeros(cap, dtype=bool)  # merged-node mask
        self._refine_cursor: int | None = None  # in-progress refinement pass
        self._last_refined_nodes = 0
        # delta buffer: host staging (numpy); searched exactly via the store's
        # flat path restricted to an allow-mask over delta slots
        self._delta_slots: list[int] = []
        self._delta_set: set[int] = set()

    # -- basic properties ----------------------------------------------------

    @property
    def adjacency(self) -> jax.Array:
        return self._adjacency_arr

    @adjacency.setter
    def adjacency(self, v: jax.Array) -> None:
        # every adjacency write invalidates the preview table (rebuilt
        # lazily, whole, on next preview-guided search)
        self._adjacency_arr = v
        self._prev_dirty = True

    def _ensure_previews(self) -> None:
        if self._nbr_prev is not None and not self._prev_dirty:
            return
        pd = self.preview_dims
        dp = int(self.store.vectors.shape[1])
        if self._prev_R is None or self._prev_R.shape != (dp, pd):
            rng = np.random.default_rng(0x9E3779B9)
            # orthonormal random subspace (QR of a gaussian) over the
            # ACTIVE dims only — storage rows are zero-padded to dp, and a
            # subspace drawn over all dp coordinates would waste most of
            # its rank on the padding. A plain gaussian JL matrix also
            # distorts distances even at full rank (singular-value
            # spread); Q is an exact isometry at pd == dimensions and the
            # minimum-distortion projection below it.
            d_act = min(self.dimensions, dp)
            q, _ = np.linalg.qr(
                rng.normal(size=(d_act, max(min(pd, d_act), 1)))
            )
            r = np.zeros((dp, pd), dtype=np.float32)
            r[:d_act, : q.shape[1]] = q[:, :pd]
            self._prev_R = jnp.asarray(r, dtype=jnp.bfloat16)
        self._nbr_prev = _build_previews(
            self.store.vectors, self._adjacency_arr, self._prev_R
        )
        self._prev_dirty = False

    @property
    def size(self) -> int:
        return self.store.size

    @property
    def capacity(self) -> int:
        return self.store.capacity

    @property
    def delta_count(self) -> int:
        return len(self._delta_slots)

    @property
    def device_bytes(self) -> int:
        """HBM footprint: the vector store plus the adjacency matrix."""
        return self.store.device_bytes + self.adjacency.shape[0] * self.degree * 4

    @property
    def graph_nodes(self) -> int:
        return self._graph_nodes

    _ENTRY_BUCKETS = (32, 128, 512, 2048, 4096)

    def _entry_target(self) -> int:
        """Entry-set size, scaled with the graph (~2*sqrt(N), bucketed so the
        jitted search program compiles once per bucket). On clustered data
        with C clusters, navigation toward an unseeded cluster has no
        distance gradient (inter-cluster distances concentrate), so coverage
        must come from the entry set itself: E entries seed a query's cluster
        with p ~= 1-(1-1/C)^E. This is the lockstep equivalent of HNSW's
        upper layers (usearch.rs descends ~N/M upper-layer nodes; here the
        descent is one [B, E] distance block on the MXU)."""
        want = int(2.0 * np.sqrt(max(self._graph_nodes, 1)))
        want = max(self.n_entries, min(want, self._ENTRY_BUCKETS[-1]))
        for b in self._ENTRY_BUCKETS:
            if want <= b:
                return b
        return self._ENTRY_BUCKETS[-1]

    def _note_entries(self, batch) -> None:
        """Reservoir-maintain the entry set over all merged nodes: the oldest
        half stays pinned (old nodes acquire dense in-link sets and anchor
        small graphs), the younger half is a uniform sample of the rest."""
        target = self._entry_target()
        half = target // 2
        for s in batch:
            self._entries_seen += 1
            if len(self._entries) < target:
                self._entries.append(int(s))
            else:
                j = int(self._rng.integers(0, self._entries_seen))
                if half <= j < target:
                    self._entries[j] = int(s)

    def _entries_array(self) -> jnp.ndarray:
        n = len(self._entries)
        pad = next((b for b in self._ENTRY_BUCKETS if n <= b), n)
        e = np.full((pad,), -1, dtype=np.int32)
        if n:
            e[:n] = self._entries[:n]
        return jnp.asarray(e)

    # -- mutation ------------------------------------------------------------

    def upsert_batch(
        self,
        slots: np.ndarray,
        epochs: np.ndarray,
        vectors: np.ndarray,
        partitions: np.ndarray | None = None,
    ) -> None:
        """Store vectors and stage them in the delta buffer. They are
        searchable immediately (exact) and get merged into the graph by
        `merge_delta` (called by the owner between query batches)."""
        slots = np.asarray(slots, dtype=np.int64)
        if slots.size == 0:
            return
        self.store.upsert_batch(slots, epochs, vectors, partitions)
        self._mirror_rows(slots, np.asarray(vectors, dtype=np.float32))
        for s in slots.tolist():
            if s not in self._delta_set:
                self._delta_set.add(s)
                self._delta_slots.append(s)

    def _mirror_rows(self, slots: np.ndarray, vectors: np.ndarray) -> None:
        if self._rescore_host is None:
            return
        top = int(np.max(slots)) + 1
        if top > self._rescore_host.shape[0]:
            grown = np.zeros(
                (max(top, self.store.capacity), self.dimensions), np.float32
            )
            grown[: self._rescore_host.shape[0]] = self._rescore_host
            self._rescore_host = grown
        rows = vectors[:, : self.dimensions]
        if (
            self.space_type is SpaceType.COSINE
            and self.quantization is not Quantization.B1
        ):
            # same storage rule as the flat mirror: unit rows for cosine
            rows = rows / np.maximum(
                np.linalg.norm(rows, axis=-1, keepdims=True), 1e-30
            )
        self._rescore_host[np.asarray(slots, dtype=np.int64)] = rows

    def upsert_bulk_device(
        self,
        lo: int,
        hi: int,
        rows_dev: jax.Array,
        rows_host: np.ndarray,
        partitions: np.ndarray | None = None,
        epoch: int = 0,
    ) -> None:
        """Bulk-loader fast path (see FlatDeviceIndex.upsert_bulk_device):
        contiguous fresh slots whose payload is already device-resident.
        Staged in the delta like any upsert; drain with maintain() or
        bulk_build_device()."""
        n = int(hi) - int(lo)
        if n <= 0:
            return
        self.store.upsert_bulk_device(
            lo, hi, rows_dev, rows_host, partitions=partitions, epoch=epoch
        )
        self._mirror_rows(
            np.arange(lo, hi), np.asarray(rows_host, dtype=np.float32)
        )
        self._sync_capacity()
        fresh = [s for s in range(lo, hi) if s not in self._delta_set]
        self._delta_slots.extend(fresh)
        self._delta_set.update(fresh)

    def remove_batch(self, slots: np.ndarray) -> None:
        """Tombstone: mask from results; graph edges stay navigable."""
        self.store.remove_batch(slots)
        removed = set(np.asarray(slots, dtype=np.int64).tolist())
        if removed & self._delta_set:
            self._delta_slots = [s for s in self._delta_slots if s not in removed]
            self._delta_set -= removed

    def needs_merge(self) -> bool:
        return len(self._delta_slots) >= self.max_delta

    def maintain(self, max_batch: int = 4096) -> bool:
        """One unit of background maintenance; returns True when work was
        done. Priority: drain the delta buffer, then (after the graph grew
        >=25% since the last pass) run one incremental refinement step.
        The owner calls this between query batches."""
        if self._delta_slots:
            self.merge_delta(max_batch)
            return True
        if self._refine_cursor is not None:
            self.refine_step(max_batch)
            return True
        if (
            self._graph_nodes >= 4096
            and self._graph_nodes >= int(self._last_refined_nodes * 1.25)
        ):
            self._refine_cursor = 0
            return True
        return False

    def refine_step(self, max_batch: int = 4096) -> int:
        """Process one slice of an in-progress refinement pass."""
        if self._refine_cursor is None:
            self._refine_cursor = 0
        slots_all = self._graph_slots
        if self._refine_cursor >= len(slots_all):
            self._refine_cursor = None
            self._last_refined_nodes = self._graph_nodes
            return 0
        batch = np.asarray(
            slots_all[self._refine_cursor : self._refine_cursor + max_batch],
            dtype=np.int64,
        )
        self._refine_cursor += len(batch)
        store = self.store
        vec = np.array(store.vectors[jnp.asarray(batch)])
        aux = np.array(store.aux[jnp.asarray(batch)])
        self._insert_into_graph(batch, vec, aux, include_current=True)
        return len(batch)

    def refine(self, max_batch: int = 4096, rounds: int = 1) -> None:
        """Graph quality refinement: re-search the graph for every node's
        own vector and re-prune its neighborhood from (current edges ∪
        fresh beam candidates). Incremental builds only see candidates that
        existed at insert time; a refinement round lets early nodes link to
        later arrivals (the quality step CAGRA gets from its global kNN
        construction). Run between query batches / in background."""
        for _ in range(rounds):
            slots_all = np.asarray(self._graph_slots, dtype=np.int64)
            store = self.store
            for lo in range(0, len(slots_all), max_batch):
                batch = slots_all[lo : lo + max_batch]
                vec = np.array(store.vectors[jnp.asarray(batch)])
                aux = np.array(store.aux[jnp.asarray(batch)])
                # reuse the insert path: candidates from a fresh beam search
                # + current edges, alpha-pruned, reverse edges repaired
                self._insert_into_graph(batch, vec, aux, include_current=True)

    def compact(self) -> int:
        """Rebuild the graph without tombstoned nodes. Tombstones stay
        traversable after remove_batch (cheap deletes); once they accumulate
        they waste beam steps, so the owner can run this in the background.
        Returns the number of live nodes re-linked.

        The reference never compacts (indexes are rebuilt from the DB on
        restart); this is the TPU-native longevity path for long-running
        streaming indexes.
        """
        live = [s for s in self._graph_slots if self.store._valid_host[s]]
        cap = self.store.capacity
        self.adjacency = jnp.full((cap, self.degree), -1, dtype=jnp.int32)
        self._entries = []
        self._entries_seen = 0
        self._graph_nodes = 0
        self._graph_slots = []
        self._members[:] = False
        self._refine_cursor = None
        self._last_refined_nodes = 0
        # re-stage live nodes (delta order preserved for determinism)
        pending = set(self._delta_slots)
        for s in live:
            if s not in pending and s not in self._delta_set:
                self._delta_slots.append(s)
                self._delta_set.add(s)
        while self.merge_delta(max_batch=4096):
            pass
        return len(live)

    # -- delta merge (graph construction) -----------------------------------

    BULK_BUILD_THRESHOLD = 65536  # empty graph + this many pending -> bulk

    @hotpath.measure
    def bulk_build(self, efc: int | None = None) -> int:
        """Build the graph for ALL pending delta vectors in three global
        passes instead of per-batch incremental merges:

        1. exact kNN for every node via the store's fused MXU scan
           (compute-bound: ~7 ms per 2048 queries at 1M),
        2. batched on-device alpha-prune of every neighborhood,
        3. ONE global vectorized reverse-edge pass.

        Incremental merges pay a reverse-edge repair per batch (~20 s per
        8192 at 100k nodes, dominated by touched-target re-prunes); the
        bulk path pays it once. This is the CAGRA construction shape:
        exact kNN graph + prune, which both builds faster AND yields better
        candidates than insertion-order beam searches. Use at bootstrap;
        steady-state streaming uses merge_delta.
        """
        if not self._delta_slots:
            return 0
        self._sync_capacity()
        slots = np.asarray(self._delta_slots, dtype=np.int64)
        n = len(slots)
        store = self.store
        # kNN candidates capped for pull volume: [N, k'] id+dist pulls are
        # the relay bottleneck; alpha-prune keeps <= degree edges anyway
        efc = efc or min(self.expansion_add, 63)
        mask = np.zeros(store.capacity, dtype=bool)
        mask[slots] = True

        slots_j = jnp.asarray(slots)
        host_vec, host_aux = jax.device_get(
            (store.vectors[slots_j], store.aux[slots_j])
        )
        queries = self._dequant(np.asarray(host_vec))

        # pass 1: exact kNN among all nodes being built (+1 for self-hit)
        step = 2048
        pendings = []
        for lo in range(0, n, step):
            pendings.append(
                (lo, store.search_begin(queries[lo : lo + step], efc + 1, allow_mask=mask))
            )
        cand_i = np.full((n, efc + 1), -1, dtype=np.int64)
        cand_d = np.full((n, efc + 1), np.inf, dtype=np.float32)
        group = 16  # batches per aggregated pull
        for glo in range(0, len(pendings), group):
            batch = pendings[glo : glo + group]
            for (lo, _), results in zip(
                batch, store.collect_many([p for _, p in batch])
            ):
                for r, res in enumerate(results):
                    m = min(len(res.slots), efc + 1)
                    cand_i[lo + r, :m] = res.slots[:m]
                    cand_d[lo + r, :m] = res.distances[:m]
        # strip self-hits
        self_mask = cand_i == slots[:, None]
        cand_d[self_mask] = np.inf
        cand_i[self_mask] = -1

        # random long-range bridges into the protected tail region (same
        # rationale as the device path: pure-kNN graphs fragment into
        # cluster islands on clustered data, and at high per-cluster density
        # bridges that merely COMPETE in the alpha prune never survive —
        # see _bulk_prune_chunk)
        bridge_i = np.full((n, self.bridge_q), -1, dtype=np.int32)
        bridge_d = np.full((n, self.bridge_q), np.inf, dtype=np.float32)
        if self.quantization is not Quantization.B1 and n > 1:
            r_rand = 8
            rng_pos = (
                np.random.default_rng(0xB41D6E).integers(
                    0, n, size=(n, r_rand)
                )
            )
            rand_ids = slots[rng_pos]
            rd = np.empty((n, r_rand), dtype=np.float32)
            for blo in range(0, n, 65536):  # bound the [*, r, Dp] temps
                bhi = min(blo + 65536, n)
                qb = queries[blo:bhi]
                rb = queries[rng_pos[blo:bhi]]
                if self.space_type is SpaceType.EUCLIDEAN:
                    rd[blo:bhi] = ((qb[:, None, :] - rb) ** 2).sum(-1)
                else:
                    rd[blo:bhi] = 1.0 - np.einsum("nd,nrd->nr", qb, rb)
            rd = np.where(rand_ids == slots[:, None], np.inf, rd)
            # dedup repeated draws per row, nearest-first
            order = np.argsort(rd, axis=1, kind="stable")
            rand_ids = np.take_along_axis(rand_ids, order, axis=1)
            rd = np.take_along_axis(rd, order, axis=1)
            dup = np.zeros_like(rd, dtype=bool)
            dup[:, 1:] = rand_ids[:, 1:] == rand_ids[:, :-1]
            rd[dup] = np.inf
            order = np.argsort(rd, axis=1, kind="stable")
            rand_ids = np.take_along_axis(rand_ids, order, axis=1)
            rd = np.take_along_axis(rd, order, axis=1)
            bridge_i[:] = rand_ids[:, : self.bridge_q]
            bridge_d[:] = rd[:, : self.bridge_q]
            bridge_i[~np.isfinite(bridge_d)] = -1

        order = np.argsort(cand_d, axis=1, kind="stable")
        cand_i = np.take_along_axis(cand_i, order, axis=1)[:, : efc + 8]
        cand_d = np.take_along_axis(cand_d, order, axis=1)[:, : efc + 8]
        cand_i[~np.isfinite(cand_d)] = -1

        # pass 2: alpha-prune every neighborhood on device, batched pulls
        sel_i = np.empty((n, self.degree), dtype=np.int32)
        sel_d = np.empty((n, self.degree), dtype=np.float32)
        sel_i[:, self.near_deg :] = bridge_i
        sel_d[:, self.near_deg :] = bridge_d
        out_devs = []
        for lo in range(0, n, 8192):
            hi = min(lo + 8192, n)
            n_real = hi - lo
            n_pad = _bucket(n_real, _BATCH_BUCKETS)
            cw = cand_i.shape[1]  # efc + bridge candidates
            ci = np.full((n_pad, cw), -1, dtype=np.int64)
            cd = np.full((n_pad, cw), np.inf, dtype=np.float32)
            ci[:n_real] = cand_i[lo:hi]
            cd[:n_real] = cand_d[lo:hi]
            ci_j = jnp.asarray(ci.astype(np.int32))
            csafe = jnp.maximum(ci_j, 0)
            oi, od = _alpha_prune(
                ci_j,
                jnp.asarray(cd),
                store.vectors[csafe],
                store.aux[csafe],
                m=self.near_deg,
                alpha=self.alpha,
                space=self.space_type,
                quant=self.quantization,
            )
            out_devs.append((lo, hi, oi, od))
        hosts = jax.device_get(
            [x for _, _, oi, od in out_devs for x in (oi, od)]
        )
        for idx, (lo, hi, _, _) in enumerate(out_devs):
            sel_i[lo:hi, : self.near_deg] = hosts[2 * idx][: hi - lo]
            sel_d[lo:hi, : self.near_deg] = hosts[2 * idx + 1][: hi - lo]

        self.adjacency = _scatter_rows(
            self.adjacency, slots_j, jnp.asarray(sel_i)
        )
        # graph bookkeeping must precede the reverse pass (it reads members)
        self._delta_slots = []
        self._delta_set = set()
        self._graph_nodes += n
        self._graph_slots.extend(int(s) for s in slots)
        self._members[slots] = True
        self._note_entries(slots)

        # pass 3: one global reverse-edge pass
        self._apply_reverse_edges(slots, sel_i, sel_d)
        return n

    def bulk_build_device(self, efc: int | None = None, chunk: int = 2048) -> int:
        """Device-chained bulk build: the three bulk_build passes with every
        intermediate kept in HBM (kNN raw results -> alpha-prune per chunk,
        then ONE whole-graph jitted reverse pass — _bulk_reverse). Host
        traffic is a few scalars per chunk. From-empty contiguous blocks
        only; anything else falls back to the host-pass bulk_build."""
        if not self._delta_slots:
            return 0
        slots = np.asarray(sorted(self._delta_slots), dtype=np.int64)
        n = len(slots)
        lo0 = int(slots[0])
        if self._graph_nodes != 0 or not np.array_equal(
            slots, np.arange(lo0, lo0 + n)
        ):
            return self.bulk_build(efc)
        self._sync_capacity()
        store = self.store
        cap = store.capacity
        efc = efc or min(self.expansion_add, 63)
        k = efc + 1  # +1 for the self-hit

        sel_parts = []
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            b_real = hi - lo
            b_pad = _bucket(b_real, _BATCH_BUCKETS)
            # device-resident queries: the stored rows themselves (rows past
            # the block are invalid padding — they rank +inf and their
            # results are sliced away)
            qidx = jnp.clip(
                lo0 + lo + jnp.arange(b_pad, dtype=jnp.int32), 0, cap - 1
            )
            qd = store.vectors[qidx]
            if store._vecs_host is not None:
                hq = store._vecs_host[
                    np.clip(np.arange(lo0 + lo, lo0 + lo + b_pad), 0, cap - 1)
                ]
            else:
                hq = self._dequant(np.asarray(jax.device_get(qd)))[
                    :, : self.dimensions
                ]
            pending = store.search_begin(hq, k, raw=True, queries_dev=qd)
            q2b = (
                jnp.asarray(pending.q2)
                if pending.q2 is not None
                else jnp.zeros((pending.packed.shape[1],), jnp.float32)
            )
            kind = "pallas" if pending.kind == "pallas" else "xla"
            sel_i_c, _ = _bulk_prune_chunk(
                pending.packed,
                jnp.int32(lo0 + lo),
                jnp.int32(lo0),
                jnp.int32(n),
                q2b,
                store.vectors,
                store.aux,
                kind=kind,
                space=self.space_type,
                quant=self.quantization,
                m=self.near_deg,
                alpha=self.alpha,
                k=k,
                r_rand=8,
                m_bridge=self.bridge_q,
            )
            sel_parts.append(sel_i_c[:b_real])
        sel_all = jnp.concatenate(sel_parts, axis=0)  # [n, degree] device

        slots_j = jnp.asarray(slots)
        self.adjacency = _scatter_rows(self.adjacency, slots_j, sel_all)

        rb = next(
            (d for d in (8192, 4096, 2048, 1024, 512, 256, 128, 64) if cap % d == 0),
            cap,
        )
        # reverse pass repairs the NEAR region only; the bridge columns are
        # protected (re-pruning them against dense incoming intra-cluster
        # links would evict exactly the long-range edges that keep islands
        # connected)
        near = _bulk_reverse(
            self.adjacency[:, : self.near_deg],
            store.vectors,
            store.aux,
            store.valid,
            space=self.space_type,
            quant=self.quantization,
            m=self.near_deg,
            r=8,
            alpha=self.alpha,
            max_forced=max(1, self.near_deg // 4),
            row_block=rb,
        )
        self.adjacency = jnp.concatenate(
            [near, self.adjacency[:, self.near_deg :]], axis=1
        )

        # host bookkeeping (same as bulk_build's tail)
        self._delta_slots = []
        self._delta_set = set()
        self._graph_nodes += n
        self._graph_slots.extend(int(s) for s in slots)
        self._members[slots] = True
        self._note_entries(slots)
        return n

    @hotpath.measure
    def merge_delta(self, max_batch: int = 4096) -> int:
        """Wire up to max_batch pending delta vectors into the graph.
        Returns the number merged. Call repeatedly (e.g. between query
        batches) until it returns 0 to drain."""
        if not self._delta_slots:
            return 0
        # empty graph + large backlog: build in global passes instead
        # (device-chained when the block is contiguous-from-empty)
        if (
            self._graph_nodes == 0
            and len(self._delta_slots) >= self.BULK_BUILD_THRESHOLD
        ):
            return self.bulk_build_device()
        # upsert_batch may have grown store capacity past adjacency's row
        # count; JAX silently drops out-of-bounds scatters, which would leave
        # merged nodes edgeless (and unreachable) without an error.
        self._sync_capacity()
        batch = self._delta_slots[:max_batch]
        n = len(batch)
        slots = np.asarray(batch, dtype=np.int64)

        store = self.store
        slots_j = jnp.asarray(slots)
        host_vec, host_aux = jax.device_get(
            (store.vectors[slots_j], store.aux[slots_j])
        )  # [n, Dp] storage dtype + [n] aux, one batched pull

        if self._graph_nodes == 0:
            self._bootstrap(slots, host_vec, host_aux)
        else:
            self._insert_into_graph(slots, host_vec, host_aux)

        self._delta_slots = self._delta_slots[n:]
        self._delta_set -= set(batch)
        self._graph_nodes += n
        self._graph_slots.extend(int(s) for s in batch)
        self._members[slots] = True
        # entry points: the oldest half stays pinned (oldest nodes acquire
        # the densest in-link sets through reverse passes and anchor small
        # graphs), the younger half is a reservoir sample over everything
        # else so entries still spread across clustered distributions
        self._note_entries(batch)
        return n

    def _bootstrap(self, slots: np.ndarray, vecs: np.ndarray, aux: np.ndarray) -> None:
        """First batch: exact kNN graph among the batch itself."""
        n = len(slots)
        qv = jnp.asarray(vecs)
        qa = jnp.asarray(aux)
        d = pairwise_distance(
            qv, qv, self.space_type, self.quantization, qa, qa
        )  # [n, n]
        d = np.array(d)  # writable copy (np.asarray of a jax array is read-only)
        np.fill_diagonal(d, np.inf)
        m = min(self.degree, max(n - 1, 1))
        order = np.argsort(d, axis=1)[:, :m]
        rows = np.full((n, self.degree), -1, dtype=np.int32)
        rows[:, :m] = slots[order]
        if n == 1:
            rows[:] = -1
        self.adjacency = _scatter_rows(self.adjacency, jnp.asarray(slots), jnp.asarray(rows))

    def _dequant(self, storage_vecs: np.ndarray) -> np.ndarray:
        """Storage representation -> f32 query vectors that re-quantize to
        the identical storage rows (so exact-scan candidate distances match
        storage-level distances)."""
        if self.quantization is Quantization.I8:
            from vector_store_tpu.ops.quantize import I8_SCALE

            return storage_vecs.astype(np.float32) / I8_SCALE
        if self.quantization is Quantization.B1:
            from vector_store_tpu.ops.quantize import unpack_b1

            return unpack_b1(
                storage_vecs.view(np.uint8), self.dimensions
            ).astype(np.float32)
        return storage_vecs.astype(np.float32)

    @hotpath.measure
    def _candidate_search(
        self, vecs: np.ndarray, efc: int, n_pad: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Construction candidates: EXACT top-efc among already-merged
        nodes via the store's MXU scan. TPU-first design decision: the
        fused flat scan is MXU-bound (~7 ms per 2048 queries at 1M) while
        lockstep beam-search insertion is HBM-gather-bound (~70 s per 8192
        at 50k nodes, measured) — exact kNN construction is ~100x faster
        here AND yields strictly better candidates (CAGRA builds from
        exact kNN for the same reason). Returns ([n_pad, efc] ids, dists),
        -1/inf padded."""
        store = self.store
        members = self._members[: store.capacity]
        cand_i = np.full((n_pad, efc), -1, dtype=np.int32)
        cand_d = np.full((n_pad, efc), np.inf, dtype=np.float32)
        n_real = len(vecs)
        # chunk queries so the pallas tile VMEM stays bounded
        step = 2048
        pendings = []
        for lo in range(0, n_real, step):
            hi = min(lo + step, n_real)
            pendings.append(
                (lo, store.search_begin(vecs[lo:hi], efc, allow_mask=members))
            )
        for (lo, _), results in zip(
            pendings, store.collect_many([p for _, p in pendings])
        ):
            for r, res in enumerate(results):
                m = min(len(res.slots), efc)
                cand_i[lo + r, :m] = res.slots[:m]
                cand_d[lo + r, :m] = res.distances[:m]
        return cand_i, cand_d

    @hotpath.measure
    def _insert_into_graph(
        self,
        slots: np.ndarray,
        vecs: np.ndarray,
        aux: np.ndarray,
        include_current: bool = False,
    ) -> None:
        self._sync_capacity()
        store = self.store
        efc = self.expansion_add
        # pad the insert batch to a bucket so the jitted search doesn't
        # recompile for every tail-batch size
        n_real = len(slots)
        n_pad = _bucket(n_real, _BATCH_BUCKETS)
        if n_pad != n_real:
            vecs = np.pad(vecs, [(0, n_pad - n_real), (0, 0)])
            aux = np.pad(aux, [(0, n_pad - n_real)])
        # 1. exact MXU-scan candidates among merged nodes (see
        # _candidate_search for why this replaced beam-search insertion)
        cand_i, cand_d = self._candidate_search(
            self._dequant(vecs[:n_real]), efc, n_pad
        )

        if include_current:
            # refinement: the node itself is in the graph — drop self-hits
            # and add its CURRENT near edges as candidates so good old links
            # survive the re-prune; bridge columns are redrawn fresh below
            # (bridges are hash-random by definition, so refresh > preserve)
            padded_slots = np.full((n_pad,), -2, dtype=np.int64)
            padded_slots[: len(slots)] = slots
            self_mask = cand_i == padded_slots[:, None]
            cand_d[self_mask] = np.inf
            cand_i[self_mask] = -1
            cur_rows = np.array(self.adjacency[jnp.asarray(slots)])  # [n_real, deg]
            cur_rows = cur_rows[:, : self.near_deg]
            qv = store.vectors[jnp.asarray(slots)]
            qa = store.aux[jnp.asarray(slots)]
            safe = jnp.maximum(jnp.asarray(cur_rows), 0)
            cur_d = np.array(
                query_block_distance(
                    qv,
                    store.vectors[safe],
                    self.space_type,
                    self.quantization,
                    qa,
                    store.aux[safe],
                )
            )
            cur_d[cur_rows < 0] = np.inf
            ext_i = np.full((n_pad, cur_rows.shape[1]), -1, dtype=cand_i.dtype)
            ext_d = np.full((n_pad, cur_rows.shape[1]), np.inf, dtype=np.float32)
            ext_i[: len(slots)] = cur_rows
            ext_d[: len(slots)] = cur_d
            cand_i = np.concatenate([cand_i, ext_i], axis=1)
            cand_d = np.concatenate([cand_d, ext_d], axis=1)
            order = np.argsort(cand_d, axis=1, kind="stable")
            cand_i = np.take_along_axis(cand_i, order, axis=1)
            cand_d = np.take_along_axis(cand_d, order, axis=1)
            cand_i[~np.isfinite(cand_d)] = -1

        # 1b. intra-batch candidates: batch members are not yet in the graph
        # so the candidate scan cannot find them; add each node's nearest
        # batch peers as extra candidates (keeps clusters inserted together
        # self-connected). Top-k runs ON DEVICE: pulling the full [n, n]
        # distance matrix cost ~270 MB per merge through the relay.
        if n_real > 1 and not include_current:
            kb = min(16, n_real - 1)
            pd, pp = _intra_batch_topk(
                jnp.asarray(vecs[:n_real]),
                jnp.asarray(aux[:n_real]),
                k=kb,
                space=self.space_type,
                quant=self.quantization,
            )
            peer_pos, peer_d = jax.device_get((pp, pd))
            peer_i = slots[peer_pos].astype(np.int32)  # [n_real, kb]
            ext_i = np.full((cand_i.shape[0], kb), -1, dtype=cand_i.dtype)
            ext_d = np.full((cand_i.shape[0], kb), np.inf, dtype=np.float32)
            ext_i[:n_real] = peer_i
            ext_d[:n_real] = peer_d.astype(np.float32)
            cand_i = np.concatenate([cand_i, ext_i], axis=1)
            cand_d = np.concatenate([cand_d, ext_d], axis=1)
            order = np.argsort(cand_d, axis=1, kind="stable")
            cand_i = np.take_along_axis(cand_i, order, axis=1)
            cand_d = np.take_along_axis(cand_d, order, axis=1)
            cand_i[~np.isfinite(cand_d)] = -1

        # 2/3. alpha-prune + assemble rows. Bridges only pay off once the
        # graph is large enough that clusters outnumber entry points; below
        # that, near candidates may use the whole degree (a small graph
        # navigates fine without long links, and the 2 extra near edges are
        # worth more recall than empty columns).
        use_bridges = len(self._graph_slots) >= 4096
        m_near = self.near_deg if use_bridges else self.degree
        ci_j = jnp.asarray(cand_i.astype(np.int32))
        safe = jnp.maximum(ci_j, 0)
        cvecs = store.vectors[safe]
        caux = store.aux[safe]
        sel_near_i, sel_near_d = _alpha_prune(
            ci_j,
            jnp.asarray(cand_d),
            cvecs,
            caux,
            m=m_near,
            alpha=self.alpha,
            space=self.space_type,
            quant=self.quantization,
        )
        sel_near_i, sel_near_d = jax.device_get((sel_near_i, sel_near_d))

        sel_i = np.full((n_real, self.degree), -1, dtype=np.int32)
        sel_d = np.full((n_real, self.degree), np.inf, dtype=np.float32)
        sel_i[:, :m_near] = sel_near_i[:n_real]
        sel_d[:, :m_near] = sel_near_d[:n_real]
        if use_bridges:
            # protected bridge region (see _bulk_prune_chunk: bridges may
            # never compete with near edges); redrawn fresh on refinement
            pool = np.asarray(self._graph_slots, dtype=np.int32)
            rand_edges = pool[
                self._rng.integers(0, pool.size, size=(n_real, self.bridge_q))
            ]
            ok = rand_edges != np.asarray(slots)[:, None]
            tail = sel_i[:, self.near_deg :]
            tail[ok] = rand_edges[ok]
            sel_i[:, self.near_deg :] = tail
            sel_d[:, self.near_deg :][ok] = np.float32(1e30)
        self.adjacency = _scatter_rows(
            self.adjacency, jnp.asarray(slots), jnp.asarray(sel_i)
        )

        # 4. reverse edges, host-side vectorized merge
        self._apply_reverse_edges(slots, sel_i, sel_d)

    @hotpath.measure
    def _apply_reverse_edges(
        self, slots: np.ndarray, sel_i: np.ndarray, sel_d: np.ndarray
    ) -> None:
        n, deg = sel_i.shape
        src = np.repeat(slots.astype(np.int64), deg)
        tgt = sel_i.reshape(-1).astype(np.int64)
        dist = sel_d.reshape(-1)
        ok = tgt >= 0
        src, tgt, dist = src[ok], tgt[ok], dist[ok]
        if tgt.size == 0:
            return

        uniq, inv = np.unique(tgt, return_inverse=True)
        u = uniq.size
        # up to R incoming edges considered per target this round —
        # vectorized grouping (the per-edge python loop cost seconds per
        # merge at deg x 8192 edges)
        r = 8
        order = np.lexsort((dist, inv))  # by target, then distance asc
        inv_sorted = inv[order]
        group_start = np.zeros(u, dtype=np.int64)
        first = np.ones(len(inv_sorted), dtype=bool)
        first[1:] = inv_sorted[1:] != inv_sorted[:-1]
        group_start[inv_sorted[first]] = np.flatnonzero(first)
        pos = np.arange(len(inv_sorted)) - group_start[inv_sorted]
        keep = pos < r
        incoming_i = np.full((u, r), -1, dtype=np.int64)
        incoming_d = np.full((u, r), np.inf, dtype=np.float32)
        incoming_i[inv_sorted[keep], pos[keep]] = src[order][keep]
        incoming_d[inv_sorted[keep], pos[keep]] = dist[order][keep]

        # current rows of the targets + their distances: chunked device
        # rounds (a single gather over ALL touched targets is [U, deg, Dp]
        # — multiple GB of HBM when a global pass touches most of the
        # graph), then one batched pull
        store = self.store
        cur_rows = np.empty((u, self.degree), dtype=np.int32)
        cur_d = np.empty((u, self.degree), dtype=np.float32)
        devs = []
        step = 65536
        for lo in range(0, u, step):
            uniq_j = jnp.asarray(uniq[lo : lo + step])
            rows_dev = self.adjacency[uniq_j]  # [u', deg]
            tvec = store.vectors[uniq_j]
            taux = store.aux[uniq_j]
            safe = jnp.maximum(rows_dev, 0)
            cur_d_dev = query_block_distance(
                tvec,
                store.vectors[safe],
                self.space_type,
                self.quantization,
                taux,
                store.aux[safe],
            )
            devs.append((lo, rows_dev, cur_d_dev))
        hosts = jax.device_get([x for _, r, d in devs for x in (r, d)])
        for idx, (lo, _, _) in enumerate(devs):
            r_h = hosts[2 * idx]
            cur_rows[lo : lo + len(r_h)] = r_h
            cur_d[lo : lo + len(r_h)] = hosts[2 * idx + 1]
        cur_d[cur_rows < 0] = np.inf

        # candidate sets: current NEAR edges + incoming back-links; the
        # bridge tail columns are protected (see _bulk_prune_chunk) and
        # re-attached verbatim after the prune
        all_i = np.concatenate(
            [cur_rows[:, : self.near_deg].astype(np.int64), incoming_i], axis=1
        )
        all_d = np.concatenate([cur_d[:, : self.near_deg], incoming_d], axis=1)
        # dedup (incoming may already be an edge)
        sort_i = np.argsort(all_i, axis=1, kind="stable")
        si = np.take_along_axis(all_i, sort_i, axis=1)
        dup = np.zeros_like(si, dtype=bool)
        dup[:, 1:] = (si[:, 1:] == si[:, :-1]) & (si[:, 1:] >= 0)
        dup_unsorted = np.zeros_like(dup)
        np.put_along_axis(dup_unsorted, sort_i, dup, axis=1)
        all_d[dup_unsorted] = np.inf
        all_d[all_i < 0] = np.inf

        # Re-prune each touched target with the alpha DIVERSITY rule rather
        # than plain nearest-deg: diversity keeps long-range edges, so
        # outlier inserts still receive back-links and stay reachable (pure
        # distance competition would orphan them).
        order = np.argsort(all_d, axis=1, kind="stable")
        si = np.take_along_axis(all_i, order, axis=1)
        sd = np.take_along_axis(all_d, order, axis=1).astype(np.float32)
        si[~np.isfinite(sd)] = -1

        u_total = uniq.size
        chunk = 4096
        new_rows = np.empty((u_total, self.near_deg), dtype=np.int32)
        out_devs = []  # dispatch all chunks, pull once (relay fixed cost)
        for lo in range(0, u_total, chunk):
            hi = min(lo + chunk, u_total)
            n_real = hi - lo
            n_pad = _bucket(n_real, _BATCH_BUCKETS)
            ci = np.full((n_pad, si.shape[1]), -1, dtype=np.int64)
            cd = np.full((n_pad, si.shape[1]), np.inf, dtype=np.float32)
            ci[:n_real] = si[lo:hi]
            cd[:n_real] = sd[lo:hi]
            ci_j = jnp.asarray(ci.astype(np.int32))
            csafe = jnp.maximum(ci_j, 0)
            cvecs = store.vectors[csafe]
            caux = store.aux[csafe]
            out_i, _ = _alpha_prune(
                ci_j,
                jnp.asarray(cd),
                cvecs,
                caux,
                m=self.near_deg,
                alpha=self.alpha,
                space=self.space_type,
                quant=self.quantization,
            )
            out_devs.append((lo, hi, out_i))
        for (lo, hi, host) in (
            (lo, hi, h)
            for (lo, hi, _), h in zip(
                out_devs, jax.device_get([o for _, _, o in out_devs])
            )
        ):
            new_rows[lo:hi] = host[: hi - lo]

        # In-degree guarantee: every inserted node must receive at least one
        # back-link from its nearest graph neighbor, or saturated target
        # lists would orphan outliers (unreachable until a future rebuild).
        # Force each new node into the tail slots of its top-1 target.
        top_v = sel_i[:, 0].astype(np.int64)  # nearest graph neighbor per new node
        max_forced = max(1, self.near_deg // 4)
        forced_count: dict[int, int] = {}
        vpos = {int(v): j for j, v in enumerate(uniq)}
        for row_idx in np.argsort(sel_d[:, 0], kind="stable"):
            v = int(top_v[row_idx])
            if v < 0:
                continue
            u = int(slots[row_idx])
            j = vpos.get(v)
            if j is None:
                continue
            row = new_rows[j]
            if u in row:
                continue
            c = forced_count.get(v, 0)
            if c >= max_forced:
                continue
            row[self.near_deg - 1 - c] = u
            forced_count[v] = c + 1

        full_rows = np.concatenate(
            [new_rows, cur_rows[:, self.near_deg :]], axis=1
        )
        self.adjacency = _scatter_rows(
            self.adjacency, jnp.asarray(uniq), jnp.asarray(full_rows)
        )

    # -- capacity ------------------------------------------------------------

    def _sync_capacity(self) -> None:
        cap = self.store.capacity
        if self.adjacency.shape[0] < cap:
            old = self.adjacency
            self.adjacency = jnp.full((cap, self.degree), -1, dtype=jnp.int32)
            self.adjacency = jax.lax.dynamic_update_slice(
                self.adjacency, old, (0, 0)
            )
        if len(self._members) < cap:
            grown = np.zeros(cap, dtype=bool)
            grown[: len(self._members)] = self._members
            self._members = grown

    # -- search ----------------------------------------------------------------

    def search(
        self,
        queries: np.ndarray,
        k: int,
        partitions: np.ndarray | None = None,
        allow_mask: np.ndarray | None = None,
        expansion: int | None = None,
    ) -> list[SearchResult]:
        """Graph beam search + exact delta search, merged.

        Per-query partition restriction is a local-index concern; local
        indexes are served by FlatDeviceIndex (their partitions stay small,
        mirroring the reference's 1k local reserve increments), so the graph
        engine rejects `partitions`.
        """
        return self.search_collect(
            self.search_begin(queries, k, partitions, allow_mask, expansion)
        )

    def search_begin(
        self,
        queries: np.ndarray,
        k: int,
        partitions: np.ndarray | None = None,
        allow_mask: np.ndarray | None = None,
        expansion: int | None = None,
    ) -> "GraphPendingSearch":
        """Dispatch the beam-search kernel (and the exact delta-buffer scan)
        without waiting; pair with search_collect / collect_many so result
        pulls can aggregate across batches."""
        if partitions is not None:
            raise ValueError("GraphDeviceIndex does not support per-query partitions")
        self._sync_capacity()
        store = self.store
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        b_real = queries.shape[0]

        graph_packed = None
        graph_ids = False
        qn: np.ndarray | None = None
        k_fetch = k
        if self._graph_nodes > 0:
            b_pad = _bucket(b_real, _BATCH_BUCKETS)
            # oversampled fetch: only pays off when some host resolution
            # (store mirror or the graph's own rescore mirror) will
            # exact-rescore the extra candidates
            ids_path = store.host_distances and store._vecs_host is not None
            mirror_path = self._rescore_host is not None
            k_fetch = k
            if (ids_path or mirror_path) and self.oversample > 1:
                k_fetch = min(k * self.oversample, max(self._graph_nodes, 1))
            k_pad = _bucket(k_fetch, _K_BUCKETS)
            qp = queries
            if b_pad != b_real:
                qp = np.pad(queries, [(0, b_pad - b_real), (0, 0)])
            qs, q_aux = prepare_queries(qp, self.space_type, self.quantization)
            ef = expansion or self.expansion_search
            ef = max(ef, k_pad)
            if allow_mask is None and partitions is None:
                allow = jnp.ones((store.capacity,), dtype=jnp.bool_)
                filtered = False
            else:
                am = np.ones((store.capacity,), dtype=bool)
                if allow_mask is not None:
                    am[:] = False
                    am[: allow_mask.shape[0]] = allow_mask[: store.capacity]
                allow = jnp.asarray(am)
                filtered = True
                # per-query partition masks are handled by the flat path for
                # local indexes; graph engine serves global indexes
            iters = min(ef, self.search_iters) if self.search_iters else ef
            if self.preview_dims > 0:
                # preview-guided: 1 dependent gather per round instead of 2
                # (adjacency + neighbor previews both keyed by the expanded
                # node), exact re-rank of the top preview candidates at the
                # end — see _graph_beam_search_preview
                self._ensure_previews()
                graph_packed = _graph_beam_search_preview(
                    store.vectors,
                    store.aux,
                    store.epochs,
                    store.valid,
                    allow,
                    self.adjacency,
                    self._nbr_prev,
                    self._prev_R,
                    self._entries_array(),
                    jnp.asarray(qs),
                    jnp.asarray(q_aux),
                    space=self.space_type,
                    quant=self.quantization,
                    k=k_pad,
                    beam_width=ef,
                    iters=iters,
                    filtered=filtered,
                    expand=self.beam_expand,
                )
            else:
                graph_packed = _graph_beam_search(
                    store.vectors,
                    store.aux,
                    store.epochs,
                    store.valid,
                    allow,
                    self.adjacency,
                    self._entries_array(),
                    jnp.asarray(qs),
                    jnp.asarray(q_aux),
                    space=self.space_type,
                    quant=self.quantization,
                    k=k_pad,
                    beam_width=ef,
                    # lockstep rounds: with expand=4 nodes popped per round
                    # the traversal converges well before ef rounds —
                    # search_iters caps the serialized gather chain (the
                    # engine's dominant cost: each round gathers
                    # expand*degree rows per query) while beam_width=ef
                    # keeps the candidate pool's recall
                    iters=iters,
                    filtered=filtered,
                    expand=self.beam_expand,
                )
            if ids_path:
                # ship winner ids only (the [3,B,k] dist/id/epoch pack is
                # 3x the bytes); exact f32 distances + epochs resolve from
                # the store's host mirrors at collect time
                from vector_store_tpu.engine.flat import _ids_only

                graph_packed = _ids_only(graph_packed, k=min(k_fetch, k_pad))
                graph_ids = True
            if ids_path or mirror_path:
                qn = qp
                if self.space_type is SpaceType.COSINE:
                    qn = qp / np.maximum(
                        np.linalg.norm(qp, axis=-1, keepdims=True), 1e-30
                    )

        delta_pending = None
        if self._delta_slots:
            dm = np.zeros((store.capacity,), dtype=bool)
            dm[np.asarray(self._delta_slots, dtype=np.int64)] = True
            if allow_mask is not None:
                dm[: allow_mask.shape[0]] &= allow_mask[: store.capacity]
            delta_pending = store.search_begin(
                queries, k, partitions=partitions, allow_mask=dm
            )

        return GraphPendingSearch(
            graph_packed=graph_packed,
            delta_pending=delta_pending,
            b_real=b_real,
            k=k,
            engine=self,
            graph_ids=graph_ids,
            q_f32=qn,
            k_fetch=k_fetch,
        )

    def search_collect(self, pending: "GraphPendingSearch") -> list[SearchResult]:
        host = (
            pull_packed(pending.graph_packed)
            if pending.graph_packed is not None
            else None
        )
        return self._postprocess(pending, host)

    def collect_many(
        self, pendings: list["GraphPendingSearch"]
    ) -> list[list[SearchResult]]:
        """One aggregated device->host transfer for all in-flight batches
        (beam results + their delta-scan results)."""
        arrays = []
        for p in pendings:
            if p.graph_packed is not None:
                arrays.append(p.graph_packed)
            if p.delta_pending is not None:
                arrays.append(p.delta_pending.packed)
        hosts = pull_packed_many(arrays) if arrays else []
        it = iter(hosts)
        out = []
        for p in pendings:
            g_host = next(it) if p.graph_packed is not None else None
            if p.delta_pending is not None:
                p.delta_host = np.asarray(next(it))
            out.append(self._postprocess(p, g_host))
        return out

    def _postprocess(
        self, pending: "GraphPendingSearch", g_host: np.ndarray | None
    ) -> list[SearchResult]:
        b_real, k = pending.b_real, pending.k
        graph_results: list[SearchResult] | None = None
        if g_host is not None and pending.graph_ids:
            from vector_store_tpu.engine.flat import ids_postprocess

            graph_results = ids_postprocess(
                self.store._vecs_host,
                self.store._epochs_host,
                self.space_type,
                self.dimensions,
                np.asarray(g_host)[:b_real],
                pending.q_f32[:b_real],
                # rescoring=False: storage-precision beam order preserved
                # (quantization_and_rescoring contract; distances are still
                # the exact f32 recompute — the only ones this path has)
                keep_order=not self.rescoring,
            )
        elif g_host is not None:
            kf = max(pending.k_fetch, k)
            d, i, e = unpack_results(np.asarray(g_host))
            d = d[:b_real, :kf]
            i = i[:b_real, :kf]
            e = e[:b_real, :kf]
            if self._rescore_host is not None and pending.q_f32 is not None:
                # graph-side rescore mirror (no store mirror on this
                # backend): exact f32 re-rank of the storage-precision
                # beam candidates — the oversampling/rescoring contract
                from vector_store_tpu.engine.flat import ids_postprocess

                graph_results = ids_postprocess(
                    self._rescore_host,
                    self.store._epochs_host,
                    self.space_type,
                    self.dimensions,
                    np.where(np.isfinite(d), i, -1),
                    pending.q_f32[:b_real],
                )
            else:
                graph_results = []
                for row in range(b_real):
                    ok = np.isfinite(d[row]) & (i[row] >= 0)
                    graph_results.append(
                        SearchResult(
                            slots=i[row][ok].astype(np.int64),
                            epochs=e[row][ok],
                            distances=d[row][ok],
                        )
                    )

        delta_results: list[SearchResult] | None = None
        if pending.delta_pending is not None:
            if pending.delta_host is not None:
                delta_results = self.store._postprocess(
                    pending.delta_pending, pending.delta_host
                )
            else:
                delta_results = self.store.search_collect(pending.delta_pending)

        if graph_results is None and delta_results is None:
            return [
                SearchResult(
                    slots=np.empty(0, np.int64),
                    epochs=np.empty(0, np.int32),
                    distances=np.empty(0, np.float32),
                )
                for _ in range(b_real)
            ]
        # k-contract: the oversampled fetch widened the candidate pool to
        # k_fetch; after the exact re-rank only the first k may leave the
        # engine (the IVF engine truncates the same way, ivf.py)
        if graph_results is None:
            return [r.truncated(k) for r in delta_results]  # type: ignore[union-attr]
        if delta_results is None:
            return [r.truncated(k) for r in graph_results]

        merged = []
        for g, dl in zip(graph_results, delta_results):
            slots = np.concatenate([g.slots, dl.slots])
            eps = np.concatenate([g.epochs, dl.epochs])
            dist = np.concatenate([g.distances, dl.distances])
            # dedup (a slot may be both merged & still pending in rare races)
            _, first = np.unique(slots, return_index=True)
            slots, eps, dist = slots[first], eps[first], dist[first]
            # the cross-region merge always ranks by distance — even with
            # rescoring=False: a fresh delta row that is the true nearest
            # neighbor must not be dropped just because the graph region
            # supplied k older candidates. The rescoring=False order
            # contract applies WITHIN the graph region's resolution
            # (ids_postprocess keep_order); the delta is a freshness tier,
            # not part of the quantized index ordering.
            order = np.argsort(dist, kind="stable")[:k]
            merged.append(
                SearchResult(slots=slots[order], epochs=eps[order], distances=dist[order])
            )
        return merged


@jax.jit
def _scatter_rows(adjacency, row_ids, rows):
    return adjacency.at[row_ids].set(rows)
