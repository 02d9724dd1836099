"""IVF (inverted-file) partitioned scan: device k-means + grouped Pallas scan.

The fused flat scan (ops/pallas_scan.py) is MXU-bound: every query scores
every stored row. This module makes search sub-linear the TPU-native way —
not by pointer-chasing a graph (HBM-gather-bound on this hardware, see
engine/graph.py) but by ScaNN-style partitioning with dense, static-shaped
batch execution:

1. k-means clusters the stored rows; storage is laid out cluster-major
   ([nlist * cmax, Dp], each cluster padded to `cmax` rows), which replaces
   pointer indirection with pure layout.
2. A search batch scores all centroids with one matmul and picks `nprobe`
   clusters per query.
3. The (query, cluster) pairs are regrouped by cluster — a sort + one
   gather — into per-cluster query groups of a fixed budget S, so the hot
   kernel stays a dense matmul per cluster: the SAME fused rank kernel as
   the flat scan (pallas_scan._make_kernel), with a grid step per cluster
   and per-step query blocks instead of one global query block.
4. Per-(query, cluster) group minima scatter back through the pair table
   and a final top-k merges each query's nprobe * LANES candidates.

Compute per batch drops from B * N to ~B * nprobe * cmax row-scores
(nprobe/nlist of the data, ~10x-20x), while every shape stays static and
every hot op stays on the MXU. Replaces the role of the reference's HNSW
traversal (/root/reference/crates/vector-store/src/vs_index/usearch.rs) at
scales where brute force stops being competitive.

k-means itself is matmul-dominated (assignment scores and one-hot centroid
sums both ride the MXU, blocked over rows) so a 1M x 128d build is ~100 ms
of device time per iteration group.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vector_store_tpu.core.types import SpaceType
from vector_store_tpu.ops.pallas_scan import (
    INVALID_BIAS,
    INVALID_CUTOFF,
    LANES,
    PAUX_ROWS,
    _fold_min,
)

__all__ = [
    "kmeans",
    "ivf_layout",
    "ivf_candidates",
    "choose_nlist",
    "choose_cmax",
    "choose_budget",
]


# -- geometry ----------------------------------------------------------------

CLUSTER_CHUNK = 128  # cmax granularity; must divide cmax and be lane-aligned


def choose_nlist(n: int) -> int:
    """Cluster count ~ 2*sqrt(N), power of two, clamped.

    Why 2x: each (query, cluster) pair emits at most LANES=128 group
    minima, so when a query's true top-k concentrates in ONE cluster
    (clustered data), lane collisions cap recall around 1 - k^2/(2*128).
    Smaller clusters spread the top-k over several cells, which divides
    the collision rate — measured at 1M clustered: 0.944 recall@10 ceiling
    at sqrt(N) cells vs ~0.98 at 2*sqrt(N)."""
    if n <= 0:
        return 64
    exp = int(round(np.log2(max(np.sqrt(n), 1.0)))) + 1
    return int(np.clip(2**exp, 64, 8192))


# cmax ladder: ~1.5x steps so repeated rebuilds at slightly different N
# reuse the SAME compiled programs (every device program's shape depends on
# nlist*cmax; a fresh compile per rebuild stalls serving for its duration)
_CMAX_LADDER = (128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096)


def choose_cmax(n: int, nlist: int, headroom: float = 1.6) -> int:
    """Per-cluster row capacity: average fill x headroom, rounded UP to a
    coarse ladder step (shape stability across rebuilds beats a few % of
    padding)."""
    avg = max(1, -(-n // nlist))
    need = int(np.ceil(avg * headroom))
    for step in _CMAX_LADDER:
        if step >= need:
            return step
    return -(-need // 4096) * 4096


def choose_budget(b: int, nprobe: int, nlist: int) -> int:
    """Per-cluster query-slot budget S: 2x the balanced average, rounded to
    a power of two >= 16 (sublane-friendly, few recompiles)."""
    avg = max(1, (b * nprobe) // max(nlist, 1))
    s = 16
    while s < 2 * avg and s < 1024:
        s *= 2
    return s


# -- k-means ------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("nlist", "iters", "block", "spherical")
)
def _kmeans_jit(
    x: jax.Array,  # [N, Dp] float storage dtype (N multiple of block)
    w: jax.Array,  # [N] f32 weights (0 = padding row)
    key: jax.Array,
    *,
    nlist: int,
    iters: int,
    block: int,
    spherical: bool,
):
    n, dp = x.shape
    nblk = n // block

    # init: random rows (collisions are fine; empty clusters keep their
    # centroid and lose to fuller ones in later iterations)
    idx = jax.random.randint(key, (nlist,), 0, n)
    cent = x[idx].astype(jnp.float32)

    def affinity(xb: jax.Array, cent: jax.Array) -> jax.Array:
        dot = jnp.dot(
            xb.astype(jnp.bfloat16),
            cent.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        if spherical:
            norm = jnp.sqrt(jnp.sum(cent * cent, axis=-1))
            return dot / jnp.maximum(norm, 1e-20)[None, :]
        c2 = jnp.sum(cent * cent, axis=-1)
        return 2.0 * dot - c2[None, :]

    def one_iter(_, cent):
        def body(i, carry):
            sums, counts = carry
            xb = jax.lax.dynamic_slice_in_dim(x, i * block, block, 0)
            wb = jax.lax.dynamic_slice_in_dim(w, i * block, block, 0)
            lbl = jnp.argmax(affinity(xb, cent), axis=-1)  # [block]
            onehot = (
                lbl[:, None] == jnp.arange(nlist, dtype=lbl.dtype)[None, :]
            ).astype(jnp.bfloat16) * wb[:, None].astype(jnp.bfloat16)
            sums = sums + jnp.dot(
                onehot.T,
                xb.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            counts = counts + jnp.sum(onehot.astype(jnp.float32), axis=0)
            return sums, counts

        sums, counts = jax.lax.fori_loop(
            0,
            nblk,
            body,
            (
                jnp.zeros((nlist, dp), jnp.float32),
                jnp.zeros((nlist,), jnp.float32),
            ),
        )
        newc = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0.5)[:, None], newc, cent)

    cent = jax.lax.fori_loop(0, iters, one_iter, cent)

    # final assignment pass
    def label_blk(i, lbls):
        xb = jax.lax.dynamic_slice_in_dim(x, i * block, block, 0)
        lbl = jnp.argmax(affinity(xb, cent), axis=-1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice(lbls, lbl, (i * block,))

    labels = jax.lax.fori_loop(
        0, nblk, label_blk, jnp.zeros((n,), jnp.int32)
    )
    return cent, labels


@functools.partial(jax.jit, static_argnames=("block", "spherical"))
def kmeans_step(
    x: jax.Array,  # [N, Dp] (N multiple of block)
    w: jax.Array,  # [N] f32
    cent: jax.Array,  # [nlist, Dp] f32
    *,
    block: int = 16384,
    spherical: bool = False,
) -> jax.Array:
    """ONE Lloyd iteration -> new centroids. Exposed separately so engine
    maintenance can run a rebuild as bounded slices between query batches
    instead of one long stop-the-world call."""
    n, dp = x.shape
    nlist = cent.shape[0]
    nblk = n // block

    def body(i, carry):
        sums, counts = carry
        xb = jax.lax.dynamic_slice_in_dim(x, i * block, block, 0)
        wb = jax.lax.dynamic_slice_in_dim(w, i * block, block, 0)
        dot = jnp.dot(
            xb.astype(jnp.bfloat16),
            cent.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        if spherical:
            cn = jnp.sqrt(jnp.sum(cent * cent, axis=-1))
            aff = dot / jnp.maximum(cn, 1e-20)[None, :]
        else:
            c2 = jnp.sum(cent * cent, axis=-1)
            aff = 2.0 * dot - c2[None, :]
        lbl = jnp.argmax(aff, axis=-1)
        onehot = (
            lbl[:, None] == jnp.arange(nlist, dtype=lbl.dtype)[None, :]
        ).astype(jnp.bfloat16) * wb[:, None].astype(jnp.bfloat16)
        sums = sums + jnp.dot(
            onehot.T, xb.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        counts = counts + jnp.sum(onehot.astype(jnp.float32), axis=0)
        return sums, counts

    sums, counts = jax.lax.fori_loop(
        0,
        nblk,
        body,
        (jnp.zeros((nlist, dp), jnp.float32), jnp.zeros((nlist,), jnp.float32)),
    )
    newc = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where((counts > 0.5)[:, None], newc, cent)


@functools.partial(jax.jit, static_argnames=("block", "spherical", "top2"))
def kmeans_assign(
    x: jax.Array,  # [N, Dp] (N multiple of block)
    cent: jax.Array,  # [nlist, Dp] f32
    *,
    block: int = 16384,
    spherical: bool = False,
    top2: bool = False,
) -> jax.Array:
    """Blocked nearest-centroid assignment -> labels [N] i32 (or [N, 2]
    with ``top2``: nearest + second-nearest, feeding the layout's
    capacity-constrained second-choice placement). Lets rebuilds run
    k-means on a row sample, then label the full set in one pass."""
    n, _ = x.shape
    nblk = n // block
    width = 2 if top2 else 1

    def label_blk(i, lbls):
        xb = jax.lax.dynamic_slice_in_dim(x, i * block, block, 0)
        dot = jnp.dot(
            xb.astype(jnp.bfloat16),
            cent.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        if spherical:
            cn = jnp.sqrt(jnp.sum(cent * cent, axis=-1))
            aff = dot / jnp.maximum(cn, 1e-20)[None, :]
        else:
            c2 = jnp.sum(cent * cent, axis=-1)
            aff = 2.0 * dot - c2[None, :]
        if top2:
            _, lbl = jax.lax.top_k(aff, 2)  # [block, 2] i32
            lbl = lbl.astype(jnp.int32)
        else:
            lbl = jnp.argmax(aff, axis=-1).astype(jnp.int32)[:, None]
        return jax.lax.dynamic_update_slice(lbls, lbl, (i * block, 0))

    lbls = jax.lax.fori_loop(
        0, nblk, label_blk, jnp.zeros((n, width), jnp.int32)
    )
    return lbls if top2 else lbls[:, 0]


def kmeans(
    x: jax.Array,
    w: jax.Array,
    *,
    nlist: int,
    iters: int = 8,
    block: int = 16384,
    spherical: bool = False,
    seed: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Device k-means over [N, Dp] rows (N must be a multiple of `block`;
    pad with w=0 rows). Returns (centroids f32 [nlist, Dp], labels i32 [N])."""
    n = x.shape[0]
    assert n % block == 0, (n, block)
    return _kmeans_jit(
        x,
        w,
        jax.random.PRNGKey(seed),
        nlist=nlist,
        iters=iters,
        block=block,
        spherical=spherical,
    )


# -- cluster-major layout ------------------------------------------------------


def _rank_in_cluster(key: jax.Array, nlist: int):
    """Stable-sort rows by cluster key -> (order, sorted keys, rank within
    each key's run). Shared by the layout's placement rounds."""
    n = key.shape[0]
    order = jnp.argsort(key, stable=True)
    sk = key[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_new = jnp.concatenate([jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    rank = idx - seg_start
    return order, sk, rank


@functools.partial(jax.jit, static_argnames=("nlist", "cmax"))
def ivf_layout(
    labels: jax.Array,
    live: jax.Array,
    *,
    nlist: int,
    cmax: int,
    labels2: jax.Array | None = None,
):
    """Compute cluster-major positions for each row.

    labels: [N] i32 cluster per row; live: [N] bool. Returns
    (pos [N] i32 — target position `label*cmax + rank` or -1 for dead rows
    and overflow rows beyond cmax, overflow [N] bool — live rows that did
    not fit their cluster and must spill to the delta region).

    With ``labels2`` (second-nearest centroid per row), rows overflowing
    their first cluster take a slot in their second cluster when it has
    room — capacity-constrained placement that lets choose_cmax run a much
    tighter headroom (padding rows cost full scan bandwidth + HBM). A row
    in its second-best cell is still found whenever a query's nprobe
    probes reach that cell, and every such candidate is exact-rescored.
    Only rows overflowing BOTH choices spill to the delta region.
    """
    n = labels.shape[0]
    key = jnp.where(live, labels, nlist)  # dead rows sort last
    order, sk, rank = _rank_in_cluster(key, nlist)
    fits = (rank < cmax) & (sk < nlist)
    pos_sorted = jnp.where(fits, sk * cmax + rank, -1)
    pos = jnp.zeros((n,), jnp.int32).at[order].set(pos_sorted)
    overflow_sorted = (~fits) & (sk < nlist)
    overflow = jnp.zeros((n,), jnp.bool_).at[order].set(overflow_sorted)
    if labels2 is None:
        return pos, overflow

    # round 2: place first-round overflow into its second-choice cluster
    # after that cluster's round-1 rows
    count1 = (
        jnp.zeros((nlist + 1,), jnp.int32)
        .at[jnp.where(fits, sk, nlist)]
        .add(1, mode="drop")
    )
    key2 = jnp.where(overflow, labels2, nlist)
    order2, sk2, rank2 = _rank_in_cluster(key2, nlist)
    base2 = count1[jnp.minimum(sk2, nlist)]
    fits2 = (rank2 + base2 < cmax) & (sk2 < nlist)
    pos2_sorted = jnp.where(fits2, sk2 * cmax + base2 + rank2, -1)
    pos2 = jnp.zeros((n,), jnp.int32).at[order2].set(pos2_sorted)
    placed2 = pos2 >= 0
    pos = jnp.where(overflow & placed2, pos2, pos)
    overflow = overflow & ~placed2
    return pos, overflow


# -- grouped scan kernel --------------------------------------------------------


def _cluster_chunk(cmax: int) -> int:
    for c in (1024, 512, 256, 128):
        if cmax % c == 0:
            return c
    raise ValueError(f"cmax {cmax} not lane-aligned")


def _choose_g(nlist: int, cmax: int, dp: int, s: int, itemsize: int) -> int:
    """Clusters per grid step. One cluster per step means tiny (cmax x Dp)
    DMA blocks and nlist grid steps whose fixed cost dominates the scan
    (measured: g=8 saved 0.36 ms of the 2.1 ms scan at the headline shape).
    Pick the largest g in {16,8,4,2,1} that divides nlist and keeps the
    per-step blocks (vectors + queries + outputs + paux, double-buffered)
    under ~16 MB of VMEM."""
    for g in (16, 8, 4, 2, 1):
        if nlist % g:
            continue
        block = g * (
            cmax * dp * itemsize  # vector tile
            + s * dp * itemsize  # query tile
            + 2 * s * LANES * 4  # rank/off outputs
            + PAUX_ROWS * cmax * 4  # paux tile
        )
        if 2 * block <= 16 * 1024 * 1024:
            return g
    return 1


def _make_grouped_kernel(cmax: int, chunk: int, g: int, s: int):
    """Score g clusters per grid step; each cluster's [s, Dp] query tile
    against its [cmax, Dp] vector tile, group-min folded to LANES with
    winner offsets relative to the cluster base (pos = cluster*cmax +
    off + lane, exactly like the one-cluster kernel)."""
    nchunks = cmax // chunk

    def kern(q_ref, v_ref, aux_ref, od_ref, oo_ref):
        def do_cluster(gi, _):
            q = q_ref[pl.ds(gi * s, s), :]

            def score(c):
                v = v_ref[pl.ds(gi * cmax + c * chunk, chunk), :]
                if v.dtype != q.dtype:
                    # i8-quantized storage scanned by true-scale bf16
                    # queries (IVF i8 mode): exact in bf16; the 127x scale
                    # is folded into paux a-row
                    v = v.astype(q.dtype)
                dot = jax.lax.dot_general(
                    q,
                    v,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                a = aux_ref[0:1, pl.ds(gi * cmax + c * chunk, chunk)]
                b = aux_ref[1:2, pl.ds(gi * cmax + c * chunk, chunk)]
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
                    return (
                        jnp.where(take, acc_d, cd),
                        jnp.where(take, acc_o, co),
                    )

                acc_d, acc_o = jax.lax.fori_loop(1, nchunks, body, (d0, o0))
            od_ref[pl.ds(gi * s, s), :] = acc_d
            oo_ref[pl.ds(gi * s, s), :] = acc_o
            return 0

        jax.lax.fori_loop(0, g, do_cluster, 0)

    return kern


@functools.partial(
    jax.jit, static_argnames=("s", "cmax", "interpret")
)
def _grouped_scan(
    queries_grouped: jax.Array,  # [nlist*S, Dp] storage dtype
    vectors: jax.Array,  # [nlist*cmax, Dp] storage dtype
    paux: jax.Array,  # [8, nlist*cmax] f32
    *,
    s: int,
    cmax: int,
    interpret: bool = False,
):
    npos, dp = vectors.shape
    nlist = npos // cmax
    chunk = _cluster_chunk(cmax)
    g = _choose_g(nlist, cmax, dp, s, vectors.dtype.itemsize)
    grid_spec = pl.GridSpec(
        grid=(nlist // g,),
        in_specs=[
            pl.BlockSpec((g * s, dp), lambda i: (i, 0)),
            pl.BlockSpec((g * cmax, dp), lambda i: (i, 0)),
            pl.BlockSpec((PAUX_ROWS, g * cmax), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((g * s, LANES), lambda i: (i, 0)),
            pl.BlockSpec((g * s, LANES), lambda i: (i, 0)),
        ],
    )
    return pl.pallas_call(
        _make_grouped_kernel(cmax, chunk, g, s),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nlist * s, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nlist * s, LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nlist * s * cmax * dp,
            bytes_accessed=npos * dp * vectors.dtype.itemsize
            + nlist * s * (dp * queries_grouped.dtype.itemsize + LANES * 8),
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(queries_grouped, vectors, paux)


def ivf_probe(
    centroids: jax.Array,  # [nlist, Dp] f32
    queries: jax.Array,  # [B, Dp] storage dtype
    q_live: jax.Array,  # [B] bool
    *,
    nprobe: int,
    spherical: bool,
    approx: bool = False,
) -> jax.Array:
    """Rank clusters per query by centroid affinity -> [B, nprobe] i32
    cluster ids (padding rows parked at the sentinel id nlist). With
    ``approx`` the selector is approx_max_k (recall_target 0.99) over a
    bf16 affinity plane (halves the selector traffic): a missed marginal
    cluster or a near-tie swap only perturbs which ~nprobe-th cluster is
    scanned."""
    nlist = centroids.shape[0]
    acc_dtype = jnp.bfloat16 if approx else jnp.float32
    dot = jnp.dot(
        queries.astype(jnp.bfloat16),
        centroids.T.astype(jnp.bfloat16),
        preferred_element_type=acc_dtype,
    )
    if spherical:
        cn = jnp.sqrt(jnp.sum(centroids * centroids, axis=-1))
        aff = dot / jnp.maximum(cn, 1e-20)[None, :].astype(acc_dtype)
    else:
        c2 = jnp.sum(centroids * centroids, axis=-1)
        aff = 2.0 * dot - c2[None, :].astype(acc_dtype)
    if approx and nprobe < nlist:
        _, probes = jax.lax.approx_max_k(
            aff, nprobe, recall_target=0.99, aggregate_to_topk=True
        )
        probes = probes.astype(jnp.int32)
    else:
        _, probes = jax.lax.top_k(aff, nprobe)  # [B, nprobe] i32
    return jnp.where(q_live[:, None], probes, nlist)


def _regroup_pairs(
    probes: jax.Array,  # [B, nprobe] i32 cluster ids (sentinel >= nlist)
    *,
    nlist: int,
    s: int,
    nprobe: int,
    force_fallback: bool = False,
):
    """Regroup (query, cluster) pairs into per-cluster query slots.

    Returns (qtab [nlist*s] i32 query index per slot, filled [nlist*s]
    bool, row_of_pair [B, nprobe] i32 slot row or -1 for dropped/sentinel
    pairs). Pairs are ranked within their cluster by pair index (b-major
    first-come), the first `s` winning slots.

    When (cluster id, pair index) fits one int32, the regroup is a
    single-array non-stable sort of unique packed keys (measured 1.8 ms
    faster than the stable argsort at the headline shape — argsort sorts
    (key, iota) pairs through a wider comparator); otherwise it falls back
    to the argsort. Both orders rank pairs identically. One scatter builds
    qtab+filled together (sb+1 into an i32 plane, 0 = unfilled): the
    second 262k-element scatter was a measured 0.9 ms/batch.
    """
    b = probes.shape[0]
    p = b * nprobe
    pairs_c = probes.reshape(-1).astype(jnp.int32)
    idx = jnp.arange(p, dtype=jnp.int32)
    pbits = max(1, (p - 1).bit_length())
    if not force_fallback and ((nlist + 1) << pbits) < 2**31:
        packed = (pairs_c << pbits) | idx
        sp = jnp.sort(packed)
        sc = sp >> pbits
        sidx = sp & ((1 << pbits) - 1)
    else:
        sidx = jnp.argsort(pairs_c, stable=True)
        sc = pairs_c[sidx]
    sb = sidx // nprobe
    is_new = jnp.concatenate([jnp.ones((1,), jnp.bool_), sc[1:] != sc[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    rank = idx - seg_start
    ok = (rank < s) & (sc < nlist)
    row = sc * s + jnp.minimum(rank, s - 1)
    scatter_row = jnp.where(ok, row, nlist * s)  # oob drops
    plane = (
        jnp.zeros((nlist * s,), jnp.int32)
        .at[scatter_row]
        .set(sb + 1, mode="drop")
    )
    filled = plane > 0
    qtab = jnp.maximum(plane - 1, 0)
    # map each original pair to its slot row (-1 = dropped / padding)
    row_of_pair = (
        jnp.full((p,), -1, jnp.int32)
        .at[sidx]
        .set(jnp.where(ok, row, -1))
        .reshape(b, nprobe)
    )
    return qtab, filled, row_of_pair


@functools.partial(
    jax.jit,
    static_argnames=(
        "k",
        "nprobe",
        "s",
        "cmax",
        "spherical",
        "interpret",
        "approx",
    ),
)
def ivf_candidates(
    vectors: jax.Array,  # [nlist*cmax, Dp] storage dtype (cluster-major)
    paux: jax.Array,  # [8, nlist*cmax] f32 rank coefficients
    centroids: jax.Array,  # [nlist, Dp] f32
    queries: jax.Array,  # [B, Dp] storage dtype
    q_live: jax.Array,  # [B] bool (padding rows False)
    *,
    k: int,
    nprobe: int,
    s: int,
    cmax: int,
    spherical: bool,
    interpret: bool = False,
    approx: bool = False,
    probes: jax.Array | None = None,  # [B, nprobe] precomputed (sharded path)
) -> jax.Array:
    """One fused device program: probe -> regroup -> grouped scan -> merge.
    Returns (packed, dropped):
      packed [2, B, k] f32: row 0 rank values (same affine form as
      pallas_rank_search), row 1 positions in the cluster-major layout
      (int32 bitcast, -1 empty);
      dropped [B] i32: per-query count of live (query, cluster) pairs that
      did not fit their cluster's S query slots and were NOT scanned. A
      query with dropped > 0 has incomplete main-region candidates (skewed
      or duplicate-heavy batches saturate popular clusters) — the engine
      must re-dispatch it with a larger S (engine/ivf.py retry path) or an
      exact fallback; silently returning partial results collapses recall
      with no signal."""
    npos, dp = vectors.shape
    nlist = npos // cmax
    b = queries.shape[0]

    # 1) probe: rank clusters per query by centroid affinity
    if probes is None:
        nprobe = min(nprobe, nlist)
        probes = ivf_probe(
            centroids,
            queries,
            q_live,
            nprobe=nprobe,
            spherical=spherical,
            approx=approx,
        )
    else:
        # precomputed (sharded path): ids are local, sentinel >= nlist
        nprobe = probes.shape[1]

    # 2) regroup pairs by cluster into per-cluster query slots
    qtab, filled, row_of_pair = _regroup_pairs(
        probes, nlist=nlist, s=s, nprobe=nprobe
    )
    # live pairs that lost the slot race (cluster already held S queries)
    dropped = jnp.sum(
        ((row_of_pair < 0) & (probes < nlist)).astype(jnp.int32), axis=1
    )
    dropped = jnp.where(q_live, dropped, 0)

    queries_grouped = queries[qtab]  # [nlist*S, Dp]

    # 3) grouped fused scan: per-cluster group minima
    rank_out, off_out = _grouped_scan(
        queries_grouped, vectors, paux, s=s, cmax=cmax, interpret=interpret
    )
    rank_out = jnp.where(filled[:, None], rank_out, INVALID_BIAS)

    # 4) scatter back per query and merge. Positions are NOT materialized
    # at candidate width: the winners' positions are recovered from the
    # winning pair's cluster id + the winner's off/lane after top-k
    # (pos = cluster*cmax + off + lane), saving a [B, nprobe*LANES] i32
    # gather and a [nlist*s, LANES] i32 materialization per batch.
    safe_row = jnp.maximum(row_of_pair, 0)  # [B, nprobe]
    live_pair = (row_of_pair >= 0)[:, :, None]
    cand_rank = jnp.where(
        live_pair, rank_out[safe_row], INVALID_BIAS
    ).reshape(b, nprobe * LANES)
    kk = min(k, cand_rank.shape[1])
    if approx and kk < cand_rank.shape[1]:
        # TPU PartialReduce selector: candidates feed the engine's exact
        # host rescore (ids_postprocess recomputes f32 distances and
        # re-sorts), so a 0.99-retention candidate set costs ~nothing in
        # end recall while skipping the full-width sort
        neg, sel = jax.lax.approx_max_k(
            -cand_rank, kk, recall_target=0.99, aggregate_to_topk=True
        )
        sel = sel.astype(jnp.int32)
    else:
        neg, sel = jax.lax.top_k(-cand_rank, kk)
    best_rank = -neg
    pair_sel = sel // LANES
    lane_sel = sel % LANES
    row_sel = jnp.take_along_axis(safe_row, pair_sel, axis=1)  # [B, kk]
    off_sel = off_out[row_sel, lane_sel].astype(jnp.int32)
    cluster_sel = jnp.take_along_axis(
        probes.astype(jnp.int32), pair_sel, axis=1
    )
    best_pos = cluster_sel * cmax + off_sel + lane_sel
    if kk < k:
        padw = k - kk
        best_rank = jnp.concatenate(
            [best_rank, jnp.full((b, padw), INVALID_BIAS, jnp.float32)], axis=1
        )
        best_pos = jnp.concatenate(
            [best_pos, jnp.full((b, padw), -1, jnp.int32)], axis=1
        )
    best_pos = jnp.where(best_rank < INVALID_CUTOFF, best_pos, -1)
    packed = jnp.stack(
        [best_rank, jax.lax.bitcast_convert_type(best_pos, jnp.float32)]
    )
    return packed, dropped
