"""Sharded graph-ANN over a 2-D device mesh — per-shard independent graphs.

The standard sharding for graph ANN (how usearch/FAISS deployments shard,
and the only one that avoids a cross-chip collective PER BEAM HOP): vector
rows shard over the "model" axis; each chip builds a COMPLETE fixed-degree
graph over its own rows, entirely on device and in parallel with every
other chip (exact local kNN + hash-random NSW bridges + Vamana alpha-prune
+ one reverse-edge pass — the same CAGRA-shaped recipe as the single-chip
bulk build, engine/graph.py). A query runs the lockstep beam search on all
shards simultaneously, then ONE all-gather over ICI merges the per-shard
top-k into the global top-k.

Recall composition: the global top-k is the union of per-shard top-k sets,
so sharded recall >= single-graph recall at equal ef (each shard's graph
is smaller and easier to navigate). The price is S beams instead of one —
compute that rides otherwise-idle chips.

Reference counterpart: none (the reference is single-process; HA is full
replication). This is the beyond-HBM scale-out axis for the graph engine,
mirroring parallel/ivf_sharded.py for IVF.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.engine.graph import (
    _alpha_prune,
    _ava_u32,
    _bulk_reverse,
    _graph_beam_search,
)
from vector_store_tpu.ops.distance import (
    pairwise_distance,
    prepare_queries,
    vector_aux,
)
from vector_store_tpu.ops.quantize import (
    padded_dim,
    quantize_for_storage,
    storage_dtype,
)
from vector_store_tpu.ops.topk import merge_min_k

N_ENTRIES = 16


def _shard_entries(n_local: int) -> int:
    """Per-shard entry count: ~2*sqrt(n), floored at N_ENTRIES."""
    return int(min(512, max(N_ENTRIES, 2 * np.sqrt(max(n_local, 1)))))
R_RAND = 8  # hash-random bridge candidates per node (NSW long links)


def _build_local(
    vectors,  # [n_local, Dp] storage dtype
    aux,  # [n_local]
    valid,  # [n_local] bool
    *,
    space: SpaceType,
    quant: Quantization,
    m: int,
    k_cand: int,
    alpha: float,
    row_block: int,
):
    """One shard's graph: exact kNN within the shard (blocked scan), random
    bridges, alpha-prune, whole-shard reverse pass. Pure function of the
    shard's rows — identical program on every chip, zero collectives."""
    n_local = vectors.shape[0]
    nb = max(n_local // row_block, 1)
    rows_per = n_local // nb
    inf = jnp.float32(jnp.inf)

    def knn_block(i):
        lo = i * rows_per
        qv = jax.lax.dynamic_slice_in_dim(vectors, lo, rows_per, 0)
        qa = jax.lax.dynamic_slice_in_dim(aux, lo, rows_per, 0)
        slots = lo + jnp.arange(rows_per, dtype=jnp.int32)

        best_d = jnp.full((rows_per, k_cand), inf, jnp.float32)
        best_i = jnp.full((rows_per, k_cand), -1, jnp.int32)

        def col(carry, j):
            bd, bi = carry
            clo = j * rows_per
            cv = jax.lax.dynamic_slice_in_dim(vectors, clo, rows_per, 0)
            ca = jax.lax.dynamic_slice_in_dim(aux, clo, rows_per, 0)
            cval = jax.lax.dynamic_slice_in_dim(valid, clo, rows_per, 0)
            d = pairwise_distance(qv, cv, space, quant, qa, ca)
            ids = clo + jax.lax.broadcasted_iota(
                jnp.int32, (rows_per, rows_per), 1
            )
            bad = ~cval[None, :] | (ids == slots[:, None])
            d = jnp.where(bad, inf, d)
            return merge_min_k(bd, bi, d, ids), None

        (best_d, best_i), _ = jax.lax.scan(
            col, (best_d, best_i), jnp.arange(nb, dtype=jnp.int32)
        )

        # hash-random bridges across the whole shard (engine/graph.py
        # rationale: pure-kNN graphs fragment into cluster islands)
        rseed = _ava_u32(
            slots[:, None] * jnp.uint32(R_RAND)
            + jnp.arange(R_RAND, dtype=jnp.uint32)[None, :]
        )
        rand = (rseed % jnp.uint32(max(n_local, 1))).astype(jnp.int32)
        rv = vectors[rand.reshape(-1)].reshape(rows_per, R_RAND, -1)
        ra = aux[rand.reshape(-1)].reshape(rows_per, R_RAND)
        fq = qv.astype(jnp.float32)
        fr = rv.astype(jnp.float32)
        dots = jnp.einsum(
            "bd,brd->br", fq, fr, preferred_element_type=jnp.float32
        )
        if space is SpaceType.EUCLIDEAN:
            rd = jnp.maximum(
                (fq * fq).sum(-1)[:, None] + (fr * fr).sum(-1) - 2.0 * dots,
                0.0,
            )
        else:
            denom = jnp.maximum(qa[:, None] * ra, 1e-30)
            rd = 1.0 - dots / denom
        rd = jnp.where(
            (rand == slots[:, None]) | ~valid[rand], inf, rd
        )

        # near region: alpha-pruned exact kNN; bridge region: hash-random
        # long links pruned only against each other (engine/graph.py
        # _bulk_prune_chunk rationale — at high per-cluster density bridges
        # that merely compete in one prune never survive)
        m_bridge = max(2, m // 8)
        m_near = m - m_bridge
        best_d, best_i = jax.lax.sort((best_d, best_i), num_keys=1, dimension=1)
        safe = jnp.maximum(best_i, 0)
        near_i, _ = _alpha_prune(
            best_i,
            best_d,
            vectors[safe],
            aux[safe],
            m=m_near,
            alpha=alpha,
            space=space,
            quant=quant,
        )
        rd_s, rand_s = jax.lax.sort((rd, rand), num_keys=1, dimension=1)
        rsafe = jnp.maximum(rand_s, 0)
        br_i, _ = _alpha_prune(
            rand_s,
            rd_s,
            vectors[rsafe],
            aux[rsafe],
            m=m_bridge,
            alpha=alpha,
            space=space,
            quant=quant,
        )
        adj_i = jnp.concatenate([near_i, br_i], axis=1)
        # dead rows get no edges (they'd poison the reverse pass)
        live_row = jax.lax.dynamic_slice_in_dim(valid, lo, rows_per, 0)
        return jnp.where(live_row[:, None], adj_i, -1)

    m_bridge = max(2, m // 8)
    m_near = m - m_bridge
    adjacency = jax.lax.map(knn_block, jnp.arange(nb, dtype=jnp.int32))
    adjacency = adjacency.reshape(n_local, m)
    near = _bulk_reverse(
        adjacency[:, :m_near],
        vectors,
        aux,
        valid,
        space=space,
        quant=quant,
        m=m_near,
        r=m_near,
        alpha=alpha,
        max_forced=4,
        row_block=rows_per,
    )
    adjacency = jnp.concatenate([near, adjacency[:, m_near:]], axis=1)
    # entry points: hash-spread over the shard, scaled ~2*sqrt(n) so
    # clustered data gets per-cluster seeding (engine/graph.py rationale)
    n_e = _shard_entries(n_local)
    stride = max(n_local // n_e, 1)
    entries = (jnp.arange(n_e, dtype=jnp.int32) * stride) % n_local
    entries = jnp.where(valid[entries], entries, -1)
    return adjacency, entries


def sharded_graph_build_step(
    mesh: Mesh,
    space: SpaceType,
    quant: Quantization,
    m: int,
    k_cand: int,
    alpha: float,
    row_block: int,
):
    fn = functools.partial(
        _build_local,
        space=space,
        quant=quant,
        m=m,
        k_cand=k_cand,
        alpha=alpha,
        row_block=row_block,
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("model", None), P("model"), P("model")),
        out_specs=(P("model", None), P("model")),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_graph_search_step(
    mesh: Mesh,
    space: SpaceType,
    quant: Quantization,
    k: int,
    beam_width: int,
    iters: int,
):
    def local_search(vectors, aux, valid, epochs, adjacency, entries, queries, q_aux):
        n_local = vectors.shape[0]
        shard = jax.lax.axis_index("model")
        offset = shard * n_local
        allow = jnp.ones((n_local,), jnp.bool_)
        packed = _graph_beam_search(
            vectors,
            aux,
            epochs,
            valid,
            allow,
            adjacency,
            entries,
            queries,
            q_aux,
            space=space,
            quant=quant,
            k=k,
            beam_width=beam_width,
            iters=iters,
            filtered=False,
            expand=4,
        )
        d = packed[0]
        i = jax.lax.bitcast_convert_type(packed[1], jnp.int32)
        e = jax.lax.bitcast_convert_type(packed[2], jnp.int32)
        gi = jnp.where(i >= 0, i + offset, -1)
        # collect per-shard candidates over ICI and merge to the global k
        all_d = jax.lax.all_gather(d, "model", axis=1, tiled=True)  # [B, S*k]
        all_i = jax.lax.all_gather(gi, "model", axis=1, tiled=True)
        all_e = jax.lax.all_gather(e, "model", axis=1, tiled=True)
        negd, pos = jax.lax.top_k(-all_d, k)
        fin_d = -negd
        fin_i = jnp.take_along_axis(all_i, pos, axis=1)
        fin_e = jnp.take_along_axis(all_e, pos, axis=1)
        fin_i = jnp.where(jnp.isfinite(fin_d), fin_i, -1)
        return fin_d, fin_i, fin_e

    mapped = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P("model", None),
            P("model"),
            P("model"),
            P("model"),
            P("model", None),
            P("model"),
            P("data", None),
            P("data"),
        ),
        out_specs=(P("data", None), P("data", None), P("data", None)),
        check_vma=False,
    )
    return jax.jit(mapped)


class ShardedGraphIndex:
    """Graph-ANN index sharded across a mesh: per-shard graphs built SPMD,
    searched in lockstep, merged with one all-gather. Bulk-build semantics
    (the beyond-HBM load-then-serve shape); capacity must be a multiple of
    model_parallelism * row_block."""

    def __init__(
        self,
        mesh: Mesh,
        dimensions: int,
        space_type: SpaceType = SpaceType.COSINE,
        quantization: Quantization = Quantization.BF16,
        capacity: int = 1 << 16,
        connectivity: int = 16,
        expansion_add: int = 64,
        expansion_search: int = 64,
        alpha: float = 1.2,
        row_block: int = 512,
    ) -> None:
        self.mesh = mesh
        self.space_type = space_type
        self.quantization = quantization
        self.dimensions = dimensions
        self.dp = padded_dim(dimensions, quantization)
        self.m = int(connectivity)
        self.k_cand = int(expansion_add)
        self.ef = int(expansion_search)
        self.alpha = float(alpha)
        self.row_block = row_block
        model = mesh.shape["model"]
        per = -(-capacity // (model * row_block)) * row_block
        self.capacity = per * model
        self.cap_local = per

        dt = storage_dtype(quantization)
        vspec = NamedSharding(mesh, P("model", None))
        sspec = NamedSharding(mesh, P("model"))
        self.vectors = jax.device_put(
            jnp.zeros((self.capacity, self.dp), dtype=dt), vspec
        )
        self.aux = jax.device_put(
            jnp.zeros((self.capacity,), dtype=jnp.float32), sspec
        )
        self.valid = jax.device_put(
            jnp.zeros((self.capacity,), dtype=jnp.bool_), sspec
        )
        self.epochs = jax.device_put(
            jnp.full((self.capacity,), -1, dtype=jnp.int32), sspec
        )
        self.adjacency = jax.device_put(
            jnp.full((self.capacity, self.m), -1, dtype=jnp.int32), vspec
        )
        self.entries = jax.device_put(
            jnp.full(
                (model * _shard_entries(self.cap_local),), -1, dtype=jnp.int32
            ),
            sspec,
        )
        self._search_cache: dict[tuple, object] = {}

    def load_rows(self, slots: np.ndarray, epochs: np.ndarray, vectors: np.ndarray) -> None:
        """Place rows (slot = global position; owner shard = slot // per).
        Mirrors ShardedFlatIndex.upsert_batch's masked local scatter."""
        from vector_store_tpu.parallel.sharded import sharded_upsert_step

        vals = quantize_for_storage(np.asarray(vectors, np.float32), self.quantization)
        pad = self.dp - vals.shape[-1]
        if pad:
            vals = np.pad(vals, [(0, 0), (0, pad)])
        new_aux = vector_aux(vals, self.space_type, self.quantization)
        step = getattr(self, "_upsert", None)
        if step is None:
            step = self._upsert = sharded_upsert_step(self.mesh)
        self.vectors, self.aux, self.valid, self.epochs = step(
            self.vectors,
            self.aux,
            self.valid,
            self.epochs,
            jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(vals),
            jnp.asarray(new_aux),
            jnp.asarray(np.asarray(epochs, np.int32)),
        )

    def build(self) -> None:
        """SPMD per-shard graph construction (every chip in parallel)."""
        step = sharded_graph_build_step(
            self.mesh,
            self.space_type,
            self.quantization,
            self.m,
            self.k_cand,
            self.alpha,
            self.row_block,
        )
        self.adjacency, self.entries = step(self.vectors, self.aux, self.valid)

    def search(self, queries: np.ndarray, k: int):
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b_real = queries.shape[0]
        dp = self.mesh.shape["data"]
        pad = (-b_real) % dp
        if pad:
            queries = np.pad(queries, [(0, pad), (0, 0)])
        qs, q_aux = prepare_queries(queries, self.space_type, self.quantization)
        key = (k, self.ef)
        step = self._search_cache.get(key)
        if step is None:
            step = sharded_graph_search_step(
                self.mesh,
                self.space_type,
                self.quantization,
                k,
                beam_width=self.ef,
                iters=self.ef,
            )
            self._search_cache[key] = step
        d, i, e = step(
            self.vectors,
            self.aux,
            self.valid,
            self.epochs,
            self.adjacency,
            self.entries,
            jnp.asarray(qs),
            jnp.asarray(q_aux),
        )
        d, i, e = np.asarray(d), np.asarray(i), np.asarray(e)
        return d[:b_real], i[:b_real], e[:b_real]
