"""Serving adapters: sharded engines behind the VsIndexActor protocol.

The reference's engine factory picks the index implementation per index
(vs_index/mod.rs:47-68); this module gives the service the same choice for
the beyond-HBM scale-out engines (parallel/ivf_sharded.py,
parallel/graph_sharded.py), adapting their array-tuple search results to
the per-query SearchResult lists the actor consumes
(service/vs_index.py::VsIndexActor) and providing the maintain() hook the
actor schedules in idle slots (the reference's exclusive-permit phases).

Freshness contract:
- ivf-sharded: every upsert is searchable immediately (it lands in the
  sharded flat delta; builds recluster in idle slots once the delta grows).
- graph-sharded: upserts land in the device arrays immediately AND in a
  bounded host-side delta that search() brute-forces exactly until the
  next idle-slot build folds them into the per-shard graphs.
"""

from __future__ import annotations

import logging

import numpy as np

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.engine.flat import SearchResult
from vector_store_tpu.parallel.graph_sharded import ShardedGraphIndex
from vector_store_tpu.parallel.ivf_sharded import ShardedIvfIndex

logger = logging.getLogger(__name__)


def _exact_subset_from_store(
    queries: np.ndarray,
    slots: np.ndarray,
    *,
    dimensions: int,
    space_type: SpaceType,
    get_row,
    get_epoch,
    rows_prenormalized: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact f32 distances from each query to the given slots only, over a
    host slot->row store (dead slots come back +inf). The sharded engines'
    grouped-terminal hook (service/vs_index.py::_finish_terminal): one BLAS
    call for the whole filtered request group instead of a per-query O(N)
    full ranking. Returns (distances [Q, m] f32, epochs [m] i32)."""
    qs = np.atleast_2d(np.asarray(queries, dtype=np.float32))[:, :dimensions]
    if space_type is SpaceType.COSINE:
        qs = qs / np.maximum(np.linalg.norm(qs, axis=1, keepdims=True), 1e-30)
    slots = np.asarray(slots, dtype=np.int64).reshape(-1)
    m = slots.size
    rows = np.zeros((m, dimensions), dtype=np.float32)
    live = np.zeros((m,), dtype=bool)
    epochs = np.full((m,), -1, dtype=np.int32)
    for i, s in enumerate(slots):
        v = get_row(int(s))
        if v is not None:
            rows[i] = v
            live[i] = True
            epochs[i] = get_epoch(int(s))
    if space_type is SpaceType.COSINE and not rows_prenormalized:
        rows = rows / np.maximum(
            np.linalg.norm(rows, axis=1, keepdims=True), 1e-30
        )
    dot = qs @ rows.T  # (Q, m)
    if space_type is SpaceType.EUCLIDEAN:
        n2 = np.einsum("md,md->m", rows, rows)
        q2 = np.einsum("qd,qd->q", qs, qs)
        d = np.maximum(n2[None, :] - 2.0 * dot + q2[:, None], 0.0)
    else:  # cosine / dot product: 1 - dot (the device paths' convention)
        d = 1.0 - dot
        if space_type is SpaceType.COSINE:
            d = np.clip(d, 0.0, 2.0)
    d = np.where(live[None, :], d, np.inf)
    return d.astype(np.float32), epochs


def _exact_host_top_k(subset_fn, query, slots: np.ndarray, k: int) -> SearchResult:
    """search_exact_host expressed through the engine's own
    search_exact_host_subset (one distance-math implementation per file,
    not three): rank the given slots exactly, return the top k live ones."""
    if slots.size == 0:
        z = np.zeros((0,))
        return SearchResult(
            slots=z.astype(np.int64),
            epochs=z.astype(np.int32),
            distances=z.astype(np.float32),
        )
    q = np.asarray(query, dtype=np.float32).reshape(1, -1)
    dists, epochs = subset_fn(q, slots)
    order = np.argsort(dists[0], kind="stable")[:k]
    ok = np.isfinite(dists[0][order])
    order = order[ok]
    return SearchResult(
        slots=slots[order].astype(np.int64),
        epochs=epochs[order].astype(np.int32),
        distances=dists[0][order].astype(np.float32),
    )


def _to_results(dist, slot, epoch, b_real: int) -> list[SearchResult]:
    """(dist [B,k], slot [B,k], epoch [B,k]) arrays -> per-query
    SearchResult lists with invalid (-1 / inf) lanes stripped."""
    out: list[SearchResult] = []
    for row in range(b_real):
        ok = (slot[row] >= 0) & np.isfinite(dist[row])
        out.append(
            SearchResult(
                slots=slot[row][ok].astype(np.int64),
                epochs=epoch[row][ok].astype(np.int32),
                distances=dist[row][ok].astype(np.float32),
            )
        )
    return out


class ShardedIvfServingEngine:
    """ShardedIvfIndex behind the actor's engine protocol (global indexes
    only — the factory routes local indexes to the flat engine)."""

    def __init__(
        self,
        mesh,
        dimensions: int,
        *,
        space_type: SpaceType = SpaceType.COSINE,
        quantization: Quantization = Quantization.BF16,
        nprobe: int = 32,
        min_build: int = 4096,
        interpret: bool = False,
    ) -> None:
        self.mesh = mesh
        self.dimensions = dimensions
        self._idx = ShardedIvfIndex(
            mesh,
            dimensions,
            space_type=space_type,
            quantization=quantization,
            nprobe=nprobe,
            interpret=interpret,
        )
        self.min_build = min_build
        self._pending = 0  # rows upserted since the last build

    @property
    def size(self) -> int:
        return self._idx.size

    @property
    def n_shards(self) -> int:
        return int(self.mesh.shape["model"]) * int(self.mesh.shape["data"])

    @property
    def device_bytes(self) -> int:
        total = 0
        for arr in (
            self._idx.main_vecs,
            self._idx.main_paux,
            self._idx.main_pos2slot,
            self._idx.centroids,
            self._idx._delta.vectors,
            self._idx._delta.aux,
            self._idx._delta.valid,
            self._idx._delta.epochs,
        ):
            if arr is not None:
                total += arr.size * arr.dtype.itemsize
        return total

    def upsert_batch(self, slots, epochs, vectors, partitions=None) -> None:
        if partitions is not None and (np.asarray(partitions) >= 0).any():
            raise ValueError("sharded IVF engine serves global indexes only")
        n_new = int(np.asarray(slots).size)
        # the flat delta is bounded; recluster rather than overflow it
        if self._idx._delta_next + n_new > (self._idx._delta.capacity * 3) // 4:
            self._idx.build()
            self._pending = 0
        self._idx.upsert_batch(slots, epochs, vectors)
        self._pending += n_new

    def remove_batch(self, slots) -> None:
        self._idx.remove_batch(np.asarray(slots, dtype=np.int64))

    def maintain(self, budget: int = 0) -> bool:
        """Recluster when the delta has grown past min_build (or is nearing
        capacity); called from the actor's idle slots."""
        near_full = self._idx._delta_next >= self._idx._delta.capacity // 2
        if self._pending >= self.min_build or near_full:
            n = self._idx.size
            self._idx.build()
            self._pending = 0
            logger.info("sharded IVF rebuild: %d rows, nlist=%d", n, self._idx.nlist)
            return True
        return False

    def search(self, queries, k: int, partitions=None) -> list[SearchResult]:
        # NOTE: no build is ever triggered from here — the actor may run two
        # search batches concurrently, and a build swaps main_vecs/paux/
        # centroids under the other thread's feet. Delta overflow is instead
        # prevented at the single mutation site (upsert_batch reclusters at
        # 3/4 capacity, and mutations are exclusive with searches in the
        # actor's scheduling — the reference's permit semantics).
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        b = queries.shape[0]
        k = max(1, min(k, max(self.size, 1)))
        d, s, e = self._idx.search(queries, k)
        return _to_results(d, s, e, b)

    def search_exact_host(self, query, k: int) -> SearchResult:
        """Exact host-side ranking over every live row (the actor's
        terminal escalation step for low-selectivity filters)."""
        idx = self._idx
        slots = np.fromiter(idx._vecs_host.keys(), dtype=np.int64)
        return _exact_host_top_k(
            self.search_exact_host_subset, query, slots, k
        )

    def search_exact_host_subset(
        self, queries: np.ndarray, slots: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Grouped terminal for low-selectivity filters (one BLAS call per
        filter group; see _exact_subset_from_store)."""
        idx = self._idx
        return _exact_subset_from_store(
            queries,
            slots,
            dimensions=self.dimensions,
            space_type=idx.space_type,
            get_row=idx._vecs_host.get,
            get_epoch=lambda s: idx._epochs_host.get(s, -1),
            rows_prenormalized=True,  # upsert_batch normalizes for cosine
        )


class ShardedGraphServingEngine:
    """ShardedGraphIndex behind the actor's engine protocol. The host is
    the capacity tier (slot -> row, like ShardedIvfIndex's host dicts);
    the sharded device graph is (re)built from it in idle slots, sized to
    the live slot range. Rows not yet folded into the per-shard graphs are
    brute-forced exactly from the host until the next build, so every
    upsert is searchable immediately."""

    def __init__(
        self,
        mesh,
        dimensions: int,
        *,
        space_type: SpaceType = SpaceType.COSINE,
        quantization: Quantization = Quantization.BF16,
        connectivity: int = 16,
        expansion_add: int = 64,
        expansion_search: int = 64,
        row_block: int = 512,
        min_build: int = 1024,
    ) -> None:
        self.mesh = mesh
        self.dimensions = dimensions
        self.space_type = space_type
        self.quantization = quantization
        self.connectivity = connectivity
        self.expansion_add = expansion_add
        self.expansion_search = expansion_search
        self.row_block = row_block
        self.min_build = min_build
        self._idx: ShardedGraphIndex | None = None
        # slot -> (f32 vector, epoch): every live row (capacity tier)
        self._store: dict[int, tuple[np.ndarray, int]] = {}
        # slots not yet reachable through the built per-shard graphs
        self._delta: set[int] = set()

    @property
    def size(self) -> int:
        return len(self._store)

    @property
    def n_shards(self) -> int:
        return int(self.mesh.shape["model"]) * int(self.mesh.shape["data"])

    @property
    def device_bytes(self) -> int:
        if self._idx is None:
            return 0
        total = 0
        for arr in (
            self._idx.vectors,
            self._idx.aux,
            self._idx.valid,
            self._idx.epochs,
            self._idx.adjacency,
            self._idx.entries,
        ):
            total += arr.size * arr.dtype.itemsize
        return total

    def upsert_batch(self, slots, epochs, vectors, partitions=None) -> None:
        if partitions is not None and (np.asarray(partitions) >= 0).any():
            raise ValueError("sharded graph engine serves global indexes only")
        slots = np.asarray(slots, dtype=np.int64)
        epochs = np.asarray(epochs, dtype=np.int32)
        vectors = np.asarray(vectors, dtype=np.float32)
        for i, s in enumerate(slots):
            s = int(s)
            self._store[s] = (vectors[i], int(epochs[i]))
            self._delta.add(s)
        if self._idx is not None and slots.size:
            fits = slots < self._idx.capacity
            if fits.any():
                # rows land in the device arrays now (searchable via the
                # host delta until the next build wires their edges);
                # slots past capacity wait for the next build's resize
                self._idx.load_rows(slots[fits], epochs[fits], vectors[fits])

    def remove_batch(self, slots) -> None:
        import jax.numpy as jnp

        slots = np.asarray(slots, dtype=np.int64)
        for s in slots:
            self._store.pop(int(s), None)
            self._delta.discard(int(s))
        if self._idx is not None:
            keep = slots[(slots >= 0) & (slots < self._idx.capacity)]
            if keep.size:
                # beam search skips ~valid nodes; edges rebuild lazily
                self._idx.valid = self._idx.valid.at[jnp.asarray(keep)].set(
                    False
                )

    def maintain(self, budget: int = 0) -> bool:
        """(Re)build the per-shard graphs from the host store; called from
        the actor's idle slots."""
        if not self._delta:
            return False
        if self._idx is not None and len(self._delta) < self.min_build:
            return False
        self._build()
        return True

    def _build(self) -> None:
        if not self._store:
            return
        model = int(self.mesh.shape["model"])
        need = max(self._store.keys()) + 1
        align = model * self.row_block
        cap = -(-need // align) * align
        if self._idx is None or self._idx.capacity < cap:
            self._idx = ShardedGraphIndex(
                self.mesh,
                self.dimensions,
                space_type=self.space_type,
                quantization=self.quantization,
                capacity=cap,
                connectivity=self.connectivity,
                expansion_add=self.expansion_add,
                expansion_search=self.expansion_search,
                row_block=self.row_block,
            )
            slots = np.fromiter(self._store.keys(), dtype=np.int64)
            self._idx.load_rows(
                slots,
                np.asarray([self._store[int(s)][1] for s in slots], np.int32),
                np.stack([self._store[int(s)][0] for s in slots]),
            )
        self._idx.build()
        self._delta.clear()
        logger.info(
            "sharded graph rebuild: %d rows over %d shards",
            len(self._store),
            self.n_shards,
        )

    def search(self, queries, k: int, partitions=None) -> list[SearchResult]:
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        b = queries.shape[0]
        k = max(1, min(k, max(self.size, 1)))
        main = None
        if self._idx is not None:
            d, s, e = self._idx.search(queries, k)
            main = (d, s.astype(np.int64), e)
        delta = self._delta_exact(queries, k)
        if main is None and delta is None:
            z = np.zeros((b, 0))
            return _to_results(z, z.astype(np.int64), z.astype(np.int32), b)
        if delta is None:
            d, s, e = main
        elif main is None:
            d, s, e = delta
        else:
            # the same slot can appear in both (re-upserted after a build);
            # the delta copy is newer — poison the stale main lane
            md, ms, me = main
            dd, ds, de = delta
            in_delta = np.isin(ms, ds[ds >= 0])
            md = np.where(in_delta, np.inf, md)
            d = np.concatenate([md, dd], axis=1)
            s = np.concatenate([ms, ds], axis=1)
            e = np.concatenate([me, de], axis=1)
        d = np.where(s >= 0, d, np.inf)
        sel = np.argsort(d, axis=1, kind="stable")[:, :k]
        d = np.take_along_axis(d, sel, axis=1)
        s = np.take_along_axis(s, sel, axis=1)
        e = np.take_along_axis(e, sel, axis=1)
        s = np.where(np.isfinite(d), s, -1)
        return _to_results(d, s, e, b)

    def search_exact_host(self, query, k: int) -> SearchResult:
        """Exact host-side ranking over every live row (terminal
        escalation step for low-selectivity filters). Read-only: a
        concurrent search batch must never observe a mutated delta set."""
        slots = np.fromiter(self._store.keys(), dtype=np.int64)
        return _exact_host_top_k(
            self.search_exact_host_subset, query, slots, k
        )

    def search_exact_host_subset(
        self, queries: np.ndarray, slots: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Grouped terminal for low-selectivity filters (one BLAS call per
        filter group; see _exact_subset_from_store)."""
        store = self._store

        return _exact_subset_from_store(
            queries,
            slots,
            dimensions=self.dimensions,
            space_type=self.space_type,
            get_row=lambda s: (
                store[s][0] if s in store else None
            ),
            get_epoch=lambda s: store[s][1] if s in store else -1,
            rows_prenormalized=False,  # the store keeps raw f32 rows
        )

    def _delta_exact(self, queries: np.ndarray, k: int):
        """Exact host scan over the unbuilt delta rows (bounded by
        min_build + one modify batch after the first build)."""
        if not self._delta:
            return None
        slots = np.fromiter(self._delta, dtype=np.int64)
        rows = np.stack([self._store[int(s)][0] for s in slots])
        eps = np.asarray([self._store[int(s)][1] for s in slots], np.int32)
        if self.space_type is SpaceType.COSINE:
            qn = queries / np.maximum(
                np.linalg.norm(queries, axis=-1, keepdims=True), 1e-30
            )
            rn = rows / np.maximum(
                np.linalg.norm(rows, axis=-1, keepdims=True), 1e-30
            )
            dist = 1.0 - qn @ rn.T
        elif self.space_type is SpaceType.EUCLIDEAN:
            dist = (
                (queries**2).sum(-1)[:, None]
                + (rows**2).sum(-1)[None, :]
                - 2.0 * queries @ rows.T
            )
            dist = np.maximum(dist, 0.0)
        else:  # dot product: 1 - dot (graph_sharded.py pair convention)
            dist = 1.0 - queries @ rows.T
        kk = min(k, slots.size)
        sel = np.argsort(dist, axis=1, kind="stable")[:, :kk]
        d = np.take_along_axis(dist, sel, axis=1).astype(np.float32)
        s = slots[sel]
        e = eps[sel]
        return d, s, e
