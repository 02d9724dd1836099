"""Sharded IVF search over a 2-D device mesh — the beyond-HBM scale-out of
the IVF engine (engine/ivf.py).

Layout (mesh axes ("data", "model"), matching parallel/sharded.py):
- clusters shard over "model": each chip owns nlist/m whole clusters —
  cluster-major rows `[npos/m, Dp]`, their rank coefficients, and the
  position->slot map. Centroids are replicated (tiny).
- the query batch shards over "data".

Search is one shard_map'ed program per chip: probe ALL centroids (global
cluster ids), translate to local ids (non-local probes park at the local
sentinel so the packing drops them — a probe touches exactly one chip),
run the grouped fused scan over the local clusters, then all-gather the
per-chip (rank, slot) candidates over ICI and merge. The only collective
in the hot path is that single all-gather, exactly like the sharded flat
scan.

k-means is SPMD: every chip assigns its local rows and contributes partial
one-hot centroid sums via psum over "model" — the classic data-parallel
Lloyd's iteration on the MXU.

Incremental upserts after build land in a sharded flat delta
(ShardedFlatIndex) and merge with the IVF candidates host-side; rebuilds
recluster from the host vector store (the host, like the reference's, is
the capacity tier — ScyllaDB remains the source of truth).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.engine.flat import pull_packed, unpack_results
from vector_store_tpu.ops.ivf import (
    choose_cmax,
    choose_nlist,
    choose_budget,
    ivf_candidates,
    ivf_probe,
)
from vector_store_tpu.ops.pallas_scan import INVALID_BIAS, INVALID_CUTOFF
from vector_store_tpu.ops.quantize import (
    padded_dim,
    quantize_for_storage,
    storage_dtype,
)
from vector_store_tpu.parallel.sharded import ShardedFlatIndex


def sharded_kmeans_step(
    mesh: Mesh, *, nlist: int, block: int, spherical: bool
):
    """One SPMD Lloyd iteration: local assignment + psum'd centroid sums.
    Returns jitted (x_local_sharded, w_sharded, centroids) -> centroids."""

    def one_iter(x, w, cent):
        n_local = x.shape[0]
        nblk = max(n_local // block, 1)
        rows = n_local // nblk

        def affinity(xb, cent):
            dot = jnp.dot(
                xb.astype(jnp.bfloat16),
                cent.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            if spherical:
                cn = jnp.sqrt(jnp.sum(cent * cent, axis=-1))
                return dot / jnp.maximum(cn, 1e-20)[None, :]
            c2 = jnp.sum(cent * cent, axis=-1)
            return 2.0 * dot - c2[None, :]

        def body(i, carry):
            sums, counts = carry
            xb = jax.lax.dynamic_slice_in_dim(x, i * rows, rows, 0)
            wb = jax.lax.dynamic_slice_in_dim(w, i * rows, rows, 0)
            lbl = jnp.argmax(affinity(xb, cent), axis=-1)
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
                jnp.zeros((nlist, x.shape[1]), jnp.float32),
                jnp.zeros((nlist,), jnp.float32),
            ),
        )
        sums = jax.lax.psum(sums, "model")
        counts = jax.lax.psum(counts, "model")
        newc = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0.5)[:, None], newc, cent)

    mapped = jax.shard_map(
        one_iter,
        mesh=mesh,
        in_specs=(P("model", None), P("model"), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_ivf_search_step(
    mesh: Mesh,
    *,
    k: int,
    nprobe: int,
    s: int,
    cmax: int,
    nlist_local: int,
    spherical: bool,
    interpret: bool = False,
):
    """Returns jitted (vectors, paux, pos2slot, centroids, queries, q_live)
    -> [2, B, k] (rank f32, engine slot int32 bitcast), data-sharded."""

    def local_search(vectors, paux, pos2slot, centroids, queries, q_live):
        lo = jax.lax.axis_index("model") * nlist_local
        probes = ivf_probe(
            centroids, queries, q_live, nprobe=nprobe, spherical=spherical
        )
        local = probes - lo
        local = jnp.where(
            (local >= 0) & (local < nlist_local), local, nlist_local
        )
        # dropped counts are ignored here: each shard owns nlist/n_shards
        # clusters so per-cluster slot pressure is n_shards x lower than the
        # single-chip path at the same S; the host engine (engine/ivf.py)
        # carries the retry logic for the serving path
        packed, _dropped = ivf_candidates(
            vectors,
            paux,
            centroids,  # unused when probes are given
            queries,
            q_live,
            k=k,
            nprobe=nprobe,
            s=s,
            cmax=cmax,
            spherical=spherical,
            interpret=interpret,
            probes=local,
        )
        pos = jax.lax.bitcast_convert_type(packed[1], jnp.int32)
        slot = jnp.where(pos >= 0, pos2slot[jnp.maximum(pos, 0)], -1)
        rank = jnp.where(slot >= 0, packed[0], INVALID_BIAS)
        all_rank = jax.lax.all_gather(rank, "model", axis=1, tiled=True)
        all_slot = jax.lax.all_gather(slot, "model", axis=1, tiled=True)
        neg, sel = jax.lax.top_k(-all_rank, k)
        slots = jnp.take_along_axis(all_slot, sel, axis=1)
        slots = jnp.where(-neg < INVALID_CUTOFF, slots, -1)
        return jnp.stack(
            [-neg, jax.lax.bitcast_convert_type(slots, jnp.float32)]
        )

    mapped = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P("model", None),  # cluster-major rows
            P(None, "model"),  # paux
            P("model"),  # pos2slot
            P(None, None),  # centroids (replicated)
            P("data", None),  # queries
            P("data"),  # q_live
        ),
        out_specs=P(None, "data", None),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_invalidate_step(mesh: Mesh):
    """Jitted (paux, pos2slot, positions) -> (paux, pos2slot) with the
    given global positions tombstoned (each shard applies what it owns)."""

    def local(paux, pos2slot, positions):
        npos_local = pos2slot.shape[0]
        off = jax.lax.axis_index("model") * npos_local
        local_pos = positions - off
        mine = (local_pos >= 0) & (local_pos < npos_local)
        safe = jnp.where(mine, local_pos, npos_local)
        paux = paux.at[1, safe].set(INVALID_BIAS, mode="drop")
        pos2slot = pos2slot.at[safe].set(-1, mode="drop")
        return paux, pos2slot

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "model"), P("model"), P(None)),
        out_specs=(P(None, "model"), P("model")),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


class ShardedIvfIndex:
    """IVF index sharded across a mesh: host vector store as the capacity
    tier, clustered device regions rebuilt from it, sharded flat delta for
    post-build upserts."""

    def __init__(
        self,
        mesh: Mesh,
        dimensions: int,
        space_type: SpaceType = SpaceType.COSINE,
        quantization: Quantization = Quantization.BF16,
        nprobe: int = 32,
        headroom: float = 1.6,
        kmeans_iters: int = 8,
        delta_capacity: int = 1 << 17,
        interpret: bool = False,
        s_boost: int = 8,
    ) -> None:
        self.mesh = mesh
        self.model = mesh.shape["model"]
        self.dimensions = dimensions
        self.space_type = space_type
        self.quantization = quantization
        self.nprobe = nprobe
        # Skew headroom over the balanced per-cluster slot estimate: real
        # query batches are clustered, and this path cannot re-dispatch
        # dropped pairs (the step drops them inside the shard_map), so it
        # buys drop-freedom with budget up front. Bounded by the per-query
        # cap inside search() — see engine/ivf.py _serving_s for the
        # single-chip measurement (s=8x costs ~nothing; the regroup sort
        # dominates).
        self.s_boost = max(1, int(s_boost))
        self.headroom = headroom
        self.kmeans_iters = kmeans_iters
        self.interpret = interpret
        self.dp = padded_dim(dimensions, quantization)
        self._spherical = space_type is not SpaceType.EUCLIDEAN

        # host capacity tier: slot -> vector/epoch (rebuild source)
        self._vecs_host: dict[int, np.ndarray] = {}
        self._epochs_host: dict[int, int] = {}

        self.main_vecs = None
        self.main_paux = None
        self.main_pos2slot = None
        self.centroids = None
        self.nlist = 0
        self.cmax = 0
        self._pos_of_slot: dict[int, int] = {}
        self._search_cache: dict[tuple, object] = {}
        self._invalidate = sharded_invalidate_step(mesh)

        self._delta = ShardedFlatIndex(
            mesh,
            dimensions,
            space_type=space_type,
            quantization=quantization,
            capacity=delta_capacity,
        )
        self._delta_pos_of_slot: dict[int, int] = {}
        self._delta_slot_of_pos: dict[int, int] = {}
        self._delta_next = 0

    @property
    def size(self) -> int:
        return len(self._vecs_host)

    # -- mutation ---------------------------------------------------------------

    def upsert_batch(
        self, slots: np.ndarray, epochs: np.ndarray, vectors: np.ndarray
    ) -> None:
        slots = np.asarray(slots, dtype=np.int64)
        epochs = np.asarray(epochs, dtype=np.int32)
        vectors = np.asarray(vectors, dtype=np.float32)
        if self.space_type is SpaceType.COSINE:
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=-1, keepdims=True), 1e-30
            )
        stale_main = [
            self._pos_of_slot.pop(int(s))
            for s in slots
            if int(s) in self._pos_of_slot
        ]
        if stale_main:
            self.main_paux, self.main_pos2slot = self._invalidate(
                self.main_paux,
                self.main_pos2slot,
                jnp.asarray(np.asarray(stale_main, np.int32)),
            )
        for i, s in enumerate(slots):
            s = int(s)
            self._vecs_host[s] = vectors[i]
            self._epochs_host[s] = int(epochs[i])
        # rows serve from the sharded flat delta until the next build folds
        # them into the clustered main region; pre-build this IS the engine
        # (exact sharded scan), matching the single-chip IvfDeviceIndex's
        # flat-until-build serving policy
        dpos = np.empty((slots.size,), dtype=np.int64)
        for i, s in enumerate(slots):
            s = int(s)
            p = self._delta_pos_of_slot.get(s)
            if p is None:
                p = self._delta_next
                self._delta_next += 1
                self._delta_pos_of_slot[s] = p
                self._delta_slot_of_pos[p] = s
            dpos[i] = p
        if self._delta_next > self._delta.capacity:
            raise RuntimeError(
                "sharded IVF delta full; call build() to recluster"
            )
        self._delta.upsert_batch(dpos, epochs, vectors)

    def remove_batch(self, slots: np.ndarray) -> None:
        gone_main = []
        for s in np.asarray(slots, dtype=np.int64):
            s = int(s)
            self._vecs_host.pop(s, None)
            self._epochs_host.pop(s, None)
            p = self._pos_of_slot.pop(s, None)
            if p is not None:
                gone_main.append(p)
            dp_ = self._delta_pos_of_slot.pop(s, None)
            if dp_ is not None:
                self._delta_slot_of_pos.pop(dp_, None)
                self._delta.valid = self._delta.valid.at[dp_].set(False)
        if gone_main:
            self.main_paux, self.main_pos2slot = self._invalidate(
                self.main_paux,
                self.main_pos2slot,
                jnp.asarray(np.asarray(gone_main, np.int32)),
            )

    # -- build --------------------------------------------------------------------

    def build(self) -> None:
        """(Re)cluster all live vectors into the sharded main region."""
        slots = np.fromiter(self._vecs_host.keys(), dtype=np.int64)
        n = slots.size
        if n == 0:
            return
        nlist = choose_nlist(n)
        # whole clusters per shard
        nlist = max(nlist, self.model)
        nlist = -(-nlist // self.model) * self.model
        cmax = choose_cmax(n, nlist, self.headroom)
        npos = nlist * cmax

        rows = np.stack([self._vecs_host[int(s)] for s in slots])
        vals = quantize_for_storage(rows, self.quantization)
        pad = self.dp - vals.shape[-1]
        if pad:
            vals = np.pad(vals, [(0, 0), (0, pad)])

        # SPMD k-means over row-sharded data
        block = 256
        n_pad = -(-n // (self.model * block)) * (self.model * block)
        x_host = np.zeros((n_pad, self.dp), dtype=vals.dtype)
        x_host[:n] = vals
        w_host = np.zeros((n_pad,), np.float32)
        w_host[:n] = 1.0
        xspec = NamedSharding(self.mesh, P("model", None))
        wspec = NamedSharding(self.mesh, P("model"))
        x = jax.device_put(jnp.asarray(x_host), xspec)
        w = jax.device_put(jnp.asarray(w_host), wspec)
        # init: first nlist live rows (host picks; replicated)
        sel = np.linspace(0, n - 1, nlist).astype(np.int64)
        cent = jnp.asarray(rows[sel][:, : self.dp].astype(np.float32))
        if cent.shape[1] < self.dp:
            cent = jnp.pad(cent, ((0, 0), (0, self.dp - cent.shape[1])))
        step = sharded_kmeans_step(
            self.mesh, nlist=nlist, block=block, spherical=self._spherical
        )
        for _ in range(self.kmeans_iters):
            cent = step(x, w, cent)

        # final assignment + layout on host (rebuilds are rare and the
        # host already holds every row)
        centf = np.asarray(cent)
        xf = vals.astype(np.float32)
        if self._spherical:
            cn = np.maximum(np.linalg.norm(centf, axis=1), 1e-20)
            aff = xf @ centf.T / cn[None, :]
        else:
            aff = 2.0 * xf @ centf.T - (centf * centf).sum(1)[None, :]
        labels = aff.argmax(1)
        order = np.argsort(labels, kind="stable")
        ranks = np.arange(n) - np.maximum.accumulate(
            np.where(
                np.concatenate([[True], labels[order][1:] != labels[order][:-1]]),
                np.arange(n),
                0,
            )
        )
        pos_sorted = labels[order] * cmax + ranks
        fits = ranks < cmax
        pos = np.full((n,), -1, dtype=np.int64)
        pos[order[fits]] = pos_sorted[fits]

        vecs_h = np.zeros((npos, self.dp), dtype=vals.dtype)
        paux_h = np.zeros((8, npos), np.float32)
        paux_h[1] = INVALID_BIAS
        p2s_h = np.full((npos,), -1, np.int32)
        placed = pos >= 0
        vecs_h[pos[placed]] = vals[placed]
        if self.space_type is SpaceType.EUCLIDEAN:
            paux_h[0, pos[placed]] = -2.0
            paux_h[1, pos[placed]] = (
                (vals[placed].astype(np.float64) ** 2).sum(-1).astype(np.float32)
            )
        else:
            paux_h[0, pos[placed]] = -1.0
            paux_h[1, pos[placed]] = 0.0
        p2s_h[pos[placed]] = slots[placed]

        vspec = NamedSharding(self.mesh, P("model", None))
        self.main_vecs = jax.device_put(jnp.asarray(vecs_h), vspec)
        self.main_paux = jax.device_put(
            jnp.asarray(paux_h), NamedSharding(self.mesh, P(None, "model"))
        )
        self.main_pos2slot = jax.device_put(
            jnp.asarray(p2s_h), NamedSharding(self.mesh, P("model"))
        )
        self.centroids = jax.device_put(
            cent, NamedSharding(self.mesh, P(None, None))
        )
        self.nlist = nlist
        self.cmax = cmax
        self._pos_of_slot = {
            int(s): int(p) for s, p in zip(slots[placed], pos[placed])
        }
        self._search_cache.clear()

        # fresh delta; spill unplaced rows back through the delta
        self._delta = ShardedFlatIndex(
            self.mesh,
            self.dimensions,
            space_type=self.space_type,
            quantization=self.quantization,
            capacity=self._delta.capacity,
        )
        self._delta_pos_of_slot.clear()
        self._delta_slot_of_pos.clear()
        self._delta_next = 0
        if (~placed).any():
            sp = slots[~placed]
            self.upsert_batch(
                sp,
                np.asarray([self._epochs_host[int(s)] for s in sp], np.int32),
                rows[~placed],
            )

    # -- search -------------------------------------------------------------------

    def search(self, queries: np.ndarray, k: int):
        """-> (distances [B, k], slots [B, k], epochs [B, k]); -1 slots pad."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if self.space_type is SpaceType.COSINE:
            queries = queries / np.maximum(
                np.linalg.norm(queries, axis=-1, keepdims=True), 1e-30
            )
        b_real = queries.shape[0]
        dpar = self.mesh.shape["data"]
        pad = (-b_real) % max(dpar * 8, 8)
        qp = np.pad(queries, [(0, pad), (0, 0)]) if pad else queries
        b = qp.shape[0]

        main = None
        if self.main_vecs is not None:
            qs = quantize_for_storage(qp, self.quantization)
            dpad = self.dp - qs.shape[-1]
            if dpad:
                qs = np.pad(qs, [(0, 0), (0, dpad)])
            q_live = np.zeros((b,), bool)
            q_live[:b_real] = True
            nprobe = min(self.nprobe, self.nlist)
            s = choose_budget(
                b // dpar, nprobe, self.nlist // self.model
            )
            # skew boost, capped at the per-shard batch: a query holds at
            # most one slot per cluster, so s = b/dpar guarantees zero
            # drops even when every query probes the same cluster (the
            # sharded path has no re-dispatch, so the cap must be an exact
            # ceiling, not a power-of-2 floor that can undershoot it)
            bcap = max(16, b // dpar)
            s = min(s * self.s_boost, bcap)
            key = (k, b, nprobe, s)
            step = self._search_cache.get(key)
            if step is None:
                step = sharded_ivf_search_step(
                    self.mesh,
                    k=k,
                    nprobe=nprobe,
                    s=s,
                    cmax=self.cmax,
                    nlist_local=self.nlist // self.model,
                    spherical=self._spherical,
                    interpret=self.interpret,
                )
                self._search_cache[key] = step
            packed = np.asarray(
                pull_packed(
                    step(
                        self.main_vecs,
                        self.main_paux,
                        self.main_pos2slot,
                        self.centroids,
                        jnp.asarray(qs),
                        jnp.asarray(q_live),
                    )
                )
            )
            rank = packed[0][:b_real]
            slot = packed[1].view(np.int32)[:b_real]
            if self.space_type is SpaceType.EUCLIDEAN:
                q2 = (queries.astype(np.float64) ** 2).sum(-1).astype(np.float32)
                dist = rank + q2[:, None]
            else:
                dist = 1.0 + rank
            dist = np.where(slot >= 0, dist, np.inf)
            main = (dist, slot)

        # delta region (post-build upserts) through the sharded flat scan
        delta = None
        if self._delta_next > 0:
            dd, di, _ = self._delta.search(queries, min(k, self._delta_next))
            dslot = np.full_like(di, -1, dtype=np.int64)
            ok = di >= 0
            dslot[ok] = [
                self._delta_slot_of_pos.get(int(p), -1) for p in di[ok]
            ]
            dd = np.where(dslot >= 0, dd, np.inf)
            delta = (dd, dslot)

        if main is None and delta is None:
            z = np.zeros((b_real, 0))
            return z, z.astype(np.int64), z.astype(np.int32)
        if delta is None:
            dist, slot = main
        elif main is None:
            dist, slot = delta
        else:
            dist = np.concatenate([main[0], delta[0]], axis=1)
            slot = np.concatenate([main[1], delta[1]], axis=1)
        sel = np.argsort(dist, axis=1)[:, :k]
        dist = np.take_along_axis(dist, sel, axis=1)
        slot = np.take_along_axis(slot, sel, axis=1).astype(np.int64)
        slot = np.where(np.isfinite(dist), slot, -1)
        epochs = np.asarray(
            [
                [self._epochs_host.get(int(s), -1) for s in row]
                for row in slot
            ],
            dtype=np.int32,
        )
        return dist, slot, epochs
