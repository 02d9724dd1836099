"""Sharded exact search over a 2-D device mesh.

Layout:
- mesh axes ("data", "model"): query batch shards over "data", vector rows
  shard over "model" (each chip holds N/model_parallelism rows + their aux/
  valid/epoch metadata).
- search: every chip scores its row shard against its query shard on the
  MXU, reduces to a local top-k, then an all-gather over "model" (ICI)
  collects the per-chip candidates and a final merge yields the global
  top-k, replicated over "model" and still sharded over "data".
- upsert: scatter of new rows into the owning shard via masked updates (a
  row's owner = slot // rows_per_shard), no collectives needed.

All steps are shard_map'ed and jit-compiled; the host-side ShardedFlatIndex
mirrors FlatDeviceIndex's API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vector_store_tpu.core.types import Quantization, SpaceType
from vector_store_tpu.engine.flat import _pack_results, pull_packed, unpack_results
from vector_store_tpu.ops.distance import pairwise_distance, prepare_queries
from vector_store_tpu.ops.quantize import padded_dim, quantize_for_storage, storage_dtype
from vector_store_tpu.ops.distance import vector_aux
from vector_store_tpu.ops.topk import merge_min_k, min_k


def make_mesh(
    n_devices: int | None = None, data: int = 1, devices: list | None = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % data != 0:
        raise ValueError(f"{n} devices not divisible by data={data}")
    model = n // data
    return Mesh(np.array(devices).reshape(data, model), ("data", "model"))


def sharded_search_step(
    mesh: Mesh,
    space: SpaceType,
    quant: Quantization,
    k: int,
    block_rows: int,
):
    """Returns a jitted searcher(vectors, aux, valid, epochs, queries,
    q_aux) -> packed [3, B, k] results (data-sharded, model-replicated)."""

    def local_search(vectors, aux, valid, epochs, queries, q_aux):
        # local shard shapes
        n_local = vectors.shape[0]
        b = queries.shape[0]
        shard = jax.lax.axis_index("model")
        offset = shard * n_local
        inf = jnp.float32(jnp.inf)
        nblocks = max(n_local // block_rows, 1)
        rows = n_local // nblocks

        init_d = jnp.full((b, k), inf, dtype=jnp.float32)
        init_i = jnp.full((b, k), -1, dtype=jnp.int32)

        def body(carry, i):
            best_d, best_i = carry
            start = i * rows
            vb = jax.lax.dynamic_slice_in_dim(vectors, start, rows, 0)
            ab = jax.lax.dynamic_slice_in_dim(aux, start, rows, 0)
            valb = jax.lax.dynamic_slice_in_dim(valid, start, rows, 0)
            d = pairwise_distance(queries, vb, space, quant, q_aux, ab)
            d = jnp.where(valb[None, :], d, inf)
            ids = offset + start + jax.lax.broadcasted_iota(jnp.int32, (b, rows), 1)
            return merge_min_k(best_d, best_i, d, ids), None

        (best_d, best_i), _ = jax.lax.scan(
            body, (init_d, init_i), jnp.arange(nblocks, dtype=jnp.int32)
        )

        # collect per-shard candidates over ICI and merge
        all_d = jax.lax.all_gather(best_d, "model", axis=1, tiled=True)  # [B, S*k]
        all_i = jax.lax.all_gather(best_i, "model", axis=1, tiled=True)
        fin_d, fin_i = min_k(all_d, all_i, k)

        # local epochs only cover this shard; gather the winners' epochs
        local_pos = fin_i - offset
        in_shard = (local_pos >= 0) & (local_pos < n_local) & (fin_i >= 0)
        safe = jnp.clip(local_pos, 0, n_local - 1)
        eloc = jnp.where(in_shard, epochs[safe], 0)
        fin_e = jax.lax.psum(eloc, "model")  # exactly one shard contributes
        fin_e = jnp.where(fin_i >= 0, fin_e, -1)
        return _pack_results(fin_d, fin_i, fin_e)

    mapped = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P("model", None),  # vectors
            P("model"),  # aux
            P("model"),  # valid
            P("model"),  # epochs
            P("data", None),  # queries
            P("data"),  # q_aux
        ),
        out_specs=P(None, "data", None),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_upsert_step(mesh: Mesh):
    """Returns a jitted upsert(vectors, aux, valid, epochs, slots, vals,
    new_aux, new_epochs): each shard applies only the rows it owns."""

    def local_upsert(vectors, aux, valid, epochs, slots, vals, new_aux, new_epochs):
        n_local = vectors.shape[0]
        shard = jax.lax.axis_index("model")
        offset = shard * n_local
        local = slots - offset
        mine = (local >= 0) & (local < n_local)
        # rows this shard doesn't own scatter out-of-bounds and are dropped
        safe = jnp.where(mine, local, n_local)
        vectors = vectors.at[safe].set(vals, mode="drop")
        aux = aux.at[safe].set(new_aux, mode="drop")
        epochs = epochs.at[safe].set(new_epochs, mode="drop")
        valid = valid.at[safe].set(True, mode="drop")
        return vectors, aux, valid, epochs

    mapped = jax.shard_map(
        local_upsert,
        mesh=mesh,
        in_specs=(
            P("model", None),
            P("model"),
            P("model"),
            P("model"),
            P(None),  # slots replicated
            P(None, None),  # vals replicated
            P(None),
            P(None),
        ),
        out_specs=(P("model", None), P("model"), P("model"), P("model")),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1, 2, 3))


class ShardedFlatIndex:
    """Flat exact index sharded across a mesh. Capacity must be a multiple
    of (model_parallelism * block_rows)."""

    def __init__(
        self,
        mesh: Mesh,
        dimensions: int,
        space_type: SpaceType = SpaceType.COSINE,
        quantization: Quantization = Quantization.F32,
        capacity: int = 1 << 20,
        block_rows: int = 8192,
    ) -> None:
        self.mesh = mesh
        self.space_type = space_type
        self.quantization = quantization
        self.dimensions = dimensions
        self.dp = padded_dim(dimensions, quantization)
        model = mesh.shape["model"]
        per = -(-capacity // (model * block_rows)) * block_rows
        self.capacity = per * model
        self.block_rows = block_rows

        dt = storage_dtype(quantization)
        vspec = NamedSharding(mesh, P("model", None))
        sspec = NamedSharding(mesh, P("model"))
        self.vectors = jax.device_put(jnp.zeros((self.capacity, self.dp), dtype=dt), vspec)
        self.aux = jax.device_put(jnp.zeros((self.capacity,), dtype=jnp.float32), sspec)
        self.valid = jax.device_put(jnp.zeros((self.capacity,), dtype=jnp.bool_), sspec)
        self.epochs = jax.device_put(jnp.full((self.capacity,), -1, dtype=jnp.int32), sspec)

        self._upsert = sharded_upsert_step(mesh)
        self._search_cache: dict[int, object] = {}

    def upsert_batch(self, slots: np.ndarray, epochs: np.ndarray, vectors: np.ndarray) -> None:
        vals = quantize_for_storage(np.asarray(vectors, np.float32), self.quantization)
        pad = self.dp - vals.shape[-1]
        if pad:
            vals = np.pad(vals, [(0, 0), (0, pad)])
        new_aux = vector_aux(vals, self.space_type, self.quantization)
        self.vectors, self.aux, self.valid, self.epochs = self._upsert(
            self.vectors,
            self.aux,
            self.valid,
            self.epochs,
            jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(vals),
            jnp.asarray(new_aux),
            jnp.asarray(np.asarray(epochs, np.int32)),
        )

    def search(self, queries: np.ndarray, k: int):
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b_real = queries.shape[0]
        dp = self.mesh.shape["data"]
        pad = (-b_real) % dp
        if pad:
            queries = np.pad(queries, [(0, pad), (0, 0)])
        qs, q_aux = prepare_queries(queries, self.space_type, self.quantization)
        step = self._search_cache.get(k)
        if step is None:
            step = sharded_search_step(
                self.mesh, self.space_type, self.quantization, k, self.block_rows
            )
            self._search_cache[k] = step
        packed = step(
            self.vectors,
            self.aux,
            self.valid,
            self.epochs,
            jnp.asarray(qs),
            jnp.asarray(q_aux),
        )
        d, i, e = unpack_results(pull_packed(packed))
        return d[:b_real], i[:b_real], e[:b_real]
