"""Top-k (smallest-distance) selection primitives.

`merge_min_k` keeps a running [B, k] best set while scanning row blocks, so a
flat search never materializes a [B, N] distance matrix. Exact selection uses
lax.top_k; `approx=True` switches to lax.approx_min_k (TPU-optimized partial
reduction, the right default for recall-targeted ANN serving).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def min_k(
    distances: jax.Array, ids: jax.Array, k: int, approx: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Smallest-k along the last axis. distances [B, N] f32, ids [B, N] i32.
    Returns ([B, k] dists, [B, k] ids) sorted ascending by distance.
    When N < k the result is padded with (+inf, -1) lanes."""
    n = distances.shape[-1]
    if n < k:
        pad = k - n
        b = distances.shape[0]
        distances = jnp.concatenate(
            [distances, jnp.full((b, pad), jnp.inf, dtype=distances.dtype)], axis=-1
        )
        ids = jnp.concatenate(
            [ids, jnp.full((b, pad), -1, dtype=ids.dtype)], axis=-1
        )
    if approx:
        d, pos = jax.lax.approx_min_k(distances, k)
    else:
        negd, pos = jax.lax.top_k(-distances, k)
        d = -negd
    out_ids = jnp.take_along_axis(ids, pos, axis=-1)
    return d, out_ids


def merge_min_k(
    best_d: jax.Array,  # [B, k]
    best_i: jax.Array,  # [B, k]
    new_d: jax.Array,  # [B, m]
    new_i: jax.Array,  # [B, m]
    approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Merge a new candidate block into the running best-k set."""
    k = best_d.shape[-1]
    cand_d = jnp.concatenate([best_d, new_d], axis=-1)
    cand_i = jnp.concatenate([best_i, new_i], axis=-1)
    return min_k(cand_d, cand_i, k, approx=approx)
