"""A/B timing of ivf_candidates stage variants at the headline shape.

Each variant is the FULL probe->regroup->scan->merge pipeline with one
stage swapped, timed chained-forced (m dependent iterations inside one jit,
one pull forces all), median of 3 timed pulls so a relay weather event on
one pull is visible. Isolated-stage timing proved untrustworthy (the r3
stage profile measured an isolated scan slower than the whole pipeline);
whole-pipeline deltas are the only attribution that survives the relay.

Variants (all exact for final k <= LANES unless marked):
  probe:   exact lax.top_k | chunked two-stage exact | approx_max_k (approx)
  regroup: stable argsort  | cumsum-of-onehot ranks (no sort)
  merge:   full-width gather ([B, nprobe*LANES], top_k at 4096) |
           row-reduced (per-slot-row top-kk first, gather [B, nprobe*kk],
           top_k at nprobe*kk) — exact: a row only holds LANES group minima
           and kk_row = min(k, LANES), so per-row reduction loses nothing.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_vst")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vector_store_tpu.ops.ivf import _grouped_scan, choose_budget
from vector_store_tpu.ops.pallas_scan import (
    INVALID_BIAS,
    INVALID_CUTOFF,
    LANES,
    PAUX_ROWS,
)

B, D = 4096, 128
NLIST, CMAX, NPROBE, K = 2048, 1024, 32, 16
S = choose_budget(B, NPROBE, NLIST)
M = 16

rng = np.random.default_rng(0)
vectors = jax.device_put(
    rng.normal(size=(NLIST * CMAX, D)).astype(np.float32)
).astype(jnp.bfloat16)
paux = jax.device_put(
    np.stack(
        [
            np.full(NLIST * CMAX, -2.0, np.float32),
            rng.normal(size=NLIST * CMAX).astype(np.float32) ** 2,
        ]
        + [np.zeros(NLIST * CMAX, np.float32)] * (PAUX_ROWS - 2)
    )
)
cent = jax.device_put(rng.normal(size=(NLIST, D)).astype(np.float32))
queries = jax.device_put(rng.normal(size=(B, D)).astype(np.float32)).astype(
    jnp.bfloat16
)
q_live = jnp.ones((B,), jnp.bool_)
print(f"S={S}", flush=True)


def probe_exact(aff):
    _, probes = jax.lax.top_k(aff, NPROBE)
    return probes


def probe_chunked(aff):
    b, nlist = aff.shape
    chunk = 256
    nchunk = nlist // chunk
    kv = min(NPROBE, chunk)
    v = aff.reshape(b * nchunk, chunk)
    nv, li = jax.lax.top_k(v, kv)
    gi = li.reshape(b, nchunk, kv) + (
        jnp.arange(nchunk, dtype=jnp.int32)[None, :, None] * chunk
    )
    nv = nv.reshape(b, nchunk * kv)
    gi = gi.reshape(b, nchunk * kv)
    fv, fi = jax.lax.top_k(nv, NPROBE)
    return jnp.take_along_axis(gi, fi, axis=1)


def probe_approx(aff):
    _, probes = jax.lax.approx_max_k(
        aff, NPROBE, recall_target=0.99, aggregate_to_topk=True
    )
    return probes.astype(jnp.int32)


def centroid_aff(cent, q):
    dot = jnp.dot(
        q.astype(jnp.bfloat16),
        cent.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    c2 = jnp.sum(cent * cent, axis=-1)
    return 2.0 * dot - c2[None, :]


def regroup_sort(probes):
    p = B * NPROBE
    pairs_c = probes.reshape(-1).astype(jnp.int32)
    pairs_b = jnp.repeat(jnp.arange(B, dtype=jnp.int32), NPROBE)
    order = jnp.argsort(pairs_c, stable=True)
    sc = pairs_c[order]
    sb = pairs_b[order]
    idx = jnp.arange(p, dtype=jnp.int32)
    is_new = jnp.concatenate([jnp.ones((1,), jnp.bool_), sc[1:] != sc[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    rank = idx - seg_start
    ok = (rank < S) & (sc < NLIST)
    row = sc * S + jnp.minimum(rank, S - 1)
    scatter_row = jnp.where(ok, row, NLIST * S)
    qtab = jnp.zeros((NLIST * S,), jnp.int32).at[scatter_row].set(sb, mode="drop")
    filled = (
        jnp.zeros((NLIST * S,), jnp.bool_).at[scatter_row].set(True, mode="drop")
    )
    row_of_pair = (
        jnp.full((p,), -1, jnp.int32)
        .at[order]
        .set(jnp.where(ok, row, -1))
        .reshape(B, NPROBE)
    )
    return qtab, filled, row_of_pair


def regroup_cumsum(probes):
    probes = probes.astype(jnp.int32)
    onehot = (
        jnp.zeros((B, NLIST + 1), jnp.int32)
        .at[jnp.arange(B, dtype=jnp.int32)[:, None], probes]
        .add(1)
    )
    before = jnp.cumsum(onehot, axis=0) - onehot
    rank = jnp.take_along_axis(before, probes, axis=1)  # [B, nprobe]
    ok = (rank < S) & (probes < NLIST)
    row = probes * S + jnp.minimum(rank, S - 1)
    row_of_pair = jnp.where(ok, row, -1)
    scatter_row = jnp.where(ok, row, NLIST * S).reshape(-1)
    sb = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, NPROBE)
    ).reshape(-1)
    qtab = jnp.zeros((NLIST * S,), jnp.int32).at[scatter_row].set(sb, mode="drop")
    filled = (
        jnp.zeros((NLIST * S,), jnp.bool_).at[scatter_row].set(True, mode="drop")
    )
    return qtab, filled, row_of_pair


def merge_full(rank_out, off_out, filled, row_of_pair):
    rank_out = jnp.where(filled[:, None], rank_out, INVALID_BIAS)
    slot_cluster = jnp.arange(NLIST * S, dtype=jnp.int32) // S
    pos_out = (
        slot_cluster[:, None] * CMAX
        + off_out.astype(jnp.int32)
        + jnp.arange(LANES, dtype=jnp.int32)[None, :]
    )
    safe_row = jnp.maximum(row_of_pair, 0)
    live_pair = (row_of_pair >= 0)[:, :, None]
    cand_rank = jnp.where(live_pair, rank_out[safe_row], INVALID_BIAS).reshape(
        B, NPROBE * LANES
    )
    cand_pos = pos_out[safe_row].reshape(B, NPROBE * LANES)
    neg, sel = jax.lax.top_k(-cand_rank, K)
    best_rank = -neg
    best_pos = jnp.take_along_axis(cand_pos, sel, axis=1)
    best_pos = jnp.where(best_rank < INVALID_CUTOFF, best_pos, -1)
    return best_rank, best_pos


def merge_reduced(rank_out, off_out, filled, row_of_pair):
    kk_row = min(K, LANES)
    rank_out = jnp.where(filled[:, None], rank_out, INVALID_BIAS)
    negr, sel_row = jax.lax.top_k(-rank_out, kk_row)  # [nlist*S, kk_row]
    rank_red = -negr
    off_sel = jnp.take_along_axis(off_out, sel_row, axis=1).astype(jnp.int32)
    slot_cluster = jnp.arange(NLIST * S, dtype=jnp.int32) // S
    pos_red = slot_cluster[:, None] * CMAX + off_sel + sel_row
    safe_row = jnp.maximum(row_of_pair, 0)
    live_pair = (row_of_pair >= 0)[:, :, None]
    cand_rank = jnp.where(live_pair, rank_red[safe_row], INVALID_BIAS).reshape(
        B, NPROBE * kk_row
    )
    cand_pos = pos_red[safe_row].reshape(B, NPROBE * kk_row)
    neg, sel = jax.lax.top_k(-cand_rank, K)
    best_rank = -neg
    best_pos = jnp.take_along_axis(cand_pos, sel, axis=1)
    best_pos = jnp.where(best_rank < INVALID_CUTOFF, best_pos, -1)
    return best_rank, best_pos


PROBES = {"exact": probe_exact, "chunk": probe_chunked, "approx": probe_approx}
REGROUPS = {"sort": regroup_sort, "csum": regroup_cumsum}
MERGES = {"full": merge_full, "red": merge_reduced}


def pipeline(vectors, paux, cent, q, probe, regroup, merge):
    aff = centroid_aff(cent, q)
    probes = jnp.where(q_live[:, None], probe(aff), NLIST)
    qtab, filled, row_of_pair = regroup(probes)
    qg = q[qtab]
    rank_out, off_out = _grouped_scan(qg, vectors, paux, s=S, cmax=CMAX)
    return merge(rank_out, off_out, filled, row_of_pair)


def run_variant(name, pk, rk, mk):
    probe, regroup, merge = PROBES[pk], REGROUPS[rk], MERGES[mk]

    @functools.partial(jax.jit, static_argnames=("m",))
    def chain(vectors, paux, cent, q0, *, m):
        def body(_, q):
            br, _bp = pipeline(vectors, paux, cent, q, probe, regroup, merge)
            return q + (br[:, :1] * 1e-34).astype(q.dtype)

        q = jax.lax.fori_loop(0, m, body, q0)
        return pipeline(vectors, paux, cent, q, probe, regroup, merge)

    np.asarray(chain(vectors, paux, cent, queries, m=M)[0])  # compile+warm
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(chain(vectors, paux, cent, queries, m=M)[0])
        times.append((time.time() - t0) / (M + 1))
    med = float(np.median(times))
    print(
        f"{name:26s} {med * 1e3:7.2f} ms/iter  ({B / med:8.0f} qps)"
        f"   runs={[f'{t * 1e3:.1f}' for t in times]}",
        flush=True,
    )
    return med


def check_equivalence():
    """New combo must return the same candidate SET as the baseline
    (ordering ties aside): compare sorted rank values."""
    r0, p0 = jax.jit(
        lambda v, a, c, q: pipeline(v, a, c, q, probe_exact, regroup_sort, merge_full)
    )(vectors, paux, cent, queries)
    r1, p1 = jax.jit(
        lambda v, a, c, q: pipeline(
            v, a, c, q, probe_exact, regroup_cumsum, merge_reduced
        )
    )(vectors, paux, cent, queries)
    r0, r1 = np.sort(np.asarray(r0), axis=1), np.sort(np.asarray(r1), axis=1)
    bad = np.max(np.abs(r0 - r1))
    print(f"equivalence (exact/csum/red vs baseline): max rank diff {bad:.3e}",
          flush=True)
    # approx probe: report candidate overlap, not equality
    ra, _ = jax.jit(
        lambda v, a, c, q: pipeline(
            v, a, c, q, probe_approx, regroup_cumsum, merge_reduced
        )
    )(vectors, paux, cent, queries)
    ra = np.sort(np.asarray(ra), axis=1)
    same = np.mean(np.isclose(ra, r1, rtol=1e-5))
    print(f"approx probe rank-value agreement: {same:.4f}", flush=True)


if __name__ == "__main__":
    base = run_variant("baseline exact/sort/full", "exact", "sort", "full")
    run_variant("probe=chunk", "chunk", "sort", "full")
    run_variant("probe=approx", "approx", "sort", "full")
    run_variant("regroup=csum", "exact", "csum", "full")
    run_variant("merge=red", "exact", "sort", "red")
    best = run_variant("combo exact/csum/red", "exact", "csum", "red")
    run_variant("combo chunk/csum/red", "chunk", "csum", "red")
    run_variant("combo approx/csum/red", "approx", "csum", "red")
    check_equivalence()
    print(f"speedup best-exact vs baseline: {base / best:.2f}x", flush=True)
