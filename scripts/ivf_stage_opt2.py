"""Round 2: removal-ablations of ivf_candidates + targeted kernel variants.

ivf_stage_opt.py round 1 findings (stable, 3 reps each):
  baseline 14.32 ms; probe approx_max_k -0.8 ms; cumsum regroup +1.0 ms;
  per-slot-row top-k merge +8.6 ms (lax.top_k over 262k narrow rows is
  catastrophically slow). So the cost is NOT where the (untrustworthy)
  isolated-stage profile pointed. This script attributes by REMOVING one
  stage at a time from the full pipeline (cheap fakes preserve the data
  dependencies so the chained fori_loop cannot be DCE'd), then tests:
    - merge_v2: skip pos_out materialization; winners' positions come from
      probes[pair]*cmax + off[sel] + lane (exact, ~halves merge gathers)
    - kernel G: G clusters per grid step (fewer, bigger DMA blocks)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_vst")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vector_store_tpu.ops.ivf import _grouped_scan, choose_budget
from vector_store_tpu.ops.pallas_scan import (
    INVALID_BIAS,
    INVALID_CUTOFF,
    LANES,
    PAUX_ROWS,
    _fold_min,
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


# --- G-clusters-per-step grouped scan -----------------------------------------


def _make_gkernel(cmax: int, chunk: int, g: int, s: int):
    nchunks = cmax // chunk

    def kern(q_ref, v_ref, aux_ref, od_ref, oo_ref):
        def do_cluster(gi, _):
            q = q_ref[pl.ds(gi * s, s), :]

            def score(c):
                v = v_ref[pl.ds(gi * cmax + c * chunk, chunk), :]
                if v.dtype != q.dtype:
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


@functools.partial(jax.jit, static_argnames=("s", "cmax", "g"))
def _grouped_scan_g(qg, vectors, paux, *, s, cmax, g):
    npos, dp = vectors.shape
    nlist = npos // cmax
    chunk = 1024 if cmax % 1024 == 0 else 512 if cmax % 512 == 0 else 128
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
        _make_gkernel(cmax, chunk, g, s),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nlist * s, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nlist * s, LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nlist * s * cmax * dp,
            bytes_accessed=npos * dp * vectors.dtype.itemsize
            + nlist * s * (dp * qg.dtype.itemsize + LANES * 8),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qg, vectors, paux)


# --- pipeline pieces -----------------------------------------------------------


def probe_approx(cent, q):
    dot = jnp.dot(
        q.astype(jnp.bfloat16),
        cent.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    c2 = jnp.sum(cent * cent, axis=-1)
    aff = 2.0 * dot - c2[None, :]
    _, probes = jax.lax.approx_max_k(
        aff, NPROBE, recall_target=0.99, aggregate_to_topk=True
    )
    return jnp.where(q_live[:, None], probes.astype(jnp.int32), NLIST)


def probe_exact(cent, q):
    dot = jnp.dot(
        q.astype(jnp.bfloat16),
        cent.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    c2 = jnp.sum(cent * cent, axis=-1)
    aff = 2.0 * dot - c2[None, :]
    _, probes = jax.lax.top_k(aff, NPROBE)
    return jnp.where(q_live[:, None], probes, NLIST)


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


def merge_full(rank_out, off_out, filled, row_of_pair, probes):
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


def merge_v2(rank_out, off_out, filled, row_of_pair, probes):
    """No pos_out materialization: winner positions recovered from the
    winning pair's cluster id (probes) + gathered off + lane. Exact."""
    rank_out = jnp.where(filled[:, None], rank_out, INVALID_BIAS)
    safe_row = jnp.maximum(row_of_pair, 0)
    live_pair = (row_of_pair >= 0)[:, :, None]
    cand_rank = jnp.where(live_pair, rank_out[safe_row], INVALID_BIAS).reshape(
        B, NPROBE * LANES
    )
    cand_off = off_out[safe_row].reshape(B, NPROBE * LANES)
    neg, sel = jax.lax.top_k(-cand_rank, K)
    best_rank = -neg
    off_sel = jnp.take_along_axis(cand_off, sel, axis=1).astype(jnp.int32)
    pair_sel = sel // LANES
    lane_sel = sel % LANES
    cluster_sel = jnp.take_along_axis(probes.astype(jnp.int32), pair_sel, axis=1)
    best_pos = cluster_sel * CMAX + off_sel + lane_sel
    best_pos = jnp.where(best_rank < INVALID_CUTOFF, best_pos, -1)
    return best_rank, best_pos


def merge_v3(rank_out, off_out, filled, row_of_pair, probes):
    """merge_v2 + the off gather deferred to the winners only (gather
    [B, K] elements from [nlist*S, LANES] instead of [B, nprobe*LANES])."""
    rank_out = jnp.where(filled[:, None], rank_out, INVALID_BIAS)
    safe_row = jnp.maximum(row_of_pair, 0)
    live_pair = (row_of_pair >= 0)[:, :, None]
    cand_rank = jnp.where(live_pair, rank_out[safe_row], INVALID_BIAS).reshape(
        B, NPROBE * LANES
    )
    neg, sel = jax.lax.top_k(-cand_rank, K)
    best_rank = -neg
    pair_sel = sel // LANES
    lane_sel = sel % LANES
    row_sel = jnp.take_along_axis(safe_row, pair_sel, axis=1)  # [B, K]
    off_sel = off_out[row_sel, lane_sel].astype(jnp.int32)
    cluster_sel = jnp.take_along_axis(probes.astype(jnp.int32), pair_sel, axis=1)
    best_pos = cluster_sel * CMAX + off_sel + lane_sel
    best_pos = jnp.where(best_rank < INVALID_CUTOFF, best_pos, -1)
    return best_rank, best_pos


def make_pipeline(probe, scan_kind, merge, ablate=None):
    def pipe(vectors, paux, cent, q):
        probes = probe(cent, q)
        qtab, filled, row_of_pair = regroup_sort(probes)
        if ablate == "qgather":
            qg = jnp.zeros((NLIST * S, D), q.dtype) + q[:1, :1]
        else:
            qg = q[qtab]
        if ablate == "scan":
            rank_out = jnp.zeros((NLIST * S, LANES), jnp.float32) + (
                qg[:, :1].astype(jnp.float32)
            )
            off_out = jnp.zeros((NLIST * S, LANES), jnp.float32)
        elif scan_kind == "g8":
            rank_out, off_out = _grouped_scan_g(
                qg, vectors, paux, s=S, cmax=CMAX, g=8
            )
        elif scan_kind == "g4":
            rank_out, off_out = _grouped_scan_g(
                qg, vectors, paux, s=S, cmax=CMAX, g=4
            )
        else:
            rank_out, off_out = _grouped_scan(qg, vectors, paux, s=S, cmax=CMAX)
        if ablate == "merge":
            br = rank_out[:B, :K] + off_out[:B, :K]
            bp = jnp.zeros((B, K), jnp.int32)
            return br, bp
        return merge(rank_out, off_out, filled, row_of_pair, probes)

    return pipe


def run(name, pipe):
    @functools.partial(jax.jit, static_argnames=("m",))
    def chain(vectors, paux, cent, q0, *, m):
        def body(_, q):
            br, _bp = pipe(vectors, paux, cent, q)
            return q + (br[:, :1] * 1e-34).astype(q.dtype)

        q = jax.lax.fori_loop(0, m, body, q0)
        return pipe(vectors, paux, cent, q)

    np.asarray(chain(vectors, paux, cent, queries, m=M)[0])
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(chain(vectors, paux, cent, queries, m=M)[0])
        times.append((time.time() - t0) / (M + 1))
    med = float(np.median(times))
    print(
        f"{name:32s} {med * 1e3:7.2f} ms/iter  ({B / med:8.0f} qps)"
        f"   runs={[f'{t * 1e3:.1f}' for t in times]}",
        flush=True,
    )
    return med


if __name__ == "__main__":
    base = run("base approx/sort/full", make_pipeline(probe_approx, "std", merge_full))
    run("ablate probe->exact", make_pipeline(probe_exact, "std", merge_full))
    run("ablate scan (fake zeros)", make_pipeline(probe_approx, "std", merge_full, ablate="scan"))
    run("ablate qgather (zeros qg)", make_pipeline(probe_approx, "std", merge_full, ablate="qgather"))
    run("ablate merge (slice out)", make_pipeline(probe_approx, "std", merge_full, ablate="merge"))
    run("kernel g4", make_pipeline(probe_approx, "g4", merge_full))
    run("kernel g8", make_pipeline(probe_approx, "g8", merge_full))
    run("merge_v2 (no pos_out)", make_pipeline(probe_approx, "std", merge_v2))
    run("merge_v3 (winner-only off)", make_pipeline(probe_approx, "std", merge_v3))
    best = run("combo g8+v3", make_pipeline(probe_approx, "g8", merge_v3))

    # equivalence of the full new combo vs the old exact pipeline
    p_new = jax.jit(make_pipeline(probe_exact, "g8", merge_v3))
    p_old = jax.jit(make_pipeline(probe_exact, "std", merge_full))
    r0, p0 = p_old(vectors, paux, cent, queries)
    r1, p1 = p_new(vectors, paux, cent, queries)
    dr = np.max(np.abs(np.sort(np.asarray(r0), 1) - np.sort(np.asarray(r1), 1)))
    # positions must agree wherever ranks are unique
    same_pos = np.mean(np.sort(np.asarray(p0), 1) == np.sort(np.asarray(p1), 1))
    print(f"equivalence: max sorted-rank diff {dr:.3e}, pos agreement {same_pos:.4f}",
          flush=True)
    print(f"speedup combo vs base: {base / best:.2f}x", flush=True)
