"""VS index actor: owns one device index and schedules device work.

TPU-native replacement for the usearch actor (vs_index/usearch.rs). Where
the reference dispatches each query as its own CPU job on a worker pool, a
TPU serves hundreds of queries per kernel launch, so the actor's core is a
micro-batching loop:

- incoming ANN requests accumulate in a queue; the loop drains whatever is
  pending (bounded by MAX_BATCH) into ONE device search call;
- search is prioritized over modifications (the reference's biased recv,
  vs_index/mod.rs:30-45); modify ops apply in batches between search
  batches, and graph delta merges run when the modify queue is idle —
  the reference's exclusive Reserve/Remove permits become this scheduling
  (one loop owner = no data races on device state);
- filtered search post-filters an oversampled result set against the table
  (the reference filters inside traversal via per-id callback; on TPU the
  equivalent cheap check happens on the k' candidates after the batched
  kernel), growing k' until satisfied or exhausted;
- adds are dropped when the memory governor says Cannot (usearch.rs:1156).

Engine choice: global float indexes get the IVF engine (exact flat scan
until 65k rows, then k-means-clustered sub-linear search, engine/ivf.py);
local (per-partition) indexes and quantized/Hamming modes get the flat
engine with partition masks, mirroring the reference's small per-partition
sub-indexes (1k reserve increments). ENGINE=graph opts into the lockstep
beam-search engine for the sharded beyond-HBM regime.
"""

from __future__ import annotations

import asyncio
import logging
import math
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from vector_store_tpu.core.distance import Distance
from vector_store_tpu.core.filters import Restriction
from vector_store_tpu.core.ids import PartitionId, PrimaryId
from vector_store_tpu.core.keys import PrimaryKey
from vector_store_tpu.core.types import IndexKey, IndexMetadata, Quantization, SpaceType
from vector_store_tpu.engine import FlatDeviceIndex, GraphDeviceIndex
from vector_store_tpu.engine.flat import LOCAL_RESERVE_INCREMENT
from vector_store_tpu.utils import hotpath
from vector_store_tpu.table import (
    AddDocument,
    AddVector,
    AddVectorBlock,
    Operation,
    RemoveBeforeAddValue,
    RemovePartition,
    RemoveValue,
    Table,
)

logger = logging.getLogger(__name__)

MAX_SEARCH_BATCH = 2048
MAX_MODIFY_BATCH = 8192
MERGE_BATCH = 4096
# biased recv is biased, not absolute: a modify that has waited this long
# (or a full batch) preempts NEW search dispatch for one bounded batch
# application, so sustained query load cannot starve ingestion forever.
# The reference runs inserts as concurrent worker jobs (usearch.rs permits
# Insert/Search together, worker.rs:44-118); one shared device pipeline
# makes bounded interleaving the TPU-native equivalent — this constant is
# the freshness-lag floor under saturation.
MODIFY_MAX_AGE_S = 0.10
OVERSAMPLE_STEPS = (4, 16, 64)
UPLINK_WINDOW = 4  # max dispatch batches behind one query upload
LADDER_CACHE_MAX = 4096  # learned-oversample entries (per-filter)
MATCH_CACHE_MAX = 128  # cached exact match sets (per-filter)
# ...and a byte bound: one dense match set is ~selectivity*N int64s (4 MB
# at 50% of 1M rows), so a count-only cap could hold 100s of MB under
# diverse-signature traffic
MATCH_CACHE_MAX_BYTES = 64 << 20
# device-masked filtered path: a filter whose learned oversample step
# reached this is expensive on the post-filter ladder, so its match set is
# computed once and later queries pre-filter ON DEVICE (engine allow-mask)
MASKED_MIN_STEP = 16
# ...but only while the match set is dense enough that nprobe probing still
# finds >= limit true neighbors among matching rows: below 1/32 of the
# table, the grouped subset-exact scan is both exact and cheaper
MASKED_MIN_DENOM = 32
ALLOW_CACHE_MAX = 8  # device-resident allow-mask handles (per-filter)
# first masked attempt fetches limit*2: every candidate already matches,
# so headroom only covers removed/stale rows, not filter misses
MASKED_OVERSAMPLE = 2


class DimensionMismatch(ValueError):
    """Query vector dimensionality differs from the index
    (vs_index/validator.rs -> HTTP 400)."""


@dataclass
class _SearchRequest:
    vector: np.ndarray
    limit: int
    partition: Optional[PartitionId]
    restrictions: Optional[list[Restriction]]
    future: asyncio.Future
    # filled by the batch executor
    oversample: int = 1
    # stable signature of the restriction set (ladder/match cache key)
    sig: Optional[tuple] = None
    # riding the device-masked filtered path (engine allow-mask pre-filter)
    masked: bool = False


def _restriction_sig(restrictions: list[Restriction]) -> tuple:
    """Order-insensitive hashable signature of a restriction set; frozen
    dataclass reprs are stable for the CQL value types restrictions carry."""
    return tuple(sorted(repr(r) for r in restrictions))


class VsIndexActor:
    def __init__(
        self,
        metadata: IndexMetadata,
        table: Table,
        memory=None,  # MemoryGovernor | None
        metrics=None,  # Metrics | None
        engine_kind: str = "auto",  # auto|flat|ivf|graph|ivf-sharded|graph-sharded
        shards: int = 0,  # mesh size for sharded engines (0 = all devices)
        internals=None,  # Internals | None (debug counters)
    ) -> None:
        self.metadata = metadata
        self.table = table
        self.memory = memory
        self.metrics = metrics
        self.internals = internals
        vs = metadata.vs_options
        assert vs is not None
        self.dimensions = int(vs.dimensions)
        self.space_type = vs.space_type
        self.quantization = vs.quantization

        is_local = not metadata.partitioning.is_global
        from vector_store_tpu.engine.ivf import ivf_supports

        if engine_kind == "auto":
            # MEASURED policy (round 2, v5e): graph beam search is
            # HBM-gather-bound, so sub-linear serving comes from the IVF
            # engine instead (grouped fused scan over k-means clusters,
            # engine/ivf.py). IVF serves exactly like flat until the index
            # crosses its build threshold (65k rows), then clusters itself
            # and scans ~nprobe/nlist of the data per query. Local indexes
            # (small per-partition sub-indexes) and non-float/Hamming
            # quantizations stay on the exact flat engine; ENGINE=graph
            # remains the opt-in beyond-HBM path.
            engine_kind = (
                "ivf"
                if not is_local
                and ivf_supports(vs.space_type, vs.quantization)
                else "flat"
            )
        elif engine_kind == "ivf" and (
            is_local or not ivf_supports(vs.space_type, vs.quantization)
        ):
            engine_kind = "flat"
        elif engine_kind == "graph" and is_local:
            # documented engine-choice policy: graph never serves local
            # indexes (its search() rejects per-query partitions, which
            # would 500 every filtered query)
            engine_kind = "flat"
        elif engine_kind.endswith("-sharded") and is_local:
            # sharded engines are the global-index beyond-HBM path; local
            # indexes stay per-partition on one chip (reference parity:
            # per-partition sub-indexes, usearch.rs:626-670)
            engine_kind = "flat"
        self.engine_kind = engine_kind
        if engine_kind.startswith("sim"):
            # simulator mode (reference usearch_simulator): exact host-side
            # engine with configurable delays, no device needed
            from vector_store_tpu.engine.simulator import SimulatorIndex, parse_delays

            spec = engine_kind.partition(":")[2]
            delays = parse_delays(spec) if spec else (0.0, 0.0, 0.0)
            self.engine = SimulatorIndex(
                self.dimensions,
                space_type=vs.space_type,
                quantization=vs.quantization,
                delays=delays,
            )
        elif engine_kind.startswith("opensearch:"):
            from vector_store_tpu.engine.opensearch import OpenSearchIndex

            self.engine = OpenSearchIndex(
                engine_kind.partition(":")[2],
                f"{metadata.keyspace_name}-{metadata.index_name}",
                self.dimensions,
                space_type=vs.space_type,
                quantization=vs.quantization,
                connectivity=int(vs.connectivity),
                expansion_add=int(vs.expansion_add),
                expansion_search=int(vs.expansion_search),
            )
        elif engine_kind.endswith("-sharded"):
            # beyond-HBM scale-out: one index sharded across a device mesh
            # (reference factory parity: vs_index/mod.rs:47-68 picks the
            # engine per index; here the mesh engines are first-class picks)
            import jax

            from vector_store_tpu.parallel import make_mesh
            from vector_store_tpu.parallel.serving import (
                ShardedGraphServingEngine,
                ShardedIvfServingEngine,
            )

            devices = jax.devices()
            n_dev = shards or len(devices)
            mesh = make_mesh(n_dev, data=1, devices=devices[:n_dev])
            on_cpu = devices[0].platform == "cpu"
            if engine_kind == "graph-sharded":
                self.engine = ShardedGraphServingEngine(
                    mesh,
                    self.dimensions,
                    space_type=vs.space_type,
                    quantization=vs.quantization,
                    connectivity=int(vs.connectivity),
                    expansion_add=int(vs.expansion_add),
                    expansion_search=int(vs.expansion_search),
                )
            else:
                self.engine = ShardedIvfServingEngine(
                    mesh,
                    self.dimensions,
                    space_type=vs.space_type,
                    quantization=vs.quantization,
                    nprobe=max(8, int(vs.expansion_search) // 2),
                    interpret=on_cpu,  # pallas kernels: interpret off-TPU
                )
        elif engine_kind == "graph":
            self.engine: GraphDeviceIndex | FlatDeviceIndex = GraphDeviceIndex(
                self.dimensions,
                space_type=vs.space_type,
                quantization=vs.quantization,
                connectivity=int(vs.connectivity),
                expansion_add=int(vs.expansion_add),
                expansion_search=int(vs.expansion_search),
                oversample=(
                    None
                    if vs.oversampling is None
                    else math.ceil(vs.oversampling)
                ),
                rescoring=vs.rescoring is not False,
            )
        elif engine_kind == "ivf":
            from vector_store_tpu.engine.ivf import IvfDeviceIndex

            # expansion_search plays the nprobe role: both trade recall for
            # scanned candidates (reference ef_search default 64)
            self.engine = IvfDeviceIndex(
                self.dimensions,
                space_type=vs.space_type,
                quantization=vs.quantization,
                nprobe=max(8, int(vs.expansion_search) // 2),
                oversample=(
                    None
                    if vs.oversampling is None
                    else math.ceil(vs.oversampling)
                ),
                rescoring=vs.rescoring is not False,
            )
        else:
            self.engine = FlatDeviceIndex(
                self.dimensions,
                space_type=vs.space_type,
                quantization=vs.quantization,
                reserve_increment=LOCAL_RESERVE_INCREMENT if is_local else 1_000_000,
                **(
                    {}
                    if vs.oversampling is None
                    else {"oversample": math.ceil(vs.oversampling)}
                ),
                rescoring=vs.rescoring is not False,
            )
        if engine_kind not in ("ivf", "flat", "graph") and (
            vs.oversampling is not None or vs.rescoring is not None
        ):
            # the flat/ivf/graph engines implement the oversample+rescore
            # contract (quantization_and_rescoring.rs parity); dropping the
            # options on the remaining engines must be visible, not silent
            logger.warning(
                "index %s: oversampling/rescoring options are not supported "
                "by engine %r and were ignored",
                metadata.key,
                engine_kind,
            )
        self.is_local = is_local

        if (
            self.memory is not None
            and hasattr(self.memory, "register_engine")
            and hasattr(self.engine, "device_bytes")
        ):
            self.memory.register_engine(self.engine)

        self._search_queue: deque_t = asyncio.Queue()
        self._modify_queue: list[Operation] = []
        self._modify_event = asyncio.Event()
        self._task: asyncio.Task | None = None
        self._stopped = False
        self._dropped_adds = 0
        # filtered-search introspection: oversample requeues and terminal
        # exact-host completions (the escalation ladder's two escape hatches)
        self._escalations = 0
        self._exact_fallbacks = 0
        # learned escalation state, keyed by restriction signature. The
        # ladder cache remembers the oversample step a filter's selectivity
        # needed, so later queries with the same filter start there instead
        # of re-walking 1->4->16->64 (one relay round trip per step). The
        # match cache holds the exact matching-slot set for filters that
        # exhausted the ladder (low selectivity), letting those queries skip
        # device work entirely for a batched subset-exact host scan.
        # Stamped with table.mutations; any table write invalidates.
        # Worker threads may race on these dicts — values are immutable and
        # recomputation is idempotent, so a lost update only costs work.
        self._ladder_cache: dict[tuple, int] = {}
        self._match_cache: dict[tuple, tuple[int, np.ndarray]] = {}
        self._match_bytes = 0  # running nbytes of cached match sets
        # mid-selectivity filters promoted to the device-masked path:
        # sig -> (mutation stamp, engine AllowMaskHandle). Presence of a
        # sig (even stamp-stale) marks the filter as mask-promoted.
        self._allow_cache: dict[tuple, tuple[int, object]] = {}
        self._masked_dispatches = 0
        # begin/collect pipeline (engines exposing search_begin):
        # in-flight (batch, pending) pairs awaiting one aggregated pull
        self._inflight_collects: list[tuple[list[_SearchRequest], object]] = []
        self._collector: asyncio.Task | None = None
        self._pipelined = hasattr(self.engine, "search_begin")
        # concurrent background-maintenance slice in flight (engines with
        # maintain_pending): rebuild phases that don't mutate serving state
        # run alongside live searches so builds progress UNDER load
        self._maintain_fut: asyncio.Future | None = None
        self._maintain_kind: str | None = None  # kind of the in-flight slice
        # monotonic enqueue time of the oldest unapplied modify (aging)
        self._modify_oldest = 0.0

    # -- lifecycle ------------------------------------------------------------

    def start(self) -> None:
        self._task = asyncio.get_running_loop().create_task(self._run())

    async def stop(self) -> None:
        self._stopped = True
        self._modify_event.set()
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except (asyncio.CancelledError, Exception):
                pass

    # -- public API (VsIndexSearch/Modify parity, vs_index/actor.rs) ----------

    async def ann(
        self, vector: list[float], limit: int
    ) -> list[tuple[PrimaryKey, Distance]]:
        return await self._submit(vector, limit, None, None)

    async def ann_many(
        self, vectors: np.ndarray, limit: int
    ) -> list[list[tuple[PrimaryKey, Distance]]]:
        """Bulk unfiltered ANN: n queries submitted together (one await per
        batch on the caller side; they coalesce into the same device
        batches)."""
        vectors = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        return await asyncio.gather(
            *(self._submit(vectors[i], limit, None, None) for i in range(len(vectors)))
        )

    async def filtered_ann(
        self,
        vector: list[float],
        restrictions: list[Restriction],
        limit: int,
    ) -> list[tuple[PrimaryKey, Distance]]:
        partition = None
        rest: Optional[list[Restriction]] = restrictions
        if self.is_local:
            routed = self.table.partition_id(self.metadata.key, restrictions)
            if routed is None:
                # unknown partition -> empty result (reference resolves the
                # partition from Eq restrictions, usearch.rs:781-864)
                return []
            partition, rest = routed
        return await self._submit(vector, limit, partition, rest)

    async def count(self) -> int:
        return self.engine.size

    def apply_operations(self, ops: list[Operation]) -> None:
        """Called by the monitor_items pump; thread-safe enough for the
        single asyncio loop."""
        if not self._modify_queue:
            self._modify_oldest = time.monotonic()
        self._modify_queue.extend(ops)
        self._modify_event.set()

    @property
    def backlog(self) -> int:
        return len(self._modify_queue)

    # -- internals -------------------------------------------------------------

    async def _submit(self, vector, limit, partition, restrictions):
        v = np.asarray(vector, dtype=np.float32)
        if v.ndim != 1 or v.shape[0] != self.dimensions:
            raise DimensionMismatch(
                f"Invalid query vector size {v.shape[-1] if v.ndim else 0}, "
                f"expected {self.dimensions}"
            )
        fut = asyncio.get_running_loop().create_future()
        req = _SearchRequest(v, limit, partition, restrictions, fut)
        if restrictions:
            req.sig = _restriction_sig(restrictions)
            cached = self._ladder_cache.get(req.sig)
            if cached is not None:
                req.oversample = cached
        await self._search_queue.put(req)
        return await fut

    async def _run(self) -> None:
        """Scheduling loop. Searches are pipelined: kernel dispatches
        (search_begin, ~ms) happen as batches arrive — when the queue runs
        deeper than one batch, up to UPLINK_WINDOW batches dispatch behind
        ONE query upload (_begin_window) — while a single collector task
        pulls ALL finished batches in one aggregated device->host transfer
        (engine.collect_many — the relay's fixed per-transfer cost made
        per-batch transfers the bottleneck in both directions). Mutations
        wait for the pipeline to drain (the reference's exclusive modify
        permits become this scheduling). Engines without search_begin
        (simulator, opensearch) run the legacy one-executor-call-per-batch
        path."""
        loop = asyncio.get_running_loop()
        inflight: set[asyncio.Future] = set()
        has_pending_api = hasattr(self.engine, "maintain_pending")
        maintain_recheck = 0.0  # throttle for the idle-scan in maintain_pending

        def modify_ok() -> bool:
            """May a modify batch apply right now? Always when no
            maintenance slice is in flight; engines that dirty-track
            mid-build mutations (maintain_modify_safe) also allow it
            concurrently with every slice except the `start` snapshot,
            which reads the same host tables a modify mutates. Without
            this, continuous churn and a long rebuild starve each other:
            measured at 1M, a mid-run rebuild made ZERO progress in 77 s
            of build-active time because slices waited for a modify-queue
            gap that 1.5k upserts/s never provided."""
            if self._maintain_fut is None:
                return True
            return (
                getattr(self.engine, "maintain_modify_safe", False)
                and self._maintain_kind != "start"
            )

        def _maintain_done(f: asyncio.Future) -> None:
            self._maintain_fut = None
            self._maintain_kind = None
            if not f.cancelled():
                exc = f.exception()
                if exc is not None:
                    logger.exception(
                        "background maintenance slice failed", exc_info=exc
                    )
            self._modify_event.set()  # wake the idle wait

        def launch(batch: list[_SearchRequest]) -> None:
            fut = loop.run_in_executor(None, self._execute_search_batch, batch)

            def _done(f: asyncio.Future, batch=batch) -> None:
                inflight.discard(f)
                exc = f.exception() if not f.cancelled() else None
                if exc is not None:
                    for req in batch:
                        if not req.future.done():
                            req.future.set_exception(exc)

            fut.add_done_callback(_done)
            inflight.add(fut)

        def launch_pipelined(
            batches: list[list[_SearchRequest]],
        ) -> asyncio.Future:
            fut = loop.run_in_executor(None, self._begin_window, batches)

            def _done(f: asyncio.Future, batches=batches) -> None:
                inflight.discard(f)
                if f.cancelled():
                    return
                exc = f.exception()
                if exc is not None:
                    for b in batches:
                        for req in b:
                            if not req.future.done():
                                req.future.set_exception(exc)
                    return
                added = False
                for b, pending in f.result():
                    if pending is not None:
                        self._inflight_collects.append((b, pending))
                        added = True
                if added and (
                    self._collector is None or self._collector.done()
                ):
                    self._collector = loop.create_task(self._collect_loop())

            fut.add_done_callback(_done)
            inflight.add(fut)
            return fut

        while not self._stopped:
            # 0a) concurrent background maintenance (engines exposing
            # maintain_pending): every slice except the serving-state swap
            # is dispatched WITHOUT blocking this loop, so rebuild phases
            # (kmeans/assign/relayout) and shape warms progress while live
            # search batches keep dispatching — builds no longer depend on
            # idle gaps that a saturating query load never provides. The
            # swap slice stays exclusive (step 3).
            swap_due = False
            if has_pending_api and self._maintain_fut is None:
                kind = None
                now = loop.time()
                if now >= maintain_recheck:
                    kind = self.engine.maintain_pending()
                    if kind is None:
                        # the idle probe scans host state; don't re-run it
                        # every loop iteration under load
                        maintain_recheck = now + 0.05
                if kind in ("swap", "reenter"):
                    # exclusive slices: stop dispatching NEW search
                    # batches, let the pipeline drain, run in step 3 (the
                    # reference's blocking Reserve permit — without this
                    # priority a saturating query load starves the cutover
                    # forever). `reenter` chunks are bounded upserts
                    # (post-swap re-entry of mid-build mutations): they
                    # mutate serving arrays like any modify batch, so they
                    # take the same drained-pipeline slot — but each chunk
                    # is sub-second, so queries interleave between chunks
                    swap_due = True
                elif kind is not None:
                    # `start` snapshots host tables, so modify APPLICATION
                    # is excluded while it runs (modify_ok) — but ops
                    # sitting unapplied in the queue are harmless, so start
                    # dispatches regardless of queue depth. (Gating start
                    # on an EMPTY queue starved rebuilds: measured at 1.6k
                    # upserts/s the queue is empty 1.9% of the time and a
                    # due rebuild stayed pending for 99 s. The reference
                    # likewise blocks Adds during Reserve via the exclusive
                    # permit, usearch.rs:515-623.)
                    self._maintain_kind = kind
                    fut = loop.run_in_executor(None, self.engine.maintain, 1)
                    fut.add_done_callback(_maintain_done)
                    self._maintain_fut = fut
                    # fall through: searches dispatch alongside the slice

            # 0b) legacy exclusive warms for engines without the pending
            # API: pre-compiles run BEFORE searches (a query hitting a cold
            # device-program shape pays the whole compile anyway)
            if not has_pending_api:
                warms = getattr(self.engine, "_warm_queue", None)
                if warms:
                    await loop.run_in_executor(None, self.engine.maintain, 1)
                    continue

            # aged modifies (or a full batch) also preempt NEW dispatch:
            # under saturating query load the pipeline never drains on its
            # own, so without aging, ingestion — and freshness — starve
            modify_due = (
                self._modify_queue
                and modify_ok()
                and (
                    time.monotonic() - self._modify_oldest >= MODIFY_MAX_AGE_S
                    or len(self._modify_queue) >= MAX_MODIFY_BATCH
                )
            )

            # 1) searches first (biased recv) — unless the swap slice or an
            # aged modify batch is waiting for the pipeline to drain
            if not swap_due and not modify_due and not self._search_queue.empty():
                if self._pipelined:
                    if len(inflight) + len(self._inflight_collects) < 4:
                        # the relay serializes transfers: while a result
                        # pull is in flight, a begin would queue behind it
                        # anyway — spend that time coalescing arrivals into
                        # a bigger device batch (fewer pulls per query)
                        if (
                            self._collector is not None
                            and not self._collector.done()
                            and self._search_queue.qsize() < MAX_SEARCH_BATCH // 2
                        ):
                            await asyncio.sleep(0.002)
                            continue  # re-check: collector done or queue grown
                        # queue deeper than one batch: dispatch up to
                        # UPLINK_WINDOW batches behind one query upload
                        batches = [self._drain_searches()]
                        while (
                            not self._search_queue.empty()
                            and len(batches) < UPLINK_WINDOW
                        ):
                            nxt = self._drain_searches()
                            if not nxt:
                                break
                            batches.append(nxt)
                        await launch_pipelined(batches)
                        continue
                elif len(inflight) < 2:
                    launch(self._drain_searches())
                    continue

            if inflight:
                await asyncio.wait(inflight, return_when=asyncio.FIRST_COMPLETED)
                continue
            if self._collector is not None and not self._collector.done():
                # a collect pull is in flight; new searches may still arrive
                getter = asyncio.ensure_future(self._search_queue.get())
                done, _ = await asyncio.wait(
                    [getter, self._collector], return_when=asyncio.FIRST_COMPLETED
                )
                if getter in done:
                    req = getter.result()
                    self._search_queue.put_nowait(req)
                else:
                    getter.cancel()
                    try:
                        await getter
                    except (asyncio.CancelledError, Exception):
                        pass
                continue

            # 2) modifications (pipeline drained; concurrent with dirty-
            # tracking engines' build slices, exclusive against `start` —
            # see modify_ok)
            if self._modify_queue and modify_ok():
                ops = self._modify_queue[:MAX_MODIFY_BATCH]
                del self._modify_queue[: len(ops)]
                # one bounded batch per grant: reset the age clock so
                # searches interleave between successive batches under
                # heavy CDC bursts
                self._modify_oldest = time.monotonic()
                try:
                    await loop.run_in_executor(None, self._apply_ops_batch, ops)
                except Exception:
                    # a poisoned batch (malformed vector, device error) must
                    # not kill the actor loop — drop it and keep serving
                    logger.exception(
                        "dropping modify batch of %d ops after failure", len(ops)
                    )
                continue

            # 3) exclusive maintenance. Engines with maintain_pending only
            # reach here for the swap slice (everything else dispatched
            # concurrently in 0a); legacy engines (graph delta merges) run
            # every slice here — scheduled only while the pipeline is idle,
            # the reference's exclusive modify permits
            if hasattr(self.engine, "maintain") and self._maintain_fut is None:
                run_exclusive = True
                if has_pending_api:
                    run_exclusive = self.engine.maintain_pending() in (
                        "swap",
                        "reenter",
                    )
                if run_exclusive:
                    did_work = await loop.run_in_executor(
                        None, self.engine.maintain, MERGE_BATCH
                    )
                    if did_work:
                        # a grace window before the NEXT exclusive slice is
                        # considered: queued searches dispatch in between,
                        # so a multi-chunk re-entry never starves queries
                        # for its whole duration (chunks are sub-second;
                        # the window bounds added re-entry latency)
                        maintain_recheck = loop.time() + 0.25
                        await asyncio.sleep(0)
                        continue

            # idle: wait for work. Clear-then-recheck: work may have arrived
            # during the maintain() executor hop above (the event would then
            # be cleared without ever being consumed — lost wakeup). A
            # modify blocked only on an in-flight maintenance slice must NOT
            # busy-spin: its wakeup is the slice's done callback.
            self._modify_event.clear()
            if not self._search_queue.empty() or (
                self._modify_queue and modify_ok()
            ):
                continue
            getter = asyncio.ensure_future(self._search_queue.get())
            waiter = asyncio.ensure_future(self._modify_event.wait())
            try:
                done, pending = await asyncio.wait(
                    [getter, waiter], return_when=asyncio.FIRST_COMPLETED
                )
            except asyncio.CancelledError:
                getter.cancel()
                waiter.cancel()
                raise
            for p in pending:
                p.cancel()
                try:
                    await p
                except (asyncio.CancelledError, Exception):
                    pass
            if getter in done:
                req = getter.result()
                batch = [req] + self._drain_searches()
                if self._pipelined:
                    await launch_pipelined([batch])
                else:
                    launch(batch)

    def _drain_searches(self) -> list[_SearchRequest]:
        batch: list[_SearchRequest] = []
        while len(batch) < MAX_SEARCH_BATCH:
            try:
                batch.append(self._search_queue.get_nowait())
            except asyncio.QueueEmpty:
                break
        return batch

    # -- pipelined begin/collect path -----------------------------------------

    async def _collect_loop(self) -> None:
        """Drains in-flight searches with aggregated result pulls until none
        remain. One instance runs at a time."""
        loop = asyncio.get_running_loop()
        while self._inflight_collects and not self._stopped:
            items = self._inflight_collects
            self._inflight_collects = []
            try:
                await loop.run_in_executor(None, self._collect_batches, items)
            except Exception as exc:
                for batch, _ in items:
                    for req in batch:
                        if not req.future.done():
                            loop.call_soon(
                                lambda r=req, e=exc: r.future.set_exception(e)
                                if not r.future.done()
                                else None
                            )

    # executed in a worker thread
    @hotpath.measure
    def _begin_batch(
        self, batch: list[_SearchRequest], queries_dev=None, allow_mask=None
    ):
        """Dispatch one device search for the batch (no waiting)."""
        if not batch:
            return None
        k = max(r.limit * r.oversample for r in batch)
        k = min(k, max(self.engine.size, 1))
        queries = np.stack([r.vector for r in batch])
        partitions = None
        if self.is_local:
            partitions = np.asarray(
                [r.partition.slot if r.partition else -1 for r in batch],
                dtype=np.int32,
            )
        kwargs = {}
        if allow_mask is not None:
            kwargs["allow_mask"] = allow_mask
        if queries_dev is not None:
            kwargs["queries_dev"] = queries_dev
        return self.engine.search_begin(
            queries, k, partitions=partitions, **kwargs
        )

    # executed in a worker thread
    def _begin_window(self, batches: list[list[_SearchRequest]]):
        """Dispatch several batches behind ONE uplink transfer: all their
        queries ride one upload_queries super-batch, each batch's kernel
        consumes a device-resident slice. The relay charges a fixed
        30-120 ms per transfer, so under load (queue deeper than one
        MAX_SEARCH_BATCH) this amortizes the uplink the way collect_many
        already amortizes the downlink. Engines without upload_queries
        (graph, simulator, opensearch) fall back to per-batch uploads."""
        # Filtered-request triage by match-set density S/N (the reference
        # post-filters every regime identically, usearch.rs:1067-1154;
        # here each selectivity band gets the kernel that wins on-device):
        #   S*64 < N        -> grouped subset-exact terminal, zero device
        #                      work (the oversample ladder cannot reach
        #                      limit matches even at its top step);
        #   S >= N/32 AND the ladder proved expensive (learned step >= 16)
        #                   -> device-masked IVF scan: the filter becomes a
        #                      cached device-resident allow-mask, queries
        #                      pre-filter ON DEVICE at full scan rate with
        #                      k = limit*2 instead of limit*64;
        #   in between      -> the post-filter oversample ladder as before.
        direct: list[_SearchRequest] = []
        masked_groups: dict[tuple, list[_SearchRequest]] = {}
        can_mask = hasattr(self.engine, "upload_allow_mask")
        if not self.is_local and (self._match_cache or self._allow_cache or can_mask):
            stamp = self.table.mutations
            n_total = max(self.engine.size, 1)
            kept: list[list[_SearchRequest]] = []
            for b in batches:
                keep: list[_SearchRequest] = []
                for req in b:
                    if req.sig is None or req.partition is not None:
                        keep.append(req)
                        continue
                    # mask promotion is capacity-gated: under diverse-
                    # signature traffic (every query a fresh filter) an
                    # unbounded promotion rule would build+upload a device
                    # mask per signature and thrash the 8-handle cache; a
                    # signature only takes the masked path while it holds
                    # (or can claim) an allow-cache slot — the rest stay on
                    # the oversample ladder, which needs no per-filter
                    # device state (the reference's per-id predicate cost
                    # model, usearch.rs:224-248)
                    masked_ok = (
                        req.sig in self._allow_cache
                        or len(self._allow_cache) < ALLOW_CACHE_MAX
                    )
                    want_mask = can_mask and masked_ok and (
                        req.sig in self._allow_cache
                        or req.oversample >= MASKED_MIN_STEP
                    )
                    hit = self._match_cache.get(req.sig)
                    slots = (
                        hit[1]
                        if hit is not None and hit[0] == stamp
                        else None
                    )
                    if slots is None and want_mask:
                        # ladder proved this filter expensive: compute the
                        # match set once per mutation stamp so the masked /
                        # terminal routing below can take it
                        slots = self._matching_slots_stamped(req, stamp)
                    if slots is None:
                        keep.append(req)
                        continue
                    if slots.size * OVERSAMPLE_STEPS[-1] < n_total:
                        direct.append(req)
                    elif want_mask and slots.size * MASKED_MIN_DENOM >= n_total:
                        if not req.masked:
                            req.masked = True
                            req.oversample = MASKED_OVERSAMPLE
                        masked_groups.setdefault(req.sig, []).append(req)
                    else:
                        keep.append(req)
                kept.append(keep)
            batches = kept
        if direct:
            self._finish_terminal(direct)
        units: list[tuple[list[_SearchRequest], object]] = [
            (b, None) for b in batches if b
        ]
        if masked_groups:
            stamp = self.table.mutations
            for sig, group in masked_groups.items():
                handle = self._allow_handle(sig, group[0], stamp)
                self._masked_dispatches += len(group)
                self._count("masked_dispatches", len(group))
                units.append((group, handle))
        if (
            len(units) > 1
            and not self.is_local
            and hasattr(self.engine, "upload_queries")
        ):
            # Bucket EVERY shape that reaches the device: each batch pads
            # to its engine batch bucket and the super-batch total pads to
            # a bucket too. Actor drains produce arbitrary batch sizes, and
            # an unbucketed upload compiles a fresh dequant program per
            # distinct length — measured on-chip: the 1M streaming-actor
            # serving phase spent its whole window in back-to-back 30-120s
            # relay compiles (24 calls in 148s, p50 65 s/call).
            from vector_store_tpu.engine.flat import _BATCH_BUCKETS, _bucket

            stacks: list[np.ndarray] = []
            offs: list[tuple[int, int]] = []
            off = 0
            for b, _h in units:
                q = np.stack([r.vector for r in b])
                blen = _bucket(len(b), _BATCH_BUCKETS)
                if blen > len(b):
                    q = np.pad(q, [(0, blen - len(b)), (0, 0)])
                stacks.append(q)
                offs.append((off, blen))
                off += blen
            # power-of-two multiples only: each distinct TOTAL length is a
            # fresh dequant compile (30-120 s through the relay), and the
            # engine pre-warms exactly these two super-batch shapes
            total_buckets = (
                2 * _BATCH_BUCKETS[-1],
                4 * _BATCH_BUCKETS[-1],
            )
            tpad = _bucket(off, _BATCH_BUCKETS + total_buckets)
            big = np.concatenate(stacks)
            if tpad > off:
                big = np.pad(big, [(0, tpad - off), (0, 0)])
            qs_all = self.engine.upload_queries(big)
            out = []
            for (b, h), (o, blen) in zip(units, offs):
                out.append(
                    (
                        b,
                        self._begin_batch(
                            b, queries_dev=qs_all[o : o + blen], allow_mask=h
                        ),
                    )
                )
            return out
        return [(b, self._begin_batch(b, allow_mask=h)) for b, h in units]

    # executed in a worker thread
    def _matching_slots_stamped(
        self, req: _SearchRequest, stamp: int
    ) -> np.ndarray:
        """Compute + cache the filter's match set (one O(N) host pass per
        distinct filter per mutation stamp — the same bargain the grouped
        terminal already makes)."""
        pid = PartitionId.global_for(self.table.index_id(self.metadata.key))
        slots = self.table.matching_slots(pid, req.restrictions or [])
        # LRU: re-stamping refreshes the key's eviction position, so a hot
        # filter under churn is not the first out when the cache fills.
        # Bounded by count AND bytes (dense match sets are MBs each).
        old = self._match_cache.pop(req.sig, None)
        if old is not None:
            self._match_bytes -= old[1].nbytes
        while self._match_cache and (
            len(self._match_cache) >= MATCH_CACHE_MAX
            or self._match_bytes + slots.nbytes > MATCH_CACHE_MAX_BYTES
        ):
            _, ev = self._match_cache.pop(next(iter(self._match_cache)))
            self._match_bytes -= ev.nbytes
        self._match_cache[req.sig] = (stamp, slots)
        self._match_bytes += slots.nbytes
        return slots

    # executed in a worker thread
    def _allow_handle(self, sig: tuple, req: _SearchRequest, stamp: int):
        """Stamp-fresh device allow-mask handle for a mask-promoted filter.
        The handle keeps the mask (and the masked cluster-major side array)
        device-resident across searches; a table mutation rebuilds it from
        the refreshed match set so filtered results never miss new rows."""
        hit = self._allow_cache.get(sig)
        if hit is not None and hit[0] == stamp:
            return hit[1]
        cached = self._match_cache.get(sig)  # stamped by the triage above,
        # but a concurrent window's cache eviction may race it away
        if cached is not None and cached[0] == stamp:
            slots = cached[1]
        else:
            slots = self._matching_slots_stamped(req, stamp)
        n = int(slots.max()) + 1 if slots.size else 1
        mask = np.zeros((n,), dtype=bool)
        mask[slots] = True
        handle = self.engine.upload_allow_mask(mask)
        # LRU: refresh the key's eviction position on re-stamp
        self._allow_cache.pop(sig, None)
        if len(self._allow_cache) >= ALLOW_CACHE_MAX:
            self._allow_cache.pop(next(iter(self._allow_cache)))
        self._allow_cache[sig] = (stamp, handle)
        return handle

    # executed in a worker thread
    @hotpath.measure
    def _collect_batches(self, items) -> None:
        """One aggregated pull for every in-flight batch, then resolve.
        Requests whose post-filtered results come up short are requeued
        with a larger oversample factor (next device batch) instead of
        blocking this one."""
        pendings = [p for _, p in items]
        all_results = self.engine.collect_many(pendings)
        finished: list[tuple[_SearchRequest, list]] = []
        requeue: list[_SearchRequest] = []
        terminal: list[_SearchRequest] = []
        loop = None
        for (batch, pending), results in zip(items, all_results):
            k_used = max(r.limit * r.oversample for r in batch)
            for req, res in zip(batch, results):
                loop = loop or req.future.get_loop()
                resolved = self._resolve(req, res)
                exhausted = self._exhausted(req, res, k_used)
                if len(resolved) >= req.limit or exhausted:
                    finished.append((req, resolved[: req.limit]))
                    if req.sig is not None and not req.masked:
                        # remember the step this filter's selectivity needed
                        # (masked requests ran pre-filtered — their tiny
                        # oversample says nothing about the ladder)
                        self._remember_ladder(req.sig, req.oversample)
                elif req.oversample >= OVERSAMPLE_STEPS[-1]:
                    if req.sig is not None and not req.masked:
                        # exhausted: later same-filter queries should skip
                        # the walk and go straight to the top step (the
                        # match cache then short-circuits them entirely)
                        self._remember_ladder(req.sig, OVERSAMPLE_STEPS[-1])
                    terminal.append(req)
                else:
                    # grow the oversample factor and try in a later batch
                    for step in OVERSAMPLE_STEPS:
                        if step > req.oversample:
                            req.oversample = step
                            break
                    self._escalations += 1
                    self._count("oversample_escalations")
                    requeue.append(req)
        if terminal:
            self._finish_terminal(terminal)
        if loop is not None and (finished or requeue):
            # ONE loop wakeup for the whole collect (per-request
            # call_soon_threadsafe was a measurable cost at 1k+ QPS)
            loop.call_soon_threadsafe(self._finish_many, finished, requeue)

    def _finish_many(
        self,
        finished: list[tuple[_SearchRequest, list]],
        requeue: list[_SearchRequest],
    ) -> None:
        for req, result in finished:
            if not req.future.done():
                req.future.set_result(result)
        for req in requeue:
            if not req.future.done():
                self._search_queue.put_nowait(req)
        if requeue:
            self._modify_event.set()  # wake the scheduler if idle

    # executed in a worker thread
    @hotpath.measure
    def _execute_search_batch(self, batch: list[_SearchRequest]) -> None:
        pending = batch
        # repeat ladder-hopeless filters (fresh cached match set with
        # S*64 < N) go straight to the grouped terminal — the top rung
        # would exhaust anyway, and on the sharded engines that wasted
        # search is a full mesh dispatch (same triage _begin_window does
        # for the pipelined engines)
        if (
            not self.is_local
            and self._match_cache
            and hasattr(self.engine, "search_exact_host_subset")
        ):
            stamp = self.table.mutations
            n_total = max(self.engine.size, 1)
            direct: list[_SearchRequest] = []
            keep: list[_SearchRequest] = []
            for req in pending:
                hit = self._match_cache.get(req.sig) if req.sig else None
                if (
                    hit is not None
                    and hit[0] == stamp
                    and req.partition is None
                    and hit[1].size * OVERSAMPLE_STEPS[-1] < n_total
                ):
                    direct.append(req)
                else:
                    keep.append(req)
            if direct:
                self._finish_terminal(direct)
            pending = keep
        for step in (1,) + OVERSAMPLE_STEPS:
            if not pending:
                break
            # requests whose filter LEARNED a higher step (search() seeds
            # req.oversample from the ladder cache) skip the lower rungs —
            # each rung is a full engine round trip on this path
            ready = [r for r in pending if r.oversample <= step]
            if not ready:
                continue
            k = max(r.limit * step for r in ready)
            k = min(k, max(self.engine.size, 1))
            queries = np.stack([r.vector for r in ready])
            partitions = None
            if self.is_local:
                partitions = np.asarray(
                    [r.partition.slot if r.partition else -1 for r in ready],
                    dtype=np.int32,
                )
            results = self.engine.search(queries, k, partitions=partitions)
            later = [r for r in pending if r.oversample > step]
            still_pending: list[_SearchRequest] = []
            for req, res in zip(ready, results):
                resolved = self._resolve(req, res)
                exhausted = self._exhausted(req, res, k)
                if len(resolved) >= req.limit or exhausted:
                    if req.sig is not None:
                        req.oversample = step  # remember the winning rung
                        self._remember_ladder(req.sig, step)
                    self._finish(req, resolved[: req.limit])
                else:
                    self._escalations += 1
                    self._count("oversample_escalations")
                    still_pending.append(req)
            pending = still_pending + later
        if pending:  # ladder exhausted: grouped subset-exact terminal
            for req in pending:
                if req.sig is not None:
                    self._remember_ladder(req.sig, OVERSAMPLE_STEPS[-1])
            self._finish_terminal(pending)

    def _count(self, name: str, amount: int = 1) -> None:
        """Mirror a filtered-path counter into the debug-counter surface
        (/api/internals/counters — the reference's internals.rs idiom)."""
        if self.internals is not None:
            self.internals.increment(f"vs_index_{name}", amount)

    def _remember_ladder(self, sig: tuple, step: int) -> None:
        if len(self._ladder_cache) >= LADDER_CACHE_MAX and sig not in self._ladder_cache:
            # evict one cold entry instead of dropping all learned steps
            self._ladder_cache.pop(next(iter(self._ladder_cache)))
        self._ladder_cache[sig] = step

    def _exhausted(self, req: _SearchRequest, res, k_used: int) -> bool:
        """Has the whole candidate population been considered? For a
        partitioned (local) query that population is the PARTITION, not the
        table: the flat engine's partition directory makes its size O(1)
        to read, which stops pointless k-escalation (each step would
        compile a fresh device-program shape)."""
        if res.slots.size >= self.engine.size or k_used >= self.engine.size:
            return True
        if req.partition is not None and hasattr(self.engine, "partition_count"):
            return k_used >= max(
                self.engine.partition_count(req.partition.slot), 1
            )
        return False

    # executed in a worker thread
    def _finish_terminal(self, reqs: list[_SearchRequest]) -> None:
        """Terminal completion for ladder-exhausted (or cached-match)
        filtered requests, GROUPED by restriction signature: one bulk
        match-set computation per distinct filter (mutation-stamped and
        cached), then one batched exact scan over just the matching rows
        for the whole group — instead of _finish_last's per-query full-table
        ranking. This is what makes the reference's 0.1%-selectivity bucket
        regime (benchmark/src/main.rs:45-49) serve at batch rates: with S
        matching rows, the group costs O(S·d) once, not O(N·d) per query."""
        fallback: list[_SearchRequest] = []
        groups: dict[tuple, list[_SearchRequest]] = {}
        if self.is_local or not hasattr(self.engine, "search_exact_host_subset"):
            fallback = reqs
        else:
            for req in reqs:
                if req.sig is None or req.partition is not None:
                    fallback.append(req)
                else:
                    groups.setdefault(req.sig, []).append(req)
        if groups:
            pid = PartitionId.global_for(
                self.table.index_id(self.metadata.key)
            )
            stamp = self.table.mutations
            for sig, group in groups.items():
                hit = self._match_cache.get(sig)
                if hit is not None and hit[0] == stamp:
                    slots = hit[1]
                else:
                    slots = self._matching_slots_stamped(group[0], stamp)
                self._exact_fallbacks += len(group)
                self._count("exact_host_fallbacks", len(group))
                if slots.size == 0:
                    for req in group:
                        self._finish(req, [])
                    continue
                qs = np.stack([r.vector for r in group])
                dists, epochs = self.engine.search_exact_host_subset(qs, slots)
                for i, req in enumerate(group):
                    self._finish_subset(req, slots, dists[i], epochs, pid)
        for req in fallback:
            self._finish_last(req)

    def _finish_subset(
        self,
        req: _SearchRequest,
        slots: np.ndarray,
        drow: np.ndarray,
        epochs: np.ndarray,
        pid: PartitionId,
    ) -> None:
        """Resolve one request from its subset-exact distance row. The match
        set was stamped against table.mutations, but rows are re-validated
        here (epoch + restrictions) so a concurrent write can only cost a
        retry step, never a wrong result."""
        kk = min(max(req.limit * 2, req.limit + 8), slots.size)
        while True:
            if kk >= slots.size:
                order = np.argsort(drow, kind="stable")
            else:
                part = np.argpartition(drow, kk - 1)[:kk]
                order = part[np.argsort(drow[part], kind="stable")]
            out: list[tuple[PrimaryKey, Distance]] = []
            for j in order:
                if not np.isfinite(drow[j]):
                    break
                primary_id = PrimaryId.new(int(slots[j]), int(epochs[j]))
                if req.restrictions and not all(
                    self.table.is_valid_for(pid, primary_id, r)
                    for r in req.restrictions
                ):
                    continue
                pk = self.table.primary_key(pid, primary_id)
                if pk is None:
                    continue
                out.append((pk, self._distance(float(drow[j]))))
                if len(out) >= req.limit:
                    break
            if len(out) >= req.limit or kk >= slots.size:
                break
            kk = min(slots.size, kk * 4)
        self._finish(req, out[: req.limit])

    def _finish_last(self, req: _SearchRequest) -> None:
        """Oversample steps exhausted: the whole index must be considered —
        low-selectivity filters (0.1% buckets in the reference's benchmark)
        genuinely need k ~ limit/selectivity.

        Engines with a host f32 mirror and a hard device candidate cap
        (IVF: nprobe*LANES per query) expose search_exact_host; one exact
        numpy pass gives the complete ranking, which is then post-filtered
        in bounded chunks. Escalating k through the device path instead
        would compile a fresh program shape per step (30-120 s each through
        the relay) and still top out at the cap."""
        self._exact_fallbacks += 1
        self._count("exact_host_fallbacks")
        if not self.is_local and hasattr(self.engine, "search_exact_host"):
            size = self.engine.size
            res = self.engine.search_exact_host(req.vector, size)
            out: list = []
            step = max(req.limit * OVERSAMPLE_STEPS[-1], 1024)
            for lo in range(0, res.slots.size, step):
                chunk = type(res)(
                    slots=res.slots[lo : lo + step],
                    epochs=res.epochs[lo : lo + step],
                    distances=res.distances[lo : lo + step],
                )
                out.extend(self._resolve(req, chunk))
                if len(out) >= req.limit:
                    break
            self._finish(req, out[: req.limit])
            return
        partitions = None
        if self.is_local:
            partitions = np.asarray(
                [req.partition.slot if req.partition else -1], dtype=np.int32
            )
        size = max(self.engine.size, 1)
        if req.partition is not None and hasattr(self.engine, "partition_count"):
            # a partitioned query's candidate population is the partition
            size = max(
                min(size, self.engine.partition_count(req.partition.slot)), 1
            )
        k = min(size, req.limit * OVERSAMPLE_STEPS[-1] * 4)
        while True:
            res = self.engine.search(req.vector[None, :], k, partitions=partitions)[0]
            resolved = self._resolve(req, res)
            if len(resolved) >= req.limit or k >= size or res.slots.size >= size:
                self._finish(req, resolved[: req.limit])
                return
            k = min(size, k * 4)

    def _resolve(self, req: _SearchRequest, res) -> list[tuple[PrimaryKey, Distance]]:
        """Slot/epoch hits -> (PrimaryKey, Distance), dropping stale epochs
        and rows failing the remaining restrictions (usearch.rs:1067-1154)."""
        out: list[tuple[PrimaryKey, Distance]] = []
        pid = req.partition or PartitionId.global_for(
            self.table.index_id(self.metadata.key)
        )
        for slot, epoch, dist in zip(res.slots, res.epochs, res.distances):
            primary_id = PrimaryId.new(int(slot), int(epoch))
            if req.restrictions:
                ok = all(
                    self.table.is_valid_for(pid, primary_id, r)
                    for r in req.restrictions
                )
                if not ok:
                    continue
            pk = self.table.primary_key(pid, primary_id)
            if pk is None:
                continue
            out.append((pk, self._distance(float(dist))))
        return out

    def _distance(self, d: float) -> Distance:
        st = self.space_type
        if self.quantization is Quantization.B1:
            st = SpaceType.HAMMING
        if st is SpaceType.HAMMING:
            return Distance(float(max(0.0, round(d))), st, self.dimensions)
        if st is SpaceType.COSINE:
            d = min(max(d, 0.0), 2.0)
        elif st is SpaceType.EUCLIDEAN:
            d = max(d, 0.0)
        return Distance(d, st)

    def _finish(self, req: _SearchRequest, result) -> None:
        loop = req.future.get_loop()
        loop.call_soon_threadsafe(
            lambda: req.future.set_result(result) if not req.future.done() else None
        )

    # executed in a worker thread
    @hotpath.measure
    def _apply_ops_batch(self, ops: list[Operation]) -> None:
        """Batch Operation deltas into bulk device calls."""
        can_add = self.memory.can_allocate if self.memory is not None else True
        add_slots: list[int] = []
        add_epochs: list[int] = []
        add_vecs: list[np.ndarray] = []
        add_parts: list[int] = []
        remove_slots: list[int] = []
        seen_add: dict[int, int] = {}  # slot -> position in add arrays
        rm_before_add: set[int] = set()  # slots whose old value must go away
        blocks: list[AddVectorBlock] = []  # columnar bulk inserts (fresh slots)

        for op in ops:
            if isinstance(op, AddVectorBlock):
                # fresh unique slots by construction (Table.upsert_scan), so
                # no interaction with per-row dedup in this batch
                if not can_add:
                    self._dropped_adds += len(op)
                    continue
                if op.vectors.shape[1] != self.dimensions:
                    logger.warning(
                        "dropping %d-row bulk insert with wrong dimensions %d != %d",
                        len(op),
                        op.vectors.shape[1],
                        self.dimensions,
                    )
                    continue
                blocks.append(op)
            elif isinstance(op, AddVector):
                if not can_add:
                    self._dropped_adds += 1
                    continue
                slot = op.primary_id.slot
                pos = seen_add.get(slot)
                vec = np.asarray(op.vector, dtype=np.float32)
                if vec.shape[0] != self.dimensions:
                    logger.warning(
                        "dropping vector with wrong dimensions %d != %d",
                        vec.shape[0],
                        self.dimensions,
                    )
                    continue
                if pos is not None:
                    add_epochs[pos] = op.primary_id.epoch
                    add_vecs[pos] = vec
                    add_parts[pos] = op.partition_id.slot if self.is_local else -1
                else:
                    seen_add[slot] = len(add_slots)
                    add_slots.append(slot)
                    add_epochs.append(op.primary_id.epoch)
                    add_vecs.append(vec)
                    add_parts.append(op.partition_id.slot if self.is_local else -1)
            elif isinstance(op, (RemoveValue,)):
                slot = op.primary_id.slot
                pos = seen_add.pop(slot, None)
                if pos is not None:
                    # add then remove within one batch: drop the add
                    add_slots[pos] = -1
                remove_slots.append(slot)
            elif isinstance(op, RemoveBeforeAddValue):
                # the following AddVector overwrites the same slot with a new
                # epoch, which itself invalidates the old entry — but the add
                # may be dropped (memory gate, wrong dims), so remember the
                # slot and issue an explicit remove if no add landed for it
                rm_before_add.add(op.primary_id.slot)
                continue
            elif isinstance(op, RemovePartition):
                continue  # device partition mask handles emptiness naturally
            elif isinstance(op, AddDocument):
                logger.warning("AddDocument sent to a VS index; ignoring")

        # RemoveBeforeAddValue whose paired add did NOT land (dropped by the
        # memory gate or validation): the old-epoch vector would otherwise
        # stay searchable — remove it explicitly
        orphaned = rm_before_add - {
            add_slots[p] for p in seen_add.values() if add_slots[p] >= 0
        }
        remove_slots.extend(orphaned)
        if remove_slots:
            self.engine.remove_batch(np.asarray(remove_slots, dtype=np.int64))
        # ONE engine dispatch for per-row adds + columnar blocks together:
        # block slots are fresh and unique (Table.upsert_scan invariant),
        # so they cannot collide with the deduped per-row adds
        live = [i for i, s in enumerate(add_slots) if s >= 0]
        if live or blocks:
            slot_parts = [b.slots for b in blocks]
            epoch_parts = [b.epochs for b in blocks]
            vec_parts = [b.vectors for b in blocks]
            part_parts = [
                np.full((len(b),), b.partition_id.slot, dtype=np.int32)
                for b in blocks
            ]
            if live:
                slot_parts.append(np.asarray([add_slots[i] for i in live], dtype=np.int64))
                epoch_parts.append(np.asarray([add_epochs[i] for i in live], dtype=np.int32))
                vec_parts.append(np.stack([add_vecs[i] for i in live]))
                part_parts.append(np.asarray([add_parts[i] for i in live], dtype=np.int32))
            slots = slot_parts[0] if len(slot_parts) == 1 else np.concatenate(slot_parts)
            epochs = epoch_parts[0] if len(epoch_parts) == 1 else np.concatenate(epoch_parts)
            vecs = vec_parts[0] if len(vec_parts) == 1 else np.concatenate(vec_parts)
            parts = part_parts[0] if len(part_parts) == 1 else np.concatenate(part_parts)
            self.engine.upsert_batch(
                slots, epochs, vecs, partitions=parts if self.is_local else None
            )
        # NOTE: index_modified{insert,update,remove} is counted ONCE, by
        # monitor_items (reference parity: monitor_items.rs:280-335 is the
        # only incrementer and its tests assert exact per-row counts).
        # The actor used to double-count every landed add here.


deque_t = asyncio.Queue
