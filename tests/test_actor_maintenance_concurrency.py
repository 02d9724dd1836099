"""Actor scheduling under concurrent maintenance (service/vs_index.py):

- modify batches apply WHILE a dirty-tracking engine's build slice is in
  flight (maintain_modify_safe) — continuous churn must not starve the
  rebuild, and a long rebuild must not starve freshness (the round-4
  streaming-actor run measured a 1M rebuild making zero progress under
  1.5k upserts/s, with freshness collapsing to one 87 s sample);
- the `start` snapshot slice waits for a modify gap (it reads the host
  tables a modify mutates);
- without maintain_modify_safe, modifies stay exclusive against slices.

Reference contract being mirrored: inserts run as concurrent worker jobs
against searches and build work (worker.rs:44-118), with only Reserve/
Remove exclusive (usearch.rs:515-623).
"""

import asyncio
import threading
import time

import numpy as np

from vector_store_tpu.db.fake import make_vs_metadata
from vector_store_tpu.engine.simulator import SimulatorIndex
from vector_store_tpu.service.vs_index import VsIndexActor
from vector_store_tpu.table import Table
from vector_store_tpu.core import (
    DbIndexedValue,
    IndexKey,
    PrimaryKey,
    Timestamp,
    Timestamped,
)

KEY = IndexKey("ks", "idx")


class SlowSliceEngine(SimulatorIndex):
    """Simulator engine + a maintain_pending API whose one pending slice
    blocks until the test releases it."""

    maintain_modify_safe = True

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.slice_release = threading.Event()
        self.slice_running = threading.Event()
        self.pending_kinds: list[str] = ["kmeans"]
        self.slices_run: list[str] = []

    def maintain_pending(self):
        return self.pending_kinds[0] if self.pending_kinds else None

    def maintain(self, budget=None):
        if not self.pending_kinds:
            return False
        kind = self.pending_kinds.pop(0)
        self.slices_run.append(kind)
        if kind == "kmeans":
            self.slice_running.set()
            assert self.slice_release.wait(20), "slice never released"
        return True


def _ops(table, slot, millis):
    return table.upsert(
        KEY,
        PrimaryKey.from_values((slot,)),
        (
            Timestamped(
                Timestamp.from_millis(millis),
                DbIndexedValue.vector(
                    np.random.default_rng(slot).normal(size=8).tolist()
                ),
            ),
        ),
    )


async def _serve(engine_cls):
    md = make_vs_metadata(dimensions=8)
    table = Table(md)
    actor = VsIndexActor(md, table, engine_kind="sim")
    actor.engine = engine_cls(8)
    actor._pipelined = hasattr(actor.engine, "search_begin")
    actor.start()
    return actor, table


async def test_modify_applies_during_concurrent_slice():
    actor, table = await _serve(SlowSliceEngine)
    eng = actor.engine
    try:
        # seed one row so searches work at all
        actor.apply_operations(_ops(table, 0, 100))
        deadline = time.time() + 10
        while await actor.count() < 1:
            assert time.time() < deadline
            await asyncio.sleep(0.01)
        # let the actor dispatch the blocking kmeans slice
        await asyncio.to_thread(eng.slice_running.wait, 10)
        assert eng.slice_running.is_set()
        # a modify arriving mid-slice must land WITHOUT waiting for it
        actor.apply_operations(_ops(table, 1, 200))
        deadline = time.time() + 5
        try:
            while await actor.count() < 2:
                assert time.time() < deadline, (
                    "modify starved behind an in-flight build slice"
                )
                await asyncio.sleep(0.01)
        finally:
            eng.slice_release.set()
        assert eng.slices_run == ["kmeans"]
    finally:
        eng.slice_release.set()
        await actor.stop()


async def test_start_dispatches_despite_queued_modifies_which_wait():
    """A due `start` must dispatch even while the modify queue is busy
    (queued ops are inert data; only their APPLICATION mutates the host
    tables the snapshot reads) — and modify application must then wait for
    the slice. Gating start on an EMPTY queue starved rebuilds: measured
    at 1M/1.6k upserts/s the queue was empty 1.9% of the time and a due
    rebuild stayed pending for 99 s."""

    class SlowStartEngine(SlowSliceEngine):
        def maintain(self, budget=None):
            if not self.pending_kinds:
                return False
            kind = self.pending_kinds.pop(0)
            self.slices_run.append(kind)
            if kind == "start":
                self.slice_running.set()
                assert self.slice_release.wait(20), "slice never released"
            return True

    actor, table = await _serve(SlowStartEngine)
    eng = actor.engine
    eng.pending_kinds = ["start"]
    try:
        # idle actor dispatches the blocking start slice
        await asyncio.to_thread(eng.slice_running.wait, 10)
        assert eng.slices_run == ["start"]
        # modifies queue up but must NOT apply while start is in flight
        actor.apply_operations(_ops(table, 0, 100))
        await asyncio.sleep(0.4)
        assert await actor.count() == 0, "modify applied during start"
        assert actor.backlog > 0
        eng.slice_release.set()
        deadline = time.time() + 10
        while await actor.count() < 1:
            assert time.time() < deadline
            await asyncio.sleep(0.01)
    finally:
        eng.slice_release.set()
        await actor.stop()


async def test_unsafe_engine_serializes_modifies():
    class UnsafeEngine(SlowSliceEngine):
        maintain_modify_safe = False

    actor, table = await _serve(UnsafeEngine)
    eng = actor.engine
    try:
        # idle actor dispatches the blocking kmeans slice immediately
        await asyncio.to_thread(eng.slice_running.wait, 10)
        assert eng.slice_running.is_set()
        # modify must NOT land while the slice is in flight
        actor.apply_operations(_ops(table, 0, 100))
        await asyncio.sleep(0.4)
        assert await actor.count() == 0, "unsafe engine applied mid-slice"
        eng.slice_release.set()
        deadline = time.time() + 10
        while await actor.count() < 1:
            assert time.time() < deadline
            await asyncio.sleep(0.01)
    finally:
        eng.slice_release.set()
        await actor.stop()


async def test_reenter_runs_exclusively_like_modify():
    """Post-swap `reenter` chunks are upserts — they mutate serving arrays,
    so the actor must run them in the exclusive (drained-pipeline) slot,
    never concurrently with modify application (round 5: the swap slice
    became metadata-only and mid-build mutations re-enter via bounded
    chunks)."""

    class ReenterEngine(SlowSliceEngine):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.pending_kinds = ["reenter"]

        def maintain(self, budget=None):
            if not self.pending_kinds:
                return False
            kind = self.pending_kinds.pop(0)
            self.slices_run.append(kind)
            if kind == "reenter":
                self.slice_running.set()
                assert self.slice_release.wait(20), "slice never released"
            return True

    actor, table = await _serve(ReenterEngine)
    eng = actor.engine
    try:
        actor.apply_operations(_ops(table, 0, 100))
        deadline = time.time() + 10
        while await actor.count() < 1:
            assert time.time() < deadline
            await asyncio.sleep(0.01)
        # the reenter slice dispatches via the exclusive step (pipeline
        # drained), and the actor loop awaits it inline: a modify arriving
        # MID-SLICE must NOT apply until the slice completes
        await asyncio.to_thread(eng.slice_running.wait, 10)
        assert eng.slice_running.is_set()
        actor.apply_operations(_ops(table, 1, 200))
        await asyncio.sleep(0.3)
        assert await _count_direct(actor) == 1, (
            "modify applied concurrently with a reenter slice"
        )
        eng.slice_release.set()
        deadline = time.time() + 5
        while await actor.count() < 2:
            assert time.time() < deadline, "modify never applied after slice"
            await asyncio.sleep(0.01)
        assert eng.slices_run == ["reenter"]
    finally:
        eng.slice_release.set()
        await actor.stop()


async def _count_direct(actor) -> int:
    """Engine row count WITHOUT going through the actor queue (an
    actor.count() would block behind the in-flight exclusive slice)."""
    return actor.engine.size
