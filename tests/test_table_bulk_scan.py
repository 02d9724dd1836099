"""Table.upsert_scan (bulk full-scan ingest path) must be byte-identical
in table state to the canonical per-row upsert, and its AddVectorBlock
must carry exactly the rows per-row upserts would have emitted."""

import numpy as np

from vector_store_tpu.core import (
    DbIndexedValue,
    IndexKey,
    PrimaryKey,
    Timestamp,
    Timestamped,
)
from vector_store_tpu.core.types import (
    DbIndexPartitioning,
    Dimensions,
    IndexMetadata,
    IndexOptionsVs,
    IndexVersion,
)
from vector_store_tpu.table import AddVector, AddVectorBlock, Table

KEY = IndexKey("ks", "idx")


def make_metadata(partitioning=None, filtering=()):
    return IndexMetadata(
        keyspace_name="ks",
        index_name="idx",
        table_name="tbl",
        primary_key_columns=("pk", "ck"),
        partition_key_count=1,
        target_columns=("emb",),
        partitioning=partitioning or DbIndexPartitioning.global_(),
        filtering_columns=tuple(filtering),
        version=IndexVersion.nil(),
        vs_options=IndexOptionsVs(dimensions=Dimensions(3)),
    )


def pk(n):
    return PrimaryKey.from_values((n, 0))


def vec_values(millis, vector=(1.0, 2.0, 3.0)):
    return (
        Timestamped(
            Timestamp.from_millis(millis),
            DbIndexedValue.vector(list(vector)) if vector is not None else None,
        ),
    )


def flatten_adds(ops):
    """ops -> sorted [(slot, epoch, vector-tuple)] regardless of encoding."""
    out = []
    for op in ops:
        if isinstance(op, AddVector):
            out.append(
                (
                    op.primary_id.slot,
                    op.primary_id.epoch,
                    tuple(np.asarray(op.vector, np.float32).tolist()),
                )
            )
        elif isinstance(op, AddVectorBlock):
            for i in range(len(op)):
                out.append(
                    (
                        int(op.slots[i]),
                        int(op.epochs[i]),
                        tuple(op.vectors[i].tolist()),
                    )
                )
    return sorted(out)


def table_state(t):
    idx = t.indexes[t.index_ids[KEY]]
    used = {p.slot for p in t.primary_ids.values()}
    return {
        "pk_slots": {k: v.slot for k, v in t.primary_ids.items()},
        "epochs": {s: int(idx.epochs[s]) for s in used},
        "value_ts": {s: int(idx.value_ts[s, 0]) for s in used},
    }


def test_fresh_rows_equivalent_and_compressed():
    rng = np.random.default_rng(0)
    rows = [
        (pk(i), vec_values(100 + i, rng.normal(size=3).astype(np.float32)))
        for i in range(50)
    ]
    t_ref, t_bulk = Table(make_metadata()), Table(make_metadata())
    ops_ref = [op for k, v in rows for op in t_ref.upsert(KEY, k, v)]
    ops_bulk = t_bulk.upsert_scan(KEY, rows)
    assert flatten_adds(ops_ref) == flatten_adds(ops_bulk)
    assert table_state(t_ref) == table_state(t_bulk)
    # the whole batch compressed into one columnar block
    blocks = [op for op in ops_bulk if isinstance(op, AddVectorBlock)]
    assert len(blocks) == 1 and len(blocks[0]) == 50


def test_mixed_batch_matches_per_row():
    """Duplicates, pre-existing PKs, tombstones, stale timestamps, and a
    wrong-shaped vector interleaved with fresh rows: identical outcomes."""
    rng = np.random.default_rng(1)
    rows = []
    for i in range(10):
        rows.append((pk(i), vec_values(100 + i, rng.normal(size=3))))
    rows.append((pk(3), vec_values(500, (9.0, 9.0, 9.0))))  # dup, newer
    rows.append((pk(4), vec_values(1, (8.0, 8.0, 8.0))))  # dup, stale
    rows.append((pk(20), vec_values(100, None)))  # null target = tombstone
    rows.append((pk(21), vec_values(100, (1.0, 2.0))))  # wrong dims (actor drops)
    rows.append((pk(22), vec_values(100)))  # fresh again after slow rows

    t_ref, t_bulk = Table(make_metadata()), Table(make_metadata())
    # pre-existing row in both tables
    for t in (t_ref, t_bulk):
        t.upsert(KEY, pk(0), vec_values(50))
    ops_ref = [op for k, v in rows for op in t_ref.upsert(KEY, k, v)]
    ops_bulk = t_bulk.upsert_scan(KEY, rows)
    assert flatten_adds(ops_ref) == flatten_adds(ops_bulk)
    assert table_state(t_ref) == table_state(t_bulk)


def test_local_index_falls_back_to_per_row():
    meta = make_metadata(
        partitioning=DbIndexPartitioning.local(("pk",)),
    )
    rows = [(pk(i), vec_values(100 + i)) for i in range(5)]
    t_ref, t_bulk = Table(meta), Table(meta)
    ops_ref = [op for k, v in rows for op in t_ref.upsert(KEY, k, v)]
    ops_bulk = t_bulk.upsert_scan(KEY, rows)
    assert flatten_adds(ops_ref) == flatten_adds(ops_bulk)
    assert not any(isinstance(op, AddVectorBlock) for op in ops_bulk)
    assert table_state(t_ref) == table_state(t_bulk)


def test_filtering_columns_fall_back_to_per_row():
    meta = make_metadata(filtering=("color",))
    filt = Timestamped(
        Timestamp.from_millis(100), DbIndexedValue.filtering("red")
    )
    rows = [
        (pk(i), (*vec_values(100 + i), filt))
        for i in range(5)
    ]
    t_ref, t_bulk = Table(meta), Table(meta)
    ops_ref = [op for k, v in rows for op in t_ref.upsert(KEY, k, v)]
    ops_bulk = t_bulk.upsert_scan(KEY, rows)
    assert flatten_adds(ops_ref) == flatten_adds(ops_bulk)
    assert not any(isinstance(op, AddVectorBlock) for op in ops_bulk)
    assert table_state(t_ref) == table_state(t_bulk)
