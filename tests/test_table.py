"""Table cache semantics: LWW gates, epoch bumps, partition transitions,
Operation deltas. Mirrors the reference's table/mod.rs inline test matrix."""

import pytest

from vector_store_tpu.core import (
    DbIndexedValue,
    IndexKey,
    PrimaryKey,
    Restriction,
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
from vector_store_tpu.table import (
    AddVector,
    RemoveBeforeAddValue,
    RemovePartition,
    RemoveValue,
    Table,
    partition_key_from_restrictions,
)

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


def vec_values(millis, vector=(1.0, 2.0, 3.0), extra=()):
    head = Timestamped(
        Timestamp.from_millis(millis),
        DbIndexedValue.vector(list(vector)) if vector is not None else None,
    )
    return (head, *extra)


class TestGlobalIndex:
    def test_insert_new_row(self):
        t = Table(make_metadata())
        ops = t.upsert(KEY, pk(1), vec_values(100))
        assert len(ops) == 1
        op = ops[0]
        assert isinstance(op, AddVector)
        assert tuple(op.vector) == (1.0, 2.0, 3.0)
        assert not op.is_update
        assert op.partition_id.index_id.is_global

    def test_update_newer_timestamp(self):
        t = Table(make_metadata())
        (op1,) = t.upsert(KEY, pk(1), vec_values(100))
        ops = t.upsert(KEY, pk(1), vec_values(200, (9.0, 9.0, 9.0)))
        assert [type(o) for o in ops] == [RemoveBeforeAddValue, AddVector]
        rm, add = ops
        assert rm.primary_id == op1.primary_id  # old epoch removed
        assert add.primary_id.slot == op1.primary_id.slot
        assert add.primary_id.epoch == op1.primary_id.epoch + 1
        assert add.is_update

    def test_stale_update_ignored(self):
        t = Table(make_metadata())
        t.upsert(KEY, pk(1), vec_values(200))
        assert t.upsert(KEY, pk(1), vec_values(100)) == []
        assert t.upsert(KEY, pk(1), vec_values(200)) == []  # same ts, same partition

    def test_delete(self):
        t = Table(make_metadata())
        (add,) = t.upsert(KEY, pk(1), vec_values(100))
        ops = t.delete(KEY, pk(1), Timestamp.from_millis(200))
        assert [type(o) for o in ops] == [RemoveValue]
        assert ops[0].primary_id == add.primary_id

    def test_delete_then_stale_upsert(self):
        t = Table(make_metadata())
        t.upsert(KEY, pk(1), vec_values(100))
        t.delete(KEY, pk(1), Timestamp.from_millis(300))
        assert t.upsert(KEY, pk(1), vec_values(200)) == []  # older than delete

    def test_delete_unseen_row_then_late_upsert(self):
        # out-of-order: delete arrives before the upsert it shadows
        t = Table(make_metadata())
        ops = t.delete(KEY, pk(1), Timestamp.from_millis(300))
        assert ops == []  # tombstone over tombstone
        assert t.upsert(KEY, pk(1), vec_values(200)) == []

    def test_upsert_missing_value_is_tombstone(self):
        t = Table(make_metadata())
        t.upsert(KEY, pk(1), vec_values(100))
        ops = t.upsert(KEY, pk(1), vec_values(200, vector=None))
        assert [type(o) for o in ops] == [RemoveValue]

    def test_reinsert_after_delete(self):
        t = Table(make_metadata())
        (a1,) = t.upsert(KEY, pk(1), vec_values(100))
        t.delete(KEY, pk(1), Timestamp.from_millis(200))
        (a2,) = t.upsert(KEY, pk(1), vec_values(300))
        assert isinstance(a2, AddVector)
        assert not a2.is_update  # fresh add into partition
        assert a2.primary_id.slot == a1.primary_id.slot
        assert a2.primary_id.epoch == a1.primary_id.epoch + 2

    def test_epoch_validity(self):
        t = Table(make_metadata())
        (a1,) = t.upsert(KEY, pk(1), vec_values(100))
        assert t.is_valid_primary_id(a1.partition_id, a1.primary_id)
        ops = t.upsert(KEY, pk(1), vec_values(200))
        add2 = ops[-1]
        assert not t.is_valid_primary_id(a1.partition_id, a1.primary_id)
        assert t.is_valid_primary_id(add2.partition_id, add2.primary_id)
        assert t.primary_key(a1.partition_id, a1.primary_id) is None
        assert t.primary_key(add2.partition_id, add2.primary_id) == pk(1)

    def test_distinct_rows_get_distinct_slots(self):
        t = Table(make_metadata())
        (a1,) = t.upsert(KEY, pk(1), vec_values(100))
        (a2,) = t.upsert(KEY, pk(2), vec_values(100))
        assert a1.primary_id.slot != a2.primary_id.slot

    def test_partition_id_global(self):
        t = Table(make_metadata())
        pid, rest = t.partition_id(KEY, None)
        assert pid.index_id.is_global
        assert rest is None


def fval(millis, value):
    return Timestamped(
        Timestamp.from_millis(millis),
        DbIndexedValue.filtering(value) if value is not None else None,
    )


class TestLocalIndex:
    """Local index partitioned by a non-pk filtering column 'part'."""

    def make(self):
        md = make_metadata(
            partitioning=DbIndexPartitioning.local(("part",)),
            filtering=(),
        )
        return Table(md)

    def test_new_partition_then_add(self):
        t = self.make()
        ops = t.upsert(KEY, pk(1), vec_values(100, extra=(fval(100, "a"),)))
        assert [type(o) for o in ops] == [AddVector]
        p1 = ops[0].partition_id
        assert not p1.index_id.is_global
        ops2 = t.upsert(KEY, pk(2), vec_values(100, extra=(fval(100, "a"),)))
        assert ops2[0].partition_id == p1  # same partition value -> same id

    def test_partitions_differ(self):
        t = self.make()
        (a,) = t.upsert(KEY, pk(1), vec_values(100, extra=(fval(100, "a"),)))
        (b,) = t.upsert(KEY, pk(2), vec_values(100, extra=(fval(100, "b"),)))
        assert a.partition_id != b.partition_id

    def test_move_between_partitions(self):
        t = self.make()
        (a,) = t.upsert(KEY, pk(1), vec_values(100, extra=(fval(100, "a"),)))
        t.upsert(KEY, pk(2), vec_values(100, extra=(fval(100, "b"),)))
        # row 1 moves partition a -> b; partition a becomes empty
        ops = t.upsert(KEY, pk(1), vec_values(200, extra=(fval(200, "b"),)))
        kinds = [type(o) for o in ops]
        assert kinds == [RemoveBeforeAddValue, RemovePartition, AddVector]
        assert ops[0].partition_id == a.partition_id
        assert ops[2].partition_id != a.partition_id
        assert ops[2].is_update

    def test_remove_last_row_drops_partition(self):
        t = self.make()
        (a,) = t.upsert(KEY, pk(1), vec_values(100, extra=(fval(100, "a"),)))
        ops = t.delete(KEY, pk(1), Timestamp.from_millis(200))
        assert [type(o) for o in ops] == [RemoveValue, RemovePartition]

    def test_partition_key_lost(self):
        # the partition column value is tombstoned later: row leaves the index
        t = self.make()
        (a,) = t.upsert(KEY, pk(1), vec_values(100, extra=(fval(100, "a"),)))
        ops = t.upsert(
            KEY, pk(1), vec_values(200, vector=(5.0, 5.0, 5.0), extra=(fval(200, None),))
        )
        kinds = [type(o) for o in ops]
        assert kinds == [RemoveValue, RemovePartition]

    def test_partition_id_from_restrictions(self):
        t = self.make()
        t.upsert(KEY, pk(1), vec_values(100, extra=(fval(100, "a"),)))
        got = t.partition_id(KEY, [Restriction.eq("part", "a")])
        assert got is not None
        pid, rest = got
        assert rest is None
        # unknown partition value
        assert t.partition_id(KEY, [Restriction.eq("part", "zz")]) is None
        # no restrictions -> cannot route
        assert t.partition_id(KEY, None) is None

    def test_partition_reuse_after_drop(self):
        t = self.make()
        t.upsert(KEY, pk(1), vec_values(100, extra=(fval(100, "a"),)))
        t.delete(KEY, pk(1), Timestamp.from_millis(200))
        (a2,) = t.upsert(KEY, pk(2), vec_values(300, extra=(fval(300, "a"),)))
        assert isinstance(a2, AddVector)


class TestFiltering:
    def make(self):
        md = make_metadata(filtering=("f1", "f2"))
        return Table(md)

    def test_is_valid_for(self):
        t = self.make()
        (a,) = t.upsert(
            KEY,
            pk(1),
            vec_values(100, extra=(fval(100, 5), fval(100, "x"))),
        )
        assert t.is_valid_for(a.partition_id, a.primary_id, Restriction.eq("f1", 5))
        assert not t.is_valid_for(a.partition_id, a.primary_id, Restriction.eq("f1", 6))
        assert t.is_valid_for(a.partition_id, a.primary_id, Restriction.eq("f2", "x"))
        # pk column passthrough
        assert t.is_valid_for(a.partition_id, a.primary_id, Restriction.eq("pk", 1))
        assert not t.is_valid_for(a.partition_id, a.primary_id, Restriction.eq("pk", 2))

    def test_stale_id_never_valid(self):
        t = self.make()
        (a,) = t.upsert(KEY, pk(1), vec_values(100, extra=(fval(100, 5), fval(100, "x"))))
        t.upsert(KEY, pk(1), vec_values(200, extra=(fval(200, 5), fval(200, "x"))))
        assert not t.is_valid_for(a.partition_id, a.primary_id, Restriction.eq("f1", 5))

    def test_filtering_lww(self):
        t = self.make()
        (a,) = t.upsert(KEY, pk(1), vec_values(100, extra=(fval(100, 5), fval(100, "x"))))
        # newer vector but STALE filtering value must not clobber newer one
        t.upsert(KEY, pk(1), vec_values(300, extra=(fval(300, 7), fval(300, "x"))))
        ops = t.upsert(KEY, pk(1), vec_values(400, extra=(fval(200, 6), fval(200, "x"))))
        add = ops[-1]
        assert t.is_valid_for(add.partition_id, add.primary_id, Restriction.eq("f1", 7))


class TestPartitionKeyFromRestrictions:
    def test_extraction(self):
        got = partition_key_from_restrictions(
            ("a", "b"),
            [Restriction.eq("a", 1), Restriction.eq("b", 2), Restriction.gt("c", 0)],
        )
        assert got is not None
        pkey, rest = got
        assert pkey.values() == (1, 2)
        assert rest is not None and len(rest) == 1 and rest[0].lhs == ("c",)

    def test_missing_column(self):
        assert (
            partition_key_from_restrictions(("a", "b"), [Restriction.eq("a", 1)]) is None
        )

    def test_all_consumed(self):
        got = partition_key_from_restrictions(("a",), [Restriction.eq("a", 1)])
        assert got is not None and got[1] is None
