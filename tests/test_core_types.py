"""Domain-core unit tests, ported in spirit from the reference's inline
tests (distance.rs, similarity.rs, timestamp.rs, primary_id.rs)."""

import math
import uuid

import pytest

from vector_store_tpu.core import (
    Distance,
    IndexId,
    IndexIdGenerator,
    IndexVersion,
    PartitionId,
    PrimaryId,
    Quantization,
    SpaceType,
    Timestamp,
    Timestamped,
    similarity_score,
)
from vector_store_tpu.core.ids import next_epoch
from vector_store_tpu.core.types import (
    Connectivity,
    Dimensions,
    ExpansionAdd,
    ExpansionSearch,
    Limit,
    is_alternator_keyspace,
)


class TestDistanceValidation:
    def test_euclidean(self):
        for v in [0.0, 0.123, 1.0, 2.0, 5.0, 100.5, 3.4e38, math.inf]:
            assert Distance.euclidean(v).value == v
        for v in [-0.1, -1.0, -math.inf, math.nan]:
            with pytest.raises(ValueError):
                Distance.euclidean(v)

    def test_cosine(self):
        for v in [0.0, 0.123, 1.0, 2.0]:
            assert Distance.cosine(v).value == v
        for v in [5.0, 100.5, 3.4e38, -0.1, -1.0, math.inf, -math.inf, math.nan]:
            with pytest.raises(ValueError):
                Distance.cosine(v)

    def test_dot_product(self):
        for v in [0.0, 0.123, 1.0, 2.0, 5.0, 100.5, -0.1, -1.0, math.inf, -math.inf]:
            assert Distance.dot_product(v).value == v
        with pytest.raises(ValueError):
            Distance.dot_product(math.nan)

    def test_hamming(self):
        dims = 3
        for v in [0.0, 1.0, 2.0]:
            assert Distance.hamming(v, dims).value == v
        for v in [0.123, 5.0, 100.5, 3.4e38, -0.1, -1.0, math.inf, -math.inf, math.nan]:
            with pytest.raises(ValueError):
                Distance.hamming(v, dims)
        with pytest.raises(ValueError):
            Distance(1.0, SpaceType.HAMMING, None)


class TestSimilarity:
    def test_euclidean(self):
        assert similarity_score(Distance.euclidean(0.0)) == 1.0
        assert similarity_score(Distance.euclidean(1.0)) == 0.5
        assert similarity_score(Distance.euclidean(99.0)) == 0.01
        assert similarity_score(Distance.euclidean(1000.0)) < 0.001

    def test_cosine(self):
        assert similarity_score(Distance.cosine(0.0)) == 1.0
        assert similarity_score(Distance.cosine(1.0)) == 0.5
        assert similarity_score(Distance.cosine(2.0)) == 0.0

    def test_dot_product(self):
        assert similarity_score(Distance.dot_product(0.0)) == 1.0
        assert similarity_score(Distance.dot_product(1.0)) == 0.5
        assert similarity_score(Distance.dot_product(2.0)) == 0.0
        assert similarity_score(Distance.dot_product(6.7)) == pytest.approx(-2.35)
        assert similarity_score(Distance.dot_product(-1.8)) == pytest.approx(1.9)

    def test_hamming(self):
        assert similarity_score(Distance.hamming(0.0, 128)) == 1.0
        assert similarity_score(Distance.hamming(64.0, 128)) == 0.5
        assert similarity_score(Distance.hamming(128.0, 128)) == 0.0
        assert similarity_score(Distance.hamming(35.0, 50)) == pytest.approx(0.3)


class TestTimestamp:
    def test_unit_conversions(self):
        assert Timestamp.from_micros(1).ticks == 10
        assert Timestamp.from_millis(1).ticks == 10_000
        assert Timestamp.from_seconds(1).ticks == 10_000_000

    def test_saturation(self):
        # mirrors timestamp.rs: each unit saturates at its own maximum, so
        # from_micros(huge) == MAX_MICROS * 10 ticks (not MAX ticks).
        max_ticks = Timestamp.MAX.ticks
        assert Timestamp.from_100_nanos(2**64).ticks == max_ticks
        assert Timestamp.from_micros(2**64).ticks == (max_ticks // 10) * 10
        assert Timestamp.from_seconds(2**64).ticks == (
            max_ticks // 10 // 1000 // 1000
        ) * 10_000_000

    def test_ordering(self):
        assert Timestamp(5) < Timestamp(6)
        assert Timestamp.MIN < Timestamp.now() < Timestamp.MAX

    def test_elapsed_future_is_zero(self):
        assert Timestamp.MAX.elapsed_seconds() == 0.0
        assert Timestamp.MIN.elapsed_seconds() > 0.0


class TestTimestamped:
    def test_value(self):
        t = Timestamped(Timestamp(42), "hello")
        assert t.is_valid and not t.is_tombstone
        assert t.timestamp == Timestamp(42)
        assert t.value == "hello"

    def test_tombstone(self):
        t = Timestamped.tombstone(Timestamp(42))
        assert t.is_tombstone and not t.is_valid
        assert t.timestamp == Timestamp(42)
        assert t.value is None

    def test_max_timestamp_roundtrips(self):
        t = Timestamped(Timestamp.MAX, 1)
        assert t.timestamp == Timestamp.MAX and t.is_valid
        t = Timestamped.tombstone(Timestamp.MAX)
        assert t.timestamp == Timestamp.MAX and t.is_tombstone


class TestIds:
    def test_primary_id_packing(self):
        pid = PrimaryId.new(12345, 7)
        assert pid.slot == 12345
        assert pid.epoch == 7
        assert pid.value == (7 << 48) | 12345

    def test_primary_id_epoch_replacement(self):
        pid = PrimaryId.new(1, 1).with_epoch(9)
        assert pid.slot == 1 and pid.epoch == 9

    def test_primary_id_limits(self):
        PrimaryId.new((1 << 48) - 1, 65535)
        with pytest.raises(ValueError):
            PrimaryId.new(1 << 48, 0)
        with pytest.raises(ValueError):
            PrimaryId.new(0, 65536)

    def test_epoch_wraps(self):
        assert next_epoch(0) == 1
        assert next_epoch(65535) == 0

    def test_index_id_global_bit(self):
        assert IndexId.global_(3).is_global
        assert not IndexId.local(3).is_global
        assert IndexId.global_(3) != IndexId.local(3)
        with pytest.raises(ValueError):
            IndexId.local(0x8000)

    def test_index_id_generator(self):
        gen = IndexIdGenerator()
        a = gen.next(global_=True)
        b = gen.next(global_=False)
        assert a.is_global and not b.is_global

    def test_partition_id(self):
        idx = IndexId.global_(5)
        p = PartitionId.global_for(idx)
        assert p.slot == 0 and p.index_id == idx
        p2 = PartitionId.new(99, IndexId.local(5))
        assert p2.slot == 99 and not p2.index_id.is_global


class TestTypes:
    def test_defaults(self):
        assert int(Connectivity()) == 16
        assert int(ExpansionAdd()) == 128
        assert int(ExpansionSearch()) == 64
        assert int(Limit()) == 1
        assert SpaceType.default() is SpaceType.COSINE
        assert Quantization.default() is Quantization.F32

    def test_parsing(self):
        assert SpaceType.parse("cosine") is SpaceType.COSINE
        assert SpaceType.parse("DOT_PRODUCT") is SpaceType.DOT_PRODUCT
        with pytest.raises(ValueError):
            SpaceType.parse("bogus")
        assert Quantization.parse("bf16") is Quantization.BF16
        with pytest.raises(ValueError):
            Quantization.parse("f64")

    def test_validation(self):
        with pytest.raises(ValueError):
            Dimensions(0)
        with pytest.raises(ValueError):
            Limit(0)

    def test_alternator_prefix(self):
        assert is_alternator_keyspace("alternator_mydb")
        assert not is_alternator_keyspace("mydb")

    def test_index_version_ordering(self):
        v1 = IndexVersion(uuid.uuid1())
        v2 = IndexVersion(uuid.uuid1())
        assert v1 <= v2
        assert IndexVersion.nil() <= v1
        # random UUIDs (no timestamp) sort as ticks 0
        assert IndexVersion(uuid.uuid4()).gregorian_ticks() == 0
