"""local_rows_df: value-exact round-trips on BOTH branches.

The fast (Arrow) path must produce byte-identical values to the plain
``createDataFrame`` path, and anything it cannot represent exactly must
fall through to the plain path rather than let pandas inference coerce
(r7 ADVICE: ints with a None become float64/NaN under bare
``pd.DataFrame(rows)``, and Spark's internal Arrow fallback can accept
the coerced frame without raising).
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import types as T

from etl_complete_with_spark_spark.localdata import (
    _typed_columns,
    local_rows_df,
)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestFastPath:
    def test_scalar_types_roundtrip(self, spark):
        rows = [(1, 2.5, "a", True), (-(2**62), -0.0, "", False)]
        df = local_rows_df(spark, rows, "i long, d double, s string, b boolean")
        assert _sorted_rows(df) == sorted(rows)
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "bigint", "double", "string", "boolean",
        ]

    def test_big_long_not_float_coerced(self, spark):
        # 2**53 + 1 is the first long a float64 detour would corrupt
        big = 2**53 + 1
        df = local_rows_df(spark, [(big,)], "v long")
        assert df.collect()[0].v == big

    def test_array_columns_roundtrip(self, spark):
        rows = [(1, [1.0, 2.0], ["x", "y"]), (2, [], [])]
        df = local_rows_df(
            spark, rows, "id long, v array<double>, s array<string>"
        )
        got = {r.id: (r.v, r.s) for r in df.collect()}
        assert got == {1: ([1.0, 2.0], ["x", "y"]), 2: ([], [])}

    def test_int_elements_cast_into_double_array(self, spark):
        # callers pass python ints into array<double>; element check
        # accepts numerics and Spark casts exactly
        df = local_rows_df(spark, [(1, [1, 2])], "id long, v array<double>")
        assert df.collect()[0].v == [1.0, 2.0]

    def test_structtype_schema_accepted(self, spark):
        schema = T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("c", T.LongType())]
        )
        df = local_rows_df(spark, [(1, 2)], schema)
        assert _sorted_rows(df) == [(1, 2)]


class TestFallbackPath:
    """Rows the fast path must REJECT (mismatch raises in _typed_columns)
    and the wrapper must still round-trip exactly via the plain path."""

    def test_none_in_int_column_rejected_then_exact(self, spark):
        rows = [(1, 10), (2, None), (3, 30)]
        with pytest.raises(TypeError):
            _typed_columns(rows, T.StructType.fromDDL("id long, v long"))
        df = local_rows_df(spark, rows, "id long, v long")
        assert df.schema["v"].dataType.simpleString() == "bigint"
        assert _sorted_rows(df) == [(1, 10), (2, None), (3, 30)]

    def test_decimal_rejected_then_exact(self, spark):
        rows = [(1, Decimal("12345678901234.5678"))]
        ddl = "id long, amt decimal(20,4)"
        with pytest.raises(TypeError):
            _typed_columns(rows, T.StructType.fromDDL(ddl))
        df = local_rows_df(spark, rows, ddl)
        assert df.collect()[0].amt == Decimal("12345678901234.5678")

    def test_nested_struct_rejected_then_exact(self, spark):
        ddl = "id long, pt struct<x: long, y: long>"
        rows = [(1, (3, 4))]
        with pytest.raises(TypeError):
            _typed_columns(rows, T.StructType.fromDDL(ddl))
        df = local_rows_df(spark, rows, ddl)
        r = df.collect()[0]
        assert (r.id, r.pt.x, r.pt.y) == (1, 3, 4)

    def test_bool_not_accepted_as_int(self, spark):
        # plain path type-verification rejects bool-for-long; the fast
        # path must not silently cast True -> 1
        with pytest.raises(TypeError):
            _typed_columns([(True,)], T.StructType.fromDDL("v long"))

    def test_float_not_accepted_as_int(self, spark):
        # plain path rejects 1.5 in a long column; fast path must raise
        # (numpy astype would silently truncate), wrapper falls back to
        # the plain path which surfaces the caller bug
        with pytest.raises(TypeError):
            _typed_columns([(1.5,)], T.StructType.fromDDL("v long"))

    def test_row_width_mismatch_rejected(self, spark):
        with pytest.raises(TypeError):
            _typed_columns([(1, 2, 3)], T.StructType.fromDDL("a long, b long"))

    def test_none_heavy_strings_exact(self, spark):
        rows = [("a", None), (None, "b"), (None, None)]
        df = local_rows_df(spark, rows, "x string, y string")
        assert set(tuple(r) for r in df.collect()) == set(rows)

    def test_empty_rows(self, spark):
        df = local_rows_df(spark, [], "id long, v double")
        assert df.count() == 0
        assert len(df.schema.fields) == 2
