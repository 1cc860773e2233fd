"""Unit tests for operators.transforms (SURVEY §2.7/§2.11 parity)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import Row, functions as F

from etl_complete_with_spark_spark.operators.transforms import (
    dedup_by_key,
    quality_check_dateformat,
    with_batch_timestamp,
    with_surrogate_key,
    work_to_trusted_transform,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


class TestSurrogateKey:
    def test_hyphen_mode_value(self, spark):
        df = spark.createDataFrame([Row(a="x", b="y")])
        out = with_surrogate_key(df, ["a", "b"]).first()
        assert out.sk == _md5("x-y")

    def test_no_separator_mode_value(self, spark):
        df = spark.createDataFrame([Row(a="x", b="y")])
        out = with_surrogate_key(df, ["a", "b"], hyphen_separator=False).first()
        assert out.sk == _md5("xy")

    def test_boundary_collision_only_without_separator(self, spark):
        # ("ab","c") vs ("a","bc"): concat collides, concat_ws does not
        # (reference utils.py:688-700 divergence).
        df = spark.createDataFrame([Row(a="ab", b="c"), Row(a="a", b="bc")])
        plain = [r.sk for r in with_surrogate_key(df, ["a", "b"], False).collect()]
        hyphen = [r.sk for r in with_surrogate_key(df, ["a", "b"], True).collect()]
        assert plain[0] == plain[1]
        assert hyphen[0] != hyphen[1]

    def test_null_semantics(self, spark):
        # concat -> NULL sk if any component NULL; concat_ws skips NULLs.
        df = spark.createDataFrame([Row(a="x", b=None)], schema="a string, b string")
        assert with_surrogate_key(df, ["a", "b"], False).first().sk is None
        assert with_surrogate_key(df, ["a", "b"], True).first().sk == _md5("x")

    def test_numeric_columns_cast_to_string(self, spark):
        df = spark.createDataFrame([Row(k=42)])
        assert with_surrogate_key(df, ["k"]).first().sk == _md5("42")


class TestBatchTimestamp:
    def test_constant_per_batch(self, spark):
        df = spark.range(5)
        ts = dt.datetime(2024, 1, 2, 3, 4, 5)
        vals = {r.timestamp_kafka for r in with_batch_timestamp(df, ts).collect()}
        assert vals == {ts}

    def test_timestamp_type(self, spark):
        out = with_batch_timestamp(spark.range(1), "2024-01-01 00:00:00")
        assert dict(out.dtypes)["timestamp_kafka"] == "timestamp"


class TestQualityCheck:
    def test_year_boundary(self, spark):
        # year 0009 -> NULL, year 0010 survives (reference utils.py:741).
        df = spark.createDataFrame(
            [
                Row(id=1, d=dt.date(9, 12, 31)),
                Row(id=2, d=dt.date(10, 1, 1)),
                Row(id=3, d=dt.date(2024, 6, 1)),
            ]
        )
        rows = {r.id: r.d for r in quality_check_dateformat(df).collect()}
        assert rows[1] is None
        assert rows[2] == dt.date(10, 1, 1)
        assert rows[3] == dt.date(2024, 6, 1)

    def test_discovery_by_dtype_not_name(self, spark):
        # A date-looking *string* column must not be touched.
        df = spark.createDataFrame([Row(id=1, fake_date="0001-01-01")])
        assert quality_check_dateformat(df).first().fake_date == "0001-01-01"

    def test_timestamp_columns_also_checked(self, spark):
        df = spark.createDataFrame([Row(ts=dt.datetime(5, 1, 1, 0, 0))])
        assert quality_check_dateformat(df).first().ts is None


class TestDedup:
    def test_arbitrary_mode_one_row_per_key(self, spark):
        df = spark.createDataFrame([Row(sk="a", v=1), Row(sk="a", v=2), Row(sk="b", v=3)])
        out = dedup_by_key(df)
        assert out.count() == 2

    def test_deterministic_latest_wins(self, spark):
        df = spark.createDataFrame(
            [
                Row(sk="a", v=1, timestamp_kafka=dt.datetime(2024, 1, 1)),
                Row(sk="a", v=2, timestamp_kafka=dt.datetime(2024, 1, 2)),
            ]
        )
        out = dedup_by_key(df, ["sk"], order_by="timestamp_kafka").collect()
        assert len(out) == 1 and out[0].v == 2


class TestComposite:
    def test_work_to_trusted_chain(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        out = work_to_trusted_transform(
            orders, ["o_orderkey"], batch_ts="2024-01-01 00:00:00"
        )
        assert out.count() == orders.count()  # o_orderkey unique -> dedup no-op
        row = out.filter(F.col("o_orderkey") == out.first().o_orderkey).first()
        assert row.sk == _md5(str(row.o_orderkey))
        assert "timestamp_kafka" in out.columns


class TestFunctionsSurface:
    """`etl_complete_with_spark_spark.functions` is the public Column-level
    API (README's F-equivalent): every export importable, Column-typed,
    and usable in a real select."""

    def test_exports_are_column_level_and_run(self, spark):
        import inspect

        from pyspark.sql import Row
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark import functions as EF

        for n in EF.__all__:
            sig = str(inspect.signature(getattr(EF, n)))
            assert "Column" in sig and "DataFrame" not in sig, (n, sig)

        df = spark.createDataFrame([Row(id=1, name="ann", text="Hello World hello")])
        out = df.select(
            EF.surrogate_key_expr(["id", "name"]).alias("sk"),
            EF.tokens(EF.normalized_text(F.col("text"))).alias("tk"),
            EF.shingles(F.col("text")).alias("sh"),
        ).first()
        assert len(out.sk) == 32  # md5 hex
        assert out.tk == ["hello", "world", "hello"]
        assert out.sh
