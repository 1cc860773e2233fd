"""Sources + schema registry tests (SURVEY §2.1, §1.3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql.types import (
    ArrayType, MapType, StringType, StructField, StructType, TimestampType,
)

from etl_complete_with_spark_spark.lake import Lake
from etl_complete_with_spark_spark.schema_registry import SchemaRegistry
from etl_complete_with_spark_spark.slicing import Interval, int_intervals
from etl_complete_with_spark_spark.sources import JdbcSource, MongoSource, ParquetSource


class TestParquetSource:
    def test_slice_halfopen_boundaries(self, spark, sf_dir):
        src = ParquetSource(f"{sf_dir}/orders.parquet", "o_orderkey")
        out = src.read_slice(spark, Interval(10, 20))
        keys = sorted(r.o_orderkey for r in out.select("o_orderkey").collect())
        assert keys and min(keys) >= 10 and max(keys) < 20

    def test_probe_bounds(self, spark, sf_dir):
        src = ParquetSource(f"{sf_dir}/events.parquet", "event_id")
        assert src.probe_min(spark) == 0
        assert src.probe_max(spark) >= 900

    def test_range_covers_all_slices(self, spark, sf_dir):
        src = ParquetSource(f"{sf_dir}/events.parquet", "event_id")
        ivs = int_intervals(0, 300, 100)
        whole = src.read_range(spark, ivs).count()
        per_slice = sum(src.read_slice(spark, iv).count() for iv in ivs)
        assert whole == per_slice

    def test_filter_pushed_to_scan(self, spark, sf_dir):
        src = ParquetSource(f"{sf_dir}/orders.parquet", "o_orderkey")
        plan = src.read_slice(spark, Interval(10, 20))._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "GreaterThanOrEqual(o_orderkey,10" in plan


class TestJdbcSource:
    def test_slice_options_build_pushdown_subquery(self):
        src = JdbcSource("jdbc:mysql://h/db", "orders", "o_orderdate", user="u", password="p")
        opts = src.describe_slice(Interval(dt.date(2024, 1, 1), dt.date(2024, 1, 16)))
        assert opts["dbtable"] == (
            "(select * from orders where o_orderdate >= '2024-01-01 00:00:00' "
            "AND o_orderdate < '2024-01-16 00:00:00') subs"
        )
        assert opts["user"] == "u" and opts["url"].startswith("jdbc:mysql")

    def test_range_options_one_predicate_per_slice(self):
        src = JdbcSource("jdbc:mysql://h/db", "events", "event_id")
        opts, preds = src.describe_range(int_intervals(0, 250, 100))
        assert opts["dbtable"] == "events"
        assert len(preds) == 3 and preds[0] == "event_id >= 0 AND event_id < 100"

    def test_probe_sql_pushes_aggregate(self):
        src = JdbcSource("jdbc:mysql://h/db", "orders", "o_orderdate")
        assert src.probe_sql("min") == (
            "(select min(o_orderdate) as agg_value from orders) subs"
        )


class TestMongoSource:
    def test_halfopen_vs_inclusive_condition(self, spark):
        df = spark.createDataFrame([Row(pc=i) for i in range(10)])
        half = MongoSource("mongodb://h", "db", "c", "pc")
        incl = MongoSource("mongodb://h", "db", "c", "pc", inclusive=True)
        assert df.filter(half.slice_condition(Interval(2, 5))).count() == 3
        assert df.filter(incl.slice_condition(Interval(2, 5))).count() == 4  # P2: BETWEEN

    def test_describe_options(self):
        src = MongoSource("mongodb://h/?rs=x", "shop", "orders", "updated_at")
        assert src.describe() == {
            "connection.uri": "mongodb://h/?rs=x",
            "database": "shop",
            "collection": "orders",
        }


NESTED = StructType(
    [
        StructField("_id", StringType()),
        StructField("updated_at", TimestampType()),
        StructField(
            "customer",
            StructType([StructField("name", StringType()), StructField("tier", StringType())]),
        ),
        StructField(
            "items",
            ArrayType(
                StructType([StructField("sku", StringType()), StructField("qty", StringType())])
            ),
        ),
        StructField("attrs", MapType(StringType(), StringType())),
    ]
)


class TestSchemaRegistry:
    def test_put_get_roundtrip_nested(self, tmp_path):
        reg = SchemaRegistry(str(tmp_path))
        reg.put("ns", "docs", NESTED)
        assert reg.get("ns", "docs") == NESTED

    def test_miss_returns_none(self, tmp_path):
        assert SchemaRegistry(str(tmp_path)).get("no", "pe") is None

    def test_resolve_falls_back_to_trusted_reflection(self, spark, tmp_path):
        lake = Lake(str(tmp_path / "lake"))
        df = spark.createDataFrame([Row(sk="a", v=1, timestamp_kafka=dt.datetime(2024, 1, 1))])
        lake.merge_trusted(spark, df, "ns", "ds")
        reg = SchemaRegistry(str(tmp_path / "registry"))
        schema = reg.resolve(spark, "ns", "ds", lake=lake)
        assert schema is not None and set(schema.fieldNames()) == {"sk", "v", "timestamp_kafka"}

    def test_resolve_none_when_nothing_exists(self, spark, tmp_path):
        reg = SchemaRegistry(str(tmp_path / "registry"))
        assert reg.resolve(spark, "ns", "ds", lake=Lake(str(tmp_path / "lake"))) is None


class TestFileSources:
    def _schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("amount", T.DoubleType()),
            ]
        )

    def test_jsonl_quarantines_bad_lines(self, spark, tmp_path):
        from etl_complete_with_spark_spark.sources.files import read_jsonl

        p = tmp_path / "in.jsonl"
        p.write_text(
            '{"id": 1, "name": "a", "amount": 1.5}\n'
            "this is not json at all\n"
            '{"id": 2, "name": "b", "amount": 2.5}\n'
            '{"id": "NOT_A_NUMBER", "name": "c", "amount": 3.0}\n'
        )
        good, quarantine = read_jsonl(spark, str(p), self._schema())
        assert sorted(r.id for r in good.collect()) == [1, 2]
        raws = [r.raw_record for r in quarantine.collect()]
        assert len(raws) == 2
        assert any("not json" in r for r in raws)
        assert any("NOT_A_NUMBER" in r for r in raws)
        # good rows carry exactly the declared schema — no corrupt column
        assert good.columns == ["id", "name", "amount"]

    def test_csv_quarantines_bad_lines(self, spark, tmp_path):
        from etl_complete_with_spark_spark.sources.files import read_csv

        p = tmp_path / "in.csv"
        p.write_text(
            "id,name,amount\n"
            "1,a,1.5\n"
            "oops,b,not_a_double\n"
            "2,c,2.5\n"
        )
        good, quarantine = read_csv(spark, str(p), self._schema())
        assert sorted(r.id for r in good.collect()) == [1, 2]
        assert quarantine.count() == 1
        assert "not_a_double" in quarantine.first().raw_record


class TestOrcSource:
    def test_orc_roundtrip_and_filter_pushdown(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from conftest import table

        src = table(spark, sf_dir, "orders")
        dst = str(tmp_path / "orders_orc")
        src.write.orc(dst)
        back = spark.read.orc(dst)
        assert back.schema == src.schema
        assert back.count() == src.count()
        # predicate + projection reach the ORC scan
        plan = (
            back.filter(F.col("o_orderkey") < 100)
            .select("o_orderkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]" in plan
        assert "ReadSchema: struct<o_orderkey:bigint>" in plan
