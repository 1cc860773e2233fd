"""JDBC integration tests against embedded Apache Derby (in Spark's jars).

Upgrades S1-S3 (SURVEY §2.1) from option-construction unit tests to a
live-database exercise: probes push aggregates to the DB, read_slice
pushes the half-open P1 predicate, read_range fans slices out as one
parallel ``predicates=`` read, and the full ResyncPipeline lands a
Derby table into the WORK zone exactly as the reference's carga_int
lifecycle (resync_int/etls/carga_int.py:32-216) does against MySQL.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.lake import Lake
from etl_complete_with_spark_spark.pipeline import ResyncConfig, ResyncPipeline
from etl_complete_with_spark_spark.slicing import Interval
from etl_complete_with_spark_spark.sources.jdbc import (
    DERBY_DRIVER,
    JdbcSource,
    derby_url,
    seed_jdbc_table,
)

OPTS = {"driver": DERBY_DRIVER}
COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]


@pytest.fixture(scope="module")
def derby(spark, sf_dir, tmp_path_factory):
    """One seeded Derby database per module: 1,500 orders rows."""
    d = str(tmp_path_factory.mktemp("derby"))
    url = derby_url(d)
    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(*COLS)
        .filter(F.col("o_orderkey") < 10_000)
    )
    seed_jdbc_table(src, url, "ORDERS", options=OPTS)
    return url, src


class TestJdbcDerby:
    def test_probes_push_to_db(self, spark, derby):
        url, src = derby
        jd = JdbcSource(url, "ORDERS", "o_orderkey", options=OPTS)
        lo, hi = src.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
        assert jd.probe_min(spark) == lo
        assert jd.probe_max(spark) == hi

    def test_read_slice_halfopen(self, spark, derby):
        url, src = derby
        jd = JdbcSource(url, "ORDERS", "o_orderkey", options=OPTS)
        got = jd.read_slice(spark, Interval(100, 500))
        want = src.filter("o_orderkey >= 100 and o_orderkey < 500")
        assert got.count() == want.count()
        ks = [r[0] for r in got.select("O_ORDERKEY").collect()]
        assert min(ks) >= 100 and max(ks) < 500

    def test_read_range_parallel_parity(self, spark, derby):
        url, src = derby
        jd = JdbcSource(url, "ORDERS", "o_orderkey", options=OPTS)
        ivs = [Interval(0, 2500), Interval(2500, 5000), Interval(5000, 10_000)]
        got = jd.read_range(spark, ivs)
        # one Spark task per slice — the parallel replacement for the
        # reference's sequential chunk loop
        assert got.rdd.getNumPartitions() == len(ivs)
        assert got.count() == src.count()
        # values round-trip exactly (BIGINT/DOUBLE/VARCHAR/TIMESTAMP)
        g = {tuple(r) for r in got.toDF(*[c.lower() for c in got.columns]).collect()}
        w = {
            tuple(r)
            for r in src.withColumn(
                "o_orderdate", F.col("o_orderdate").cast("timestamp")
            ).collect()
        }
        assert g == w

    def test_date_partition_column_slice(self, spark, derby):
        url, src = derby
        jd = JdbcSource(url, "ORDERS", "o_orderdate", options=OPTS)
        got = jd.read_slice(
            spark, Interval("1996-01-01 00:00:00", "1997-01-01 00:00:00")
        )
        want = src.filter(
            "o_orderdate >= '1996-01-01' and o_orderdate < '1997-01-01'"
        )
        assert got.count() == want.count()

    def test_pipeline_resync_from_derby(self, spark, derby, tmp_path):
        """The reference's whole point: DB -> slices -> WORK zone."""
        url, src = derby
        jd = JdbcSource(url, "ORDERS", "o_orderkey", options=OPTS)
        lake = Lake(str(tmp_path / "lake"))
        cfg = ResyncConfig(
            namespace="sales",
            dataset="orders",
            partition_column="o_orderkey",
            mode="int",
            start=0,
            end=10_000,
            amount=4_000,  # <5000 tier -> 1000-wide chunks -> 10 slices
        )
        res = ResyncPipeline(jd, lake, cfg).run(spark, parallel=True)
        assert res.status == "success"
        landed = lake.read_work(spark, "sales", "orders")
        assert landed.count() == src.count()


class TestCliFromDerby:
    def test_cli_resync_jdbc_end_to_end(self, spark, derby, tmp_path, capsys):
        """The reference's user workflow, verbatim: one CLI invocation
        pulls a live JDBC table into WORK and merges into TRUSTED
        (carga_int.py's argument surface; Derby's driver is discovered
        via java.sql.DriverManager, no extra option needed)."""
        from etl_complete_with_spark_spark.cli.resync import main

        url, src = derby
        lake_root = str(tmp_path / "lake")
        rc = main(
            [
                "--source-kind", "jdbc", "--mode", "int",
                "--connection", url,
                "--namespace", "sales", "--dataset", "ORDERS",
                "--partition_column", "o_orderkey",
                "--start_process", "0", "--end_process", "10000",
                "--amount", "4000",
                "--lake-root", lake_root,
                "--merge-keys", "o_orderkey",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "slices loaded" in out
        lake = Lake(lake_root)
        assert lake.read_work(spark, "sales", "ORDERS").count() == src.count()
        trusted = lake.read_trusted(spark, "sales", "ORDERS")
        assert trusted.count() == src.count()
        assert "sk" in trusted.columns and "timestamp_kafka" in trusted.columns


class TestDateModePipeline:
    def test_pipeline_date_mode_from_derby(self, spark, derby, tmp_path):
        """carga_date's lifecycle live: date-typed partition column,
        driver-computed date intervals, parallel predicate read, WORK
        landing. Bounds passed as dates exercises the date-interval
        math + date literal pushdown against a real DB."""
        import datetime as dt

        url, src = derby
        jd = JdbcSource(url, "ORDERS", "o_orderdate", options=OPTS)
        lake = Lake(str(tmp_path / "lake"))
        lo, hi = src.agg(
            F.min("o_orderdate"), F.max("o_orderdate")
        ).first()
        cfg = ResyncConfig(
            namespace="sales",
            dataset="orders_by_date",
            partition_column="o_orderdate",
            mode="date",
            start=lo.date(),
            end=hi.date() + dt.timedelta(days=1),  # half-open cover
            amount=50_000,  # <5e5 tier -> 10-day chunks
        )
        res = ResyncPipeline(jd, lake, cfg).run(spark, parallel=True)
        assert res.status == "success"
        landed = lake.read_work(spark, "sales", "orders_by_date")
        assert landed.count() == src.count()
