"""Bucketed-table co-located join: the no-shuffle join strategy at scale.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides.
Writing both tables bucketed by the join key (`bucketBy`) pre-partitions
them on disk so the join needs no exchange at read time — this test pins
that property (SortMergeJoin with zero Exchange in the plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_complete_with_spark_spark import plans as P


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").option("path", str(warehouse / "orders_b"))
        .saveAsTable("orders_bucketed")
    )
    (
        lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", str(warehouse / "lineitem_b"))
        .saveAsTable("lineitem_bucketed")
    )
    yield "orders_bucketed", "lineitem_bucketed"
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


class TestBucketedJoin:
    def test_join_has_no_shuffle(self, spark, bucketed_tables):
        o, l = bucketed_tables
        joined = (
            spark.table(o)
            .join(spark.table(l), F.col("o_orderkey") == F.col("l_orderkey"))
            .hint("merge")  # pin SMJ so AQE doesn't broadcast the small SF side
        )
        assert P.count_exchanges(joined) == 0, P.physical_plan(joined)[:800]

    def test_bucketed_results_match_plain_join(self, spark, sf_dir, bucketed_tables):
        o, l = bucketed_tables
        bucketed_n = (
            spark.table(o).join(spark.table(l), F.col("o_orderkey") == F.col("l_orderkey")).count()
        )
        plain_n = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert bucketed_n == plain_n

    def test_groupby_on_bucket_key_has_no_shuffle(self, spark, bucketed_tables):
        o, _ = bucketed_tables
        agg = spark.table(o).groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
        assert P.count_exchanges(agg) == 0
