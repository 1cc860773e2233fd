"""Bucketed tables: co-located joins with NO shuffle on either side.

The 100 TB join strategy the catalog queries can't show at sf0.01: when
both sides are written bucketed (and sorted) by the join key with the
same bucket count, SortMergeJoin reads matching buckets directly — no
Exchange at all. This is THE way to amortize one shuffle across every
future join on that key (fact tables joined daily against the same
dimension key, incremental dedup against a bucketed signature corpus).
"""

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir, no_broadcast):
        from etl_complete_with_spark_spark import plans as P
        from etl_complete_with_spark_spark.queries import load

        suffix = uuid.uuid4().hex[:8]
        t_orders, t_cust = f"orders_b_{suffix}", f"customer_b_{suffix}"
        orders = load(spark, sf_dir, "orders")
        cust = load(spark, sf_dir, "customer")
        try:
            (
                orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
                .mode("overwrite").saveAsTable(t_orders)
            )
            (
                cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
                .mode("overwrite").saveAsTable(t_cust)
            )
            bo, bc = spark.table(t_orders), spark.table(t_cust)
            joined = bo.join(bc, bo.o_custkey == bc.c_custkey).select(
                "o_orderkey", "c_name"
            )
            plan = P.formatted_plan(joined)
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan

            # same rows as the plain (shuffling) join
            expected = orders.join(
                cust, orders.o_custkey == cust.c_custkey
            ).count()
            assert joined.count() == expected

            # the un-bucketed twin DOES shuffle — the assertion above is
            # meaningful, not vacuous
            plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
            assert "Exchange" in P.formatted_plan(plain)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
            spark.sql(f"DROP TABLE IF EXISTS {t_cust}")

    def test_bucketed_groupby_has_no_exchange(self, spark, sf_dir, no_broadcast):
        from etl_complete_with_spark_spark import plans as P
        from etl_complete_with_spark_spark.queries import load

        suffix = uuid.uuid4().hex[:8]
        t = f"orders_g_{suffix}"
        try:
            (
                load(spark, sf_dir, "orders")
                .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
                .mode("overwrite").saveAsTable(t)
            )
            agg = (
                spark.table(t)
                .groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            plan = P.formatted_plan(agg)
            assert "Exchange" not in plan, plan
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
