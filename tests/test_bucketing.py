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


class TestLineitemOrdersAxis:
    """r15 (VERDICT r14 order 2): the catalog's one real big-join
    shuffle is lineitem-orders on the orderkey — broadcast at sf0.1,
    a 104 MB exchange at sf1.0. The bucketed layout must make that
    exchange DISAPPEAR (the sort may remain; the exchange is the
    scale cost), and the revenue-rollup shape downstream must keep
    only the tiny post-aggregate exchange."""

    def test_bucketed_lineitem_orders_join_has_no_exchange(
        self, spark, sf_dir, no_broadcast
    ):
        from etl_complete_with_spark_spark import plans as P
        from etl_complete_with_spark_spark.operators.layout import write_bucketed
        from etl_complete_with_spark_spark.queries import load

        suffix = uuid.uuid4().hex[:8]
        t_li, t_o = f"lineitem_bk_{suffix}", f"orders_bk_{suffix}"
        li = load(spark, sf_dir, "lineitem")
        orders = load(spark, sf_dir, "orders")
        try:
            write_bucketed(li, t_li, "l_orderkey", 8)
            write_bucketed(orders, t_o, "o_orderkey", 8)
            bl, bo = spark.table(t_li), spark.table(t_o)
            joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
                "l_orderkey", "l_extendedprice", "o_orderdate"
            )
            plan = P.formatted_plan(joined)
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan

            # value parity with the plain-parquet twin, which DOES shuffle
            expected = li.join(
                orders, li.l_orderkey == orders.o_orderkey
            ).count()
            assert joined.count() == expected
            assert "Exchange" in P.formatted_plan(
                li.join(orders, li.l_orderkey == orders.o_orderkey)
            )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t_li}")
            spark.sql(f"DROP TABLE IF EXISTS {t_o}")

    def test_revenue_rollup_on_bucketed_tables_single_small_exchange(
        self, spark, sf_dir, no_broadcast
    ):
        """The join_revenue_by_nation shape over bucketed fact tables:
        the only Exchange left is the 25-group post-aggregate one —
        the fact-table exchange is gone. Dims stay explicit
        broadcasts (hints survive the no-broadcast conf)."""
        from etl_complete_with_spark_spark import plans as P
        from etl_complete_with_spark_spark.operators.layout import write_bucketed
        from etl_complete_with_spark_spark.queries import load, rev_e4, sum_money

        suffix = uuid.uuid4().hex[:8]
        t_li, t_o = f"lineitem_bkr_{suffix}", f"orders_bkr_{suffix}"
        try:
            write_bucketed(
                load(spark, sf_dir, "lineitem"), t_li, "l_orderkey", 8
            )
            write_bucketed(
                load(spark, sf_dir, "orders"), t_o, "o_orderkey", 8
            )
            bl, bo = spark.table(t_li), spark.table(t_o)
            cust = load(spark, sf_dir, "customer")
            nat = load(spark, sf_dir, "nation")
            q = (
                bo.join(F.broadcast(cust), bo.o_custkey == cust.c_custkey)
                .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
                .join(bl, bl.l_orderkey == bo.o_orderkey)
                .groupBy("n_name")
                .agg(sum_money(rev_e4()).alias("revenue"))
            )
            plan = P.formatted_plan(q)
            # exactly one SHUFFLE Exchange: the post-aggregate shuffle
            # of <=25 nation groups; the orderkey join contributes none
            # (BroadcastExchange nodes are the explicit dim broadcasts,
            # not shuffles — match tree lines, excluding them)
            import re

            tree = plan.split("(1) ")[0]
            shuffles = [
                ln
                for ln in tree.splitlines()
                if re.search(r"\bExchange \(\d+\)", ln)
                and "BroadcastExchange" not in ln
            ]
            assert len(shuffles) == 1, plan
            assert "SortMergeJoin" in plan
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t_li}")
            spark.sql(f"DROP TABLE IF EXISTS {t_o}")
