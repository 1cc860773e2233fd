"""A/B: plain vs bucketed-layout lineitem-orders join at a given SF.

The catalog's one real big-join shuffle (SCALING.md r14: broadcast at
sf0.1, a 104 MB exchange + sort at sf1.0 — 34.9x CPU at 10x data) is
the axis `operators/layout.write_bucketed` exists for. This script
measures what the docstrings promise (r15, VERDICT r14 order 2):

1. one-time layout cost — bucketed+sorted write of lineitem and orders
   on the orderkey (the pay-once shuffle the layout amortizes);
2. the join_revenue_by_nation shape from plain parquet vs from the
   bucketed tables, INTERLEAVED reps (plain, bucketed, plain, ...) so
   box drift hits both arms alike, executorCpuTime + shuffle-write MB
   per run via the quiesced UI-totals ruler.

The bucketed arm replicates the catalog query's join graph with the
dims explicitly broadcast (at sf1.0 AQE would broadcast them anyway;
the hint removes strategy variance from the A/B) and the fact tables
read from the bucketed layout — the orderkey exchange must read 0 MB.

Usage::

    python scripts/ab_bucketed_join.py [sf_dir] [buckets] [reps]

Defaults: tmp_scale_fixture/sf1.0, 32 buckets, 3 reps. Prints one JSON
line per measurement; tables are dropped afterwards.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _UI_CONF, _box_canary_mem, _quiesced_totals
    from etl_complete_with_spark_spark.operators.layout import write_bucketed
    from etl_complete_with_spark_spark.queries import (
        QUERIES,
        load,
        rev_e4,
        sum_money,
    )
    from etl_complete_with_spark_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "tmp_scale_fixture", "sf1.0"
    )
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark(app_name="ab-bucketed-join", extra_conf=_UI_CONF)
    t_li, t_o = "ab_lineitem_bk", "ab_orders_bk"

    def timed(fn) -> dict:
        before = _quiesced_totals(spark)
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        after = _quiesced_totals(spark)
        rec = {"wall_s": round(wall, 2)}
        if before is not None and after is not None:
            rec["cpu_s"] = round((after[4] - before[4]) / 1e9, 2)
            rec["shuffle_write_mb"] = round((after[1] - before[1]) / 1e6, 2)
        return rec

    def plain_arm() -> None:
        QUERIES["join_revenue_by_nation"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()

    def bucketed_arm() -> None:
        bo, bl = spark.table(t_o), spark.table(t_li)
        cust = load(spark, sf_dir, "customer")
        nat = load(spark, sf_dir, "nation")
        (
            bo.join(F.broadcast(cust), bo.o_custkey == cust.c_custkey)
            .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
            .join(bl, bl.l_orderkey == bo.o_orderkey)
            .groupBy("n_name")
            .agg(
                sum_money(rev_e4()).alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    try:
        print(json.dumps({"box_canary_mem_cpu_s": _box_canary_mem(spark)}))
        # one-time layout cost: THE shuffle being amortized
        layout = timed(
            lambda: (
                write_bucketed(
                    load(spark, sf_dir, "lineitem"), t_li, "l_orderkey", buckets
                ),
                write_bucketed(
                    load(spark, sf_dir, "orders"), t_o, "o_orderkey", buckets
                ),
            )
        )
        print(json.dumps({"layout_write": layout, "buckets": buckets}))

        # value parity before timing anything
        import pandas as pd

        a = QUERIES["join_revenue_by_nation"](spark, sf_dir).toPandas()
        spark.catalog.clearCache()
        b_fn_df = None
        bo, bl = spark.table(t_o), spark.table(t_li)
        cust = load(spark, sf_dir, "customer")
        nat = load(spark, sf_dir, "nation")
        b_fn_df = (
            bo.join(F.broadcast(cust), bo.o_custkey == cust.c_custkey)
            .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
            .join(bl, bl.l_orderkey == bo.o_orderkey)
            .groupBy("n_name")
            .agg(
                sum_money(rev_e4()).alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
        ).toPandas()
        a_s = a.sort_values("n_name").reset_index(drop=True)
        b_s = b_fn_df.sort_values("n_name").reset_index(drop=True)
        pd.testing.assert_frame_equal(a_s, b_s, check_like=True)
        print(json.dumps({"value_parity": True, "groups": len(a_s)}))

        for rep in range(reps):
            p = timed(plain_arm)
            b = timed(bucketed_arm)
            print(
                json.dumps(
                    {"rep": rep, "plain": p, "bucketed": b}
                )
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.stop()


if __name__ == "__main__":
    main()
