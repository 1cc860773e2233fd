"""Interval (binned range) join: exact semantics + plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_complete_with_spark_spark import plans as P
from etl_complete_with_spark_spark.operators.range_join import interval_join
from etl_complete_with_spark_spark.queries import QUERIES


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _frames(spark, rows, wins):
    left = spark.createDataFrame(rows, "event_id long, ts timestamp")
    windows = spark.createDataFrame(wins, "window_id long, ws timestamp, we timestamp")
    return left, windows


class TestIntervalJoin:
    def test_halfopen_boundaries(self, spark):
        left, windows = _frames(
            spark,
            [(1, _ts(10)), (2, _ts(11)), (3, _ts(12))],  # start, inside, end
            [(100, _ts(10), _ts(12))],
        )
        out = interval_join(left, windows, "ts", "ws", "we")
        assert sorted(r.event_id for r in out.collect()) == [1, 2]  # ts==end excluded

    def test_window_spanning_many_bins_no_duplicates(self, spark):
        # bin width 1h << 6h window: window explodes to 7 bins, each row
        # still matches exactly once
        left, windows = _frames(
            spark,
            [(i, _ts(9 + i)) for i in range(6)],
            [(100, _ts(9, 30), _ts(15, 30))],
        )
        out = interval_join(left, windows, "ts", "ws", "we", bin_width_seconds=3600)
        # row 0 (09:00) precedes the window start; 1..5 (10:00..14:00) are inside
        assert sorted(r.event_id for r in out.collect()) == [1, 2, 3, 4, 5]

    def test_degenerate_and_overlapping_windows(self, spark):
        left, windows = _frames(
            spark,
            [(1, _ts(10, 30))],
            [(100, _ts(10), _ts(11)), (200, _ts(10, 15), _ts(10, 45)), (300, _ts(10), _ts(10))],
        )
        out = interval_join(left, windows, "ts", "ws", "we")
        assert sorted(r.window_id for r in out.collect()) == [100, 200]  # empty window drops

    def test_plan_is_equi_join_not_nested_loop(self, spark, sf_dir):
        plan = P.physical_plan(QUERIES["range_join_event_windows"](spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_matches_naive_inequality_join(self, spark, sf_dir):
        from etl_complete_with_spark_spark.queries import load

        ev = load(spark, sf_dir, "events").limit(500)
        windows = ev.filter(F.col("event_id") % 50 == 0).select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("ws"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("we"),
        )
        fast = interval_join(ev, windows, "ts", "ws", "we")
        naive = ev.join(
            windows, (F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we"))
        )
        key = lambda r: (r.event_id, r.window_id)  # noqa: E731
        assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))
