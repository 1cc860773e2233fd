"""applyInPandas grouped stage: twin-verification vs built-in aggregates."""

from __future__ import annotations

import datetime as dt

from etl_complete_with_spark_spark.operators.grouped import (
    grouped_robust_stats,
    robust_stats_expr,
)
from etl_complete_with_spark_spark.queries import load


def _rows(df):
    return sorted(
        (r.user_id, r.n, r.median_value, r.mad_value, r.trend) for r in df.collect()
    )


class TestGroupedRobustStats:
    def test_matches_builtin_expression_twin(self, spark, sf_dir):
        ev = load(spark, sf_dir, "events")
        assert _rows(grouped_robust_stats(ev)) == _rows(robust_stats_expr(ev))

    def test_single_event_group(self, spark):
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 10.0)], "user_id long, ts timestamp, value double"
        )
        (r,) = grouped_robust_stats(df).collect()
        assert (r.n, r.median_value, r.mad_value, r.trend) == (1, 10.0, 0.0, 0.0)

    def test_even_count_interpolates_median(self, spark):
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, h), v) for h, v in ((0, 1.0), (1, 2.0), (2, 4.0), (3, 8.0))],
            "user_id long, ts timestamp, value double",
        )
        (r,) = grouped_robust_stats(df).collect()
        assert r.median_value == 3.0  # (2+4)/2
        assert r.mad_value == 1.5  # |v-3| = [2,1,1,5] -> median 1.5
