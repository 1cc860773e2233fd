"""SCD Type 2 merge: versioning, change detection, snapshots, idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.scd2 import (
    scd2_apply,
    scd2_init,
    scd2_snapshot,
)

T1, T2, T3 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, city string")


class TestScd2:
    def test_apply_versions_only_changed_keys(self, spark):
        dim = scd2_init(_batch(spark, [(1, "paris"), (2, "rome")]), T1)
        dim2 = scd2_apply(
            dim, _batch(spark, [(1, "lyon"), (2, "rome"), (3, "oslo")]), "id", ["city"], T2
        )
        rows = {(r.id, r.city): r for r in dim2.collect()}
        assert len(rows) == 4
        assert rows[(2, "rome")].is_current  # unchanged: NOT re-versioned
        assert str(rows[(2, "rome")].valid_from).startswith("2024-01-01")
        closed = rows[(1, "paris")]
        assert not closed.is_current and str(closed.valid_to).startswith("2024-02-01")
        assert rows[(1, "lyon")].is_current and rows[(3, "oslo")].is_current

    def test_idempotent_reapply(self, spark):
        dim = scd2_init(_batch(spark, [(1, "paris")]), T1)
        dim2 = scd2_apply(dim, _batch(spark, [(1, "lyon")]), "id", ["city"], T2)
        dim3 = scd2_apply(dim2, _batch(spark, [(1, "lyon")]), "id", ["city"], T3)
        a = sorted(map(tuple, dim2.collect()))
        b = sorted(map(tuple, dim3.collect()))
        assert a == b  # same batch twice -> no new versions

    def test_snapshot_time_travel(self, spark):
        dim = scd2_init(_batch(spark, [(1, "paris")]), T1)
        dim = scd2_apply(dim, _batch(spark, [(1, "lyon")]), "id", ["city"], T2)
        dim = scd2_apply(dim, _batch(spark, [(1, "oslo")]), "id", ["city"], T3)
        assert [r.city for r in scd2_snapshot(dim, "2024-01-15 00:00:00").collect()] == ["paris"]
        assert [r.city for r in scd2_snapshot(dim, "2024-02-15 00:00:00").collect()] == ["lyon"]
        assert [r.city for r in scd2_snapshot(dim, T3).collect()] == ["oslo"]
        assert dim.count() == 3  # full lineage retained

    def test_history_rows_never_rewritten(self, spark):
        dim = scd2_init(_batch(spark, [(1, "paris")]), T1)
        dim = scd2_apply(dim, _batch(spark, [(1, "lyon")]), "id", ["city"], T2)
        before = {tuple(r) for r in dim.filter(~F.col("is_current")).collect()}
        dim = scd2_apply(dim, _batch(spark, [(1, "oslo")]), "id", ["city"], T3)
        after_history = {tuple(r) for r in dim.filter(~F.col("is_current")).collect()}
        assert before <= after_history

    def test_column_mismatch_rejected(self, spark):
        import pytest

        dim = scd2_init(_batch(spark, [(1, "paris")]), T1)
        bad = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError):
            scd2_apply(dim, bad, "id", ["city"], T2)
