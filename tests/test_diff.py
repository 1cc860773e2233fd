"""Snapshot reconciliation: table_diff classification semantics."""

from __future__ import annotations

from etl_complete_with_spark_spark.operators.diff import table_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "id long, a string, b double")


class TestTableDiff:
    def test_classifies_all_change_kinds(self, spark):
        old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
        new = _snap(spark, [(1, "x", 1.0), (2, "y", 99.0), (4, "w", 4.0)])
        got = {r.id: r.change_type for r in table_diff(old, new, "id").collect()}
        assert got == {2: "changed", 3: "removed", 4: "added"}

    def test_include_unchanged_and_null_safety(self, spark):
        old = _snap(spark, [(1, None, 1.0)])
        new = _snap(spark, [(1, None, 1.0)])
        got = table_diff(old, new, "id", include_unchanged=True).collect()
        assert [(r.id, r.change_type) for r in got] == [(1, "unchanged")]

    def test_compare_subset_of_columns(self, spark):
        old = _snap(spark, [(1, "x", 1.0)])
        new = _snap(spark, [(1, "x", 42.0)])
        assert table_diff(old, new, "id", compare=["a"]).count() == 0
        assert table_diff(old, new, "id", compare=["b"]).count() == 1
