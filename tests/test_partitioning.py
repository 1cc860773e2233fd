"""Partitioned-table mechanics: pruning at the scan, surgical overwrites.

Hive-style partition directories are THE coarse pruning layer at 100 TB
(file/row-group stats only help after the partition set is fixed). These
tests pin the two behaviors everything else assumes: a partition filter
never touches other partitions' files, and dynamic partition overwrite
rewrites only the partitions present in the incoming batch.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from etl_complete_with_spark_spark import plans as P
from etl_complete_with_spark_spark.queries import load


def _write_partitioned(spark, sf_dir, path):
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    return ev


class TestPartitionPruning:
    def test_filter_prunes_partitions_in_plan(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "ev_part")
        _write_partitioned(spark, sf_dir, path)
        df = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
        plan = P.physical_plan(df)
        assert "PartitionFilters" in plan and "2024-01-05" in plan
        # the partition column never reaches the data filters
        assert "PushedFilters: []" in plan or "PushedFilters" not in plan.split(
            "PartitionFilters"
        )[0]

    def test_pruned_read_matches_filtered_full_read(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "ev_part2")
        ev = _write_partitioned(spark, sf_dir, path)
        pruned = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
        full = ev.filter(F.col("day") == "2024-01-05")
        assert sorted(r.event_id for r in pruned.collect()) == sorted(
            r.event_id for r in full.collect()
        )


class TestDynamicPartitionOverwrite:
    def test_overwrite_touches_only_incoming_partitions(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "ev_dyn")
        ev = _write_partitioned(spark, sf_dir, path)
        before_total = spark.read.parquet(path).count()
        day5 = spark.read.parquet(path).filter(F.col("day") == "2024-01-05").count()
        assert day5 > 0

        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            patch = (
                ev.filter(F.col("day") == "2024-01-05")
                .limit(10)
                .withColumn("value", F.lit(0.0))
            )
            patch.write.partitionBy("day").mode("overwrite").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

        after = spark.read.parquet(path)
        # only day 5 replaced (10 rows); every other partition untouched
        assert after.filter(F.col("day") == "2024-01-05").count() == 10
        assert after.count() == before_total - day5 + 10
        # directory layout: one subdir per day, still present
        assert len(glob.glob(f"{path}/day=*")) >= 25
