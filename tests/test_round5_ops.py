"""Round-5 operators: the map-side bottom-k pre-cut path.

`bottomk_precut` + `merge_bottomk_hash` is the 100 TB variant of the
bottom-k quantile sketch (operators/quantiles.py): rank hash at the scan,
per-input-partition cut with ZERO shuffle, no row-identity payload past
the scan projection. These tests pin its contract:

- the merged result equals the direct global definition (k smallest
  DISTINCT rank hashes per group, min value per hash) no matter how the
  input is partitioned;
- duplicate identities (at-least-once replay) cannot bias the sample;
- hash collisions between distinct values resolve to min(value)
  deterministically in any partitioning;
- the pre-cut introduces no Exchange before the mapInPandas node.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.quantiles import (
    bottomk_precut,
    merge_bottomk_hash,
    with_rank_hash,
)


def _direct_global(spark_df, group_cols, k):
    """The semantic definition, computed the naive way: min value per
    (group, rank_hash), then the k smallest hashes per group."""
    from pyspark.sql import Window

    d = spark_df.groupBy(*group_cols, "rank_hash").agg(
        F.min("value").alias("value")
    )
    w = Window.partitionBy(*group_cols).orderBy("rank_hash")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .select(*group_cols, "value", "rank_hash")
    )


class TestBottomkPrecut:
    def test_matches_direct_global_across_partitionings(self, spark):
        rows = [(i, f"g{i % 3}", float((i * 7) % 101)) for i in range(500)]
        df = spark.createDataFrame(rows, "rid long, grp string, value double")
        want = sorted(
            map(
                tuple,
                _direct_global(
                    with_rank_hash(df, "rid").select("grp", "value", "rank_hash"),
                    ["grp"],
                    32,
                ).collect(),
            )
        )
        for parts in (1, 7, 64):
            pre = bottomk_precut(
                df.repartition(parts), ["grp"], "value", k=32, id_col="rid"
            )
            got = sorted(
                map(tuple, merge_bottomk_hash(pre, ["grp"], k=32).collect())
            )
            assert got == want, f"mismatch at {parts} partitions"
        assert len(want) == 3 * 32

    def test_replayed_rows_do_not_bias_sample(self, spark):
        """At-least-once delivery: the union of a batch with a replayed
        copy of half of it samples identically to the clean batch."""
        rows = [(i, float(i % 13)) for i in range(300)]
        clean = spark.createDataFrame(rows, "rid long, value double")
        replayed = clean.unionAll(clean.filter("rid % 2 = 0"))
        a = sorted(
            map(
                tuple,
                merge_bottomk_hash(
                    bottomk_precut(clean, [], "value", k=16, id_col="rid"),
                    [],
                    k=16,
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                merge_bottomk_hash(
                    bottomk_precut(replayed, [], "value", k=16, id_col="rid"),
                    [],
                    k=16,
                ).collect(),
            )
        )
        assert a == b and len(a) == 16

    def test_hash_collision_resolves_to_min_value(self, spark):
        """Distinct rows colliding on rank_hash (synthesized via an
        explicit rank_hash column, id_col=None) keep min(value) — the
        deterministic choice — regardless of partitioning."""
        rows = [
            ("g", 5.0, 100),
            ("g", 3.0, 100),  # collision with the 5.0 row
            ("g", 9.0, 200),
            ("g", 1.0, 300),
            ("g", 7.0, 50),
        ]
        df = spark.createDataFrame(rows, "grp string, value double, rank_hash long")
        for parts in (1, 4):
            got = sorted(
                map(
                    tuple,
                    merge_bottomk_hash(
                        bottomk_precut(
                            df.repartition(parts), ["grp"], "value", k=3
                        ),
                        ["grp"],
                        k=3,
                    ).collect(),
                )
            )
            # k=3 smallest hashes are 50, 100, 200; hash 100 keeps
            # min(5.0, 3.0) = 3.0 (tuples sorted by value here)
            assert got == [("g", 3.0, 100), ("g", 7.0, 50), ("g", 9.0, 200)]

    def test_disjoint_precuts_merge_to_global(self, spark):
        """Mergeability: pre-cuts built over disjoint slices (different
        ingest units) merge to exactly the one-pass sketch."""
        rows = [(i, float((i * 31) % 500)) for i in range(400)]
        df = spark.createDataFrame(rows, "rid long, value double")
        s1 = bottomk_precut(df.filter("rid < 150"), [], "value", k=24, id_col="rid")
        s2 = bottomk_precut(df.filter("rid >= 150"), [], "value", k=24, id_col="rid")
        merged = merge_bottomk_hash(s1.unionByName(s2), [], k=24)
        direct = merge_bottomk_hash(
            bottomk_precut(df, [], "value", k=24, id_col="rid"), [], k=24
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_small_groups_keep_everything(self, spark):
        rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]
        df = spark.createDataFrame(rows, "rid long, grp string, value double")
        got = merge_bottomk_hash(
            bottomk_precut(df, ["grp"], "value", k=10, id_col="rid"),
            ["grp"],
            k=10,
        ).collect()
        assert sorted((r.grp, r.value) for r in got) == [
            ("a", 1.0),
            ("a", 2.0),
            ("b", 3.0),
        ]

    def test_precut_plan_has_no_exchange(self, spark, tmp_path):
        """The scale contract itself: everything up to and including the
        pre-cut runs inside the scan partitions — no Exchange node below
        the mapInPandas."""
        df = spark.createDataFrame(
            [(i, f"g{i % 2}", float(i)) for i in range(100)],
            "rid long, grp string, value double",
        )
        path = str(tmp_path / "t.parquet")
        df.write.parquet(path)
        pre = bottomk_precut(
            spark.read.parquet(path), ["grp"], "value", k=8, id_col="rid"
        )
        plan = pre._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "MapInPandas" in plan
        # and the merged result still flows (sanity)
        assert merge_bottomk_hash(pre, ["grp"], k=8).count() == 16

    def test_precut_output_is_bounded_per_partition(self, spark):
        """Each input partition contributes at most k rows per group."""
        df = spark.createDataFrame(
            [(i, float(i % 11)) for i in range(1000)], "rid long, value double"
        ).repartition(5)
        pre = bottomk_precut(df, [], "value", k=8, id_col="rid")
        per_part = (
            pre.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        assert all(r["count"] <= 8 for r in per_part)
        assert sum(r["count"] for r in per_part) <= 5 * 8
