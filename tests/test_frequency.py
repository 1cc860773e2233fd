"""Misra-Gries heavy hitters (operators/frequency)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.frequency import (
    heavy_hitters,
    misra_gries_partials,
)


def _stream(spark, keys, partitions=4):
    return spark.createDataFrame([(k,) for k in keys], "k string").repartition(partitions)


class TestMisraGries:
    def test_matches_exact_on_adversarial_stream(self, spark):
        """Long uniform tail + a few heads; far more distinct keys than
        counters, so evictions really happen."""
        rng = random.Random(7)
        keys = (
            ["head_a"] * 400 + ["head_b"] * 300 + ["head_c"] * 150
            + [f"tail_{rng.randrange(500)}" for _ in range(1150)]
        )
        rng.shuffle(keys)
        df = _stream(spark, keys, partitions=8)
        k = 9  # phi = 1/10 -> threshold 200 of 2000
        got = {(r.k, r.n) for r in heavy_hitters(df, "k", k).collect()}
        from collections import Counter

        exact = Counter(keys)
        want = {(key, c) for key, c in exact.items() if c * (k + 1) > len(keys)}
        assert got == want and want  # non-vacuous

    def test_partials_bounded_and_totals_sum(self, spark):
        keys = [f"k{i % 40}" for i in range(4000)]
        df = _stream(spark, keys, partitions=5)
        p = misra_gries_partials(df, "k", k=7).collect()
        by_pid_rows = [r for r in p if r.key is not None]
        totals = [r.n_rows for r in p if r.key is None]
        assert sum(totals) == 4000
        # <= k candidates per partition => <= 5*7 candidate rows overall
        assert len(by_pid_rows) <= 35

    def test_share_bp_and_threshold_strict(self, spark):
        # 10 x a, 10 x b -> with k=1 (phi=1/2) nothing exceeds HALF strictly
        df = _stream(spark, ["a"] * 10 + ["b"] * 10, partitions=2)
        assert heavy_hitters(df, "k", k=1).count() == 0
        # 11 a vs 9 b -> a alone
        df = _stream(spark, ["a"] * 11 + ["b"] * 9, partitions=2)
        rows = heavy_hitters(df, "k", k=1).collect()
        assert [(r.k, r.n, r.share_bp) for r in rows] == [("a", 11, 5500)]

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "k string")
        assert heavy_hitters(df, "k", k=3).count() == 0


class TestCountMin:
    def test_never_underestimates_and_exact_when_sparse(self, spark):
        from collections import Counter

        from etl_complete_with_spark_spark.operators.frequency import (
            countmin_estimates,
        )

        keys = ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"]
        exact = Counter(keys)
        df = _stream(spark, keys, partitions=3)
        est = {
            r.k: r.est
            for r in countmin_estimates(df, "k", ["a", "b", "c", "d", "zz"]).collect()
        }
        for key in "abcd":
            assert est[key] >= exact[key]
        # 4 distinct keys in 4x256 cells: collisions impossible to matter
        assert est == {"a": 50, "b": 30, "c": 5, "d": 1, "zz": 0}

    def test_merge_equals_single_partition(self, spark):
        """Cell-wise mergeability: estimates are partitioning-invariant."""
        import random

        from etl_complete_with_spark_spark.operators.frequency import (
            countmin_estimates,
        )

        rng = random.Random(5)
        keys = [f"k{rng.randrange(300)}" for _ in range(3000)]
        probes = [f"k{i}" for i in range(10)]
        e1 = {r.k: r.est for r in countmin_estimates(_stream(spark, keys, 1), "k", probes).collect()}
        e8 = {r.k: r.est for r in countmin_estimates(_stream(spark, keys, 8), "k", probes).collect()}
        assert e1 == e8

    def test_overestimate_bounded_under_collision_load(self, spark):
        import random
        from collections import Counter

        from etl_complete_with_spark_spark.operators.frequency import (
            countmin_estimates,
        )

        rng = random.Random(11)
        keys = [f"k{rng.randrange(2000)}" for _ in range(6000)]  # >> width
        exact = Counter(keys)
        probes = [f"k{i}" for i in range(20)]
        est = {r.k: r.est for r in countmin_estimates(_stream(spark, keys, 4), "k", probes).collect()}
        bound = 4 * 6000 // 256  # documented loose contract bound
        for p in probes:
            assert exact[p] <= est[p] <= exact[p] + bound
