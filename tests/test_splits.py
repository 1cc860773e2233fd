"""cluster_aware_split (operators/splits.py): the no-straddle guarantee
and bit-reproducibility the module docstring promises.

The split unit is the near-dup CLUSTER: if two documents are near-dups
(directly or transitively), they must land in the same train/val/test
split — otherwise the eval set leaks training data."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.splits import cluster_aware_split


def _docs(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id long")


def _pairs(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id1 long, id2 long"
    )


class TestClusterAwareSplit:
    def test_no_near_dup_pair_straddles_a_split(self, spark):
        """The defining property: for EVERY pair edge — including
        transitive chains A~B~C where A and C share no edge — both
        endpoints get the identical split."""
        rng = random.Random(7)
        n = 400
        # random chains + stars, plus singletons (no edge at all)
        edges = [(i, i + 1) for i in range(0, 200, 2)]  # 100 two-chains
        edges += [(200 + 3 * j, 200 + 3 * j + k) for j in range(30) for k in (1, 2)]
        edges += [(rng.randrange(300), rng.randrange(300)) for _ in range(50)]
        edges = [(a, b) for a, b in edges if a != b]
        out = cluster_aware_split(_docs(spark, range(n)), _pairs(spark, edges))
        split_of = {r.doc_id: (r.component, r.split) for r in out.collect()}
        assert len(split_of) == n  # singletons present, nothing dropped
        for a, b in edges:
            assert split_of[a] == split_of[b], (a, b)

    def test_transitive_chain_single_split(self, spark):
        # A~B, B~C, no A~C edge: all three must share one split
        out = cluster_aware_split(_docs(spark, [1, 2, 3, 9]), _pairs(spark, [(1, 2), (2, 3)]))
        rows = {r.doc_id: r for r in out.collect()}
        assert rows[1].split == rows[2].split == rows[3].split
        assert rows[1].component == rows[2].component == rows[3].component == 1
        assert rows[9].component == 9  # singleton: its own component

    def test_bit_reproducible_across_partitionings_and_algorithms(self, spark):
        """Identical assignment under repartition, row reorder, and the
        large-star/small-star component variant — no RNG, no
        order-dependence anywhere in the composition."""
        rng = random.Random(13)
        edges = list({(rng.randrange(120), rng.randrange(120)) for _ in range(90)})
        edges = [(a, b) for a, b in edges if a != b]
        docs, pairs = _docs(spark, range(120)), _pairs(spark, edges)
        base = sorted(map(tuple, cluster_aware_split(docs, pairs).collect()))
        repart = sorted(
            map(
                tuple,
                cluster_aware_split(
                    docs.repartition(13), _pairs(spark, list(reversed(edges))).repartition(7)
                ).collect(),
            )
        )
        star = sorted(
            map(tuple, cluster_aware_split(docs, pairs, use_star=True).collect())
        )
        assert base == repart == star

    def test_split_fractions_roughly_match(self, spark):
        """With only singletons (independent md5 buckets), the 90/5/5
        targets are hit within a loose tolerance — guards against an
        off-by-one in the bucket thresholds (e.g. <= vs <)."""
        out = cluster_aware_split(
            _docs(spark, range(3000)), _pairs(spark, [])
        )
        counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
        n = sum(counts.values())
        assert n == 3000
        assert 0.85 <= counts["train"] / n <= 0.95
        assert 0.02 <= counts.get("val", 0) / n <= 0.09
        assert 0.02 <= counts.get("test", 0) / n <= 0.09

    def test_custom_fractions(self, spark):
        out = cluster_aware_split(
            _docs(spark, range(2000)), _pairs(spark, []), train_pct=50, val_pct=25
        )
        counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
        n = sum(counts.values())
        assert 0.42 <= counts["train"] / n <= 0.58
        assert 0.18 <= counts["val"] / n <= 0.32
        assert 0.18 <= counts["test"] / n <= 0.32
