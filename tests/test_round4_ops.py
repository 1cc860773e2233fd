"""Round-4 operators: triangle counting, containment dedup, kNN voting,
mergeable bottom-k quantile sketches."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.dedup import containment_pairs
from etl_complete_with_spark_spark.operators.graph import triangle_count
from etl_complete_with_spark_spark.operators.quantiles import (
    bottomk_sample,
    merge_bottomk,
    with_rank_hash,
)
from etl_complete_with_spark_spark.operators.similarity import knn_classify


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


class TestTriangleCount:
    def test_known_graphs(self, spark):
        # K4: 4 triangles; plus a pendant edge (no new triangles) and a
        # disconnected triangle: 5 total.
        k4 = list(itertools.combinations(range(4), 2))
        extra = [(3, 10), (20, 21), (21, 22), (20, 22)]
        row = triangle_count(_edges(spark, k4 + extra)).collect()[0]
        assert (row.n_nodes, row.n_edges, row.n_triangles) == (8, 10, 5)

    def test_direction_duplicates_selfloops_collapse(self, spark):
        tri = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
        row = triangle_count(_edges(spark, tri)).collect()[0]
        assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)

    def test_triangle_free(self, spark):
        # star graph: hub with 5 leaves — wedge-rich, triangle-free
        row = triangle_count(_edges(spark, [(0, i) for i in range(1, 6)])).collect()[0]
        assert (row.n_edges, row.n_triangles) == (5, 0)

    def test_matches_bruteforce_on_random_graph(self, spark):
        import random

        rng = random.Random(13)
        edges = {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(30), rng.randrange(30)) for _ in range(150)
            )
            if a != b
        }
        adj = set(edges)
        expected = sum(
            1
            for x, y, z in itertools.combinations(range(30), 3)
            if (x, y) in adj and (y, z) in adj and (x, z) in adj
        )
        row = triangle_count(_edges(spark, sorted(edges))).collect()[0]
        assert row.n_triangles == expected


class TestContainmentPairs:
    def test_subset_found_where_jaccard_fails(self, spark):
        short = "alpha beta gamma delta epsilon zeta"
        long = short + " " + " ".join(f"filler{i}" for i in range(40))
        df = spark.createDataFrame(
            [(1, short), (2, long), (3, "totally different words here now")],
            "doc_id long, text string",
        )
        rows = containment_pairs(df, threshold=0.8).collect()
        assert [(r.id1, r.id2) for r in rows] == [(1, 2)]
        # every trigram of the short doc appears in the long one
        assert rows[0].containment == 1.0
        # sanity: symmetric Jaccard on the same pair is far below 0.8
        from etl_complete_with_spark_spark.operators.dedup import ngram_jaccard_pairs

        jac = ngram_jaccard_pairs(df, threshold=0.0).collect()
        j = {(r.id1, r.id2): r.jaccard for r in jac}[(1, 2)]
        assert j < 0.2

    def test_threshold_filters(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d x y")],
            "doc_id long, text string",
        )
        # 4 trigrams each, 2 common -> containment 0.5
        assert containment_pairs(df, threshold=0.6).count() == 0
        got = containment_pairs(df, threshold=0.5).collect()
        assert len(got) == 1 and got[0].containment == 0.5


class TestKnnClassify:
    def test_majority_and_tiebreak(self, spark):
        # queries at the origin-ish corner; corpus engineered so labels
        # split 2/2 among the top-4 and rank-5 decides... instead keep it
        # simple: 3 of label 7 closest, 2 of label 9.
        def vec(x, y):
            return [float(x), float(y)] + [0.0] * 6

        corpus = spark.createDataFrame(
            [
                (100, vec(1.0, 0.00), 7),
                (101, vec(1.0, 0.01), 7),
                (102, vec(1.0, 0.02), 7),
                (103, vec(0.0, 1.0), 9),
                (104, vec(0.1, 1.0), 9),
                (105, vec(-1.0, 5.0), 3),
            ],
            "vec_id long, embedding array<double>, label int",
        )
        queries = spark.createDataFrame(
            [(0, vec(1.0, 0.005))], "vec_id long, embedding array<double>"
        )
        rows = knn_classify(corpus, queries, k=5).collect()
        assert len(rows) == 1
        assert (rows[0].query_id, rows[0].predicted_label, rows[0].votes) == (0, 7, 3)

    def test_vote_tie_breaks_on_best_rank(self, spark):
        def vec(x, y):
            return [float(x), float(y)]

        # 2 votes each; label 5 holds the single nearest neighbor.
        corpus = spark.createDataFrame(
            [
                (100, vec(1.0, 0.0), 5),
                (101, vec(0.9, 0.1), 8),
                (102, vec(0.8, 0.2), 5),
                (103, vec(0.7, 0.3), 8),
            ],
            "vec_id long, embedding array<double>, label int",
        )
        queries = spark.createDataFrame(
            [(0, vec(1.0, 0.0))], "vec_id long, embedding array<double>"
        )
        rows = knn_classify(corpus, queries, k=4).collect()
        assert rows[0].predicted_label == 5 and rows[0].votes == 2


class TestBottomKQuantiles:
    def test_merge_equals_global_bottomk(self, spark):
        """The defining mergeability property: per-day bottom-k sketches,
        re-cut to k after union, give EXACTLY the global bottom-k."""
        rows = [(i, f"d{i % 7}", float(i % 101)) for i in range(2000)]
        df = spark.createDataFrame(rows, "event_id long, day string, value double")
        k = 64
        daily = bottomk_sample(df, ["day"], "event_id", "value", k=k)
        merged = merge_bottomk(daily.drop("day"), [], "event_id", k=k)
        direct = (
            with_rank_hash(df, "event_id")
            .orderBy("rank_hash", "event_id")
            .limit(k)
            .select("event_id")
        )
        got = sorted(r.event_id for r in merged.collect())
        want = sorted(r.event_id for r in direct.collect())
        assert got == want and len(got) == k

    def test_sample_is_deterministic_and_groups_bounded(self, spark):
        rows = [(i, "a" if i % 2 else "b", float(i)) for i in range(500)]
        df = spark.createDataFrame(rows, "event_id long, grp string, value double")
        s1 = bottomk_sample(df, ["grp"], "event_id", "value", k=10)
        s2 = bottomk_sample(df.repartition(13), ["grp"], "event_id", "value", k=10)
        assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
        per = s1.groupBy("grp").count().collect()
        assert all(r["count"] == 10 for r in per)
