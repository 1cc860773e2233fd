"""Round-4 operators: triangle counting, containment dedup, kNN voting,
mergeable bottom-k quantile sketches."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.dedup import containment_pairs
from etl_complete_with_spark_spark.operators.graph import triangle_count
from etl_complete_with_spark_spark.operators.quantiles import (
    bottomk_precut,
    merge_bottomk_hash,
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
        re-cut to k after union, give EXACTLY the global bottom-k (the k
        smallest distinct rank hashes, each with its min value)."""
        rows = [(i, f"d{i % 7}", float(i % 101)) for i in range(2000)]
        df = spark.createDataFrame(rows, "event_id long, day string, value double")
        k = 64
        daily = bottomk_precut(df, ["day"], "value", k=k, id_col="event_id")
        merged = merge_bottomk_hash(daily.drop("day"), [], k=k)
        direct = (
            with_rank_hash(df, "event_id")
            .groupBy("rank_hash")
            .agg(F.min("value").alias("value"))
            .orderBy("rank_hash")
            .limit(k)
        )
        got = sorted((r.rank_hash, r.value) for r in merged.collect())
        want = sorted((r.rank_hash, r.value) for r in direct.collect())
        assert got == want and len(got) == k

    def test_sample_is_deterministic_and_groups_bounded(self, spark):
        rows = [(i, "a" if i % 2 else "b", float(i)) for i in range(500)]
        df = spark.createDataFrame(rows, "event_id long, grp string, value double")

        def sketch(d):
            return merge_bottomk_hash(
                bottomk_precut(d, ["grp"], "value", k=10, id_col="event_id"),
                ["grp"],
                k=10,
            )

        s1, s2 = sketch(df), sketch(df.repartition(13))
        assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
        per = s1.groupBy("grp").count().collect()
        assert all(r["count"] == 10 for r in per)


class TestKmeansInt:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_separated_clusters_recovered(self, spark):
        from etl_complete_with_spark_spark.operators.kmeans import kmeans_int

        # two tight blobs far apart; k=2, init = points 0 and 1 (one in
        # each blob by construction)
        blob_a = [(0, [0.0, 0.0]), (2, [0.01, 0.0]), (4, [0.0, 0.02])]
        blob_b = [(1, [5.0, 5.0]), (3, [5.01, 5.0]), (5, [5.0, 5.02])]
        out = kmeans_int(self._df(spark, blob_a + blob_b), k=2, rounds=2, dim=2)
        got = {r.id: r.cluster_id for r in out.collect()}
        assert got[0] == got[2] == got[4] == 0
        assert got[1] == got[3] == got[5] == 1

    def test_partitioning_invariant(self, spark):
        from etl_complete_with_spark_spark.operators.kmeans import kmeans_int

        import random

        rng = random.Random(5)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)
        ]
        a = kmeans_int(self._df(spark, rows), k=4, rounds=3, dim=8)
        b = kmeans_int(
            self._df(spark, rows).repartition(17), k=4, rounds=3, dim=8
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_empty_cluster_keeps_centroid(self, spark):
        from etl_complete_with_spark_spark.operators.kmeans import (
            update_centroids,
            assign_clusters,
            quantize_vectors,
        )

        # centroid 1 sits far from every point -> loses all members
        df = quantize_vectors(
            self._df(spark, [(0, [0.0, 0.0]), (1, [0.1, 0.1])]),
            "vec_id",
            "embedding",
            10_000,
        )
        cents = [[0, 0], [9_999_999, 9_999_999]]
        assigned = assign_clusters(df, cents)
        new = update_centroids(assigned, cents, 2)
        assert new[1] == [9_999_999, 9_999_999]
        assert new[0] == [500, 500]  # trunc mean of (0,0) and (1000,1000)

    def test_negative_sum_truncates_toward_zero(self, spark):
        from etl_complete_with_spark_spark.operators.kmeans import (
            update_centroids,
            assign_clusters,
            quantize_vectors,
        )

        df = quantize_vectors(
            self._df(spark, [(0, [-0.0001, 0.0]), (1, [-0.0002, 0.0])]),
            "vec_id",
            "embedding",
            10_000,
        )
        # sums = -3, n = 2 -> trunc(-1.5) = -1 (not floor's -2)
        new = update_centroids(assign_clusters(df, [[0, 0]]), [[0, 0]], 2)
        assert new[0][0] == -1


class TestStreamQuantileSketch:
    def test_stream_merge_equals_batch_sketch(self, spark, tmp_path):
        """Mergeability under streaming: per-batch sketches over disjoint
        halves merge to EXACTLY the single-pass batch sketch."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from etl_complete_with_spark_spark.operators.quantiles import (
            bottomk_precut,
            merge_bottomk_hash,
        )
        from etl_complete_with_spark_spark.streaming.ingest import (
            quantile_sketch_stream,
        )

        rows = [
            (i, 1_700_000_000_000_000_000 + i * 10**9, i % 50, "t", float(i % 37), "{}")
            for i in range(1000)
        ]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        )
        stage = tmp_path / "in"
        stage.mkdir()
        pq.write_table(tbl.slice(0, 400), str(stage / "a.parquet"))
        pq.write_table(tbl.slice(400), str(stage / "b.parquet"))
        out = tmp_path / "sk"
        q = quantile_sketch_stream(
            spark,
            str(stage),
            sketch_dir=str(out),
            checkpoint_dir=str(tmp_path / "ckpt"),
            k=32,
            max_files_per_trigger=1,
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        streamed = merge_bottomk_hash(
            spark.read.parquet(str(out)).drop("epoch"),
            ["event_type"],
            k=32,
        )
        batch = merge_bottomk_hash(
            bottomk_precut(
                spark.createDataFrame(
                    [(r[0], r[3], r[4]) for r in rows],
                    "event_id long, event_type string, value double",
                ),
                ["event_type"],
                "value",
                k=32,
                id_col="event_id",
            ),
            ["event_type"],
            k=32,
        )
        got = sorted((r.rank_hash, r.value) for r in streamed.collect())
        want = sorted((r.rank_hash, r.value) for r in batch.collect())
        assert got == want and len(got) == 32


class TestKcorePeel:
    def test_fringe_peeled_core_survives(self, spark):
        from etl_complete_with_spark_spark.operators.graph import kcore_peel

        import itertools

        # K5 core (every degree 4) + a path of pendants hanging off it
        core = list(itertools.combinations(range(5), 2))
        fringe = [(4, 10), (10, 11), (11, 12)]
        df = spark.createDataFrame(core + fringe, "src long, dst long")
        out = {r.node: r.deg for r in kcore_peel(df, k=3, rounds=3).collect()}
        assert set(out) == {0, 1, 2, 3, 4}
        assert all(d == 4 for d in out.values())

    def test_cascading_peel_needs_rounds(self, spark):
        from etl_complete_with_spark_spark.operators.graph import kcore_peel

        # chain 0-1-2-3-4: 2-core peels the chain endpoints round by
        # round; after enough rounds nothing survives
        chain = [(i, i + 1) for i in range(4)]
        df = spark.createDataFrame(chain, "src long, dst long")
        assert kcore_peel(df, k=2, rounds=1).count() == 3  # endpoints gone
        assert kcore_peel(df, k=2, rounds=3).count() == 0  # fully peeled

    def test_cycle_is_its_own_2core(self, spark):
        from etl_complete_with_spark_spark.operators.graph import kcore_peel

        cyc = [(i, (i + 1) % 6) for i in range(6)]
        out = kcore_peel(
            spark.createDataFrame(cyc, "src long, dst long"), k=2, rounds=4
        )
        assert out.count() == 6


class TestBfsLevels:
    def _run(self, spark, edges, sources, rounds):
        from etl_complete_with_spark_spark.operators.graph import bfs_levels

        e = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in sources], "node long")
        return {r.node: r.dist for r in bfs_levels(e, s, rounds).collect()}

    def test_path_graph_levels(self, spark):
        chain = [(i, i + 1) for i in range(6)]
        got = self._run(spark, chain, [0], rounds=3)
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # beyond 3 hops: absent

    def test_multi_source_min(self, spark):
        chain = [(i, i + 1) for i in range(6)]
        got = self._run(spark, chain, [0, 6], rounds=2)
        # distances from the NEAREST source; symmetric edges
        assert got == {0: 0, 1: 1, 2: 2, 6: 0, 5: 1, 4: 2}

    def test_cycle_and_unreachable(self, spark):
        edges = [(0, 1), (1, 2), (2, 0), (10, 11)]
        got = self._run(spark, edges, [0], rounds=4)
        assert got == {0: 0, 1: 1, 2: 1}
        assert 10 not in got and 11 not in got


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        from etl_complete_with_spark_spark.operators.graph import label_propagation

        import itertools

        k1 = list(itertools.combinations([0, 1, 2, 3], 2))
        k2 = list(itertools.combinations([10, 11, 12, 13], 2))
        bridge = [(3, 10)]
        df = spark.createDataFrame(k1 + k2 + bridge, "src long, dst long")
        out = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
        # each clique converges on its minimum label
        assert {out[i] for i in [0, 1, 2]} == {0}
        assert {out[i] for i in [11, 12, 13]} == {10}

    def test_deterministic_across_partitionings(self, spark):
        from etl_complete_with_spark_spark.operators.graph import label_propagation

        import random

        rng = random.Random(3)
        edges = list(
            {
                (min(a, b), max(a, b))
                for a, b in ((rng.randrange(40), rng.randrange(40)) for _ in range(120))
                if a != b
            }
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        a = sorted(map(tuple, label_propagation(df, rounds=3).collect()))
        b = sorted(
            map(tuple, label_propagation(df.repartition(11), rounds=3).collect())
        )
        assert a == b


class TestBottomKDuplicateTolerance:
    def test_merge_idempotent_under_replay(self, spark):
        """Merging a sketch with a REPLAYED copy of itself (at-least-once
        delivery) yields the identical bottom-k: duplicate hashes collapse
        in the merge's min-value dedup."""
        rows = [(i, float(i % 31)) for i in range(400)]
        df = spark.createDataFrame(rows, "event_id long, value double")
        pre = bottomk_precut(df, [], "value", k=16, id_col="event_id")
        base = merge_bottomk_hash(pre, [], k=16)
        merged = merge_bottomk_hash(pre.unionByName(pre), [], k=16)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, base.collect())
        )

    def test_overlapping_batches_do_not_bias_sample(self, spark):
        rows = [(i, float(i)) for i in range(300)]
        df = spark.createDataFrame(rows, "event_id long, value double")
        # two "batches" with an overlapping middle third
        b1 = bottomk_precut(df.filter("event_id < 200"), [], "value", 16, id_col="event_id")
        b2 = bottomk_precut(df.filter("event_id >= 100"), [], "value", 16, id_col="event_id")
        merged = merge_bottomk_hash(b1.unionByName(b2), [], k=16)
        direct = merge_bottomk_hash(
            bottomk_precut(df, [], "value", k=16, id_col="event_id"), [], k=16
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )


class TestBottomKDuplicateIdentities:
    def test_duplicate_identities_collapse_by_construction(self, spark):
        """Duplicate identity keys share a rank hash, so they occupy ONE
        sample slot (min value folded) — the sampled multiset is identical
        across partitionings and never biased by the duplicates."""
        rows = []
        for i in range(300):
            rows.append((f"id{i}", float(i % 40)))
            if i % 3 == 0:  # duplicate identity, same value
                rows.append((f"id{i}", float(i % 40)))
        df = spark.createDataFrame(rows, "rid string, value double")

        def sketch(d):
            return merge_bottomk_hash(
                bottomk_precut(d, [], "value", k=32, id_col="rid"), [], k=32
            )

        a, b = sketch(df), sketch(df.repartition(17))
        va = sorted(r.value for r in a.collect())
        vb = sorted(r.value for r in b.collect())
        assert va == vb and len(va) == 32


class TestHitsScores:
    def test_star_hub_dominates(self, spark):
        from etl_complete_with_spark_spark.operators.graph import hits_scores

        # customer 1 buys from every supplier; customers 2-4 from one each
        edges = [(1, 10), (1, 11), (1, 12), (2, 10), (3, 10), (4, 11)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {(r.role, r.node): r.score for r in hits_scores(df, iters=3).collect()}
        scale = 10**6
        # the all-suppliers customer is the max hub; supplier 10 (most
        # in-edges incl. the best hub) is the max authority
        assert out[("hub", 1)] == scale
        assert out[("auth", 10)] == scale
        assert out[("hub", 1)] > out[("hub", 2)]
        assert out[("auth", 10)] > out[("auth", 12)]

    def test_deterministic_across_partitionings(self, spark):
        from etl_complete_with_spark_spark.operators.graph import hits_scores

        import random

        rng = random.Random(11)
        edges = list(
            {(rng.randrange(20), 100 + rng.randrange(10)) for _ in range(60)}
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        a = sorted(map(tuple, hits_scores(df, iters=3).collect()))
        b = sorted(map(tuple, hits_scores(df.repartition(13), iters=3).collect()))
        assert a == b

    def test_iters_must_be_positive(self, spark):
        import pytest

        from etl_complete_with_spark_spark.operators.graph import hits_scores

        df = spark.createDataFrame([(1, 10)], "src long, dst long")
        with pytest.raises(ValueError, match="iters"):
            hits_scores(df, iters=0)
        with pytest.raises(ValueError, match="iters"):
            hits_scores(df, iters=-2)

    def test_overflow_headroom_rescales_with_warning(self, spark):
        """A hub whose degree breaks deg*scale^2 < 2^63 must trigger the
        rescale warning instead of silently wrapping int64: degree 3 at
        scale 2^31 gives 3*2^62 >= 2^63."""
        import warnings as w

        from etl_complete_with_spark_spark.operators.graph import hits_scores

        edges = [(1, 10), (1, 11), (1, 12), (2, 10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        with w.catch_warnings(record=True) as caught:
            w.simplefilter("always")
            out = {
                (r.role, r.node): r.score
                for r in hits_scores(df, iters=2, scale=2**31).collect()
            }
        msgs = [str(c.message) for c in caught if c.category is RuntimeWarning]
        assert any("overflow" in m and "rescaled" in m for m in msgs)
        # rescaled run still normalizes: scores bounded by the safe scale
        # (deg_max = 3: node 1's out-degree; in-degrees are all <= 2)
        import math

        safe = math.isqrt((2**63 - 1) // 3)
        assert out[("hub", 1)] == max(
            s for (role, _), s in out.items() if role == "hub"
        )
        assert all(0 <= s <= safe for s in out.values())
