"""Adversarial-skew fixture (round-9 order 8): one key owns 50% of rows.

Runs the join / dedup / rank operator families against a pathologically
hot key and asserts BOTH value-correctness and the scale mechanism that
keeps the hot key from serializing into one straggler task:

- AQE skew-join split engages on a forced sort-merge join (plan-level:
  the final adaptive plan's SMJ is marked ``skew=true`` once the skewed
  partition crosses the thresholds — lowered here so test-sized data
  crosses them the way 100 TB data crosses the defaults);
- aggregation-family skew rides map-side partial aggregation (shuffle
  moves |groups|, not |rows| — the hot key contributes ONE partial row
  per map partition);
- the rank family's range partitioner spreads the hot key's ties across
  partitions (ranks stay an exact permutation);
- the salting operator's output is row-identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import functions as F


HOT = "hot-key"
N_ROWS = 100_000  # 50k on the hot key, 50k over 5k cold keys (odd ids)


def _skewed(spark):
    """(key, payload) with 50% of rows on one key — deterministic."""
    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 2 == 0, F.lit(HOT))
        .otherwise(F.concat(F.lit("cold-"), (F.col("id") % 10_000).cast("string")))
        .alias("key"),
        F.col("id").alias("payload"),
    )


class TestSkewJoinFamily:
    def test_aqe_skew_split_engages_on_forced_smj(self, spark):
        """Plan contract: with broadcast disabled (both sides 'large', the
        100 TB shape) the hot partition must be split by AQE's skew-join
        handling — the final plan's SortMergeJoin carries skew=true. The
        session enables skewJoin; only the size thresholds are scaled
        down so a ~KB test partition registers the way a ~GB partition
        would under the defaults.

        Two lessons this test encodes (found while building it):

        - the skew rule matches ``SMJ(Sort(ShuffleStage), ...)`` — a side
          AGGREGATED on the join key contributes its aggregate's
          exchange (same distribution, no dedicated join shuffle), the
          child becomes ``Sort(HashAggregate(Stage))``, and the rule
          does not fire. Pre-aggregated dims must broadcast instead.
        - skew is detected on COMPRESSED map-output bytes: a hot key
          whose payload compresses to nothing (repeated literals) can
          look balanced; the fixture's md5 payload is incompressible.
        """
        overrides = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.shuffle.partitions": "100",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "800",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "800",
            # This test pins the SORT-MERGE skew path specifically; the
            # session factory's r15 SMJ->SHJ conversion (64m threshold)
            # would otherwise rewrite these KB-sized stages into a
            # shuffled-hash join before the skew rule is consulted.
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
        }
        saved = {k: spark.conf.get(k, None) for k in overrides}
        try:
            for k, v in overrides.items():
                spark.conf.set(k, v)
            left = _skewed(spark).withColumn(
                "payload", F.md5(F.col("payload").cast("string"))
            )
            right = spark.range(10_001).select(
                F.when(F.col("id") == 10_000, F.lit(HOT))
                .otherwise(F.concat(F.lit("cold-"), F.col("id").cast("string")))
                .alias("key"),
                F.col("id").alias("tag"),
            )
            joined = left.join(right, "key")
            # collect() drives joined's OWN query execution, finalizing
            # the adaptive plan we assert on (count() would plan anew)
            rows = joined.collect()
            assert sum(1 for r in rows if r["key"] == HOT) == N_ROWS // 2
            plan = joined._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            assert "SortMergeJoin" in final, final
            assert "skew=true" in final, final
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    def test_salted_join_row_identical_under_hot_key(self, spark):
        from etl_complete_with_spark_spark.operators.skew import salted_join

        large = _skewed(spark)
        small = spark.createDataFrame(
            [(HOT, "h")] + [(f"cold-{i}", f"c{i}") for i in range(100)],
            "key string, tag string",
        )
        plain = large.join(small, "key").groupBy("key", "tag").agg(
            F.count(F.lit(1)).alias("c"), F.sum("payload").alias("s")
        )
        salted = salted_join(large, small, "key", salt_factor=8).groupBy(
            "key", "tag"
        ).agg(F.count(F.lit(1)).alias("c"), F.sum("payload").alias("s"))
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )


class TestSkewAggDedupFamily:
    def test_exact_dedup_hot_key_rides_partial_aggregation(self, spark):
        """dropDuplicates/groupBy on the hot key must partial-aggregate
        map-side: the shuffle carries one row per (map partition, key),
        so the hot key costs |partitions| shuffled rows, not N/2."""
        from etl_complete_with_spark_spark import plans as P

        df = _skewed(spark).select("key")  # 50k duplicate rows of HOT
        dd = df.distinct()
        # keys-only aggregates carry no `partial_<fn>` marker in the plan
        # text; map-side combine shows as TWO HashAggregate nodes around
        # the key exchange (the map-side one collapses the hot key to
        # one row per map partition before any data moves)
        plan = P.physical_plan(dd)
        assert plan.count("HashAggregate") >= 2, plan
        assert "Exchange hashpartitioning(key" in plan, plan
        assert dd.count() == 5_001  # hot + 5k cold (odd residues mod 10k)

    def test_latest_per_key_correct_under_hot_key(self, spark):
        from etl_complete_with_spark_spark.operators.transforms import dedup_by_key

        df = _skewed(spark)
        out = dedup_by_key(df, ["key"], order_by="payload", descending=True)
        rows = {r["key"]: r["payload"] for r in out.collect()}
        assert len(rows) == 5_001
        assert rows[HOT] == N_ROWS - 2  # highest even id


class TestSkewRankFamily:
    def test_global_ranks_exact_permutation_with_half_tied_order(self, spark):
        """50% of rows tie on the primary sort key: the range partitioner
        must spread the tie block across partitions via the tiebreaker
        (the ordering is total), and ranks stay an exact permutation.
        Both local-rank strategies."""
        from etl_complete_with_spark_spark.operators.packing import global_row_ranks

        df = _skewed(spark).select(
            F.when(F.col("key") == HOT, F.lit(0.0))
            .otherwise(F.col("payload").cast("double"))
            .alias("v"),
            F.col("payload").alias("id"),
        )
        for one_pass in (False, True):
            ranked = global_row_ranks(df, ["v", "id"], one_pass=one_pass)
            rows = ranked.select("__rank", "__n").collect()
            assert sorted(r["__rank"] for r in rows) == list(range(1, N_ROWS + 1))
            assert {r["__n"] for r in rows} == {N_ROWS}
        # the hot tie-block occupies exactly the first N/2 ranks
        got = (
            global_row_ranks(df, ["v", "id"])
            .filter(F.col("v") == 0.0)
            .agg(F.max("__rank").alias("mx"), F.count(F.lit(1)).alias("c"))
            .collect()[0]
        )
        assert (got["mx"], got["c"]) == (N_ROWS // 2, N_ROWS // 2)


class TestMegaDuplicateClusterLSH:
    """Round-9 adversarial-duplication guard: m byte-identical documents
    share every LSH bucket, and the unbounded bucket self-join emits
    m²/2 candidate pairs (5e11 at m=1e6 — a scale-killer). max_bucket
    star-connects oversized buckets: O(m) pairs, same connected
    components as the full clique."""

    M = 300  # mega-cluster size; full clique would be 44,850 pairs

    def _corpus(self, spark):
        from pyspark.sql import functions as F

        mega = spark.range(self.M).select(
            F.format_string("dup-%03d", F.col("id").cast("int")).alias("doc_id"),
            F.lit(
                "the same boilerplate page body repeated across the crawl "
                "with enough tokens to shingle meaningfully over and over"
            ).alias("text"),
        )
        # distinct background docs in their own small buckets
        bg = spark.range(40).select(
            F.format_string("bg-%03d", F.col("id").cast("int")).alias("doc_id"),
            F.concat(
                F.lit("unique background document number "),
                F.col("id").cast("string"),
                F.lit(" with its own words entirely different content "),
                F.md5(F.col("id").cast("string")),
            ).alias("text"),
        )
        return mega.union(bg)

    def test_star_mode_bounds_pairs_and_preserves_components(self, spark):
        from etl_complete_with_spark_spark.operators import dedup as D
        from etl_complete_with_spark_spark.operators.graph import (
            connected_components,
        )

        docs = self._corpus(spark)
        sigs = D.minhash_signatures(docs, num_hashes=16).localCheckpoint(
            eager=False
        )
        capped = D.lsh_candidate_pairs(sigs, bands=4, num_hashes=16, max_bucket=50)
        rows = capped.collect()
        dup_pairs = [r for r in rows if r["id1"].startswith("dup-")]
        # dual-hub star (r11): 2(m-1)-1 edges for the mega-cluster —
        # min-id hub edges plus max-id hub edges, the shared
        # (hub_lo, hub_hi) edge deduped — still linear in m
        assert len(dup_pairs) == 2 * self.M - 3
        hub_lo, hub_hi = "dup-000", f"dup-{self.M - 1:03d}"
        assert all(
            r["id1"] == hub_lo or r["id2"] == hub_hi for r in dup_pairs
        )
        # the full clique agrees on the resulting clusters
        full = D.lsh_candidate_pairs(sigs, bands=4, num_hashes=16)
        assert full.filter(
            full.id1.startswith("dup-")
        ).count() == self.M * (self.M - 1) // 2

        def comps(pairs):
            c = connected_components(
                pairs.select("id1", "id2"),
                vertices=docs.select(F.col("doc_id")),
            )
            out = {}
            for r in c.collect():
                out.setdefault(r["component"], set()).add(r["id"])
            return sorted(map(sorted, out.values()))

        from pyspark.sql import functions as F

        assert comps(capped) == comps(full)

    def test_star_edges_survive_jaccard_verification(self, spark):
        from etl_complete_with_spark_spark.operators import dedup as D

        docs = self._corpus(spark)
        verified = D.minhash_dedup_pairs(
            docs, num_hashes=16, bands=4, threshold=0.5, max_bucket=50
        )
        dup_rows = [
            r for r in verified.collect() if r["id1"].startswith("dup-")
        ]
        # identical docs: every dual-hub star edge verifies at 1.0
        assert len(dup_rows) == 2 * self.M - 3
        assert all(r["est_jaccard"] == 1.0 for r in dup_rows)

    def test_auto_default_equals_clique_below_threshold(self, spark):
        """Round-10 (r9 VERDICT order 4): the guard is now the DEFAULT —
        "auto" star-connects only above LSH_MAX_BUCKET_AUTO, so on any
        corpus whose buckets stay below it (every oracle path) the
        default is byte-identical to the explicit full clique."""
        from etl_complete_with_spark_spark.operators import dedup as D

        docs = self._corpus(spark)  # mega-bucket of 300 << 4096
        sigs = D.minhash_signatures(docs, num_hashes=16).localCheckpoint(
            eager=False
        )
        auto = D.lsh_candidate_pairs(sigs, bands=4, num_hashes=16)
        clique = D.lsh_candidate_pairs(
            sigs, bands=4, num_hashes=16, max_bucket=None
        )
        assert sorted(map(tuple, auto.collect())) == sorted(
            map(tuple, clique.collect())
        )
        # ...and 0 is the documented explicit clique override too
        assert D._resolve_max_bucket(0) is None
        assert D._resolve_max_bucket(None) is None
        assert D._resolve_max_bucket("auto") == D.LSH_MAX_BUCKET_AUTO
        assert D._resolve_max_bucket(50) == 50

    def test_resolve_max_bucket_normalizes_strings_and_negatives(self):
        """r10 ADVICE: the string "0" used to resolve to int 0, which
        downstream means "star-connect EVERY bucket" (0 is not None) —
        the opposite of the documented unbounded behavior; negative ints
        had the same everything-starred effect. Coerce first, <= 0 means
        unbounded, and a non-numeric string is a loud error."""
        import pytest

        from etl_complete_with_spark_spark.operators import dedup as D

        assert D._resolve_max_bucket("0") is None
        assert D._resolve_max_bucket("-5") is None
        assert D._resolve_max_bucket(-5) is None
        assert D._resolve_max_bucket("50") == 50
        with pytest.raises(ValueError, match="max_bucket"):
            D._resolve_max_bucket("unbounded")

    def _near_dup_signatures(self, spark, m=60, max_outlier=False):
        """Hand-built signature table for the documented star-mode
        divergence: one oversized band-0 bucket holding a min-id OUTLIER
        (agrees with everyone on band 0 only: est 4/16) plus m members
        that mutually agree on 10 of 16 hashes (est 0.625) but share NO
        complete band other than band 0 — so the members' only path to
        each other in star mode is through a hub. With
        ``max_outlier=True`` a second outlier ("z-000", max id, same
        4/16 agreement with everyone) occupies the max-id hub slot too,
        pinning the residual divergence the dual-hub mode cannot
        close."""
        rows = []
        base = {f"mh_{i}": i + 1 for i in range(16)}
        rows.append({"id": "a-000", **{k: v for k, v in base.items()}})
        # outlier's mh_4..15 unique to it
        for i in range(4, 16):
            rows[0][f"mh_{i}"] = 1000 + i
        for j in range(1, m + 1):
            r = {"id": f"m-{j:03d}", **dict(base)}
            # bands 1..3: first two hashes shared, last two unique per
            # member -> band hash differs -> no shared bucket
            for b in (1, 2, 3):
                r[f"mh_{4 * b + 2}"] = 5000 + 100 * b + j
                r[f"mh_{4 * b + 3}"] = 6000 + 100 * b + j
            rows.append(r)
        if max_outlier:
            z = {"id": "z-000", **dict(base)}
            for i in range(4, 16):
                z[f"mh_{i}"] = 2000 + i  # unique beyond band 0: 4/16 vs all
            rows.append(z)
        return spark.createDataFrame(rows)

    def test_near_dup_mega_cluster_dual_hub_recovers_members(self, spark):
        """r10 VERDICT order 6: the single-hub star dropped every member
        of a near-identical mega-bucket whose min-id hub was an outlier
        (all hub edges fail the 0.5 threshold -> verified output EMPTY
        while the clique keeps all member<->member pairs). The dual-hub
        star gives each member a second, independent chance through the
        max-id hub — here a genuine cluster member — so verification now
        keeps every member connected and the post-verification
        components MATCH the clique's on this corpus."""
        from etl_complete_with_spark_spark.operators import dedup as D

        sigs = self._near_dup_signatures(spark).localCheckpoint(eager=False)
        star_cands = D.lsh_candidate_pairs(
            sigs, bands=4, num_hashes=16, max_bucket=50
        )
        rows = star_cands.collect()
        # one oversized band-0 bucket -> hubs = min id (the outlier) and
        # max id (member m-060): 2*61 - 3 = 119 candidate edges
        assert len(rows) == 2 * 61 - 3
        assert all(
            r["id1"] == "a-000" or r["id2"] == "m-060" for r in rows
        )
        star_verified = D.verify_est_jaccard(star_cands, sigs, 16, 0.5)
        got = star_verified.collect()
        # every a-000 hub edge reads 4/16 and fails; every member<->m-060
        # edge reads 0.625 and passes -> all 60 members stay connected
        assert len(got) == 59
        assert all(
            r["id2"] == "m-060" and r["est_jaccard"] == 0.625 for r in got
        )

    def test_near_dup_mega_cluster_divergence_documented(self, spark):
        """r9 ADVICE / r10 order 6: star-mode components equal the
        clique's only PRE-verification. The dual-hub mode halves the
        exposure but cannot close it: when BOTH hub slots (min and max
        id) are outliers, every star edge fails the 0.5 threshold and
        the verified star output is EMPTY while the clique keeps all
        member<->member pairs at 0.625. This test pins the residual
        trade-off (the docstrings qualify the equivalence claim)."""
        from etl_complete_with_spark_spark.operators import dedup as D

        sigs = self._near_dup_signatures(
            spark, max_outlier=True
        ).localCheckpoint(eager=False)
        star_cands = D.lsh_candidate_pairs(
            sigs, bands=4, num_hashes=16, max_bucket=50
        )
        rows = star_cands.collect()
        # hubs are the two outliers: every edge touches a-000 or z-000
        assert all(
            r["id1"] == "a-000" or r["id2"] == "z-000" for r in rows
        )
        assert len(rows) == 2 * 62 - 3
        star_verified = D.verify_est_jaccard(star_cands, sigs, 16, 0.5)
        assert star_verified.count() == 0  # every hub edge reads 4/16
        clique_cands = D.lsh_candidate_pairs(
            sigs, bands=4, num_hashes=16, max_bucket=None
        )
        clique_verified = D.verify_est_jaccard(clique_cands, sigs, 16, 0.5)
        got = clique_verified.collect()
        assert len(got) == 60 * 59 // 2
        assert all(r["est_jaccard"] == 0.625 for r in got)


class TestIncrementalIngestMegaDuplicate:
    """Round-10: the continual-ingest path has its own blow-ups — a stored
    mega-cluster makes the corpus probe b x m, and a duplicate-heavy batch
    makes the within-batch self-join m²/2. The guard bounds both while
    keeping exact-dup detection byte-identical (identical-signature corpus
    members are interchangeable for verification; the within-batch star
    hub IS the keep-lowest survivor)."""

    BODY = (
        "the same boilerplate page body repeated across the crawl "
        "with enough tokens to shingle meaningfully over and over"
    )

    def _docs(self, spark, prefix, n, text=None):
        from pyspark.sql import functions as F

        base = spark.range(n).select(
            F.format_string(f"{prefix}-%03d", F.col("id").cast("int")).alias(
                "doc_id"
            )
        )
        if text is not None:
            return base.select("doc_id", F.lit(text).alias("text"))
        return base.select(
            "doc_id",
            F.concat(
                F.lit("unique doc "),
                F.col("doc_id"),
                F.lit(" entirely different words "),
                F.md5(F.col("doc_id")),
            ).alias("text"),
        )

    def test_guarded_filter_matches_unbounded_on_exact_dups(self, spark):
        from etl_complete_with_spark_spark.operators import dedup as D

        # stored mega-cluster of 120 identical docs + distinct background
        corpus = self._docs(spark, "old", 120, self.BODY).union(
            self._docs(spark, "oldbg", 20)
        )
        corpus_sigs = D.minhash_signatures(corpus, num_hashes=16)
        # batch: 80 copies of the stored body + 30 copies of a NOVEL body
        # + 10 distinct novel docs
        batch = (
            self._docs(spark, "new", 80, self.BODY)
            .union(self._docs(spark, "novel", 30, "a genuinely new page "
                              "body with its own distinct shingle stream "
                              "never stored before at all"))
            .union(self._docs(spark, "fresh", 10))
        )
        kept_g, sigs_g = D.incremental_neardup_filter(
            batch, corpus_sigs, max_bucket=50
        )
        kept_u, sigs_u = D.incremental_neardup_filter(
            batch, corpus_sigs, max_bucket=None
        )
        got_g = sorted(r["doc_id"] for r in kept_g.collect())
        got_u = sorted(r["doc_id"] for r in kept_u.collect())
        # identical-signature clusters: guarded == unbounded exactly
        assert got_g == got_u
        # every stored-body copy dropped; exactly ONE novel-body survivor
        # (the lowest id); all distinct docs kept
        assert not any(d.startswith("new-") for d in got_g)
        assert [d for d in got_g if d.startswith("novel-")] == ["novel-000"]
        assert sum(d.startswith("fresh-") for d in got_g) == 10
        assert sorted(r["id"] for r in sigs_g.collect()) == got_g

    def test_corpus_probe_is_bounded(self, spark):
        """The guarded probe join's candidate stream must be capped at
        cap reps per bucket — not the full stored mega-cluster."""
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.operators import dedup as D

        corpus = self._docs(spark, "old", 200, self.BODY)
        corpus_sigs = D.minhash_signatures(corpus, num_hashes=16)
        batch = self._docs(spark, "new", 5, self.BODY)
        # reproduce the guarded probe's candidate count via the public
        # surface: with cap=10, each new doc meets <= 10 corpus reps per
        # band bucket -> <= 4 bands x 10 = 40 distinct old_ids
        kept, _ = D.incremental_neardup_filter(
            batch, corpus_sigs, max_bucket=10
        )
        assert kept.count() == 0  # all five are stored-body copies

    def test_ingest_stats_surface_sampled_buckets(self, spark):
        """Round-11 (r10 order 4 — no silent caps): return_stats=True
        reports how many corpus-side (band, bucket) groups the cap
        sampled and how many posting rows it discarded, so bounded
        recall is visible per run, not only in the docstring."""
        from etl_complete_with_spark_spark.operators import dedup as D

        corpus = self._docs(spark, "old", 200, self.BODY)
        corpus_sigs = D.minhash_signatures(corpus, num_hashes=16)
        batch = self._docs(spark, "new", 5, self.BODY)
        kept, sigs, stats = D.incremental_neardup_filter(
            batch, corpus_sigs, max_bucket=10, return_stats=True
        )
        row = stats.collect()[0]
        # 200 identical docs land in ONE bucket per band (4 bands at
        # 16 hashes): 4 sampled buckets, (200 - 10) postings dropped each
        assert row["n_corpus_buckets_sampled"] == 4
        assert row["n_corpus_postings_dropped"] == 4 * 190
        # the main outputs are unchanged by asking for stats
        assert kept.count() == 0 and sigs.count() == 0

    def test_ingest_stats_zero_when_nothing_sampled(self, spark):
        from etl_complete_with_spark_spark.operators import dedup as D

        corpus = self._docs(spark, "old", 20)  # distinct docs, tiny buckets
        corpus_sigs = D.minhash_signatures(corpus, num_hashes=16)
        batch = self._docs(spark, "fresh", 5)
        for cap in ("auto", None):
            _, _, stats = D.incremental_neardup_filter(
                batch, corpus_sigs, max_bucket=cap, return_stats=True
            )
            row = stats.collect()[0]
            assert row["n_corpus_buckets_sampled"] == 0
            assert row["n_corpus_postings_dropped"] == 0


class TestHotBlockFuzzyMatch:
    """Round-10: blocked_fuzzy_pairs documented its hot-block hazard but
    did not guard it. max_block drops oversized blocks (the stop-shingle
    trade — no hub shortcut exists for per-pair edit distance), bounded
    and parity-identical below the cap."""

    def test_hot_block_dropped_small_blocks_exact(self, spark):
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.operators import dedup as D

        hot = spark.range(80).select(
            F.format_string("brand %03d corp", F.col("id").cast("int")).alias("name")
        )  # 80 distinct values, one "corp" block
        cold = spark.createDataFrame(
            [("acme ltd",), ("acme1 ltd",), ("zenith gmbh",)], ["name"]
        )
        df = hot.union(cold)
        guarded = D.blocked_fuzzy_pairs(df, "name", max_distance=2, max_block=50)
        got = sorted(map(tuple, guarded.collect()))
        # the hot block is gone; the small block's pair survives intact
        assert got == [("acme ltd", "acme1 ltd", 1)]
        # unbounded mode keeps the hot block's quadratic pair list
        full = D.blocked_fuzzy_pairs(df, "name", max_distance=2, max_block=None)
        assert full.count() > len(got)
        # auto default == unbounded below the threshold
        auto = D.blocked_fuzzy_pairs(df, "name", max_distance=2)
        assert sorted(map(tuple, auto.collect())) == sorted(
            map(tuple, full.collect())
        )

    def test_hot_block_drop_surfaced_in_stats(self, spark):
        """Round-11 (r10 order 4 + ADVICE: the drop was silent): the
        bounded-recall trade is now observable — return_stats=True
        reports the dropped block and value counts alongside the pairs,
        and the pairs themselves are unchanged."""
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.operators import dedup as D

        hot = spark.range(80).select(
            F.format_string("brand %03d corp", F.col("id").cast("int")).alias("name")
        )
        cold = spark.createDataFrame(
            [("acme ltd",), ("acme1 ltd",), ("zenith gmbh",)], ["name"]
        )
        df = hot.union(cold)
        pairs, stats = D.blocked_fuzzy_pairs(
            df, "name", max_distance=2, max_block=50, return_stats=True
        )
        row = stats.collect()[0]
        assert row["n_blocks_dropped"] == 1  # the hot "corp" block
        assert row["n_values_dropped"] == 80
        assert sorted(map(tuple, pairs.collect())) == [("acme ltd", "acme1 ltd", 1)]
        # nothing dropped -> explicit zeros, for the capped and uncapped modes
        for cap in ("auto", None):
            _, stats0 = D.blocked_fuzzy_pairs(
                df, "name", max_distance=2, max_block=cap, return_stats=True
            )
            row0 = stats0.collect()[0]
            assert (row0["n_blocks_dropped"], row0["n_values_dropped"]) == (0, 0)


class TestStopShingleCapStats:
    """Round-11: the stop-shingle cap in ngram_jaccard_pairs was the one
    remaining silent, answer-affecting drop (a shingle over the frequency
    cap stops counting toward n_common and an over-cap near-dup cluster
    loses its pairs entirely — no hub keeps detection here). The trade is
    unchanged; return_stats makes it observable per run."""

    def test_stop_shingle_drop_surfaced_in_stats(self, spark):
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.operators import dedup as D

        # 12 docs of pure boilerplate: one 3-gram shared by all 12
        boiler = spark.range(12).select(
            F.format_string("b-%03d", F.col("id").cast("int")).alias("doc_id"),
            F.lit("the quick brown").alias("text"),
        )
        # 2 genuinely similar docs under the cap (3 shingles, 2 shared)
        near = spark.createDataFrame(
            [
                ("n-001", "alpha beta gamma delta epsilon"),
                ("n-002", "alpha beta gamma delta zeta"),
            ],
            ["doc_id", "text"],
        )
        df = boiler.union(near)
        pairs, stats = D.ngram_jaccard_pairs(
            df, threshold=0.3, max_shingle_freq=5, return_stats=True
        )
        row = stats.collect()[0]
        assert row["n_stop_shingles_dropped"] == 1  # "the quick brown"
        assert row["n_postings_dropped"] == 12
        got = sorted(map(tuple, pairs.collect()))
        # the boilerplate cluster vanishes (the documented trade); the
        # under-cap near-dups keep their pair: 2 common / (3+3-2) = 0.5
        assert got == [("n-001", "n-002", 0.5)]
        # ...and the pairs are identical to the default (no-stats) path
        default = D.ngram_jaccard_pairs(df, threshold=0.3, max_shingle_freq=5)
        assert sorted(map(tuple, default.collect())) == got

    def test_stop_shingle_stats_zero_when_nothing_dropped(self, spark):
        from etl_complete_with_spark_spark.operators import dedup as D

        docs = spark.createDataFrame(
            [
                ("d-001", "alpha beta gamma delta"),
                ("d-002", "alpha beta gamma zeta"),
                ("d-003", "totally different words here"),
            ],
            ["doc_id", "text"],
        )
        # cap present but nothing over it, and cap off entirely
        for cap in (1000, None):
            pairs, stats = D.ngram_jaccard_pairs(
                docs, threshold=0.1, max_shingle_freq=cap, return_stats=True
            )
            row = stats.collect()[0]
            assert (
                row["n_stop_shingles_dropped"],
                row["n_postings_dropped"],
            ) == (0, 0)
            assert pairs.count() >= 1

    def test_containment_stop_shingle_stats_mirror_jaccard(self, spark):
        """Same cap, same observable: containment_pairs surfaces the
        identical stats row, and the distortion direction is pinned —
        a capped boilerplate shingle removes the contained copy's pair
        entirely (n_common drops while min(n1,n2) keeps counting)."""
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.operators import dedup as D

        # 12 short docs = pure boilerplate phrase; 1 long doc wraps it
        boiler = spark.range(12).select(
            F.format_string("b-%03d", F.col("id").cast("int")).alias("doc_id"),
            F.lit("the quick brown fox").alias("text"),
        )
        wrap = spark.createDataFrame(
            [("w-001", "intro words then the quick brown fox closing remark here")],
            ["doc_id", "text"],
        )
        df = boiler.union(wrap)
        uncapped, stats0 = D.containment_pairs(
            df, threshold=0.9, max_shingle_freq=None, return_stats=True
        )
        # containment catches the wrapped copies at 1.0 without the cap
        assert uncapped.filter(F.col("id2") == "w-001").count() > 0
        r0 = stats0.collect()[0]
        assert (r0["n_stop_shingles_dropped"], r0["n_postings_dropped"]) == (0, 0)
        capped, stats = D.containment_pairs(
            df, threshold=0.9, max_shingle_freq=5, return_stats=True
        )
        row = stats.collect()[0]
        assert row["n_stop_shingles_dropped"] >= 1
        assert row["n_postings_dropped"] >= 12
        # ...and the capped pairs are identical to the default path's
        default = D.containment_pairs(df, threshold=0.9, max_shingle_freq=5)
        assert sorted(map(tuple, capped.collect())) == sorted(
            map(tuple, default.collect())
        )

    def test_star_subset_surfaced_in_stats(self, spark):
        """r11 no-silent-caps completion: the star mode keeps detection
        but subsets the explicit pair list — return_stats surfaces how
        many buckets rode the star and the clique-edge gap per bucket
        (m(m-1)/2 - (2m-3)), with explicit zeros below the cap and in
        the unbounded mode."""
        from etl_complete_with_spark_spark.operators import dedup as D

        # reuse the mega-cluster corpus from TestMegaDuplicateClusterLSH
        mega = TestMegaDuplicateClusterLSH()
        docs = mega._corpus(spark)
        sigs = D.minhash_signatures(docs, num_hashes=16).localCheckpoint(
            eager=False
        )
        pairs, stats = D.lsh_candidate_pairs(
            sigs, bands=4, num_hashes=16, max_bucket=50, return_stats=True
        )
        row = stats.collect()[0]
        m = mega.M
        # the 300-doc cluster shares one bucket in EVERY band -> 4 starred
        assert row["n_buckets_starred"] == 4
        assert row["n_clique_pairs_not_emitted"] == 4 * (
            m * (m - 1) // 2 - (2 * m - 3)
        )
        # the pairs returned alongside stats match the default path
        default = D.lsh_candidate_pairs(
            sigs, bands=4, num_hashes=16, max_bucket=50
        )
        assert sorted(map(tuple, pairs.collect())) == sorted(
            map(tuple, default.collect())
        )
        # zeros when nothing starred (auto cap) and in unbounded mode
        for cap in ("auto", None):
            _, s0 = D.lsh_candidate_pairs(
                sigs, bands=4, num_hashes=16, max_bucket=cap, return_stats=True
            )
            r0 = s0.collect()[0]
            assert (
                r0["n_buckets_starred"],
                r0["n_clique_pairs_not_emitted"],
            ) == (0, 0)
