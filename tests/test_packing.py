"""Distributed prefix-sum shard packing tests (operators/packing.py)."""

from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.chunking import chunk_documents
from etl_complete_with_spark_spark.operators.packing import pack_chunks_into_shards
from etl_complete_with_spark_spark.queries import load


def _chunks(spark, sf_dir):
    return chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    ).select("doc_id", "chunk_idx", F.col("n_tokens").cast("long").alias("n_tokens"))


class TestShardPacking:
    def test_offsets_are_the_exact_global_prefix_sum(self, spark, sf_dir):
        rows = (
            pack_chunks_into_shards(_chunks(spark, sf_dir), shard_tokens=512)
            .orderBy("doc_id", "chunk_idx")
            .collect()
        )
        assert rows
        acc = 0
        for r in rows:
            assert r.chunk_offset == acc, (r.doc_id, r.chunk_idx)
            assert r.shard_id == acc // 512
            acc += r.n_tokens

    def test_partitioning_invariance(self, spark, sf_dir):
        ch = _chunks(spark, sf_dir)
        a = {
            (r.doc_id, r.chunk_idx): (r.chunk_offset, r.shard_id)
            for r in pack_chunks_into_shards(ch, 512).collect()
        }
        b = {
            (r.doc_id, r.chunk_idx): (r.chunk_offset, r.shard_id)
            for r in pack_chunks_into_shards(
                ch.repartition(13), 512, num_range_partitions=5
            ).collect()
        }
        assert a == b

    def test_shards_are_full_except_boundaries(self, spark, sf_dir):
        out = pack_chunks_into_shards(_chunks(spark, sf_dir), shard_tokens=512)
        sizes = (
            out.groupBy("shard_id")
            .agg(F.sum("n_tokens").alias("tok"))
            .orderBy("shard_id")
            .collect()
        )
        # every shard except the last holds >= the nominal size minus one
        # straddling chunk (chunks assigned by START offset)
        for s in sizes[:-1]:
            assert s.tok >= 512 - 32 + 1

    def test_no_single_partition_window(self, spark, sf_dir):
        # the scale contract: no empty-partitionBy Window in the plan
        from etl_complete_with_spark_spark import plans as P

        out = pack_chunks_into_shards(_chunks(spark, sf_dir), shard_tokens=512)
        plan = P.physical_plan(out)
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line.lower():
                assert "partitionBy=[]" not in line.replace(" ", ""), line


class TestNtileFromRank:
    def test_matches_sql_ntile_all_sizes(self, spark):
        """Closed-form NTILE == Spark's window ntile for n=1..40, k in {2,3,4,7}."""
        from etl_complete_with_spark_spark.operators.packing import (
            global_row_ranks,
            ntile_from_rank,
        )
        from pyspark.sql import Window

        for n, k in [(1, 4), (3, 4), (4, 4), (5, 4), (40, 7), (17, 3), (8, 2)]:
            df = spark.range(n).withColumnRenamed("id", "v")
            ranked = global_row_ranks(df, [F.col("v").asc()])
            got = {
                r.v: r.b
                for r in ranked.select(
                    "v", ntile_from_rank(F.col("__rank"), F.col("__n"), k).alias("b")
                ).collect()
            }
            want = {
                r.v: r.b
                for r in df.select(
                    "v", F.ntile(k).over(Window.orderBy("v")).alias("b")
                ).collect()
            }
            assert got == want, (n, k)


class TestGlobalRowRanksOneJob:
    """The round-8 one-job rank shape: both consumers of the range
    exchange live in one query (reused stage -> identical __pid per
    row), offsets come from a 32-row window, nothing is checkpointed
    or collected. A boundary mismatch between the two branches would
    break the rank-permutation property with overwhelming probability,
    so these pin it on the adversarial layouts (full ties: boundary
    placement is entirely tie-driven; skew: a few heavy keys)."""

    def _perm(self, ranked, n):
        rows = ranked.select("__rank", "__n").collect()
        assert sorted(r["__rank"] for r in rows) == list(range(1, n + 1))
        assert {r["__n"] for r in rows} == {n}

    def test_rank_is_permutation_under_full_ties(self, spark):
        from etl_complete_with_spark_spark.operators.packing import global_row_ranks

        df = spark.range(20_000).select(F.lit(1.0).alias("v"), F.col("id"))
        for one_pass in (False, True):
            self._perm(global_row_ranks(df, ["v", "id"], one_pass=one_pass), 20_000)

    def test_rank_is_permutation_under_skew(self, spark):
        from etl_complete_with_spark_spark.operators.packing import global_row_ranks

        df = spark.range(30_000).select(
            (F.col("id") % 5).cast("double").alias("v"), F.col("id")
        )
        for one_pass in (False, True):
            self._perm(global_row_ranks(df, ["v", "id"], one_pass=one_pass), 30_000)

    def test_one_pass_equals_default(self, spark):
        # the 100 TB strategy (sortWithinPartitions + mono-id local
        # ranks, one full-data exchange) must be value-identical to the
        # default window strategy on the same total order
        from etl_complete_with_spark_spark.operators.packing import global_row_ranks

        df = spark.range(25_000).select(
            (F.col("id") % 613).cast("double").alias("v"), F.col("id")
        )
        a = {r["id"]: (r["__rank"], r["__n"])
             for r in global_row_ranks(df, ["v", "id"]).collect()}
        b = {r["id"]: (r["__rank"], r["__n"])
             for r in global_row_ranks(df, ["v", "id"], one_pass=True).collect()}
        assert a == b

    def test_no_single_partition_exchange_in_plan(self, spark):
        from etl_complete_with_spark_spark import plans as P
        from etl_complete_with_spark_spark.operators.packing import global_row_ranks

        df = spark.range(5_000).select(F.col("id").cast("double").alias("v"), "id")
        plan = P.physical_plan(global_row_ranks(df, ["v", "id"]))
        assert "SinglePartition" not in plan

    def test_reuse_disabled_falls_back_to_pinned_path_same_values(self, spark):
        from etl_complete_with_spark_spark.operators.packing import global_row_ranks

        df = spark.range(10_000).select(
            (F.col("id") % 97).cast("double").alias("v"), F.col("id")
        )
        fast = {
            r["id"]: (r["__rank"], r["__n"])
            for r in global_row_ranks(df, ["v", "id"]).collect()
        }
        spark.conf.set("spark.sql.exchange.reuse", "false")
        try:
            slow = {
                r["id"]: (r["__rank"], r["__n"])
                for r in global_row_ranks(df, ["v", "id"]).collect()
            }
        finally:
            spark.conf.set("spark.sql.exchange.reuse", "true")
        assert fast == slow

    def test_env_flips_default_strategy(self, spark, monkeypatch):
        # SPARK_GRAFT_RANKS_ONE_PASS=1 routes default callers through the
        # one-pass strategy; values must be unchanged either way
        from etl_complete_with_spark_spark.operators.packing import global_row_ranks

        df = spark.range(8_000).select(
            (F.col("id") % 43).cast("double").alias("v"), F.col("id")
        )
        base = {
            r["id"]: (r["__rank"], r["__n"])
            for r in global_row_ranks(df, ["v", "id"]).collect()
        }
        monkeypatch.setenv("SPARK_GRAFT_RANKS_ONE_PASS", "1")
        flipped = {
            r["id"]: (r["__rank"], r["__n"])
            for r in global_row_ranks(df, ["v", "id"]).collect()
        }
        assert base == flipped

    def test_range_exchange_reuse_fires_in_final_plan(self, spark):
        """r8 ADVICE: correctness of the un-pinned shape relies on the
        range exchange actually being REUSED between the ranked and
        counts branches (reuse = both branches see identical sampled
        boundaries, hence identical __pid per row). The config guard
        alone can't see a reuse regression — this pins it at the plan
        level: after execution the final adaptive plan must hold exactly
        ONE live range exchange plus a ReusedExchange pointing at it. A
        future optimizer change splitting the exchange fails here loudly
        instead of via probabilistic rank corruption."""
        from etl_complete_with_spark_spark.operators.packing import global_row_ranks

        df = spark.range(20_000).select(
            (F.col("id") % 311).cast("double").alias("v"), F.col("id")
        )
        for one_pass in (False, True):
            ranked = global_row_ranks(df, ["v", "id"], one_pass=one_pass)
            ranked.collect()  # finalize the adaptive plan
            plan = ranked._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            range_lines = [
                ln for ln in final.splitlines() if "Exchange rangepartitioning" in ln
            ]
            live = [ln for ln in range_lines if "ReusedExchange" not in ln]
            reused = [ln for ln in range_lines if "ReusedExchange" in ln]
            assert len(live) == 1, (one_pass, final)
            assert len(reused) >= 1, (one_pass, final)

    def test_partition_count_overflow_guard_fires(self, spark):
        """r8 ADVICE (medium): the one-pass mono-id decode silently
        corrupts ranks past 2^33 rows per range partition; the window
        strategy's int row_number wraps at 2^31. The declarative
        raise_error guard over per-partition counts must fail loudly —
        exercised here with an artificially tiny bound."""
        import pytest

        from etl_complete_with_spark_spark.operators import packing as pk

        df = spark.range(5_000).select(
            (F.col("id") % 7).cast("double").alias("v"), F.col("id")
        )
        ranged = df.repartitionByRange(4, "v", "id").withColumn(
            "__pid", F.spark_partition_id()
        )
        guarded = pk._guarded_partition_counts(ranged, 100, "window")
        with pytest.raises(Exception, match="local-rank bound"):
            guarded.collect()
        # real bounds never fire on sane data
        ok = pk._guarded_partition_counts(
            ranged, pk.WINDOW_LOCAL_ROWS_BOUND, "window"
        ).collect()
        assert sum(r["__c"] for r in ok) == 5_000

    def test_size_aware_one_pass_dispatch(self, spark, monkeypatch):
        """r8 order 5: with no explicit arg and no env flag, the strategy
        follows the plan-estimated input size — small inputs keep the
        window form (no per-session JIT cliff in a 2-run bench), inputs
        past ONE_PASS_AUTO_BYTES get the one-pass scale form."""
        from etl_complete_with_spark_spark.operators import packing as pk

        monkeypatch.delenv("SPARK_GRAFT_RANKS_ONE_PASS", raising=False)
        df = spark.range(5_000).select(
            (F.col("id") % 17).cast("double").alias("v"), F.col("id")
        )
        small = pk.global_row_ranks(df, ["v", "id"])
        # window strategy's signature: the ENSURE_REQUIREMENTS hash
        # exchange feeding the per-partition row_number window
        assert "row_number" in small._jdf.queryExecution().optimizedPlan().toString()

        monkeypatch.setattr(pk, "ONE_PASS_AUTO_BYTES", 1)
        big = pk.global_row_ranks(df, ["v", "id"])
        opt = big._jdf.queryExecution().optimizedPlan().toString()
        assert "monotonically_increasing_id" in opt
        # both dispatch outcomes are value-identical
        assert {r["id"]: r["__rank"] for r in small.collect()} == {
            r["id"]: r["__rank"] for r in big.collect()
        }

    def test_auto_range_partitions_scale_with_size(self):
        """r8 ADVICE (medium): the default partition count scales with
        the estimated input so per-partition rows stay orders of
        magnitude under the 2^33 / 2^31 local-rank bounds (2^31 rows in
        one 1 GiB target partition would need sub-half-byte rows)."""
        from etl_complete_with_spark_spark.operators import packing as pk

        assert pk._auto_range_partitions(None) == 32
        assert pk._auto_range_partitions(10 << 20) == 32
        assert pk._auto_range_partitions(1 << 40) == 1024  # 1 TiB -> 1 GiB each
        assert (
            pk._auto_range_partitions(100 << 40) == 102400
        )  # the 100 TB design point
        assert pk._auto_range_partitions(1 << 60) == pk.MAX_AUTO_RANGE_PARTITIONS


class TestPackOneJobShape:
    """Round-9 pack shape: the doc-offset prefix sum drops the
    localCheckpoint + driver collect for the same reused-exchange form
    global_row_ranks uses; the pinned fallback stays value-identical."""

    def test_new_shape_equals_pinned_fallback(self, spark, sf_dir):
        ch = _chunks(spark, sf_dir)
        new = {
            (r.doc_id, r.chunk_idx): (r.chunk_offset, r.shard_id)
            for r in pack_chunks_into_shards(ch, 512).collect()
        }
        spark.conf.set("spark.sql.exchange.reuse", "false")
        try:
            pinned = {
                (r.doc_id, r.chunk_idx): (r.chunk_offset, r.shard_id)
                for r in pack_chunks_into_shards(ch, 512).collect()
            }
        finally:
            spark.conf.set("spark.sql.exchange.reuse", "true")
        assert new == pinned

    def test_doc_offset_range_exchange_reused(self, spark, sf_dir):
        out = pack_chunks_into_shards(_chunks(spark, sf_dir), shard_tokens=512)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        range_lines = [
            ln for ln in final.splitlines() if "Exchange rangepartitioning" in ln
        ]
        live = [ln for ln in range_lines if "ReusedExchange" not in ln]
        reused = [ln for ln in range_lines if "ReusedExchange" in ln]
        assert len(live) == 1, final
        assert len(reused) >= 1, final
