"""Plan-shape assertions: the scale contract (SURVEY §4) as tests.

Correct answers at sf0.01 don't prove a query survives 100 TB; these
tests pin the physical properties that do: pushdown, pruning, broadcast,
map-side combine, bounded shuffle counts.
"""

from __future__ import annotations

from etl_complete_with_spark_spark import plans as P
from etl_complete_with_spark_spark.queries import QUERIES


class TestPushdownAndPruning:
    def test_halfopen_filter_reaches_parquet_scan(self, spark, sf_dir):
        df = QUERIES["filter_range_halfopen"](spark, sf_dir)
        assert P.has_pushed_filter(df, "GreaterThanOrEqual(o_orderdate", "LessThan(o_orderdate")

    def test_projection_prunes_scan_columns(self, spark, sf_dir):
        df = QUERIES["sk_hyphen"](spark, sf_dir)  # selects 2 of 5 customer cols
        cols = P.read_schema_columns(df)
        assert cols == {"c_custkey", "c_name"}

    def test_probe_reads_single_column(self, spark, sf_dir):
        df = QUERIES["probe_bounds_date"](spark, sf_dir)
        assert P.read_schema_columns(df) == {"o_orderdate"}


class TestJoinStrategies:
    def test_nation_join_broadcasts(self, spark, sf_dir):
        df = QUERIES["join_revenue_by_nation"](spark, sf_dir)
        assert P.has_broadcast_join(df)

    def test_ann_corpus_not_shuffled(self, spark, sf_dir):
        # broadcast of the query side means the corpus never moves
        df = QUERIES["ann_cosine_topk"](spark, sf_dir)
        assert P.has_broadcast_join(df) or "BroadcastNestedLoopJoin" in P.physical_plan(df)

    def test_basket_queries_have_no_self_join(self, spark, sf_dir):
        """The round-6 basket rewrites: pair generation is a map-side
        double explode off ONE collect_set aggregate — the plan must
        contain no sort-merge/shuffled-hash join (the old formulation
        self-joined the item table on orderkey; only the tiny broadcast
        frequency joins remain)."""
        for name in ("association_rules_parts", "item_cooccurrence_similarity"):
            plan = P.physical_plan(QUERIES[name](spark, sf_dir))
            assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, name
            assert "Generate explode" in plan, name  # the basket explode
            assert P.has_broadcast_join(QUERIES[name](spark, sf_dir)), name

    def test_cooccurrence_exchange_budget(self, spark, sf_dir):
        """Pin the basket-form shape: exactly 4 exchanges (basket build,
        pair aggregate, frequency aggregate, final window) — the old
        self-join formulation needed 6+. The pa < 50 filter sits between
        the explodes in the code, so a regression that moves it above
        the pair aggregate shows up here as shuffle-byte growth in the
        bench, and a reintroduced self-join as extra exchanges."""
        df = QUERIES["item_cooccurrence_similarity"](spark, sf_dir)
        assert P.count_exchanges(df) <= 4


class TestAggregateShape:
    def test_pricing_summary_partial_aggregates(self, spark, sf_dir):
        df = QUERIES["agg_pricing_summary"](spark, sf_dir)
        assert P.has_partial_aggregate(df)

    def test_pricing_summary_single_shuffle(self, spark, sf_dir):
        df = QUERIES["agg_pricing_summary"](spark, sf_dir)
        assert P.count_exchanges(df) <= 1

    def test_narrow_transform_chain_fuses(self, spark, sf_dir):
        # scan -> sk -> ts -> quality is narrow; only the dedup shuffles
        df = QUERIES["pipeline_work_to_trusted"](spark, sf_dir)
        assert P.count_exchanges(df) <= 1

    def test_text_scoring_is_shuffle_free(self, spark, sf_dir):
        df = QUERIES["text_quality_score"](spark, sf_dir)
        assert P.count_exchanges(df) == 0


class TestNoGlobalWindow:
    """Round-2 verdict named two single-partition global windows as the
    repo's only scale-killers; these pin the fixed plan shapes."""

    def test_order_price_distribution_has_no_single_partition_stage(
        self, spark, sf_dir
    ):
        df = QUERIES["order_price_distribution"](spark, sf_dir)
        plan = P.physical_plan(df)
        # the window that remains is per-range-partition (__pid), never a
        # global Exchange SinglePartition feeding a one-task sort
        assert "SinglePartition" not in plan
        assert "__pid" in plan  # the parallel two-level rank is in use

    def test_vocab_top_terms_is_take_ordered(self, spark, sf_dir):
        df = QUERIES["vocab_top_terms"](spark, sf_dir)
        plan = P.physical_plan(df)
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan

    def test_skew_profile_topn_is_take_ordered(self, spark, sf_dir):
        # the top-N cut happens BEFORE the rank window, so the window's
        # input is <= top_n rows (constant), not the distinct-key table —
        # and the window spec is partitioned (by the constant-valued
        # total_rows column), never the empty global spec
        df = QUERIES["skew_key_profile_events"](spark, sf_dir)
        plan = P.physical_plan(df)
        assert "TakeOrderedAndProject" in plan
        assert "windowspecdefinition(total_rows" in plan


class TestExplainSummary:
    def test_summary_shape(self, spark, sf_dir):
        s = P.explain_summary(QUERIES["agg_pricing_summary"](spark, sf_dir))
        assert set(s) == {"exchanges", "codegen_stages", "broadcast_join", "read_columns"}
        assert s["read_columns"]  # pruned scan lists its columns


class TestEmbeddingAnalyticsShapes:
    def test_gram_matrix_single_tiny_reduce(self, spark, sf_dir):
        # the only shuffle is the (partitions x d^2) partial-matrix reduce;
        # row data never crosses the wire
        df = QUERIES["emb_gram_int8"](spark, sf_dir)
        assert P.count_exchanges(df) <= 1

    def test_int8_topk_broadcasts_queries(self, spark, sf_dir):
        # corpus side must not shuffle: queries are broadcast
        df = QUERIES["ann_int8_topk"](spark, sf_dir)
        assert P.has_broadcast_join(df)

    def test_label_centroids_partial_aggregate(self, spark, sf_dir):
        # shuffle carries (label, dim) partials, not exploded code rows
        df = QUERIES["emb_label_centroids"](spark, sf_dir)
        assert P.has_partial_aggregate(df)

    def test_profile_single_scan(self, spark, sf_dir):
        # one scan + Expand; never one scan per profiled column
        df = QUERIES["table_profile_orders"](spark, sf_dir)
        plan = P.physical_plan(df)
        assert plan.count("Scan parquet") + plan.count("FileScan") <= 2


class TestTpchPlanShapes:
    """Physical-plan contracts for the TPC-H suite (queries_tpch.py)."""

    def test_q2_q11_q21_broadcast_dims_no_cartesian(self, spark, sf_dir):
        """The derived-partsupp queries must keep the TPC-H discipline:
        dimensions broadcast, and the only nested-loop joins are
        single-row scalar cross joins (supplier count / nation total) —
        never a data-sized cartesian."""
        for name in (
            "q2_min_cost_supplier",
            "q11_important_stock",
            "q21_suppliers_kept_waiting",
        ):
            plan = P.physical_plan(QUERIES[name](spark, sf_dir))
            assert "CartesianProduct" not in plan, name
            assert P.has_broadcast_join(QUERIES[name](spark, sf_dir)), name

    def test_q2_min_is_partitioned_window(self, spark, sf_dir):
        plan = P.physical_plan(QUERIES["q2_min_cost_supplier"](spark, sf_dir))
        # per-part min: window partitioned by the part key, never global
        assert "windowspecdefinition(p_partkey" in plan

    def test_q6_all_predicates_reach_scan_no_join(self, spark, sf_dir):
        df = QUERIES["q6_forecast_revenue"](spark, sf_dir)
        assert P.has_pushed_filter(
            df,
            "GreaterThanOrEqual(l_shipdate",
            "LessThan(l_shipdate",
            "GreaterThanOrEqual(l_discount,0.05)",
            "LessThanOrEqual(l_discount,0.07)",
            "LessThan(l_quantity,24.0)",
        )
        plan = P.physical_plan(df)
        assert "Join" not in plan  # scan -> partial agg -> final agg only
        assert P.has_partial_aggregate(df)

    def test_q6_reads_only_needed_columns(self, spark, sf_dir):
        df = QUERIES["q6_forecast_revenue"](spark, sf_dir)
        assert P.read_schema_columns(df) == {
            "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
        }

    def test_q5_dimensions_broadcast(self, spark, sf_dir):
        df = QUERIES["q5_local_supplier_volume"](spark, sf_dir)
        plan = P.physical_plan(df)
        assert plan.count("BroadcastHashJoin") >= 3  # cust, supp, nation-region
        assert P.has_pushed_filter(df, "GreaterThanOrEqual(o_orderdate")

    def test_q9_part_filter_prunes_before_fact_join(self, spark, sf_dir):
        df = QUERIES["q9_product_profit"](spark, sf_dir)
        assert P.has_pushed_filter(df, "StringContains(p_name,bolt)")
        assert P.has_broadcast_join(df)

    def test_q10_topk_is_take_ordered(self, spark, sf_dir):
        df = QUERIES["q10_returned_items"](spark, sf_dir)
        assert "TakeOrderedAndProject" in P.physical_plan(df)

    def test_q18_semijoin_before_customer_broadcast(self, spark, sf_dir):
        df = QUERIES["q18_large_volume_customers"](spark, sf_dir)
        plan = P.physical_plan(df)
        assert "LeftSemi" in plan
        assert "BroadcastHashJoin" in plan

    def test_q15_no_collect_scalar_max_is_joined(self, spark, sf_dir):
        # the max-revenue threshold rides a 1-row broadcast join, never a
        # driver collect — the plan is a closed DAG
        df = QUERIES["q15_top_supplier"](spark, sf_dir)
        assert P.has_broadcast_join(df)


class TestDynamicPartitionPruning:
    def test_dim_filter_prunes_fact_partitions(self, spark, sf_dir, tmp_path):
        """DPP: a filter on a joined dimension must prune the
        partitioned fact's directory scan at RUNTIME — at 100 TB this is
        the difference between scanning 3 date partitions and 3,000.
        The fact (events, partitioned by event_type) joins a tiny dim
        carrying a selective predicate; the plan must carry a
        DynamicPruningExpression on the fact's partition column."""
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.queries import load

        fact_dir = str(tmp_path / "events_by_type")
        load(spark, sf_dir, "events").write.partitionBy("event_type").parquet(fact_dir)
        fact = spark.read.parquet(fact_dir)
        dim = spark.createDataFrame(
            [("click", 1.0), ("view", 0.5), ("purchase", 5.0), ("signup", 2.0), ("error", 0.0)],
            "event_type string, weight double",
        ).filter(F.col("weight") >= 5.0)
        joined = fact.join(dim, "event_type").groupBy("event_type").agg(
            F.sum(F.col("value") * F.col("weight")).alias("weighted")
        )
        plan = P.physical_plan(joined)
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        # and the filtered result is correct: only 'purchase' survives
        rows = joined.collect()
        assert [r["event_type"] for r in rows] == ["purchase"]


class TestAdaptiveExecution:
    def test_aqe_coalesces_small_shuffle_partitions(self, spark, sf_dir):
        """AQE must shrink the configured 32 shuffle partitions to what
        the data actually needs — at 100 TB the same machinery retunes
        reducer counts per stage from runtime sizes instead of one global
        spark.sql.shuffle.partitions guess (and handles skew splits)."""
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.queries import load

        agg = (
            load(spark, sf_dir, "nation")
            .groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        agg.collect()  # adaptive plans finalize at execution
        final = agg._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead" in final and "coalesced" in final, final[:1500]
        assert agg.rdd.getNumPartitions() < 32


class TestRound4PlanShapes:
    def test_coorder_cohort_filter_reaches_scan(self, spark, sf_dir):
        # the 1995-96 cohort predicate must prune at the parquet scan;
        # asserted on the pre-checkpoint construction (the cached form
        # truncates lineage, hiding the scan node from the final plan)
        from etl_complete_with_spark_spark.queries_analytics import (
            _coorder_edges_plan,
        )

        df = _coorder_edges_plan(spark, sf_dir)
        assert P.has_pushed_filter(
            df, "GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate"
        )

    def test_bm25_stats_broadcast(self, spark, sf_dir):
        df = QUERIES["bm25_doc_search"](spark, sf_dir)
        assert P.has_broadcast_join(df)
        assert "TakeOrderedAndProject" in P.physical_plan(df)

    def test_knn_corpus_not_shuffled(self, spark, sf_dir):
        df = QUERIES["knn_label_vote"](spark, sf_dir)
        assert P.has_broadcast_join(df)

    def test_ewma_single_shuffle(self, spark, sf_dir):
        df = QUERIES["ewma_user_value"](spark, sf_dir)
        assert P.count_exchanges(df) <= 1
        assert "SinglePartition" not in P.physical_plan(df)

    def test_debounce_single_shuffle_no_global_window(self, spark, sf_dir):
        df = QUERIES["debounce_events"](spark, sf_dir)
        assert P.count_exchanges(df) <= 1
        assert "SinglePartition" not in P.physical_plan(df)

    def test_trigrams_top20_is_take_ordered(self, spark, sf_dir):
        df = QUERIES["top_event_trigrams"](spark, sf_dir)
        assert "TakeOrderedAndProject" in P.physical_plan(df)

    def test_sparse_cosine_stats_broadcast(self, spark, sf_dir):
        df = QUERIES["sparse_tfidf_cosine_pairs"](spark, sf_dir)
        assert P.has_broadcast_join(df)

    def test_quantile_sketch_no_global_window(self, spark, sf_dir):
        df = QUERIES["sketch_quantile_bottomk"](spark, sf_dir)
        assert "SinglePartition" not in P.physical_plan(df)
