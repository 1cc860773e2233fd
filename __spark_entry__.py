"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real catalog lives in ``etl_complete_with_spark_spark/queries.py``;
this module just adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_complete_with_spark_spark.queries import ORACLE, QUERIES  # noqa: E402

# The driver's correctness gate samples the FIRST 50 entries of ``queries()``
# (dict insertion order).  Round 2's artifact therefore never covered the
# analytics / TPC-H / windowing half of the catalog.  This list pins one
# representative of every COVERAGE.md operator family into that window; the
# remaining catalog entries follow in registration order and are still fully
# covered by the local gate (``scripts/oracle_check.py``, all 155 queries).
PRIORITY_WINDOW: list[str] = [
    # always-pinned flagship + live-JDBC rows
    "pipeline_work_to_trusted",
    "jdbc_resync_orders",
    # --- 48 queries with NO row in any prior CORRECTNESS artifact
    # (r01∪r02∪r03 union = 93; the catalog has since grown to 155 —
    # later round-4 additions queue for r05, see the note below).
    # TPC-H mid-range (§2.4b)
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q19_discount_revenue_bands",
    "q20_excess_shippers",
    "q21_suppliers_kept_waiting",
    # analytics not yet externally recorded
    "supplier_balance_by_nation",
    "orders_monthly_rollup",
    "first_last_event_per_user",
    "funnel_signup_click_purchase",
    "table_diff_customer_batches",
    "calendar_dim",
    "histogram_order_prices",
    "skew_key_profile_events",
    "cohort_weekly_retention",
    "agg_approx_stats",
    "rfm_customer_segments",
    "markov_event_transitions",
    "cdc_apply_orders",
    "sketch_countmin_users",
    # training-data / graph / embeddings not yet externally recorded
    "dedup_cluster_keep_star",
    "ann_tiled_topk",
    "ann_pq_topk",
    "sample_weighted_quality",
    "sketch_merge_daily_users",
    "embedding_vector_stats",
    "text_gopher_rules",
    "heavy_hitter_tokens",
    "pagerank_suppliers",
    "stream_sessionize",
    "corpus_dup_ngram_profile",
    # round-4 additions (also never recorded)
    "dedup_containment",
    "knn_label_vote",
    "bm25_doc_search",
    "triangle_coorder_parts",
    "sketch_quantile_bottomk",
    "ewma_user_value",
    "kmeans_embeddings_int",
    "stream_quantile_sketch",
]
# Still-unrecorded after this round (window is full at 50; all are green
# in the local gate): debounce_events, robust_outlier_prices,
# robust_outlier_prices_sampled, top_event_trigrams, kcore_coorder_parts,
# bfs_coorder_parts, lpa_communities_parts, clustering_coefficient_parts,
# item_cooccurrence_similarity, golden_record_parts,
# sparse_tfidf_cosine_pairs, pyds_synthetic_rollup,
# incremental_rollup_orders, stream_incremental_rollup,
# mixture_kl_by_source, forecast_eval_seasonal_naive,
# regression_price_vs_quantity, time_to_purchase_stats,
# association_rules_parts, psi_order_price_drift — next round's first
# swaps (the reference-core/basic-join slots with 2+ green rows cede).
# Rotation policy (documented in COVERAGE.md §artifacts): the two flagship
# rows stay pinned every round; a query leaves the window only once it has
# a green row in some prior CORRECTNESS artifact AND its operator family
# retains at least one externally recorded representative; freed slots go
# first to never-recorded queries, then to the least-recorded ones.


def _ordered(src: dict) -> dict:
    head = {n: src[n] for n in PRIORITY_WINDOW if n in src}
    tail = {n: v for n, v in src.items() if n not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §2.11 composite pipeline) on sf0.001."""
    return QUERIES["pipeline_work_to_trusted"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLE)
