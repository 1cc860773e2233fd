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
# (dict insertion order).  This list controls that window; the remaining
# catalog entries follow in registration order and are still fully covered
# by the local gate (``scripts/oracle_check.py``, which runs every entry of
# ``QUERIES`` — 165 at the time of writing; tests/test_entry_contract.py
# pins this comment's count against ``len(QUERIES)``).
#
# Round-13 window (VERDICT r12 order 1): the fourth-record pass continues —
# after r12, 80 queries hold exactly 3 green records (79 hold 4); all 48
# free slots go to the earliest-recorded of those 80 (r03/r04 firsts,
# registration order as the tiebreak), leaving ~32 for r14.  The union
# stays 165/165.
#
# WINDOW_GENERATED_AFTER stamps the newest CORRECTNESS artifact this window
# was computed from (scripts/rotate_window.py prints it alongside the
# list).  tests/test_entry_contract.py replays the rotation policy against
# artifacts with round <= this stamp ONLY, so the driver writing the
# CURRENT round's artifact — which happens before every judging pass — no
# longer trips the contract test (round-6 VERDICT order 1).
WINDOW_GENERATED_AFTER = 12
PRIORITY_WINDOW: list[str] = [
    "pipeline_work_to_trusted",  # pinned
    "jdbc_resync_orders",  # pinned
    "scd2_customer_versions",  # 3 row(s), first r03
    "order_price_distribution",  # 3 row(s), first r03
    "q3_shipping_priority",  # 3 row(s), first r03
    "q22_idle_rich_customers",  # 3 row(s), first r03
    "order_burst_components",  # 3 row(s), first r03
    "variant_props_stats",  # 3 row(s), first r03
    "q8_market_share",  # 3 row(s), first r03
    "q18_large_volume_customers",  # 3 row(s), first r03
    "dedup_cluster_keep_star",  # 3 row(s), first r04
    "ann_tiled_topk",  # 3 row(s), first r04
    "sample_weighted_quality",  # 3 row(s), first r04
    "text_gopher_rules",  # 3 row(s), first r04
    "ann_pq_topk",  # 3 row(s), first r04
    "heavy_hitter_tokens",  # 3 row(s), first r04
    "pagerank_suppliers",  # 3 row(s), first r04
    "stream_sessionize",  # 3 row(s), first r04
    "corpus_dup_ngram_profile",  # 3 row(s), first r04
    "dedup_containment",  # 3 row(s), first r04
    "knn_label_vote",  # 3 row(s), first r04
    "bm25_doc_search",  # 3 row(s), first r04
    "kmeans_embeddings_int",  # 3 row(s), first r04
    "agg_approx_stats",  # 3 row(s), first r04
    "sketch_merge_daily_users",  # 3 row(s), first r04
    "supplier_balance_by_nation",  # 3 row(s), first r04
    "orders_monthly_rollup",  # 3 row(s), first r04
    "embedding_vector_stats",  # 3 row(s), first r04
    "first_last_event_per_user",  # 3 row(s), first r04
    "funnel_signup_click_purchase",  # 3 row(s), first r04
    "table_diff_customer_batches",  # 3 row(s), first r04
    "calendar_dim",  # 3 row(s), first r04
    "histogram_order_prices",  # 3 row(s), first r04
    "skew_key_profile_events",  # 3 row(s), first r04
    "cohort_weekly_retention",  # 3 row(s), first r04
    "rfm_customer_segments",  # 3 row(s), first r04
    "markov_event_transitions",  # 3 row(s), first r04
    "cdc_apply_orders",  # 3 row(s), first r04
    "sketch_countmin_users",  # 3 row(s), first r04
    "triangle_coorder_parts",  # 3 row(s), first r04
    "sketch_quantile_bottomk",  # 3 row(s), first r04
    "ewma_user_value",  # 3 row(s), first r04
    "stream_quantile_sketch",  # 3 row(s), first r04
    "q5_local_supplier_volume",  # 3 row(s), first r04
    "q6_forecast_revenue",  # 3 row(s), first r04
    "q7_volume_shipping",  # 3 row(s), first r04
    "q9_product_profit",  # 3 row(s), first r04
    "q10_returned_items",  # 3 row(s), first r04
    "q13_customer_distribution",  # 3 row(s), first r04
    "q14_promo_revenue",  # 3 row(s), first r04
]
# Rotation policy (documented in COVERAGE.md §artifacts): the two flagship
# rows stay pinned every round; a query leaves the window only once it has
# a green row in some prior CORRECTNESS artifact AND its operator family
# retains at least one externally recorded representative; freed slots go
# first to never-recorded queries, then to the least-recorded ones
# (earliest-recorded round first, registration order as the tiebreak).


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
