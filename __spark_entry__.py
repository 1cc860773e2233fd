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
# Round-16 window (floor-5 pass continues, policy per COVERAGE.md): the
# 48 free slots rotate onto the least-recorded queries — after r15 every
# catalog query holds >= 4 green records, so the floor-5 pass walks the
# earliest-recorded 4-record queries (r03 firsts, registration order as
# the tiebreak).  The union stays 165/165.
#
# WINDOW_GENERATED_AFTER stamps the newest CORRECTNESS artifact this window
# was computed from (scripts/rotate_window.py prints it alongside the
# list).  tests/test_entry_contract.py replays the rotation policy against
# artifacts with round <= this stamp ONLY, so the driver writing the
# CURRENT round's artifact — which happens before every judging pass — no
# longer trips the contract test (round-6 VERDICT order 1).
WINDOW_GENERATED_AFTER = 15
PRIORITY_WINDOW: list[str] = [
    "pipeline_work_to_trusted",  # pinned
    "jdbc_resync_orders",  # pinned
    "bpe_top_pairs",  # 4 row(s), first r03
    "rollup_revenue_by_nation_region",  # 4 row(s), first r03
    "running_revenue_per_customer",  # 4 row(s), first r03
    "left_outer_order_counts",  # 4 row(s), first r03
    "anti_join_customers_without_orders",  # 4 row(s), first r03
    "orders_above_customer_avg",  # 4 row(s), first r03
    "agg_approx_accuracy",  # 4 row(s), first r03
    "semi_join_priority_orders",  # 4 row(s), first r03
    "case_agg_priority_split",  # 4 row(s), first r03
    "top10_orders_global",  # 4 row(s), first r03
    "unpivot_event_matrix",  # 4 row(s), first r03
    "part_name_search",  # 4 row(s), first r03
    "stats_price_quantity",  # 4 row(s), first r03
    "rolling_24h_user_value",  # 4 row(s), first r03
    "gapfill_hourly_counts",  # 4 row(s), first r03
    "grouping_sets_revenue",  # 4 row(s), first r03
    "zorder_morton_codes",  # 4 row(s), first r03
    "dq_orders_expectations",  # 4 row(s), first r03
    "dq_fk_orphan_events",  # 4 row(s), first r03
    "scd2_customer_versions",  # 4 row(s), first r03
    "order_price_distribution",  # 4 row(s), first r03
    "q3_shipping_priority",  # 4 row(s), first r03
    "q22_idle_rich_customers",  # 4 row(s), first r03
    "order_burst_components",  # 4 row(s), first r03
    "variant_props_stats",  # 4 row(s), first r03
    "q8_market_share",  # 4 row(s), first r03
    "q18_large_volume_customers",  # 4 row(s), first r03
    "dedup_cluster_keep_star",  # 4 row(s), first r04
    "ann_tiled_topk",  # 4 row(s), first r04
    "sample_weighted_quality",  # 4 row(s), first r04
    "text_gopher_rules",  # 4 row(s), first r04
    "ann_pq_topk",  # 4 row(s), first r04
    "heavy_hitter_tokens",  # 4 row(s), first r04
    "pagerank_suppliers",  # 4 row(s), first r04
    "stream_sessionize",  # 4 row(s), first r04
    "corpus_dup_ngram_profile",  # 4 row(s), first r04
    "dedup_containment",  # 4 row(s), first r04
    "knn_label_vote",  # 4 row(s), first r04
    "bm25_doc_search",  # 4 row(s), first r04
    "kmeans_embeddings_int",  # 4 row(s), first r04
    "agg_approx_stats",  # 4 row(s), first r04
    "sketch_merge_daily_users",  # 4 row(s), first r04
    "supplier_balance_by_nation",  # 4 row(s), first r04
    "orders_monthly_rollup",  # 4 row(s), first r04
    "embedding_vector_stats",  # 4 row(s), first r04
    "first_last_event_per_user",  # 4 row(s), first r04
    "funnel_signup_click_purchase",  # 4 row(s), first r04
    "table_diff_customer_batches",  # 4 row(s), first r04
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
