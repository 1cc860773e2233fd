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
# by the local gate (``scripts/oracle_check.py``, all 164 queries).
#
# ROUND 6: the r01∪…∪r05 union covers all 162 pre-round-6 queries.  The two
# round-6 additions (cluster_aware_split_docs — the previously-unreferenced
# leakage-safe splitter, and stream_scd2_dim — streaming SCD2's first oracle
# row) take slots 3-4; the remaining 46 slots re-record the LEAST-recorded
# queries (exactly one green row, earliest-recorded round first,
# registration order as the tiebreak), raising the minimum-records floor:
# after this round every r3-first query and most r4-first ones have >= 2
# external rows.
PRIORITY_WINDOW: list[str] = [
    # always-pinned flagship + live-JDBC rows
    "pipeline_work_to_trusted",
    "jdbc_resync_orders",
    # --- round-6 additions: no row in any prior CORRECTNESS artifact
    "cluster_aware_split_docs",
    "stream_scd2_dim",
    # --- 46 re-record slots: least-recorded (single green row), oldest
    # recorded round first, registration order as tiebreak — r3 rows
    "case_agg_priority_split",
    "top10_orders_global",
    "unpivot_event_matrix",
    "part_name_search",
    "stats_price_quantity",
    "rolling_24h_user_value",
    "gapfill_hourly_counts",
    "grouping_sets_revenue",
    "zorder_morton_codes",
    "dq_orders_expectations",
    "dq_fk_orphan_events",
    "scd2_customer_versions",
    "order_price_distribution",
    "q3_shipping_priority",
    "q22_idle_rich_customers",
    "order_burst_components",
    "variant_props_stats",
    "q8_market_share",
    "q18_large_volume_customers",
    # r4 rows
    "dedup_cluster_keep_star",
    "ann_tiled_topk",
    "sample_weighted_quality",
    "text_gopher_rules",
    "ann_pq_topk",
    "heavy_hitter_tokens",
    "pagerank_suppliers",
    "stream_sessionize",
    "corpus_dup_ngram_profile",
    "dedup_containment",
    "knn_label_vote",
    "bm25_doc_search",
    "kmeans_embeddings_int",
    "agg_approx_stats",
    "sketch_merge_daily_users",
    "supplier_balance_by_nation",
    "orders_monthly_rollup",
    "embedding_vector_stats",
    "first_last_event_per_user",
    "funnel_signup_click_purchase",
    "table_diff_customer_batches",
    "calendar_dim",
    "histogram_order_prices",
    "skew_key_profile_events",
    "cohort_weekly_retention",
    "rfm_customer_segments",
    "markov_event_transitions",
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
