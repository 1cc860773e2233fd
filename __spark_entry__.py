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
# ROUND 7: the r01∪…∪r06 union covers all 164 pre-round-7 queries.  The one
# Round-10 window (VERDICT r9 order 2): the r9 rotation recorded a third
# green row for 48 of the 2-record queries; the 61-query 2-record backlog
# shrinks again this round — all 48 free slots go to the remaining
# least-recorded queries, earliest-recorded round first per the committed
# policy (registration order as the tiebreak).  The union stays 165/165.
#
# WINDOW_GENERATED_AFTER stamps the newest CORRECTNESS artifact this window
# was computed from (scripts/rotate_window.py prints it alongside the
# list).  tests/test_entry_contract.py replays the rotation policy against
# artifacts with round <= this stamp ONLY, so the driver writing the
# CURRENT round's artifact — which happens before every judging pass — no
# longer trips the contract test (round-6 VERDICT order 1).
WINDOW_GENERATED_AFTER = 9
PRIORITY_WINDOW: list[str] = [
    "pipeline_work_to_trusted",  # pinned
    "jdbc_resync_orders",  # pinned
    "bm25_doc_search",  # 2 row(s), first r04
    "kmeans_embeddings_int",  # 2 row(s), first r04
    "agg_approx_stats",  # 2 row(s), first r04
    "sketch_merge_daily_users",  # 2 row(s), first r04
    "supplier_balance_by_nation",  # 2 row(s), first r04
    "orders_monthly_rollup",  # 2 row(s), first r04
    "embedding_vector_stats",  # 2 row(s), first r04
    "first_last_event_per_user",  # 2 row(s), first r04
    "funnel_signup_click_purchase",  # 2 row(s), first r04
    "table_diff_customer_batches",  # 2 row(s), first r04
    "calendar_dim",  # 2 row(s), first r04
    "histogram_order_prices",  # 2 row(s), first r04
    "skew_key_profile_events",  # 2 row(s), first r04
    "cohort_weekly_retention",  # 2 row(s), first r04
    "rfm_customer_segments",  # 2 row(s), first r04
    "markov_event_transitions",  # 2 row(s), first r04
    "cdc_apply_orders",  # 2 row(s), first r04
    "sketch_countmin_users",  # 2 row(s), first r04
    "triangle_coorder_parts",  # 2 row(s), first r04
    "sketch_quantile_bottomk",  # 2 row(s), first r04
    "ewma_user_value",  # 2 row(s), first r04
    "stream_quantile_sketch",  # 2 row(s), first r04
    "q5_local_supplier_volume",  # 2 row(s), first r04
    "q6_forecast_revenue",  # 2 row(s), first r04
    "q7_volume_shipping",  # 2 row(s), first r04
    "q9_product_profit",  # 2 row(s), first r04
    "q10_returned_items",  # 2 row(s), first r04
    "q13_customer_distribution",  # 2 row(s), first r04
    "q14_promo_revenue",  # 2 row(s), first r04
    "q15_top_supplier",  # 2 row(s), first r04
    "q16_supplier_variety",  # 2 row(s), first r04
    "q17_small_qty_revenue",  # 2 row(s), first r04
    "q19_discount_revenue_bands",  # 2 row(s), first r04
    "q20_excess_shippers",  # 2 row(s), first r04
    "q2_min_cost_supplier",  # 2 row(s), first r04
    "q11_important_stock",  # 2 row(s), first r04
    "q21_suppliers_kept_waiting",  # 2 row(s), first r04
    "golden_record_parts",  # 2 row(s), first r05
    "sparse_tfidf_cosine_pairs",  # 2 row(s), first r05
    "pyds_synthetic_rollup",  # 2 row(s), first r05
    "mixture_kl_by_source",  # 2 row(s), first r05
    "hits_customer_supplier",  # 2 row(s), first r05
    "debounce_events",  # 2 row(s), first r05
    "robust_outlier_prices",  # 2 row(s), first r05
    "top_event_trigrams",  # 2 row(s), first r05
    "kcore_coorder_parts",  # 2 row(s), first r05
    "bfs_coorder_parts",  # 2 row(s), first r05
    "item_cooccurrence_similarity",  # 2 row(s), first r05
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
