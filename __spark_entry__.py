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
# round-7 addition (ann_ivf_topk_distributed — the corpus-scale IVF query
# path, previously proven only by bit-parity with the driver path) takes
# slot 3; the remaining 47 slots re-record the LEAST-recorded queries
# (exactly one green row, earliest-recorded round first, registration order
# as the tiebreak) — the whole 44-query once-green backlog (21×r4 TPC-H,
# 21×r5, the 2 r6 additions) plus three 2-row r1 fillers.  After this round
# every catalog query has >= 2 driver-green records.
#
# WINDOW_GENERATED_AFTER stamps the newest CORRECTNESS artifact this window
# was computed from (scripts/rotate_window.py prints it alongside the
# list).  tests/test_entry_contract.py replays the rotation policy against
# artifacts with round <= this stamp ONLY, so the driver writing the
# CURRENT round's artifact — which happens before every judging pass — no
# longer trips the contract test (round-6 VERDICT order 1).
WINDOW_GENERATED_AFTER = 6
PRIORITY_WINDOW: list[str] = [
    # always-pinned flagship + live-JDBC rows
    "pipeline_work_to_trusted",
    "jdbc_resync_orders",
    # --- round-7 addition: no row in any prior CORRECTNESS artifact
    "ann_ivf_topk_distributed",
    # --- 47 re-record slots: least-recorded (single green row), oldest
    # recorded round first, registration order as tiebreak — r4 rows
    "cdc_apply_orders",
    "sketch_countmin_users",
    "triangle_coorder_parts",
    "sketch_quantile_bottomk",
    "ewma_user_value",
    "stream_quantile_sketch",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q19_discount_revenue_bands",
    "q20_excess_shippers",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q21_suppliers_kept_waiting",
    # r5 rows
    "golden_record_parts",
    "sparse_tfidf_cosine_pairs",
    "pyds_synthetic_rollup",
    "mixture_kl_by_source",
    "hits_customer_supplier",
    "debounce_events",
    "robust_outlier_prices",
    "top_event_trigrams",
    "kcore_coorder_parts",
    "bfs_coorder_parts",
    "item_cooccurrence_similarity",
    "incremental_rollup_orders",
    "stream_incremental_rollup",
    "clustering_coefficient_parts",
    "lpa_communities_parts",
    "forecast_eval_seasonal_naive",
    "regression_price_vs_quantity",
    "time_to_purchase_stats",
    "association_rules_parts",
    "psi_order_price_drift",
    "robust_outlier_prices_sampled",
    # r6 rows
    "cluster_aware_split_docs",
    "stream_scd2_dim",
    # fillers: the least-recorded 2-row queries (first recorded r1)
    "filter_between_inclusive",
    "probe_bounds_date",
    "probe_bounds_int",
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
