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
# Round-14 window (VERDICT r13 order 4): the fourth-record pass FINISHES —
# after r13, exactly 32 queries hold 3 green records; all of them get a
# slot, and the remaining 16 free slots start the floor-5 pass on the
# earliest-recorded 4-record queries (r01 firsts, registration order as
# the tiebreak).  The union stays 165/165.
#
# WINDOW_GENERATED_AFTER stamps the newest CORRECTNESS artifact this window
# was computed from (scripts/rotate_window.py prints it alongside the
# list).  tests/test_entry_contract.py replays the rotation policy against
# artifacts with round <= this stamp ONLY, so the driver writing the
# CURRENT round's artifact — which happens before every judging pass — no
# longer trips the contract test (round-6 VERDICT order 1).
WINDOW_GENERATED_AFTER = 13
PRIORITY_WINDOW: list[str] = [
    "pipeline_work_to_trusted",  # pinned
    "jdbc_resync_orders",  # pinned
    "q15_top_supplier",  # 3 row(s), first r04
    "q16_supplier_variety",  # 3 row(s), first r04
    "q17_small_qty_revenue",  # 3 row(s), first r04
    "q19_discount_revenue_bands",  # 3 row(s), first r04
    "q20_excess_shippers",  # 3 row(s), first r04
    "q2_min_cost_supplier",  # 3 row(s), first r04
    "q11_important_stock",  # 3 row(s), first r04
    "q21_suppliers_kept_waiting",  # 3 row(s), first r04
    "golden_record_parts",  # 3 row(s), first r05
    "sparse_tfidf_cosine_pairs",  # 3 row(s), first r05
    "pyds_synthetic_rollup",  # 3 row(s), first r05
    "mixture_kl_by_source",  # 3 row(s), first r05
    "hits_customer_supplier",  # 3 row(s), first r05
    "debounce_events",  # 3 row(s), first r05
    "robust_outlier_prices",  # 3 row(s), first r05
    "top_event_trigrams",  # 3 row(s), first r05
    "kcore_coorder_parts",  # 3 row(s), first r05
    "bfs_coorder_parts",  # 3 row(s), first r05
    "item_cooccurrence_similarity",  # 3 row(s), first r05
    "incremental_rollup_orders",  # 3 row(s), first r05
    "stream_incremental_rollup",  # 3 row(s), first r05
    "clustering_coefficient_parts",  # 3 row(s), first r05
    "lpa_communities_parts",  # 3 row(s), first r05
    "forecast_eval_seasonal_naive",  # 3 row(s), first r05
    "regression_price_vs_quantity",  # 3 row(s), first r05
    "time_to_purchase_stats",  # 3 row(s), first r05
    "association_rules_parts",  # 3 row(s), first r05
    "psi_order_price_drift",  # 3 row(s), first r05
    "robust_outlier_prices_sampled",  # 3 row(s), first r05
    "cluster_aware_split_docs",  # 3 row(s), first r06
    "stream_scd2_dim",  # 3 row(s), first r06
    "ann_ivf_topk_distributed",  # 3 row(s), first r07
    "filter_range_halfopen",  # 4 row(s), first r01
    "filter_between_inclusive",  # 4 row(s), first r01
    "probe_bounds_date",  # 4 row(s), first r01
    "probe_bounds_int",  # 4 row(s), first r01
    "sk_hyphen",  # 4 row(s), first r01
    "sk_concat",  # 4 row(s), first r01
    "quality_check_dates",  # 4 row(s), first r01
    "dedup_latest_per_key",  # 4 row(s), first r01
    "agg_pricing_summary",  # 4 row(s), first r01
    "join_revenue_by_nation",  # 4 row(s), first r01
    "topk_orders_per_customer",  # 4 row(s), first r01
    "text_token_stats",  # 4 row(s), first r01
    "text_quality_score",  # 4 row(s), first r01
    "text_language_id",  # 4 row(s), first r01
    "text_fingerprint",  # 4 row(s), first r01
    "dedup_exact",  # 4 row(s), first r01
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
