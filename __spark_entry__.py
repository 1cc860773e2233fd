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
# Round-12 window (VERDICT r11 order 1): the evidence floor closed at 3 in
# r11, so this rotation continues the fourth-record pass — all 48 free
# slots go to the earliest-recorded of the 128 three-record queries
# (r01/r02/r03 firsts, registration order as the tiebreak), per the
# committed policy.  The union stays 165/165.
#
# WINDOW_GENERATED_AFTER stamps the newest CORRECTNESS artifact this window
# was computed from (scripts/rotate_window.py prints it alongside the
# list).  tests/test_entry_contract.py replays the rotation policy against
# artifacts with round <= this stamp ONLY, so the driver writing the
# CURRENT round's artifact — which happens before every judging pass — no
# longer trips the contract test (round-6 VERDICT order 1).
WINDOW_GENERATED_AFTER = 11
PRIORITY_WINDOW: list[str] = [
    "pipeline_work_to_trusted",  # pinned
    "jdbc_resync_orders",  # pinned
    "cube_revenue",  # 3 row(s), first r01
    "distinct_users_per_type",  # 3 row(s), first r01
    "pivot_user_event_matrix",  # 3 row(s), first r01
    "sessionize_batch",  # 3 row(s), first r01
    "asof_join_last_purchase",  # 3 row(s), first r01
    "grouped_user_stats",  # 3 row(s), first r01
    "range_join_event_windows",  # 3 row(s), first r01
    "skew_salted_join",  # 3 row(s), first r01
    "agg_quantiles",  # 3 row(s), first r01
    "json_extract_props",  # 3 row(s), first r01
    "ann_lsh_topk",  # 3 row(s), first r02
    "mm_extract_features",  # 3 row(s), first r02
    "emb_quantize_int8",  # 3 row(s), first r02
    "emb_gram_int8",  # 3 row(s), first r02
    "ann_int8_topk",  # 3 row(s), first r02
    "emb_label_centroids",  # 3 row(s), first r02
    "text_unigram_lm_score",  # 3 row(s), first r02
    "stream_dedup_events",  # 3 row(s), first r02
    "table_profile_orders",  # 3 row(s), first r02
    "dedup_semantic_cluster",  # 3 row(s), first r02
    "pack_training_shards",  # 3 row(s), first r02
    "fuzzy_match_part_names",  # 3 row(s), first r02
    "jsonl_roundtrip_orders",  # 3 row(s), first r02
    "ann_ivf_topk",  # 3 row(s), first r03
    "decontaminate_ngram_overlap",  # 3 row(s), first r03
    "sample_token_budget_mix",  # 3 row(s), first r03
    "stream_static_enrich",  # 3 row(s), first r03
    "orc_roundtrip_orders",  # 3 row(s), first r03
    "udtf_token_runs",  # 3 row(s), first r03
    "bpe_top_pairs",  # 3 row(s), first r03
    "rollup_revenue_by_nation_region",  # 3 row(s), first r03
    "running_revenue_per_customer",  # 3 row(s), first r03
    "left_outer_order_counts",  # 3 row(s), first r03
    "anti_join_customers_without_orders",  # 3 row(s), first r03
    "orders_above_customer_avg",  # 3 row(s), first r03
    "agg_approx_accuracy",  # 3 row(s), first r03
    "semi_join_priority_orders",  # 3 row(s), first r03
    "case_agg_priority_split",  # 3 row(s), first r03
    "top10_orders_global",  # 3 row(s), first r03
    "unpivot_event_matrix",  # 3 row(s), first r03
    "part_name_search",  # 3 row(s), first r03
    "stats_price_quantity",  # 3 row(s), first r03
    "rolling_24h_user_value",  # 3 row(s), first r03
    "gapfill_hourly_counts",  # 3 row(s), first r03
    "grouping_sets_revenue",  # 3 row(s), first r03
    "zorder_morton_codes",  # 3 row(s), first r03
    "dq_orders_expectations",  # 3 row(s), first r03
    "dq_fk_orphan_events",  # 3 row(s), first r03
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
