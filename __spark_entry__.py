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
# by the local gate (``scripts/oracle_check.py``, all 162 queries).
#
# ROUND 5: the r01∪r02∪r03∪r04 driver-green union is 141/162.  The 21
# never-recorded queries (all round-4 additions that registered after the
# 50-slot window filled) take slots 3-23, driving the union to 162/162 —
# every catalog query externally recorded.  The remaining 27 slots re-record
# the LEAST-recorded queries (exactly one green row, earliest round first,
# registration order as the tiebreak) per the rotation policy below.
PRIORITY_WINDOW: list[str] = [
    # always-pinned flagship + live-JDBC rows
    "pipeline_work_to_trusted",
    "jdbc_resync_orders",
    # --- the 21 queries with NO row in any prior CORRECTNESS artifact
    # entity resolution / text similarity
    "golden_record_parts",
    "sparse_tfidf_cosine_pairs",
    "top_event_trigrams",
    "item_cooccurrence_similarity",
    # custom Python DataSource (read pushdown + 2PC write)
    "pyds_synthetic_rollup",
    # distribution drift / stats / forecasting
    "mixture_kl_by_source",
    "psi_order_price_drift",
    "regression_price_vs_quantity",
    "time_to_purchase_stats",
    "forecast_eval_seasonal_naive",
    # robust stats: exact reference twin + the sampled 100 TB path
    # (this round rebuilt on the map-side bottom-k pre-cut)
    "robust_outlier_prices",
    "robust_outlier_prices_sampled",
    # iterative graph suite
    "hits_customer_supplier",
    "kcore_coorder_parts",
    "bfs_coorder_parts",
    "clustering_coefficient_parts",
    "lpa_communities_parts",
    # incremental view maintenance (batch + streaming twins)
    "incremental_rollup_orders",
    "stream_incremental_rollup",
    # sessionization / market basket
    "debounce_events",
    "association_rules_parts",
    # --- 27 re-record slots: least-recorded (single green row), oldest
    # artifact first — r02 rows
    "grouped_user_stats",
    "json_extract_props",
    "ann_lsh_topk",
    "mm_extract_features",
    "emb_quantize_int8",
    "emb_gram_int8",
    "ann_int8_topk",
    "emb_label_centroids",
    "text_unigram_lm_score",
    "table_profile_orders",
    "dedup_semantic_cluster",
    "fuzzy_match_part_names",
    "jsonl_roundtrip_orders",
    "ann_ivf_topk",
    "decontaminate_ngram_overlap",
    "sample_token_budget_mix",
    "stream_static_enrich",
    "orc_roundtrip_orders",
    "udtf_token_runs",
    "bpe_top_pairs",
    # r03 rows
    "rollup_revenue_by_nation_region",
    "running_revenue_per_customer",
    "left_outer_order_counts",
    "anti_join_customers_without_orders",
    "orders_above_customer_avg",
    "agg_approx_accuracy",
    "semi_join_priority_orders",
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
