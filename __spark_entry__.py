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
# Round-11 window (VERDICT r10 order 1): the 13 queries still holding only
# 2 green records take the first free slots — this rotation closes the
# evidence floor at 3 everywhere.  The remaining 35 slots start the
# fourth-record pass, earliest-recorded round first per the committed
# policy (registration order as the tiebreak).  The union stays 165/165.
#
# WINDOW_GENERATED_AFTER stamps the newest CORRECTNESS artifact this window
# was computed from (scripts/rotate_window.py prints it alongside the
# list).  tests/test_entry_contract.py replays the rotation policy against
# artifacts with round <= this stamp ONLY, so the driver writing the
# CURRENT round's artifact — which happens before every judging pass — no
# longer trips the contract test (round-6 VERDICT order 1).
WINDOW_GENERATED_AFTER = 10
PRIORITY_WINDOW: list[str] = [
    "pipeline_work_to_trusted",  # pinned
    "jdbc_resync_orders",  # pinned
    "incremental_rollup_orders",  # 2 row(s), first r05
    "stream_incremental_rollup",  # 2 row(s), first r05
    "clustering_coefficient_parts",  # 2 row(s), first r05
    "lpa_communities_parts",  # 2 row(s), first r05
    "forecast_eval_seasonal_naive",  # 2 row(s), first r05
    "regression_price_vs_quantity",  # 2 row(s), first r05
    "time_to_purchase_stats",  # 2 row(s), first r05
    "association_rules_parts",  # 2 row(s), first r05
    "psi_order_price_drift",  # 2 row(s), first r05
    "robust_outlier_prices_sampled",  # 2 row(s), first r05
    "cluster_aware_split_docs",  # 2 row(s), first r06
    "stream_scd2_dim",  # 2 row(s), first r06
    "ann_ivf_topk_distributed",  # 2 row(s), first r07
    "filter_range_halfopen",  # 3 row(s), first r01
    "filter_between_inclusive",  # 3 row(s), first r01
    "probe_bounds_date",  # 3 row(s), first r01
    "probe_bounds_int",  # 3 row(s), first r01
    "sk_hyphen",  # 3 row(s), first r01
    "sk_concat",  # 3 row(s), first r01
    "quality_check_dates",  # 3 row(s), first r01
    "dedup_latest_per_key",  # 3 row(s), first r01
    "agg_pricing_summary",  # 3 row(s), first r01
    "join_revenue_by_nation",  # 3 row(s), first r01
    "topk_orders_per_customer",  # 3 row(s), first r01
    "text_token_stats",  # 3 row(s), first r01
    "text_quality_score",  # 3 row(s), first r01
    "text_language_id",  # 3 row(s), first r01
    "text_fingerprint",  # 3 row(s), first r01
    "dedup_exact",  # 3 row(s), first r01
    "dedup_ngram_jaccard",  # 3 row(s), first r01
    "dedup_minhash_lsh",  # 3 row(s), first r01
    "dedup_simhash",  # 3 row(s), first r01
    "dedup_embedding_cosine",  # 3 row(s), first r01
    "dedup_cluster_keep",  # 3 row(s), first r01
    "ann_cosine_topk",  # 3 row(s), first r01
    "mm_frame_sample",  # 3 row(s), first r01
    "stream_windowed_counts",  # 3 row(s), first r01
    "corpus_clean_pipeline",  # 3 row(s), first r01
    "chunk_documents_windows",  # 3 row(s), first r01
    "scrub_pii_text",  # 3 row(s), first r01
    "vocab_top_terms",  # 3 row(s), first r01
    "tfidf_top_terms",  # 3 row(s), first r01
    "sample_stratified_hash",  # 3 row(s), first r01
    "stream_click_attribution",  # 3 row(s), first r01
    "dedup_incremental_batch",  # 3 row(s), first r01
    "text_repetition_signals",  # 3 row(s), first r01
    "dedup_chunks_exact",  # 3 row(s), first r01
    "set_ops_users",  # 3 row(s), first r01
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
