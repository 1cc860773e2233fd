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
# Round-8 window (VERDICT r7 order 3): `ann_ivf_topk_distributed` — the
# only catalog query with a single driver-green record after r7 — takes
# slot 3 for its second record; the remaining 47 slots go to the
# 2-record queries, earliest-recorded round first per the committed
# policy (registration order as the tiebreak), resuming steady-state
# evidence accrual across the 165-query catalog (every query >= 2
# records as of r7; the union stays 165/165).
#
# WINDOW_GENERATED_AFTER stamps the newest CORRECTNESS artifact this window
# was computed from (scripts/rotate_window.py prints it alongside the
# list).  tests/test_entry_contract.py replays the rotation policy against
# artifacts with round <= this stamp ONLY, so the driver writing the
# CURRENT round's artifact — which happens before every judging pass — no
# longer trips the contract test (round-6 VERDICT order 1).
WINDOW_GENERATED_AFTER = 7
PRIORITY_WINDOW: list[str] = [
    "pipeline_work_to_trusted",  # pinned
    "jdbc_resync_orders",  # pinned
    "ann_ivf_topk_distributed",  # 1 row(s), first r07
    "sk_hyphen",  # 2 row(s), first r01
    "dedup_latest_per_key",  # 2 row(s), first r01
    "agg_pricing_summary",  # 2 row(s), first r01
    "join_revenue_by_nation",  # 2 row(s), first r01
    "topk_orders_per_customer",  # 2 row(s), first r01
    "text_token_stats",  # 2 row(s), first r01
    "text_quality_score",  # 2 row(s), first r01
    "text_language_id",  # 2 row(s), first r01
    "text_fingerprint",  # 2 row(s), first r01
    "dedup_exact",  # 2 row(s), first r01
    "dedup_ngram_jaccard",  # 2 row(s), first r01
    "dedup_simhash",  # 2 row(s), first r01
    "dedup_embedding_cosine",  # 2 row(s), first r01
    "dedup_cluster_keep",  # 2 row(s), first r01
    "ann_cosine_topk",  # 2 row(s), first r01
    "mm_frame_sample",  # 2 row(s), first r01
    "stream_windowed_counts",  # 2 row(s), first r01
    "corpus_clean_pipeline",  # 2 row(s), first r01
    "chunk_documents_windows",  # 2 row(s), first r01
    "scrub_pii_text",  # 2 row(s), first r01
    "vocab_top_terms",  # 2 row(s), first r01
    "tfidf_top_terms",  # 2 row(s), first r01
    "sample_stratified_hash",  # 2 row(s), first r01
    "stream_click_attribution",  # 2 row(s), first r01
    "dedup_incremental_batch",  # 2 row(s), first r01
    "text_repetition_signals",  # 2 row(s), first r01
    "dedup_chunks_exact",  # 2 row(s), first r01
    "set_ops_users",  # 2 row(s), first r01
    "cube_revenue",  # 2 row(s), first r01
    "distinct_users_per_type",  # 2 row(s), first r01
    "pivot_user_event_matrix",  # 2 row(s), first r01
    "sessionize_batch",  # 2 row(s), first r01
    "asof_join_last_purchase",  # 2 row(s), first r01
    "grouped_user_stats",  # 2 row(s), first r01
    "range_join_event_windows",  # 2 row(s), first r01
    "skew_salted_join",  # 2 row(s), first r01
    "agg_quantiles",  # 2 row(s), first r01
    "json_extract_props",  # 2 row(s), first r01
    "ann_lsh_topk",  # 2 row(s), first r02
    "mm_extract_features",  # 2 row(s), first r02
    "emb_quantize_int8",  # 2 row(s), first r02
    "emb_gram_int8",  # 2 row(s), first r02
    "ann_int8_topk",  # 2 row(s), first r02
    "emb_label_centroids",  # 2 row(s), first r02
    "text_unigram_lm_score",  # 2 row(s), first r02
    "stream_dedup_events",  # 2 row(s), first r02
    "table_profile_orders",  # 2 row(s), first r02
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
