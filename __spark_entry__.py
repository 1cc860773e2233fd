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
WINDOW_GENERATED_AFTER = 14
PRIORITY_WINDOW: list[str] = [
    "pipeline_work_to_trusted",  # pinned
    "jdbc_resync_orders",  # pinned
    "dedup_ngram_jaccard",  # 4 row(s), first r01
    "dedup_minhash_lsh",  # 4 row(s), first r01
    "dedup_simhash",  # 4 row(s), first r01
    "dedup_embedding_cosine",  # 4 row(s), first r01
    "dedup_cluster_keep",  # 4 row(s), first r01
    "ann_cosine_topk",  # 4 row(s), first r01
    "mm_frame_sample",  # 4 row(s), first r01
    "stream_windowed_counts",  # 4 row(s), first r01
    "corpus_clean_pipeline",  # 4 row(s), first r01
    "chunk_documents_windows",  # 4 row(s), first r01
    "scrub_pii_text",  # 4 row(s), first r01
    "vocab_top_terms",  # 4 row(s), first r01
    "tfidf_top_terms",  # 4 row(s), first r01
    "sample_stratified_hash",  # 4 row(s), first r01
    "stream_click_attribution",  # 4 row(s), first r01
    "dedup_incremental_batch",  # 4 row(s), first r01
    "text_repetition_signals",  # 4 row(s), first r01
    "dedup_chunks_exact",  # 4 row(s), first r01
    "set_ops_users",  # 4 row(s), first r01
    "cube_revenue",  # 4 row(s), first r01
    "distinct_users_per_type",  # 4 row(s), first r01
    "pivot_user_event_matrix",  # 4 row(s), first r01
    "sessionize_batch",  # 4 row(s), first r01
    "asof_join_last_purchase",  # 4 row(s), first r01
    "grouped_user_stats",  # 4 row(s), first r01
    "range_join_event_windows",  # 4 row(s), first r01
    "skew_salted_join",  # 4 row(s), first r01
    "agg_quantiles",  # 4 row(s), first r01
    "json_extract_props",  # 4 row(s), first r01
    "ann_lsh_topk",  # 4 row(s), first r02
    "mm_extract_features",  # 4 row(s), first r02
    "emb_quantize_int8",  # 4 row(s), first r02
    "emb_gram_int8",  # 4 row(s), first r02
    "ann_int8_topk",  # 4 row(s), first r02
    "emb_label_centroids",  # 4 row(s), first r02
    "text_unigram_lm_score",  # 4 row(s), first r02
    "stream_dedup_events",  # 4 row(s), first r02
    "table_profile_orders",  # 4 row(s), first r02
    "dedup_semantic_cluster",  # 4 row(s), first r02
    "pack_training_shards",  # 4 row(s), first r02
    "fuzzy_match_part_names",  # 4 row(s), first r02
    "jsonl_roundtrip_orders",  # 4 row(s), first r02
    "ann_ivf_topk",  # 4 row(s), first r03
    "decontaminate_ngram_overlap",  # 4 row(s), first r03
    "sample_token_budget_mix",  # 4 row(s), first r03
    "stream_static_enrich",  # 4 row(s), first r03
    "orc_roundtrip_orders",  # 4 row(s), first r03
    "udtf_token_runs",  # 4 row(s), first r03
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
