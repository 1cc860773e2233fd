"""Driver-contract invariants for __spark_entry__.

The driver's correctness gate samples the FIRST 50 entries of ``queries()``
— these tests pin the curated priority window (one representative per
COVERAGE.md operator family) and the catalog-wide naming rules the gate
relies on (matching oracle keys, no array-typed result cells is covered by
oracle_check itself).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_complete_with_spark_spark.queries import ORACLE, QUERIES  # noqa: E402


def test_priority_window_is_50_known_queries():
    assert len(entry.PRIORITY_WINDOW) == 50
    assert len(set(entry.PRIORITY_WINDOW)) == 50
    missing = [n for n in entry.PRIORITY_WINDOW if n not in QUERIES]
    assert not missing, f"priority window names not in catalog: {missing}"


def test_queries_dict_leads_with_priority_window():
    q = entry.queries()
    assert list(q)[:50] == entry.PRIORITY_WINDOW
    assert len(q) == len(QUERIES)  # reordered, never dropped


def test_priority_window_follows_rotation_policy():
    """Round-5 rotation (COVERAGE.md policy): the two flagship rows stay
    pinned, and every catalog query with NO green row in any prior
    CORRECTNESS artifact (the r01∪r02∪r03∪r04 union left exactly these
    21) is in the window, driving the all-time driver-green union to
    162/162 — external proof for the complete catalog."""
    window = set(entry.PRIORITY_WINDOW)
    assert {"pipeline_work_to_trusted", "jdbc_resync_orders"} <= window

    never_recorded = {
        # entity resolution / text similarity
        "golden_record_parts", "sparse_tfidf_cosine_pairs",
        "top_event_trigrams", "item_cooccurrence_similarity",
        # custom Python DataSource
        "pyds_synthetic_rollup",
        # drift / stats / forecasting
        "mixture_kl_by_source", "psi_order_price_drift",
        "regression_price_vs_quantity", "time_to_purchase_stats",
        "forecast_eval_seasonal_naive",
        # robust stats (exact twin + sampled 100 TB path)
        "robust_outlier_prices", "robust_outlier_prices_sampled",
        # iterative graph suite
        "hits_customer_supplier", "kcore_coorder_parts",
        "bfs_coorder_parts", "clustering_coefficient_parts",
        "lpa_communities_parts",
        # incremental view maintenance
        "incremental_rollup_orders", "stream_incremental_rollup",
        # sessionization / market basket
        "debounce_events", "association_rules_parts",
    }
    assert never_recorded <= window, f"missing: {never_recorded - window}"


def test_every_priority_query_has_an_oracle():
    """Everything in the driver's sampled window must get the strong
    (hash-match) check, including ann_ivf_topk as of round 3. The only
    tolerated exception is ann_ivf when the gate-SF parquet is unreadable
    at import (the oracle builder returns None -> rows-only fallback)."""
    no_oracle = [n for n in entry.PRIORITY_WINDOW if n not in ORACLE]
    assert no_oracle in ([], ["ann_ivf_topk"]), no_oracle
    if not os.environ.get("CI_NO_TESTDATA"):
        assert "ann_ivf_topk" in ORACLE


def test_oracle_sql_keys_subset_of_queries():
    o = entry.oracle_sql()
    q = entry.queries()
    assert set(o) <= set(q)
    # ordered consistently with queries() so the driver pairs them 1:1
    order = {n: i for i, n in enumerate(q)}
    keys = list(o)
    assert keys == sorted(keys, key=order.__getitem__)
