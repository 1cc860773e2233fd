"""Tiny-SF robustness: ratio/accuracy queries must stay oracle-exact at
sf0.001, where groups are ~200 rows and bands/buckets go empty.

Round 6's full sf0.001 sweep caught two latent landmines the sf0.01
gate never sees: an ANSI divide-by-zero on an empty PSI band, and an
approx-percentile value gate that is meaningless below ~1000 rows/group
(p99 sits between the top two order statistics). This test pins the
fixes by re-running the DuckDB comparison for the division/accuracy-
gate family at sf0.001 — the queries most likely to regress when
someone edits a ratio without guarding the empty case.

(The full sweep lives in `scripts/oracle_check.py /root/testdata/sf0.001`;
this covers the fragile family at suite speed.)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

FRAGILE = [
    "psi_order_price_drift",      # empty band -> guarded zero term
    "agg_approx_stats",           # percentile gates vacuous below 1000 rows/group
    "agg_approx_accuracy",
    "mixture_kl_by_source",       # KL over sparse language mix
    "clustering_coefficient_parts",  # integer division over small wedge counts
    "regression_price_vs_quantity",  # OLS denominators
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.001 testdata absent")
@pytest.mark.parametrize("name", FRAGILE)
def test_fragile_query_exact_at_sf0001(spark, duck, name):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.oracle_check import frame_fingerprint

    from etl_complete_with_spark_spark.queries import ORACLE, QUERIES

    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(ORACLE[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    sh, sn = frame_fingerprint(sdf)
    dh, dn = frame_fingerprint(ddf)
    assert sn == dn, f"{name}: rowcount {sn} != {dn}"
    assert sh == dh, f"{name}: value hash mismatch at sf0.001"
