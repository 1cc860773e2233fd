"""Session-conf hygiene + the order_burst_components rewrite contract.

History: the r14 form of ``order_burst_components`` raised the
recursive-CTE runaway row cap (``spark.sql.cteRecursionRowLimit``) and
leaked it session-globally; r15 scoped the raise inside a save/restore;
r16 (VERDICT r15 order 7) replaced the WITH RECURSIVE executor with a
level-synchronous join loop that needs no cap at all. These tests pin
both halves of that story:

- the conf-hygiene pins survive as regression guards: the query must
  never touch ``cteRecursionRowLimit`` again (a reintroduced recursive
  form that forgot the save/restore would trip them exactly like the
  r14 leak did);
- the recursive-CTE formulation lives on HERE as a value-asserted twin,
  so the suite still exercises Spark 4's recursive-CTE executor and
  proves the level-sync loop computes the identical fixpoint.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.queries import QUERIES, load

KEY = "spark.sql.cteRecursionRowLimit"


def _run(spark, sf_dir):
    df = QUERIES["order_burst_components"](spark, sf_dir)
    assert df.count() > 0
    return df


def _recursive_cte_twin(spark, sf_dir):
    """The pre-r16 WITH RECURSIVE formulation, kept verbatim as the
    executor-semantics pin (including its scoped row-cap raise)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").alias("d"),
            F.lag("o_orderdate").over(w).alias("pd"),
            F.lag("o_orderkey").over(w).alias("pk"),
        )
        .localCheckpoint()
    )
    edges.createOrReplaceTempView("rec_edges_twin")
    prev_cap = spark.conf.get(KEY, None)
    spark.conf.set(KEY, str(max(1_000_000, 2 * edges.count())))
    try:
        return spark.sql(
            """
            WITH RECURSIVE chain (c, k, d, root) AS (
                SELECT c, k, d, k AS root FROM rec_edges_twin
                WHERE pd IS NULL OR datediff(d, pd) > 30
                UNION ALL
                SELECT e.c, e.k, e.d, chain.root
                FROM rec_edges_twin e
                JOIN chain ON e.c = chain.c AND e.pk = chain.k
                WHERE e.pd IS NOT NULL AND datediff(e.d, e.pd) <= 30
            )
            SELECT c AS o_custkey, CAST(root AS BIGINT) AS burst_id,
                   count(*) AS n_orders,
                   CAST(CAST(min(d) AS TIMESTAMP) AS STRING) AS burst_start,
                   CAST(CAST(max(d) AS TIMESTAMP) AS STRING) AS burst_end
            FROM chain GROUP BY c, root
            """
        ).localCheckpoint()
    finally:
        if prev_cap is None:
            spark.conf.unset(KEY)
        else:
            spark.conf.set(KEY, prev_cap)


class TestRecursionCapUntouched:
    def test_cap_unchanged_after_query(self, spark, sf_dir):
        before = spark.conf.get(KEY)
        _run(spark, sf_dir)
        assert spark.conf.get(KEY) == before

    def test_custom_cap_survives(self, spark, sf_dir):
        """A user-set cap must be in force untouched after the query —
        the level-sync form has no business near the conf at all."""
        before = spark.conf.get(KEY)
        try:
            spark.conf.set(KEY, "9000000")
            _run(spark, sf_dir)
            assert spark.conf.get(KEY) == "9000000"
        finally:
            spark.conf.set(KEY, before)

    def test_failure_leaves_conf_alone(self, spark, sf_dir):
        before = spark.conf.get(KEY)
        with pytest.raises(Exception):
            QUERIES["order_burst_components"](spark, "/nonexistent-sf-dir")
        assert spark.conf.get(KEY) == before


class TestLevelSyncMatchesRecursiveCte:
    def test_row_identical_fixpoint(self, spark, sf_dir):
        """The r16 level-synchronous loop must compute exactly the
        recursive-CTE executor's fixpoint (row multiset equality both
        ways — schema equality is implied by exceptAll accepting the
        pair)."""
        loop = QUERIES["order_burst_components"](spark, sf_dir)
        cte = _recursive_cte_twin(spark, sf_dir)
        assert loop.exceptAll(cte).count() == 0
        assert cte.exceptAll(loop).count() == 0
        assert loop.count() > 0
