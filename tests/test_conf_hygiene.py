"""Session-conf hygiene: queries must not leak conf mutations.

r14 VERDICT order 3 / ADVICE: ``order_burst_components`` raises the
recursive-CTE runaway row cap (``spark.sql.cteRecursionRowLimit``) to
match its input cardinality — necessary, because the cap is a TOTAL-row
guard and the recursion legitimately emits every order once — but the
r14 form left the raised cap set on the session, weakening the guard
for every later recursive query (and the ``max()`` ratcheted it upward
monotonically). The query now materializes inside a save/restore; these
tests pin that the conf is bit-identical before and after, in both the
default-cap and custom-cap session states.
"""

from __future__ import annotations

import pytest

from etl_complete_with_spark_spark.queries import QUERIES

KEY = "spark.sql.cteRecursionRowLimit"


def _run(spark, sf_dir):
    df = QUERIES["order_burst_components"](spark, sf_dir)
    assert df.count() > 0
    return df


class TestRecursionCapRestored:
    def test_cap_unchanged_after_query(self, spark, sf_dir):
        before = spark.conf.get(KEY)
        _run(spark, sf_dir)
        assert spark.conf.get(KEY) == before

    def test_custom_cap_survives(self, spark, sf_dir):
        """A user-set cap (lower OR higher than the query's need) must be
        back in force after the query returns — the r14 ratchet would
        have replaced a 9M cap with max(1M, 2*edges) on a small input."""
        before = spark.conf.get(KEY)
        try:
            spark.conf.set(KEY, "9000000")
            _run(spark, sf_dir)
            assert spark.conf.get(KEY) == "9000000"
        finally:
            spark.conf.set(KEY, before)

    def test_restore_runs_on_failure(self, spark, sf_dir):
        """The restore is in a finally: a failure while building the
        recursion must not strand the raised cap either."""
        before = spark.conf.get(KEY)
        with pytest.raises(Exception):
            QUERIES["order_burst_components"](spark, "/nonexistent-sf-dir")
        assert spark.conf.get(KEY) == before
