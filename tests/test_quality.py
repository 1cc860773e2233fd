"""Data-quality expectations: violation counting, uniqueness, FK audits."""

from __future__ import annotations

from etl_complete_with_spark_spark.operators import quality as Q


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 50.0, "OK"),
            (2, -5.0, "OK"),      # range violation
            (None, 10.0, "OK"),   # null id
            (4, None, "bad!"),    # null price passes range; pattern violation
            (4, 2000.0, "OK"),    # dupe id + range violation
        ],
        "id long, price double, status string",
    )


class TestRunChecks:
    def test_counts_and_rates(self, spark):
        out = Q.run_checks(
            _df(spark),
            [Q.not_null("id"), Q.in_range("price", 0.0, 1000.0), Q.matches("status", "^[A-Z]+$")],
        )
        rows = {r.check_name: r for r in out.collect()}
        assert rows["id_not_null"].n_violations == 1
        assert rows["price_in_range"].n_violations == 2  # -5 and 2000; NULL passes
        assert rows["status_matches"].n_violations == 1
        assert all(r.n_rows == 5 for r in rows.values())
        assert rows["id_not_null"].violation_rate_bp == 2000  # floor(1/5 * 10000)

    def test_single_aggregation_pass(self, spark):
        from etl_complete_with_spark_spark import plans as P

        out = Q.run_checks(_df(spark), [Q.not_null("id"), Q.in_range("price", 0.0, 1.0)])
        # all checks ride one aggregate: no per-check scans
        assert P.physical_plan(out).count("Scan") <= 1


class TestKeysAndFks:
    def test_unique_key(self, spark):
        dupes = Q.unique_key(_df(spark), ["id"]).collect()
        assert [(r.id, r.n_dupes) for r in dupes] == [(4, 2)]

    def test_fk_violations(self, spark):
        child = spark.createDataFrame([(1,), (2,), (None,), (9,)], "k long")
        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
        out = Q.fk_violations(child, "k", parent, "pk").collect()
        assert [r.k for r in out] == [9]  # NULL keys are not violations
