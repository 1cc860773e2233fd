"""Exactness contract for the money-sum discipline (queries.sum_money).

r13 shipped the half-cent tie offset on a DOUBLE sum, which silently
capped exactness at 2^53 e4-units (~$900B/group at unit=10000) — ~1000x
under the long-overflow envelope rev_e4's docstring advertises (r13
ADVICE / r13 VERDICT order 1). The fix resolves the tie in decimal(38,0)
integer space; these tests feed a synthetic group total ABOVE 2^53 that
sits exactly on a half-cent and assert both engines land the same exact
cent — and that the old double arithmetic would not have.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.queries import money_sum_sql, sum_money

# Two longs summing to 18_014_398_509_482_050 e4-units: above 2^54 the
# double grid steps by 4, and ...050 % 4 == 2, so the TOTAL is not
# double-representable — the nearest doubles are ...048 and ...052. The
# total is k/2 past a whole cent (k=100 e4-units per cent), i.e. an
# exact half-cent tie: correct tie-toward-+inf resolution lands
# 180_143_985_094_821 cents = $1,801,439,850,948.21.
HALF = 9_007_199_254_741_025
TOTAL = 2 * HALF
EXACT_CENTS = (TOTAL + 50) // 100
EXACT_DOLLARS = 1801439850948.21


class TestBeyond2to53:
    def test_constants_are_what_the_docstring_claims(self):
        assert TOTAL == 18_014_398_509_482_050
        assert TOTAL > 2**53
        assert TOTAL % 4 == 2  # not representable above 2^54
        assert TOTAL % 100 == 50  # exact half-cent tie
        assert EXACT_CENTS * 100 - 50 == TOTAL
        assert EXACT_CENTS == 180_143_985_094_821

    def test_spark_exact_cent_beyond_double_grid(self, spark):
        df = spark.createDataFrame([(HALF,), (HALF,)], "e4 long")
        got = df.agg(sum_money(F.col("e4")).alias("d")).collect()[0]["d"]
        assert got == EXACT_DOLLARS

    def test_duckdb_twin_exact_cent_beyond_double_grid(self):
        con = duckdb.connect()
        con.sql(
            f"CREATE TABLE t AS SELECT * FROM (VALUES ({HALF}), ({HALF})) v(e4)"
        )
        got = con.sql(f"SELECT {money_sum_sql('e4')} AS d FROM t").fetchone()[0]
        assert got == EXACT_DOLLARS

    def test_old_double_offset_actually_loses_the_cent(self):
        # The regression this file pins: r13's double-space offset (the
        # exact SQL money_sum_sql used to emit) maps the same total one
        # cent low, because the double grid swallows the +50 half-cent
        # offset above 2^53. (A pure-Python float emulation does NOT
        # reproduce this — CPython's single rounding at float(TOTAL)
        # happens to land the right side of the tie; the engines'
        # HUGEINT->DOUBLE cast inside the sum does not.)
        con = duckdb.connect()
        con.sql(
            f"CREATE TABLE t AS SELECT * FROM (VALUES ({HALF}), ({HALF})) v(e4)"
        )
        old_sql = (
            "round(floor((CAST(sum(e4) AS DOUBLE) + 50) / 100) / 100.0, 2)"
        )
        old = con.sql(f"SELECT {old_sql} AS d FROM t").fetchone()[0]
        assert old != EXACT_DOLLARS
        # one cent apart (double spacing at this magnitude is ~0.000244,
        # so the comparison needs a loose-but-sub-cent tolerance)
        assert abs(old - EXACT_DOLLARS) == pytest.approx(0.01, abs=1e-3)

    def test_charge_unit_1e6_same_discipline(self, spark):
        # unit=1e6 (the charge form): k=10000, half-tie at +5000.
        total = TOTAL * 100 + 5000  # still sums from two longs
        a, b = total // 2, total - total // 2
        df = spark.createDataFrame([(a,), (b,)], "e6 long")
        got = df.agg(sum_money(F.col("e6"), unit=1e6).alias("d")).collect()[0]["d"]
        exact = ((total + 5000) // 10000) / 100.0
        assert got == round(exact, 2)
        con = duckdb.connect()
        con.sql(f"CREATE TABLE t AS SELECT * FROM (VALUES ({a}), ({b})) v(e6)")
        dd = con.sql(
            f"SELECT {money_sum_sql('e6', unit=1e6)} AS d FROM t"
        ).fetchone()[0]
        assert dd == got


class TestSignParity:
    """Spark floor(decimal) floors toward -inf; DuckDB ``//`` truncates.
    money_sum_sql spells floor-div as (x - nonneg_mod) // k so both
    engines agree for ANY sign, as sum_money's docstring promises."""

    @pytest.mark.parametrize("total_e4", [-150, -151, -50, -10050, 150, 149])
    def test_negative_and_tie_totals_agree(self, spark, total_e4):
        df = spark.createDataFrame([(total_e4,)], "e4 long")
        got = df.agg(sum_money(F.col("e4")).alias("d")).collect()[0]["d"]
        con = duckdb.connect()
        con.sql(f"CREATE TABLE t AS SELECT {total_e4}::BIGINT AS e4")
        dd = con.sql(f"SELECT {money_sum_sql('e4')} AS d FROM t").fetchone()[0]
        assert dd == got
        # and both match the reference semantics: floor((x+50)/100) cents
        import math

        exact = math.floor((total_e4 + 50) / 100) / 100.0
        assert got == round(exact, 2)


class TestAnsiPinned:
    """r13 VERDICT order 2: the loud-overflow guarantee must be pinned
    config, not an inherited Spark 4.x default."""

    def test_session_factory_pins_ansi(self, spark):
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    def test_long_sum_overflow_raises_not_wraps(self, spark):
        df = spark.createDataFrame([(2**62,), (2**62,)], "e4 long")
        with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
            df.agg(F.sum("e4")).collect()


class TestRoundRatio:
    """r14 policy extension: round(ratio-of-integers, k) feeding a
    cross-engine hash must round in integer space — the real engines
    provably diverge on e.g. 57/800 = 0.07125 (Spark HALF_UP on the
    decimal repr -> 0.0713; DuckDB rounds the binary double, which sits
    under the tie -> 0.0712). operators/ratio.round_ratio and its SQL
    twin resolve the tie identically in integer arithmetic."""

    def test_engines_diverge_on_the_raw_double_round(self, spark):
        import duckdb
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(57, 800)], "p long, q long")
        sp = df.select(
            F.round(F.col("p") * 1.0 / F.col("q"), 4).alias("v")
        ).collect()[0]["v"]
        con = duckdb.connect()
        dd = con.sql("SELECT round(57 * 1.0 / 800, 4)").fetchone()[0]
        assert sp == 0.0713 and dd == 0.0712  # the disease this file pins

    @pytest.mark.parametrize(
        "p,q,digits",
        [
            (57, 800, 4),    # non-representable tie, double below it
            (13, 32, 4),     # representable tie
            (113, 800, 4),   # the order_price_distribution shape
            (1, 3, 4),       # non-terminating
            (0, 7, 4),       # zero
            (7, 7, 4),       # exactly 1
            (12345, 200, 2), # avg-seconds shape, 2dp tie (61.725)
            (5, 8192, 4),    # minhash agree/num_hashes shape
            # Signed numerators (r15, VERDICT r14 order 6): the SQL twin
            # must FLOOR like the Column form's pmod, not truncate like
            # a bare DuckDB `//` — e.g. a signed delta average without
            # its >= 0 filter. Ties resolve toward +inf on both signs.
            (-57, 800, 4),   # negative mirror of the disease case
            (-1, 3, 4),      # negative non-terminating
            (-7, 2, 4),      # negative exact half (tie at -3.5)
            (-12345, 200, 2),# negative 2dp tie (-61.725 -> -61.72)
        ],
    )
    def test_round_ratio_matches_twin_and_halfup(self, spark, p, q, digits):
        import duckdb
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.operators.ratio import (
            round_ratio,
            round_ratio_sql,
        )

        df = spark.createDataFrame([(p, q)], "p long, q long")
        got = df.select(
            round_ratio(F.col("p"), F.col("q"), digits).alias("v")
        ).collect()[0]["v"]
        con = duckdb.connect()
        dd = con.sql(
            f"SELECT {round_ratio_sql(str(p), str(q), digits)} AS v"
        ).fetchone()[0]
        s = 10**digits
        # Python int // is floor division, exact at any magnitude — the
        # true round-half-up(p/q, digits), ties toward +inf, any sign
        exact = ((2 * s * p + q) // (2 * q)) / s
        assert got == dd == exact

    def test_corpus_scale_numerator_stays_exact(self, spark):
        # avg-seconds over ~1e9 users: p ~ 4.6e16 at digits=2 is inside
        # the LONG envelope (2*100*p + q < 2^63) and must stay exact —
        # the r14 first-cut double-floor implementation lost exactness
        # past 2^53 / 200.
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.operators.ratio import round_ratio

        p, q = 2**55 + 1, 3  # numerator 200*p+q ~ 7.2e18, < 2^63
        df = spark.createDataFrame([(p, q)], "p long, q long")
        got = df.select(round_ratio(F.col("p"), F.col("q"), 2).alias("v")).collect()[
            0
        ]["v"]
        exact = ((200 * p + q) // (2 * q)) / 100.0
        assert got == exact
