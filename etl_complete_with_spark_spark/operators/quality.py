"""Declarative data-quality checks (expectations) over DataFrames.

The reference hard-codes one quality rule (null-out sub-year-10 dates,
reference: shared_etls/etls/utils.py date handling); this generalizes it
into an expectations surface: each check is a named boolean expression,
and one aggregation pass computes every violation count — no per-check
scans, no driver-side row loops. The FK (referential-integrity) check is
a broadcast anti-join counted in the same style.

At 100 TB: all row-level checks fold into ONE scan (conditional sums are
free riders on whatever aggregation already runs); FK checks broadcast
the (small) key side or fall back to a shuffled anti-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A named expectation: ``predicate`` is TRUE for GOOD rows."""

    name: str
    predicate: Column


def not_null(col: str) -> Check:
    return Check(f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Check:
    """NULLs pass (pair with not_null to reject them)."""
    c = F.col(col)
    return Check(f"{col}_in_range", c.isNull() | ((c >= F.lit(lo)) & (c <= F.lit(hi))))


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(f"{col}_matches", c.isNull() | c.rlike(pattern))


def unique_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keys appearing more than once -> (key cols..., n_dupes)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_dupes"))
        .filter(F.col("n_dupes") > 1)
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One pass -> (check_name, n_rows, n_violations, violation_rate_bp).

    Rate is integer basis points (floor), exact across engines — see the
    money-rounding note in queries.py's orders_above_customer_avg.
    """
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(c.predicate, 0).otherwise(1)).alias(c.name)
            for c in checks
        ],
    )
    stacked = agg.selectExpr(
        "n_rows",
        "stack({}, {}) AS (check_name, n_violations)".format(
            len(checks), ", ".join(f"'{c.name}', {c.name}" for c in checks)
        ),
    )
    return stacked.select(
        "check_name",
        "n_rows",
        "n_violations",
        F.floor(F.col("n_violations") * 10000 / F.col("n_rows")).alias("violation_rate_bp"),
    )


def fk_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose key has no parent (anti-join; parent side
    broadcast when small). NULL child keys are not FK violations."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return (
        child.filter(F.col(child_key).isNotNull())
        .join(F.broadcast(keys), child_key, "left_anti")
    )
