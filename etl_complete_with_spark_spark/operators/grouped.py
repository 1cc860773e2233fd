"""Grouped Arrow-batched Python stages (``applyInPandas``).

The grouped complement to the ``mapInPandas`` operators in
``multimodal.py``: Spark shuffles rows by key, hands each whole group to
Python as ONE pandas DataFrame (Arrow transfer, no per-row overhead),
and the function returns a result frame matching a declared schema.

Use this shape only where built-in aggregates genuinely can't express
the per-group computation (model fits, per-entity algorithms); for
anything SQL-expressible the JVM path wins. ``grouped_robust_stats``
below IS SQL-expressible on purpose — its output is verified exactly
against both the built-in expression twin (``robust_stats_expr``) and a
DuckDB oracle, pinning the applyInPandas plumbing (schema, grouping,
Arrow round-trip, float semantics) with an exact cross-check, the same
twin-verification pattern as the BLAS paths in ``similarity.py``.

Scale note: one group must fit in one executor's memory as a pandas
frame. Keys here are users (bounded activity); for unbounded keys,
pre-aggregate or sessionize first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = (
    "user_id bigint, n bigint, median_value double, mad_value double, trend double"
)


def grouped_robust_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    coarse_buckets: int = 64,
) -> DataFrame:
    """Per-key robust stats via applyInPandas -> (user_id, n, median_value,
    mad_value, trend).

    median/MAD: exact interpolated medians, rounded to 4 decimals.
    trend: OLS slope of value against hours-since-first-event (centered x
    keeps the normal-equation arithmetic stable and cross-engine
    comparable; single-event groups -> 0.0).

    TWO-LEVEL grouping: Spark groups by ``pmod(hash(key), coarse_buckets)``
    — a few large Arrow batches instead of one per key — and a vectorized
    pandas ``groupby`` inside computes the per-key stats. applyInPandas
    pays a fixed per-GROUP Arrow/worker round-trip (~ms); grouping a
    billion-key table by the raw key makes that the whole runtime, while
    the per-key semantics here are preserved exactly because hash
    bucketing colocates every row of a key. 1500 keys at sf0.1:
    ~5s -> ~1s; at 1e9 keys it is the difference between a Python stage
    that works and one that never finishes.
    """
    import pandas as pd

    def stats(pdf: "pd.DataFrame") -> "pd.DataFrame":
        g = pdf.groupby("user_id", sort=False)
        med = g["v"].median()
        n = g.size()
        m = pdf.merge(med.rename("med"), left_on="user_id", right_index=True)
        mad = (m["v"] - m["med"]).abs().groupby(m["user_id"], sort=False).median()
        x = pdf["t"].astype("int64") / 3.6e12  # ns -> hours
        xc = x - x.groupby(pdf["user_id"]).transform("mean")
        vc = pdf["v"] - g["v"].transform("mean")
        num = (xc * vc).groupby(pdf["user_id"], sort=False).sum()
        den = (xc * xc).groupby(pdf["user_id"], sort=False).sum()
        trend = (num / den).where(den > 0, 0.0)
        out = pd.DataFrame(
            {
                "user_id": med.index.astype("int64"),
                "n": n.reindex(med.index).astype("int64"),
                "median_value": med.round(4),
                "mad_value": mad.reindex(med.index).round(4),
                "trend": trend.reindex(med.index).round(4),
            }
        )
        return out.reset_index(drop=True)

    sel = df.select(
        F.col(key_col).alias("user_id"),
        F.col(ts_col).alias("t"),
        F.col(val_col).alias("v"),
    )
    bucket = F.pmod(F.hash("user_id"), F.lit(coarse_buckets))
    return sel.groupBy(bucket.alias("__b")).applyInPandas(stats, schema=_SCHEMA)


def robust_stats_expr(
    df: DataFrame, key_col: str = "user_id", ts_col: str = "ts", val_col: str = "value"
) -> DataFrame:
    """Built-in-aggregate twin of :func:`grouped_robust_stats` (JVM path:
    exact median + regr_slope, two aggregation passes for the MAD)."""
    key = F.col(key_col).alias("user_id")
    x_hours = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(3.6e9)
    # two-pass: per-group median + mean(x) first, so the slope runs on
    # CENTERED x (hours-from-group-mean) — numerically comparable across
    # engines, unlike hours-since-1970 whose magnitude eats the variance
    pre = df.groupBy(F.col(key_col).alias("__key")).agg(
        F.median(val_col).alias("med"), F.avg(x_hours).alias("xbar")
    )
    return (
        df.join(pre, F.col(key_col) == F.col("__key"))
        .drop("__key")
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("med"), 4).alias("median_value"),
            F.round(F.median(F.abs(F.col(val_col) - F.col("med"))), 4).alias("mad_value"),
            F.round(
                F.coalesce(
                    F.regr_slope(F.col(val_col), x_hours - F.col("xbar")), F.lit(0.0)
                ),
                4,
            ).alias("trend"),
        )
    )
