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
    df: DataFrame, key_col: str = "user_id", ts_col: str = "ts", val_col: str = "value"
) -> DataFrame:
    """Per-key robust stats via applyInPandas -> (user_id, n, median_value,
    mad_value, trend).

    median/MAD: exact interpolated medians, rounded to 4 decimals.
    trend: OLS slope of value against hours-since-first-event (centered x
    keeps the normal-equation arithmetic stable and cross-engine
    comparable; single-event groups -> 0.0).
    """
    import numpy as np
    import pandas as pd

    def stats(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v = pdf[val_col].to_numpy(dtype="float64")
        m = float(np.median(v))
        mad = float(np.median(np.abs(v - m)))
        x = pdf[ts_col].astype("int64").to_numpy(dtype="float64") / 3.6e12  # ns -> hours
        xc = x - x.mean()
        den = float((xc * xc).sum())
        trend = float((xc * (v - v.mean())).sum() / den) if den > 0 else 0.0
        return pd.DataFrame(
            {
                "user_id": [int(pdf[key_col].iloc[0])],
                "n": [len(v)],
                "median_value": [round(m, 4)],
                "mad_value": [round(mad, 4)],
                "trend": [round(trend, 4)],
            }
        )

    cols = {key_col: "user_id", ts_col: ts_col, val_col: val_col}
    sel = df.select(*[F.col(c).alias(a) for c, a in cols.items()])
    return sel.groupBy("user_id").applyInPandas(stats, schema=_SCHEMA)


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
