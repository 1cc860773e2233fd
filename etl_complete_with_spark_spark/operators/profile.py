"""One-pass table profiling: per-column null / distinct counts.

The data-quality sibling of `operators/quality.py` (assertions) and
`operators/skew.py` (key distribution): a cheap structural profile a
pipeline runs on every new ingest to catch schema drift (a column going
all-null, a key losing uniqueness) before it poisons downstream merges.

Plan shape: ONE scan. All per-column aggregates live in a single
``agg`` — nulls are plain conditional counts; exact distincts compile to
Catalyst's Expand (each row replicated once per profiled column, then
one shuffle). That trade (scan count vs shuffle width) is right for
profiling runs; at 100 TB prefer ``exact=False`` which swaps in
``approx_count_distinct`` (HLL++, no Expand, one ordinary shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Profile ``columns`` (default: all) -> one row per column:
    (column_name, n_nulls, n_distinct, n_rows)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nn_{c}")
        )
        nd = F.countDistinct(F.col(c)) if exact else F.approx_count_distinct(F.col(c))
        aggs.append(nd.cast("long").alias(f"nd_{c}"))
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column (stack is a
    # projection — no extra shuffle)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
        "n_rows",
    )
