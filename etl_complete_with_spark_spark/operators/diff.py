"""Table diff / reconciliation: compare two snapshots of a keyed table.

The ETL counterpart of ``git diff``: after a backfill, a migration, or a
resync (the reference's whole purpose is resyncs), you need to know what
the run actually changed. ``table_diff`` classifies every key as
``added`` / ``removed`` / ``changed`` / ``unchanged`` in ONE full outer
join — no driver-side comparison, no row collection.

Change detection uses the same md5 fingerprint trick as dedup/scd2: one
hash per side instead of N column comparisons, so the join carries two
narrow columns regardless of table width. At 100 TB both sides shuffle
once on the key (or the smaller side broadcasts); ``include_unchanged=
False`` (default) lets the filter drop the overwhelmingly-common case
before anything else happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(cols: list[str]):
    return F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
        )
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """-> (key, change_type) for every key in either snapshot.

    ``compare`` defaults to all non-key columns (must exist on both
    sides). ``change_type`` ∈ added | removed | changed (| unchanged).
    """
    if compare is None:
        compare = [c for c in old.columns if c != key and c in new.columns]
    o = old.select(F.col(key), _fingerprint(compare).alias("__fp_old"))
    n = new.select(F.col(key), _fingerprint(compare).alias("__fp_new"))
    joined = o.join(n, key, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(key, change.alias("change_type"))
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
