"""SCD Type 2 (slowly changing dimension) merge: versioned upserts.

The reference's MERGE (operators/merge.py) is Type 1 — updates overwrite
history. Type 2 keeps every version: each dimension row carries
``valid_from`` / ``valid_to`` / ``is_current``; applying a batch closes
the current version of every changed key and appends the new version.
This is the standard warehouse pattern for auditable dims (and, in a
training-data lake, for tracking document/license/label revisions).

One batch application is three narrow pieces over a single key shuffle
(the changed-key set is broadcast back):

- ``unchanged``: current rows whose key is absent from the batch, or
  whose tracked attributes are identical (change detection by md5 over
  the tracked columns — same fingerprint trick as dedup).
- ``closed``:   current rows with a changed key -> ``valid_to`` = batch
  ts, ``is_current`` = false.
- ``opened``:   the new versions -> ``valid_from`` = batch ts, open-ended.

History rows (``is_current`` = false) pass through untouched — at scale
they live in separate partitions (partition by ``is_current`` or by
``valid_to`` month) and are never rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Open-ended sentinel. NOT the classic 9999-12-31: Arrow/pandas represent
# timestamps as int64 NANOSECONDS (max 2262-04-11), so a 9999 sentinel
# explodes any toPandas()/Arrow collection downstream. 2200-01-01 is
# far-future enough and survives every layer of a PySpark+Arrow stack.
OPEN_END = "2200-01-01 00:00:00"


def _fingerprint(cols: list[str]):
    return F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))


def scd2_init(source: DataFrame, batch_ts: str) -> DataFrame:
    """Bootstrap a dimension: every row current from ``batch_ts``."""
    return source.select(
        "*",
        F.lit(batch_ts).cast("timestamp").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key: str,
    tracked: list[str],
    batch_ts: str,
) -> DataFrame:
    """Apply ``batch`` (key + tracked attribute columns) to an SCD2 ``dim``.

    Returns the full new dimension. Unchanged-attribute rows are NOT
    re-versioned (fingerprint equality short-circuits them).
    """
    meta = ["valid_from", "valid_to", "is_current"]
    if set(batch.columns) != set(k for k in dim.columns if k not in meta):
        raise ValueError("scd2_apply: batch columns must equal dim business columns")
    ts = F.lit(batch_ts).cast("timestamp")

    current = dim.filter(F.col("is_current"))
    history = dim.filter(~F.col("is_current"))
    batch_fp = batch.withColumn("__fp", _fingerprint(tracked))
    cur_fp = current.withColumn("__fp", _fingerprint(tracked))

    # keys whose tracked attributes actually change, + brand-new keys
    changed_keys = (
        batch_fp.select(key, "__fp")
        .join(cur_fp.select(key, F.col("__fp").alias("__fp_cur")), key, "left")
        .filter(F.col("__fp_cur").isNull() | (F.col("__fp") != F.col("__fp_cur")))
        .select(key)
    )
    bk = F.broadcast(changed_keys)

    unchanged = current.join(bk, key, "left_anti")
    closed = (
        current.join(bk, key, "left_semi")
        .withColumn("valid_to", ts)
        .withColumn("is_current", F.lit(False))
    )
    opened = scd2_init(batch.join(bk, key, "left_semi"), batch_ts)
    return history.unionByName(unchanged).unionByName(closed).unionByName(
        opened.select(*dim.columns)
    )


def scd2_snapshot(dim: DataFrame, at_ts: str) -> DataFrame:
    """The dimension as of ``at_ts`` (version valid at that instant)."""
    t = F.lit(at_ts).cast("timestamp")
    return dim.filter((F.col("valid_from") <= t) & (F.col("valid_to") > t))
