"""Merge-upsert operator (the reference's only join).

Rebuilds the Delta-style MERGE of SURVEY §2.2-K2 / §2.4
(reference: shared_etls/etls/cloud_utils.py:478-532, merge keys
``lake.sk = df.sk``, whenMatchedUpdateAll / whenNotMatchedInsertAll) as a
pure DataFrame operator, so it is usable against any storage (the lake
layer decides how to persist the result — Delta when the jars are on the
classpath, versioned Parquet rewrite otherwise).

Semantics of ``merge_upsert(target, source, key)``:

    result = dedup(source, key)                           # updates+inserts
           UNION target rows whose key is NOT in source   # untouched rows

which is exactly whenMatchedUpdateAll + whenNotMatchedInsertAll.

Scale notes (100 TB): the anti-join shuffles both sides on ``key`` unless
the source fits a broadcast — for incremental loads the source (one
slice) is orders of magnitude smaller than the target, so we broadcast it
below the configurable row threshold. Real Delta MERGE additionally
rewrites only matched *files*; our Parquet fallback rewrites the table,
which is fine at test scale and is replaced by Delta in production
(lake.py gates on the import).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .transforms import dedup_by_key

# Sources smaller than this many rows get broadcast to skip shuffling the
# (huge) target side of the anti-join. ~1M rows of typical ETL width stays
# well under Spark's 8GB broadcast hard cap.
BROADCAST_SOURCE_MAX_ROWS = 1_000_000


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str = "sk",
    order_by: str | None = "timestamp_kafka",
    broadcast_source: bool | None = None,
) -> DataFrame:
    """whenMatchedUpdateAll + whenNotMatchedInsertAll over ``key``.

    ``source`` rows win over ``target`` rows on key collision; within the
    source, latest ``order_by`` wins (deterministic — the reference's
    ``dropDuplicates`` kept an arbitrary row, see SURVEY §2.11). Column
    sets must match; the result keeps ``target``'s column order.

    ``broadcast_source=None`` auto-decides via a cheap count.
    """
    missing = set(target.columns) ^ set(source.columns)
    if missing:
        raise ValueError(f"merge_upsert: column mismatch between target/source: {missing}")
    source = dedup_by_key(source, [key], order_by=order_by)
    source = source.select(*target.columns)

    if broadcast_source is None:
        broadcast_source = source.count() <= BROADCAST_SOURCE_MAX_ROWS
    anti_side = F.broadcast(source) if broadcast_source else source

    untouched = target.join(anti_side.select(key), on=key, how="left_anti")
    return source.unionByName(untouched)


def cdc_apply(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change feed (I/U/D rows) -> final table state.

    The change-data-capture materializer that complements
    :func:`merge_upsert`: where MERGE folds ONE deduplicated source batch
    into a target, ``cdc_apply`` folds an ordered *log* of operations —
    the Debezium/Delta-CDF-shaped input (op in {I,U,D}, monotone ``seq``
    per key) — into the latest surviving row per key, dropping keys whose
    latest operation is a delete.

    Requirements: ``seq_col`` totally orders each key's changes (ties
    would make the result nondeterministic, so the caller must provide a
    unique sequence — LSN, commit version, offset).

    Scale: one hash-shuffle on ``key_cols`` and a per-key window over the
    (short) change history — no global window, no collect. At 100 TB the
    feed is naturally partitioned by key hash and AQE handles key skew.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("__rn", seq_col, op_col)
    )


def merge_additive(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Additive state merge: combine two partial-aggregate tables by key,
    summing ``sum_cols`` (missing side contributes zero).

    The EXACT-aggregate twin of the mergeable-sketch family (HLL /
    Count-Min / bottom-k): maintain a materialized rollup by merging
    each ingest batch's partial aggregate into the state table instead
    of rescanning history — incremental view maintenance for the
    sum/count algebra. Works for any commutative-monoid columns (sums,
    counts, min/max need only the obvious aggregate swap); integer
    columns make the merge bit-exact under ANY batch split, which the
    hypothesis property test asserts.

    Plan: one full-outer join on the rollup key. State size = rollup
    cardinality (days × dims), not history size — the reason this holds
    at 100 TB.
    """
    s = state.select(*keys, *[F.col(c).alias(f"__s_{c}") for c in sum_cols])
    d = delta.select(*keys, *[F.col(c).alias(f"__d_{c}") for c in sum_cols])
    out = s.join(d, keys, "full_outer")
    for c in sum_cols:
        out = out.withColumn(
            c,
            F.coalesce(F.col(f"__s_{c}"), F.lit(0))
            + F.coalesce(F.col(f"__d_{c}"), F.lit(0)),
        )
    return out.select(*keys, *sum_cols)
