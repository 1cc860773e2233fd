"""Mergeable bottom-k uniform samples for distributed quantile estimation.

The mergeable-summary pattern (same family as the HLL / Count-Min /
Misra-Gries entries in ``frequency.py``, here for QUANTILES): each
ingest unit (a day, a shard, a micro-batch) keeps only the k elements
with the smallest *uniform hash rank* — a bottom-k sketch. Because the
rank is a deterministic uniform hash of the row identity, the k smallest
ranks of a UNION of groups are exactly the union of each group's
bottom-k candidates re-cut to k: merging sketches never rescans history,
and the merged sketch is a true uniform k-sample of the full stream.
Quantiles read off the sorted sample with DKW-style rank error
O(sqrt(log(1/δ) / k)).

Unlike reservoir sampling (RNG state, order-dependent) or t-digest
(engine-specific centroid policies), the bottom-k sample is bit-for-bit
reproducible on any engine that can md5 — which is what makes an exact
cross-engine oracle possible.

All heavy lifting is windows over (group, day) partitions and small
unions — no global sort, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_hash60

BOTTOMK_SEED = 41


def with_rank_hash(df: DataFrame, id_col: str, seed: int = BOTTOMK_SEED) -> DataFrame:
    """Uniform 60-bit hash rank of the row identity -> ``rank_hash``."""
    return df.withColumn(
        "rank_hash", md5_hash60(F.col(id_col).cast("string"), seed)
    )


def bottomk_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    k: int,
    seed: int = BOTTOMK_SEED,
) -> DataFrame:
    """Per-group bottom-k sketch: the k rows with the smallest hash rank.

    Returns (group_cols..., value, rank_hash). Partitions are per-group,
    so the window sort is bounded by group size; for 100 TB streams the
    per-group day/shard granularity keeps partitions small, and the
    heavy global cut happens only on already-k-bounded sketches in
    :func:`merge_bottomk`.
    """
    w = Window.partitionBy(*group_cols).orderBy("rank_hash", id_col)
    return (
        with_rank_hash(df, id_col, seed)
        .select(*group_cols, F.col(value_col).alias("value"), "rank_hash", id_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def merge_bottomk(
    sketches: DataFrame,
    merge_cols: list[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """Merge per-group sketches up to ``merge_cols`` granularity: union
    the candidate rows, drop duplicate identities, keep the k smallest
    ranks. Input is already k-bounded per fine group, so this window
    sorts at most k × (groups-per-merge-key) rows per partition.

    The identity dedup makes the merge correct under AT-LEAST-ONCE
    delivery: a row replayed into two different sketches (duplicate
    event across micro-batches, overlapping backfills) carries the same
    deterministic rank hash, so without the dedup it would occupy two
    sample slots and bias the quantile read; with it, merging any
    multiset of sketches over the same logical stream converges to the
    same bottom-k (idempotent ∪ mergeable — tested in
    test_round4_ops.py)."""
    w = Window.partitionBy(*merge_cols).orderBy("rank_hash", id_col)
    return (
        sketches.dropDuplicates([*merge_cols, id_col])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def sample_quantile(q: float) -> F.Column:
    """Exact quantile of the (small) merged sample — aggregate expression
    over the ``value`` column."""
    return F.expr(f"percentile(value, {q!r})")
