"""Interval (range) join: match timestamped rows to [start, end) windows.

Spark has no native range join — the naive formulation
``left.join(windows, (ts >= start) & (ts < end))`` has no equi-key, so
Catalyst plans a BroadcastNestedLoopJoin: every row compared against
every window, O(|left| * |windows|), which is exactly the plan that dies
at 100 TB.

The scale-correct formulation here is the classic *binned* range join
(the same strategy behind Databricks' range-join optimization and
interval indexes in genomics engines):

- pick a bin width W (default: the windows' maximum length, so each
  window overlaps at most 2 bins);
- each left row maps to exactly ONE bin (``floor(epoch/W)``);
- each window explodes to the few bins it overlaps;
- equi-join on the bin id (hash join, shuffle on bin), then apply the
  exact ``ts >= start AND ts < end`` residual predicate.

Each left row lands in one bin, so a (row, window) pair can meet in at
most one bin — no post-join dedup is needed. Candidate pairs shrink from
|left| * |windows| to roughly |matches| * (1 + slack); the join is a
plain shuffled hash/sort-merge join that AQE can size, skew-handle, and
(for small window sets) broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def interval_join(
    left: DataFrame,
    windows: DataFrame,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bin_width_seconds: int | None = None,
) -> DataFrame:
    """Inner-join ``left`` rows to every window with start <= ts < end.

    ``windows`` must carry ``start_col`` / ``end_col`` timestamps (plus
    any id/payload columns, which pass through). ``bin_width_seconds``
    defaults to the longest window length — at most 2 bins per window.
    Result: all left columns + all windows columns.
    """
    if bin_width_seconds is None:
        longest = windows.select(
            F.max(
                F.unix_micros(F.col(end_col).cast("timestamp"))
                - F.unix_micros(F.col(start_col).cast("timestamp"))
            ).alias("m")
        ).first()["m"]
        bin_width_seconds = max(1, int((longest or MICROS) + MICROS - 1) // MICROS)
    w = F.lit(bin_width_seconds * MICROS)

    lbin = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / w)
    start_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    end_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    # bins touched by the half-open window: floor(start/W) .. floor((end-1)/W);
    # sequence() descends when end < start, so guard degenerate windows out
    bins = F.when(
        end_us > start_us,
        F.sequence(F.floor(start_us / w), F.floor((end_us - 1) / w)),
    ).otherwise(F.array().cast("array<bigint>"))

    lt = left.withColumn("__bin", lbin)
    wt = windows.withColumn("__bin", F.explode(bins))
    return (
        lt.join(wt, "__bin")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bin")
    )
