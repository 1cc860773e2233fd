"""Data-layout operators: Z-order (Morton) clustering for multi-column skipping.

Sorting a table by one column makes min/max file statistics razor-sharp
for that column and useless for every other. Interleaving the bits of k
quantized columns into one Morton code and range-partitioning + sorting
by it gives every participating column *moderately* tight per-file
ranges — so predicates on ANY of them prune files (the same layout
technique Delta/Iceberg expose as ``ZORDER BY`` / ``sort_order``).

All bit math is plain codegen'd integer expressions; the clustering
itself is one ``repartitionByRange`` (a range shuffle sampled by Spark)
plus a partition-local sort — exactly what a 100 TB OPTIMIZE job does,
no driver-side work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equiwidth_bucket(col: Column, lo: int, hi: int, buckets: int) -> Column:
    """Linear [lo, hi] -> [0, buckets) quantizer (clamped).

    Z-order only helps when every dimension uses comparable bit
    resolution: interleaving a 4-bit-cardinality column with a
    10-bit one degenerates to a plain sort on the wide column (the
    narrow column's high bits are constant zeros). Quantize raw
    columns to a common grid first.
    """
    span = max(1, hi - lo + 1)
    b = F.floor((col - F.lit(lo)) * buckets / F.lit(span)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(buckets - 1), b))


def morton_code(cols: list[Column], bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of k non-negative int columns.

    Bit b of column i lands at position ``b * k + i`` — the standard
    Morton/Z-curve interleave. Callers quantize first (e.g. ``% 1024``
    or a division) so the low bits carry locality. k * bits must stay
    < 63 (signed-bigint safe).
    """
    k = len(cols)
    if k * bits >= 63:
        raise ValueError(f"morton_code: {k} cols x {bits} bits overflows a signed bigint")
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i)
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return sum(terms[1:], start=terms[0]).cast("long")


def morton_code_sql(exprs: list[str], bits: int = 10) -> str:
    """The DuckDB/ANSI twin of :func:`morton_code` for oracle checks."""
    k = len(exprs)
    terms = [
        f"((({e} >> {b}) & 1) << {b * k + i})"
        for b in range(bits)
        for i, e in enumerate(exprs)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[Column],
    bits: int = 10,
    num_files: int = 8,
) -> None:
    """Cluster ``df`` on the Morton code of ``cols`` and write parquet.

    Range-partition by code (contiguous Z-curve segments per file), sort
    within partitions, drop the helper column. Each output file then
    covers a tight hyper-rectangle of the quantized key space, so
    min/max footer stats prune on every clustered column.
    """
    (
        df.withColumn("__z", morton_code(cols, bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (+ sorted) managed parquet table on
    ``key`` — the pay-once layout for a HOT JOIN AXIS.

    Every join or aggregation on ``key`` against another table bucketed
    with the SAME bucket count then reads matching buckets directly:
    Spark's scan reports hash-distribution on the bucket column, so the
    planner drops the Exchange on that side entirely (SortMergeJoin
    keeps its Sort when upstream operators lose the bucket sort order —
    the exchange, not the sort, is the scale cost: it is the all-to-all
    network/disk hop whose bytes grow linearly with the fact table).

    This is the documented remedy for the catalog's one real big-join
    shuffle, the lineitem-orders axis: at sf0.1 AQE broadcasts orders
    (0 MB shuffled) but at sf1.0 the join crosses the broadcast
    threshold and becomes a 104 MB exchange (SCALING.md r14) — at
    100 TB that axis IS the job. A daily pipeline MERGE-ing into or
    joining against the same key (the reference's production MERGE on
    ``sk``, witcher cloud_utils.py:515-524) amortizes one bucketed
    write across every subsequent run; scripts/ab_bucketed_join.py
    measures the delta at sf1.0.

    ``buckets`` sizes the parallelism of every future bucket-local join
    (pick ~= cluster cores at the target SF, like shuffle partitions);
    ``sort_cols`` defaults to [key] so bucket files are also
    merge-join-ready when read directly.
    """
    (
        df.write.bucketBy(buckets, key)
        .sortBy(*(sort_cols or [key]))
        .mode("overwrite")
        .saveAsTable(table)
    )
