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
