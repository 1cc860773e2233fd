"""Skew-aware join: salting (SURVEY §4 / 100 TB design).

AQE's skew-join handles most runtime skew (enabled in session.py), but
pathological hot keys — one user/device generating a large share of all
events — still serialize into one straggler task in a sort-merge join.
Salting is the classic manual fix:

- the LARGE side gets a deterministic salt in [0, salt_factor) derived
  from a high-cardinality column (so a hot key's rows spread over
  salt_factor partitions),
- the SMALL side is replicated once per salt value (explode of a
  salt array — |small| · salt_factor rows),
- the join key becomes (key, salt); results are identical to the plain
  join, which is exactly what the DuckDB oracle checks.

Cost model: replicating the small side salt_factor times is worth it when
the hot key's share of the large side exceeds ~1/num_partitions. Use for
inner/left joins where the skewed side is the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Join ``large ⋈ small`` on ``on`` with hot-key salting.

    ``salt_source``: a high-cardinality column of ``large`` used to derive
    the deterministic salt (defaults to the first non-key column). The
    result equals ``large.join(small, on, how)`` row-for-row.
    """
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    if salt_source is None:
        candidates = [c for c in large.columns if c != on]
        if not candidates:
            raise ValueError("large side needs a non-key column to derive the salt")
        salt_source = candidates[0]

    salted_large = large.withColumn(
        "__salt", F.pmod(F.crc32(F.col(salt_source).cast("string")), F.lit(salt_factor))
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    ).withColumn("__salt", F.col("__salt").cast(salted_large.schema["__salt"].dataType))

    out = salted_large.join(salted_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def key_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Key-distribution profile: the diagnosis step before salting.

    -> top ``top_n`` keys by row count with exact integer shares:
    (key, n, share_bp, ratio_to_avg_bp, rank). ``share_bp`` = the key's
    share of all rows in basis points; ``ratio_to_avg_bp`` = 10000 means
    the key holds exactly an average share — a hot key shows as, e.g.,
    80000 (8x average). Integer floor math keeps it engine-exact.

    One groupBy (map-side combined) + one tiny aggregate cross-joined
    back. The top-N cut is a TakeOrderedAndProject (per-partition heaps),
    NOT a global rank window — the old ``Window.orderBy`` with no
    partition key single-tasked the whole distinct-key table (the last
    "No Partition Defined" warning in the round-2 bench tail). The rank
    column is then computed over the already-cut <= top_n rows, whose
    size is a constant independent of data scale.
    """
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = (
        counts.orderBy(F.col("n").desc(), F.col(key).asc())
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
    )
    # rank over <= top_n rows. Partition key = the (constant-valued, but
    # non-foldable) total_rows column: a literal would be constant-folded
    # to an empty partition spec and re-trigger the global-window warning;
    # a real column keeps the spec non-empty while still putting all
    # <= top_n rows in one (bounded-size) partition.
    w = Window.partitionBy("total_rows").orderBy(F.col("n").desc(), F.col(key).asc())
    return top.select(
        key,
        "n",
        F.floor(F.col("n") * 10000 / F.col("total_rows")).alias("share_bp"),
        F.floor(F.col("n") * F.col("n_keys") * 10000 / F.col("total_rows")).alias(
            "ratio_to_avg_bp"
        ),
        F.row_number().over(w).cast("long").alias("rank"),
    )
