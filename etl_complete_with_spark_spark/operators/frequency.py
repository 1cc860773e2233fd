"""Frequent-items (heavy hitters) via mergeable Misra-Gries summaries.

The reference has no frequency sketches (SURVEY §2 — absent); this is the
training-data-pipeline operator for "which keys dominate the stream"
(vocabulary heads, hot users, skewed join keys) at 100 TB without a full
distinct-key shuffle.

Two-pass design (the standard distributed recipe):

1. **Per-partition Misra-Gries** with ``k`` counters (mapInPandas — the
   batch merge is the *mergeable-summaries* form of Agarwal et al. 2012:
   add the batch's vectorized ``value_counts`` to the running summary,
   then if more than ``k`` counters survive, subtract the (k+1)-th
   largest count from all and keep positives). Each partition emits at
   most ``k`` candidate keys. Guarantee: any key with partition-local
   count > n_p/(k+1) survives its partition's summary, so — by
   pigeonhole over the partition sum — any key with GLOBAL count >
   n/(k+1) appears in the union of candidates.

2. **Exact recount of candidates only**: broadcast the candidate set
   (<= k x n_partitions rows), semi-join the stream, and aggregate
   exactly. The final filter ``count * (k+1) > n`` is therefore EXACT —
   the sketch only prunes, it never decides — which is what makes the
   operator oracle-checkable against plain SQL.

Scale: pass 1 is a zero-shuffle map (summaries are partition-local);
pass 2 shuffles only rows whose key is in the candidate set instead of
every distinct key. A naive groupBy-count would shuffle the full key
space; here the exchange is bounded by the (skew-defined) head.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partials(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition MG summaries -> (key, est, n_rows) candidate rows
    plus one per-partition total row (key NULL, est 0, n_rows = rows
    seen). ``est`` is the (under-)estimate MG maintains — diagnostic
    only; callers recount exactly."""
    key_type = df.schema[key_col].dataType.simpleString()

    def summarize(batches):
        import pandas as pd

        counters = pd.Series(dtype="int64")
        seen = 0
        for pdf in batches:
            if pdf.empty:
                continue
            seen += len(pdf)
            counts = pdf[key_col].value_counts()
            counters = counters.add(counts, fill_value=0).astype("int64")
            if len(counters) > k:
                # mergeable-summaries decrement: drop the (k+1)-th largest
                # count from everyone, keep strictly positive counters
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > cut] - cut
        out = pd.DataFrame(
            {"key": counters.index, "est": counters.to_numpy(), "n_rows": 0}
        )
        total = pd.DataFrame({"key": [None], "est": [0], "n_rows": [seen]})
        yield pd.concat([out, total], ignore_index=True)

    return df.select(key_col).mapInPandas(
        summarize, f"key {key_type}, est long, n_rows long"
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact phi-heavy hitters (phi = 1/(k+1)): all keys with count >
    n/(k+1), with exact counts — found without shuffling the full key
    space. Returns (``key_col``, ``n``, ``share_bp``) where ``share_bp``
    = floor(10000*n/total), integer basis points (engine-exact).
    """
    partials = misra_gries_partials(df, key_col, k)
    # tiny table (<= (k+1) x partitions rows), two consumers -> pin it
    partials = partials.localCheckpoint()
    total = partials.agg(F.sum("n_rows")).collect()[0][0] or 0
    cand = partials.filter(F.col("key").isNotNull()).select(
        F.col("key").alias(key_col)
    ).distinct()
    return (
        df.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") * (k + 1) > F.lit(total))
        .withColumn(
            "share_bp",
            F.floor(F.lit(10000.0) * F.col("n") / F.lit(total)).cast("long"),
        )
    )


def countmin_partials(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256, seed: int = 11
) -> DataFrame:
    """Per-partition Count-Min sketches -> (j, cell, cnt) rows.

    Each partition builds a local depth x width counter array (cells
    updated per DISTINCT key per batch via vectorized value_counts — the
    md5 row-hashes cost |batch vocab| x depth digests, not |rows|), then
    emits its non-zero cells. CM sketches merge by cell-wise addition,
    so a groupBy(j, cell).sum over these rows IS the corpus sketch —
    the same mergeable-summary shape as misra_gries_partials and the
    HLL daily-rollup entry.
    """
    import hashlib

    def cell_of(key, j: int) -> int:
        digest = hashlib.md5(f"{key}#{seed}#{j}".encode()).hexdigest()
        return int(digest[:15], 16) % width

    def sketch(batches):
        import numpy as np
        import pandas as pd

        cells = np.zeros((depth, width), dtype="int64")
        for pdf in batches:
            if pdf.empty:
                continue
            for key, cnt in pdf[key_col].value_counts().items():
                for j in range(depth):
                    cells[j, cell_of(key, j)] += int(cnt)
        j_idx, c_idx = np.nonzero(cells)
        yield pd.DataFrame(
            {"j": j_idx.astype("int32"), "cell": c_idx.astype("int32"),
             "cnt": cells[j_idx, c_idx]}
        )

    out = df.select(key_col).mapInPandas(sketch, "j int, cell int, cnt long")
    return out


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    probe_keys: list,
    depth: int = 4,
    width: int = 256,
    seed: int = 11,
) -> DataFrame:
    """Point-frequency estimates for ``probe_keys`` from a merged
    Count-Min sketch: est(key) = min over rows j of cell(j, h_j(key)).

    Guarantees (Cormode & Muthukrishnan 2005): est >= true count always
    (collisions only ever ADD); est <= true + excess where the excess is
    n/width in expectation per row and the min over ``depth``
    independent rows makes large excess exponentially unlikely. The
    merged sketch is depth x width cells REGARDLESS of corpus size —
    the driver collect here is bounded at 1024 longs, never data.

    Returns a DataFrame (``key_col``, est long).
    """
    import hashlib

    merged = (
        countmin_partials(df, key_col, depth, width, seed)
        .groupBy("j", "cell")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    cells = {(r.j, r.cell): r.cnt for r in merged}

    def cell_of(key, j: int) -> int:
        digest = hashlib.md5(f"{key}#{seed}#{j}".encode()).hexdigest()
        return int(digest[:15], 16) % width

    rows = [
        (k, min(cells.get((j, cell_of(k, j)), 0) for j in range(depth)))
        for k in probe_keys
    ]
    from ..localdata import local_rows_df

    key_type = df.schema[key_col].dataType.simpleString()
    return local_rows_df(df.sparkSession, rows, f"{key_col} {key_type}, est long")
