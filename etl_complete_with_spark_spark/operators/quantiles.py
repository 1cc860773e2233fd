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

All heavy lifting is partition-local pre-cuts and k-bounded merges —
no global sort, no corpus-wide exchange, no driver collect.
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


def sample_quantile(q: float) -> F.Column:
    """Exact quantile of the (small) merged sample — aggregate expression
    over the ``value`` column."""
    return F.expr(f"percentile(value, {q!r})")


# ---------------------------------------------------------------------------
# Map-side pre-cut path (the 100 TB variant — and, since round 6, the
# ONLY variant: the retired ``bottomk_sample`` twin windowed over
# (group,), an EXCHANGE of the full corpus (rank hash + row-identity
# payload) into #groups-bounded partitions before any row was dropped.
# At 100 TB with 3 groups that is ~hundreds of GB per sort partition —
# the scale-killer flagged in round 4's plan audit — and its DuckDB
# oracle silently assumed row identities were unique (round-4 ADVICE).
# Both defects are structural, so the twin was deleted rather than
# patched; its mergeability/replay tests moved to this path.
#
# The pre-cut variant never shuffles the corpus. rank_hash is computed at
# the SCAN (before any exchange), then a mapInPandas pass cuts each INPUT
# partition down to its own per-group bottom-k — zero shuffle, state
# bounded by k x groups rows per partition — and only those candidates
# (group, value, rank_hash; NO row-identity payload) enter the exchange:
# <= k rows per (group x input-partition). The final cut then operates on
# k-bounded sketches only.
#
# Identity semantics change with the payload drop: dedup/tie-break is by
# rank_hash itself, not by the id string. The sample is defined as "the k
# smallest DISTINCT rank hashes per group, each carrying the MIN value
# observed for that hash". That definition is:
#   * deterministic in every engine (no order-dependence: min is
#     commutative; post-dedup the hash is unique, so ORDER BY rank_hash
#     is a total order) -> exact SQL oracles stay possible;
#   * replay-proof: a row delivered twice has the same hash AND the same
#     folded value, so at-least-once delivery cannot bias the sample
#     (this also retires round-4 ADVICE's duplicate-rid hazard: dup
#     identities collapse in BOTH engines by construction);
#   * mergeable: a hash among the global bottom-k distinct hashes is in
#     the bottom-k of every partition that contains it, so every copy
#     survives its partition's pre-cut and min(value) over survivors
#     equals min over all copies — the merged sketch is bit-identical to
#     the single-pass global sketch (property-tested).
# ---------------------------------------------------------------------------


def bottomk_precut(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    id_col: str | None = None,
    seed: int = BOTTOMK_SEED,
) -> DataFrame:
    """Per-INPUT-partition bottom-k pre-cut -> (group..., value, rank_hash).

    ``id_col`` names the row identity to hash; pass ``None`` when ``df``
    already carries a ``rank_hash`` column (e.g. hashed once before a
    checkpoint shared with other consumers). No shuffle is introduced:
    the cut runs inside each scan partition via ``mapInPandas`` with at
    most k x (groups seen in the partition) rows of state."""
    hashed = df if id_col is None else with_rank_hash(df, id_col, seed)
    hashed = hashed.select(
        *group_cols, F.col(value_col).alias("value"), "rank_hash"
    )
    gcols = list(group_cols)
    schema = hashed.schema

    def cut(batches):
        import pandas as pd

        state = None
        for pdf in batches:
            cur = pdf if state is None else pd.concat(
                [state, pdf], ignore_index=True
            )
            # min value per (group, hash), then the k smallest hashes
            cur = cur.sort_values(["rank_hash", "value"], kind="mergesort")
            cur = cur.drop_duplicates(subset=gcols + ["rank_hash"], keep="first")
            if gcols:
                cur = cur.groupby(gcols, sort=False, dropna=False).head(k)
            else:
                cur = cur.head(k)
            state = cur
        if state is not None and len(state):
            yield state

    return hashed.mapInPandas(cut, schema)


def merge_bottomk_hash(
    sketches: DataFrame,
    merge_cols: list[str],
    k: int,
    salt_buckets: int = 64,
) -> DataFrame:
    """Merge pre-cut sketches up to ``merge_cols`` granularity:
    min-value dedup on (merge key, rank_hash), then keep the k smallest
    hashes per merge key -> (merge_cols..., value, rank_hash).

    All stages stay k-bounded and parallel: the dedup is a hash
    aggregate with map-side partials (shuffles distinct (key, hash)
    pairs, spread over the full hash space — never a per-key hotspot);
    the top-k cut is two-level — first within (key, hash mod
    ``salt_buckets``) so no single window partition ever holds more
    than the deduped candidates / salt_buckets, then a final cut over
    at most k x salt_buckets rows per key."""
    dedup = sketches.groupBy(*merge_cols, "rank_hash").agg(
        F.min("value").alias("value")
    )
    w1 = Window.partitionBy(
        *merge_cols, F.pmod(F.col("rank_hash"), F.lit(salt_buckets))
    ).orderBy("rank_hash")
    pre = (
        dedup.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    w2 = Window.partitionBy(*merge_cols).orderBy("rank_hash")
    return (
        pre.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .select(*merge_cols, "value", "rank_hash")
    )
