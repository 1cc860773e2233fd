"""Distributed Lloyd k-means over embedding columns, in EXACT integer
arithmetic.

The canonical iterative-ML-on-DataFrames pattern, shaped for clusters:

- **Quantize once** (``round(x * scale)`` to int64): every subsequent
  distance, sum and comparison is exact 64-bit integer math — no float
  summation-order drift, so assignments are bit-identical across
  engines, partitionings and runs, which is what makes a full SQL
  replay oracle possible (``queries_training.kmeans_embeddings_int``)
  and what makes production reruns reproducible.
- **Broadcast the centroids, never the points**: each round ships k×d
  integers to executors as literals; assignment is a pure map (no
  shuffle), the update is one groupBy producing k rows of per-dimension
  sums. Per-round shuffle volume is O(k·d) — independent of corpus
  size. This is exactly how k-means runs at 100 TB.
- **Fixed round count** (no data-dependent convergence test) keeps the
  job graph static and the oracle replayable.

Determinism details that both engines must share (and the oracle
mirrors): ties in the argmin go to the LOWEST cluster id; the centroid
update is integer mean with truncation toward zero (Spark ``div``
semantics; the SQL twin spells the sign out because DuckDB ``//``
floors); clusters that lose every point keep their previous centroid.

Distance values are bounded by d·(2·scale)² (≈ 2.6e10 at d=64,
scale=1e4) — far inside int64. Per-dimension sums are bounded by
n·scale; exactness holds to ~1e12 points per cluster at scale=1e4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_vectors(
    df: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    """(id, qv: array<long>) — fixed-point quantization, ties away from
    zero (identical in Spark and DuckDB ``round``)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * scale).cast("long"),
        ).alias("qv"),
    )


def _sq_dist_sql(qv_name: str, centroid: list[int]) -> str:
    """Exact int64 squared L2 distance between a quantized vector column
    and a literal centroid, as a SQL snippet. One parsed string per
    centroid instead of ~d Column-API calls — with k centroids × several
    rounds, py4j Column construction was the dominant driver cost
    (~0.6 s per round at k=8, d=64); a single ``F.expr`` parse is ~ms."""
    arr = ",".join(f"{int(v)}L" for v in centroid)
    return (
        f"aggregate(zip_with({qv_name}, array({arr}),"
        " (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"
    )


def assign_clusters(quant: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, qv, cluster_id, dist) — nearest centroid per point, ties to
    the lowest cluster id. Pure map over broadcast literals: no shuffle."""
    dists = F.expr(
        "array(" + ",".join(_sq_dist_sql("qv", c) for c in centroids) + ")"
    )
    return quant.select(
        "id",
        "qv",
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster_id"),
        F.array_min(dists).alias("dist"),
    )


def update_centroids(
    assigned: DataFrame, centroids: list[list[int]], dim: int
) -> list[list[int]]:
    """Next-round centroids: per-cluster per-dimension integer mean
    (truncation toward zero). posexplode + a 2-key groupBy instead of d
    wide sum aggregates — the wide form made Catalyst compile a d+1-agg
    codegen stage per round (measured 1-2.6 s of pure compilation at
    d=64); the narrow form is one cheap reusable plan, and map-side
    partial aggregation still caps the shuffle at k·d rows per
    partition. The collect is k·d rows — model-sized, not data-sized."""
    sums = (
        assigned.select("cluster_id", F.posexplode("qv").alias("pos", "val"))
        .groupBy("cluster_id", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    acc: dict[int, list] = {}
    for r in sums.collect():
        acc.setdefault(r["cluster_id"], [[0, 0]] * dim)
        acc[r["cluster_id"]][r["pos"]] = [r["s"], r["n"]]
    out = []
    for cid, prev in enumerate(centroids):
        r = acc.get(cid)
        if r is None:  # empty cluster keeps its centroid
            out.append(list(prev))
        else:
            out.append(
                [-((-s) // n) if s < 0 else s // n for s, n in r]
            )
    return out


def kmeans_int(
    df: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10_000,
    dim: int | None = None,
) -> DataFrame:
    """Lloyd k-means, ``rounds`` fixed iterations, exact int64 math.

    Init: the k lowest-id vectors (deterministic; production swaps in
    k-means|| over a sample without touching the loop). Returns the
    final assignment ``(id, cluster_id, dist)``.
    """
    if dim is None:
        dim = len(
            df.select(F.col(vec_col).alias("v")).limit(1).collect()[0]["v"]
        )
    quant = quantize_vectors(df, id_col, vec_col, scale)
    # a fixed-round loop re-scans the (cached) quantized table each
    # round; lineage stays flat because assignment is a pure projection
    quant = quant.localCheckpoint(eager=False)
    # TakeOrdered k rows (bounded model-sized collect); cluster ids by
    # sorted id on the driver — no global window needed
    init = quant.orderBy("id").limit(k).collect()
    centroids = [list(r["qv"]) for r in sorted(init, key=lambda r: r["id"])]
    for _ in range(rounds):
        assigned = assign_clusters(quant, centroids)
        centroids = update_centroids(assigned, centroids, dim)
    return assign_clusters(quant, centroids).select("id", "cluster_id", "dist")
