"""Second-order embedding statistics: Gram/covariance matrices + PCA.

Training-data pipelines need second-order stats over embedding columns —
covariance for whitening/PCA dimensionality reduction, Gram matrices for
spectral diagnostics (effective rank, isotropy of the embedding space).
The reference has no embedding operators at all (SURVEY §2 north-star
family); this module provides them Spark-first:

- The d x d Gram/covariance matrix is computed as a SUM OF PER-PARTITION
  PARTIAL MATRICES via ``mapInPandas`` (one numpy ``M.T @ M`` per Arrow
  batch, one d x d matrix per partition flows to the final reduce).  At
  100 TB this is the only shape that works: the shuffle carries
  ``partitions x d²`` numbers (a few MB), never the data.  The
  explode-and-self-join formulation a SQL engine would use carries
  ``rows x d²`` — five orders of magnitude more.
- ``gram_int8`` runs over floor-quantized int8 codes with int64
  accumulators, so the result is EXACT integer arithmetic — order-
  independent, reproducible on any engine (the DuckDB oracle matches
  bit-for-bit).  127² x 10⁹ rows still fits int64 with ~600x headroom.
- ``pca_project`` eigendecomposes the (tiny, driver-side) covariance and
  broadcasts the d x k projection into a single vectorized map stage —
  no shuffle at all for the projection pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import quantize_embeddings_int8


def gram_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact Gram matrix G = Σ q qᵀ over int8-quantized embeddings.

    Returns (i, j, g) with 1-based indices, one row per matrix entry.
    Codes are int8 so every product fits int16 and an int64 accumulator is
    exact up to ~5.7e14 rows — the result is deterministic integer math,
    independent of partitioning and summation order.
    """
    import numpy as np
    import pandas as pd

    q = quantize_embeddings_int8(df, id_col, vec_col).select("qvec")

    def part(batches):
        G = None
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["qvec"].to_numpy()).astype(np.int64)
            g = M.T @ M
            G = g if G is None else G + g
        if G is not None:
            d = G.shape[0]
            jj, ii = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1))
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "g": G.ravel()}
            )

    partials = q.mapInPandas(part, "i int, j int, g long")
    # final reduce: one tiny shuffle of (partitions x d²) rows
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))


def covariance_matrix(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> "tuple":
    """Driver-side (mean, cov) over the float embeddings.

    Same partial-aggregation shape as :func:`gram_int8` but in float64:
    each partition contributes (n, Σx, Σxxᵀ); the driver combines and
    forms the covariance.  Only d + d² numbers per partition cross the
    wire.  Float addition is order-dependent, so this is for numerics
    (PCA), not for oracle-exact comparison — that's what gram_int8 is for.
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(vec_col).cast("array<double>").alias("v"))

    def part(batches):
        n, s, ss = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["v"].to_numpy())
            n += M.shape[0]
            s = M.sum(0) if s is None else s + M.sum(0)
            ss = M.T @ M if ss is None else ss + M.T @ M
        if n:
            d = len(s)
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "ss": [ss.ravel().tolist()],
                    "d": [d],
                }
            )

    rows = src.mapInPandas(
        part, "n long, s array<double>, ss array<double>, d int"
    ).collect()
    if not rows:
        raise ValueError("empty input")
    import numpy as np

    d = rows[0]["d"]
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return mean, cov


def pca_components(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """Top-k principal components -> (mean, components[k x d], variances[k]).

    Eigendecomposition happens on the driver over the d x d covariance —
    d is the embedding dimension (64-4096 in practice), never the row
    count, so this is O(d³) driver work regardless of data scale.
    Component sign is fixed (largest-|coordinate| entry positive) so the
    output is deterministic.
    """
    import numpy as np

    mean, cov = covariance_matrix(df, id_col, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for r in range(comps.shape[0]):  # deterministic sign
        lead = np.argmax(np.abs(comps[r]))
        if comps[r, lead] < 0:
            comps[r] = -comps[r]
    return mean, comps, vals[order]


def pca_project(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    components=None,
    mean=None,
) -> DataFrame:
    """Project embeddings onto the top-k principal axes -> (id, proj).

    The d x k projection matrix is broadcast inside a closure; the
    projection itself is one vectorized ``mapInPandas`` stage — zero
    shuffles, scales linearly with input.
    Pass precomputed ``components``/``mean`` (from :func:`pca_components`)
    to reuse a fitted basis on new data.
    """
    import numpy as np
    import pandas as pd

    if components is None or mean is None:
        mean, components, _ = pca_components(df, k, id_col, vec_col)
    mean = np.asarray(mean)
    P = np.asarray(components)[:k]

    src = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["v"].to_numpy()) - mean
            Y = M @ P.T
            yield pd.DataFrame({"id": pdf["id"], "proj": list(Y)})

    return src.mapInPandas(project, "id long, proj array<double>")
