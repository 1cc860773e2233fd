"""Domain-mixture sampling: cut each domain of a corpus down to a token
budget, deterministically.

Training-data pipelines mix domains (web/code/books/...) by *token*
budget, not document count. This operator keeps, per domain, the prefix
of a reproducible pseudo-random document order whose cumulative token
count fits the budget — the standard "sample domain X down to N tokens"
step, reproducible across runs, engines and partitionings (the order key
is ``md5(doc_id)``, not ``rand()``).

Scale design (100 TB): the window partitions by domain, so domains fill
the cluster in parallel and each domain's running sum is one partition's
sequential scan. That holds while a single domain's *rows* fit one
executor's spill budget; for a pathological single-domain corpus, switch
the cumulative sum to the distributed two-level prefix sum used by
``operators/packing.pack_training_shards`` (same semantics, no
single-partition window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def token_budget_sample(
    df: DataFrame,
    budget: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep docs per domain while the running token total fits ``budget``.

    Returns ``(doc_id, domain, n_tokens, cum_tokens)`` for kept docs.
    A doc is kept iff the cumulative count *including itself* is within
    budget (so one over-budget doc mid-stream also drops everything
    after it in the hash order — prefix semantics, exactly what makes
    the sample reproducible under corpus growth: new docs only append
    to or truncate the hash-ordered tail).
    """
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            id_col,
            domain_col,
            F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
    )


def weighted_sample_topn(
    df: DataFrame,
    n: int,
    weight_col: str,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (per domain).

    Efraimidis–Spirakis A-ES: each row gets key ``u^(1/w)`` with
    ``u ~ U(0,1)``; the top-``n`` keys per domain are a weighted sample
    without replacement. ``u`` derives from ``md5(id)`` instead of
    ``rand()`` — the sample is reproducible across runs, engines and
    partitionings, which is what makes a 100 TB quality-weighted corpus
    selection auditable. Weights clamp at 1e-4 so zero-quality docs get
    a key near 0 instead of a 1/0 exponent.

    One shuffle (the per-domain top-n window); the key computation is
    pure codegen. Keys are rounded to 6 before ranking (id tiebreak) so
    cross-engine libm ulp drift cannot reorder.
    """
    from .dedup import md5_hash60

    u = (md5_hash60(F.col(id_col).cast("string"), seed) + F.lit(1)).cast("double") / F.lit(
        float(2**60)
    )
    key = F.round(
        F.pow(u, 1.0 / F.greatest(F.col(weight_col), F.lit(1e-4))), 6
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.col("__aes_key").desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__aes_key", key)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
        .select(id_col, domain_col, weight_col, F.col("__aes_key").alias("aes_key"), "rank")
    )
