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
