"""Train/eval decontamination: flag training documents that share word
n-grams with a held-out evaluation corpus.

The standard LLM-training hygiene pass (the reference repo has no text
surface at all — this extends the north-star text family): any training
document containing an n-gram that also occurs in a benchmark/eval set
is a contamination suspect and gets an overlap score.

Scale design (100 TB training corpus vs ~GB eval set):
- n-grams are hashed to 60-bit ints (``dedup.md5_hash60``) before the
  join, so the shuffle/broadcast payload is fixed 8-byte keys, never
  strings.
- the distinct eval-gram set is tiny relative to the corpus and is
  broadcast — the training side never shuffles; the whole pass is
  scan -> explode -> broadcast-hash-join -> partial agg on doc_id.
- if the eval set ever outgrows the broadcast threshold, drop the
  explicit ``broadcast()`` and let AQE pick a shuffle join keyed on the
  same 8-byte hash.

60-bit hash collisions (~1e-9 at 1e9 distinct grams) can only
over-count overlap by one gram — acceptable for a flagging pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import explode_shingles, md5_hash60
from .ratio import round_ratio

CONTAMINATION_SEED = 7


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-training-doc overlap with the eval corpus' word ``n``-grams.

    Returns ``(doc_id, n_grams, n_shared, contamination)`` for every
    training document sharing at least one n-gram with ``eval_df``
    (docs shorter than ``n`` tokens have no grams and never match).
    ``contamination`` = shared/total distinct grams, rounded to 4.
    """
    def posting(df: DataFrame) -> DataFrame:
        # explode_shingles, not the shingles() column fn: it materializes
        # the token array once per row (HOFs are interpreted — a lambda
        # that re-tokenizes per element is O(tokens^2) regex work).
        return (
            explode_shingles(df, id_col=id_col, text_col=text_col, n=n)
            .select(
                F.col("id").alias(id_col),
                md5_hash60(F.col("shingle"), CONTAMINATION_SEED).alias("gh"),
            )
        )

    eval_grams = F.broadcast(
        posting(eval_df).select("gh").distinct().withColumn("__hit", F.lit(1))
    )
    # ONE pass over the training posting: the broadcast LEFT join tags each
    # gram in-stream (no shuffle), and a single doc_id aggregation counts
    # both totals and hits — versus the naive sizes-join-shared shape that
    # re-tokenizes the whole corpus twice and adds a second join (measured
    # 8.0s -> ~4s at sf0.1).
    agg = (
        posting(train)
        .join(eval_grams, "gh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_shared"),
        )
        .filter(F.col("n_shared") > 0)
    )
    return agg.select(
        id_col,
        "n_grams",
        "n_shared",
        round_ratio(F.col("n_shared"), F.col("n_grams")).alias("contamination"),
    )
