"""Document chunking + PII scrubbing for training-data preparation.

Two more LLM-pipeline passes over the documents table:

- ``chunk_documents``: split each document into overlapping token windows
  (the standard pre-tokenization chunking for context-length-bound
  training). Pure column expressions: one ``transform`` over chunk
  indices + ``slice`` of the token array, exploded to one row per chunk.
  Narrow except the explode fan-out — no shuffle at all.
- ``scrub_pii``: regex redaction of emails / phone numbers / long digit
  runs (the minimal PII pass; a production deployment swaps in a
  proper recognizer behind the same column contract). Patterns avoid
  lookarounds so Java regex (Spark) and RE2-style engines agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Lookaround-free patterns that behave identically in Spark and DuckDB.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # at least one separator so plain digit runs fall through to <NUM>
    (r"\+?[0-9]{1,4}[()\-\s][0-9()\-\s]{5,}[0-9]", "<PHONE>"),
    (r"[0-9]{9,}", "<NUM>"),
]


def scrub_pii_expr(text: Column) -> Column:
    out = text
    for pattern, replacement in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII patterns in place (adds ``text_scrubbed``)."""
    return df.withColumn("text_scrubbed", scrub_pii_expr(F.col(text_col)))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """One row per (doc, chunk): (doc_id, chunk_idx, chunk_text, n_tokens).

    Windows start every ``chunk_tokens - overlap`` tokens; the final
    window is the (possibly shorter) tail. Documents shorter than one
    window yield exactly one chunk. Deterministic and shuffle-free —
    the explode multiplies rows inside the scan stage.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    df = df.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    n = F.size("__toks")
    # number of windows: 1 + ceil(max(n - chunk, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(" ", F.slice(F.col("__toks"), i * stride + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(n - i * stride, F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )
    return (
        df.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").cast("long").alias("n_tokens"),
        )
    )
