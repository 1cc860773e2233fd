"""Public column-expression surface (the library's ``F``-equivalent).

One import point for every reusable Column-level helper the operators
define, so user code can write::

    from etl_complete_with_spark_spark import functions as EF

    df.withColumn("sk", EF.surrogate_key_expr(["id", "name"]))
      .withColumn("cos", EF.cosine_expr(F.col("a"), F.col("b")))

These are re-exports, not copies — the implementations (and their
docstrings citing reference file:line parity) live next to the operators
that use them.
"""

from __future__ import annotations

from ..operators.dedup import (
    cosine_expr,
    dot_expr,
    hyperplane_sketch,
    l2_norm_expr,
    md5_hash60,
    shingles,
)
from ..operators.text import (
    normalized_text,
    quality_score_expr,
    tokens,
)
from ..operators.transforms import surrogate_key_expr

__all__ = [
    "cosine_expr",
    "dot_expr",
    "hyperplane_sketch",
    "l2_norm_expr",
    "md5_hash60",
    "normalized_text",
    "quality_score_expr",
    "shingles",
    "surrogate_key_expr",
    "tokens",
]
