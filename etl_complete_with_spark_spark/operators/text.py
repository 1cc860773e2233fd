"""Text-analysis operators for large-scale training-data pipelines.

North-star surface (BASELINE.json): language-ID, quality scoring, token
counting, document fingerprinting — the per-document scoring pass of an
LLM data pipeline. The reference has no text operators (SURVEY §2.7
"absent"); these are new engineering, designed Spark-first:

- Every operator is a *narrow* projection built from `pyspark.sql.functions`
  (split/filter/aggregate/regexp_*) — no Python UDFs, so the whole scoring
  pass fuses into one whole-stage-codegen stage over the scan and
  parallelizes embarrassingly at 100 TB (no shuffle at all).
- Every operator has an exact DuckDB-SQL twin (queries.py) so correctness
  is oracle-checked, not eyeballed.

Tokenization convention (shared by all operators + oracles): tokens are
maximal runs of non-whitespace (`\\s+` split of trimmed text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ratio import round_ratio

# Marker stopwords per language for the n-gram/stopword language heuristic.
# Deliberately tiny: language ID at pipeline scale is a cheap filter, not a
# classifier — a real deployment swaps in fastText/CLD3 behind the same
# column contract.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "los", "las", "es", "y", "que"),
    "fr": ("le", "la", "les", "et", "est", "que", "une"),
}

# A small English stopword set for quality features.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that", "for", "on",
)

# BPE-ish token pattern: letter runs | digit runs | any other non-space char.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty string -> empty array)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def _count_in(arr: Column, vocab: tuple[str, ...]) -> Column:
    return F.size(F.filter(arr, lambda w: F.lower(w).isin(*vocab)))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-level features: counts, lengths, ratios.

    Adds: ``n_tokens``, ``n_tokens_bpe`` (regex sub-word estimate),
    ``avg_token_len``, ``type_token_ratio`` (distinct/total — low on
    boilerplate/repetition), ``stopword_ratio``. All ratios rounded to 4
    for cross-engine hash stability.
    """
    toks = tokens(F.col(text_col))
    df = df.withColumn("__tokens__", toks)
    n = F.size("__tokens__")
    stop_hits = _count_in(F.col("__tokens__"), STOPWORDS)
    out = (
        df.withColumn("n_tokens", n)
        .withColumn("n_tokens_bpe", F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN)))
        .withColumn(
            "avg_token_len",
            F.when(n == 0, F.lit(0.0)).otherwise(
                round_ratio(
                    F.aggregate(
                        "__tokens__", F.lit(0), lambda acc, w: acc + F.length(w)
                    ),
                    n,
                )
            ),
        )
        .withColumn(
            "type_token_ratio",
            F.when(n == 0, F.lit(0.0)).otherwise(
                round_ratio(F.size(F.array_distinct("__tokens__")), n)
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n == 0, F.lit(0.0)).otherwise(
                round_ratio(stop_hits, n)
            ),
        )
    )
    return out.drop("__tokens__")


def quality_score_expr(
    n_tokens: Column, n_distinct: Column, stop_hits: Column
) -> Column:
    """Composite quality score in [0,1], weights 0.4/0.3/0.3:

    - content length: min(n_tokens/100, 1)
    - lexical diversity (anti-boilerplate): type-token ratio
    - natural-language-likeness: min(stopword_ratio/0.1, 1)

    Computed in integer *basis points* (floor of exact integer ratios,
    /10000 at the end) — float round() at a decimal boundary differs
    between engines, so no float ever gets rounded here; Spark and the
    DuckDB oracle agree exactly.
    """
    return quality_score_bp_expr(n_tokens, n_distinct, stop_hits) / F.lit(10000.0)


def quality_score_bp_expr(
    n_tokens: Column, n_distinct: Column, stop_hits: Column
) -> Column:
    """The same composite score in raw integer BASIS POINTS (0..10000) —
    the form to use whenever the score feeds further arithmetic or
    cross-engine comparison (ranking, percentile lookups): integers
    compare and divide exactly, the float form only exists for human
    reading."""
    len_bp = F.least(n_tokens, F.lit(100)) * 40
    ttr_bp = F.when(n_tokens == 0, F.lit(0)).otherwise(
        F.floor(F.lit(3000.0) * n_distinct / n_tokens)
    )
    stop_bp = F.when(n_tokens == 0, F.lit(0)).otherwise(
        F.least(F.floor(F.lit(30000.0) * stop_hits / n_tokens), F.lit(3000))
    )
    return (len_bp + ttr_bp + stop_bp).cast("long")


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token stats + composite ``quality_score`` (one codegen'd projection)."""
    df = with_token_stats(df, text_col)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS)))
    return df.withColumn("quality_score", quality_score_expr(n, n_distinct, stop_hits))


def with_quality_bp(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer-basis-point quality score -> ``q_bp`` (long, 0..10000).
    One codegen'd projection, same contract as with_quality_score."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS)))
    return df.withColumn("q_bp", quality_score_bp_expr(n, n_distinct, stop_hits))


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID -> ``lang_pred``.

    CJK codepoints dominate -> 'zh'; else argmax of per-language marker-
    stopword hit counts (ties broken by fixed language order, 0 hits ->
    'und'). Pure column expressions — at scale this is a free rider on
    whatever scan already reads the text.
    """
    toks = tokens(F.col(text_col))
    df = df.withColumn("__tokens__", toks)
    cjk = F.regexp_count(F.col(text_col), F.lit(r"[一-鿿]"))
    hits = {lang: _count_in(F.col("__tokens__"), words) for lang, words in LANG_MARKERS.items()}
    best = F.lit("und")
    best_hits = F.lit(0)
    # forward order + strict '>' replacement => earlier langs win ties
    for lang in LANG_MARKERS:
        best = F.when(hits[lang] > best_hits, F.lit(lang)).otherwise(best)
        best_hits = F.when(hits[lang] > best_hits, hits[lang]).otherwise(best_hits)
    pred = F.when((cjk > 0) & (cjk * 2 >= F.size("__tokens__")), F.lit("zh")).otherwise(best)
    return df.withColumn("lang_pred", pred).drop("__tokens__")


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, whitespace collapsed."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint -> ``fingerprint`` (md5 of normalized text).

    The exact-dedup key: identical-after-normalization documents collide.
    A rolling/shingled variant lives in dedup.py (MinHash/SimHash).
    """
    return df.withColumn("fingerprint", F.md5(normalized_text(F.col(text_col))))


# Stopwords for the Gopher "natural language" rule: the doc must contain at
# least GOPHER_MIN_STOP_DISTINCT *distinct* members. Public rule set from
# Rae et al. 2021 ("Scaling Language Models: ... Gopher") §A1.1.
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_DISTINCT = 2


def with_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style document quality rules -> one boolean column per rule
    plus the conjunction ``gopher_keep``.

    Public heuristics from the Gopher paper (Rae et al. 2021, §A1.1),
    restricted to the rules meaningful for single-line documents (the
    bullet/ellipsis line-ratio rules need line structure):

    - ``r_word_count``: ``min_words <= n <= max_words``
    - ``r_mean_word_len``: mean token length in [3, 10] chars
    - ``r_alpha_ratio``: >= 80% of tokens contain an alphabetic char
    - ``r_symbol_ratio``: (# of '#' or '...' occurrences) / n < 0.1
    - ``r_stopwords``: >= 2 distinct GOPHER_STOPWORDS present

    Ratio thresholds are evaluated in cross-multiplied integer form
    (``3*n <= total_chars <= 10*n`` etc.) — no float division anywhere, so
    Spark and the DuckDB oracle agree bit-for-bit and the whole pass stays
    one codegen'd projection (zero shuffle; a free rider on the scan at
    100 TB, same posture as with_quality_score above).
    """
    toks = tokens(F.col(text_col))
    df = df.withColumn("__gt__", toks)
    t = F.col("__gt__")
    n = F.size(t)
    total_chars = F.aggregate(t, F.lit(0), lambda acc, w: acc + F.length(w))
    alpha_words = F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]")))
    symbols = F.regexp_count(F.col(text_col), F.lit(r"#|\.\.\.")).cast("int")
    stop_distinct = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(t, F.lower)),
            F.array([F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    rules = {
        "r_word_count": (n >= min_words) & (n <= max_words),
        "r_mean_word_len": (total_chars >= 3 * n) & (total_chars <= 10 * n),
        "r_alpha_ratio": alpha_words * 5 >= n * 4,
        "r_symbol_ratio": symbols * 10 < n,
        "r_stopwords": stop_distinct >= GOPHER_MIN_STOP_DISTINCT,
    }
    for name, expr in rules.items():
        df = df.withColumn(name, expr)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return df.withColumn("gopher_keep", keep).drop("__gt__")
