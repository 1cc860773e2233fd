"""Deduplication operators for large-scale training-data pipelines.

North-star surface (BASELINE.json): exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-duplicate detection over a document
corpus. The reference's only dedup is ``dropDuplicates(["sk"])``
(SURVEY §2.5-A3); everything here is new engineering, designed for the
shapes that survive 100 TB:

- **Exact** — hash-groupBy on a content fingerprint: one shuffle, map-side
  combine, the cheapest possible dedup.
- **n-gram Jaccard** — inverted-index (posting-list) self-join on shingles
  instead of an O(n²) cross join: explode distinct shingles, join docs
  sharing a shingle, count common vs union. Super-common shingles are
  capped (``max_shingle_freq``) exactly like web-dedup systems drop
  stop-shingles, which bounds the quadratic blowup of hot postings.
- **MinHash + LSH** — per-doc signatures (k independent hash mins), banded
  into buckets; only same-bucket pairs are candidates. Turns all-pairs
  similarity into a groupBy + within-bucket join. Hashes are md5-derived
  (``H(shingle, seed) = int(md5(shingle||'#'||seed)[:15], 16)``) so Spark
  and the DuckDB oracle agree bit-for-bit.
- **SimHash** — 32-bit signature via per-bit weighted majority; near-dups
  = small Hamming distance, found by 4-band exact-match blocking
  (pigeonhole: hamming<=3 ⇒ ≥1 of 4 bands equal).
- **Embedding cosine** — exact all-pairs above a threshold at test scale;
  the scale path buckets by random-hyperplane sign sketches (LSH) first.

Everything is built from DataFrame ops (explode/groupBy/join/bit ops) —
no Python in the hot path except where noted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .ratio import round_ratio
from .text import normalized_text, tokens

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id document per normalized-content fingerprint.

    One hash-aggregate shuffle on the fingerprint; deterministic winner.

    r15 note (measured, then REVERTED): a ``min_by(struct(*cols), id)``
    hash-aggregate twin (no per-partition sort, map-side partial) was
    A/B'd and LOST — 0.98 -> 1.41 CPU s/run, shuffle 0.19 -> 1.17 MB on
    ``dedup_exact`` at sf0.1. The window form wins because Catalyst
    prunes columns THROUGH the window: a consumer selecting only
    (doc_id, fingerprint) never ships ``text`` into the exchange, while
    ``min_by`` over an all-columns struct is opaque to nested pruning
    and forces the full payload through both the partial buffer and the
    shuffle. A keep-one aggregate only wins when the caller consumes
    every column (see queries.dedup_latest_per_key).
    """
    fp = F.md5(normalized_text(F.col(text_col)))
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("fingerprint", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Shingling + deterministic cross-engine hashing
# ---------------------------------------------------------------------------

def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text (array<string>).

    Sliding window over whitespace tokens via ``transform`` on indices —
    stays entirely in codegen; no UDF.
    """
    toks = tokens(normalized_text(text))
    count = F.size(toks) - F.lit(n - 1)
    # guard: sequence(0, -1) would produce a *descending* [0, -1] array
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), count - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


def md5_hash60(value: Column, seed: int) -> Column:
    """Deterministic 60-bit integer hash, identical in Spark and DuckDB:
    ``CAST(CONV(SUBSTR(MD5(v || '#seed'), 1, 15), 16, 10) AS BIGINT)``."""
    return F.conv(
        F.substring(F.md5(F.concat(value, F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("bigint")


def explode_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) posting list — the base relation for Jaccard/MinHash.

    Performance-shaped version of :func:`shingles`: the token array is
    materialized as a column first (evaluated once per row, not once per
    lambda element), and each shingle is built from n O(1)
    ``element_at`` lookups instead of a per-shingle ``slice`` array copy —
    higher-order functions are interpreted, so per-element cost dominates.
    """
    toks = tokens(normalized_text(F.col(text_col)))
    base = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    cnt = F.size("__toks") - F.lit(n - 1)
    shingle_list = F.when(cnt <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(F.col("__toks"), i + j) for j in range(n)]
                ),
            )
        )
    )
    return base.select("id", F.explode(shingle_list).alias("shingle"))


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted-index join)
# ---------------------------------------------------------------------------

# Seed for the posting-list shingle hash (distinct from MinHash seeds 0..k).
JACCARD_HASH_SEED = 99


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.4,
    max_shingle_freq: int | None = 1000,
    return_stats: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """All document pairs with shingle-Jaccard >= threshold.

    Plan shape: posting list with shingles *hashed to int64*
    (8-byte join keys instead of ~25-byte strings — halves the shuffle and
    speeds the equality; 60-bit hashes make collisions negligible and the
    DuckDB oracle uses the identical hash) -> (optional) drop shingles
    appearing in more than ``max_shingle_freq`` docs (stop-shingle cap: a
    shingle shared by f docs contributes f² join rows) -> self-join on
    shingle hash with id1 < id2 -> count common -> Jaccard via per-doc
    shingle counts. Returns (id1, id2, jaccard).

    NOTE the stop-shingle cap changes ANSWERS, not just cost: a dropped
    shingle no longer counts toward ``n_common`` (per-doc sizes keep it),
    so documents whose overlap lives in boilerplate shingles read a LOWER
    Jaccard, and a cluster of near-identical docs larger than the cap
    loses its pairs entirely — unlike the LSH star-connect there is no
    hub to keep detection. ``return_stats=True`` (round 11, extending the
    r10 no-silent-caps order to the one remaining silent drop) returns
    ``(pairs, stats)`` where ``stats`` is a one-row DataFrame
    ``(n_stop_shingles_dropped, n_postings_dropped)``; both zero when no
    shingle exceeded the cap (or the cap is off). The stats plan rides
    the SAME lazily-checkpointed posting frequency aggregate the filter
    already computes — evaluating it costs one short aggregate over the
    per-shingle counts, never a pass over the pair stream, and the pairs
    plan is unchanged (the default ``False`` path is byte-identical).

    REMEDY when the stats row reads non-zero on a boilerplate-heavy
    corpus: switch to :func:`minhash_dedup_pairs` — its mega-bucket
    guard is a star-connect (dual-hub, r11), so oversized near-dup
    clusters stay DETECTED (connected through the hubs) instead of
    dropped; this operator's cap has no detection-preserving fallback.
    """
    posting = explode_shingles(df, id_col, text_col, n).select(
        "id", md5_hash60(F.col("shingle"), JACCARD_HASH_SEED).alias("shingle")
    )
    # The posting list feeds three consumers (sizes, both join sides); the
    # shingle construction is interpreted higher-order-function work, so
    # materialize it once instead of recomputing per consumer.
    # localCheckpoint (lazy), not cache(): cached plans sit in the
    # CacheManager until an explicit unpersist that no caller of a
    # plan-building function can issue, so repeated invocations in a
    # long-lived session accumulate stale blocks; checkpoint blocks are
    # GC'd with the DataFrame reference.  (Trade-off: lineage is
    # truncated, so a lost executor fails the stage instead of
    # recomputing — acceptable for a short-lived intermediate.)
    # Timing caveat, measured round 11: under AQE, eager=False is lazy
    # only for the FINAL stage — building the checkpoint needs
    # queryExecution.toRdd, and finalizing an adaptive plan materializes
    # every upstream query stage AT CONSTRUCTION TIME. A caller that
    # builds a checkpoint-bearing operator pays its upstream compute
    # even if no action ever runs. Correctness and the blocks-free-with-
    # the-reference property (the reason checkpoint beats cache here)
    # are unaffected; anything TIMING these operators must time
    # construction + action together (bench.py does — see SCALING.md
    # round-11 "checkpoint materializes at construction").
    posting = posting.localCheckpoint(eager=False)
    # sizes feeds BOTH normalizer joins (sa on id1, sb on id2); without a
    # materialization the per-doc aggregate — a full pass over the posting
    # list plus its exchange — runs twice (observed as two identical
    # Exchange(hashpartitioning(id)) subtrees in the physical plan).  The
    # aggregate's output is one short row per document, so checkpointing
    # it costs ~nothing and halves the posting-list aggregate work.
    sizes = posting.groupBy("id").agg(
        F.count("*").alias("n_shingles")
    ).localCheckpoint(eager=False)
    stats = None
    if max_shingle_freq is not None:
        freq = posting.groupBy("shingle").agg(F.count("*").alias("df_"))
        if return_stats:
            stats = freq.filter(F.col("df_") > max_shingle_freq).agg(
                F.count(F.lit(1)).alias("n_stop_shingles_dropped"),
                F.coalesce(F.sum("df_"), F.lit(0))
                .cast("long")
                .alias("n_postings_dropped"),
            )
        posting = (
            posting.join(freq.filter(F.col("df_") <= max_shingle_freq), "shingle")
            .drop("df_")
        )
    elif return_stats:
        stats = df.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("n_stop_shingles_dropped"),
            F.lit(0).cast("long").alias("n_postings_dropped"),
        )
    a = posting.select(F.col("id").alias("id1"), "shingle")
    b = posting.select(F.col("id").alias("id2"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id1"), F.col("n_shingles").alias("n1"))
    sb = sizes.select(F.col("id").alias("id2"), F.col("n_shingles").alias("n2"))
    pairs = (
        common.join(sa, "id1")
        .join(sb, "id2")
        .withColumn(
            # integer-space 4dp rounding (operators/ratio.py): round(dbl, 4)
            # diverges cross-engine on exact ties like 57/800 (r14)
            "jaccard",
            round_ratio(
                F.col("n_common"), F.col("n1") + F.col("n2") - F.col("n_common")
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    return (pairs, stats) if return_stats else pairs


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------

# Universal-hash family for MinHash permutations, exactly reproducible in
# any engine with 64-bit integer math: the shingle is md5-hashed ONCE to a
# 31-bit base value h, and permutation i is (a_i*h + b_i) mod P with
# P = 2^31-1.  a_i*h + b_i < 2^62 never overflows a signed 64-bit int.
# (The previous implementation computed one md5 PER PERMUTATION — 16x the
# hash work per shingle; md5 dominated the whole signature cost.)
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the permutation family — shared
    with the DuckDB oracle SQL so signatures match bit-for-bit."""
    out = []
    for i in range(num_hashes):
        a = ((2 * i + 1) * 2_654_435_761) % MINHASH_P  # odd multiplier, a != 0
        b = (i * 40_503 + 12_345) % MINHASH_P
        out.append((a, b))
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Per-document MinHash signature: columns ``mh_0..mh_{k-1}``.

    One explode + one md5 per shingle + one groupBy with k ``min``
    aggregates over codegen'd integer permutations (map-side combined —
    the shuffle carries k longs per doc, independent of doc length).
    """
    posting = explode_shingles(df, id_col, text_col, n)
    h = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("bigint")
        % MINHASH_P
    )
    hashed = posting.select("id", h.alias("__h"))
    aggs = [
        F.min((F.col("__h") * a + b) % MINHASH_P).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    return hashed.groupBy("id").agg(*aggs)


# Size-aware default for the LSH mega-bucket guard (round 10, per r9
# VERDICT order 4): buckets at or below this stay exact full-clique;
# larger ones star-connect. 4096 keeps the worst per-bucket self-join
# under ~8M pairs while any real near-dup cluster the catalog's toy and
# sf0.1 corpora produce is orders of magnitude smaller — so "auto" is
# byte-identical to the clique on every oracle path, and a production
# caller who never heard of the flag still cannot hit the m²/2 blow-up.
LSH_MAX_BUCKET_AUTO = 4096


def _resolve_max_bucket(max_bucket: int | str | None) -> int | None:
    """``"auto"`` -> :data:`LSH_MAX_BUCKET_AUTO`; ``None`` and any value
    <= 0 -> exact full-clique (the explicit oracle-parity override);
    positive ints pass through. Coerces FIRST so the string ``"0"`` (or
    ``"-5"``) means unbounded like its int twin rather than
    "star-connect everything" (r10 ADVICE), and any other non-numeric
    string is a loud ValueError, not a silent misconfiguration."""
    if max_bucket is None:
        return None
    if isinstance(max_bucket, str):
        if max_bucket == "auto":
            return LSH_MAX_BUCKET_AUTO
        try:
            max_bucket = int(max_bucket)
        except ValueError:
            raise ValueError(
                "max_bucket must be 'auto', None, or an integer; got "
                f"{max_bucket!r}"
            ) from None
    max_bucket = int(max_bucket)
    return max_bucket if max_bucket > 0 else None


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    num_hashes: int = 16,
    max_bucket: int | str | None = "auto",
    return_stats: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Banded-LSH candidate pairs from a MinHash signature table.

    Each band's slice of the signature is hashed to a bucket key; docs
    sharing any (band, bucket) become a candidate pair. Distinct pairs out.

    ``max_bucket`` is the adversarial-duplication guard (round 9): a
    mega-cluster of m byte-identical (or near-identical) documents has
    identical signatures, lands in ONE bucket in EVERY band, and the
    bucket self-join emits m²/2 pairs — at m=1e6 that is 5e11 rows, a
    scale-killer no threshold downstream can undo. Buckets larger than
    ``max_bucket`` are STAR-CONNECTED instead: the bucket's min-id AND
    max-id members become hubs (dual-hub since round 11, per the r10
    VERDICT recall refinement) and only (hub, member) pairs are
    emitted — 2(m-1)-1 pairs after dedup, still linear, and every
    member remains reachable from every other through either hub. On
    the CANDIDATE graph (this function's output), connected components
    are therefore identical to the full clique's (property-tested).
    NOTE the equivalence is pre-verification connectivity only: a
    consumer that filters these edges further (e.g.
    :func:`minhash_dedup_pairs`'s est_jaccard threshold) judges each
    star edge individually, and for a NEAR-identical (not
    byte-identical) mega-cluster a member stays connected only if at
    least ONE of its two hub edges passes the filter — two independent
    chances instead of the single-hub mode's one (the r10 divergence
    halved), but a member failing against BOTH hubs still drops out
    even where a member↔member clique edge would have kept it
    (property-pinned) — for identical-signature clusters every star
    edge verifies at 1.0 and the clusters match exactly. Unlike the
    stop-shingle cap in :func:`ngram_jaccard_pairs` (which silently
    DROPS over-frequent shingles and loses oversized clusters), the
    star keeps detection. Trade-off: member↔member edges inside an
    oversized bucket are not emitted pairwise, so consumers that need
    the explicit pair list (not components) see the star subset.

    Default ``"auto"`` applies the guard above
    :data:`LSH_MAX_BUCKET_AUTO` (the production default — r9 VERDICT
    order 4); pass ``None``/``0`` for exact full-clique behavior (the
    explicit oracle-parity mode).

    ``return_stats=True`` (round 11 — no silent caps, completing the
    family) returns ``(pairs, stats)`` where ``stats`` is a one-row
    DataFrame ``(n_buckets_starred, n_clique_pairs_not_emitted)``: how
    many (band, bucket) groups rode the star subset and how many clique
    edges the subset left unemitted (m(m-1)/2 − (2m−3) per such bucket —
    an upper bound on pair-list loss; components are unaffected, and
    duplicate edges across bands mean the distinct pair loss can be
    lower). Zeros when no bucket exceeded the cap or the cap is off;
    default plans byte-identical.
    """
    max_bucket = _resolve_max_bucket(max_bucket)
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    rows_per_band = num_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh_{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = signatures.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.concat_ws("|", F.lit(str(b)), F.col(f"band_{b}"))
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    if max_bucket is None:
        a = stacked.select(F.col("id").alias("id1"), "bucket")
        b = stacked.select(F.col("id").alias("id2"), "bucket")
        pairs = (
            a.join(b, "bucket")
            .filter(F.col("id1") < F.col("id2"))
            .select("id1", "id2")
            .distinct()
        )
        if not return_stats:
            return pairs
        stats = signatures.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("n_buckets_starred"),
            F.lit(0).cast("long").alias("n_clique_pairs_not_emitted"),
        )
        return pairs, stats
    # size every bucket and pick its hubs with ONE window over the bucket
    # exchange (count/min/max over the whole partition) — the r10-open
    # groupBy-stats + join shape spent three extra exchanges and cost the
    # now-default guard +48% CPU on the catalog query; the window keeps
    # the guard's toy-SF price inside measurement noise. The self-join
    # then runs only on the bounded buckets (its pair stream is
    # <= max_bucket * |postings|), and oversized buckets contribute
    # 2(m-1)-1 star edges each (min-id and max-id hubs — still linear,
    # two independent post-verification chances per member; both hub
    # columns ride the SAME window, so the second hub costs no extra
    # exchange). Partitioned by bucket, never a global window.
    w = Window.partitionBy("bucket")
    sized = stacked.select(
        "id",
        "bucket",
        F.count(F.lit(1)).over(w).alias("__cnt"),
        F.min("id").over(w).alias("__hub_lo"),
        F.max("id").over(w).alias("__hub_hi"),
    )
    small = sized.filter(F.col("__cnt") <= max_bucket)
    a = small.select(F.col("id").alias("id1"), "bucket")
    b = small.select(F.col("id").alias("id2"), "bucket")
    full_pairs = (
        a.join(b, "bucket").filter(F.col("id1") < F.col("id2")).select("id1", "id2")
    )
    # both hub edges come out of ONE pass over the sized postings (an
    # explode of the two per-row structs) — a second filter+select branch
    # would re-run the banding + window exchange a fourth time under the
    # union. Hub ids bound each side, so id1 < id2 holds on every star
    # edge; the self-edges (hub row paired with itself) drop on the
    # inequality filter and the doubly-emitted (hub_lo, hub_hi) edge
    # dedups in the final distinct.
    star_pairs = (
        sized.filter(F.col("__cnt") > max_bucket)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("__hub_lo").alias("id1"), F.col("id").alias("id2")
                    ),
                    F.struct(
                        F.col("id").alias("id1"), F.col("__hub_hi").alias("id2")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.id1", "__e.id2")
        .filter(F.col("id1") != F.col("id2"))
    )
    pairs = full_pairs.union(star_pairs).distinct()
    if not return_stats:
        return pairs
    # per-bucket clique-vs-star edge gap, aggregated once over the same
    # banded postings (one short extra job when the caller evaluates it;
    # the pairs plan above is unchanged). `div` keeps the arithmetic in
    # longs — m(m-1) is even, so integer division is exact.
    stats = (
        sized.filter(F.col("__cnt") > max_bucket)
        .groupBy("bucket")
        .agg(F.first("__cnt").alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets_starred"),
            F.coalesce(
                F.sum(F.expr("m * (m - 1) div 2 - (2 * m - 3)")), F.lit(0)
            )
            .cast("long")
            .alias("n_clique_pairs_not_emitted"),
        )
    )
    return pairs, stats


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket: int | str | None = "auto",
) -> DataFrame:
    """MinHash-LSH near-dup pairs: LSH candidates verified by estimated
    Jaccard (fraction of agreeing minhashes) >= threshold.

    The verify join touches only candidate pairs — the all-pairs matrix is
    never materialized. Returns (id1, id2, est_jaccard).

    ``max_bucket`` (see :func:`lsh_candidate_pairs`) star-connects
    oversized LSH buckets so a mega-duplicate cluster costs O(m) pairs
    instead of O(m²). Star edges still pass through the est_jaccard
    verification below INDIVIDUALLY — for byte-identical mega-clusters
    every hub edge verifies at 1.0 and the post-verification clusters
    equal the clique's, while for near-identical clusters a member is
    kept if EITHER of its two hub edges (min-id and max-id hubs, dual
    since round 11) clears ``threshold``; one that falls below against
    both hubs is dropped even where a member↔member clique edge would
    have connected it (the guard trades that recall sliver for the
    O(m²) bound; property-tested both ways).
    Default ``"auto"`` guards above :data:`LSH_MAX_BUCKET_AUTO` — the
    production setting; pass ``None``/``0`` for exact full-clique
    semantics at any bucket size.
    """
    # lazy localCheckpoint, not cache(): see ngram_jaccard_pairs — blocks
    # free with the reference instead of leaking in the CacheManager.
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes).localCheckpoint(
        eager=False
    )
    cands = lsh_candidate_pairs(sigs, bands, num_hashes, max_bucket)
    return verify_est_jaccard(cands, sigs, num_hashes, threshold)


def verify_est_jaccard(
    cands: DataFrame,
    signatures: DataFrame,
    num_hashes: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Verify candidate (id1, id2) pairs against the signature table:
    est_jaccard = fraction of agreeing minhashes, filtered at
    ``threshold``. Each edge is judged individually — see the star-mode
    caveat on :func:`minhash_dedup_pairs`."""
    s1 = signatures.select(
        F.col("id").alias("id1"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_hashes)],
    )
    s2 = signatures.select(
        F.col("id").alias("id2"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_hashes)],
    )
    agree = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("est_jaccard", round_ratio(agree, F.lit(num_hashes)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id1", "id2", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash per document -> (id, simhash).

    Per-token 60-bit hash; bit j of the signature is the sign of
    Σ_tokens (±1 by token's bit j), i.e. 2·Σ(bit j) > token count.

    The 32 per-bit counters are packed into 8 bigint accumulators with
    four 16-bit lanes each (one 0/1 indicator per lane, summed), because
    Catalyst's analysis cost scales with the *number of aggregate
    expressions* — 32 separate sums cost multiple seconds of driver-side
    planning per invocation, 8 packed sums cost a quarter of that, and
    lane packing/unpacking is plain codegen'd bit math. 16-bit lanes keep
    the signed-64-bit accumulator overflow-safe up to 32,767 tokens per
    document (longer docs should be chunked upstream anyway)."""
    posting = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("tok"),
    ).withColumn("h", md5_hash60(F.col("tok"), 0))
    lanes = 4  # 16-bit lanes per 64-bit accumulator
    n_acc = SIMHASH_BITS // lanes
    packed = posting.select(
        "id",
        *[
            sum(
                (
                    F.shiftleft(
                        F.shiftright(F.col("h"), c * lanes + l).bitwiseAND(F.lit(1)), 16 * l
                    )
                    for l in range(lanes)
                ),
                start=F.lit(0),
            ).alias(f"p_{c}")
            for c in range(n_acc)
        ],
    )
    sums = packed.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"), *[F.sum(f"p_{c}").alias(f"s_{c}") for c in range(n_acc)]
    )
    ones = lambda j: F.shiftright(F.col(f"s_{j // lanes}"), 16 * (j % lanes)).bitwiseAND(  # noqa: E731
        F.lit(0xFFFF)
    )
    sig = sum(
        (
            F.shiftleft((ones(j) * 2 > F.col("n")).cast("long"), j)
            for j in range(SIMHASH_BITS)
        ),
        start=F.lit(0),
    )
    return sums.select("id", sig.cast("bigint").alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= max_hamming.

    Blocking: split the 32-bit signature into 4 bands of 8 bits; by
    pigeonhole, hamming<=3 implies at least one identical band, so only
    same-(band,value) pairs are joined. Returns (id1, id2, hamming).
    """
    sigs = simhash(df, id_col, text_col)
    bands = 4
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    stacked = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .cast("string"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    a = stacked.select(F.col("id").alias("id1"), F.col("simhash").alias("h1"), "bucket")
    b = stacked.select(F.col("id").alias("id2"), F.col("simhash").alias("h2"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _hyperplane_sign(i: int, j: int) -> float:
    """±1 component j of hyperplane i: parity of md5('hp-{i}-{j}')[:8].

    Computed driver-side with hashlib (bit-identical to the previous
    in-plan ``md5`` expression) so the executors multiply against literal
    sign arrays instead of hashing per element per row.
    """
    import hashlib

    h = int(hashlib.md5(f"hp-{i}-{j}".encode()).hexdigest()[:8], 16)
    return 1.0 if h % 2 == 0 else -1.0


def hyperplane_sketch(vec: Column, bits: int, dim: int = 64) -> Column:
    """k-bit random-hyperplane sign sketch of an array<double> column.

    Hyperplane i has ±1 components derived per-dimension from
    ``md5('hp-{i}-{dim}')`` — fully deterministic, no stored model. Two
    vectors land in the same bucket iff they fall on the same side of all
    k hyperplanes; P[same bit] = 1 - angle/π, so high-cosine pairs
    collide with high probability.

    ``dim`` must be >= the vector length; the sign array is sliced to the
    vector's actual size per row (zip_with null-pads the shorter side,
    which would poison the fold). The sign tables are baked in as literal
    arrays: hashing them in-plan would cost dim·bits md5 calls per ROW;
    here the per-row work is one zip_with multiply + fold per bit.
    """
    def signed_dot(i: int) -> Column:
        signs = F.array(*[F.lit(_hyperplane_sign(i, j)) for j in range(dim)])
        return F.aggregate(
            F.zip_with(vec, F.slice(signs, 1, F.size(vec)), lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return sum(
        (F.when(signed_dot(i) > 0, F.lit(2**i)).otherwise(F.lit(0)) for i in range(bits)),
        start=F.lit(0),
    )


def l2_norm_expr(v: Column) -> Column:
    """L2 norm of an array<double> column."""
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (zip_with + fold)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns — pure column
    expressions, no UDF.

    NOTE for pairwise use: higher-order functions are *interpreted* (not
    codegen'd), so in n² joins precompute each side's norm once
    (:func:`l2_norm_expr` before the join) and combine with
    ``dot_expr(a,b)/(na*nb)`` — same doubles, 3x fewer folds.
    """
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    lsh_bits: int = 0,
) -> DataFrame:
    """Pairs of vectors with cosine >= threshold -> (id1, id2, cosine).

    ``lsh_bits=0``: exact all-pairs (id1<id2) — O(n²), fine for corpus
    slices / verification. ``lsh_bits=k``: random-hyperplane sign-sketch
    blocking first — vectors only compare within their k-bit bucket, the
    100 TB path (hyperplanes are md5-derived from dimension index, so the
    sketch is deterministic).
    """
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", l2_norm_expr(F.col("v")))
    if lsh_bits:
        vecs = vecs.withColumn("bucket", hyperplane_sketch(F.col("v"), lsh_bits))
        a = vecs.select(F.col("id").alias("id1"), F.col("v").alias("v1"), F.col("nrm").alias("n1"), "bucket")
        b = vecs.select(F.col("id").alias("id2"), F.col("v").alias("v2"), F.col("nrm").alias("n2"), "bucket")
        pairs = a.join(b, "bucket").filter(F.col("id1") < F.col("id2"))
    else:
        a = vecs.select(F.col("id").alias("id1"), F.col("v").alias("v1"), F.col("nrm").alias("n1"))
        b = vecs.select(F.col("id").alias("id2"), F.col("v").alias("v2"), F.col("nrm").alias("n2"))
        pairs = a.crossJoin(b).filter(F.col("id1") < F.col("id2"))
    cos = dot_expr(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    return (
        pairs.withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def embedding_neardup_pairs_blas(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """BLAS implementation of exact all-pairs cosine near-dup.

    Same output contract as :func:`embedding_neardup_pairs` (id1 < id2,
    cosine rounded to 4, >= threshold), but each Arrow batch scores
    against the whole corpus in one numpy matmul instead of interpreted
    per-element folds — ~10x faster on dense vectors.

    Scale shape: the normalized corpus matrix is broadcast (fine to ~1M
    vectors x 64 dims = 0.5 GB; beyond that, tile the corpus into blocks
    and join batches to blocks instead of broadcasting). Each task holds
    one |batch| x |corpus| similarity tile — bound batch size via
    spark.sql.execution.arrow.maxRecordsPerBatch for wide corpora.
    """
    import numpy as np
    import pandas as pd

    rows = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    ids = np.array([r.id for r in rows])
    mat = np.array([r.v for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast((ids, mat))

    def score(batches):
        c_ids, c_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            b_ids = pdf["id"].to_numpy()
            b_mat = np.stack(pdf["v"].to_numpy())
            b_mat = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)
            sims = np.round(b_mat @ c_mat.T, 4)
            bi, ci = np.where(sims >= threshold)
            keep = b_ids[bi] < c_ids[ci]  # id1 < id2, no self-pairs
            yield pd.DataFrame(
                {
                    "id1": b_ids[bi][keep],
                    "id2": c_ids[ci][keep],
                    "cosine": sims[bi, ci][keep],
                }
            )

    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    return src.mapInPandas(score, "id1 long, id2 long, cosine double")


# ---------------------------------------------------------------------------
# Incremental dedup (continual ingest against a stored corpus)
# ---------------------------------------------------------------------------

def incremental_neardup_filter(
    new_docs: DataFrame,
    corpus_signatures: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket: int | str | None = "auto",
    return_stats: bool = False,
) -> tuple[DataFrame, DataFrame] | tuple[DataFrame, DataFrame, DataFrame]:
    """Dedup a NEW batch against an already-ingested corpus.

    The continual-ingest shape: the corpus is represented only by its
    MinHash signature table (k longs per doc — ~128 bytes/doc at k=16,
    billions of docs fit a modest table), never by its text. New docs are
    signed, LSH-bucketed against the stored signatures, candidates
    verified by signature agreement, and survivors returned along with
    their signatures (ready to append to the corpus table).

    Returns ``(kept_new_docs, kept_signatures)``. Within-batch near-dups
    are also collapsed (lowest id wins) so a batch can't smuggle in two
    copies of a novel document.

    ``max_bucket`` (round 10) extends the adversarial mega-duplicate
    guard to continual ingest, where the blow-ups are (a) a stored
    mega-cluster: |batch-bucket| x |corpus-bucket| probe rows per band
    (b x m — at m=1e6 stored near-identical docs every matching new doc
    drags a million-row probe), and (b) a duplicate-heavy batch: the
    within-batch self-join's m²/2. Guarded form: the corpus side of the
    probe keeps only the ``max_bucket`` LOWEST-id members per bucket
    (identical-signature members are interchangeable for verification,
    so detection is unchanged for exact dup families; a near-identical
    doc matching ONLY an unsampled member escapes — the same bounded
    recall trade the star mode documents), and the within-batch pass
    reuses :func:`lsh_candidate_pairs`'s clique-below/star-above
    switch, which preserves the keep-lowest semantics (every member is
    verified against the bucket's min-id hub; the dual-hub max-id edges
    only ADD detection — they mark the max-id member as a dup of a
    lower id, never the reverse). ``None``/``0`` restores the unbounded
    exact behavior at any bucket size.

    ``return_stats=True`` (round 11, per r10 order 4 — no silent caps)
    returns ``(kept_new_docs, kept_signatures, stats)`` where ``stats``
    is a one-row DataFrame ``(n_corpus_buckets_sampled,
    n_corpus_postings_dropped)`` counting the corpus-side (band, bucket)
    groups the cap sampled down to ``max_bucket`` representatives and
    the posting rows discarded across them; both zero when no bucket
    exceeded the cap (or the cap is off). Evaluating it costs one extra
    banding pass over the (checkpointed) corpus signatures — the kept/
    kept_signatures plans are unchanged and the default two-tuple return
    is byte-identical to round 10.
    """
    cap = _resolve_max_bucket(max_bucket)
    new_sigs = minhash_signatures(
        new_docs, id_col, text_col, n, num_hashes
    ).localCheckpoint(eager=False)
    # both signature tables feed TWO consumers each (banding + agreement
    # verification); without materialization the corpus side — typically a
    # scan of billions of stored signatures — is read and shuffled twice.
    # Lazy localCheckpoint, not cache(): under repeated batch ingest a
    # cache() here would pin every batch's corpus snapshot in the
    # CacheManager forever; checkpoint blocks free with the reference.
    corpus_signatures = corpus_signatures.localCheckpoint(eager=False)

    def banded(
        sigs: DataFrame, side: str, cap_members: int | None = None
    ) -> DataFrame:
        rows_per_band = num_hashes // bands
        cols = [
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh_{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias(f"band_{b}")
            for b in range(bands)
        ]
        stacked = sigs.select("id", *cols).select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.concat_ws("|", F.lit(str(b)), F.col(f"band_{b}"))
                        for b in range(bands)
                    ]
                )
            ).alias("bucket"),
        )
        if cap_members:
            # per-bucket representative sample, lowest ids (deterministic):
            # bounds the probe join at cap * |batch postings| rows
            w = Window.partitionBy("bucket").orderBy("id")
            stacked = (
                stacked.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= cap_members)
                .drop("__rn")
            )
        return stacked.withColumnRenamed("id", f"{side}_id")

    agree = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )

    def verify(cands: DataFrame, s1: DataFrame, s2: DataFrame) -> DataFrame:
        a = s1.select(F.col("id").alias("new_id"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_hashes)])
        b = s2.select(F.col("id").alias("old_id"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_hashes)])
        return (
            cands.join(a, "new_id")
            .join(b, "old_id")
            .withColumn("est", agree / F.lit(float(num_hashes)))
            .filter(F.col("est") >= threshold)
            .select("new_id")
            .distinct()
        )

    # vs the stored corpus (corpus side bounded to cap reps per bucket)
    cand_old = (
        banded(new_sigs, "new")
        .join(banded(corpus_signatures, "old", cap), "bucket")
        .select("new_id", "old_id")
        .distinct()
    )
    dup_vs_corpus = verify(cand_old, new_sigs, corpus_signatures)

    # within the new batch (keep the lowest id of each near-dup pair):
    # ride the guarded pair generator — clique below cap, dual-hub star
    # above, which is exactly keep-lowest (id1 is always the smaller id
    # on both the min-hub and max-hub edge branches)
    cand_new = lsh_candidate_pairs(new_sigs, bands, num_hashes, cap).select(
        F.col("id2").alias("new_id"), F.col("id1").alias("old_id")
    )
    dup_in_batch = verify(cand_new, new_sigs, new_sigs)

    # dup_ids feeds BOTH return values; checkpointing it pins one
    # authoritative dup set, so kept text and kept signatures can never
    # diverge even under nondeterministic upstreams, and the banding/
    # verification joins run once per batch, not once per output. (Under
    # AQE the upstream stages of this checkpoint materialize at
    # CONSTRUCTION, not first action — see the timing caveat on
    # ngram_jaccard_pairs.)
    dup_ids = (
        dup_vs_corpus.unionByName(dup_in_batch)
        .distinct()
        .localCheckpoint(eager=False)
    )
    kept = new_docs.join(
        dup_ids.withColumnRenamed("new_id", id_col), id_col, "left_anti"
    )
    kept_sigs = new_sigs.join(
        dup_ids.withColumnRenamed("new_id", "id"), "id", "left_anti"
    )
    if not return_stats:
        return kept, kept_sigs
    # observable for the bounded-recall trade (r10 order 4): which
    # corpus-side buckets the cap actually sampled, derived from the
    # UNCAPPED banding of the checkpointed corpus signatures (a second
    # lazy banding pass, paid only when the caller evaluates the stats)
    if cap:
        sizes = (
            banded(corpus_signatures, "old")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        stats = sizes.filter(F.col("__n") > cap).agg(
            F.count(F.lit(1)).alias("n_corpus_buckets_sampled"),
            F.coalesce(F.sum(F.col("__n") - cap), F.lit(0))
            .cast("long")
            .alias("n_corpus_postings_dropped"),
        )
    else:
        stats = new_docs.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("n_corpus_buckets_sampled"),
            F.lit(0).cast("long").alias("n_corpus_postings_dropped"),
        )
    return kept, kept_sigs, stats


# ---------------------------------------------------------------------------
# Blocked fuzzy matching (entity resolution)
# ---------------------------------------------------------------------------

def blocked_fuzzy_pairs(
    df: DataFrame,
    col: str,
    block: Column | None = None,
    max_distance: int = 3,
    max_block: int | str | None = "auto",
    return_stats: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Entity-resolution join: value pairs within ``max_distance`` edits.

    The all-pairs Levenshtein matrix is quadratic and unshippable at any
    scale; a BLOCKING KEY (default: the value's last token) restricts
    comparisons to candidates that share it — the classic entity-
    resolution trade (recall bounded by blocking quality, cost bounded by
    block size). One shuffle on the block key; Levenshtein runs JVM-side
    (``F.levenshtein``) on the blocked pairs only.

    Skewed blocks are the known hazard — a key shared by m distinct
    values (every company name ending in "inc") makes the self-join
    m²/2. ``max_block`` (round 10, default ``"auto"`` = the shared
    adversarial threshold) DROPS blocks above the cap, the stop-shingle
    trade: a blocking key hit by thousands of distinct values carries no
    discriminative signal, and unlike the LSH star-connect there is no
    hub shortcut here (edit distance is per-pair, not transitive), so
    dropping beats emitting a quadratic block. Callers with a hot-key
    corpus should supply a finer ``block`` expression (e.g. first token
    + length bucket); ``None``/``0`` keeps every block at any size.
    The trade is MEASURED (SCALING.md §Round-12 / scale_probe
    ``fuzzy_block_guard``): at an 8,192-value hot block the unbounded
    join costs 232 s of Levenshtein, the cap flattens it to ~1 s with
    the loss counted, and a first-token remedy block finds every true
    pair in under a second.

    ``return_stats=True`` (round 11, per r10 order 4 — no silent caps)
    returns ``(pairs, stats)`` where ``stats`` is a one-row DataFrame
    ``(n_blocks_dropped, n_values_dropped)`` counting the work the cap
    discarded; both zero when every block fit (or the cap is off). The
    stats plan shares the pairs plan's lineage but is a separate lazy
    job — evaluating it costs one extra pass over the DISTINCT values,
    never over the pair stream, and the pairs plan itself is unchanged
    (the default ``False`` path is byte-identical to round 10).

    Returns (v1, v2, distance) over DISTINCT values, v1 < v2.
    """
    cap = _resolve_max_bucket(max_block)
    if block is None:
        block = F.element_at(F.split(F.col(col), " "), -1)
    # compute the block key BEFORE renaming so a caller-supplied ``block``
    # expression can reference the original column name
    vals = (
        df.select(F.col(col)).distinct()
        .withColumn("blk", block)
        .withColumnRenamed(col, "v")
    )
    stats = None
    if cap:
        # one window over the block exchange (see lsh_candidate_pairs:
        # cheaper than a stats aggregate joined back)
        sized = vals.withColumn(
            "__cnt", F.count(F.lit(1)).over(Window.partitionBy("blk"))
        )
        if return_stats:
            stats = sized.filter(F.col("__cnt") > cap).agg(
                F.countDistinct("blk").alias("n_blocks_dropped"),
                F.count(F.lit(1)).alias("n_values_dropped"),
            )
        vals = sized.filter(F.col("__cnt") <= cap).drop("__cnt")
    elif return_stats:
        stats = df.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("n_blocks_dropped"),
            F.lit(0).cast("long").alias("n_values_dropped"),
        )
    a = vals.select(F.col("v").alias("v1"), "blk")
    b = vals.select(F.col("v").alias("v2"), "blk")
    pairs = (
        a.join(b, "blk")
        .filter(F.col("v1") < F.col("v2"))
        .withColumn("distance", F.levenshtein("v1", "v2").cast("long"))
        .filter(F.col("distance") <= max_distance)
        .select("v1", "v2", "distance")
    )
    if return_stats:
        return pairs, stats
    return pairs


def embedding_neardup_pairs_blas_tiled(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
) -> DataFrame:
    """Tiled twin of :func:`embedding_neardup_pairs_blas`: the all-pairs
    cosine scan as a blocked self-join, with NO driver collect/broadcast
    of the corpus (the broadcast path's documented ~1M x 64 bound).

    The corpus is packed into matrix blocks (distributed collect_list per
    hash block id), the block table is self-joined on ``bid1 <= bid2`` (a
    handful of block rows — the triangular grid, half the naive block
    pairs), and each pair is one ``A @ B.T`` BLAS call emitting pairs at
    or above the threshold with the same round-to-4 and ``id1 < id2``
    canonicalization, so output is row-identical to the broadcast path
    (and to the expression path's crossJoin verification plan).
    """
    import math

    import numpy as np
    import pandas as pd

    from .similarity import pack_vector_blocks

    # materialize once: the sizing count would otherwise execute a derived
    # input and the packing aggregation would re-execute it
    df = df.localCheckpoint()
    n = df.count()
    nb = max(1, math.ceil(n / block_rows))
    blocks = pack_vector_blocks(df, nb, "bid", "vs", id_col, vec_col)
    pairs = (
        blocks.select(F.col("bid").alias("bid1"), F.col("vs").alias("vs1"))
        .join(
            blocks.select(F.col("bid").alias("bid2"), F.col("vs").alias("vs2")),
            F.col("bid1") <= F.col("bid2"),
        )
    )

    def score(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                a_ids = np.array([e["id"] for e in row["vs1"]])
                a_mat = np.array([np.asarray(e["v"]) for e in row["vs1"]])
                b_ids = np.array([e["id"] for e in row["vs2"]])
                b_mat = np.array([np.asarray(e["v"]) for e in row["vs2"]])
                a_mat = a_mat / np.linalg.norm(a_mat, axis=1, keepdims=True)
                b_mat = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)
                sims = np.round(a_mat @ b_mat.T, 4)
                ai, bi = np.where(sims >= threshold)
                lo, hi = a_ids[ai], b_ids[bi]
                if row["bid1"] == row["bid2"]:
                    # diagonal block: each unordered pair appears twice in
                    # sims — keep the triangular half
                    keep = lo < hi
                    lo, hi = lo[keep], hi[keep]
                    cos = sims[ai, bi][keep]
                else:
                    # off-diagonal: each unordered pair appears ONCE, in
                    # whatever (a, b) orientation the hash gave it —
                    # canonicalize to id1 < id2, never filter
                    cos = sims[ai, bi]
                    lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)
                yield pd.DataFrame({"id1": lo, "id2": hi, "cosine": cos})

    return pairs.mapInPandas(score, "id1 long, id2 long, cosine double")


# ---------------------------------------------------------------------------
# Repeated-n-gram corpus profiling (hashed-window substring dedup signal)
# ---------------------------------------------------------------------------

def duplicate_ngram_profile(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 77,
) -> DataFrame:
    """Per-document duplicated-passage profile: how much of each doc's
    token stream appears VERBATIM elsewhere in the corpus.

    The Spark-friendly form of exact-substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — there
    built on suffix arrays, which don't distribute): every overlapping
    ``n``-token window is hashed to 60 bits; a window is *duplicated* if
    its hash occurs >= 2 times corpus-wide (within OR across documents —
    a doc-internal verbatim repeat is exactly as harmful to an LM).

    Returns (id, ``n_windows``, ``n_dup_windows``, ``dup_ratio_bp``)
    with the ratio in integer basis points; docs shorter than ``n``
    tokens have zero windows. Downstream policy (drop doc / cut spans /
    downweight) is the caller's.

    Scale: two shuffles, both carrying 8-byte window hashes and never
    text — (1) count by hash, (2) re-join counts to postings, then a
    per-doc aggregate. Postings are |tokens| rows, the same order as the
    shingle tables in the MinHash path; with hot boilerplate windows the
    count table is skew-safe (AQE) because the join key is the hash
    itself.
    """
    from .text import normalized_text

    # token array materialized as a column (evaluated once per row), and
    # each window built from n O(1) element_at lookups instead of a
    # per-window ``slice`` array copy — same performance shaping as
    # explode_shingles: higher-order functions are interpreted, so
    # per-element allocation dominates (measured ~2x on this pass)
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty
    windows = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    postings = (
        base.select("id", F.explode_outer(windows).alias("w"))
        .withColumn("h", md5_hash60(F.col("w"), seed))
        .select("id", "h")
    )
    # null h <=> the doc had zero windows (explode_outer kept the row)
    postings = postings.localCheckpoint(eager=False)  # two consumers below
    counts = postings.filter(F.col("h").isNotNull()).groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = (
        postings.join(counts, "h", "left")
        .groupBy("id")
        .agg(
            F.count(F.col("h")).cast("long").alias("n_windows"),
            F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0)).cast("long").alias("n_dup_windows"),
        )
    )
    return per_doc.withColumn(
        "dup_ratio_bp",
        F.when(F.col("n_windows") == 0, F.lit(0))
        .otherwise(F.floor(F.lit(10000.0) * F.col("n_dup_windows") / F.col("n_windows")))
        .cast("long"),
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 1000,
    return_stats: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Document pairs where the smaller shingle set is nearly CONTAINED in
    the larger: max-containment = |A ∩ B| / min(|A|, |B|) >= threshold.

    Asymmetric-overlap dedup: a short document quoted verbatim inside a
    long one has high containment but low symmetric Jaccard (the union is
    dominated by the long side), so Jaccard-threshold dedup misses
    boilerplate-wrapped copies, quote extractions, and subset scrapes.
    Broder's containment coefficient is the standard fix.

    Same plan shape (and scale posture) as :func:`ngram_jaccard_pairs`:
    60-bit hashed shingle postings, stop-shingle frequency cap to kill f²
    join blow-up, id1 < id2 self-join, per-doc set sizes joined back.
    Returns (id1, id2, containment). ``return_stats=True`` surfaces the
    cap's dropped work exactly as on :func:`ngram_jaccard_pairs` — here
    the answer distortion bites HARDER (a dropped shingle shrinks
    ``n_common`` while ``min(n1, n2)`` keeps it, so containment reads
    low on exactly the boilerplate-wrapped copies the operator exists to
    catch); returns ``(pairs, stats)`` with the same
    ``(n_stop_shingles_dropped, n_postings_dropped)`` row, zeros when
    nothing was capped, default path byte-identical.

    REMEDY when the stats row reads non-zero on a boilerplate-heavy
    corpus: :func:`minhash_dedup_pairs` (star-guarded LSH) keeps
    oversized clusters detected via hub edges; this cap does not.
    """
    posting = explode_shingles(df, id_col, text_col, n).select(
        "id", md5_hash60(F.col("shingle"), JACCARD_HASH_SEED).alias("shingle")
    )
    posting = posting.localCheckpoint(eager=False)
    # Checkpointed for the same reason as in ngram_jaccard_pairs: sizes
    # feeds both normalizer joins, and without materialization the per-doc
    # aggregate (full posting-list pass + exchange) is computed twice.
    sizes = posting.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    ).localCheckpoint(eager=False)
    stats = None
    if max_shingle_freq is not None:
        freq = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        if return_stats:
            stats = freq.filter(F.col("df_") > max_shingle_freq).agg(
                F.count(F.lit(1)).alias("n_stop_shingles_dropped"),
                F.coalesce(F.sum("df_"), F.lit(0))
                .cast("long")
                .alias("n_postings_dropped"),
            )
        posting = posting.join(
            freq.filter(F.col("df_") <= max_shingle_freq), "shingle"
        ).drop("df_")
    elif return_stats:
        stats = df.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("n_stop_shingles_dropped"),
            F.lit(0).cast("long").alias("n_postings_dropped"),
        )
    a = posting.select(F.col("id").alias("id1"), "shingle")
    b = posting.select(F.col("id").alias("id2"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id1"), F.col("n_shingles").alias("n1"))
    sb = sizes.select(F.col("id").alias("id2"), F.col("n_shingles").alias("n2"))
    pairs = (
        common.join(sa, "id1")
        .join(sb, "id2")
        .withColumn(
            "containment",
            round_ratio(F.col("n_common"), F.least("n1", "n2")),
        )
        .filter(F.col("containment") >= threshold)
        .select("id1", "id2", "containment")
    )
    return (pairs, stats) if return_stats else pairs
