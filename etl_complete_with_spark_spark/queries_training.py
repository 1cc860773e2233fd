"""Catalog entries for the training-data operators (text/dedup/similarity).

Registered into the same QUERIES/ORACLE dicts as queries.py. Every oracle
here mirrors the Spark operator *exactly* — including the md5-derived
60-bit hashes (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)` in DuckDB ==
`conv(substring(md5(x),1,15),16,10)` in Spark), so MinHash/SimHash
signatures agree bit-for-bit across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators import dedup as D
from .operators.ratio import round_ratio_sql
from .operators import similarity as SIM
from .operators import text as TX
from .queries import load, query

# ---------------------------------------------------------------------------
# Shared DuckDB fragments (must mirror operators/text.py conventions)
# ---------------------------------------------------------------------------

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_TOKS = rf"CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END"
_NORM_TOKS = rf"CASE WHEN {_NORM} = '' THEN []::VARCHAR[] ELSE string_split({_NORM}, ' ') END"
_STOPLIST = ", ".join(f"'{w}'" for w in TX.STOPWORDS)
_BPE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _hash60_sql(expr: str, seed: int) -> str:
    return f"CAST('0x' || substr(md5({expr} || '#{seed}'), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@query(
    "text_token_stats",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents)
    SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE}')) AS BIGINT) AS n_tokens_bpe,
           CASE WHEN len(tk) = 0 THEN 0.0
                ELSE {round_ratio_sql('list_sum(list_transform(tk, x -> length(x)))', 'len(tk)')}
           END AS avg_token_len,
           CASE WHEN len(tk) = 0 THEN 0.0
                ELSE {round_ratio_sql('len(list_distinct(tk))', 'len(tk)')}
           END AS type_token_ratio,
           CASE WHEN len(tk) = 0 THEN 0.0
                ELSE {round_ratio_sql(f'len(list_filter(tk, x -> lower(x) IN ({_STOPLIST})))', 'len(tk)')}
           END AS stopword_ratio
    FROM t
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting + quality features over documents — a narrow,
    shuffle-free, fully codegen'd projection (operators/text.py)."""
    df = TX.with_token_stats(load(spark, sf_dir, "documents"))
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_tokens_bpe").cast("long").alias("n_tokens_bpe"),
        "avg_token_len",
        "type_token_ratio",
        "stopword_ratio",
    )


@query(
    "text_quality_score",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    s AS (
        SELECT doc_id,
               len(tk) AS n,
               len(list_distinct(tk)) AS nd,
               len(list_filter(tk, x -> lower(x) IN ({_STOPLIST}))) AS sh
        FROM t)
    SELECT doc_id,
           (least(n, 100) * 40
            + CASE WHEN n = 0 THEN 0 ELSE floor(3000.0 * nd / n) END
            + CASE WHEN n = 0 THEN 0 ELSE least(floor(30000.0 * sh / n), 3000) END
           ) / 10000.0 AS quality_score
    FROM s
    """,
)
def text_quality_score(spark, sf_dir):
    """Composite document quality score (length + lexical diversity +
    stopword naturalness), for corpus filtering at ingest time."""
    df = TX.with_quality_score(load(spark, sf_dir, "documents"))
    return df.select("doc_id", "quality_score")


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TX.LANG_MARKERS[lang])
    return f"len(list_filter(tk, x -> lower(x) IN ({words})))"


@query(
    "text_language_id",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
    h AS (
        SELECT doc_id,
               len(tk) AS n,
               len(regexp_extract_all(text, '[一-鿿]')) AS cjk,
               {_lang_hits_sql("en")} AS en_h,
               {_lang_hits_sql("de")} AS de_h,
               {_lang_hits_sql("es")} AS es_h,
               {_lang_hits_sql("fr")} AS fr_h
        FROM t)
    SELECT doc_id,
           CASE WHEN cjk > 0 AND cjk * 2 >= n THEN 'zh'
                WHEN greatest(en_h, de_h, es_h, fr_h) = 0 THEN 'und'
                WHEN en_h = greatest(en_h, de_h, es_h, fr_h) THEN 'en'
                WHEN de_h = greatest(de_h, es_h, fr_h) THEN 'de'
                WHEN es_h = greatest(es_h, fr_h) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM h
    """,
)
def text_language_id(spark, sf_dir):
    """Stopword/charset language heuristic -> lang_pred (operators/text.py).
    Ties favor earlier languages (en > de > es > fr); CJK-dominant -> zh."""
    df = TX.with_language_id(load(spark, sf_dir, "documents"))
    return df.select("doc_id", "lang_pred")


@query(
    "text_fingerprint",
    f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents",
)
def text_fingerprint(spark, sf_dir):
    """Normalized-content md5 fingerprint (exact-dedup key)."""
    df = TX.with_fingerprint(load(spark, sf_dir, "documents"))
    return df.select("doc_id", "fingerprint")


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    f"""
    SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) = 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: lowest doc_id survives per content fingerprint. One
    hash-partitioned shuffle; at 100 TB this is the cheapest dedup pass."""
    return D.exact_dedup(load(spark, sf_dir, "documents")).select("doc_id", "fingerprint")


_TRIGRAMS = "[tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk) - 1)]"

_JACCARD_POSTING = f"""
    WITH norm AS (SELECT doc_id AS id, {_NORM_TOKS} AS tk FROM documents),
    p0 AS (
        SELECT id, unnest(list_distinct({_TRIGRAMS})) AS sh
        FROM norm),
    p AS (SELECT id, {_hash60_sql('sh', 99)} AS shingle FROM p0),
    sizes AS (SELECT id, count(*) AS n FROM p GROUP BY id),
    common AS (
        SELECT a.id AS id1, b.id AS id2, count(*) AS c
        FROM p a JOIN p b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY 1, 2)
"""


# Shared trigram-Jaccard near-dup pairs (threshold 0.5, no freq cap) for
# the three queries that consume the identical pair set
# (dedup_ngram_jaccard, dedup_cluster_keep, dedup_cluster_keep_star).
# One posting self-join per (session, sf_dir) instead of three — the
# same materialize-once pattern as queries_analytics._coorder_edges;
# lazy localCheckpoint, so unused cache entries cost nothing.
_JACCARD_PAIRS_CACHE: dict = {}


def _jaccard_pairs(spark, sf_dir):
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _JACCARD_PAIRS_CACHE.get(key)
    if cached is None:
        cached = D.ngram_jaccard_pairs(
            load(spark, sf_dir, "documents"),
            n=3,
            threshold=0.5,
            max_shingle_freq=None,
        ).localCheckpoint(eager=False)
        _JACCARD_PAIRS_CACHE[key] = cached
    return cached


@query(
    "dedup_ngram_jaccard",
    f"""
    {_JACCARD_POSTING}
    SELECT id1, id2, {round_ratio_sql('c', 's1.n + s2.n - c')} AS jaccard
    FROM common
    JOIN sizes s1 ON id1 = s1.id
    JOIN sizes s2 ON id2 = s2.id
    WHERE {round_ratio_sql('c', 's1.n + s2.n - c')} >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Trigram-shingle Jaccard near-dup pairs (>= 0.5) via inverted-index
    self-join — never materializes the n² pair matrix. Trigrams (not
    bigrams) because this corpus's 40-word vocabulary makes every bigram a
    hot posting (the f² join blowup); real corpora instead use
    ``max_shingle_freq`` to drop boilerplate shingles."""
    return _jaccard_pairs(spark, sf_dir)


_MH_K, _MH_BANDS, _MH_N, _MH_T = 16, 4, 3, 0.5


def _minhash_mins_sql() -> str:
    """min-aggregate list mirroring dedup.minhash_signatures bit-for-bit:
    one md5 -> 31-bit base hash, then (a_i*h + b_i) mod P permutations."""
    P = D.MINHASH_P
    base = f"(CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {P})"
    return ",\n               ".join(
        f"min(({base} * {a} + {b}) % {P}) AS mh_{i}"
        for i, (a, b) in enumerate(D.minhash_coeffs(_MH_K))
    )


def _minhash_oracle() -> str:
    trigram = "[tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk) - 1)]"
    mins = _minhash_mins_sql()
    rows = _MH_K // _MH_BANDS
    bands = ",\n               ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows))
        + f")) AS band_{b}"
        for b in range(_MH_BANDS)
    )
    stacked = "\n        UNION ALL\n".join(
        f"        SELECT id, concat_ws('|', '{b}', band_{b}) AS bucket FROM banded"
        for b in range(_MH_BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN s1.mh_{i} = s2.mh_{i} THEN 1 ELSE 0 END" for i in range(_MH_K)
    )
    return f"""
    WITH norm AS (SELECT doc_id AS id, {_NORM_TOKS} AS tk FROM documents),
    p AS (SELECT id, unnest(list_distinct({trigram})) AS shingle FROM norm),
    sig AS (
        SELECT id,
               {mins}
        FROM p GROUP BY id),
    banded AS (
        SELECT id,
               {bands}
        FROM sig),
    stacked AS (
{stacked}),
    cand AS (
        SELECT DISTINCT a.id AS id1, b.id AS id2
        FROM stacked a JOIN stacked b ON a.bucket = b.bucket AND a.id < b.id)
    SELECT id1, id2, {round_ratio_sql(agree, str(_MH_K))} AS est_jaccard
    FROM cand
    JOIN sig s1 ON id1 = s1.id
    JOIN sig s2 ON id2 = s2.id
    WHERE {round_ratio_sql(agree, str(_MH_K))} >= {_MH_T}
    """


@query("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16) + 4-band LSH near-dup pairs, verified by signature
    agreement >= 0.5. The oracle reproduces the md5-derived hashes exactly,
    so candidates AND estimates match bit-for-bit."""
    return D.minhash_dedup_pairs(
        load(spark, sf_dir, "documents"),
        n=_MH_N, num_hashes=_MH_K, bands=_MH_BANDS, threshold=_MH_T,
    )


def _simhash_oracle() -> str:
    sums = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{j}"
        for j in range(D.SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(D.SIMHASH_BITS)
    )
    return f"""
    WITH norm AS (SELECT doc_id AS id, {_NORM_TOKS} AS tk FROM documents),
    p AS (SELECT id, unnest(tk) AS tok FROM norm),
    h AS (SELECT id, {_hash60_sql('tok', 0)} AS h FROM p),
    s AS (SELECT id,
               {sums}
          FROM h GROUP BY id)
    SELECT id AS doc_id, CAST({bits} AS BIGINT) AS simhash FROM s
    """


@query("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """32-bit SimHash signatures per document (near-dups = small Hamming
    distance; pair extraction via banded blocking is simhash_neardup_pairs)."""
    return D.simhash(load(spark, sf_dir, "documents")).select(
        F.col("id").alias("doc_id"), "simhash"
    )


@query(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 2000)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_cosine_similarity(a.v, b.v), 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.3
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs — exact all-pairs over a bounded
    corpus slice (vec_id < 2000). BLAS implementation (one numpy matmul
    per Arrow batch, ~20x the interpreted-fold expression path; results
    verified identical vs both the expression path and the DuckDB oracle).
    The unbounded scale paths: embedding_neardup_pairs(lsh_bits=k) for
    blocking, or tiled matmuls instead of a corpus broadcast."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 2000)
    return D.embedding_neardup_pairs_blas(emb, threshold=0.3)


# shared by the min-label and large-star/small-star catalog entries: the
# two distributed algorithms must land the identical labeling, and both
# are checked against DuckDB's recursive transitive closure
_CLUSTER_KEEP_ORACLE = f"""
    {_JACCARD_POSTING.replace("WITH norm", "WITH RECURSIVE norm", 1)},
    pairs AS (
        SELECT id1, id2
        FROM common
        JOIN sizes s1 ON id1 = s1.id
        JOIN sizes s2 ON id2 = s2.id
        WHERE {round_ratio_sql('c', 's1.n + s2.n - c')} >= 0.5),
    sym AS (SELECT id1 AS a, id2 AS b FROM pairs
            UNION SELECT id2, id1 FROM pairs),
    reach(id, r) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM sym)
        UNION
        SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r)
    SELECT id AS doc_id, min(r) AS component, (id = min(r)) AS keep
    FROM reach GROUP BY id
    """


@query("dedup_cluster_keep", _CLUSTER_KEEP_ORACLE)
def dedup_cluster_keep(spark, sf_dir):
    """Cluster-correct near-dup dedup: trigram-Jaccard pairs (>= 0.5) as
    edges -> connected components (operators/graph.py, iterative min-label
    propagation with per-round lineage truncation) -> keep the minimum
    doc_id per component. Correct where pairwise drop-id2 over-deletes
    chains (A~B, B~C with A!~C must keep exactly A). The oracle computes
    the same components via DuckDB's recursive transitive closure — an
    exact cross-engine check of an iterative distributed algorithm."""
    from .operators.graph import connected_components

    pairs = _jaccard_pairs(spark, sf_dir).select("id1", "id2")
    comp = connected_components(pairs)
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("id") == F.col("component")).alias("keep"),
    )


@query("dedup_cluster_keep_star", _CLUSTER_KEEP_ORACLE)
def dedup_cluster_keep_star(spark, sf_dir):
    """Same cluster-correct dedup via LARGE-STAR/SMALL-STAR components
    (operators/graph.connected_components_star) — the O(log n)-round
    variant for high-diameter graphs at 100 TB, where min-label's
    O(diameter) rounds are the bottleneck. Shares the min-label entry's
    recursive-closure oracle, so both distributed algorithms are proven
    to land the identical labeling."""
    from .operators.graph import connected_components_star

    pairs = _jaccard_pairs(spark, sf_dir).select("id1", "id2")
    comp = connected_components_star(pairs)
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("id") == F.col("component")).alias("keep"),
    )


@query(
    "cluster_aware_split_docs",
    f"""
    {_JACCARD_POSTING.replace("WITH norm", "WITH RECURSIVE norm", 1)},
    pairs AS (
        SELECT id1, id2
        FROM common
        JOIN sizes s1 ON id1 = s1.id
        JOIN sizes s2 ON id2 = s2.id
        WHERE {round_ratio_sql('c', 's1.n + s2.n - c')} >= 0.5),
    sym AS (SELECT id1 AS a, id2 AS b FROM pairs
            UNION SELECT id2, id1 FROM pairs),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r),
    comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id)
    SELECT doc_id, component,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, component,
                 {_hash60_sql('CAST(component AS VARCHAR)', 17)} % 100 AS bucket
          FROM comp) t
    """,
)
def cluster_aware_split_docs(spark, sf_dir):
    """Leakage-safe train/val/test split (operators/splits.py): trigram-
    Jaccard near-dup pairs -> connected components -> one deterministic
    md5-derived 90/5/5 split per COMPONENT, inherited by every member
    (singletons hash independently). By construction no near-dup pair
    straddles a split boundary; the oracle recomputes the components via
    DuckDB's recursive closure and replays the identical md5 bucket, so
    the assignment is proven bit-reproducible cross-engine."""
    from .operators.splits import cluster_aware_split

    docs = load(spark, sf_dir, "documents")
    pairs = _jaccard_pairs(spark, sf_dir).select("id1", "id2")
    return cluster_aware_split(docs, pairs, id_col="doc_id")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

# Exact brute-force top-10 oracle, shared by every EXACT ANN formulation
# (expression path and tiled-BLAS path compute the identical result).
_BRUTE_TOPK_ORACLE = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_cosine_similarity(q.v, c.v), 4) AS cosine,
           CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(q.v, c.v), 4) DESC, c.vec_id
           ) AS BIGINT) AS rank
    FROM e q JOIN e c ON c.vec_id != q.vec_id
    WHERE q.vec_id < 5
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY round(list_cosine_similarity(q.v, c.v), 4) DESC, c.vec_id
    ) <= 10
    """


@query("ann_cosine_topk", _BRUTE_TOPK_ORACLE)
def ann_cosine_topk(spark, sf_dir):
    """Exact cosine top-10 for 5 query vectors: broadcast queries x corpus
    scan + windowed rank (ties broken by neighbor_id; cosine rounded before
    ranking so both engines rank identically)."""
    emb = load(spark, sf_dir, "embeddings")
    out = SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


@query("ann_tiled_topk", _BRUTE_TOPK_ORACLE)
def ann_tiled_topk(spark, sf_dir):
    """Exact cosine top-10 via the TILED BLAS path (similarity.
    cosine_topk_blas_tiled): corpus and query sides packed into matrix
    blocks by distributed aggregation, block pairs cross-joined, one
    BLAS matmul per pair — no driver collect, no broadcast bound. Small
    blocks here force a real multi-block grid; the result is exact, so
    the brute-force oracle applies unchanged."""
    emb = load(spark, sf_dir, "embeddings")
    out = SIM.cosine_topk_blas_tiled(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        query_block_rows=2,
        corpus_block_rows=128,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


def _lsh_oracle(bits: int = 6, dim: int = 64) -> str:
    """Exact SQL twin of lsh_topk(bits=6, probe_hamming=1): the hyperplane
    signs are md5-derived constants (dedup._hyperplane_sign), so the
    bucketing is reproducible as literal ±1 arrays. Cosine is rounded to
    4 before ranking (same as ann_cosine_topk) so ulp-level summation
    drift never reorders ranks; bucket bits compare a O(1)-magnitude dot
    against 0, where 1e-13 drift is equally harmless."""
    from .operators.dedup import _hyperplane_sign

    bit_terms = " + ".join(
        "(CASE WHEN list_inner_product(v, ["
        + ", ".join(str(_hyperplane_sign(i, j)) for j in range(dim))
        + f"]) > 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(bits)
    )
    masks = ", ".join(f"({m})" for m in [0] + [1 << i for i in range(bits)])
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v, {bit_terms} AS bucket FROM e),
    q AS (SELECT * FROM s WHERE vec_id < 5),
    probes AS (
        SELECT q.vec_id, q.v, xor(q.bucket, m.m) AS bucket
        FROM q, (VALUES {masks}) m(m)),
    cand AS (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(p.v, c.v), 4) AS cosine
        FROM probes p JOIN s c USING (bucket)
        WHERE c.vec_id <> p.vec_id)
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS BIGINT) AS rank
    FROM cand
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) <= 10
    """


@query("ann_lsh_topk", _lsh_oracle())
def ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN (multi-probe hamming<=1). Approximate
    vs brute force (recall tested), but *deterministically* approximate:
    the md5-derived hyperplanes make the bucketing SQL-expressible, so
    the oracle replays the same blocking + in-bucket exact rerank."""
    emb = load(spark, sf_dir, "embeddings")
    out = SIM.lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, bits=6)
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# Multimodal (mapInPandas plumbing; codec stubbed -> rows-only checks)
# ---------------------------------------------------------------------------

def _mm_features_oracle() -> str:
    from .operators.multimodal import FEATURE_DIM

    accs = ",\n           ".join(
        f"sum(CASE WHEN (i - 1) % {FEATURE_DIM} = {j} THEN b ELSE 0 END) AS a_{j}"
        for j in range(FEATURE_DIM)
    )
    # Each element mirrors the Python decoder bit-for-bit (round_even ==
    # numpy half-even, cast to float32), then the float32 is re-widened to
    # double and scaled to integer micro-units for the CSV serialization —
    # the exact projection the Spark side applies, so the strings match
    # byte-for-byte.  (Values are non-negative, so Spark's HALF_UP round
    # and DuckDB's half-away-from-zero agree.)
    feats = ", ".join(
        "CAST(round(CAST("
        f"CAST(round_even(coalesce(a_{j}, 0) * 1.0 / greatest(m.nb, 1), 6) AS FLOAT)"
        " AS DOUBLE) * 1000000) AS BIGINT)"
        for j in range(FEATURE_DIM)
    )
    return f"""
    WITH m AS (SELECT doc_id AS media_id, text, octet_length(encode(text)) AS nb
               FROM documents),
    ch AS (
        SELECT media_id, CAST(u.i AS BIGINT) AS i,
               unicode(substr(text, CAST(u.i AS INTEGER), 1)) AS b
        FROM m, UNNEST(generate_series(1, m.nb)) AS u(i)),
    acc AS (
        SELECT media_id,
               {accs}
        FROM ch GROUP BY media_id)
    SELECT m.media_id, CAST(m.nb AS BIGINT) AS n_bytes,
           array_to_string(list_transform([{feats}],
               x -> CAST(x AS VARCHAR)), ',') AS feature_csv
    FROM m LEFT JOIN acc USING (media_id)
    """


@query("mm_extract_features", _mm_features_oracle())
def mm_extract_features(spark, sf_dir):
    """Binary media column -> fixed-dim feature vectors via mapInPandas
    (operators/multimodal.py). The deterministic byte-histogram decoder
    stands in for the codec — and because it's pure byte arithmetic the
    Python stage gets an EXACT SQL oracle (the corpus is ASCII, so
    per-position code points are the payload bytes; round_even matches
    Python's banker's rounding; floats compared as float32). A real
    decoder plugs in via ``decoder=``; schema/batching stay identical.

    Catalog-facing projection: the float32 feature vector is serialized
    to integer micro-units CSV (round(f64(f32) * 1e6)) because the
    driver's pandas canonicalizer can't hash list cells
    (CORRECTNESS_r01 err 'unhashable type: list'); the operator API
    keeps the raw array<float>."""
    from .operators import multimodal as MM

    docs = load(spark, sf_dir, "documents")
    media = MM.synthesize_media_table(spark, docs)
    out = MM.extract_features(media)
    return out.select(
        "media_id",
        "n_bytes",
        F.concat_ws(
            ",",
            F.transform(
                F.col("feature"),
                lambda x: F.round(x.cast("double") * 1000000)
                .cast("long")
                .cast("string"),
            ),
        ).alias("feature_csv"),
    )


@query(
    "mm_frame_sample",
    """
    WITH m AS (
        SELECT doc_id AS media_id, text,
               length(text) * 10 AS duration_ms
        FROM documents WHERE doc_id < 50),
    n AS (
        SELECT media_id, text,
               CASE WHEN duration_ms = 0 THEN 1
                    ELSE greatest(duration_ms // 1000, 1) END AS n_frames
        FROM m)
    SELECT media_id,
           CAST(u.i AS INTEGER) AS frame_idx,
           hex(encode(substr(text, CAST(u.i * 16 + 1 AS INTEGER), 16))) AS frame_hex
    FROM n, UNNEST(generate_series(0, n_frames - 1)) AS u(i)
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Per-interval frame sampling with explode-style fan-out inside the
    Pandas iterator (one row per sampled frame). The deterministic stub
    slices 16-byte pseudo-frames, so the fan-out row set has an exact SQL
    twin (doc_id < 50 keeps the fixture deterministic — limit() isn't; the
    frame goes out hex-encoded because binary columns collect as bytearray
    on one engine and bytes on the other, which hash differently)."""
    from .operators import multimodal as MM

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = MM.synthesize_media_table(spark, docs, media_type="video")
    frames = MM.sample_frames(media, every_ms=1000)
    return frames.select("media_id", "frame_idx", F.hex("frame").alias("frame_hex"))


# ---------------------------------------------------------------------------
# Streaming (Structured Streaming run to completion on the bounded source;
# result is the final materialized table — oracle = batch window agg)
# ---------------------------------------------------------------------------

@query(
    "stream_windowed_counts",
    """
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS window_end,
           event_type,
           count(*) AS n_events,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_windowed_counts(spark, sf_dir):
    """Watermarked tumbling-window counts via Structured Streaming, driven
    to completion on the bounded file source (streaming/ingest.py). The
    oracle is the equivalent batch window agg — stream-batch parity is the
    correctness contract."""
    import shutil
    import tempfile
    import uuid

    from .streaming.ingest import stream_source, windowed_event_counts

    # file streams need a *directory* source; stage the bounded input
    stage = tempfile.mkdtemp(prefix="stream_events_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stage}/part-0.parquet")
    stream = stream_source(spark, stage)
    name = f"swc_{uuid.uuid4().hex[:8]}"
    # State-store commits happen once per shuffle partition per micro-batch
    # — size the stateful-agg partition count to the bounded local input
    # (a cluster job sizes it to executor count x window-key cardinality;
    # the setting is baked into the checkpoint at first start).
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            windowed_event_counts(stream, window="1 hour")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Flagship composite: corpus cleaning (the full LLM-data pass)
# ---------------------------------------------------------------------------

_QUALITY_SQL = f"""
        SELECT doc_id,
               (least(len(tk), 100) * 40
                + CASE WHEN len(tk) = 0 THEN 0 ELSE floor(3000.0 * len(list_distinct(tk)) / len(tk)) END
                + CASE WHEN len(tk) = 0 THEN 0 ELSE least(floor(30000.0 * len(list_filter(tk, x -> lower(x) IN ({_STOPLIST}))) / len(tk)), 3000) END
               ) / 10000.0 AS quality_score
        FROM (SELECT doc_id, {_TOKS} AS tk FROM documents) t
"""


@query(
    "corpus_clean_pipeline",
    f"""
    WITH q AS ({_QUALITY_SQL}),
    kept AS (
        SELECT d.doc_id, d.text, q.quality_score
        FROM documents d JOIN q USING (doc_id)
        WHERE q.quality_score >= 0.5),
    exact AS (
        SELECT doc_id, text, quality_score FROM kept
        QUALIFY row_number() OVER (
            PARTITION BY md5({_NORM}) ORDER BY doc_id) = 1),
    norm AS (SELECT doc_id AS id, {_NORM_TOKS} AS tk FROM exact),
    p0 AS (SELECT id, unnest(list_distinct({_TRIGRAMS})) AS sh FROM norm),
    p AS (SELECT id, {_hash60_sql('sh', 99)} AS shingle FROM p0),
    sizes AS (SELECT id, count(*) AS n FROM p GROUP BY id),
    common AS (
        SELECT a.id AS id1, b.id AS id2, count(*) AS c
        FROM p a JOIN p b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY 1, 2),
    neardup AS (
        SELECT DISTINCT id2 FROM common
        JOIN sizes s1 ON id1 = s1.id
        JOIN sizes s2 ON id2 = s2.id
        WHERE {round_ratio_sql('c', 's1.n + s2.n - c')} >= 0.5)
    SELECT doc_id, quality_score FROM exact
    WHERE doc_id NOT IN (SELECT id2 FROM neardup)
    """,
)
def corpus_clean_pipeline(spark, sf_dir):
    """The full training-corpus cleaning pass, end to end:

    quality scoring (shuffle-free projection) -> quality filter (>= 0.5)
    -> exact dedup (hash shuffle on fingerprint, lowest id wins) ->
    trigram-Jaccard near-dup pairs among survivors (inverted-index join)
    -> drop the higher id of every near-dup pair. One oracle covers the
    whole chain, so stage composition errors (e.g. pairing against
    pre-filter docs) are caught, not just per-stage correctness.
    """
    from .operators.dedup import exact_dedup, ngram_jaccard_pairs
    from .operators.text import with_quality_score

    docs = load(spark, sf_dir, "documents")
    kept = (
        with_quality_score(docs)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id", "text", "quality_score")
    )
    # the deduped survivor set feeds BOTH the near-dup pair mining and
    # the final anti-join; checkpoint (lazily) so the scan + quality
    # projection + fingerprint shuffle run once, not once per consumer —
    # write-once/read-twice beats compute-twice at any scale (r04→r05
    # bench: ~2.4s → ~2.1s at sf0.1)
    unique = (
        exact_dedup(kept)
        .select("doc_id", "text", "quality_score")
        .localCheckpoint(eager=False)
    )
    pairs = ngram_jaccard_pairs(unique, n=3, threshold=0.5, max_shingle_freq=None)
    dup_ids = pairs.select(F.col("id2").alias("doc_id")).distinct()
    return unique.join(dup_ids, "doc_id", "left_anti").select("doc_id", "quality_score")


# ---------------------------------------------------------------------------
# Chunking + PII (training-data preparation passes)
# ---------------------------------------------------------------------------

@query(
    "chunk_documents_windows",
    f"""
    WITH t AS (SELECT doc_id, tk, len(tk) AS n
               FROM (SELECT doc_id, {_TOKS} AS tk FROM documents) x),
    c AS (SELECT doc_id, tk, n,
                 unnest(range(1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS INT))) AS i
          FROM t)
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           array_to_string(tk[i*24 + 1 : i*24 + 32], ' ') AS chunk_text,
           CAST(least(n - i*24, 32) AS BIGINT) AS n_tokens
    FROM c
    """,
)
def chunk_documents_windows(spark, sf_dir):
    """Overlapping token-window chunking (32-token windows, 8-token
    overlap -> stride 24): the context-length-bound split every training
    pipeline runs before tokenization. Shuffle-free explode fan-out."""
    from .operators.chunking import chunk_documents

    return chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@query(
    "scrub_pii_text",
    r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\+?[0-9]{1,4}[()\-\s][0-9()\-\s]{5,}[0-9]', '<PHONE>', 'g'),
               '[0-9]{9,}', '<NUM>', 'g') AS text_scrubbed
    FROM documents
    """,
)
def scrub_pii_text(spark, sf_dir):
    """PII redaction pass (emails / phones / long digit runs), JVM-side
    regexp_replace chain — lookaround-free patterns so Spark's Java regex
    and the oracle's engine agree. (This corpus is synthetic and clean,
    so the pass is an identity here; behavior is pinned by unit tests
    with planted PII.)"""
    from .operators.chunking import scrub_pii

    return scrub_pii(load(spark, sf_dir, "documents")).select("doc_id", "text_scrubbed")


# ---------------------------------------------------------------------------
# Corpus statistics (vocabulary, TF-IDF) + reproducible sampling
# ---------------------------------------------------------------------------

@query(
    "vocab_top_terms",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_NORM_TOKS}) AS term FROM documents)
    SELECT term,
           count(*) AS tf,
           count(DISTINCT doc_id) AS df
    FROM tok GROUP BY term
    QUALIFY row_number() OVER (ORDER BY count(*) DESC, term) <= 50
    """,
)
def vocab_top_terms(spark, sf_dir):
    """Corpus vocabulary: top-50 terms by total frequency with document
    frequency — the pre-pass for tokenizer/vocab builds. Partial
    aggregation makes the explode cheap; the global top-k is a real
    TakeOrderedAndProject (per-partition top-50 heaps merged on the
    driver — no global sort, no single-partition window; asserted in
    test_plans.py) on the already-aggregated distinct-term set."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(TX.normalized_text(F.col("text")))).alias("term")
    )
    counts = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    return counts.orderBy(F.col("tf").desc(), F.col("term").asc()).limit(50)


@query(
    "tfidf_top_terms",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_NORM_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM tok)
    SELECT doc_id, term,
           round(tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 4) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    QUALIFY row_number() OVER (
        PARTITION BY doc_id
        ORDER BY round(tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 4) DESC, term
    ) <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (smoothed idf = ln((N+1)/(df+1))+1,
    sklearn's convention). The document-frequency table is tiny after
    aggregation -> broadcast back onto the term-frequency table; scores
    are rounded BEFORE the rank so both engines break ties identically."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(TX.normalized_text(F.col("text")))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df and N derive from the AGGREGATED tf table, not from tok: the
    # tokenize+explode subtree is narrow (no exchange), so a consumer
    # keyed differently re-runs it — three tokenization passes over the
    # corpus at scale. tf's exchange subtree is identical across all
    # three consumers and gets ReuseExchange'd: tokenize ONCE, and the
    # df/N aggregations read (doc,term) rows, not the raw token stream.
    # (tf has one row per distinct (doc, term), so count == countDistinct
    # doc per term, and countDistinct doc over tf == over tok.)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = tf.select(F.countDistinct("doc_id").alias("n"))
    score = F.round(
        F.col("tf") * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0), 4
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "sample_stratified_hash",
    f"""
    WITH h AS (
        SELECT event_id, event_type,
               {_hash60_sql("CAST(event_id AS VARCHAR)", 7)} % 100 AS bucket
        FROM events)
    SELECT event_id, event_type FROM h
    WHERE bucket < (CASE WHEN event_type = 'purchase' THEN 50 ELSE 5 END)
    """,
)
def sample_stratified_hash(spark, sf_dir):
    """Reproducible stratified sampling: md5-hash buckets per row id, with
    per-stratum rates (50% purchases, 5% everything else). Unlike
    df.sample()/sampleBy(), the same row set comes back on every engine,
    every run, every partitioning — the property training-data pipelines
    need for auditable subsets. Pure projection+filter: no shuffle."""
    from .operators.dedup import md5_hash60

    ev = load(spark, sf_dir, "events")
    bucket = md5_hash60(F.col("event_id").cast("string"), 7) % 100
    rate = F.when(F.col("event_type") == "purchase", 50).otherwise(5)
    return ev.filter(bucket < rate).select("event_id", "event_type")


@query(
    "stream_click_attribution",
    """
    SELECT c.event_id AS click_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
           p.event_id AS purchase_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.user_id = c.user_id
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) < CAST(c.ts AS TIMESTAMP) + INTERVAL 60 MINUTE
    """,
)
def stream_click_attribution(spark, sf_dir):
    """Watermarked stream-stream join (streaming/ingest.attribute_purchases)
    driven to completion on the bounded file source: purchases attributed
    to same-user clicks in the preceding hour. Both sides watermarked +
    time-bounded join condition = bounded state; the oracle is the batch
    inequality join."""
    import shutil
    import tempfile
    import uuid

    from .streaming.ingest import attribute_purchases, stream_source

    stage = tempfile.mkdtemp(prefix="stream_events_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stage}/part-0.parquet")
    stream = stream_source(spark, stage)
    name = f"sca_{uuid.uuid4().hex[:8]}"
    # stream-stream join state = 4 state stores PER shuffle partition;
    # size the partition count to the bounded local input (a cluster job
    # sizes it to executor count x state volume instead)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            attribute_purchases(stream, 60)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name)


def _incremental_oracle() -> str:
    trigram = "[tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk) - 1)]"
    rows = _MH_K // _MH_BANDS
    mins = _minhash_mins_sql()
    bands = ",\n               ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows))
        + f")) AS band_{b}"
        for b in range(_MH_BANDS)
    )
    stacked = "\n        UNION ALL\n".join(
        f"        SELECT id, concat_ws('|', '{b}', band_{b}) AS bucket FROM banded"
        for b in range(_MH_BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN s1.mh_{i} = s2.mh_{i} THEN 1 ELSE 0 END" for i in range(_MH_K)
    )
    return f"""
    WITH norm AS (SELECT doc_id AS id, {_NORM_TOKS} AS tk FROM documents),
    p AS (SELECT id, unnest(list_distinct({trigram})) AS shingle FROM norm),
    sig AS (
        SELECT id,
               {mins}
        FROM p GROUP BY id),
    banded AS (
        SELECT id,
               {bands}
        FROM sig),
    stacked AS (
{stacked}),
    newb AS (SELECT * FROM stacked WHERE id % 2 = 1),
    oldb AS (SELECT * FROM stacked WHERE id % 2 = 0),
    cand AS (
        SELECT DISTINCT n.id AS new_id, o.id AS old_id
        FROM newb n JOIN oldb o USING (bucket)
        UNION
        SELECT DISTINCT a.id AS new_id, b.id AS old_id
        FROM newb a JOIN newb b ON a.bucket = b.bucket AND a.id > b.id),
    dup AS (
        SELECT DISTINCT c.new_id
        FROM cand c
        JOIN sig s1 ON c.new_id = s1.id
        JOIN sig s2 ON c.old_id = s2.id
        WHERE ({agree}) / {float(_MH_K)} >= {_MH_T})
    SELECT id AS doc_id FROM norm
    WHERE id % 2 = 1 AND id NOT IN (SELECT new_id FROM dup)
    """


@query("dedup_incremental_batch", _incremental_oracle())
def dedup_incremental_batch(spark, sf_dir):
    """Incremental corpus dedup (operators/dedup.incremental_neardup_filter):
    even doc_ids form the already-ingested corpus (present ONLY as a
    MinHash signature table, never text), odd ids arrive as the new batch;
    the result is the batch ids that survive both the vs-corpus and the
    within-batch near-dup checks. The oracle reproduces the md5-derived
    signatures, banding and agreement verification bit-for-bit — the
    continual-ingest path gets the same exact gate as the batch one."""
    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    corpus_sigs = D.minhash_signatures(corpus, n=_MH_N, num_hashes=_MH_K)
    kept, _sigs = D.incremental_neardup_filter(
        batch, corpus_sigs, n=_MH_N, num_hashes=_MH_K, bands=_MH_BANDS, threshold=_MH_T
    )
    return kept.select("doc_id")


def _ivf_centroids_numpy(sf_dir: str, n_centroids=16, sample_rows=2048, iters=5):
    """Spark-free twin of similarity.train_ivf_centroids: same sample (the
    ``sample_rows`` lowest vec_ids), same float64 widening, same Lloyd
    loop with argmax ties to the lowest centroid — identical numpy ops on
    identical input produce bit-identical centroids, which is what makes
    the quantizer SQL-replayable at all."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    # sort + slice in Arrow BEFORE pandas conversion: this runs at module
    # import, so only sample_rows rows may pay the python-object cost
    pdf = t.sort_by("vec_id").slice(0, sample_rows).to_pandas()
    x = np.array([np.asarray(v, dtype="float64") for v in pdf["embedding"]])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = x[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cents[c] = m / np.linalg.norm(m)
    return cents


def _ivf_oracle(n_centroids=16, nprobe=4, k=10) -> str | None:
    """Exact SQL twin of ivf_topk(16, nprobe=4): retrains the deterministic
    coarse quantizer OUTSIDE Spark (pure numpy over the parquet file) and
    embeds the centroids as full-precision literals (repr() round-trips
    float64 exactly), then replays assignment, probe selection and the
    in-list rerank in SQL. Assignment/probing rank RAW inner products —
    argmax/arg-top-n over ``v·c`` equal those over ``(v/|v|)·c`` since
    |v|>0 scaling is rank-invariant — so the oracle needs no sqrt at all
    outside the final (rounded-to-4) cosine. Drift would need two centroid
    dots within ~1e-13 to matter, far below the data's similarity spread.

    Trained on the gate SF's data (the contract fixes oracle comparison at
    sf=0.01; ``SPARK_GRAFT_ORACLE_SF_DIR`` overrides for local runs at
    other SFs). Returns None when that parquet is unreadable -> the query
    registers oracle-less (rows-only), exactly the pre-round-3 state."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    try:
        cents = _ivf_centroids_numpy(sf_dir, n_centroids)
    except Exception as exc:  # noqa: BLE001
        # ANY unreadable-parquet failure downgrades to rows-only — and
        # never silently. Broad on purpose: pyarrow raises ArrowInvalid
        # (a ValueError subclass, not OSError) for corrupt/truncated
        # files, and this runs at catalog import where an escape would
        # take down every query, not just this one.
        import sys

        print(f"_ivf_oracle: rows-only fallback ({exc})", file=sys.stderr)
        return None
    cent_rows = ",\n        ".join(
        f"({cid}, [{', '.join(repr(float(v)) for v in row)}]::DOUBLE[])"
        for cid, row in enumerate(cents)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent(cid, c) AS (VALUES
        {cent_rows}),
    sims AS (
        SELECT e.vec_id, e.v, cent.cid, list_inner_product(e.v, cent.c) AS s
        FROM e, cent),
    assign AS (
        SELECT vec_id, v, cid AS centroid_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
            FROM sims) WHERE rn = 1),
    probes AS (
        SELECT vec_id AS query_id, v AS qv, cid AS centroid_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
            FROM sims WHERE vec_id < 5) WHERE rn <= {nprobe}),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               round(list_cosine_similarity(p.qv, a.v), 4) AS cosine
        FROM probes p JOIN assign a USING (centroid_id)
        WHERE a.vec_id <> p.query_id)
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS BIGINT) AS rank
    FROM cand
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) <= {k}
    """


# Built once: both IVF catalog entries (driver- and distributed-assignment)
# share the identical oracle because the two plans are bit-identical by
# design (same centroids, same stable argsort probe sets, same rerank).
_IVF_ORACLE_SQL = _ivf_oracle()


@query("ann_ivf_topk", _IVF_ORACLE_SQL)
def ann_ivf_topk(spark, sf_dir):
    """IVF ANN (operators/similarity.ivf_topk): spherical-kmeans coarse
    quantizer (trained on a deterministic driver sample, FAISS-style),
    BLAS centroid assignment, nprobe posting-list probing, exact in-list
    rerank. With nprobe == n_centroids it equals brute force exactly
    (asserted in tests); recall@10 = 0.84 at nprobe 4/16 on this corpus.
    The oracle (_ivf_oracle) retrains the deterministic quantizer in pure
    numpy and replays assignment + probing + rerank in SQL — the same
    replay treatment _lsh_oracle gives the hyperplane sketch."""
    emb = load(spark, sf_dir, "embeddings")
    out = SIM.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_centroids=16, nprobe=4
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@query("ann_ivf_topk_distributed", _IVF_ORACLE_SQL)
def ann_ivf_topk_distributed(spark, sf_dir):
    """The corpus-scale-query IVF path (operators/similarity.ivf_topk with
    assignment="distributed"): queries stay a DataFrame end to end — probe
    sets come from the same stable argsort inside a mapInPandas over the
    query partitions (centroids broadcast, never the queries), and the
    posting-list join shuffles by centroid_id with AQE skew-join splitting
    the hot lists. Bit-identical to ann_ivf_topk by construction (parity
    asserted in tests/test_text_dedup_similarity.py), so it shares the
    same _ivf_oracle SQL — this entry promotes the scale path from
    parity-tested to driver-green in its own right."""
    emb = load(spark, sf_dir, "embeddings")
    out = SIM.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        n_centroids=16,
        nprobe=4,
        assignment="distributed",
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@query(
    "text_repetition_signals",
    f"""
    WITH t AS (SELECT doc_id, {_NORM_TOKS} AS tk FROM documents),
    base AS (
        SELECT doc_id, len(tk) AS n,
               CASE WHEN len(tk) >= 2
                    THEN [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]
                    ELSE []::VARCHAR[] END AS bigrams
        FROM t),
    bg AS (SELECT doc_id, unnest(bigrams) AS g FROM base),
    freq AS (
        SELECT doc_id, g, count(*) AS c
        FROM bg GROUP BY doc_id, g),
    agg AS (
        SELECT doc_id,
               max(c) AS top_c,
               CAST(sum(c) AS BIGINT) AS total,
               CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tokens
        FROM freq GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(coalesce(floor(a.top_c * 10000 / a.total), 0) AS BIGINT) AS top_bigram_bp,
           CAST(coalesce(floor(a.dup_tokens * 10000 / a.total), 0) AS BIGINT) AS dup_bigram_bp
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def text_repetition_signals(spark, sf_dir):
    """Repetition quality signals in the style of the published Gopher /
    MassiveText filters: the most-frequent bigram's share of all bigrams,
    and the share of bigram occurrences that are repeats — high values
    flag boilerplate/spam for corpus filtering. Exact integer basis
    points; one explode + two aggregations, all map-side combined."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", TX.tokens(TX.normalized_text(F.col("text"))).alias("tk")
    )
    # bigrams via posexplode + lead window, NOT transform(sequence(...)):
    # an interpreted HOF as a generator child re-evaluates the whole array
    # per EMITTED row (quadratic in doc length — measured 30s vs 1s at
    # sf0.1); posexplode+lead stays in whole-stage codegen and its doc_id
    # shuffle is reused by the groupBy below
    pos = t.select("doc_id", F.posexplode("tk").alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        pos.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", F.col("tok"), F.col("nxt")).alias("g"))
    )
    freq = bg.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    agg = freq.groupBy("doc_id").agg(
        F.max("c").alias("top_c"),
        F.sum("c").alias("total"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_tokens"),
    )
    return t.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.floor(F.col("top_c") * 10000 / F.col("total")), F.lit(0))
        .cast("long")
        .alias("top_bigram_bp"),
        F.coalesce(F.floor(F.col("dup_tokens") * 10000 / F.col("total")), F.lit(0))
        .cast("long")
        .alias("dup_bigram_bp"),
    )


@query(
    "dedup_chunks_exact",
    f"""
    WITH t AS (SELECT doc_id, tk, len(tk) AS n
               FROM (SELECT doc_id, {_TOKS} AS tk FROM documents) x),
    c AS (SELECT doc_id, tk, n,
                 unnest(range(1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS INT))) AS i
          FROM t),
    ch AS (
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               md5(array_to_string(tk[i*24 + 1 : i*24 + 32], ' ')) AS fp
        FROM c),
    keep AS (
        SELECT doc_id, chunk_idx, fp,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id, chunk_idx) = 1 AS kept
        FROM ch)
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM keep GROUP BY doc_id
    """,
)
def dedup_chunks_exact(spark, sf_dir):
    """Chunk-level exact dedup: split every document into overlapping
    token windows (operators/chunking.py), fingerprint each chunk, keep
    the corpus-wide first occurrence per fingerprint — the pass that
    catches copy-pasted passages inside otherwise-distinct documents
    (doc-level dedup can't). Output: per-doc chunk count and survivors.
    One chunk-fingerprint shuffle; windows never leave the executor."""
    from .operators.chunking import chunk_documents

    chunks = chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    ).select("doc_id", "chunk_idx", F.md5(F.col("chunk_text")).alias("fp"))
    w = Window.partitionBy("fp").orderBy("doc_id", "chunk_idx")
    kept = chunks.withColumn("kept", F.row_number().over(w) == 1)
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
    )


@query(
    "emb_quantize_int8",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS scale
          FROM e)
    SELECT vec_id,
           round(scale, 6) AS scale,
           CASE WHEN scale > 0
                THEN array_to_string(list_transform(v,
                     x -> CAST(CAST(floor(x * 127 / scale) AS INTEGER) AS VARCHAR)), ',')
                ELSE array_to_string(list_transform(v, x -> '0'), ',') END AS qvec_csv,
           CASE WHEN scale > 0
                THEN round(list_max(list_transform(v,
                     x -> abs(x - floor(x * 127 / scale) * scale / 127))), 6)
                ELSE 0.0 END AS max_err
    FROM s
    """,
)
def emb_quantize_int8(spark, sf_dir):
    """Symmetric int8 embedding quantization
    (operators/similarity.quantize_embeddings_int8): 4x storage cut for
    the similarity index, exact per-vector error bound reported. floor
    (not round) keeps the quantized codes bit-identical across engines.
    The catalog-facing projection serializes the code array to a CSV
    string (the driver's pandas canonicalizer can't hash list cells —
    CORRECTNESS_r01 recorded err 'unhashable type: list'); the operator
    API keeps the raw array<tinyint>."""
    q = SIM.quantize_embeddings_int8(load(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale",
        F.concat_ws(",", F.transform(F.col("qvec"), lambda x: x.cast("string")))
        .alias("qvec_csv"),
        "max_err",
    )


# ---------------------------------------------------------------------------
# Embedding analytics: second-order stats, quantized retrieval, label stats
# ---------------------------------------------------------------------------

_Q_INT8_SQL = """
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sc AS (SELECT vec_id, v,
                  list_max(list_transform(v, x -> abs(x))) AS rscale
           FROM e),
    q AS (SELECT vec_id, rscale,
                 CASE WHEN rscale > 0
                      THEN list_transform(v, x -> CAST(floor(x * 127 / rscale) AS BIGINT))
                      ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
          FROM sc)
"""


@query(
    "emb_gram_int8",
    f"""
    WITH {_Q_INT8_SQL},
    u AS (SELECT vec_id, t.i AS i, qv[t.i] AS qi
          FROM q, unnest(generate_series(1, len(qv))) AS t(i))
    SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
           CAST(sum(a.qi * b.qi) AS BIGINT) AS g
    FROM u a JOIN u b USING (vec_id)
    GROUP BY 1, 2
    """,
)
def emb_gram_int8(spark, sf_dir):
    """Exact d x d Gram matrix over int8-quantized embeddings
    (operators/pca.gram_int8): per-partition numpy partial matmuls, one
    tiny (partitions x d²) reduce — the shuffle never carries row data.
    Integer accumulation makes the result order-independent, so the
    SQL oracle (which must explode to rows x d² — the shape Spark
    deliberately avoids) matches bit-for-bit."""
    from .operators.pca import gram_int8

    g = gram_int8(load(spark, sf_dir, "embeddings"))
    return g.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.col("g").alias("g"),
    )


@query(
    "ann_int8_topk",
    f"""
    WITH {_Q_INT8_SQL},
    qry AS (SELECT vec_id AS query_id, rscale AS q_rscale, qv AS q_qv
            FROM q WHERE vec_id < 5),
    p AS (
        SELECT r.query_id, c.vec_id AS neighbor_id,
               CAST(list_dot_product(CAST(c.qv AS DOUBLE[]),
                                     CAST(r.q_qv AS DOUBLE[])) AS BIGINT) AS qdot,
               c.rscale, r.q_rscale
        FROM q c, qry r
        WHERE c.vec_id != r.query_id)
    SELECT query_id, neighbor_id, qdot,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY qdot * rscale * q_rscale DESC, neighbor_id) AS BIGINT) AS rank
    FROM p
    QUALIFY rank <= 10
    """,
)
def ann_int8_topk(spark, sf_dir):
    """Quantized similarity search: top-10 neighbors scored on int8 codes
    (operators/similarity.quantize_embeddings_int8). The integer dot
    product is exact on both engines; ranking dequantizes with the RAW
    per-vector scale (identical float64 on both sides — no rounding in
    the sort key). Output carries only integers, so the oracle hash is
    exact. This is the memory-bound retrieval pattern: scan 4x less data
    than float32, rerank survivors against the originals if needed."""
    emb = load(spark, sf_dir, "embeddings")
    raw = emb.select(
        "vec_id",
        F.array_max(
            F.transform(F.col("embedding").cast("array<double>"), lambda x: F.abs(x))
        ).alias("rscale"),
    )
    q = (
        SIM.quantize_embeddings_int8(emb)
        .select("vec_id", "qvec")
        .join(raw, "vec_id")
    )
    qry = q.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("rscale").alias("q_rscale"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("q_qvec"), lambda x, y: x.cast("long") * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = (
        q.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            qdot.alias("qdot"),
            "rscale",
            "q_rscale",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        (F.col("qdot") * F.col("rscale") * F.col("q_rscale")).desc(),
        F.col("neighbor_id").asc(),
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "qdot", "rank")
    )


@query(
    "emb_label_centroids",
    f"""
    WITH {_Q_INT8_SQL},
    lab AS (SELECT vec_id, label FROM embeddings),
    u AS (SELECT l.label, t.pos AS pos, q.qv[t.pos] AS code
          FROM q JOIN lab l USING (vec_id),
               unnest(generate_series(1, len(q.qv))) AS t(pos)),
    agg AS (SELECT label, pos,
                   CAST(sum(code) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM u GROUP BY 1, 2)
    SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos, n,
           (s - ((s % n) + n) % n) // n AS centroid_code
    FROM agg
    """,
)
def emb_label_centroids(spark, sf_dir):
    """Per-label centroid in int8 code space: one row per (label, dim).
    Map-side partial aggregation means the shuffle carries labels x d
    rows per partition, not the vectors. floor(s/n) is computed with an
    explicit non-negative remainder ((s%n)+n)%n because Spark's DIV and
    DuckDB's // disagree on negative dividends (truncate vs floor) —
    subtracting the remainder first makes the division exact in both."""
    emb = load(spark, sf_dir, "embeddings")
    q = SIM.quantize_embeddings_int8(emb).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    ex = q.select("label", F.posexplode("qvec").alias("pos", "code"))
    agg = ex.groupBy("label", "pos").agg(
        F.sum("code").alias("s"), F.count(F.lit(1)).alias("n")
    )
    r = ((F.col("s") % F.col("n")) + F.col("n")) % F.col("n")
    return agg.select(
        F.col("label").cast("long").alias("label"),
        (F.col("pos") + 1).cast("long").alias("pos"),
        F.col("n"),
        F.expr("(s - (((s % n) + n) % n)) DIV n").alias("centroid_code"),
    )


@query(
    "text_unigram_lm_score",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    ex AS (SELECT doc_id, unnest(tk) AS tok FROM t),
    tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM ex GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM tf),
    fb AS (SELECT tok, (1000000000 * c) // total AS fppb FROM tf, tot),
    d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(fppb) AS BIGINT) AS s
          FROM ex JOIN fb USING (tok) GROUP BY 1)
    SELECT t.doc_id,
           coalesce(d.n, 0) AS n_tokens,
           CASE WHEN coalesce(d.n, 0) = 0 THEN 0 ELSE d.s // d.n END AS mean_tf_ppb
    FROM t LEFT JOIN d USING (doc_id)
    """,
)
def text_unigram_lm_score(spark, sf_dir):
    """Unigram language-model score per document: mean corpus frequency
    of the document's tokens, in parts-per-billion — the cheap rare-token
    / gibberish detector (low score = many corpus-rare tokens). All
    ratios are floored exact-integer math, so the oracle matches
    bit-for-bit. One token shuffle for the frequency table (map-side
    combined), one join back (AQE broadcasts the frequency table when it
    is small), one per-doc aggregation."""
    from .operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("tk"))
    ex = t.select("doc_id", F.explode("tk").alias("tok"))
    # NOTE (round 8): a tokenize-once rewrite through a per-(doc, token)
    # count table was tried and REVERTED — it replaces the second
    # scan+tokenize pass with a corpus-scale shuffle of token STRINGS
    # (the payload, against the "shuffle sketches, not payloads" rule)
    # and measured 2x the CPU at sf0.1 (interleaved legs 0.47 vs 0.90
    # s/run). Unlike tfidf_top_terms, this query's second consumer
    # needs per-OCCURRENCE rows, so the only shared exchange would be
    # occurrence-sized. The two branches below each re-scan and
    # re-tokenize — local CPU, zero extra network.
    tf = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = tf.agg(F.sum("c").alias("total"))
    fb = tf.crossJoin(F.broadcast(tot)).select(
        "tok", F.expr("(1000000000 * c) DIV total").alias("fppb")
    )
    d = (
        ex.join(fb, "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("fppb").alias("s"))
    )
    return t.join(d, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_tokens"),
        F.when(F.coalesce(F.col("n"), F.lit(0)) == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("s DIV n"))
        .alias("mean_tf_ppb"),
    )


@query(
    "stream_dedup_events",
    """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    """,
)
def stream_dedup_events(spark, sf_dir):
    """Streaming exactly-once dedup: the bounded source is staged TWICE
    (two files, forced into separate micro-batches via maxFilesPerTrigger)
    and ``dropDuplicates`` on the key holds seen-key state ACROSS
    micro-batches — every event comes out exactly once even though every
    event arrives twice. The oracle is the plain batch table. In
    production the watermark bounds the seen-key state window (use
    dropDuplicatesWithinWatermark when late replays are bounded in
    time); here the key set is small enough to hold fully."""
    import shutil
    import tempfile
    import uuid

    from .streaming.ingest import stream_source

    stage = tempfile.mkdtemp(prefix="stream_dup_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stage}/part-0.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stage}/part-1.parquet")
    stream = stream_source(spark, stage, max_files_per_trigger=1)
    name = f"sde_{uuid.uuid4().hex[:8]}"
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.withWatermark("ts", "10 minutes")
            .dropDuplicates(["event_id"])
            .select("event_id", "ts", "user_id", "event_type", "value")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name)


@query(
    "table_profile_orders",
    """
    WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(o_orderkey) AS BIGINT) AS nn_orderkey,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd_orderkey,
               CAST(count(*) - count(o_custkey) AS BIGINT) AS nn_custkey,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_custkey,
               CAST(count(*) - count(o_orderstatus) AS BIGINT) AS nn_orderstatus,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_orderstatus,
               CAST(count(*) - count(o_totalprice) AS BIGINT) AS nn_totalprice,
               CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd_totalprice,
               CAST(count(*) - count(o_orderdate) AS BIGINT) AS nn_orderdate,
               CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd_orderdate,
               CAST(count(*) - count(o_orderpriority) AS BIGINT) AS nn_orderpriority,
               CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd_orderpriority
        FROM orders)
    SELECT u.col AS column_name, u.n_nulls, u.n_distinct, s.n_rows
    FROM s, UNNEST([
        {'col': 'o_orderkey',      'n_nulls': nn_orderkey,      'n_distinct': nd_orderkey},
        {'col': 'o_custkey',       'n_nulls': nn_custkey,       'n_distinct': nd_custkey},
        {'col': 'o_orderstatus',   'n_nulls': nn_orderstatus,   'n_distinct': nd_orderstatus},
        {'col': 'o_totalprice',    'n_nulls': nn_totalprice,    'n_distinct': nd_totalprice},
        {'col': 'o_orderdate',     'n_nulls': nn_orderdate,     'n_distinct': nd_orderdate},
        {'col': 'o_orderpriority', 'n_nulls': nn_orderpriority, 'n_distinct': nd_orderpriority}
    ]) AS t(u)
    """,
)
def table_profile_orders(spark, sf_dir):
    """One-pass table profile (operators/profile.profile_table): per-column
    null and exact-distinct counts in a single scan. Multiple exact
    COUNT(DISTINCT) in one aggregate compile to Catalyst's Expand
    (row is replicated once per distinct-column) — one scan traded for a
    columns-wide shuffle; the 100 TB variant swaps in
    approx_count_distinct and drops Expand entirely (see
    agg_approx_stats)."""
    from .operators.profile import profile_table

    return profile_table(
        load(spark, sf_dir, "orders"),
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )


@query(
    "dedup_semantic_cluster",
    """
    WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings WHERE vec_id < 2000),
    pairs AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.3),
    sym AS (SELECT id1 AS a, id2 AS b FROM pairs
            UNION SELECT id2, id1 FROM pairs),
    reach(id, r) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM sym)
        UNION
        SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
    SELECT v.vec_id AS vec_id,
           coalesce(c.component, v.vec_id) AS component,
           (coalesce(c.component, v.vec_id) = v.vec_id) AS keep
    FROM e v LEFT JOIN comp c ON c.id = v.vec_id
    """,
)
def dedup_semantic_cluster(spark, sf_dir):
    """Semantic dedup done cluster-correct: embedding-cosine near-dup
    pairs (BLAS all-pairs over the bounded slice — the blocking/tiled
    paths scale it) become edges, connected components collapse chains
    (A~B, B~C with A!~C keeps exactly A), every isolated vector is its
    own singleton component. Mirrors dedup_cluster_keep but in embedding
    space — the pass textual dedup can't do (paraphrases share no
    shingles). Oracle: DuckDB recursive transitive closure."""
    from .operators.graph import connected_components

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 2000)
    pairs = D.embedding_neardup_pairs_blas(emb, threshold=0.3).select("id1", "id2")
    comp = connected_components(pairs, vertices=emb.select("vec_id"))
    return comp.select(
        F.col("id").alias("vec_id"),
        "component",
        (F.col("id") == F.col("component")).alias("keep"),
    )


@query(
    "pack_training_shards",
    f"""
    WITH t AS (SELECT doc_id, tk, len(tk) AS n
               FROM (SELECT doc_id, {_TOKS} AS tk FROM documents) x),
    c AS (SELECT doc_id, tk, n,
                 unnest(range(1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS INT))) AS i
          FROM t),
    ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                  CAST(least(n - i*24, 32) AS BIGINT) AS n_tokens
           FROM c),
    s AS (SELECT doc_id, chunk_idx, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                     ORDER BY doc_id, chunk_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS chunk_offset
          FROM ch)
    SELECT doc_id, chunk_idx, n_tokens, chunk_offset,
           chunk_offset // 512 AS shard_id
    FROM s
    """,
)
def pack_training_shards(spark, sf_dir):
    """Chunk the corpus (32-token windows, stride 24) and pack the chunks
    into 512-token training shards via a DISTRIBUTED two-level prefix sum
    (operators/packing.py) — per-range-partition totals to the driver
    (one long per partition), parallel windows for the local prefixes.
    The oracle computes the same offsets with a single global window,
    which is exactly the plan shape the operator exists to avoid."""
    from .operators.chunking import chunk_documents
    from .operators.packing import pack_chunks_into_shards

    chunks = chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    ).select("doc_id", "chunk_idx", F.col("n_tokens").cast("long").alias("n_tokens"))
    return pack_chunks_into_shards(chunks, shard_tokens=512)


@query(
    "fuzzy_match_part_names",
    """
    WITH n AS (SELECT DISTINCT p_name AS v FROM part),
    b AS (SELECT v, string_split(v, ' ')[-1] AS blk FROM n)
    SELECT a.v AS v1, c.v AS v2,
           CAST(levenshtein(a.v, c.v) AS BIGINT) AS distance
    FROM b a JOIN b c ON a.blk = c.blk AND a.v < c.v
    WHERE levenshtein(a.v, c.v) <= 3
    """,
)
def fuzzy_match_part_names(spark, sf_dir):
    """Blocked fuzzy entity matching (operators/dedup.blocked_fuzzy_pairs):
    distinct part names blocked on their noun token, Levenshtein <= 3
    within blocks only — the entity-resolution shape that replaces the
    unshippable all-pairs edit-distance matrix. Both engines implement
    classic Levenshtein, so distances (and the oracle hash) are exact.
    Names here are 'color noun', so the blocks are the nouns and matches
    are color variants of the same part."""
    return D.blocked_fuzzy_pairs(
        load(spark, sf_dir, "part"), "p_name", max_distance=3
    )


@query(
    "jsonl_roundtrip_orders",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
    FROM orders
    """,
)
def jsonl_roundtrip_orders(spark, sf_dir):
    """JSONL landing-zone ingestion (sources/files.read_jsonl): orders
    staged as newline-delimited JSON, read back with an EXPLICIT schema
    and PERMISSIVE corrupt-record quarantine. The oracle is the original
    parquet table — an end-to-end proof that the text roundtrip loses
    nothing (doubles survive via shortest-repr JSON numbers, timestamps
    via ISO-8601 in the pinned UTC session). Quarantine behavior is
    pinned in test_sources.py with planted bad lines."""
    import tempfile

    from pyspark.sql import types as T

    from .sources.files import read_jsonl

    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    src = load(spark, sf_dir, "orders").select(*cols)
    stage = tempfile.mkdtemp(prefix="jsonl_orders_")
    src.write.mode("overwrite").json(stage)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    good, _quarantine = read_jsonl(spark, stage, schema)
    return good


# ---------------------------------------------------------------------------
# Decontamination & domain-mixture sampling (operators/contamination.py,
# operators/mixture.py)
# ---------------------------------------------------------------------------

_FOURGRAMS = (
    "[tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] "
    "for i in range(1, len(tk) - 2)]"
)


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH norm AS (SELECT doc_id AS id, source, {_NORM_TOKS} AS tk FROM documents),
    g AS (SELECT id, source, unnest(list_distinct({_FOURGRAMS})) AS sh FROM norm),
    h AS (SELECT id, source, {_hash60_sql('sh', 7)} AS gh FROM g),
    ev AS (SELECT DISTINCT gh FROM h WHERE source = 'src0'),
    tr AS (SELECT id, gh FROM h WHERE source <> 'src0'),
    sizes AS (SELECT id, count(*) AS n_grams FROM tr GROUP BY id),
    shared AS (SELECT id, count(*) AS n_shared FROM tr JOIN ev USING (gh) GROUP BY id)
    SELECT sizes.id AS doc_id, n_grams, n_shared,
           {round_ratio_sql('n_shared', 'n_grams')} AS contamination
    FROM sizes JOIN shared ON sizes.id = shared.id
    """,
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Train/eval decontamination: training docs (source != src0) that
    share >= 1 word 4-gram with the eval slice (source = src0). Grams
    hash to 60-bit ints before the broadcast join, so the training side
    never shuffles strings (operators/contamination.py)."""
    from .operators.contamination import ngram_contamination

    docs = load(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=4,
    )


@query(
    "sample_token_budget_mix",
    f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               CAST(sum(n_tokens) OVER (
                    PARTITION BY source ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM t
    )
    SELECT doc_id, source, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 800
    """,
)
def sample_token_budget_mix(spark, sf_dir):
    """Domain-mixture sampling: each source cut to an 800-token budget
    along a reproducible md5(doc_id) order (operators/mixture.py). The
    window partitions by domain — domains run in parallel; the giant-
    single-domain case swaps in packing.py's two-level prefix sum."""
    from .operators.mixture import token_budget_sample

    return token_budget_sample(load(spark, sf_dir, "documents"), budget=800)


# ---------------------------------------------------------------------------
# Stream-static enrichment & ORC landing format
# ---------------------------------------------------------------------------

@query(
    "stream_static_enrich",
    """
    SELECT event_id, user_id, event_type, value, c_mktsegment
    FROM events JOIN customer ON user_id = c_custkey
    """,
)
def stream_static_enrich(spark, sf_dir):
    """Stream-static join: the event stream enriched with a broadcast
    customer dimension. Stateless (no watermark, no state store) — each
    micro-batch map-side joins against the static build side, the
    canonical streaming-ingest enrichment. Oracle = the batch join."""
    import shutil
    import tempfile
    import uuid

    from .streaming.ingest import stream_source

    stage = tempfile.mkdtemp(prefix="stream_enrich_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stage}/part-0.parquet")
    stream = stream_source(spark, stage)
    dim = F.broadcast(load(spark, sf_dir, "customer"))
    enriched = stream.join(dim, stream.user_id == dim.c_custkey).select(
        "event_id", "user_id", "event_type", "value", "c_mktsegment"
    )
    name = f"sse_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "orc_roundtrip_orders",
    "SELECT * FROM orders",
)
def orc_roundtrip_orders(spark, sf_dir):
    """ORC landing-zone format: write orders to ORC, read it back; the
    oracle is the original parquet table — a lossless-roundtrip proof
    for the second columnar format (sources support parquet/ORC/JSONL/
    CSV). ORC brings the same pushdown/stats pruning surface as parquet
    (asserted in test_sources.py)."""
    import tempfile

    stage = tempfile.mkdtemp(prefix="orc_orders_")
    load(spark, sf_dir, "orders").write.mode("overwrite").orc(stage)
    return spark.read.orc(stage)


@query(
    "sample_weighted_quality",
    f"""
    WITH q AS ({_QUALITY_SQL}),
    k AS (
        SELECT q.doc_id, d.source, q.quality_score,
               round(pow(
                   (CAST('0x' || substr(md5(CAST(q.doc_id AS VARCHAR) || '#11'), 1, 15) AS BIGINT) + 1)
                       / 1152921504606846976.0,
                   1.0 / greatest(q.quality_score, 0.0001)), 6) AS aes_key
        FROM q JOIN documents d USING (doc_id))
    SELECT doc_id, source, quality_score, aes_key,
           CAST(row_number() OVER (
               PARTITION BY source ORDER BY aes_key DESC, doc_id
           ) AS BIGINT) AS rank
    FROM k
    QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY aes_key DESC, doc_id
    ) <= 5
    """,
)
def sample_weighted_quality(spark, sf_dir):
    """Quality-weighted sampling without replacement: Efraimidis-Spirakis
    A-ES keys u^(1/quality) with md5-derived uniforms — the top-5 docs
    per source, biased toward high quality_score but reproducible across
    runs/engines/partitionings (operators/mixture.weighted_sample_topn).
    The oracle replays the identical key computation in SQL."""
    from .operators.mixture import weighted_sample_topn

    docs = TX.with_quality_score(load(spark, sf_dir, "documents"))
    return weighted_sample_topn(
        docs, n=5, weight_col="quality_score", domain_col="source"
    )


# ---------------------------------------------------------------------------
# Python UDTF surface (Spark 4): table-valued per-row fan-out with state
# ---------------------------------------------------------------------------

@query(
    "udtf_token_runs",
    """
    WITH t AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        FROM documents),
    x AS (
        SELECT doc_id, tok, pos,
               CASE WHEN lag(tok) OVER w IS DISTINCT FROM tok
                    THEN 1 ELSE 0 END AS nb
        FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    y AS (
        SELECT doc_id, tok, pos,
               sum(nb) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS run
        FROM x)
    SELECT doc_id, CAST(run - 1 AS BIGINT) AS run_idx,
           tok AS token, count(*) AS run_len
    FROM y GROUP BY doc_id, run, tok
    """,
)
def udtf_token_runs(spark, sf_dir):
    """Run-length encoding of adjacent repeated tokens via a Python UDTF
    (Spark 4 table-valued function): one generator pass per document,
    carrying the current-run state that pure SQL needs a two-window
    gaps-and-islands construction to express — which is exactly what the
    oracle does, so the UDTF's sequential semantics are value-checked
    against independent window math. The UDTF runs as a LATERAL join:
    rows fan out executor-side, no shuffle beyond the scan. (Arrow-batched;
    for wide production fan-outs prefer mapInPandas unless per-row
    laziness/state is the point, as here.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="run_idx: bigint, token: string, run_len: bigint")
    class TokenRuns:
        def eval(self, text: str):
            if text is None:
                return
            run_idx, prev, cnt = 0, None, 0
            for tok in text.split(" "):
                if prev is not None and tok == prev:
                    cnt += 1
                    continue
                if prev is not None:
                    yield run_idx, prev, cnt
                    run_idx += 1
                prev, cnt = tok, 1
            if prev is not None:
                yield run_idx, prev, cnt

    spark.udtf.register("token_runs", TokenRuns)
    load(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, r.run_idx, r.token, r.run_len
        FROM udtf_docs d, LATERAL token_runs(d.text) r
        """
    )


@query(
    "bpe_top_pairs",
    f"""
    WITH w AS (SELECT unnest({_NORM_TOKS}) AS word FROM documents),
    wf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
    pr AS (
        SELECT substr(word, CAST(t.i AS INTEGER), 2) AS pair, freq
        FROM wf, UNNEST(generate_series(1, len(word) - 1)) t(i)
        WHERE len(word) >= 2),
    agg AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM pr GROUP BY pair)
    SELECT pair, n FROM agg ORDER BY n DESC, pair LIMIT 20
    """,
)
def bpe_top_pairs(spark, sf_dir):
    """Round-0 BPE statistic (operators/bpe.pair_counts): adjacent
    character-pair counts weighted by word frequency, top-20. The scale
    point is the architecture, not the query: ONE corpus-scale groupBy
    builds the word-frequency table, and the pair explode runs over the
    vocab-sized distinct-word set — tokenizer training cost is
    independent of corpus row count (operators/bpe.bpe_train runs its
    merge loop on that same collected table). Exact oracle: identical
    substring arithmetic in DuckDB; top-20 is TakeOrderedAndProject."""
    from .operators.bpe import pair_counts

    return (
        pair_counts(load(spark, sf_dir, "documents"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(20)
    )


_GOPHER_STOPLIST = ", ".join(f"'{w}'" for w in TX.GOPHER_STOPWORDS)


@query(
    "text_gopher_rules",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
    s AS (
        SELECT doc_id,
               len(tk) AS n,
               coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS total_chars,
               len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
               len(regexp_extract_all(text, '#|\\.\\.\\.')) AS symbols,
               len(list_intersect(list_distinct(list_transform(tk, x -> lower(x))),
                                  [{_GOPHER_STOPLIST}])) AS stop_distinct
        FROM t)
    SELECT doc_id,
           (n >= 50 AND n <= 100000) AS r_word_count,
           (total_chars >= 3 * n AND total_chars <= 10 * n) AS r_mean_word_len,
           (alpha_words * 5 >= n * 4) AS r_alpha_ratio,
           (symbols * 10 < n) AS r_symbol_ratio,
           (stop_distinct >= 2) AS r_stopwords,
           ((n >= 50 AND n <= 100000)
            AND (total_chars >= 3 * n AND total_chars <= 10 * n)
            AND (alpha_words * 5 >= n * 4)
            AND (symbols * 10 < n)
            AND (stop_distinct >= 2)) AS gopher_keep
    FROM s
    """,
)
def text_gopher_rules(spark, sf_dir):
    """Gopher-style quality-filter rules (operators/text.with_gopher_rules):
    the public Rae et al. 2021 §A1.1 heuristics as per-document booleans
    plus the conjunction keep-flag. All thresholds are evaluated in
    cross-multiplied integer form (no float division), so the DuckDB twin
    matches bit-for-bit; the whole pass is one codegen'd projection —
    zero shuffle, a free rider on the corpus scan at 100 TB."""
    df = TX.with_gopher_rules(load(spark, sf_dir, "documents"))
    return df.select(
        "doc_id", "r_word_count", "r_mean_word_len", "r_alpha_ratio",
        "r_symbol_ratio", "r_stopwords", "gopher_keep",
    )


def _pq_codebooks_numpy(sf_dir: str, m=4, n_codes=16, sample_rows=2048, iters=5):
    """Pure-numpy twin of similarity.train_pq_codebooks (same recipe:
    lowest-id sample, first-n init, fixed Lloyd iterations, argmin ties
    to the lowest code) over the parquet file directly — no Spark."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    pdf = t.sort_by("vec_id").slice(0, sample_rows).to_pandas()
    x = np.array([np.asarray(v, dtype="float64") for v in pdf["embedding"]])
    dsub = x.shape[1] // m
    books = np.empty((m, n_codes, dsub))
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cents = xs[:n_codes].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def _pq_oracle(m=16, n_codes=16, k=10) -> str | None:
    """Exact SQL twin of pq_adc_topk(m=16, n_codes=16): retrains the
    deterministic codebooks in pure numpy, embeds them as literals, then
    replays encoding (argmin-L2 per subspace, ties to lowest code) and
    ADC scoring in SQL. The per-(query,neighbor) partials are summed via
    a j-ORDERED list — (((p0+p1)+p2)+...), the same left-to-right float
    association the Spark side accumulates — so no summation-order drift.
    Same rows-only downgrade contract as _ivf_oracle on unreadable
    parquet."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    try:
        books = _pq_codebooks_numpy(sf_dir, m, n_codes)
    except Exception as exc:  # noqa: BLE001 — see _ivf_oracle
        import sys

        print(f"_pq_oracle: rows-only fallback ({exc})", file=sys.stderr)
        return None
    dsub = books.shape[2]
    # left-associated partial sum: (((ps[1]+ps[2])+ps[3])+...)
    sum_expr = "ps[1]"
    for j in range(2, m + 1):
        sum_expr = f"({sum_expr} + ps[{j}])"
    cb_rows = ",\n        ".join(
        f"({j}, {c}, [{', '.join(repr(float(v)) for v in books[j][c])}]::DOUBLE[])"
        for j in range(m)
        for c in range(n_codes)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb(j, code, c) AS (VALUES
        {cb_rows}),
    js AS (SELECT unnest(range({m})) AS j),
    sub AS (
        SELECT e.vec_id, js.j,
               list_slice(e.v, js.j * {dsub} + 1, (js.j + 1) * {dsub}) AS sv
        FROM e, js),
    enc AS (
        SELECT vec_id, j, code FROM (
            SELECT sub.vec_id, sub.j, cb.code, row_number() OVER (
                PARTITION BY sub.vec_id, sub.j
                ORDER BY list_distance(sub.sv, cb.c), cb.code) AS rn
            FROM sub JOIN cb USING (j)) WHERE rn = 1),
    lut AS (
        SELECT q.vec_id AS query_id, cb.j, cb.code,
               list_inner_product(q.sv, cb.c) AS p
        FROM sub q JOIN cb USING (j) WHERE q.vec_id < 5),
    parts AS (
        SELECT l.query_id, enc.vec_id AS neighbor_id, list(l.p ORDER BY l.j) AS ps
        FROM enc JOIN lut l ON enc.j = l.j AND enc.code = l.code
        WHERE enc.vec_id <> l.query_id
        GROUP BY l.query_id, enc.vec_id),
    scored AS (
        SELECT query_id, neighbor_id,
               round({sum_expr}, 4) AS score
        FROM parts)
    SELECT query_id, neighbor_id, score,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, neighbor_id
           ) AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id
    ) <= {k}
    """


@query("ann_pq_topk", _pq_oracle())
def ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.pq_adc_topk):
    64-dim vectors -> 16 subspace codebooks of 16 centroids -> 16 BYTES
    per corpus vector (16x compression; recall@10 0.54 on this
    adversarially-uniform corpus), searched compressed-domain via ADC
    lookup tables (Jégou et al. 2011 / FAISS IndexPQ). The corpus scan
    moves only codes; each candidate costs 16 table gathers + 15 adds. The
    oracle retrains the deterministic codebooks in numpy and replays
    encoding + ADC in SQL with the identical float association."""
    emb = load(spark, sf_dir, "embeddings")
    out = SIM.pq_adc_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, m=16, n_codes=16)
    return out.withColumn("rank", F.col("rank").cast("long"))


@query(
    "heavy_hitter_tokens",
    f"""
    WITH w AS (SELECT unnest({_TOKS}) AS token FROM documents),
    tot AS (SELECT count(*) AS n FROM w),
    c AS (SELECT token, count(*) AS cnt FROM w GROUP BY token)
    SELECT token, CAST(cnt AS BIGINT) AS n,
           CAST(floor(10000.0 * cnt / tot.n) AS BIGINT) AS share_bp
    FROM c, tot WHERE cnt * 30 > tot.n
    """,
)
def heavy_hitter_tokens(spark, sf_dir):
    """Exact phi-heavy hitters over the corpus token stream
    (operators/frequency.heavy_hitters, phi=1/30): per-partition
    Misra-Gries summaries (mergeable-summaries batch merge, zero
    shuffle) nominate candidates; only candidate rows are recounted
    exactly, so the final 'count*30 > n' filter is exact and the naive
    full-groupBy oracle hash-matches. At 100 TB the exchange is bounded
    by the head keys, not the vocabulary."""
    from .operators.frequency import heavy_hitters

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    return heavy_hitters(toks, "token", k=29)


def _pagerank_oracle(iters=5, damping=85, scale=10**9) -> str:
    """Chained-CTE replay of pagerank_fixed_point over the customer <->
    supplier order graph: identical integer arithmetic (DuckDB ``//`` ==
    Spark ``div`` on BIGINT), one CTE per power iteration."""
    teleport = (scale * (100 - damping)) // 100
    ctes = [
        f"""base AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-01-01'),
    e AS MATERIALIZED (
        SELECT cust AS src, 10000000 + supp AS dst FROM base
        UNION ALL
        SELECT 10000000 + supp AS src, cust AS dst FROM base),
    deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
    r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""r{i} AS (
        SELECT n.node,
               CAST({teleport} + coalesce(sum((r.rank * {damping}) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
        FROM nodes n
        LEFT JOIN e ON e.dst = n.node
        LEFT JOIN r{i-1} r ON r.node = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY n.node)""")
    return "WITH " + ",\n    ".join(ctes) + f"\n    SELECT node, rank FROM r{iters}"


@query("pagerank_suppliers", _pagerank_oracle())
def pagerank_suppliers(spark, sf_dir):
    """PageRank over the bipartite customer<->supplier graph implied by
    1995 orders (operators/graph.pagerank_fixed_point, 5 power iterations,
    damping 0.85) in scaled-integer arithmetic — bit-identical across
    engines/partitionings because integer sums are order-independent,
    unlike float PageRank whose shuffle-order ulp drift compounds per
    iteration. Supplier nodes are offset by 10M to disambiguate the two
    key spaces. The oracle replays the identical integer recurrence as
    chained CTEs."""
    from .operators.graph import pagerank_fixed_point

    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    base = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    fwd = base.select(
        F.col("cust").alias("src"), (F.lit(10_000_000) + F.col("supp")).alias("dst")
    )
    rev = base.select(
        (F.lit(10_000_000) + F.col("supp")).alias("src"), F.col("cust").alias("dst")
    )
    return pagerank_fixed_point(fwd.unionByName(rev), iters=5)


@query(
    "stream_sessionize",
    """
    WITH s AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        FROM events),
    g AS (
        SELECT *, sum(brk) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM s)
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS sum_value
    FROM g GROUP BY user_id, sid
    """,
)
def stream_sessionize(spark, sf_dir):
    """Gap-based session windows via Structured Streaming's
    ``session_window`` (streaming/ingest.sessionize — dynamic-gap state
    merged incrementally per micro-batch), driven to completion on the
    bounded file source. The oracle is the batch lag-island equivalent:
    a session splits exactly when the inter-event gap >= 30 min and
    closes at last_event + gap — stream-batch parity is the correctness
    contract, same as stream_windowed_counts. Note the tie-safe island
    sum: events sharing a timestamp merge in both formulations."""
    import shutil
    import tempfile
    import uuid

    from .streaming.ingest import sessionize, stream_source

    stage = tempfile.mkdtemp(prefix="stream_events_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stage}/part-0.parquet")
    stream = stream_source(spark, stage)
    name = f"ssz_{uuid.uuid4().hex[:8]}"
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sessionize(stream, gap="30 minutes")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name).withColumn("n_events", F.col("n_events").cast("long"))


@query(
    "corpus_dup_ngram_profile",
    f"""
    WITH norm AS (SELECT doc_id AS id, {_NORM_TOKS} AS tk FROM documents),
    w0 AS (
        SELECT id,
               [array_to_string(list_slice(tk, i, i + 7), ' ')
                for i in range(1, len(tk) - 6)] AS ws
        FROM norm),
    p AS (
        SELECT id, {_hash60_sql('wn', 77)} AS h
        FROM (SELECT id, unnest(ws) AS wn FROM w0)),
    counts AS (SELECT h, count(*) AS cnt FROM p GROUP BY h),
    perdoc AS (
        SELECT id, count(*) AS n_windows,
               sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS ndup
        FROM p JOIN counts USING (h) GROUP BY id)
    SELECT n.id AS doc_id,
           CAST(coalesce(pd.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(pd.ndup, 0) AS BIGINT) AS n_dup_windows,
           CAST(CASE WHEN coalesce(pd.n_windows, 0) = 0 THEN 0
                     ELSE floor(10000.0 * pd.ndup / pd.n_windows) END AS BIGINT)
               AS dup_ratio_bp
    FROM norm n LEFT JOIN perdoc pd ON pd.id = n.id
    """,
)
def corpus_dup_ngram_profile(spark, sf_dir):
    """Repeated-passage profiling (operators/dedup.duplicate_ngram_profile):
    the distributable form of Lee et al. 2021's exact-substring dedup —
    every overlapping 8-token window hashed to 60 bits, a window counted
    as duplicated when its hash occurs >= 2x corpus-wide, per-doc ratios
    in basis points. Suffix arrays don't shard; hashed windows shuffle 8
    bytes each and the whole pass is two hash aggregations + one join."""
    from .operators.dedup import duplicate_ngram_profile

    out = duplicate_ngram_profile(load(spark, sf_dir, "documents"), n=8)
    return out.select(
        F.col("id").alias("doc_id"), "n_windows", "n_dup_windows", "dup_ratio_bp"
    )


# ---------------------------------------------------------------------------
# Round 4 additions: containment dedup, kNN classification, BM25 retrieval
# ---------------------------------------------------------------------------


@query(
    "dedup_containment",
    f"""
    {_JACCARD_POSTING}
    SELECT id1, id2, {round_ratio_sql('c', 'least(s1.n, s2.n)')} AS containment
    FROM common
    JOIN sizes s1 ON id1 = s1.id
    JOIN sizes s2 ON id2 = s2.id
    WHERE {round_ratio_sql('c', 'least(s1.n, s2.n)')} >= 0.6
    """,
)
def dedup_containment(spark, sf_dir):
    """Asymmetric near-subset dedup: Broder max-containment
    |A∩B| / min(|A|,|B|) >= 0.6 over trigram shingles. Catches the
    quote-extraction / boilerplate-wrapped-copy pairs whose union-dominated
    Jaccard stays under any sane symmetric threshold. Same inverted-index
    plan as dedup_ngram_jaccard — only the final normalizer changes."""
    return D.containment_pairs(
        load(spark, sf_dir, "documents"), n=3, threshold=0.6, max_shingle_freq=None
    )


@query(
    "knn_label_vote",
    """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nn AS (
        SELECT q.vec_id AS query_id, c.label AS nbr_label,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(q.v, c.v), 4) DESC, c.vec_id
               ) AS rk
        FROM e q JOIN e c ON c.vec_id >= 20
        WHERE q.vec_id < 20
        QUALIFY rk <= 5),
    v AS (
        SELECT query_id, nbr_label, count(*) AS votes, min(rk) AS best_rank
        FROM nn GROUP BY 1, 2)
    SELECT query_id, nbr_label AS predicted_label, CAST(votes AS BIGINT) AS votes
    FROM v
    QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY votes DESC, best_rank ASC, nbr_label ASC) = 1
    """,
)
def knn_label_vote(spark, sf_dir):
    """k-NN majority-vote classification (k=5, cosine) of the first 20
    vectors against the labeled rest — fully deterministic voting contract
    (round-before-rank neighbors; vote ties break on best rank then
    smallest label). The neighbor stage is the broadcast-queries exact
    scan; swap in ivf/pq for 100 TB corpora, voting unchanged."""
    emb = load(spark, sf_dir, "embeddings")
    return SIM.knn_classify(
        emb.filter(F.col("vec_id") >= 20), emb.filter(F.col("vec_id") < 20), k=5
    )


_BM25_TERMS = ("spark", "merge", "window")


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    sc = (
        "round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))"
        " * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)), 6)"
    )
    parts = " + ".join(
        f"COALESCE(max(CASE WHEN term = '{t}' THEN sc END), 0)" for t in _BM25_TERMS
    )
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_NORM_TOKS}) AS term FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
    df_ AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
            WHERE term IN ({terms}) GROUP BY 1),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term IN ({terms}) GROUP BY 1, 2),
    scored AS (
        SELECT t.doc_id, t.term, {sc} AS sc
        FROM tf t JOIN df_ d USING (term)
        JOIN dl l ON t.doc_id = l.doc_id
        CROSS JOIN stats s),
    agg AS (SELECT doc_id, round({parts}, 4) AS bm25 FROM scored GROUP BY doc_id)
    SELECT doc_id, bm25 FROM agg ORDER BY bm25 DESC, doc_id LIMIT 20
    """


@query("bm25_doc_search", _bm25_oracle())
def bm25_doc_search(spark, sf_dir):
    """BM25 (k1=1.2, b=0.75) document retrieval for a fixed query term
    set — TF-IDF's production successor with document-length
    normalization. Per-term partial scores are rounded to 6 and summed in
    a FIXED written order (conditional-max pivot, not a float groupBy
    sum) so both engines add identical doubles identically; corpus stats
    (N, avgdl) are exact-integer-derived. Top-20 is TakeOrderedAndProject
    on the already-aggregated doc set — no global sort."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(TX.tokens(TX.normalized_text(F.col("text")))).alias("term"),
    ).localCheckpoint(eager=False)  # 3 consumers: dl, df, tf
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dl = dl.localCheckpoint(eager=False)  # 2 consumers: stats, scored
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    ft = tok.filter(F.col("term").isin(*_BM25_TERMS))
    tf = ft.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfr = ft.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    sc = F.round(
        F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))),
        6,
    )
    scored = (
        tf.join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("sc", sc)
    )
    term_cols = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("sc"))), F.lit(0.0)
        )
        for t in _BM25_TERMS
    ]
    total = term_cols[0]
    for c in term_cols[1:]:
        total = total + c
    return (
        scored.groupBy("doc_id")
        .agg(F.round(total, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def _kmeans_oracle(k: int = 8, rounds: int = 3, scale: int = 10_000, dim: int = 64) -> str:
    """Full SQL replay of operators/kmeans.kmeans_int: because every
    quantity in the loop is exact int64 (quantized inputs, integer
    distances, truncated-mean centroids, lowest-id tie-breaks), the
    entire iterative algorithm — not just its final state — is
    reproducible as chained CTEs, one (assign, update) pair per round.
    DuckDB's ``//`` floors while Spark's ``div`` truncates, so the
    negative-sum case spells the sign out explicitly."""
    d2 = "list_sum(list_transform(list_zip(p.qv, c.qv), z -> (z[1]-z[2])*(z[1]-z[2])))"
    sums = ", ".join(f"sum(qv[{i + 1}]) AS s{i}" for i in range(dim))
    cent = ", ".join(
        f"CASE WHEN s{i} < 0 THEN -((-s{i}) // n) ELSE s{i} // n END"
        for i in range(dim)
    )
    sql = [
        f"""
    WITH q AS MATERIALIZED (
        SELECT vec_id AS id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * {scale}) AS BIGINT)) AS qv
        FROM embeddings),
    c0 AS MATERIALIZED (
        SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid, qv
        FROM (SELECT * FROM q ORDER BY id LIMIT {k}))"""
    ]
    prev = "c0"
    for r in range(1, rounds + 1):
        sql.append(
            f""",
    a{r} AS MATERIALIZED (
        SELECT p.id, p.qv, c.cid, {d2} AS d2
        FROM q p CROSS JOIN {prev} c
        QUALIFY row_number() OVER (PARTITION BY p.id ORDER BY {d2}, c.cid) = 1),
    c{r} AS MATERIALIZED (
        SELECT cid, CAST(n AS BIGINT) AS n, list_value({cent}) AS qv
        FROM (SELECT cid, count(*) AS n, {sums} FROM a{r} GROUP BY cid)
        UNION ALL
        SELECT o.cid, CAST(0 AS BIGINT), o.qv FROM {prev} o
        WHERE o.cid NOT IN (SELECT cid FROM a{r}))"""
        )
        prev = f"c{r}"
    sql.append(
        f""",
    final AS MATERIALIZED (
        SELECT p.id, c.cid, {d2} AS d2
        FROM q p CROSS JOIN {prev} c
        QUALIFY row_number() OVER (PARTITION BY p.id ORDER BY {d2}, c.cid) = 1)
    SELECT CAST(cid AS INT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(d2) AS BIGINT) AS inertia
    FROM final GROUP BY cid"""
    )
    return "".join(sql)


@query("kmeans_embeddings_int", _kmeans_oracle())
def kmeans_embeddings_int(spark, sf_dir):
    """Distributed Lloyd k-means (k=8, 3 fixed rounds) in EXACT int64
    arithmetic (`operators/kmeans.py`): vectors quantized once at
    scale=1e4, centroids broadcast as literals each round (the model
    ships to the data — per-round shuffle is O(k·d), independent of
    corpus size), per-cluster per-dimension integer-mean update via one
    groupBy. Exact integer math makes assignments bit-identical across
    engines and partitionings, so the ORACLE REPLAYS THE WHOLE ITERATIVE
    ALGORITHM in SQL — the strongest correctness statement an iterative
    operator can carry. Output: per-cluster size + exact inertia."""
    from .operators.kmeans import kmeans_int

    emb = load(spark, sf_dir, "embeddings")
    assigned = kmeans_int(emb, k=8, rounds=3, scale=10_000, dim=64)
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("dist").cast("long").alias("inertia"),
    )


@query(
    "golden_record_parts",
    """
    WITH RECURSIVE n AS (SELECT DISTINCT p_name AS v FROM part),
    b AS (SELECT v, string_split(v, ' ')[-1] AS blk FROM n),
    pairs AS (
        SELECT x.v AS v1, y.v AS v2
        FROM b x JOIN b y ON x.blk = y.blk AND x.v < y.v
        WHERE levenshtein(x.v, y.v) <= 3),
    sym AS (SELECT v1 AS a, v2 AS b FROM pairs
            UNION SELECT v2, v1 FROM pairs),
    reach(id, r) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM sym)
        UNION
        SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    p2 AS (
        SELECT p.p_partkey, p.p_name, p.p_retailprice,
               coalesce(c.component, p.p_name) AS cluster
        FROM part p LEFT JOIN comp c ON c.id = p.p_name)
    SELECT p_partkey, p_name, cluster, golden_partkey,
           p_partkey = golden_partkey AS is_golden
    FROM (
        SELECT p2.*,
               first_value(p_partkey) OVER (
                   PARTITION BY cluster
                   ORDER BY p_retailprice DESC, p_partkey) AS golden_partkey
        FROM p2)
    """,
)
def golden_record_parts(spark, sf_dir):
    """Entity-resolution MASTERING composite — the full MDM workflow in
    one plan: blocked fuzzy matching (dedup.blocked_fuzzy_pairs,
    Levenshtein <= 3 within noun blocks) -> connected components over
    the match graph (graph.connected_components — transitive: 'red
    widget' ~ 'rd widget' ~ 'rd widgets' merge even when the endpoints
    don't match pairwise) -> survivorship: the golden record per cluster
    is the highest-retail-price row (ties to lowest partkey). Singleton
    names are their own cluster via the left join + coalesce. The oracle
    replays matching with DuckDB levenshtein, clustering with a
    recursive closure, and survivorship with the same window."""
    from .operators.graph import connected_components

    part = load(spark, sf_dir, "part")
    name_pairs = D.blocked_fuzzy_pairs(part, "p_name", max_distance=3)
    comp = connected_components(name_pairs, src="v1", dst="v2").select(
        F.col("id").alias("p_name"), "component"
    )
    p2 = part.select("p_partkey", "p_name", "p_retailprice").join(
        comp, "p_name", "left"
    ).withColumn("cluster", F.coalesce("component", "p_name"))
    w = Window.partitionBy("cluster").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return p2.withColumn(
        "golden_partkey", F.first("p_partkey").over(w)
    ).select(
        "p_partkey",
        "p_name",
        "cluster",
        "golden_partkey",
        (F.col("p_partkey") == F.col("golden_partkey")).alias("is_golden"),
    )


@query(
    "sparse_tfidf_cosine_pairs",
    f"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, unnest({_NORM_TOKS}) AS term FROM documents WHERE doc_id < 200),
    tf AS MATERIALIZED (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df_ AS MATERIALIZED (
        SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
    wv AS MATERIALIZED (
        SELECT doc_id, term,
               CAST(round(round(tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6)
                          * 1000000) AS BIGINT) AS wi
        FROM tf JOIN df_ df USING (term) CROSS JOIN n),
    nrm AS MATERIALIZED (
        SELECT doc_id, CAST(sum(wi * wi) AS BIGINT) AS n2 FROM wv GROUP BY doc_id),
    dots AS MATERIALIZED (
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               CAST(sum(a.wi * b.wi) AS BIGINT) AS dot
        FROM wv a JOIN wv b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id1, id2,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 4)
               AS cosine
    FROM dots
    JOIN nrm na ON na.doc_id = id1
    JOIN nrm nb ON nb.doc_id = id2
    WHERE round(CAST(dot AS DOUBLE)
                / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 4) >= 0.5
    """,
)
def sparse_tfidf_cosine_pairs(spark, sf_dir):
    """WEIGHTED set similarity: document pairs with TF-IDF-weighted
    cosine >= 0.5 via sparse posting-list dot products — the weighted
    upgrade of shingle-Jaccard (rare terms dominate the score instead
    of every token counting equally). Plan shape: per-term weight
    vectors -> self-join on term (the sparse dot product — only
    co-occurring terms pair, never a dense matrix) -> normalize by
    per-doc norms joined back. Weights are quantized to 1e-6 integers
    so the dot products and squared norms are EXACT int64 sums
    (order-independent — a float groupBy dot could flip a 4-decimal
    rounding between engines/partitionings); the only float steps are
    two sqrt's and one division over those exact integers, identical in
    both engines. int64 headroom: w <= ~150 -> wi <= 1.5e8, per-pair
    dot <= terms * 2.25e16 — safe to ~400 shared terms per pair.
    Bounded to doc_id < 200 (the all-pairs verification slice, like
    dedup_embedding_cosine); the scale path blocks on rare terms with a
    stop-term cap exactly like ngram_jaccard_pairs."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = docs.select(
        "doc_id",
        F.explode(TX.tokens(TX.normalized_text(F.col("text")))).alias("term"),
    ).localCheckpoint(eager=False)
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfr = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = tok.select(F.countDistinct("doc_id").alias("n"))
    wv = (
        tf.join(F.broadcast(dfr), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "wi",
            F.round(
                F.round(
                    F.col("tf")
                    * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                    6,
                )
                * 1_000_000
            ).cast("long"),
        )
        .select("doc_id", "term", "wi")
        .localCheckpoint(eager=False)
    )
    nrm = wv.groupBy("doc_id").agg(F.sum(F.col("wi") * F.col("wi")).alias("n2"))
    a = wv.select(F.col("doc_id").alias("id1"), "term", F.col("wi").alias("wa"))
    b = wv.select(F.col("doc_id").alias("id2"), "term", F.col("wi").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("id1"), F.col("n2").alias("na2"))
    nb = nrm.select(F.col("doc_id").alias("id2"), F.col("n2").alias("nb2"))
    cos = F.round(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("na2").cast("double"))
            * F.sqrt(F.col("nb2").cast("double"))
        ),
        4,
    )
    return (
        dots.join(F.broadcast(na), "id1")
        .join(F.broadcast(nb), "id2")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.5)
        .select("id1", "id2", "cosine")
    )


@query(
    "pyds_synthetic_rollup",
    f"""
    WITH g AS (SELECT range AS event_id FROM range(2000, 20000)),
    r AS (
        SELECT event_id,
               CAST({_hash60_sql("CAST(event_id AS VARCHAR)", 5)} % 10 AS INTEGER) AS bucket,
               {_hash60_sql("CAST(event_id AS VARCHAR)", 6)} % 100000 AS value_cents
        FROM g)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(value_cents) AS BIGINT) AS total_cents
    FROM r GROUP BY bucket
    """,
)
def pyds_synthetic_rollup(spark, sf_dir):
    """CUSTOM PYTHON DATA SOURCE (Spark 4 DataSource API,
    sources/pyds.py): the reference's range-sliced extraction lifecycle
    as a first-class pluggable source — ``partitions()`` plans one
    InputPartition per half-open slice using the SAME
    slicing.int_intervals / chunk tier logic as the JDBC path, and
    ``pushFilters()`` narrows the planned slices source-side (the
    ``event_id >= 2000`` filter below prunes slices before a single row
    is generated — asserted in test_pyds.py). Rows are md5-derived
    functions of event_id, so the oracle replays the source itself from
    generate_series and checks the aggregate exactly."""
    from .sources import pyds

    pyds.register(spark)
    df = (
        spark.read.format(pyds.SOURCE_NAME)
        .option("start", "0")
        .option("end", "20000")
        .option("chunk", "2500")
        .load()
        .filter(F.col("event_id") >= 2000)
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("value_cents").cast("long").alias("total_cents"),
    )


_KL_LANGS = ("de", "en", "es", "fr", "zh")


def _kl_oracle() -> str:
    term = (
        "COALESCE(max(CASE WHEN lang = '{L}' THEN"
        " round((pc * 1.0 / st) * ln((pc * 1.0 / st) / (cc * 1.0 / ct)), 8)"
        " END), 0)"
    )
    terms = " + ".join(term.format(L=lang) for lang in _KL_LANGS)
    return f"""
    WITH per AS MATERIALIZED (
        SELECT source, lang, count(*) AS pc FROM documents GROUP BY 1, 2),
    st_ AS (SELECT source, sum(pc) AS st FROM per GROUP BY 1),
    cl AS (SELECT lang, sum(pc) AS cc FROM per GROUP BY 1),
    ct_ AS (SELECT sum(pc) AS ct FROM per),
    j AS (
        SELECT per.source, per.lang, per.pc, st_.st, cl.cc, ct_.ct
        FROM per JOIN st_ USING (source) JOIN cl USING (lang) CROSS JOIN ct_)
    SELECT source,
           CAST(max(st) AS BIGINT) AS n_docs,
           round({terms}, 6) AS kl_to_corpus
    FROM j GROUP BY source
    """


@query("mixture_kl_by_source", _kl_oracle())
def mixture_kl_by_source(spark, sf_dir):
    """Corpus MIXTURE-DRIFT monitor: per-source KL divergence of the
    language distribution from the corpus-wide distribution — the
    training-data dashboard number that tells you a crawl source's
    language mix is sliding. Per-language terms are rounded to 8 and
    summed in a FIXED written order over the (known, pinned) language
    set — the BM25 float discipline — so the sum is engine-identical;
    counts and totals are exact integers throughout. All tables after
    the first aggregation are language/source-cardinality small:
    broadcast joins, no second scan."""
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("pc"))
    per = per.localCheckpoint(eager=False)  # 4 consumers
    st = per.groupBy("source").agg(F.sum("pc").alias("st"))
    cl = per.groupBy("lang").agg(F.sum("pc").alias("cc"))
    ct = per.agg(F.sum("pc").alias("ct"))
    j = (
        per.join(F.broadcast(st), "source")
        .join(F.broadcast(cl), "lang")
        .crossJoin(F.broadcast(ct))
    )
    p = F.col("pc") * 1.0 / F.col("st")
    q = F.col("cc") * 1.0 / F.col("ct")
    term = F.round(p * F.log(p / q), 8)
    parts = [
        F.coalesce(F.max(F.when(F.col("lang") == lang, term)), F.lit(0.0))
        for lang in _KL_LANGS
    ]
    total = parts[0]
    for c in parts[1:]:
        total = total + c
    return j.groupBy("source").agg(
        F.max("st").cast("long").alias("n_docs"),
        F.round(total, 6).alias("kl_to_corpus"),
    )


def _hits_oracle(iters: int = 3, scale: int = 10**6) -> str:
    """Chained-CTE replay of graph.hits_scores on the 1995 customer ->
    supplier order graph. Every CTE MATERIALIZED (each round reads its
    predecessor twice)."""
    sql = [
        f"""
    WITH base AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS u, 10000000 + l.l_suppkey AS v
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-01-01'),
    h0 AS MATERIALIZED (
        SELECT DISTINCT u AS node, CAST({scale} AS BIGINT) AS score FROM base)"""
    ]
    prev_h = "h0"
    for r in range(1, iters + 1):
        sql.append(f""",
    ra{r} AS MATERIALIZED (
        SELECT e.v AS node, sum(h.score) AS s
        FROM base e JOIN {prev_h} h ON h.node = e.u GROUP BY e.v),
    a{r} AS MATERIALIZED (
        SELECT node, s * {scale} // (SELECT max(s) FROM ra{r}) AS score
        FROM ra{r}),
    rh{r} AS MATERIALIZED (
        SELECT e.u AS node, sum(a.score) AS s
        FROM base e JOIN a{r} a ON a.node = e.v GROUP BY e.u),
    h{r} AS MATERIALIZED (
        SELECT node, s * {scale} // (SELECT max(s) FROM rh{r}) AS score
        FROM rh{r})""")
        prev_h = f"h{r}"
    sql.append(f"""
    SELECT node, 'hub' AS role, CAST(score AS BIGINT) AS score FROM h{iters}
    UNION ALL
    SELECT node, 'auth' AS role, CAST(score AS BIGINT) AS score FROM a{iters}""")
    return "".join(sql)


@query("hits_customer_supplier", _hits_oracle(iters=2))
def hits_customer_supplier(spark, sf_dir):
    """HITS hubs & authorities (graph.hits_scores, 2 rounds,
    scaled-integer arithmetic) on the 1995 customer -> supplier order
    graph: hub customers concentrate purchases on authoritative
    suppliers and vice versa — the mutual-reinforcement ranking
    PageRank's single score can't express. Same exactness contract as
    the other five replayed iterative algorithms: integer sums +
    truncating renormalization make every round bit-identical across
    engines, so the oracle replays the full alternation as chained
    CTEs."""
    from .operators.graph import hits_scores

    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return hits_scores(edges, iters=2)
