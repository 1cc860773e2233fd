"""Similarity search (ANN) over an embedding column.

North-star surface (BASELINE.json): top-k nearest neighbors by cosine over
``array<float>`` embeddings.

- **Brute force** (`cosine_topk`): broadcast the query set, join against
  every corpus vector, rank per query. The correctness baseline — exact,
  oracle-checkable, and actually the right plan when |queries| is small:
  the corpus is scanned once, no shuffle of the corpus at all (queries are
  broadcast), and the per-query top-k is a windowed rank over
  |queries|·|corpus| rows pruned map-side by WindowGroupLimit.
- **LSH-bucketed** (`lsh_topk`): random-hyperplane sign-sketch blocking
  (shared with dedup.py) — each corpus vector lands in one bucket; queries
  probe their own bucket plus all buckets within ``probe_hamming`` bits
  (multi-probe), so recall degrades gracefully instead of falling off a
  cliff at bucket edges. The 100 TB path: candidate set per query is
  ~|corpus|/2^bits · probes.

All math is codegen'd column expressions (zip_with/aggregate) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dot_expr, hyperplane_sketch, l2_norm_expr


def _prep(df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str) -> DataFrame:
    """Project (id, vector, precomputed L2 norm) — norms cost n folds here
    instead of n·m inside the pair scoring."""
    return df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).cast("array<double>").alias(out_vec)
    ).withColumn(f"{out_vec}_nrm", l2_norm_expr(F.col(out_vec)))


# Driver-side query-batch ceiling for the IVF / PQ-ADC paths. Both
# collect the QUERY set (never the corpus) to build probe assignments /
# ADC lookup tables with one BLAS call — correct and fast for the
# retrieval shape they target (a bounded query batch against a huge
# corpus), but unbounded it would quietly port the ANN problem to the
# driver. The cap makes the contract explicit and the failure loud; for
# corpus-scale query sets use the collect-free tiled path
# (``cosine_topk_tiled``) or raise the cap deliberately after sizing
# driver memory (rows x dim x 8 bytes).
MAX_QUERY_BATCH = 100_000


def _collect_query_batch(df: DataFrame, max_rows: int):
    """Collect a query batch, refusing unbounded ones: fetches at most
    ``max_rows + 1`` rows (LIMIT is pushed to the scan, so an oversized
    input costs one extra row, not a driver OOM) and raises if the limit
    was hit."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"query batch exceeds max_query_rows={max_rows}; this path "
            "collects the query set on the driver — use cosine_topk_tiled "
            "for corpus-scale query sets, or raise max_query_rows after "
            "sizing driver memory"
        )
    return rows


def _pair_cosine() -> "F.Column":
    return dot_expr(F.col("qv"), F.col("cv")) / (F.col("qv_nrm") * F.col("cv_nrm"))


def _local_topk_frame(q_ids, c_ids, sims, top: int):
    """Block-local top candidates per query, cut under the EXACT final
    ranking contract: cosine rounded to 4 descending, neighbor_id
    ascending. An argpartition on unrounded sims would break ties at the
    cut boundary arbitrarily — if two candidates round equal and straddle
    the cut, the one the global window rank keeps (lowest id) could be
    the one dropped, and the exact-hash oracle (ann_tiled_topk) would
    flicker whenever the data grows such ties. lexsort per query row is
    O(n log n) vs argpartition's O(n); rows here are block-sized.
    """
    import numpy as np
    import pandas as pd

    rounded = np.round(sims, 4)
    top = min(top, sims.shape[1])
    out_q, out_c, out_s = [], [], []
    for r in range(sims.shape[0]):
        order = np.lexsort((c_ids, -rounded[r]))[:top]
        out_q.append(np.full(top, q_ids[r]))
        out_c.append(c_ids[order])
        out_s.append(rounded[r][order])
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_c),
            "cosine": np.concatenate(out_s),
        }
    )


def pack_vector_blocks(
    df: DataFrame,
    n_blocks: int,
    block_col: str,
    out_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pack (id, vector) rows into hash-assigned matrix blocks — the
    shared tiling primitive behind :func:`cosine_topk_blas_tiled` and
    ``dedup.embedding_neardup_pairs_blas_tiled``. A distributed
    ``collect_list`` aggregation, never a driver collect; one row per
    block, each holding ~block_rows (id, v) structs.
    """
    return (
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .withColumn(block_col, F.pmod(F.xxhash64("id"), F.lit(n_blocks)))
        .groupBy(block_col)
        .agg(F.collect_list(F.struct("id", "v")).alias(out_col))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Exact top-k by cosine for every query vector.

    Returns (query_id, neighbor_id, cosine, rank); self-matches excluded.
    Deterministic: ties break on neighbor_id. Cosines are rounded to 4
    *before* ranking so Spark and the DuckDB oracle rank identically.
    """
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "cv")
    q = _prep(queries, query_id_col or id_col, query_vec_col or vec_col, "query_id", "qv")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_pair_cosine(), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_blas: bool = True,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH blocking + exact rerank in-bucket.

    Corpus vectors are bucketed once by their ``bits``-bit sketch; each
    query probes every bucket within ``probe_hamming`` bits of its own
    sketch (enumerated by flipping bit subsets — cheap for hamming<=2).
    Same output shape as :func:`cosine_topk`; recall measured in tests.
    """
    if probe_hamming > 2:
        raise ValueError("probe_hamming > 2 enumerates too many buckets; use more bits instead")
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "cv")
    q = _prep(queries, id_col, vec_col, "query_id", "qv")
    if use_blas:
        # sketching dominates LSH cost (one interpreted fold per
        # row x hyperplane); the matmul twin is bit-identical (tested)
        c = hyperplane_sketch_blas(c, "cv", bits, out_col="bucket")
        q = hyperplane_sketch_blas(q, "qv", bits, out_col="bucket0")
    else:
        c = c.withColumn("bucket", hyperplane_sketch(F.col("cv"), bits))
        q = q.withColumn("bucket0", hyperplane_sketch(F.col("qv"), bits))
    # multi-probe: own bucket + all buckets within probe_hamming bit flips
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << i for i in range(bits)]
    if probe_hamming >= 2:
        masks += [(1 << i) | (1 << j) for i in range(bits) for j in range(i + 1, bits)]
    probes = q.select(
        "query_id",
        "qv",
        "qv_nrm",
        F.explode(
            F.array(*[F.col("bucket0").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("bucket"),
    )
    scored = (
        probes.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_pair_cosine(), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# BLAS fast path (Arrow -> numpy matmul), for dense corpora
# ---------------------------------------------------------------------------

def cosine_topk_blas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via numpy matmul inside mapInPandas.

    Spark's higher-order array functions are interpreted per element, so
    the pure-expression :func:`cosine_topk` pays ~10µs per pair. Here each
    Arrow batch becomes one `Q @ C.T` BLAS call (~ns per pair):

    - queries (assumed small: a probe set, not the corpus) are collected
      once and broadcast to executors,
    - each corpus batch emits only its *local* top-k per query,
    - a final window rank reduces k·|queries|·n_batches rows to k.

    Output matches :func:`cosine_topk` (query_id, neighbor_id, cosine,
    rank) with cosine rounded to 4. The block-local candidate cut uses
    the SAME contract as the final rank — rounded cosine descending,
    neighbor_id ascending (:func:`_local_topk_ids`) — so a tie at the
    cut boundary can never drop the candidate the global rank would
    have kept; last-ulp float differences vs the expression path can
    reorder only pairs whose UNROUNDED cosines differ below 1e-4.
    """
    import numpy as np
    import pandas as pd

    q_rows = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv"))
        .collect()
    )
    if not q_rows:
        raise ValueError("cosine_topk_blas: empty query set")
    q_ids = np.array([r.qid for r in q_rows])
    q_mat = np.array([r.qv for r in q_rows])
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, q_mat))

    def score(batches):
        ids, qm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["cid"].to_numpy()
            c_mat = np.stack(pdf["cv"].to_numpy())
            c_mat = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = qm @ c_mat.T  # |Q| x |batch| in one BLAS call
            yield _local_topk_frame(ids, c_ids, sims, k + 1)

    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    scored = c.mapInPandas(score, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_sketch_blas(
    df: DataFrame, vec_col: str, bits: int, dim: int = 64, out_col: str = "bucket"
) -> DataFrame:
    """BLAS twin of dedup.hyperplane_sketch: all k signed dots in ONE
    ``V @ S.T`` matmul per Arrow batch.

    The expression path pays an interpreted fold per (row, hyperplane) —
    ~2s for 5k x 6 x 64 locally, linear in corpus size at 100 TB; here
    it's nanoseconds per dot. Same md5-derived sign tables, so buckets
    match the expression path exactly except for vectors whose signed
    dot is within float-reassociation distance of 0 (P ~ 1e-12 for
    real-valued embeddings; asserted identical on the test corpus).
    """
    import numpy as np
    import pandas as pd

    from .dedup import _hyperplane_sign

    signs = np.array(
        [[_hyperplane_sign(i, j) for j in range(dim)] for i in range(bits)]
    )  # bits x dim
    weights = (1 << np.arange(bits)).astype("int64")
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} long"

    def sketch(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            s = signs[:, : v.shape[1]]
            pdf[out_col] = (((v @ s.T) > 0) @ weights).astype("int64")
            yield pdf

    return df.mapInPandas(sketch, out_schema)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + probed posting lists
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    iters: int = 5,
):
    """Deterministic coarse quantizer: Lloyd's k-means on a driver-side
    sample (unit-normalized -> spherical k-means).

    Sampling to the driver is the standard IVF recipe (FAISS trains on a
    slice, not the corpus): the quantizer needs only the coarse shape of
    the distribution. Determinism: the sample is the ``sample_rows``
    lowest ids, init centroids are the first ``n_centroids`` of them, a
    fixed number of Lloyd iterations, ties to the lowest centroid index.
    Returns a unit-row numpy array (n_centroids x dim).
    """
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("i")
        .limit(sample_rows)
        .collect()
    )
    x = np.array([r.v for r in rows])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = x[:n_centroids].copy()
    for _ in range(iters):
        sims = x @ cents.T
        assign = np.argmax(sims, axis=1)  # ties -> lowest index
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cents[c] = m / np.linalg.norm(m)
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = MAX_QUERY_BATCH,
    assignment: str = "driver",
) -> DataFrame:
    """IVF ANN: assign the corpus to coarse centroids once, probe each
    query's ``nprobe`` nearest centroid lists, exact-rerank in-list.

    The second of the two scale paths (hyperplane-LSH is the other): the
    candidate set per query is ~``nprobe/n_centroids`` of the corpus, and
    the assignment is one BLAS argmax per Arrow batch. With ``nprobe ==
    n_centroids`` the result equals brute-force :func:`cosine_topk`
    EXACTLY (every list probed; asserted in tests) — recall tuning only
    ever removes candidates, never reorders them.

    ``assignment`` picks the query-side plan (both produce bit-identical
    results — the probe set and scoring math are the same):

    - ``"driver"`` (default): the query batch is collected (capped at
      ``max_query_rows``), probes computed in one BLAS call, and both
      the probe table and the query vectors BROADCAST — the corpus
      never shuffles. Right whenever the query batch fits the cap.
    - ``"distributed"``: queries stay a DataFrame end to end — probes
      come from the same argsort in a mapInPandas over the query
      partitions (centroids broadcast, never the queries), and the
      probe/query joins shuffle by centroid_id / query_id instead of
      broadcasting. ``max_query_rows`` is ignored: this is the
      corpus-scale-query path (e.g. all-pairs retrieval over the corpus
      itself). centroid_id has only ``n_centroids`` distinct values, so
      the list join is skew-prone by construction — AQE skew-join
      (enabled in session.py) splits the hot lists at runtime.
    """
    import numpy as np

    if assignment not in ("driver", "distributed"):
        raise ValueError(f"assignment must be 'driver' or 'distributed', got {assignment!r}")

    cents = train_ivf_centroids(corpus, n_centroids, id_col, vec_col)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(cents)

    c = _prep(corpus, id_col, vec_col, "neighbor_id", "cv")
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in c.schema.fields)

    def assign(batches):
        import pandas as pd

        cm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.stack(pdf["cv"].to_numpy())
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            pdf["centroid_id"] = np.argmax(v @ cm.T, axis=1).astype("int64")
            yield pdf

    assigned = c.mapInPandas(assign, f"{fields}, centroid_id long")

    spark = corpus.sparkSession
    q = _prep(queries, id_col, vec_col, "query_id", "qv")

    if assignment == "distributed":
        def probe(batches):
            import pandas as pd

            cm = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                v = np.stack(pdf["qv"].to_numpy())
                v = v / np.linalg.norm(v, axis=1, keepdims=True)
                # same stable argsort as the driver path — identical
                # probe sets, including centroid-similarity ties
                order = np.argsort(-(v @ cm.T), axis=1, kind="stable")[:, :nprobe]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(
                            pdf["query_id"].to_numpy(), order.shape[1]
                        ),
                        "centroid_id": order.reshape(-1).astype("int64"),
                    }
                )

        probes = q.mapInPandas(probe, "query_id long, centroid_id long")
        scored = (
            probes.join(assigned, "centroid_id")
            .join(q, "query_id")
        )
    else:
        q_rows = _collect_query_batch(q, max_query_rows)
        qn = np.array([r.qv for r in q_rows])
        qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
        probe_rows = [
            (int(r.query_id), int(cid))
            for r, sims in zip(q_rows, qn @ cents.T)
            for cid in np.argsort(-sims, kind="stable")[:nprobe]
        ]
        from ..localdata import local_rows_df

        probes = local_rows_df(spark, probe_rows, "query_id long, centroid_id long")
        qdf = local_rows_df(
            spark,
            [(int(r.query_id), list(r.qv), float(r.qv_nrm)) for r in q_rows],
            "query_id long, qv array<double>, qv_nrm double",
        )
        scored = F.broadcast(probes).join(assigned, "centroid_id").join(
            F.broadcast(qdf), "query_id"
        )

    scored = scored.filter(F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cosine", F.round(_pair_cosine(), 4)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Embedding storage quantization (int8)
# ---------------------------------------------------------------------------

def quantize_embeddings_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization -> (id, scale, qvec, max_err).

    ``q_i = floor(x_i * 127 / scale)`` with ``scale = max|x_i|`` — floor,
    not round, so the math is bit-identical across engines (round() ties
    differ). 4x smaller storage than float32 embedding columns; the
    dequantization error is bounded by scale/127 per component
    (max_err column reports the per-vector actual). At 100 TB of
    embeddings this is the difference between a 25 TB and a 100 TB
    similarity index; rerank the top candidates against the original
    vectors when the last ulps matter.
    """
    # TWO projection stages, not one: `scale` must be a materialized column
    # before the per-element lambdas reference it.  Inlining
    # array_max(transform(v, abs)) into each element's expression makes
    # every HOF pass O(d^2) per row (the O(d) max re-evaluated per
    # element, interpreted) — measured 1.7s -> 0.2s at sf0.1 (2000 x 64).
    staged = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__scale", F.array_max(F.transform("__v", lambda x: F.abs(x))))
    v = F.col("__v")
    scale = F.col("__scale")
    # floor(x*127/scale) is provably in [-127, 127] (|x| <= scale), so the
    # codes are stored as real int8 (tinyint) — that's the actual 4x-vs-
    # float32 cut at the schema level, not just in spirit.  An all-zero
    # vector would make scale=0 and x*127/0 NaN; guard it to all-zero codes
    # (the mathematically exact quantization of the zero vector).
    q = F.when(
        scale > 0, F.transform(v, lambda x: F.floor(x * 127 / scale).cast("tinyint"))
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    deq_err = F.when(
        scale > 0,
        F.array_max(
            F.transform(
                v, lambda x: F.abs(x - F.floor(x * 127 / scale) * scale / 127)
            )
        ),
    ).otherwise(F.lit(0.0))
    return staged.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        q.alias("qvec"),
        F.round(deq_err, 6).alias("max_err"),
    )


# ---------------------------------------------------------------------------
# Tiled BLAS: corpus blocks x query blocks, nothing driver-collected
# ---------------------------------------------------------------------------

def cosine_topk_blas_tiled(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_block_rows: int = 1024,
    corpus_block_rows: int = 4096,
) -> DataFrame:
    """Exact cosine top-k as a BLOCKED matmul join — the scale path past
    :func:`cosine_topk_blas`'s driver-collect + broadcast bound (~0.5 GB
    at 1M x 64 queries).

    Both sides are packed into matrix blocks (``collect_list`` of
    (id, vec) structs per hash-assigned block id — a normal distributed
    aggregation, never a driver collect), the two block tables are
    cross-joined, and each (corpus block x query block) pair is one
    ``Q @ C.T`` BLAS call in mapInPandas that emits only its local
    top-k per query. A final per-query rank merges the block-local
    winners. Identical output to cosine_topk_blas / cosine_topk: same
    round-to-4 before ranking, same neighbor_id tie-break.

    Shuffle cost is the tiling bound: |corpus| x n_query_blocks +
    |queries| x n_corpus_blocks rows — choose block sizes so a block
    pair (~block_rows x dim doubles each side) fits executor memory;
    with 1M x 64 queries in 1024-row blocks a corpus row is replicated
    ~1000x, which is exactly the all-pairs data movement a cartesian
    matmul requires — but spread over tasks, with no single box holding
    the full query matrix. Two count() jobs size the block grids.
    """
    import math

    import numpy as np

    # materialize once: the routing counts would otherwise execute the
    # (possibly derived) inputs, and pack() would re-execute them
    queries = queries.localCheckpoint()
    corpus = corpus.localCheckpoint()
    n_q = queries.count()
    if not n_q:
        raise ValueError("cosine_topk_blas_tiled: empty query set")
    n_c = corpus.count()
    nqb = max(1, math.ceil(n_q / query_block_rows))
    ncb = max(1, math.ceil(n_c / corpus_block_rows))

    pairs = pack_vector_blocks(corpus, ncb, "cb", "cs", id_col, vec_col).crossJoin(
        pack_vector_blocks(queries, nqb, "qb", "qs", id_col, vec_col)
    )

    def score(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                c_ids = np.array([e["id"] for e in row["cs"]])
                c_mat = np.array([np.asarray(e["v"]) for e in row["cs"]])
                q_ids = np.array([e["id"] for e in row["qs"]])
                q_mat = np.array([np.asarray(e["v"]) for e in row["qs"]])
                c_mat = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
                q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
                yield _local_topk_frame(q_ids, c_ids, q_mat @ c_mat.T, k + 1)

    scored = pairs.mapInPandas(score, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ADC search
# ---------------------------------------------------------------------------

def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    iters: int = 5,
):
    """Deterministic PQ codebooks: the vector is split into ``m``
    contiguous subspaces and each gets its own L2 k-means codebook
    (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    Search"). Same driver-sample training recipe as
    :func:`train_ivf_centroids` (FAISS trains on a slice too): sample =
    ``sample_rows`` lowest ids, init = first ``n_codes`` subvectors,
    fixed Lloyd iterations, argmin ties -> lowest code.

    Returns a numpy array (m, n_codes, dim//m).
    """
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("i")
        .limit(sample_rows)
        .collect()
    )
    x = np.array([r.v for r in rows])
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"train_pq_codebooks: dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, n_codes, dsub))
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cents = xs[:n_codes].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # ties -> lowest code
            for c in range(n_codes):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to ``m`` one-byte codes (argmin-L2 per
    subspace) -> columns ``code_0..code_{m-1}`` (tinyint).

    At 64 dims / m=4 / 16 codes this is 4 bytes per vector against 256
    for float32 — the 64x storage compression that lets a 100 TB corpus'
    index live in cluster memory. One mapInPandas projection, zero
    shuffle; the argmin is a (batch x n_codes) BLAS distance per
    subspace.
    """
    import numpy as np

    m, _, dsub = codebooks.shape
    bc = corpus.sparkSession.sparkContext.broadcast(codebooks)
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "cv")

    code_fields = ", ".join(f"code_{j} tinyint" for j in range(m))

    def encode(batches):
        cb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.stack(pdf["cv"].to_numpy())
            out = {"neighbor_id": pdf["neighbor_id"]}
            for j in range(m):
                xs = v[:, j * dsub : (j + 1) * dsub]
                d2 = ((xs[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
                out[f"code_{j}"] = np.argmin(d2, axis=1).astype("int8")
            import pandas as pd

            yield pd.DataFrame(out)

    return c.mapInPandas(encode, f"neighbor_id long, {code_fields}")


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = MAX_QUERY_BATCH,
) -> DataFrame:
    """PQ ANN via Asymmetric Distance Computation: the corpus is scanned
    in COMPRESSED form (m byte codes/vector) and each query carries a
    per-subspace lookup table ``LUT[j][code] = q_j . c[j][code]``, so the
    approximate inner product is m table gathers + m-1 adds per
    candidate — never touching the original vectors.

    This is the memory-bound scan path (FAISS IndexPQ): exact ADC over
    the full corpus, 64x less data moved than a float scan; compose with
    IVF posting lists for the sub-linear candidate path. Score = LUT
    partials accumulated LEFT-TO-RIGHT over j (fixed float association,
    so the SQL oracle's ordered-list sum reproduces it bit-for-bit),
    rounded to 4, ranked (score desc, neighbor_id).
    """
    import numpy as np

    books = train_pq_codebooks(corpus, m, n_codes, id_col, vec_col)
    encoded = pq_encode(corpus, books, id_col, vec_col)

    q_rows = _collect_query_batch(
        _prep(queries, id_col, vec_col, "query_id", "qv"), max_query_rows
    )
    q_ids = np.array([int(r.query_id) for r in q_rows])
    q_mat = np.array([r.qv for r in q_rows])
    dsub = books.shape[2]
    # LUT[q, j, code]
    lut = np.stack(
        [q_mat[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)], axis=1
    )
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, lut))

    def score(batches):
        import pandas as pd

        ids, tables = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            codes = [pdf[f"code_{j}"].to_numpy().astype("int64") for j in range(m)]
            # left-to-right accumulation: ((p0+p1)+p2)+p3 — matches oracle
            s = tables[:, 0, :][:, codes[0]]
            for j in range(1, m):
                s = s + tables[:, j, :][:, codes[j]]
            n_b = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, n_b),
                    "neighbor_id": np.tile(pdf["neighbor_id"].to_numpy(), len(ids)),
                    "score": np.round(s.reshape(-1), 4),
                }
            )

    scored = encoded.mapInPandas(score, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification of ``queries`` against the
    labeled ``corpus``.

    Returns (query_id, predicted_label, votes): the label holding the
    plurality among the k cosine-nearest corpus vectors. Deterministic
    end to end: neighbor ranking inherits :func:`cosine_topk`'s
    round-before-rank + id tie-break, and vote ties break on (best — i.e.
    lowest — neighbor rank, then smallest label).

    Scale: the expensive part IS :func:`cosine_topk` (broadcast queries ×
    corpus scan, no corpus shuffle); the vote is a groupBy over q·k rows.
    For 100 TB corpora swap the neighbor stage for ivf_topk / pq_adc_topk
    — the voting contract is unchanged.
    """
    nn = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nbr_label")
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "nbr_label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("votes"),
            F.min("rank").alias("best_rank"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("best_rank").asc(), F.col("nbr_label").asc()
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nbr_label").alias("predicted_label"), "votes")
    )
