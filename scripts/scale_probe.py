"""Scale probes: measure (not assert) the 100 TB design claims on
synthetic data ~30x the sf0.1 bench tables.

Each probe compares the shipped scale path against the naive
formulation it replaced, on the same synthetic input, and prints one
JSON line per probe: wall seconds and total shuffle-write bytes for
both. Reproducible: deterministic data (spark.range + hash columns),
fixed seeds, min-of-1 (the effects measured are 10x-class, not 10%).

Usage::

    python scripts/scale_probe.py [n_rows]     # default 20_000_000

Probes:

- ``bottomk``: per-group bottom-k sketch, k=1024, 3 groups.
  Scale path: ``bottomk_precut`` + ``merge_bottomk_hash`` (map-side cut,
  k-bounded exchanges). Naive twin: the retired window formulation
  (full-corpus exchange into 3 group partitions, then row_number).
- ``ann_tiled``: exact top-k cosine, 200k x 16-dim corpus, 32 queries.
  Scale path: ``cosine_topk_blas_tiled`` (block matmuls, nothing
  collected). Naive twin: expression-based crossJoin scoring.
- ``global_ranks``: exact global row ranks over a total order.
  Scale path: the round-8 one-job shape (reused range exchange, no
  materialization). Twin: the retired checkpoint-pinned formulation
  (full extra copy of the table to executor storage + a second
  driver job).
- ``lsh_candidates``: LSH candidate-pair fraction vs all pairs on the
  real sf0.1 documents table (the n² baseline is the unmeasurable one).
- ``star_guard`` (r11): the LSH mega-bucket star-connect vs the
  unbounded clique at m=8,192, star alone at m=200k.
- ``ingest_guard`` (r11): the incremental-dedup corpus-probe cap vs the
  unbounded b×m probe join at m=200k, guarded alone at m=2M.
- ``stop_shingle_guard`` (r12): the shingle-frequency cap's
  recall-for-cost trade, with the LSH path's recall on the same
  boilerplate-heavy fixture.
- ``fuzzy_block_guard`` (r12): the hot-block cap in blocked fuzzy
  matching vs the unbounded Levenshtein join, plus the finer-block
  remedy's cost and recall on the same fixture.

Recorded results for all probes live in SCALING.md; toy-size
invariants are pinned in tests/test_scale_probe_smoke.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.session import get_spark


def shuffle_write_bytes(spark):
    try:
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=5
        ) as r:
            return sum(s.get("shuffleWriteBytes", 0) for s in json.load(r))
    except Exception:
        return None


def timed(spark, df):
    before = shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    time.sleep(1.0)
    after = shuffle_write_bytes(spark)
    mb = None if before is None or after is None else round((after - before) / 1e6, 1)
    return round(wall, 2), mb


def probe_bottomk(spark, n_rows: int) -> dict:
    from etl_complete_with_spark_spark.operators.quantiles import (
        bottomk_precut,
        merge_bottomk_hash,
        with_rank_hash,
    )

    k = 1024
    base = (
        spark.range(n_rows)
        .select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("grp"),
            (F.pmod(F.xxhash64("id"), F.lit(100_000)) / 100.0).alias("value"),
        )
    )
    scale = merge_bottomk_hash(
        bottomk_precut(base, ["grp"], "value", k=k, id_col="id"), ["grp"], k=k
    )
    w = Window.partitionBy("grp").orderBy("rank_hash", "id")
    naive = (
        with_rank_hash(base, "id")
        .select("grp", F.col("value"), "rank_hash", "id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    s_wall, s_mb = timed(spark, scale)
    n_wall, n_mb = timed(spark, naive)
    return {
        "probe": "bottomk", "n_rows": n_rows, "k": k,
        "scale_path": {"wall_s": s_wall, "shuffle_mb": s_mb},
        "naive_window": {"wall_s": n_wall, "shuffle_mb": n_mb},
    }


def probe_ann_tiled(spark, n_corpus: int = 200_000, dim: int = 16) -> dict:
    from etl_complete_with_spark_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_blas_tiled,
    )

    vec = F.array(
        *[
            (F.pmod(F.xxhash64(F.col("id") + F.lit(j * 7919)), F.lit(1000)) / 500.0 - 1.0)
            for j in range(dim)
        ]
    )
    corpus = spark.range(n_corpus).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    queries = corpus.filter(F.col("vec_id") < 32)
    s_wall, s_mb = timed(spark, cosine_topk_blas_tiled(corpus, queries, k=5))
    n_wall, n_mb = timed(spark, cosine_topk(corpus, queries, k=5))
    return {
        "probe": "ann_tiled", "n_corpus": n_corpus, "dim": dim,
        "scale_path": {"wall_s": s_wall, "shuffle_mb": s_mb},
        "naive_crossjoin": {"wall_s": n_wall, "shuffle_mb": n_mb},
    }


def probe_global_ranks(spark, n_rows: int) -> dict:
    """The round-8 rank shapes vs the checkpoint-pinned formulation they
    replaced. Construction runs INSIDE the timed region (the pinned
    path's checkpoint + counts collect happen at DataFrame build time —
    timing only the final action would hand it half its work for free).
    The claim under test: one_pass moves the table over the wire ONCE
    (range exchange only); the default window strategy pays a second
    full-data hash exchange; the pinned path pays the second exchange
    PLUS a full cached copy and a second driver job."""
    from etl_complete_with_spark_spark.operators.packing import (
        _global_row_ranks_pinned,
        global_row_ranks,
    )

    def base():
        return spark.range(n_rows).select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 100.0).alias("v"),
        )

    def timed_build(mk):
        before = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(1.0)
        after = shuffle_write_bytes(spark)
        mb = None if before is None or after is None else round((after - before) / 1e6, 1)
        return {"wall_s": round(wall, 2), "shuffle_mb": mb}

    from etl_complete_with_spark_spark.operators.packing import _plan_size_bytes

    return {
        "probe": "global_ranks", "n_rows": n_rows,
        # the round-9 size-aware dispatch input: what this probe table's
        # Catalyst size estimate is, i.e. the number the ONE_PASS_AUTO_BYTES
        # threshold is judged against
        "plan_size_bytes": _plan_size_bytes(base()),
        "one_pass": timed_build(lambda: global_row_ranks(base(), ["v", "id"], one_pass=True)),
        # one_pass=False explicitly: since round 9 the bare call dispatches
        # by plan size and would take the one-pass path at probe scale
        "default_window": timed_build(
            lambda: global_row_ranks(base(), ["v", "id"], one_pass=False)
        ),
        "pinned_checkpoint": timed_build(
            lambda: _global_row_ranks_pinned(base(), ["v", "id"], 32, "__rank", "__n")
        ),
    }


def probe_lsh_candidates(spark, sf_dir: str = "/root/testdata/sf0.1") -> dict:
    """The naive all-pairs dedup is UNMEASURABLE at scale (n^2 pairs is
    the point) — so measure the bound itself: LSH candidate pairs as a
    fraction of all possible pairs, on the real documents table."""
    from etl_complete_with_spark_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    sigs = minhash_signatures(docs).localCheckpoint(eager=False)
    cands = lsh_candidate_pairs(sigs).count()
    all_pairs = n * (n - 1) // 2
    return {
        "probe": "lsh_candidates", "n_docs": n,
        "candidate_pairs": cands, "all_pairs": all_pairs,
        "candidate_fraction": round(cands / all_pairs, 6),
    }


def probe_star_guard(spark, m_ab: int = 8192, m_big: int = 200_000) -> dict:
    """The adversarial mega-duplicate guard, measured (round 11): m
    identical-signature docs land in one bucket per band and the
    unbounded self-join emits m(m-1)/2 pairs. A/B at m=8192 — the
    largest clique still comfortably measurable on this box (33.5M
    pairs) — then the star path alone at m=200k, where the clique would
    be 2.0e10 pairs (~600x the A/B's) and only the O(m) star is
    runnable at all.

    The guarded arms pass the operator's OWN signature default (r12
    VERDICT order 6: probe and product must not diverge — a probe with
    a hard-coded cap keeps "measuring" a guard the shipped default no
    longer applies)."""
    import inspect

    from etl_complete_with_spark_spark.operators.dedup import lsh_candidate_pairs

    shipped = inspect.signature(lsh_candidate_pairs).parameters["max_bucket"].default

    def sigs(m):
        return spark.range(m).select(
            "id", *[F.lit(i + 7).alias(f"mh_{i}") for i in range(16)]
        ).localCheckpoint(eager=False)

    s = sigs(m_ab)
    clique = lsh_candidate_pairs(s, max_bucket=None)
    star = lsh_candidate_pairs(s, max_bucket=shipped)
    wall_clique, mb_clique = timed(spark, clique)
    wall_star, mb_star = timed(spark, star)
    big = lsh_candidate_pairs(sigs(m_big), max_bucket=shipped)
    wall_big, mb_big = timed(spark, big)
    return {
        "probe": "star_guard", "m_ab": m_ab,
        "guard_cap_default": shipped,
        "clique_pairs": clique.count(), "star_pairs": star.count(),
        "clique_wall_s": wall_clique, "star_wall_s": wall_star,
        "clique_shuffle_mb": mb_clique, "star_shuffle_mb": mb_star,
        "m_big": m_big, "big_star_pairs": big.count(),
        "big_clique_pairs_analytic": m_big * (m_big - 1) // 2,
        "big_star_wall_s": wall_big, "big_star_shuffle_mb": mb_big,
    }


def probe_ingest_guard(
    spark, m_ab: int = 200_000, m_big: int = 2_000_000, b: int = 512
) -> dict:
    """The continual-ingest corpus-probe bound, measured (round 11): a
    stored mega-cluster of m identical-signature docs makes the
    unbounded probe join b x m rows per band for a matching batch of b
    docs. A/B at m=200k (unbounded probe 1e8 rows/band, measurable),
    then the guarded path alone at m=2M, where the unbounded probe
    would be 1e9 rows/band and the guarded one stays at b x cap.

    Walls time CONSTRUCTION + action together: the operator's internal
    localCheckpoint materializes its upstream stages when the operator
    is BUILT (AQE finalizes the adaptive plan for toRdd) — timing only
    the action reads the ~0.4 s final stage and misses >99% of the work
    (the round-11 finding recorded in SCALING.md). The corpus is read
    from parquet like a production signature table, so the scan is not
    constant-foldable."""
    import shutil
    import tempfile

    import inspect

    from etl_complete_with_spark_spark.operators.dedup import (
        _resolve_max_bucket,
        incremental_neardup_filter,
        minhash_signatures,
    )

    # the operator's shipped default, introspected (r12 VERDICT order 6)
    shipped = inspect.signature(incremental_neardup_filter).parameters[
        "max_bucket"
    ].default
    shipped_rows = _resolve_max_bucket(shipped)

    text = (
        "the same boilerplate page body repeated across the crawl "
        "with enough tokens to shingle meaningfully over and over"
    )
    batch = spark.range(b).select(
        F.concat(F.lit("new-"), F.col("id").cast("string")).alias("doc_id"),
        F.lit(text).alias("text"),
    )
    # the stored mega-cluster: every corpus doc carries the batch's
    # signature (computed once on one doc, inlined as literals), written
    # to parquet so the probe scans a real stored table
    one = minhash_signatures(batch.limit(1), "doc_id", "text").collect()[0]
    tmp = tempfile.mkdtemp(prefix="ingest_guard_probe_")

    def write_corpus(m, path):
        spark.range(m).select(
            F.concat(F.lit("old-"), F.col("id").cast("string")).alias("id"),
            *[F.lit(int(one[f"mh_{i}"])).alias(f"mh_{i}") for i in range(16)],
        ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def run(corpus_df, cap):
        t0 = time.perf_counter()
        kept, _ = incremental_neardup_filter(batch, corpus_df, max_bucket=cap)
        n_kept = kept.count()
        return round(time.perf_counter() - t0, 2), n_kept

    try:
        corpus = write_corpus(m_ab, os.path.join(tmp, "ab"))
        wall_unbounded, kept_u = run(corpus, None)
        wall_guarded, kept_g = run(corpus, shipped)
        big = write_corpus(m_big, os.path.join(tmp, "big"))
        wall_big, kept_b = run(big, shipped)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "probe": "ingest_guard", "batch": b, "m_ab": m_ab,
        "guard_cap_default": shipped,
        "unbounded_wall_s": wall_unbounded, "guarded_wall_s": wall_guarded,
        "kept_unbounded": kept_u, "kept_guarded": kept_g,
        "unbounded_probe_rows_per_band": b * m_ab,
        "guarded_probe_rows_per_band": b * shipped_rows,
        "m_big": m_big, "big_guarded_wall_s": wall_big,
        "big_kept": kept_b,
        "big_unbounded_probe_rows_per_band_analytic": b * m_big,
    }


def _build_boilerplate_corpus(spark, n_docs: int, m_cluster: int, path: str):
    """Deterministic boilerplate-heavy fixture: every doc opens with the
    same 8-word boilerplate sentence (6 trigram shingles at frequency
    n_docs — the f² hazard the stop-shingle cap exists for); docs with
    id < m_cluster continue with a shared 19-word body plus one unique
    closing token (pairwise shingle-Jaccard 25/27 ≈ 0.93 — a genuine
    near-dup cluster whose shared shingles sit at frequency m_cluster);
    the rest get 20 unique tokens each (cross-doc Jaccard ≈ 0.13, below
    every threshold). Written to parquet so the probe scans a real
    table."""
    boiler = "terms of service apply to every page here"
    body = (
        "this exact product description is repeated almost verbatim "
        "across the catalog pages with only the trailing sku token changed"
    )
    uniq_tail = F.concat_ws(
        " ", *[F.concat(F.lit(f"w{j}x"), F.col("id").cast("string")) for j in range(20)]
    )
    docs = spark.range(n_docs).select(
        F.when(
            F.col("id") < m_cluster,
            F.concat(F.lit("c-"), F.lpad(F.col("id").cast("string"), 7, "0")),
        )
        .otherwise(F.concat(F.lit("x-"), F.lpad(F.col("id").cast("string"), 7, "0")))
        .alias("doc_id"),
        F.when(
            F.col("id") < m_cluster,
            F.concat_ws(
                " ", F.lit(boiler), F.lit(body),
                F.concat(F.lit("sku"), F.col("id").cast("string")),
            ),
        )
        .otherwise(F.concat_ws(" ", F.lit(boiler), uniq_tail))
        .alias("text"),
    )
    docs.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def probe_stop_shingle_guard(
    spark,
    n_ab: int = 2_000,
    m_ab: int = 200,
    cap_ab: int = 100,
    n_big: int = 100_000,
    m_big: int = 8_192,
) -> dict:
    """The one guard whose trade is recall-for-cost, measured (round 12,
    r11 VERDICT order 7): the stop-shingle cap in ngram_jaccard_pairs
    bounds the f² posting self-join but LOSES near-dup clusters larger
    than the cap entirely (no hub fallback). A/B at n=2k docs with a
    planted 200-member cluster and cap=100 < 200: the unbounded arm is
    still measurable (~25M posting-join rows from the frequency-n
    boilerplate shingles) and finds the full 19,900-pair clique; the
    capped arm kills the join blow-up AND the cluster (0 pairs, the
    drop quantified by the stats row). The LSH path on the SAME fixture
    (minhash_dedup_pairs, star guard on) is the documented remedy —
    its recall on the planted cluster is recorded alongside. Then big
    mode at n=100k / m=8192 > LSH_MAX_BUCKET_AUTO, where the unbounded
    jaccard arm is analytic-only (6e10 join rows from the boilerplate
    alone), the capped arm stays flat, and the LSH star keeps every
    cluster member detected through O(m) hub edges.

    Walls time CONSTRUCTION + action together (both operators carry
    internal lazy localCheckpoints that materialize upstream stages at
    build time — the round-11 finding)."""
    import inspect
    import shutil
    import tempfile

    from etl_complete_with_spark_spark.operators.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
    )

    def run_jaccard(docs, cap):
        t0 = time.perf_counter()
        pairs, stats = ngram_jaccard_pairs(
            docs, max_shingle_freq=cap, return_stats=True
        )
        n_pairs = pairs.count()
        wall = round(time.perf_counter() - t0, 2)
        s = stats.collect()[0]
        return {
            "wall_s": wall, "pairs_found": n_pairs,
            "n_stop_shingles_dropped": s["n_stop_shingles_dropped"],
            "n_postings_dropped": s["n_postings_dropped"],
        }

    def run_lsh(docs, m):
        # wall covers construction + ONE action (the pair count), the
        # same work shape run_jaccard times — the coverage count below
        # is a second action and stays OUTSIDE the timed region so the
        # jaccard-vs-LSH wall comparison is like-for-like (r12 review)
        t0 = time.perf_counter()
        pairs = minhash_dedup_pairs(docs, threshold=0.5, max_bucket="auto")
        cluster = pairs.filter(
            F.col("id1").startswith("c-") & F.col("id2").startswith("c-")
        )
        n_pairs = cluster.count()
        wall = round(time.perf_counter() - t0, 2)
        covered = (
            cluster.select(F.col("id1").alias("id"))
            .union(cluster.select(F.col("id2").alias("id")))
            .distinct()
            .count()
        )
        return {
            "wall_s": wall,
            "cluster_pairs": n_pairs,
            "cluster_members_detected": covered,
            "cluster_members": m,
        }

    # analytic posting-join rows: 6 boilerplate shingles at f=n plus 19
    # cluster-body/crossing shingles at f=m (unique-tail shingles are
    # f=1 noise; counts confirmed by the stats row: 25 stop-shingles,
    # 6n+19m postings at cap < m)
    def join_rows(n, m):
        return 6 * n * n + 19 * m * m

    tmp = tempfile.mkdtemp(prefix="stop_shingle_probe_")
    try:
        docs = _build_boilerplate_corpus(spark, n_ab, m_ab, os.path.join(tmp, "ab"))
        unbounded = run_jaccard(docs, None)
        capped = run_jaccard(docs, cap_ab)
        lsh = run_lsh(docs, m_ab)
        big = _build_boilerplate_corpus(
            spark, n_big, m_big, os.path.join(tmp, "big")
        )
        # the operator's REAL default cap, introspected so the probe can
        # never silently diverge from what production callers get
        default_cap = inspect.signature(ngram_jaccard_pairs).parameters[
            "max_shingle_freq"
        ].default
        big_capped = run_jaccard(big, default_cap)
        big_lsh = run_lsh(big, m_big)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "probe": "stop_shingle_guard",
        "n_ab": n_ab, "m_ab": m_ab, "cap_ab": cap_ab,
        "true_cluster_pairs_ab": m_ab * (m_ab - 1) // 2,
        "unbounded_join_rows_analytic_ab": join_rows(n_ab, m_ab),
        "unbounded": unbounded, "capped": capped, "lsh": lsh,
        "n_big": n_big, "m_big": m_big,
        "true_cluster_pairs_big": m_big * (m_big - 1) // 2,
        "big_unbounded_join_rows_analytic": join_rows(n_big, m_big),
        "big_capped": big_capped, "big_lsh": big_lsh,
    }


def probe_fuzzy_block_guard(
    spark, m_ab: int = 8_192, m_big: int = 200_000, cap=None
) -> dict:
    """The hot-block cap in blocked_fuzzy_pairs, measured (round 12,
    completing the guard-probe family): m distinct values sharing one
    non-discriminative blocking key (every name ending in "inc") make
    the blocked self-join m(m-1)/2 Levenshtein comparisons. A/B at
    m=8,192 (33.5M comparisons, measurable): the unbounded arm finds
    the m/2 planted distance-1 pairs; the auto cap (4096 < m) drops the
    block — 0 pairs, flat cost, the drop quantified by the stats row.
    The DOCUMENTED remedy (the operator docstring: supply a finer
    ``block`` expression) on the same fixture — first token, which the
    planted pairs share — finds every true pair at O(m) cost. Then big
    mode at m=200k, where the unbounded join would be 2e10 comparisons
    (analytic-only) and both the cap and the finer-block path stay
    flat.

    Fixture: value 2k/2k+1 = "<md5-16-hex of k> plant{a|b} inc" —
    pair distance 1, cross-pair distance >= 14 (16 random hex chars),
    so ground truth is exactly m/2 pairs. Values written to parquet;
    walls time construction + action.

    ``cap=None`` (the recorded-run mode) measures the operator's OWN
    signature default, introspected so probe and product can't diverge
    (r12 VERDICT order 6); the toy smoke test overrides it to force the
    drop path below the shipped cap."""
    import inspect
    import shutil
    import tempfile

    from etl_complete_with_spark_spark.operators.dedup import blocked_fuzzy_pairs

    if cap is None:
        cap = inspect.signature(blocked_fuzzy_pairs).parameters["max_block"].default

    def write_values(m, path):
        base = F.substring(F.md5((F.col("id") / 2).cast("bigint").cast("string")), 1, 16)
        variant = F.when(F.col("id") % 2 == 0, "planta").otherwise("plantb")
        spark.range(m).select(
            F.concat_ws(" ", base, variant, F.lit("inc")).alias("name")
        ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def run(vals, max_block, block=None):
        t0 = time.perf_counter()
        pairs, stats = blocked_fuzzy_pairs(
            vals, "name", block=block, max_distance=3,
            max_block=max_block, return_stats=True,
        )
        n_pairs = pairs.count()
        wall = round(time.perf_counter() - t0, 2)
        s = stats.collect()[0]
        return {
            "wall_s": wall, "pairs_found": n_pairs,
            "n_blocks_dropped": s["n_blocks_dropped"],
            "n_values_dropped": s["n_values_dropped"],
        }

    finer = F.element_at(F.split(F.col("name"), " "), 1)
    tmp = tempfile.mkdtemp(prefix="fuzzy_block_probe_")
    try:
        vals = write_values(m_ab, os.path.join(tmp, "ab"))
        unbounded = run(vals, None)
        capped = run(vals, cap)
        remedy = run(vals, cap, block=finer)
        big = write_values(m_big, os.path.join(tmp, "big"))
        big_capped = run(big, cap)
        big_remedy = run(big, cap, block=finer)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "probe": "fuzzy_block_guard", "m_ab": m_ab,
        "guard_cap": cap,
        "true_pairs_ab": m_ab // 2,
        "unbounded_comparisons_ab": m_ab * (m_ab - 1) // 2,
        "unbounded": unbounded, "capped": capped,
        "finer_block_remedy": remedy,
        "m_big": m_big, "true_pairs_big": m_big // 2,
        "big_unbounded_comparisons_analytic": m_big * (m_big - 1) // 2,
        "big_capped": big_capped, "big_finer_block_remedy": big_remedy,
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(
        app_name="scale-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    print(json.dumps(probe_bottomk(spark, n_rows)))
    print(json.dumps(probe_ann_tiled(spark)))
    print(json.dumps(probe_global_ranks(spark, n_rows)))
    print(json.dumps(probe_lsh_candidates(spark)))
    print(json.dumps(probe_star_guard(spark)))
    print(json.dumps(probe_ingest_guard(spark)))
    print(json.dumps(probe_stop_shingle_guard(spark)))
    print(json.dumps(probe_fuzzy_block_guard(spark)))
    spark.stop()


if __name__ == "__main__":
    main()
