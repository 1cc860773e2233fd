"""Tests for the training-data operators (text / dedup / similarity)."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from etl_complete_with_spark_spark.operators import dedup as D
from etl_complete_with_spark_spark.operators import similarity as SIM
from etl_complete_with_spark_spark.operators import text as TX


def docs(spark, *texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


class TestTokenStats:
    def test_counts_and_ratios(self, spark):
        df = docs(spark, "the cat the cat sat")
        r = TX.with_token_stats(df).first()
        assert r.n_tokens == 5
        assert r.avg_token_len == 3.0
        assert r.type_token_ratio == 0.6  # {the, cat, sat} / 5
        assert r.stopword_ratio == 0.4  # 'the' twice

    def test_empty_text(self, spark):
        r = TX.with_token_stats(docs(spark, "")).first()
        assert r.n_tokens == 0 and r.avg_token_len == 0.0

    def test_bpe_counts_subword_pieces(self, spark):
        r = TX.with_token_stats(docs(spark, "can't stop2go")).first()
        # can | ' | t | stop | 2 | go
        assert r.n_tokens_bpe == 6

    def test_quality_score_bounds(self, spark):
        rows = TX.with_quality_score(
            docs(spark, "the of and to in a is that for on it " * 20, "x")
        ).collect()
        assert all(0.0 <= r.quality_score <= 1.0 for r in rows)

    def test_quality_bp_matches_float_score(self, spark):
        """with_quality_bp is the integer-basis-point form of the same
        score: q_bp == quality_score * 10000 exactly (the float score is
        DEFINED as bp/10000, so equality is exact, not approximate)."""
        df = docs(
            spark,
            "the of and to in a is that for on it " * 20,
            "a diverse sentence with many distinct interesting words here",
            "x",
            "",
        )
        rows = (
            TX.with_quality_bp(TX.with_quality_score(df))
            .select("quality_score", "q_bp")
            .collect()
        )
        assert rows and all(r.q_bp == round(r.quality_score * 10000) for r in rows)
        assert all(0 <= r.q_bp <= 10000 for r in rows)


class TestLangId:
    def test_marker_based_prediction(self, spark):
        df = docs(
            spark,
            "the cat is in the house and it is warm",
            "der hund ist nicht das problem und die katze",
            "el perro es que la casa y los gatos",
            "le chien est que les chats et une maison",
            "完全 中文 文本 没有 空格 问题",
        )
        out = {r.doc_id: r.lang_pred for r in TX.with_language_id(df).collect()}
        assert out == {0: "en", 1: "de", 2: "es", 3: "fr", 4: "zh"}

    def test_no_markers_is_und(self, spark):
        assert TX.with_language_id(docs(spark, "zzz qqq www")).first().lang_pred == "und"


class TestFingerprint:
    def test_normalization_collapses(self, spark):
        df = docs(spark, "Hello   World", "hello world", "hello  world!")
        fps = [r.fingerprint for r in TX.with_fingerprint(df).collect()]
        assert fps[0] == fps[1] != fps[2]


class TestExactDedup:
    def test_keeps_lowest_id(self, spark):
        df = docs(spark, "a b c", "A  b C", "different text")
        out = D.exact_dedup(df)
        assert sorted(r.doc_id for r in out.collect()) == [0, 2]


class TestShinglesJaccard:
    def test_shingle_window(self, spark):
        out = docs(spark, "a b c d").select(D.shingles(F.col("text"), 2).alias("s")).first().s
        assert sorted(out) == ["a b", "b c", "c d"]

    def test_short_text_no_shingles(self, spark):
        out = docs(spark, "a b").select(D.shingles(F.col("text"), 3).alias("s")).first().s
        assert out == []

    def test_jaccard_exact_value(self, spark):
        # 2-shingles: {a b, b c, c d} vs {a b, b c, c x} -> J = 2/4 = 0.5
        df = docs(spark, "a b c d", "a b c x")
        pair = D.ngram_jaccard_pairs(df, n=2, threshold=0.1).first()
        assert (pair.id1, pair.id2, pair.jaccard) == (0, 1, 0.5)

    def test_identical_docs_jaccard_one(self, spark):
        df = docs(spark, "x y z w v", "x y z w v")
        assert D.ngram_jaccard_pairs(df, n=3, threshold=0.9).first().jaccard == 1.0

    def test_disjoint_docs_no_pairs(self, spark):
        df = docs(spark, "a b c d e", "v w x y z")
        assert D.ngram_jaccard_pairs(df, n=2, threshold=0.01).count() == 0


class TestMinHash:
    def test_identical_docs_identical_signatures(self, spark):
        df = docs(spark, "one two three four five", "one two three four five")
        sigs = D.minhash_signatures(df, num_hashes=8).collect()
        s0 = [r for r in sigs if r.id == 0][0]
        s1 = [r for r in sigs if r.id == 1][0]
        assert all(s0[f"mh_{i}"] == s1[f"mh_{i}"] for i in range(8))

    def test_lsh_finds_neardups_not_disjoint(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        df = docs(spark, base, base + " extra", "totally different words entirely here now")
        pairs = D.minhash_dedup_pairs(df, num_hashes=16, bands=4, threshold=0.3)
        got = {(r.id1, r.id2) for r in pairs.collect()}
        assert (0, 1) in got
        assert all(2 not in p for p in got)


class TestSimHash:
    def test_deterministic_and_close_for_neardups(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = docs(spark, base, base + " lambda", "omega psi chi phi upsilon tau")
        sigs = {r.id: r.simhash for r in D.simhash(df).collect()}
        ham01 = bin(sigs[0] ^ sigs[1]).count("1")
        ham02 = bin(sigs[0] ^ sigs[2]).count("1")
        assert ham01 < ham02

    def test_neardup_pairs_by_hamming(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = docs(spark, base, base, "omega psi chi phi upsilon tau")
        pairs = D.simhash_neardup_pairs(df, max_hamming=0).collect()
        assert [(p.id1, p.id2, p.hamming) for p in pairs] == [(0, 1, 0)]


def vec_rows(spark, vectors):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vectors)]
    )


class TestEmbeddingOps:
    def test_cosine_expr_known_value(self, spark):
        df = vec_rows(spark, [[1, 0], [0.6, 0.8]])
        a = df.filter("vec_id=0").select(F.col("embedding").cast("array<double>").alias("a"))
        b = df.filter("vec_id=1").select(F.col("embedding").cast("array<double>").alias("b"))
        v = a.crossJoin(b).select(D.cosine_expr(F.col("a"), F.col("b")).alias("c")).first().c
        assert math.isclose(v, 0.6, abs_tol=1e-9)

    def test_neardup_pairs_exact(self, spark):
        df = vec_rows(spark, [[1, 0, 0], [0.999, 0.01, 0], [0, 1, 0]])
        pairs = D.embedding_neardup_pairs(df, threshold=0.95)
        got = [(r.id1, r.id2) for r in pairs.collect()]
        assert got == [(0, 1)]

    def test_topk_bruteforce_ordering(self, spark):
        corpus = vec_rows(spark, [[1, 0], [0.9, 0.1], [0, 1], [-1, 0]])
        queries = vec_rows(spark, [[1, 0]]).filter("vec_id = 0")
        out = SIM.cosine_topk(corpus, queries, k=2).collect()
        assert [(r.neighbor_id, r.rank) for r in out] == [(1, 1), (2, 2)]

    def test_lsh_topk_recall_on_clustered_data(self, spark):
        # LSH recall is only meaningful on clustered vectors (on uniform
        # random data — like the synthetic embeddings table, top-1 cosine
        # ~0.3 — no sketch can beat chance). 10 tight clusters in R^16.
        import random

        rng = random.Random(42)
        centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(10)]
        vectors = []
        for ci, c in enumerate(centers):
            for _ in range(20):
                vectors.append([x + rng.gauss(0, 0.05) for x in c])
        corpus = vec_rows(spark, vectors)
        queries = corpus.filter("vec_id IN (0, 20, 40, 60, 80)")
        brute = {
            (r.query_id, r.neighbor_id)
            for r in SIM.cosine_topk(corpus, queries, k=5).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in SIM.lsh_topk(corpus, queries, k=5, bits=8, probe_hamming=1).collect()
        }
        recall = len(brute & approx) / len(brute)
        assert recall >= 0.9, f"LSH recall too low on clustered data: {recall}"

    def test_lsh_topk_prunes_candidates_on_real_embeddings(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter("vec_id < 3")
        out = SIM.lsh_topk(emb, queries, k=5, bits=6, probe_hamming=1)
        # shape contract: ranked, deduped, <= k per query
        rows = out.collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r.rank)
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
        assert all(len(v) <= 5 for v in per_q.values())


class TestBlasTopK:
    def test_blas_matches_expression_path(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter("vec_id < 5")
        expr = {(r.query_id, r.neighbor_id) for r in SIM.cosine_topk(emb, queries, k=5).collect()}
        blas = {(r.query_id, r.neighbor_id) for r in SIM.cosine_topk_blas(emb, queries, k=5).collect()}
        overlap = len(expr & blas) / len(expr)
        assert overlap >= 0.95, f"BLAS/expression mismatch: {overlap}"

    def test_blas_cosines_numerically_close(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter("vec_id < 2")
        expr = {(r.query_id, r.neighbor_id): r.cosine for r in SIM.cosine_topk(emb, queries, k=5).collect()}
        blas = {(r.query_id, r.neighbor_id): r.cosine for r in SIM.cosine_topk_blas(emb, queries, k=5).collect()}
        common = set(expr) & set(blas)
        assert common
        assert all(abs(expr[p] - blas[p]) <= 1e-3 for p in common)


class TestBlasNearDup:
    def test_blas_identical_to_expression_path(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        expr = {(r.id1, r.id2): r.cosine for r in D.embedding_neardup_pairs(emb, threshold=0.3).collect()}
        blas = {(r.id1, r.id2): r.cosine for r in D.embedding_neardup_pairs_blas(emb, threshold=0.3).collect()}
        assert set(expr) == set(blas)
        assert all(expr[k] == blas[k] for k in expr)


class TestBlasTiled:
    """The tiled twins remove the driver-collect+broadcast bound; their
    output must be ROW-IDENTICAL to the broadcast paths (same rounding,
    same tie-breaks), with tiny blocks forcing a real multi-block grid."""

    def test_tiled_topk_identical_to_broadcast_path(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter("vec_id < 5")
        broadcast = {
            (r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in SIM.cosine_topk_blas(emb, queries, k=5).collect()
        }
        tiled = {
            (r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in SIM.cosine_topk_blas_tiled(
                emb, queries, k=5, query_block_rows=2, corpus_block_rows=64
            ).collect()
        }
        assert tiled == broadcast

    def test_tiled_topk_matches_exact_expression_path(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter("vec_id < 3")
        exact = {
            (r.query_id, r.neighbor_id)
            for r in SIM.cosine_topk(emb, queries, k=5).collect()
        }
        tiled = {
            (r.query_id, r.neighbor_id)
            for r in SIM.cosine_topk_blas_tiled(
                emb, queries, k=5, query_block_rows=1, corpus_block_rows=100
            ).collect()
        }
        overlap = len(exact & tiled) / len(exact)
        assert overlap >= 0.95, f"tiled/exact mismatch: {overlap}"

    def test_tiled_neardup_identical_to_broadcast_path(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        blas = {
            (r.id1, r.id2): r.cosine
            for r in D.embedding_neardup_pairs_blas(emb, threshold=0.3).collect()
        }
        tiled = {
            (r.id1, r.id2): r.cosine
            for r in D.embedding_neardup_pairs_blas_tiled(
                emb, threshold=0.3, block_rows=64
            ).collect()
        }
        assert set(tiled) == set(blas)
        assert all(tiled[k] == blas[k] for k in tiled)


class TestChunking:
    def test_chunks_cover_with_overlap(self, spark):
        from etl_complete_with_spark_spark.operators.chunking import chunk_documents

        text = " ".join(f"w{i}" for i in range(100))
        df = docs(spark, text)
        out = chunk_documents(df, chunk_tokens=32, overlap=8).orderBy("chunk_idx").collect()
        # stride 24: starts 0,24,48,72 — start 96 is redundant (72+32 >= 100)
        assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
        assert out[0].chunk_text.startswith("w0 ") and out[1].chunk_text.startswith("w24 ")
        assert out[0].n_tokens == 32 and out[-1].n_tokens == 28
        # full coverage: last chunk reaches the last token
        assert out[-1].chunk_text.split()[-1] == "w99"
        # overlap: chunk 1 starts 8 tokens before chunk 0 ends
        assert out[0].chunk_text.split()[-8:] == out[1].chunk_text.split()[:8]

    def test_short_and_empty_docs_one_chunk(self, spark):
        from etl_complete_with_spark_spark.operators.chunking import chunk_documents

        out = chunk_documents(docs(spark, "a b c", ""), chunk_tokens=32, overlap=8).collect()
        per_doc = {}
        for r in out:
            per_doc.setdefault(r.doc_id, []).append(r)
        assert len(per_doc[0]) == 1 and per_doc[0][0].n_tokens == 3
        assert len(per_doc[1]) == 1 and per_doc[1][0].n_tokens == 0

    def test_invalid_overlap_rejected(self, spark):
        import pytest as _pytest

        from etl_complete_with_spark_spark.operators.chunking import chunk_documents

        with _pytest.raises(ValueError):
            chunk_documents(docs(spark, "x"), chunk_tokens=8, overlap=8)


class TestPiiScrub:
    def test_patterns_redacted(self, spark):
        from etl_complete_with_spark_spark.operators.chunking import scrub_pii

        df = docs(
            spark,
            "contact me at john.doe+spam@example.co.uk or +1 (555) 123-4567 id 123456789012",
        )
        out = scrub_pii(df).first().text_scrubbed
        assert "<EMAIL>" in out and "@" not in out
        assert "<PHONE>" in out
        assert "<NUM>" in out and "123456789012" not in out

    def test_clean_text_untouched(self, spark):
        from etl_complete_with_spark_spark.operators.chunking import scrub_pii

        assert scrub_pii(docs(spark, "nothing personal here")).first().text_scrubbed == "nothing personal here"


class TestIncrementalDedup:
    def test_new_batch_filtered_against_corpus_and_itself(self, spark):
        corpus = docs(
            spark,
            "the quick brown fox jumps over the lazy dog again and again today",
            "completely unrelated text about spark query engines and shuffles",
        )
        corpus_sigs = D.minhash_signatures(corpus, num_hashes=16)
        new = spark.createDataFrame(
            [
                # near-dup of corpus doc 0 -> must be dropped
                (10, "the quick brown fox jumps over the lazy dog again and again today extra"),
                # novel -> kept
                (11, "a genuinely new document with different words entirely here now"),
                # near-dup of 11 within the batch -> dropped (11 < 12)
                (12, "a genuinely new document with different words entirely here now plus"),
            ],
            "doc_id long, text string",
        )
        kept, kept_sigs = D.incremental_neardup_filter(new, corpus_sigs, threshold=0.3)
        ids = sorted(r.doc_id for r in kept.collect())
        assert ids == [11]
        assert sorted(r.id for r in kept_sigs.collect()) == [11]

    def test_appending_kept_sigs_blocks_future_dups(self, spark):
        corpus = docs(spark, "seed document with some words in it for the corpus table")
        sigs = D.minhash_signatures(corpus, num_hashes=16)
        b1 = spark.createDataFrame(
            [(20, "first novel batch document with plenty of distinct tokens inside")],
            "doc_id long, text string",
        )
        kept1, s1 = D.incremental_neardup_filter(b1, sigs, threshold=0.3)
        sigs = sigs.unionByName(s1)
        # batch 2 re-sends the same doc under a new id -> dropped
        b2 = spark.createDataFrame(
            [(30, "first novel batch document with plenty of distinct tokens inside")],
            "doc_id long, text string",
        )
        kept2, _ = D.incremental_neardup_filter(b2, sigs, threshold=0.3)
        assert kept1.count() == 1 and kept2.count() == 0


class TestConnectedComponents:
    def test_chain_cycle_isolated(self, spark):
        from etl_complete_with_spark_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21)],
            "id1 long, id2 long",
        )
        verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21, 99]], "id long")
        out = {r.id: r.component for r in connected_components(edges, verts).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 99: 99}

    def test_long_chain_converges(self, spark):
        from etl_complete_with_spark_spark.operators.graph import connected_components

        # a 12-vertex chain needs several label-propagation rounds
        edges = spark.createDataFrame([(i, i + 1) for i in range(12)], "id1 long, id2 long")
        out = {r.id: r.component for r in connected_components(edges).collect()}
        assert set(out.values()) == {0} and len(out) == 13


class TestSketchBlasTwin:
    def test_blas_sketch_identical_to_expression(self, spark, sf_dir):
        from etl_complete_with_spark_spark.operators.dedup import hyperplane_sketch
        from etl_complete_with_spark_spark.operators.similarity import (
            hyperplane_sketch_blas,
        )
        from etl_complete_with_spark_spark.queries import load

        emb = load(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        expr = {
            r.vec_id: r.b
            for r in emb.withColumn("b", hyperplane_sketch(F.col("v"), 6)).collect()
        }
        blas = {
            r.vec_id: r.bucket
            for r in hyperplane_sketch_blas(emb, "v", 6).collect()
        }
        assert expr == blas


class TestIvf:
    def test_full_probe_equals_brute_force(self, spark, sf_dir):
        from etl_complete_with_spark_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
        )
        from etl_complete_with_spark_spark.queries import load

        emb = load(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        full = sorted(map(tuple, ivf_topk(emb, q, k=10, n_centroids=8, nprobe=8).collect()))
        brute = sorted(map(tuple, cosine_topk(emb, q, k=10).collect()))
        assert full == brute

    def test_partial_probe_recall_floor(self, spark, sf_dir):
        from etl_complete_with_spark_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
        )
        from etl_complete_with_spark_spark.queries import load

        emb = load(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        brute = set(
            (r.query_id, r.neighbor_id)
            for r in cosine_topk(emb, q, k=10).collect()
        )
        part = set(
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, q, k=10, n_centroids=16, nprobe=4).collect()
        )
        # nprobe/n_centroids = 25% of lists; spherical clustering must beat
        # random-list chance by a wide margin even on near-uniform vectors
        assert len(part & brute) / len(brute) >= 0.5

    def test_distributed_assignment_matches_driver(self, spark, sf_dir):
        """The corpus-scale-query path (queries never collected) must be
        bit-identical to the driver-broadcast path: same stable-argsort
        probe sets, same scoring, same ranking — only the plan differs.
        Also proves it ignores max_query_rows (it has no driver collect
        to bound)."""
        from etl_complete_with_spark_spark.operators.similarity import ivf_topk
        from etl_complete_with_spark_spark.queries import load

        emb = load(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 40)
        driver = sorted(
            map(tuple, ivf_topk(emb, q, k=7, n_centroids=8, nprobe=3).collect())
        )
        dist = sorted(
            map(
                tuple,
                ivf_topk(
                    emb, q, k=7, n_centroids=8, nprobe=3,
                    assignment="distributed", max_query_rows=1,
                ).collect(),
            )
        )
        assert driver == dist and len(driver) > 0

    def test_query_batch_bound_enforced(self, spark, sf_dir):
        """IVF and PQ-ADC collect the QUERY set on the driver; the
        max_query_rows ceiling must refuse oversized batches loudly
        instead of porting the ANN problem to the driver."""
        import pytest

        from etl_complete_with_spark_spark.operators.similarity import (
            ivf_topk,
            pq_adc_topk,
        )
        from etl_complete_with_spark_spark.queries import load

        emb = load(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        with pytest.raises(ValueError, match="query batch exceeds"):
            ivf_topk(emb, q, k=3, max_query_rows=4)
        with pytest.raises(ValueError, match="query batch exceeds"):
            pq_adc_topk(emb, q, k=3, m=4, max_query_rows=4)
        # at the bound, both paths still run
        assert ivf_topk(emb, q, k=3, max_query_rows=5).count() > 0


class TestQuantization:
    def test_error_bound_and_cosine_preservation(self, spark, sf_dir):
        import math

        from etl_complete_with_spark_spark.operators.similarity import (
            quantize_embeddings_int8,
        )
        from etl_complete_with_spark_spark.queries import load

        emb = load(spark, sf_dir, "embeddings")
        q = quantize_embeddings_int8(emb)
        rows = q.join(
            emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
            "vec_id",
        ).collect()
        assert rows
        for r in rows[:50]:
            # per-component error bound: |x - dq(x)| <= scale/127
            assert r.max_err <= r.scale / 127 + 1e-9
            # dequantized vector stays close in cosine to the original
            dq = [c * r.scale / 127 for c in r.qvec]
            dot = sum(a * b for a, b in zip(dq, r.v))
            na = math.sqrt(sum(a * a for a in dq))
            nb = math.sqrt(sum(b * b for b in r.v))
            assert dot / (na * nb) > 0.995

    def test_zero_vector_and_tinyint_schema(self, spark):
        from etl_complete_with_spark_spark.operators.similarity import (
            quantize_embeddings_int8,
        )

        df = spark.createDataFrame(
            [(0, [0.0, 0.0, 0.0]), (1, [1.0, -1.0, 0.5])],
            "vec_id long, embedding array<double>",
        )
        q = quantize_embeddings_int8(df)
        # codes are REAL int8 at the schema level (the advertised 4x cut)
        assert q.schema["qvec"].dataType.simpleString() == "array<tinyint>"
        rows = {r.vec_id: r for r in q.collect()}
        # all-zero vector: zero codes / zero error, never NaN or null
        assert rows[0].qvec == [0, 0, 0] and rows[0].max_err == 0.0
        assert rows[0].scale == 0.0
        assert rows[1].qvec == [127, -127, 63]
        # floor(x*127/scale) is in [-127, 127] for every |x| <= scale
        assert all(-128 <= c <= 127 for c in rows[1].qvec)


class TestBlockedFuzzyPairs:
    def test_matches_brute_force_within_distance(self, spark, sf_dir):
        import itertools

        from etl_complete_with_spark_spark.operators.dedup import blocked_fuzzy_pairs
        from etl_complete_with_spark_spark.queries import load

        part = load(spark, sf_dir, "part")
        got = {
            (r.v1, r.v2): r.distance
            for r in blocked_fuzzy_pairs(part, "p_name", max_distance=3).collect()
        }
        names = sorted(r.p_name for r in part.select("p_name").distinct().collect())

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        expected = {}
        for a, b in itertools.combinations(names, 2):
            if a.split(" ")[-1] == b.split(" ")[-1]:  # blocking recall bound
                d = lev(a, b)
                if d <= 3:
                    expected[(a, b)] = d
        assert got == expected

    def test_custom_block_column(self, spark):
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.operators.dedup import blocked_fuzzy_pairs

        df = spark.createDataFrame(
            [("smith, john",), ("smith, jon",), ("jones, mary",)], ["name"]
        )
        # block on the surname prefix instead of the default last token
        out = blocked_fuzzy_pairs(
            df, "name", block=F.substring("name", 1, 5), max_distance=2
        ).collect()
        assert [(r.v1, r.v2, r.distance) for r in out] == [
            ("smith, john", "smith, jon", 1)
        ]


class TestBpe:
    """BPE training: distributed word/pair stats + the driver-local merge
    loop (vocab-sized by construction — the standard trainer split)."""

    def test_merge_loop_classic_example(self, spark):
        from etl_complete_with_spark_spark.operators.bpe import (
            END,
            bpe_train,
            segment_word,
        )

        # the BPE-paper corpus: {low:5, lower:2, newest:6, widest:3}
        wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = bpe_train(wf, 4)
        # est</w> dominates: e+s (6+3=9), es+t (9), est+</w> (9) then lo (7)
        assert merges[:4] == [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]
        assert segment_word("lowest", merges) == ["lo", "w", "est</w>"]

    def test_pair_counts_match_driver_loop_round0(self, spark, sf_dir):
        """The distributed pair table equals round-0 counts of the Python
        loop (modulo the </w> marker, which the loop adds and the
        distributed statistic deliberately leaves out)."""
        from etl_complete_with_spark_spark.operators.bpe import (
            END,
            pair_counts,
            word_freqs,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        wf_rows = [(r.word, r.freq) for r in word_freqs(docs).collect()]
        counts: dict = {}
        for word, freq in wf_rows:
            sym = list(word) + [END]
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        expect = {a + b: n for (a, b), n in counts.items() if b != END}
        got = {r.pair: r.n for r in pair_counts(docs).collect()}
        assert got == expect

    def test_train_is_deterministic(self, spark):
        from etl_complete_with_spark_spark.operators.bpe import bpe_train

        wf = [("abab", 3), ("baba", 3)]  # heavy ties -> lexicographic break
        assert bpe_train(wf, 2) == bpe_train(list(reversed(wf)), 2)


class TestPq:
    def test_codes_compact_and_in_range(self, spark, sf_dir):
        from etl_complete_with_spark_spark.operators.similarity import (
            pq_encode,
            train_pq_codebooks,
        )
        from etl_complete_with_spark_spark.queries import load

        emb = load(spark, sf_dir, "embeddings")
        books = train_pq_codebooks(emb, m=4, n_codes=16)
        assert books.shape == (4, 16, 16)
        enc = pq_encode(emb, books)
        assert [f.dataType.simpleString() for f in enc.schema.fields[1:]] == ["tinyint"] * 4
        stats = enc.agg(
            *[F.min(f"code_{j}").alias(f"lo{j}") for j in range(4)],
            *[F.max(f"code_{j}").alias(f"hi{j}") for j in range(4)],
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        assert stats.n == emb.count()
        for j in range(4):
            assert 0 <= stats[f"lo{j}"] and stats[f"hi{j}"] < 16

    def test_adc_recall_floor_vs_brute_force(self, spark, sf_dir):
        from etl_complete_with_spark_spark.operators.similarity import (
            cosine_topk,
            pq_adc_topk,
        )
        from etl_complete_with_spark_spark.queries import load

        emb = load(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        brute = set(
            (r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=10).collect()
        )
        pq = set(
            (r.query_id, r.neighbor_id)
            for r in pq_adc_topk(emb, q, k=10, m=16, n_codes=16).collect()
        )
        # recall 0.54 measured on this near-uniform corpus; floor well above chance
        assert len(pq & brute) / len(brute) >= 0.4

    def test_deterministic_across_runs(self, spark, sf_dir):
        from etl_complete_with_spark_spark.operators.similarity import pq_adc_topk
        from etl_complete_with_spark_spark.queries import load

        emb = load(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 3)
        a = sorted(map(tuple, pq_adc_topk(emb, q, k=5).collect()))
        b = sorted(map(tuple, pq_adc_topk(emb, q, k=5).collect()))
        assert a == b

    def test_dim_not_divisible_raises(self, spark):
        import pytest

        from etl_complete_with_spark_spark.operators.similarity import (
            train_pq_codebooks,
        )

        df = spark.createDataFrame(
            [(i, [float(i)] * 6) for i in range(20)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="not divisible"):
            train_pq_codebooks(df, m=4, n_codes=4)


class TestDuplicateNgramProfile:
    def _profile(self, spark, rows, n=3):
        from etl_complete_with_spark_spark.operators.dedup import (
            duplicate_ngram_profile,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.id: r for r in duplicate_ngram_profile(df, n=n).collect()}

    def test_cross_doc_verbatim_passage_detected(self, spark):
        shared = "alpha beta gamma delta"
        rows = [
            (1, f"{shared} one two three"),
            (2, f"zero {shared} nine eight"),
            (3, "totally different words here now"),
        ]
        p = self._profile(spark, rows, n=3)
        # "alpha beta gamma" and "beta gamma delta" are shared 3-grams
        assert p[1].n_dup_windows == 2 and p[2].n_dup_windows == 2
        assert p[3].n_dup_windows == 0
        assert p[1].n_windows == 5 and p[3].n_windows == 3

    def test_doc_internal_repeat_counts(self, spark):
        p = self._profile(spark, [(1, "x y z x y z")], n=3)
        # windows: xyz yzx zxy xyz -> 'x y z' occurs twice -> 2 dup windows
        assert p[1].n_windows == 4 and p[1].n_dup_windows == 2
        assert p[1].dup_ratio_bp == 5000

    def test_short_and_empty_docs_zero_windows(self, spark):
        p = self._profile(spark, [(1, "a b"), (2, "   "), (3, "")], n=3)
        for i in (1, 2, 3):
            assert p[i].n_windows == 0 and p[i].dup_ratio_bp == 0

    def test_normalization_case_and_whitespace(self, spark):
        p = self._profile(spark, [(1, "Foo  Bar Baz"), (2, "foo bar   baz")], n=3)
        assert p[1].n_dup_windows == 1 and p[2].n_dup_windows == 1
