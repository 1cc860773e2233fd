"""Unit tests: train/eval decontamination and token-budget mixture
sampling (operators/contamination.py, operators/mixture.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.contamination import ngram_contamination
from etl_complete_with_spark_spark.operators.mixture import token_budget_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestContamination:
    def test_flags_shared_ngram_with_exact_counts(self, spark):
        # train doc 1 shares exactly one 4-gram ("a b c d") with eval;
        # train doc 2 shares nothing.
        train = _docs(
            spark,
            [
                (1, "x a b c d y"),       # grams: "x a b c", "a b c d", "b c d y"
                (2, "p q r s t"),
            ],
        )
        ev = _docs(spark, [(100, "zz a b c d zz")])
        out = {r["doc_id"]: r for r in ngram_contamination(train, ev, n=4).collect()}
        assert set(out) == {1}
        assert out[1]["n_grams"] == 3
        assert out[1]["n_shared"] == 1
        assert abs(out[1]["contamination"] - round(1 / 3, 4)) < 1e-9

    def test_short_docs_produce_no_grams(self, spark):
        train = _docs(spark, [(1, "a b c")])  # < 4 tokens: no 4-grams
        ev = _docs(spark, [(100, "a b c d")])
        assert ngram_contamination(train, ev, n=4).count() == 0

    def test_normalization_case_and_whitespace(self, spark):
        # shingles() normalizes: lowercase + whitespace collapse, so the
        # same gram in different casing/spacing still matches.
        train = _docs(spark, [(1, "The  Quick\tBrown Fox jumps")])
        ev = _docs(spark, [(100, "the quick brown fox sleeps")])
        out = ngram_contamination(train, ev, n=4).collect()
        assert len(out) == 1 and out[0]["n_shared"] == 1


class TestTokenBudgetSample:
    def test_prefix_semantics_match_manual_computation(self, spark):
        rows = [(i, "s0", "w " * (i + 1)) for i in range(6)]  # 1..6 tokens
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        budget = 8
        kept = token_budget_sample(df, budget=budget)
        got = {r["doc_id"]: r["cum_tokens"] for r in kept.collect()}

        order = sorted(
            range(6), key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )
        cum, expect = 0, {}
        for i in order:
            cum += i + 1
            if cum <= budget:
                expect[i] = cum
            else:
                break  # prefix: everything after the first overflow drops
        assert got == expect

    def test_domains_sampled_independently(self, spark):
        rows = [(i, f"s{i % 2}", "a b c") for i in range(10)]  # 3 tokens each
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        kept = token_budget_sample(df, budget=6)
        per_domain = (
            kept.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
        )
        assert {r["source"] for r in per_domain} == {"s0", "s1"}
        assert all(r["t"] <= 6 for r in per_domain)

    def test_deterministic_across_repartition(self, spark):
        rows = [(i, f"s{i % 3}", "tok " * (1 + i % 5)) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        a = sorted(r["doc_id"] for r in token_budget_sample(df, 20).collect())
        b = sorted(
            r["doc_id"]
            for r in token_budget_sample(df.repartition(13), 20).collect()
        )
        assert a == b


class TestWeightedSample:
    def test_keys_match_manual_aes_computation(self, spark):
        rows = [(i, "s0", 0.1 + 0.2 * (i % 5)) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, source string, w double")
        from etl_complete_with_spark_spark.operators.mixture import weighted_sample_topn

        got = {
            r["doc_id"]: (r["aes_key"], r["rank"])
            for r in weighted_sample_topn(df, n=4, weight_col="w").collect()
        }

        def key(i, w):
            h = int(hashlib.md5(f"{i}#11".encode()).hexdigest()[:15], 16)
            return round(((h + 1) / 2**60) ** (1.0 / max(w, 1e-4)), 6)

        manual = sorted(
            ((key(i, w), -i) for i, _, w in rows), reverse=True
        )[:4]
        expect_ids = {-neg for _, neg in manual}
        assert set(got) == expect_ids
        for i, _, w in rows:
            if i in got:
                assert abs(got[i][0] - key(i, w)) < 1e-9

    def test_zero_weight_rows_sampled_last(self, spark):
        rows = [(1, "s0", 0.0), (2, "s0", 0.9), (3, "s0", 0.9)]
        df = spark.createDataFrame(rows, "doc_id long, source string, w double")
        from etl_complete_with_spark_spark.operators.mixture import weighted_sample_topn

        top2 = {r["doc_id"] for r in weighted_sample_topn(df, 2, "w").collect()}
        assert top2 == {2, 3}  # u^(1/1e-4) ~ 0 for any u < 1

    def test_partitioning_invariant(self, spark):
        rows = [(i, f"s{i % 3}", 0.2 + (i % 7) / 10.0) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, source string, w double")
        from etl_complete_with_spark_spark.operators.mixture import weighted_sample_topn

        a = sorted(r["doc_id"] for r in weighted_sample_topn(df, 3, "w").collect())
        b = sorted(
            r["doc_id"] for r in weighted_sample_topn(df.repartition(17), 3, "w").collect()
        )
        assert a == b
