"""Gopher-style quality rules (operators/text.with_gopher_rules)."""

from __future__ import annotations

from etl_complete_with_spark_spark.operators.text import with_gopher_rules


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return with_gopher_rules(df, **kw).collect()[0]


GOOD = ("the data and that table have rows with keys " * 6).strip()  # 54 tokens


class TestGopherRules:
    def test_clean_doc_keeps(self, spark):
        r = _one(spark, GOOD)
        assert r.r_word_count and r.r_mean_word_len and r.r_alpha_ratio
        assert r.r_symbol_ratio and r.r_stopwords and r.gopher_keep

    def test_short_doc_fails_word_count_only(self, spark):
        r = _one(spark, "the data and that table")
        assert not r.r_word_count and not r.gopher_keep
        assert r.r_mean_word_len and r.r_alpha_ratio and r.r_stopwords

    def test_symbol_ratio(self, spark):
        # 54 good tokens + 6 hash marks -> 6*10 >= 60 tokens fails the <10% rule
        r = _one(spark, GOOD + " # # # # # #")
        assert not r.r_symbol_ratio and not r.gopher_keep

    def test_ellipsis_counts_as_symbol(self, spark):
        r = _one(spark, GOOD + " " + "... " * 7)
        assert not r.r_symbol_ratio

    def test_mean_word_len_bounds(self, spark):
        # 60 single-char tokens -> mean length 1 < 3
        r = _one(spark, "a " * 60, min_words=50)
        assert not r.r_mean_word_len
        # 60 twelve-char tokens -> mean length 12 > 10
        r = _one(spark, "abcdefghijkl " * 60)
        assert not r.r_mean_word_len

    def test_alpha_ratio(self, spark):
        # 40 alpha + 20 numeric tokens -> 40*5=200 < 60*4=240 fails 80%
        r = _one(spark, "the and " + "word " * 38 + "123 " * 20)
        assert not r.r_alpha_ratio

    def test_stopword_rule_needs_distinct(self, spark):
        # 'the' repeated is ONE distinct stopword -> fails
        r = _one(spark, "the " * 60)
        assert not r.r_stopwords

    def test_empty_text(self, spark):
        r = _one(spark, "   ")
        assert not r.r_word_count and not r.gopher_keep
        # vacuous bounds on 0 tokens hold (0 <= 0 <= 0); symbol 0*10 < 0 false
        assert r.r_mean_word_len and r.r_alpha_ratio and not r.r_symbol_ratio
