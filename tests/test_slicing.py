"""Property + unit tests for slicing (SURVEY §2.10 D1-D9). Pure Python."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, strategies as st

from etl_complete_with_spark_spark import slicing as S


class TestIntervalsProperties:
    @given(
        start=st.integers(min_value=-10_000, max_value=10_000),
        span=st.integers(min_value=0, max_value=5_000),
        chunk=st.integers(min_value=1, max_value=700),
    )
    def test_int_intervals_cover_exactly(self, start, span, chunk):
        end = start + span
        ivs = S.int_intervals(start, end, chunk)
        if span == 0:
            assert ivs == []
            return
        assert ivs[0].start == start and ivs[-1].end == end
        for a, b in zip(ivs, ivs[1:]):
            assert a.end == b.start  # contiguous, no overlap, no gap
        assert all(iv.start < iv.end for iv in ivs)
        assert sum(iv.end - iv.start for iv in ivs) == span

    @given(
        start=st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 1, 1)),
        span=st.integers(min_value=0, max_value=2_000),
        chunk=st.integers(min_value=1, max_value=40),
    )
    def test_date_intervals_cover_exactly(self, start, span, chunk):
        end = start + dt.timedelta(days=span)
        ivs = S.date_intervals(start, end, chunk)
        if span == 0:
            assert ivs == []
            return
        assert ivs[0].start == start and ivs[-1].end == end
        for a, b in zip(ivs, ivs[1:]):
            assert a.end == b.start
        assert sum((iv.end - iv.start).days for iv in ivs) == span

    def test_invalid_chunk_rejected(self):
        with pytest.raises(ValueError):
            S.int_intervals(0, 10, 0)
        with pytest.raises(ValueError):
            S.date_intervals(dt.date(2024, 1, 1), dt.date(2024, 2, 1), 0)


class TestChunkHeuristics:
    def test_date_tiers(self):
        assert S.chunk_days_for_rowcount(50_000) == 15
        assert S.chunk_days_for_rowcount(200_000) == 10
        assert S.chunk_days_for_rowcount(700_000) == 5
        assert S.chunk_days_for_rowcount(5_000_000) == 3
        assert S.chunk_days_for_rowcount(50_000_000) == 2

    def test_date_span_overrides(self):
        assert S.chunk_days_for_rowcount(50_000, span_days=1) == 1  # intent, not ref's 2
        assert S.chunk_days_for_rowcount(50_000, span_days=10) == 2
        assert S.chunk_days_for_rowcount(50_000, span_days=45) == 15

    def test_int_tiers_intent(self):
        assert S.chunk_ids_for_rowcount(1_000) == 1_000
        assert S.chunk_ids_for_rowcount(10_000) == 5_000
        assert S.chunk_ids_for_rowcount(30_000) == 25_000
        assert S.chunk_ids_for_rowcount(60_000) == 50_000
        assert S.chunk_ids_for_rowcount(1_000_000) == 100_000

    def test_int_reference_compat_mode(self):
        # dangling-else bug: everything >=5000 collapses to 100000
        assert S.chunk_ids_for_rowcount(10_000, reference_compat=True) == 100_000
        assert S.chunk_ids_for_rowcount(1_000, reference_compat=True) == 1_000


class TestPredicates:
    def test_slice_predicate_halfopen(self):
        iv = S.Interval(dt.date(2024, 1, 1), dt.date(2024, 1, 16))
        assert (
            S.slice_predicate("o_orderdate", iv)
            == "o_orderdate >= '2024-01-01 00:00:00' AND o_orderdate < '2024-01-16 00:00:00'"
        )

    def test_query_definition_shape(self):
        q = S.query_definition("orders", "id", S.Interval(0, 100))
        assert q == "(select * from orders where id >= 0 AND id < 100) subs"

    def test_string_literal_escaped(self):
        assert "''" in S._sql_literal("O'Brien")

    def test_jdbc_predicates_one_per_slice(self):
        preds = S.jdbc_predicates("id", S.int_intervals(0, 10, 3))
        assert preds == [
            "id >= 0 AND id < 3",
            "id >= 3 AND id < 6",
            "id >= 6 AND id < 9",
            "id >= 9 AND id < 10",
        ]


class TestBounds:
    def test_cli_args_win_no_probe_called(self):
        def boom():
            raise AssertionError("probe must not run when arg given")

        start, end = S.resolve_bounds(5, 10, boom, boom, "int")
        assert (start, end) == (5, 10)

    def test_int_probe_with_headroom(self):
        start, end = S.resolve_bounds(None, None, lambda: 1, lambda: 100, "int")
        assert (start, end) == (1, 100 + S.MAX_BOUND_HEADROOM)

    def test_date_end_defaults_to_today(self):
        today = dt.date(2026, 8, 13)
        start, end = S.resolve_bounds(
            dt.date(2026, 1, 1), None, lambda: None, lambda: None, "date", today=today
        )
        assert end == today

    def test_string_probe_coerced_to_int(self):
        start, end = S.resolve_bounds(None, None, lambda: "7", lambda: "9", "int")
        assert start == 7 and end == 9 + S.MAX_BOUND_HEADROOM


class TestUrlMunging:
    def test_driver_from_url(self):
        assert S.driver_from_url("jdbc:mysql://host:3306/db") == "mysql"
        assert S.driver_from_url("jdbc:postgresql://h/db") == "postgresql"
        assert S.driver_from_url("mongodb+srv://u:p@cluster/db") == "mongodb"

    def test_ssl_only_for_mysql(self):
        assert S.disable_ssl_for_mysql("jdbc:mysql://h/db").endswith("?useSSL=false")
        assert (
            S.disable_ssl_for_mysql("jdbc:mysql://h/db?x=1")
            == "jdbc:mysql://h/db?x=1&useSSL=false"
        )
        assert S.disable_ssl_for_mysql("jdbc:postgresql://h/db") == "jdbc:postgresql://h/db"
        once = S.disable_ssl_for_mysql("jdbc:mysql://h/db")
        assert S.disable_ssl_for_mysql(once) == once  # idempotent

    def test_database_from_url(self):
        assert S.database_from_url("mongodb://h/?database=shop", "ns") == "shop"
        assert S.database_from_url("mongodb://h/", "ns") == "ns"


class TestCatalogCli:
    def test_list_names_every_query(self, capsys):
        from etl_complete_with_spark_spark.cli.catalog import main
        from etl_complete_with_spark_spark.queries import ORACLE, QUERIES

        assert main(["list"]) == 0
        out = capsys.readouterr().out
        for name in QUERIES:
            assert name in out
        assert out.count("exact-oracle") == len(ORACLE)

    def test_unknown_query_rejected(self, capsys):
        from etl_complete_with_spark_spark.cli.catalog import main

        assert main(["explain", "nope_not_a_query"]) == 2
