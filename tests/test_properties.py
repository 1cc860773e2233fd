"""Hypothesis property tests over the core operators.

Spark-backed property tests are expensive per example, so each property
uses a small, focused example budget — the point is hitting structural
edge cases (empty docs, chunk==text length, single-row merges), not
volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.operators.chunking import chunk_documents
from etl_complete_with_spark_spark.operators.merge import merge_upsert

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(alphabet="abcdefg", min_size=1, max_size=5)


class TestChunkingProperties:
    @SETTINGS
    @given(
        n_tokens=st.integers(min_value=0, max_value=120),
        chunk=st.integers(min_value=2, max_value=40),
        overlap_frac=st.floats(min_value=0.0, max_value=0.9),
    )
    def test_reconstruction_and_bounds(self, spark, n_tokens, chunk, overlap_frac):
        overlap = min(int(chunk * overlap_frac), chunk - 1)
        stride = chunk - overlap
        text = " ".join(f"t{i}" for i in range(n_tokens))
        df = spark.createDataFrame([Row(doc_id=0, text=text)])
        out = sorted(
            chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert out, "every doc yields at least one chunk"
        # chunk sizes: all <= chunk; all but the edges exactly chunk when long enough
        assert all(r.n_tokens <= chunk for r in out)
        # reconstruction: drop the overlap from every chunk after the first
        toks = out[0].chunk_text.split()
        for r in out[1:]:
            toks.extend(r.chunk_text.split()[overlap:])
        assert toks == text.split()
        # no redundant trailing window: second-to-last chunk must not
        # already reach the end
        if len(out) > 1:
            assert (len(out) - 2) * stride + chunk < max(n_tokens, 1)


class TestMergeProperties:
    @SETTINGS
    @given(
        target_keys=st.lists(st.sampled_from("abcdef"), min_size=1, max_size=6, unique=True),
        source_keys=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6, unique=True),
    )
    def test_upsert_key_algebra(self, spark, target_keys, source_keys):
        ts0, ts1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
        target = spark.createDataFrame(
            [Row(sk=k, v=0, timestamp_kafka=ts0) for k in target_keys]
        )
        source = spark.createDataFrame(
            [Row(sk=k, v=1, timestamp_kafka=ts1) for k in source_keys]
        )
        out = {r.sk: r.v for r in merge_upsert(target, source).collect()}
        # keys = union; source wins on intersection; untouched targets keep v=0
        assert set(out) == set(target_keys) | set(source_keys)
        assert all(out[k] == 1 for k in source_keys)
        assert all(out[k] == 0 for k in set(target_keys) - set(source_keys))


class TestConnectedComponentsProperties:
    @SETTINGS
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 15), st.integers(0, 15)),
            min_size=0,
            max_size=20,
        )
    )
    def test_matches_union_find(self, spark, edges):
        from etl_complete_with_spark_spark.operators.graph import connected_components

        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        # driver-side union-find oracle
        parent = {v: v for e in edges for v in e}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        expected = {}
        for v in parent:
            root = find(v)
            expected.setdefault(root, set()).add(v)
        want = {v: min(c) for c in expected.values() for v in c}

        df = spark.createDataFrame(edges, "id1 long, id2 long")
        got = {r.id: r.component for r in connected_components(df).collect()}
        assert got == want


class TestIntervalJoinProperties:
    @SETTINGS
    @given(
        pts=st.lists(st.integers(0, 500), min_size=1, max_size=15),
        wins=st.lists(
            st.tuples(st.integers(0, 500), st.integers(0, 120)),
            min_size=1,
            max_size=6,
        ),
        bin_width=st.integers(1, 200),
    )
    def test_matches_naive_semantics(self, spark, pts, wins, bin_width):
        import datetime as dt

        from etl_complete_with_spark_spark.operators.range_join import interval_join

        base = dt.datetime(2024, 1, 1)
        left = spark.createDataFrame(
            [(i, base + dt.timedelta(seconds=p)) for i, p in enumerate(pts)],
            "pid long, ts timestamp",
        )
        windows = spark.createDataFrame(
            [
                (j, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
                for j, (s, d) in enumerate(wins)
            ],
            "wid long, ws timestamp, we timestamp",
        )
        got = sorted(
            (r.pid, r.wid)
            for r in interval_join(
                left, windows, "ts", "ws", "we", bin_width_seconds=bin_width
            ).collect()
        )
        want = sorted(
            (i, j)
            for i, p in enumerate(pts)
            for j, (s, d) in enumerate(wins)
            if s <= p < s + d
        )
        assert got == want


class TestScd2Properties:
    @SETTINGS
    @given(
        batches=st.lists(
            st.dictionaries(
                st.integers(0, 3),  # keys
                st.sampled_from("pqrs"),  # tracked value
                min_size=1,
                max_size=4,
            ),
            min_size=1,
            max_size=3,
        )
    )
    def test_versioning_invariants(self, spark, batches):
        import datetime as dt

        from etl_complete_with_spark_spark.operators.scd2 import (
            OPEN_END,
            scd2_apply,
            scd2_init,
        )

        t = [f"2024-0{i + 1}-01 00:00:00" for i in range(len(batches))]
        mk = lambda b: spark.createDataFrame(  # noqa: E731
            [(k, v) for k, v in sorted(b.items())], "id long, city string"
        )
        dim = scd2_init(mk(batches[0]), t[0])
        state = dict(batches[0])  # expected latest value per key
        for i, b in enumerate(batches[1:], start=1):
            dim = scd2_apply(dim, mk(b), "id", ["city"], t[i])
            state.update(b)

        rows = dim.collect()
        current = [r for r in rows if r.is_current]
        # exactly one current row per live key, holding the latest value
        assert sorted((r.id, r.city) for r in current) == sorted(state.items())
        # per-key validity chains: contiguous, ending open
        open_end = dt.datetime.fromisoformat(OPEN_END)
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r.id, []).append(r)
        for vs in by_key.values():
            vs.sort(key=lambda r: r.valid_from)
            for a, b2 in zip(vs, vs[1:]):
                assert a.valid_to == b2.valid_from, "gap or overlap in history"
            assert vs[-1].valid_to == open_end and vs[-1].is_current
            assert all(not v.is_current for v in vs[:-1])


class TestTableDiffProperties:
    @SETTINGS
    @given(
        old=st.dictionaries(st.integers(0, 7), st.sampled_from("xyz"), max_size=6),
        new=st.dictionaries(st.integers(0, 7), st.sampled_from("xyz"), max_size=6),
    )
    def test_partition_of_keyspace(self, spark, old, new):
        from etl_complete_with_spark_spark.operators.diff import table_diff

        if not old and not new:
            return
        mk = lambda d: spark.createDataFrame(  # noqa: E731
            [(k, v) for k, v in sorted(d.items())], "id long, v string"
        )
        got = {
            r.id: r.change_type
            for r in table_diff(mk(old), mk(new), "id", include_unchanged=True).collect()
        }
        want = {}
        for k in set(old) | set(new):
            if k not in old:
                want[k] = "added"
            elif k not in new:
                want[k] = "removed"
            elif old[k] != new[k]:
                want[k] = "changed"
            else:
                want[k] = "unchanged"
        assert got == want


class TestMongoSliceProperties:
    """Mongo-source predicate semantics vs slicing.Interval algebra (the
    live connector is environmental — jar absent from this image — so the
    predicate/envelope layer carries the proof burden; see COVERAGE.md)."""

    @SETTINGS
    @given(
        lo=st.integers(min_value=-50, max_value=50),
        span=st.integers(min_value=1, max_value=40),
        chunk=st.integers(min_value=1, max_value=15),
    )
    def test_int_halfopen_partitions_inclusive_double_counts_cuts(
        self, spark, lo, span, chunk
    ):
        from etl_complete_with_spark_spark.slicing import int_intervals
        from etl_complete_with_spark_spark.sources.mongodb import MongoSource

        hi = lo + span
        ivs = int_intervals(lo, hi, chunk)
        df = spark.createDataFrame([Row(pc=i) for i in range(lo - 2, hi + 3)])
        half = MongoSource("mongodb://h", "db", "c", "pc")
        incl = MongoSource("mongodb://h", "db", "c", "pc", inclusive=True)

        # half-open slices PARTITION [lo, hi): every value exactly once
        n_half = sum(df.filter(half.slice_condition(iv)).count() for iv in ivs)
        assert n_half == span

        # inclusive (reference P2 BETWEEN) double-counts exactly the
        # interior cut points plus the final end bound
        n_incl = sum(df.filter(incl.slice_condition(iv)).count() for iv in ivs)
        assert n_incl == span + len(ivs)

    @SETTINGS
    @given(
        day0=st.integers(min_value=0, max_value=60),
        span=st.integers(min_value=1, max_value=30),
        chunk=st.integers(min_value=1, max_value=10),
    )
    def test_date_halfopen_partitions_inclusive_double_counts_cuts(
        self, spark, day0, span, chunk
    ):
        from etl_complete_with_spark_spark.slicing import date_intervals
        from etl_complete_with_spark_spark.sources.mongodb import MongoSource

        base = dt.date(2024, 1, 1)
        start, end = base + dt.timedelta(days=day0), base + dt.timedelta(days=day0 + span)
        ivs = date_intervals(start, end, chunk)
        df = spark.createDataFrame(
            [Row(pc=base + dt.timedelta(days=d)) for d in range(day0 - 2, day0 + span + 3)]
        )
        half = MongoSource("mongodb://h", "db", "c", "pc")
        incl = MongoSource("mongodb://h", "db", "c", "pc", inclusive=True)
        n_half = sum(df.filter(half.slice_condition(iv)).count() for iv in ivs)
        assert n_half == span
        n_incl = sum(df.filter(incl.slice_condition(iv)).count() for iv in ivs)
        assert n_incl == span + len(ivs)

    @SETTINGS
    @given(
        bounds=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=80),
                st.integers(min_value=1, max_value=20),
            ),
            min_size=1,
            max_size=6,
        )
    )
    def test_read_range_envelope_is_min_max(self, spark, bounds):
        """read_range collapses its intervals to ONE [min(start), max(end))
        envelope filter (mongodb.py: a single server-side range predicate,
        not one query per slice) — prove the envelope equals the union
        only when slices are contiguous, and always equals min/max."""
        from etl_complete_with_spark_spark.slicing import Interval
        from etl_complete_with_spark_spark.sources.mongodb import MongoSource

        ivs = [Interval(lo, lo + w) for lo, w in bounds]
        lo = min(iv.start for iv in ivs)
        hi = max(iv.end for iv in ivs)
        df = spark.createDataFrame([Row(pc=i) for i in range(-1, 105)])
        src = MongoSource("mongodb://h", "db", "c", "pc")
        env = df.filter(src.slice_condition(Interval(lo, hi)))
        assert env.count() == hi - lo
        # the envelope is the union of the slices iff they tile it
        union_ids = set()
        for iv in ivs:
            union_ids |= {r.pc for r in df.filter(src.slice_condition(iv)).collect()}
        env_ids = {r.pc for r in env.collect()}
        assert union_ids <= env_ids
        if union_ids == env_ids:
            assert len(env_ids) == hi - lo


class TestStarComponentsProperties:
    """Large-star/small-star CC (the O(log n)-round 100 TB path) must be
    row-identical to min-label propagation and to a union-find oracle."""

    @SETTINGS
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 15), st.integers(0, 15)),
            min_size=0,
            max_size=20,
        )
    )
    def test_matches_union_find(self, spark, edges):
        from etl_complete_with_spark_spark.operators.graph import (
            connected_components_star,
        )

        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        parent = {v: v for e in edges for v in e}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        comps: dict = {}
        for v in parent:
            comps.setdefault(find(v), set()).add(v)
        want = {v: min(c) for c in comps.values() for v in c}

        df = spark.createDataFrame(edges, "id1 long, id2 long")
        got = {r.id: r.component for r in connected_components_star(df).collect()}
        assert got == want

    def test_path_graph_high_diameter(self, spark):
        """A 40-hop chain: the star variant needs ~log rounds, and both
        variants land the identical labeling."""
        from etl_complete_with_spark_spark.operators.graph import (
            connected_components,
            connected_components_star,
        )

        edges = [(i, i + 1) for i in range(40)] + [(100, 101), (102, 101)]
        df = spark.createDataFrame(edges, "id1 long, id2 long")
        star = {(r.id, r.component) for r in connected_components_star(df).collect()}
        label = {(r.id, r.component) for r in connected_components(df, max_iterations=50).collect()}
        assert star == label
        assert all(c == 0 for v, c in star if v <= 40)
        assert all(c == 100 for v, c in star if v >= 100)

    def test_isolated_vertices_are_singletons(self, spark):
        from pyspark.sql import Row

        from etl_complete_with_spark_spark.operators.graph import (
            connected_components_star,
        )

        edges = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
        verts = spark.createDataFrame([Row(id=i) for i in (1, 2, 7, 9)])
        got = {r.id: r.component for r in connected_components_star(edges, verts).collect()}
        assert got == {1: 1, 2: 1, 7: 7, 9: 9}


class TestAutoComponents:
    """The adaptive entry point must produce the identical labeling on
    every strategy it can pick."""

    @SETTINGS
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 12)),
            min_size=1,
            max_size=15,
        )
    )
    def test_driver_shortcut_matches_distributed(self, spark, edges):
        from etl_complete_with_spark_spark.operators.graph import (
            connected_components,
            connected_components_auto,
        )

        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        df = spark.createDataFrame(edges, "id1 long, id2 long")
        fast = {(r.id, r.component) for r in connected_components_auto(df).collect()}
        dist = {(r.id, r.component) for r in connected_components(df).collect()}
        assert fast == dist

    def test_threshold_routes_to_distributed(self, spark):
        from etl_complete_with_spark_spark.operators.graph import (
            connected_components_auto,
        )

        df = spark.createDataFrame([(1, 2), (2, 3)], "id1 long, id2 long")
        out = {
            (r.id, r.component)
            for r in connected_components_auto(df, driver_threshold_edges=0).collect()
        }
        assert out == {(1, 1), (2, 1), (3, 1)}


class TestAutoComponentsContract:
    """Review findings round 3: the shortcut must keep the distributed
    variants' id-type contract and never collect the vertex universe."""

    def test_string_ids_supported(self, spark):
        from etl_complete_with_spark_spark.operators.graph import (
            connected_components,
            connected_components_auto,
        )

        df = spark.createDataFrame(
            [("docB", "docA"), ("docB", "docC"), ("docX", "docY")],
            "id1 string, id2 string",
        )
        fast = {(r.id, r.component) for r in connected_components_auto(df).collect()}
        dist = {(r.id, r.component) for r in connected_components(df).collect()}
        assert fast == dist
        assert ("docC", "docA") in fast

    def test_vertices_fill_in_matches_distributed(self, spark):
        from pyspark.sql import Row

        from etl_complete_with_spark_spark.operators.graph import (
            connected_components,
            connected_components_auto,
        )

        edges = spark.createDataFrame([(5, 3)], "id1 long, id2 long")
        verts = spark.createDataFrame([Row(id=i) for i in range(8)])
        fast = {
            (r.id, r.component)
            for r in connected_components_auto(edges, verts).collect()
        }
        dist = {
            (r.id, r.component) for r in connected_components(edges, verts).collect()
        }
        assert fast == dist
        assert (5, 3) in fast and (0, 0) in fast

    def test_null_endpoints_dropped(self, spark):
        from etl_complete_with_spark_spark.operators.graph import (
            connected_components_auto,
        )

        df = spark.createDataFrame(
            [(1, 2), (None, 3), (4, None)], "id1 long, id2 long"
        )
        got = {(r.id, r.component) for r in connected_components_auto(df).collect()}
        assert got == {(1, 1), (2, 1)}


class TestDerivedPartsuppContract:
    """The Q2/Q11/Q21 derived-partsupp arithmetic (queries_tpch.py:680-731)
    is only as strong as "Spark arithmetic == DuckDB arithmetic": these
    properties pin the derivation as total (outputs always land in the
    documented ranges), deterministic, and ENGINE-INDEPENDENT — the same
    integers fall out of Python, Spark SQL and DuckDB over random keys far
    beyond the testdata's range, so an engine upgrade cannot silently fork
    the oracle twins.

    Domain contract (documented here on purpose): keys are NON-NEGATIVE
    (TPC-H keys always are). `%` on negative operands is where Python
    (floor-mod) and SQL engines (truncation-mod) genuinely diverge — the
    derivation must never be fed negative keys.
    """

    @SETTINGS
    @given(
        pkeys=st.lists(
            st.integers(0, 2**31 - 1), min_size=1, max_size=30, unique=True
        ),
        s=st.integers(4, 10_000),
    )
    def test_supplier_cost_qty_three_engine_agreement(self, spark, pkeys, s):
        import duckdb
        from pyspark.sql import functions as F

        rows = [(p, i) for p in pkeys for i in range(4)]
        py = {
            (p, i): (
                (p + p // s + i * (s // 4)) % s,
                (p * 7 + i * 13) % 1000 + 1,
                (p * 11 + i * 17) % 9999 + 1,
            )
            for p, i in rows
        }
        # totality: every key maps into the documented ranges
        for sk, cx, aq in py.values():
            assert 0 <= sk < s and 1 <= cx <= 1000 and 1 <= aq <= 9999

        df = spark.createDataFrame(rows, "p long, i long").withColumn(
            "s", F.lit(s).cast("long")
        )
        exprs = [
            "p",
            "i",
            (
                (F.col("p") + F.expr("p div s") + F.col("i") * F.expr("s div 4"))
                % F.col("s")
            ).alias("sk"),
            ((F.col("p") * 7 + F.col("i") * 13) % 1000 + 1).alias("cx"),
            ((F.col("p") * 11 + F.col("i") * 17) % 9999 + 1).alias("aq"),
        ]
        got = {(r.p, r.i): (r.sk, r.cx, r.aq) for r in df.select(*exprs).collect()}
        assert got == py
        # determinism: re-evaluating the same plan yields the same integers
        again = {(r.p, r.i): (r.sk, r.cx, r.aq) for r in df.select(*exprs).collect()}
        assert again == got

        duck = {
            (p, i): (sk, cx, aq)
            for p, i, sk, cx, aq in duckdb.sql(
                f"""
                SELECT p, i.i,
                       (p + p // {s} + i.i * ({s} // 4)) % {s},
                       (p * 7 + i.i * 13) % 1000 + 1,
                       (p * 11 + i.i * 17) % 9999 + 1
                FROM (SELECT CAST(unnest({pkeys!r}) AS BIGINT) AS p),
                     (VALUES (0),(1),(2),(3)) i(i)
                """
            ).fetchall()
        }
        assert duck == py

    @SETTINGS
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 2**31 - 1), st.integers(1, 7)),
            min_size=1,
            max_size=50,
            unique=True,
        )
    )
    def test_lateness_predicate_three_engine_agreement(self, spark, pairs):
        import duckdb
        from pyspark.sql import functions as F

        py = {
            (o, l): ((o * 31 + l * 7) % 30) > ((o * 17 + l * 11) % 30)
            for o, l in pairs
        }
        df = spark.createDataFrame(list(pairs), "o long, l long")
        got = {
            (r.o, r.l): r.late
            for r in df.select(
                "o",
                "l",
                (
                    ((F.col("o") * 31 + F.col("l") * 7) % 30)
                    > ((F.col("o") * 17 + F.col("l") * 11) % 30)
                ).alias("late"),
            ).collect()
        }
        assert got == py
        duck = {
            (o, l): late
            for o, l, late in duckdb.sql(
                f"""
                SELECT o, l,
                       (o * 31 + l * 7) % 30 > (o * 17 + l * 11) % 30
                FROM (SELECT CAST(p[1] AS BIGINT) AS o, CAST(p[2] AS BIGINT) AS l
                      FROM (SELECT unnest({[list(p) for p in pairs]!r}) AS p) t0) t
                """
            ).fetchall()
        }
        assert duck == py


class TestPagerankFixedPoint:
    def _ranks(self, spark, edges, **kw):
        from etl_complete_with_spark_spark.operators.graph import pagerank_fixed_point

        df = spark.createDataFrame(edges, "src long, dst long")
        return {r.node: r.rank for r in pagerank_fixed_point(df, **kw).collect()}

    def test_symmetric_graph_equal_ranks(self, spark):
        # 3-cycle, undirected: perfect symmetry -> identical ranks
        e = [(a, b) for a, b in [(1, 2), (2, 3), (3, 1)]]
        e += [(b, a) for a, b in list(e)]
        r = self._ranks(spark, e)
        assert len(set(r.values())) == 1

    def test_hub_dominates_star(self, spark):
        # undirected star 0-{1..5}: hub collects 5 spokes' mass
        e = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
        r = self._ranks(spark, e)
        assert r[0] > max(r[i] for i in range(1, 6)) * 2

    def test_mass_conserved_up_to_floor_loss(self, spark):
        e = [(0, 1), (1, 2), (2, 0), (1, 0), (2, 1), (0, 2)]
        r = self._ranks(spark, e, iters=3)
        total, scale = sum(r.values()), 10**9
        # integer floors only ever LOSE mass, bounded by iters * edges
        assert total <= 3 * scale
        assert total >= 3 * scale - 3 * len(e) * 10

    def test_partitioning_invariant_bit_exact(self, spark):
        import random

        rng = random.Random(3)
        base = {(rng.randrange(30), rng.randrange(30)) for _ in range(80)}
        e = [(a, b) for a, b in base if a != b]
        e += [(b, a) for a, b in list(e)]
        df1 = spark.createDataFrame(e, "src long, dst long").repartition(1)
        df13 = spark.createDataFrame(list(reversed(e)), "src long, dst long").repartition(13)
        from etl_complete_with_spark_spark.operators.graph import pagerank_fixed_point

        r1 = {r.node: r.rank for r in pagerank_fixed_point(df1).collect()}
        r13 = {r.node: r.rank for r in pagerank_fixed_point(df13).collect()}
        assert r1 == r13  # integer arithmetic: no shuffle-order drift


class TestBottomKMergeProperties:
    """The mergeable-summary contract of operators/quantiles: for ANY
    partition of the stream into groups, per-group bottom-k sketches
    re-cut to k after union equal the global bottom-k exactly."""

    @SETTINGS
    @given(
        n=st.integers(min_value=0, max_value=120),
        n_groups=st.integers(min_value=1, max_value=6),
        k=st.integers(min_value=1, max_value=20),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def test_merge_equals_global_bottomk(self, spark, n, n_groups, k, seed):
        import random

        from etl_complete_with_spark_spark.operators.quantiles import (
            bottomk_precut,
            merge_bottomk_hash,
            with_rank_hash,
        )

        rng = random.Random(seed)
        rows = [
            (i, f"g{rng.randrange(n_groups)}", float(rng.randrange(1000)))
            for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, grp string, value double"
        )
        per_group = bottomk_precut(df, ["grp"], "value", k=k, id_col="event_id")
        merged = merge_bottomk_hash(per_group.drop("grp"), [], k=k)
        direct = (
            with_rank_hash(df, "event_id")
            .groupBy("rank_hash")
            .agg(F.min("value").alias("value"))
            .orderBy("rank_hash")
            .limit(k)
        )
        got = sorted((r.rank_hash, r.value) for r in merged.collect())
        want = sorted((r.rank_hash, r.value) for r in direct.collect())
        assert got == want
        assert len(got) == min(k, n)


class TestTriangleCountProperties:
    @SETTINGS
    @given(
        n_nodes=st.integers(min_value=1, max_value=14),
        density=st.floats(min_value=0.0, max_value=1.0),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def test_matches_bruteforce(self, spark, n_nodes, density, seed):
        import itertools
        import random

        from etl_complete_with_spark_spark.operators.graph import triangle_count

        rng = random.Random(seed)
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(n_nodes), 2)
            if rng.random() < density
        ]
        if not edges:
            return  # triangle_count requires a non-empty frame to infer nothing; trivially consistent
        adj = set(edges)
        want = sum(
            1
            for x, y, z in itertools.combinations(range(n_nodes), 3)
            if (x, y) in adj and (y, z) in adj and (x, z) in adj
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        row = triangle_count(df).collect()[0]
        assert row.n_triangles == want
        assert row.n_edges == len(edges)


class TestContainmentProperties:
    @SETTINGS
    @given(
        docs=st.lists(
            st.lists(words, min_size=0, max_size=12).map(" ".join),
            min_size=2,
            max_size=5,
        )
    )
    def test_containment_dominates_jaccard(self, spark, docs):
        """max-containment |A∩B|/min(|A|,|B|) >= Jaccard |A∩B|/|A∪B| for
        every pair, and both live in [0, 1]."""
        from etl_complete_with_spark_spark.operators.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        cont = {
            (r.id1, r.id2): r.containment
            for r in containment_pairs(
                df, threshold=0.0, max_shingle_freq=None
            ).collect()
        }
        jac = {
            (r.id1, r.id2): r.jaccard
            for r in ngram_jaccard_pairs(
                df, threshold=0.0, max_shingle_freq=None
            ).collect()
        }
        assert set(jac) == set(cont)  # same candidate pairs at threshold 0
        for pair, j in jac.items():
            c = cont[pair]
            assert 0.0 <= j <= c <= 1.0


class TestAdditiveMergeProperties:
    @SETTINGS
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # key
                st.integers(min_value=-1000, max_value=1000),  # value
            ),
            min_size=0,
            max_size=40,
        ),
        cut=st.integers(min_value=0, max_value=40),
    )
    def test_any_split_merges_to_full_aggregate(self, spark, rows, cut):
        """merge_additive(partial(A), partial(B)) == partial(A ∪ B) for
        any split point — the commutative-monoid contract."""
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.operators.merge import merge_additive

        def df(data):
            return spark.createDataFrame(
                [(k, v) for k, v in data], "k int, v long"
            )

        def partial(d):
            return d.groupBy("k").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("v").alias("s"),
            )

        cut = min(cut, len(rows))
        merged = merge_additive(
            partial(df(rows[:cut])), partial(df(rows[cut:])), ["k"], ["n", "s"]
        )
        got = sorted(map(tuple, merged.collect()))
        want = sorted(map(tuple, partial(df(rows)).collect()))
        assert got == want


class TestGraphIterationProperties:
    @SETTINGS
    @given(
        n_nodes=st.integers(min_value=2, max_value=16),
        density=st.floats(min_value=0.1, max_value=0.8),
        k=st.integers(min_value=2, max_value=4),
        seed=st.integers(min_value=0, max_value=9999),
    )
    def test_kcore_converged_matches_python_peel(self, spark, n_nodes, density, k, seed):
        import itertools
        import random

        from etl_complete_with_spark_spark.operators.graph import kcore_peel

        rng = random.Random(seed)
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(n_nodes), 2)
            if rng.random() < density
        ]
        if not edges:
            return
        # python reference: iterate peeling to the fixed point
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        while True:
            weak = [v for v, ns in adj.items() if len(ns) < k]
            if not weak:
                break
            for v in weak:
                for u in adj.pop(v):
                    adj.get(u, set()).discard(v)
        want = {v: len(ns) for v, ns in adj.items()}
        df = spark.createDataFrame(edges, "src long, dst long")
        # n_nodes rounds always reach the fixed point
        got = {
            r.node: r.deg for r in kcore_peel(df, k=k, rounds=n_nodes).collect()
        }
        assert got == want

    @SETTINGS
    @given(
        n_nodes=st.integers(min_value=2, max_value=16),
        density=st.floats(min_value=0.05, max_value=0.6),
        rounds=st.integers(min_value=1, max_value=5),
        seed=st.integers(min_value=0, max_value=9999),
    )
    def test_bfs_matches_python_levels(self, spark, n_nodes, density, rounds, seed):
        import itertools
        import random
        from collections import deque

        from etl_complete_with_spark_spark.operators.graph import bfs_levels

        rng = random.Random(seed)
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(n_nodes), 2)
            if rng.random() < density
        ]
        if not edges:
            return
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        src = min(adj)
        want = {src: 0}
        q = deque([src])
        while q:
            v = q.popleft()
            for u in adj[v]:
                if u not in want:
                    want[u] = want[v] + 1
                    q.append(u)
        want = {v: d for v, d in want.items() if d <= rounds}
        df = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame([(src,)], "node long")
        got = {r.node: r.dist for r in bfs_levels(df, s, rounds).collect()}
        assert got == want


class TestAssociationRulesProperties:
    """The round-8 rewrite of association_rules_parts generates each
    UNORDERED pair once (sorted basket -> per-position tail slice) and
    recovers both rule directions AFTER the frequency joins via a
    2-element struct explode. This property checks the whole pair/
    support/confidence/lift integer math against a brute-force Python
    reference on random small baskets — structural edge cases the
    TPC-H-shaped oracle data never hits (single-item baskets, a basket
    equal to the whole item universe, duplicate lines collapsing)."""

    @SETTINGS
    @given(
        baskets=st.lists(
            st.lists(st.integers(min_value=1, max_value=8), min_size=1, max_size=6),
            min_size=1,
            max_size=12,
        ),
        seed=st.integers(min_value=0, max_value=3),
    )
    def test_matches_bruteforce(self, spark, baskets, seed):
        from collections import Counter
        from itertools import combinations

        from etl_complete_with_spark_spark.queries import QUERIES

        rows = [
            Row(l_orderkey=oid, l_partkey=item)
            for oid, items in enumerate(baskets)
            for item in items
        ]
        # brute force on the DEDUPED baskets
        sets = [sorted(set(b)) for b in baskets]
        n_orders = len(sets)
        freq = Counter(i for b in sets for i in b)
        pair = Counter()
        for b in sets:
            for x, y in combinations(b, 2):
                pair[(x, y)] += 1
        want = set()
        for (x, y), c in pair.items():
            for a, b_ in ((x, y), (y, x)):
                conf = c * 1_000_000 // freq[a]
                if c >= 2 and conf >= 100_000:
                    want.add(
                        (a, b_, c, c * 1_000_000 // n_orders, conf,
                         conf * n_orders // freq[b_])
                    )

        df = spark.createDataFrame(rows)
        # run the catalog implementation on a temp view of this data by
        # monkey-substituting its loader input
        from etl_complete_with_spark_spark import queries_analytics as QA

        orig_load = QA.load
        QA.load = lambda s, d, t: df if t == "lineitem" else orig_load(s, d, t)
        try:
            got = {
                tuple(r)
                for r in QUERIES["association_rules_parts"](spark, "unused").collect()
            }
        finally:
            QA.load = orig_load
        assert got == want


class TestDualHubStarProperties:
    @SETTINGS
    @given(
        n_dup=st.integers(min_value=3, max_value=12),
        n_uniq=st.integers(min_value=0, max_value=4),
        cap=st.integers(min_value=2, max_value=6),
    )
    def test_star_components_equal_clique_components(
        self, spark, n_dup, n_uniq, cap
    ):
        """r11 dual-hub star: for ANY identical-signature cluster size and
        cap, the guarded candidate graph is an edge-subset of the clique's
        with IDENTICAL connected components (the pre-verification
        equivalence the docstring claims), and oversized buckets emit
        exactly 2(m-1)-1 edges."""
        from etl_complete_with_spark_spark.operators.dedup import (
            lsh_candidate_pairs,
        )

        rows = [
            {"id": f"d-{j:02d}", **{f"mh_{i}": i + 1 for i in range(16)}}
            for j in range(n_dup)
        ]
        for u in range(n_uniq):
            rows.append(
                {"id": f"u-{u:02d}", **{f"mh_{i}": 100 * (u + 2) + i for i in range(16)}}
            )
        sigs = spark.createDataFrame(rows).localCheckpoint(eager=False)
        capped = set(
            map(tuple, lsh_candidate_pairs(sigs, 4, 16, cap).collect())
        )
        clique = set(
            map(tuple, lsh_candidate_pairs(sigs, 4, 16, None).collect())
        )
        assert capped <= clique
        if n_dup > cap:
            assert len(capped) == 2 * (n_dup - 1) - 1
        else:
            assert capped == clique

        def components(pairs):
            parent = {r["id"]: r["id"] for r in rows}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in pairs:
                parent[find(a)] = find(b)
            out = {}
            for v in parent:
                out.setdefault(find(v), set()).add(v)
            return sorted(map(sorted, out.values()))

        assert components(capped) == components(clique)
