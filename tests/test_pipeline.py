"""End-to-end resync pipeline tests (SURVEY §3, §2.10-D10, FIXTURES F-F)."""

from __future__ import annotations

import pytest

from etl_complete_with_spark_spark.lake import Lake
from etl_complete_with_spark_spark.pipeline import ResyncConfig, ResyncPipeline
from etl_complete_with_spark_spark.sources import ParquetSource


class FlakySource(ParquetSource):
    """Fails the first ``n_failures`` read_slice calls (FIXTURES F-F)."""

    def __init__(self, path, pc, n_failures):
        super().__init__(path, pc)
        self.n_failures = n_failures
        self.calls = 0

    def read_slice(self, spark, interval):
        self.calls += 1
        if self.calls <= self.n_failures:
            raise RuntimeError(f"injected failure #{self.calls}")
        return super().read_slice(spark, interval)


def make_pipeline(tmp_path, sf_dir, **cfg_over):
    src = ParquetSource(f"{sf_dir}/events.parquet", "event_id")
    lake = Lake(str(tmp_path / "lake"))
    cfg = ResyncConfig(
        namespace="ns", dataset="events", partition_column="event_id",
        mode="int", start=0, end=1000, amount=1000, **cfg_over,
    )
    return src, lake, ResyncPipeline(src, lake, cfg)


class TestPlan:
    def test_int_plan_uses_cli_bounds_and_tier(self, spark, tmp_path, sf_dir):
        _, _, pipe = make_pipeline(tmp_path, sf_dir)
        ivs = pipe.plan(spark)
        assert ivs[0].start == 0 and ivs[-1].end == 1000
        assert all(iv.end - iv.start <= 1000 for iv in ivs)

    def test_probe_bounds_when_no_args(self, spark, tmp_path, sf_dir):
        src, lake, _ = make_pipeline(tmp_path, sf_dir)
        from etl_complete_with_spark_spark.pipeline import ResyncConfig, ResyncPipeline

        cfg = ResyncConfig(
            namespace="ns", dataset="events", partition_column="event_id",
            mode="int", amount=100,
        )
        ivs = ResyncPipeline(src, lake, cfg).plan(spark)
        assert ivs[0].start == 0  # probed min
        assert ivs[-1].end >= 999 + 300_000  # probed max + headroom


class TestRun:
    def test_parallel_run_lands_all_rows(self, spark, tmp_path, sf_dir):
        src, lake, pipe = make_pipeline(tmp_path, sf_dir)
        res = pipe.run(spark, parallel=True)
        assert res.status == "success" and res.attempts == 1
        expected = src.read_slice(spark, type(res.intervals[0])(0, 1000)).count()
        assert lake.read_work(spark, "ns", "events").count() == expected

    def test_sequential_equals_parallel(self, spark, tmp_path, sf_dir):
        src, lake, pipe = make_pipeline(tmp_path / "a", sf_dir)
        pipe.run(spark, parallel=False)
        n_seq = pipe.lake.read_work(spark, "ns", "events").count()
        _, lake2, pipe2 = make_pipeline(tmp_path / "b", sf_dir)
        pipe2.run(spark, parallel=True)
        assert n_seq == lake2.read_work(spark, "ns", "events").count()

    def test_retry_recovers_from_transient_failures(self, spark, tmp_path, sf_dir):
        src = FlakySource(f"{sf_dir}/events.parquet", "event_id", n_failures=2)
        lake = Lake(str(tmp_path / "lake"))
        cfg = ResyncConfig(
            namespace="ns", dataset="events", partition_column="event_id",
            mode="int", start=0, end=1000, amount=1000, max_retries=4,
        )
        res = ResyncPipeline(src, lake, cfg).run(spark, parallel=False)
        assert res.status == "success"
        assert res.attempts > len(res.completed)  # retries happened

    def test_exhausted_retries_fail_fast_with_status(self, spark, tmp_path, sf_dir):
        src = FlakySource(f"{sf_dir}/events.parquet", "event_id", n_failures=99)
        lake = Lake(str(tmp_path / "lake"))
        statuses = []
        cfg = ResyncConfig(
            namespace="ns", dataset="events", partition_column="event_id",
            mode="int", start=0, end=500, amount=1000, max_retries=2,
        )
        pipe = ResyncPipeline(src, lake, cfg, status_callback=lambda i, p, v: statuses.append(v))
        with pytest.raises(RuntimeError, match="injected"):
            pipe.run(spark, parallel=False)
        assert statuses == ["failed"]

    def test_manifest_resume_skips_completed_slices(self, spark, tmp_path, sf_dir):
        # fail mid-run, re-invoke, final WORK content == uninterrupted run
        src = FlakySource(f"{sf_dir}/events.parquet", "event_id", n_failures=0)
        lake = Lake(str(tmp_path / "lake"))
        cfg = ResyncConfig(
            namespace="ns", dataset="events", partition_column="event_id",
            mode="int", start=0, end=3000, amount=1000, max_retries=1,
        )
        pipe = ResyncPipeline(src, lake, cfg)
        ivs = pipe.plan(spark)
        assert len(ivs) == 3  # 1000-wide slices over [0, 3000)
        # complete only the first slice, then crash on the second
        src.n_failures = 0
        pipe._run_sequential(spark, ivs[:1], __import__(
            "etl_complete_with_spark_spark.pipeline", fromlist=["RunResult"]
        ).RunResult())
        src.calls, src.n_failures = 0, 1  # next read fails once; retries=1 -> crash
        with pytest.raises(RuntimeError):
            pipe.run(spark, parallel=False)
        res = pipe.run(spark, parallel=False)  # resume
        assert res.skipped and res.status == "success"
        expected = ParquetSource(f"{sf_dir}/events.parquet", "event_id").read_slice(
            spark, ivs[0].__class__(0, 3000)
        ).count()
        assert lake.read_work(spark, "ns", "events").count() == expected

    def test_watermark_matches_max_loaded(self, spark, tmp_path, sf_dir):
        src, lake, pipe = make_pipeline(tmp_path, sf_dir)
        pipe.run(spark)
        assert pipe.watermark(spark) == 999


class TestPhase2:
    def test_transform_and_merge_idempotent(self, spark, tmp_path, sf_dir):
        src, lake, pipe = make_pipeline(tmp_path, sf_dir)
        pipe.run(spark)
        t1 = pipe.transform_and_merge(spark, ["event_id"], batch_ts="2024-01-01 00:00:00")
        n1 = t1.count()
        # re-run the same slice (duplicate WORK data) + merge again
        pipe.run(spark)
        t2 = pipe.transform_and_merge(spark, ["event_id"], batch_ts="2024-01-02 00:00:00")
        assert t2.count() == n1  # sk-merge absorbed the duplicates
        assert "sk" in t2.columns and "timestamp_kafka" in t2.columns


class TestMongoLifecycleCli:
    """The fourth reference entry-point family run END TO END: reference
    mongodb_carga_date.py:102-200 is registry resolve -> date slicing ->
    per-slice retry WITHOUT crash recovery -> lake write. The connector
    jar is absent from the image (COVERAGE.md), so the CLI swaps in the
    parquet-backed MongoTwinSource — same slice semantics, same registry
    enforcement — keeping every other lifecycle stage identical."""

    def test_cli_mongodb_twin_end_to_end(self, spark, tmp_path, sf_dir, capsys):
        from etl_complete_with_spark_spark.cli.compat import main as compat_main
        from etl_complete_with_spark_spark.schema_registry import SchemaRegistry

        src_path = f"{sf_dir}/orders.parquet"
        # registry schema: a COLUMN SUBSET of the collection — proves the
        # explicit schema drives the load (Mongo's no-inference contract)
        full = spark.read.parquet(src_path)
        reg_schema = full.select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
        ).schema
        reg = SchemaRegistry(str(tmp_path / "registry"))
        reg.put("demo", "orders", reg_schema)

        lake_root = str(tmp_path / "lake")
        rc = compat_main([
            "mongodb_carga_date",
            "--connection", src_path,
            "--namespace", "demo", "--dataset", "orders",
            "--partition_column", "o_orderdate",
            "--start_process", "1995-01-01", "--end_process", "2001-08-02",
            "--amount", "400000",
            "--lake-root", lake_root,
            "--schema-registry", str(tmp_path / "registry"),
            "--sequential", "--no-recovery",
            "--merge-keys", "o_orderkey",
            "--cloud_environment", "prd",  # reference arg, tolerated
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "slices loaded" in out and "rows after merge" in out

        lake = Lake(lake_root)
        work = lake.read_work(spark, "demo", "orders")
        assert work.count() == full.count()
        # registry subset enforced: only the 4 declared columns landed
        assert sorted(work.columns) == sorted(c.name for c in reg_schema)
        trusted = lake.read_trusted(spark, "demo", "orders")
        assert trusted.count() == full.select("o_orderkey").distinct().count()
        assert "sk" in trusted.columns and "timestamp_kafka" in trusted.columns

    def test_source_routing_is_scheme_explicit(self, sf_dir):
        """build_source routes on the connection SCHEME, not on local
        filesystem state: mongodb:// URIs take the real connector, plain
        paths must exist (a typo errors immediately instead of falling
        through to a confusing connector failure)."""
        import argparse

        import pytest

        from etl_complete_with_spark_spark.cli.resync import build_source
        from etl_complete_with_spark_spark.sources.mongodb import (
            MongoSource,
            MongoTwinSource,
        )

        def args(conn):
            return argparse.Namespace(
                source_kind="mongodb", connection=conn, namespace="ns",
                dataset="orders", partition_column="o_orderdate",
                schema_registry=None, lake_root=None, db_user=None,
                db_pass=None,
            )

        assert type(build_source(args("mongodb://host:27017/db"))) is MongoSource
        assert (
            type(build_source(args("mongodb+srv://cluster.example/db")))
            is MongoSource
        )
        assert isinstance(
            build_source(args(f"{sf_dir}/orders.parquet")), MongoTwinSource
        )
        with pytest.raises(SystemExit, match="neither a"):
            build_source(args(f"{sf_dir}/no_such_file.parquet"))

    def test_no_recovery_reprocesses_full_window(self, spark, tmp_path, sf_dir):
        """recovery=False (the mongodb_carga_* lifecycle): a re-invocation
        ignores the manifest — every slice runs again (the reference
        re-appends; with recovery=True the same re-run skips all)."""
        src = ParquetSource(f"{sf_dir}/events.parquet", "event_id")
        lake = Lake(str(tmp_path / "lake"))
        base = dict(
            namespace="ns", dataset="events", partition_column="event_id",
            mode="int", start=0, end=3000, amount=1000,
        )
        pipe_nr = ResyncPipeline(src, lake, ResyncConfig(recovery=False, **base))
        r1 = pipe_nr.run(spark, parallel=False)
        assert len(r1.completed) == 3 and not r1.skipped
        r2 = pipe_nr.run(spark, parallel=False)
        assert len(r2.completed) == 3 and not r2.skipped  # reprocessed
        # the manifest was still RECORDED, so recovery mode resumes
        pipe_rec = ResyncPipeline(src, lake, ResyncConfig(**base))
        r3 = pipe_rec.run(spark, parallel=False)
        assert len(r3.skipped) == 3 and not r3.completed

    def test_no_recovery_still_retries_transient_failures(
        self, spark, tmp_path, sf_dir
    ):
        """retry-without-recovery: the 4-attempt per-slice retry loop
        (mongodb_carga_date.py:160-195) is independent of recovery."""
        src = FlakySource(f"{sf_dir}/events.parquet", "event_id", n_failures=2)
        lake = Lake(str(tmp_path / "lake"))
        cfg = ResyncConfig(
            namespace="ns", dataset="events", partition_column="event_id",
            mode="int", start=0, end=1000, amount=1000,
            max_retries=4, recovery=False,
        )
        res = ResyncPipeline(src, lake, cfg).run(spark, parallel=False)
        assert res.status == "success" and res.attempts == 3
