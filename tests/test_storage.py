"""Bucket lifecycle tests (SURVEY §2.10-D11, K3) over the local backend."""

from __future__ import annotations

import json
import logging
import os

from etl_complete_with_spark_spark.observability import get_run_logger
from etl_complete_with_spark_spark.storage import (
    LocalBucketStore,
    LogUploader,
    build_bucket_name,
)


class TestBucketName:
    def test_prefix_and_underscore_normalization(self):
        assert build_bucket_name("retail_orders") == "prd-lake-work-retail-orders"
        assert build_bucket_name("plain") == "prd-lake-work-plain"


class TestLocalStore:
    def test_exists_create(self, tmp_path):
        store = LocalBucketStore(str(tmp_path))
        assert not store.bucket_exists("b1")
        store.create_bucket("b1")
        assert store.bucket_exists("b1")

    def test_clear_prefix_counts_and_scopes(self, tmp_path):
        store = LocalBucketStore(str(tmp_path))
        store.create_bucket("b")
        (tmp_path / "b" / "ds1").mkdir()
        (tmp_path / "b" / "ds2").mkdir()
        (tmp_path / "b" / "ds1" / "a.parquet").write_text("x")
        (tmp_path / "b" / "ds1" / "b.parquet").write_text("y")
        (tmp_path / "b" / "ds2" / "keep.parquet").write_text("z")
        assert store.clear_prefix("b", "ds1") == 2
        assert (tmp_path / "b" / "ds2" / "keep.parquet").exists()
        assert store.clear_prefix("b", "ds1") == 0  # idempotent

    def test_ensure_clear_bucket_both_paths(self, tmp_path):
        store = LocalBucketStore(str(tmp_path))
        store.ensure_clear_bucket("newb", "ds")  # creates
        assert store.bucket_exists("newb")
        (tmp_path / "newb" / "ds").mkdir()
        (tmp_path / "newb" / "ds" / "old.parquet").write_text("stale")
        store.ensure_clear_bucket("newb", "ds")  # clears
        assert not (tmp_path / "newb" / "ds").exists()

    def test_json_roundtrip_and_miss(self, tmp_path):
        store = LocalBucketStore(str(tmp_path))
        store.create_bucket("b")
        src = tmp_path / "schema.json"
        src.write_text(json.dumps({"type": "struct"}))
        store.upload("b", "schemas/ns_ds.json", str(src))
        assert store.download_json("b", "schemas/ns_ds.json") == {"type": "struct"}
        assert store.download_json("b", "schemas/missing.json") is None


class TestLogUploader:
    def test_flush_uploads_once_per_call(self, tmp_path):
        log_file = tmp_path / "run.log"
        logger = get_run_logger("nsx", "dsx", str(log_file))
        logger.info("line 1")
        logger.info("line 2")
        for h in logger.handlers:
            h.flush()
        store = LocalBucketStore(str(tmp_path / "buckets"))
        store.create_bucket("logs")
        up = LogUploader(store, "logs", "runs/run.log", str(log_file))
        up.flush()
        mirrored = (tmp_path / "buckets" / "logs" / "runs" / "run.log").read_text()
        assert "line 1" in mirrored and "line 2" in mirrored
        logging.getLogger("etl.nsx.dsx").handlers.clear()


class TestCompatCli:
    def test_unknown_program_usage(self, capsys):
        from etl_complete_with_spark_spark.cli.compat import main

        assert main(["nope"]) == 2
        assert "carga_date" in capsys.readouterr().err

    def test_program_table_covers_reference(self):
        from etl_complete_with_spark_spark.cli.compat import PROGRAMS

        assert set(PROGRAMS) == {
            "carga_date", "carga_int", "mongodb_carga_date", "mongodb_carga_int",
        }
        assert PROGRAMS["carga_date"] == ("jdbc", "date")
        assert PROGRAMS["mongodb_carga_int"] == ("mongodb", "int")


class TestSqlCli:
    def test_sql_cli_query_and_lake_views(self, spark, sf_dir, tmp_path, capsys):
        from etl_complete_with_spark_spark.cli.sql import main
        from etl_complete_with_spark_spark.lake import Lake

        lake_root = str(tmp_path / "lake")
        lake = Lake(lake_root)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(50)
        lake.write_work(ev, "ns", "ev")

        rc = main([
            "SELECT count(*) AS n FROM orders", "--sf-dir", sf_dir,
        ])
        assert rc == 0
        assert "1500" in capsys.readouterr().out  # sf0.001 orders rows

        # a stray FILE at the zone level must not abort view registration
        zone_dir = os.path.join(lake_root, lake.environment, "work")
        with open(os.path.join(zone_dir, "_SUCCESS_MARKER"), "w") as f:
            f.write("not a namespace")

        rc = main([
            "SELECT count(*) AS n FROM work_ns_ev",
            "--sf-dir", sf_dir, "--lake-root", lake_root,
        ])
        assert rc == 0
        assert "50" in capsys.readouterr().out

    def test_sql_cli_explain_and_output(self, spark, sf_dir, tmp_path, capsys):
        from etl_complete_with_spark_spark.cli.sql import main

        rc = main([
            "SELECT o_orderkey FROM orders WHERE o_orderkey < 10",
            "--sf-dir", sf_dir, "--explain",
        ])
        assert rc == 0
        assert "Physical Plan" in capsys.readouterr().out

        out_dir = str(tmp_path / "result")
        rc = main([
            "SELECT o_orderkey FROM orders WHERE o_orderkey < 10",
            "--sf-dir", sf_dir, "--output", out_dir,
        ])
        assert rc == 0
        assert spark.read.parquet(out_dir).count() == 10


class TestJobMetrics:
    def test_measure_jobs_captures_shuffle_and_io(self, sf_dir, tmp_path):
        """measure_jobs needs the Spark UI; spin a dedicated session
        (the shared fixture runs with the UI off)."""
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark.observability import measure_jobs
        from etl_complete_with_spark_spark.session import get_spark

        spark = get_spark(
            app_name="metrics-test", extra_conf={"spark.ui.enabled": "true"}
        )
        if spark.sparkContext.uiWebUrl is None:
            import pytest

            pytest.skip("Spark UI unavailable in this session")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        with measure_jobs(spark) as m:
            (
                orders.groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"))
                .write.mode("overwrite")
                .parquet(str(tmp_path / "out"))
            )
        assert m.stages >= 2  # map + reduce at least
        assert m.input_bytes > 0
        assert m.shuffle_write_bytes > 0
        assert m.output_bytes > 0
