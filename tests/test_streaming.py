"""Structured Streaming tests: stream-batch parity + trusted upsert."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.lake import Lake
from etl_complete_with_spark_spark.queries import load
from etl_complete_with_spark_spark.streaming.ingest import (
    sessionize,
    stream_source,
    stream_upsert_to_trusted,
    windowed_event_counts,
)


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    """Copy the events parquet into a stream-source directory."""
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")
    return str(d)


def run_to_memory(spark, stream_df, name, output_mode="complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


class TestWindowedCounts:
    def test_stream_equals_batch(self, spark, sf_dir, events_dir):
        stream = stream_source(spark, events_dir)
        got = run_to_memory(
            spark, windowed_event_counts(stream, window="1 hour"), "win_counts"
        )
        batch = (
            load(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value",
            )
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))

    def test_sliding_window_multiplicity(self, spark, events_dir):
        stream = stream_source(spark, events_dir)
        slid = run_to_memory(
            spark,
            windowed_event_counts(stream, window="2 hours", slide="1 hour"),
            "win_slide",
        )
        # every event belongs to exactly 2 sliding windows
        total_tumbling = run_to_memory(
            spark, windowed_event_counts(stream_source(spark, events_dir), window="1 hour"),
            "win_tumble",
        )
        assert (
            slid.agg(F.sum("n_events")).first()[0]
            == 2 * total_tumbling.agg(F.sum("n_events")).first()[0]
        )


class TestSessionize:
    def test_sessions_nonoverlapping_per_user(self, spark, events_dir):
        stream = stream_source(spark, events_dir)
        got = run_to_memory(spark, sessionize(stream, gap="10 minutes"), "sessions")
        rows = got.orderBy("user_id", "session_start").collect()
        assert rows
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
        for spans in by_user.values():
            for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
                assert e1 <= s2  # closed before next opens


class TestStreamingUpsert:
    def test_upsert_matches_batch_phase2(self, spark, sf_dir, events_dir, tmp_path):
        lake = Lake(str(tmp_path / "lake"))
        stream = stream_source(spark, events_dir)
        writer = stream_upsert_to_trusted(
            stream, lake, "ns", "events", ["event_id"], str(tmp_path / "ckpt")
        )
        q = writer.start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        trusted = lake.read_trusted(spark, "ns", "events")
        batch_n = load(spark, sf_dir, "events").count()
        assert trusted.count() == batch_n
        assert {"sk", "timestamp_kafka"} <= set(trusted.columns)
        # replaying the same data must not duplicate (sk-merge idempotency)
        q2 = stream_upsert_to_trusted(
            stream_source(spark, events_dir), lake, "ns", "events",
            ["event_id"], str(tmp_path / "ckpt2"),
        ).start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert lake.read_trusted(spark, "ns", "events").count() == batch_n


class TestStatefulOperator:
    def test_running_totals_match_batch(self, spark, sf_dir, events_dir):
        from etl_complete_with_spark_spark.streaming.ingest import running_user_totals

        stream = stream_source(spark, events_dir)
        got = run_to_memory(spark, running_user_totals(stream), "run_totals", "update")
        # final state per user == plain batch aggregation
        import pyspark.sql.functions as SF

        # max_by(n_events), not max(sum_value): see the TWS twin test below
        latest = got.groupBy("user_id").agg(
            SF.max("n_events").alias("n_events"),
            SF.max_by("sum_value", "n_events").alias("sum_value"),
        )
        batch = (
            load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(SF.count(SF.lit(1)).alias("n_events"), SF.round(SF.sum("value"), 2).alias("sum_value"))
        )
        assert sorted(map(tuple, latest.collect())) == sorted(map(tuple, batch.collect()))

    def test_transform_with_state_matches_legacy_api(self, spark, sf_dir, events_dir):
        """The transformWithStateInPandas twin lands the same final state
        per user as both the legacy applyInPandasWithState operator and
        the plain batch aggregation. Requires the protobuf package (the
        TWS Python worker's wire protocol) — skipped where absent."""
        pytest.importorskip("google.protobuf")
        import pyspark.sql.functions as SF

        from etl_complete_with_spark_spark.streaming.ingest import (
            running_user_totals_tws,
        )

        stream = stream_source(spark, events_dir)
        got = run_to_memory(
            spark, running_user_totals_tws(stream), "run_totals_tws", "update"
        )
        # the FINAL update per user is the row with the max event count —
        # max_by, not max(sum_value): a running total over negative values
        # peaks at an intermediate state, not the final one
        latest = got.groupBy("user_id").agg(
            SF.max("n_events").alias("n_events"),
            SF.max_by("sum_value", "n_events").alias("sum_value"),
        )
        batch = (
            load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                SF.count(SF.lit(1)).alias("n_events"),
                SF.round(SF.sum("value"), 2).alias("sum_value"),
            )
        )
        assert sorted(map(tuple, latest.collect())) == sorted(
            map(tuple, batch.collect())
        )


class TestStreamStreamJoin:
    def test_attribution_matches_batch_join(self, spark, sf_dir, events_dir):
        from etl_complete_with_spark_spark.streaming.ingest import attribute_purchases

        stream = stream_source(spark, events_dir)
        got = run_to_memory(
            spark, attribute_purchases(stream, 60), "attrib", output_mode="append"
        )
        ev = load(spark, sf_dir, "events")
        batch = attribute_purchases(ev, 60)  # same operator over static frames
        a = sorted(map(tuple, got.collect()))
        b = sorted(map(tuple, batch.collect()))
        assert a == b and len(a) > 0


class TestCheckpointRecovery:
    def test_windowed_agg_resumes_from_checkpoint(self, spark, sf_dir, tmp_path):
        """Kill a checkpointed stream after its first micro-batch, restart
        it, and require the final result to equal the batch twin — the
        exactly-once contract a production ingest leans on after any
        crash/redeploy."""
        import pyarrow.parquet as pq

        src = tmp_path / "src"
        src.mkdir()
        # stage the events as FOUR files so maxFilesPerTrigger=1 yields
        # several micro-batches (a single file would finish in batch one)
        t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        quarter = max(1, t.num_rows // 4)
        for i in range(4):
            pq.write_table(t.slice(i * quarter, quarter if i < 3 else None), src / f"p{i}.parquet")

        ckpt = str(tmp_path / "ckpt")
        sink = str(tmp_path / "sink")

        def start():
            stream = stream_source(spark, str(src), max_files_per_trigger=1)
            counts = windowed_event_counts(stream, window="1 hour")
            return (
                counts.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(processingTime="0 seconds")
                .start()
            )

        # Phase 1: let at least one micro-batch commit, then kill mid-run.
        q = start()
        import time as _t

        for _ in range(200):
            if q.lastProgress and q.lastProgress["batchId"] >= 1:
                break
            _t.sleep(0.1)
        q.stop()

        # Phase 2: restart from the same checkpoint; drain to completion.
        # Append mode emits a window only once its watermark passes, so
        # re-delivered batches must not double-count (exactly-once).
        q2 = start()
        q2.processAllAvailable()
        q2.stop()

        got = (
            spark.read.schema(
                "window_start timestamp, window_end timestamp, event_type string,"
                " n_events long, sum_value double"
            )
            .parquet(sink)
        )
        batch = (
            load(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )
        g = sorted(map(tuple, got.collect()))
        b = sorted(map(tuple, batch.collect()))
        # append-mode emits only watermark-closed windows; every emitted
        # window must match the batch result exactly (no dupes, no loss)
        assert len(g) > 0 and set(g) <= set(b)
        closed = {r[:3] for r in g}
        assert len(closed) == len(g), "window emitted twice across restart"


class TestNeardupIngestStream:
    """Continual near-dup ingest (foreachBatch + persistent signature
    table) must produce the same corpus as applying the oracled batch
    operator sequentially over the same arrival order."""

    @pytest.fixture()
    def doc_batches(self, spark, sf_dir, tmp_path):
        """documents split into 3 arrival batches, one file each, written
        with strictly increasing mtimes so the file source processes them
        in order with maxFilesPerTrigger=1."""
        import time

        docs = load(spark, sf_dir, "documents")
        d = tmp_path / "doc_stream"
        d.mkdir()
        batches = []
        for i in range(3):
            pdf = docs.filter(F.col("doc_id") % 3 == i).toPandas()
            path = d / f"batch-{i}.parquet"
            pdf.to_parquet(path)
            os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
            batches.append(pdf)
        return str(d), batches

    def test_stream_corpus_equals_sequential_batch(
        self, spark, sf_dir, tmp_path, doc_batches
    ):
        from etl_complete_with_spark_spark.operators.dedup import (
            incremental_neardup_filter,
            minhash_signatures,
        )
        from etl_complete_with_spark_spark.streaming.ingest import (
            neardup_ingest_stream,
        )

        docs_path, batches = doc_batches
        sig_dir = str(tmp_path / "sigs")
        kept_dir = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")

        q = neardup_ingest_stream(
            spark, docs_path, sig_dir, kept_dir, ckpt, max_files_per_trigger=1
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        stream_kept = {r.doc_id for r in spark.read.parquet(kept_dir).collect()}
        stream_sigs = spark.read.parquet(sig_dir).count()

        # sequential reference: the SAME batch operator applied in order
        corpus = minhash_signatures(
            load(spark, sf_dir, "documents").limit(0), "doc_id", "text", 3, 16
        )
        expect = set()
        for pdf in batches:
            batch_df = spark.createDataFrame(pdf)
            kept, sigs = incremental_neardup_filter(batch_df, corpus, "doc_id", "text", 3, 16)
            expect |= {r.doc_id for r in kept.collect()}
            corpus = corpus.unionByName(sigs).localCheckpoint()

        assert stream_kept == expect
        assert stream_sigs == len(expect)  # one signature row per kept doc
        # and the filter actually dropped something (the corpus has dups)
        n_docs = sum(len(p) for p in batches)
        assert len(expect) < n_docs
