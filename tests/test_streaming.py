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


class TestDisorderScenario:
    """ONE Kafka-shaped end-to-end scenario (no Kafka in the image; the
    file source delivers the identical disorder semantics): three
    micro-batches containing out-of-order, duplicate AND late events,
    driven through the real operator graphs, asserting in a single run
    that (a) the watermark drops late data, (b) cross-batch dedup is
    exactly-once, and (c) stream-stream attribution matches the batch
    twin over the effective (on-time, deduped) event set — and does NOT
    match the raw set, proving the drops are real.

    Watermark-lag nuance this scenario encodes (SPARK-40925, verified
    empirically on this runtime): within micro-batch k the LATE-EVENT
    filter uses the watermark advanced through batch k-2's data, while
    state EVICTION/emission uses the one through batch k-1 — so "late"
    below means late relative to batch 1's 10:40 watermark, which is the
    filter in effect during batch 3.

    Timeline (watermark delay 10 min everywhere):
      batch 1: e1 click u1 @10:00 | e2 purchase u1 @10:20 | e3 view u2
               @10:05 | e4 click u2 @10:40 | e5 view u1 @10:50
               -> watermark 10:40
      batch 2 (listed out of order in the file): e7 view u2 @12:00 |
               e6 purchase u2 @11:05 | e9 purchase u1 @10:55 |
               dup(e5), dup(e3) [only dedup state can drop them: the
               late filter during batch 2 is still the initial epoch]
               -> watermark 11:50
      batch 3: e10 view u2 @12:30 (spacer: lets the join evict e9's
               state and advances the late filter to 11:50 for batch 4)
      batch 4: e8 click u1 @10:30 [LATE — dedup/agg drop it on input;
               the join has already evicted purchase e9's state, so the
               (e8 -> e9) attribution the raw data implies never fires]
               | dup(e7) [cross-batch dedup]
    """

    EVENTS = [
        # (event_id, ts, user_id, event_type, value), one tuple per file row
        [
            (5, "2024-01-01 10:50:00", 1, "view", 5.0),
            (1, "2024-01-01 10:00:00", 1, "click", 1.0),
            (2, "2024-01-01 10:20:00", 1, "purchase", 2.0),
            (4, "2024-01-01 10:40:00", 2, "click", 4.0),
            (3, "2024-01-01 10:05:00", 2, "view", 3.0),
        ],
        [
            (7, "2024-01-01 12:00:00", 2, "view", 7.0),
            (6, "2024-01-01 11:05:00", 2, "purchase", 6.0),
            (9, "2024-01-01 10:55:00", 1, "purchase", 9.0),
            (5, "2024-01-01 10:50:00", 1, "view", 5.0),
            (3, "2024-01-01 10:05:00", 2, "view", 3.0),
        ],
        [
            (10, "2024-01-01 12:30:00", 2, "view", 10.0),
        ],
        [
            (8, "2024-01-01 10:30:00", 1, "click", 8.0),
            (7, "2024-01-01 12:00:00", 2, "view", 7.0),
        ],
    ]

    @pytest.fixture()
    def disorder_dir(self, tmp_path):
        import pandas as pd

        d = tmp_path / "disorder"
        d.mkdir()
        for i, rows in enumerate(self.EVENTS):
            pdf = pd.DataFrame(
                rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
            )
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            pdf["props"] = "{}"
            path = d / f"batch-{i}.parquet"
            pdf.to_parquet(path)
            os.utime(path, (1_700_000_000 + i * 10,) * 2)
        return str(d)

    def _frame(self, spark, rows):
        import pandas as pd

        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pdf["props"] = "{}"
        return spark.createDataFrame(pdf).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_watermark_dedup_attribution_single_run(self, spark, disorder_dir):
        from etl_complete_with_spark_spark.streaming.ingest import attribute_purchases

        # (b) cross-batch exactly-once dedup: dup(e5)/dup(e7) arrive at or
        # above the watermark, so only the seen-key state can drop them;
        # (a) e8 and dup(e3) are below it, so the watermark drops them.
        dedup = run_to_memory(
            spark,
            stream_source(spark, disorder_dir, max_files_per_trigger=1)
            .withWatermark("ts", "10 minutes")
            .dropDuplicates(["event_id"]),
            "disorder_dedup",
            output_mode="append",
        )
        got_ids = sorted(r.event_id for r in dedup.collect())
        assert got_ids == [1, 2, 3, 4, 5, 6, 7, 9, 10]  # each once; e8 late-dropped

        # chained stateful ops: dedup THEN windowed agg. Window
        # [10:00,11:00) closes when the watermark passes 11:00 (end of
        # batch 2) and is emitted during batch 3; duplicate e5 must not
        # inflate `view`, late e8 must not inflate `click`.
        counts = run_to_memory(
            spark,
            windowed_event_counts(
                stream_source(spark, disorder_dir, max_files_per_trigger=1)
                .withWatermark("ts", "10 minutes")
                .dropDuplicates(["event_id"]),
                window="1 hour",
                watermark=None,  # chained stateful ops share one watermark
            ),
            "disorder_counts",
            output_mode="append",
        )
        emitted = {
            (r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
            for r in counts.collect()
        }
        assert emitted == {
            ("2024-01-01T10:00:00", "click"): (2, 5.0),      # e1+e4, NOT e8
            ("2024-01-01T10:00:00", "purchase"): (2, 11.0),  # e2+e9
            ("2024-01-01T10:00:00", "view"): (2, 8.0),       # e3+e5 once each
            ("2024-01-01T11:00:00", "purchase"): (1, 6.0),   # e6; closed by e10
        }

        # (c) stream-stream attribution over the SAME disordered source:
        # e2 attributes to e1 (batch 1), e6 to e4 (batch 2); late e8
        # never enters join state, so e9 stays unattributed.
        attrib = run_to_memory(
            spark,
            attribute_purchases(
                stream_source(spark, disorder_dir, max_files_per_trigger=1),
                window_minutes=30,
                watermark="10 minutes",
            ),
            "disorder_attrib",
            output_mode="append",
        )
        got_pairs = sorted((r.click_id, r.purchase_id) for r in attrib.collect())
        assert got_pairs == [(1, 2), (4, 6)]

        # batch parity: equal to the batch twin over the EFFECTIVE set
        # (deduped, late-dropped), unequal to the raw set — the raw twin
        # additionally attributes (e8 -> e9), proving the stream's
        # watermark genuinely dropped the late click.
        # batches 1-3 minus the duplicate rows = events e1..e7, e9, e10
        effective_rows = {r[0]: r for b in self.EVENTS[:3] for r in b}
        effective = self._frame(spark, list(effective_rows.values()))
        batch_pairs = sorted(
            (r.click_id, r.purchase_id)
            for r in attribute_purchases(effective, 30, "10 minutes").collect()
        )
        assert batch_pairs == got_pairs

        raw = self._frame(spark, [r for b in self.EVENTS for r in b])
        raw_pairs = sorted(
            set(
                (r.click_id, r.purchase_id)
                for r in attribute_purchases(raw.dropDuplicates(["event_id"]), 30, "10 minutes").collect()
            )
        )
        assert raw_pairs == [(1, 2), (4, 6), (8, 9)]


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


class TestScd2DimStream:
    def test_epoch_batch_ts_rolls_months(self):
        """Version timestamps use real date arithmetic: a stream with
        more than 31 micro-batches must roll into February, not emit
        the invalid '2024-01-32'."""
        from etl_complete_with_spark_spark.streaming.ingest import epoch_batch_ts

        assert epoch_batch_ts(0) == "2024-01-01 00:00:00"
        assert epoch_batch_ts(1) == "2024-01-02 00:00:00"
        assert epoch_batch_ts(31) == "2024-02-01 00:00:00"
        assert epoch_batch_ts(60) == "2024-03-01 00:00:00"  # 2024 is a leap year
        assert epoch_batch_ts(365) == "2024-12-31 00:00:00"


    def test_stream_matches_sequential_batch_application(self, spark, tmp_path):
        """Two micro-batches of attribute updates through scd2_dim_stream
        == sequential scd2_init + scd2_apply with the same epoch-derived
        timestamps."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from etl_complete_with_spark_spark.operators.scd2 import (
            scd2_apply,
            scd2_init,
        )
        from etl_complete_with_spark_spark.streaming.ingest import scd2_dim_stream

        b0 = [(1, "paris"), (2, "rome"), (3, "oslo")]
        b1 = [(1, "lyon"), (2, "rome"), (4, "cairo")]  # 1 changes, 2 no-op, 4 new
        stage = tmp_path / "in"
        stage.mkdir()
        import os as _os

        for i, rows in enumerate([b0, b1]):
            p = stage / f"part-{i}.parquet"
            pq.write_table(
                pa.table(
                    {
                        "id": pa.array([r[0] for r in rows], pa.int64()),
                        "city": pa.array([r[1] for r in rows]),
                    }
                ),
                str(p),
            )
            # file-stream batch order follows modification time; pin it
            _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        dim_dir = tmp_path / "dim"
        q = scd2_dim_stream(
            spark,
            str(stage),
            dim_dir=str(dim_dir),
            checkpoint_dir=str(tmp_path / "ckpt"),
            key="id",
            tracked=["city"],
            schema="id long, city string",
            max_files_per_trigger=1,
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        with open(dim_dir / "_CURRENT") as fh:
            cur = fh.read().strip()
        streamed = sorted(
            map(tuple, spark.read.parquet(str(dim_dir / cur)).collect())
        )

        def df(rows):
            return spark.createDataFrame(rows, "id long, city string")

        dim = scd2_init(df(b0), "2024-01-01 00:00:00")
        dim = scd2_apply(dim, df(b1), "id", ["city"], "2024-01-02 00:00:00")
        want = sorted(map(tuple, dim.collect()))
        assert streamed == want
        # key 1: two versions; key 2: one (no-op); keys 3,4: one each
        assert len(streamed) == 5
