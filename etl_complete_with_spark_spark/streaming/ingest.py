"""Structured Streaming ingest + windowed analytics.

The reference has no streaming (SURVEY §2.8), but its data model is built
for a streaming sibling: every TRUSTED row carries ``timestamp_kafka``
and the merge key ``sk`` precisely so a Kafka ingest ("Geralt",
reference utils.py:706-713) can upsert into the same table. This module
is that sibling, built on Structured Streaming:

- ``stream_source``: file-stream over the events table (swap for
  ``format("kafka")`` in production — the downstream graph is identical).
- ``windowed_event_counts``: watermarked tumbling/sliding window agg —
  late data beyond the watermark is dropped, state is bounded.
- ``sessionize``: session windows per user (gap-based).
- ``stream_upsert_to_trusted``: foreachBatch -> the §2.11 transform chain
  -> idempotent sk-merge into TRUSTED. foreachBatch + deterministic sk
  gives effective exactly-once on replays (re-merged micro-batches
  upsert the same keys).
- ``neardup_ingest_stream``: continual corpus ingest with near-dup
  filtering against a persistent signature table (the streaming twin of
  ``dedup.incremental_neardup_filter`` — stream-batch parity tested).

Scale notes: windowed aggs shuffle on (window, key) with partial
aggregation; watermarks bound state size; ``maxFilesPerTrigger``/Kafka
``maxOffsetsPerTrigger`` bound micro-batch size so ingest throughput is
flow-controlled instead of OOMing on backlog.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake import Lake
from ..operators.transforms import work_to_trusted_transform

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # Parquet stores TIMESTAMP(NANOS); Spark 4.1.2+ reads NANOS
        # natively (truncated to micros) and honors an NTZ user schema.
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_source(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream (stand-in for Kafka; same downstream graph).

    ``ts`` is TIMESTAMP(NANOS) in the files. What a read yields is
    runtime-dependent (same dual path as queries.load): older Spark
    builds honor ``nanosAsLong=true`` and hand back int64 nanos; 4.1.2+
    ignores the conf and reads NANOS natively as TIMESTAMP_NTZ micros.
    A streaming reader must declare its schema up front, so a one-off
    BATCH schema probe (footer-only, no data scan) discovers which
    behavior this runtime has, picks the matching user schema, and
    normalizes to the same plain UTC timestamp the batch loader
    produces — stream and batch plans stay interchangeable downstream.
    The NTZ->timestamp cast is value-preserving: session timezone is
    pinned to UTC.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see queries.load
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # ignored on 4.1.2+
    try:
        arrival = dict(spark.read.parquet(path).dtypes).get("ts")
    except Exception:
        # empty/not-yet-populated source dir (normal deployment order:
        # stream starts before the producer's first file) — no footer to
        # probe, so declare this runtime's native arrival type (NTZ on
        # 4.1.2+); a pre-4.1 runtime writing int64 nanos would need the
        # first file present at start time to be detected
        arrival = None
    if arrival == "bigint":
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in EVENT_SCHEMA.fields
            ]
        )
        normalize = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        schema = EVENT_SCHEMA
        normalize = F.col("ts").cast("timestamp")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return df.withColumn("ts", normalize)


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Watermarked (sliding) window counts/sums per event_type.

    Output: window_start, window_end, event_type, n_events, sum_value.
    State for windows older than the watermark is evicted — bounded
    memory under unbounded input. Pass ``watermark=None`` when the input
    already carries one (chained stateful operators — e.g. dedup then
    window agg — must share a single watermark definition; redefining it
    mid-graph is an error).
    """
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    wmarked = events.withWatermark("ts", watermark) if watermark else events
    return (
        wmarked.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer cents sum (queries.rev_e4 rationale): double
            # sums are summation-order-dependent, and streaming state
            # merge order is even less deterministic than batch partials
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .cast("double") / 100.0,
                2,
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based session windows per user: one row per closed session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact cents sum — see windowed_event_counts
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .cast("double") / 100.0,
                2,
            ).alias("sum_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_upsert_to_trusted(
    events: DataFrame,
    lake: Lake,
    namespace: str,
    dataset: str,
    id_columns: list[str],
    checkpoint_dir: str,
):
    """Continuous upsert into the TRUSTED zone via foreachBatch.

    Each micro-batch runs the §2.11 transform chain (sk, batch timestamp,
    quality, dedup) and the sk-merge — the same code path as batch
    phase 2, so stream and batch rows are indistinguishable downstream.
    Idempotent on replay: a re-processed micro-batch merges the same sks.
    """

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        transformed = work_to_trusted_transform(
            batch_df, id_columns, deterministic_dedup=True
        )
        lake.merge_trusted(spark, transformed, namespace, dataset)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


# ---------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful per-user running totals via applyInPandasWithState.

    The custom-operator escape hatch the built-in windowed aggs can't
    express (cross-batch mutable state with per-key lifecycle): state is
    one (count, sum) pair per user, updated each micro-batch, emitting the
    running totals downstream. State lives in the state store (checkpoint-
    backed, partitioned by key) — per-executor memory is bounded by its
    key shard, not the stream length.
    """
    import pandas as pd

    def update(key, pdfs, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """`running_user_totals` on Spark 4's transformWithStateInPandas —
    the successor API to applyInPandasWithState: named state variables
    (ValueState here; ListState/MapState/timers available) managed by a
    StatefulProcessor object instead of one opaque state tuple. Same
    semantics as the legacy-API twin, asserted equal in tests; prefer
    this API for new stateful operators (schema evolution on state,
    per-variable TTL, cleaner lifecycle).

    Runtime requirement: the TWS Python worker speaks protobuf to the
    JVM state server, so the ``protobuf`` package must be importable on
    executors (absent in this test image — the parity test skips there;
    the legacy-API twin carries the catalog entry)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", RUNNING_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def attribute_purchases(
    events: DataFrame,
    window_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream join: each purchase attributed to every click by the
    same user in the preceding ``window_minutes``.

    Both sides are watermarked and the join condition carries an explicit
    time bound — that pair is what lets Structured Streaming expire join
    state (an unbounded stream-stream join would buffer both streams
    forever). Inner join => append output mode. Batch parity: the same
    join expression over static frames (asserted in tests); semantically
    it is interval_join (operators/range_join.py) with the purchase as
    the probe and per-click windows, plus the user equi-key.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    buys = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("buyer_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("buyer_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    return clicks.join(buys, cond).select(
        "click_id", "user_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"
    )


# ---------------------------------------------------------------------------
# Continual near-dup ingest (streaming twin of dedup.incremental_neardup_filter)
# ---------------------------------------------------------------------------

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def neardup_ingest_stream(
    spark: SparkSession,
    docs_path: str,
    sig_dir: str,
    kept_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_files_per_trigger: int = 1,
):
    """Streaming corpus ingest with near-dup filtering: each micro-batch of
    documents is deduped against everything ingested so far, survivors'
    TEXT lands in ``kept_dir`` and their MinHash SIGNATURES append to the
    persistent corpus table in ``sig_dir`` (the corpus is never stored as
    text on the dedup path — 128 B/doc of state at k=16, the only shape
    that survives continual ingest at billions of documents).

    foreachBatch, not a stateful streaming operator: near-dup corpus
    state can never be watermarked away (a duplicate may arrive years
    later), so the state belongs in a storage-backed table, not executor
    state stores.

    Replay idempotence is by EPOCH-KEYED OVERWRITE, the canonical
    foreachBatch exactly-once recipe: each micro-batch lands in
    ``<dir>/epoch=<id>/`` with overwrite mode for both outputs, so a
    batch replayed after a crash — even one that died between the two
    writes — simply rewrites its own epoch directories and the kept/sig
    tables converge to the same set. (Plain appends would duplicate
    kept text whenever a crash landed between the kept append and the
    sig append: the replayed docs would no longer self-match.) Readers
    see one partitioned table per dir; the signature reads below drop
    the discovered ``epoch`` partition column.

    The per-batch work is exactly `dedup.incremental_neardup_filter` —
    the oracled batch operator — so stream and batch ingest produce
    identical corpora for identical arrival order.
    """
    import glob
    import os

    from ..operators.dedup import incremental_neardup_filter, minhash_signatures

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_path)
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bspark = batch_df.sparkSession
        prior = [
            d
            for d in glob.glob(os.path.join(sig_dir, "epoch=*"))
            # a replayed epoch must dedup against STRICTLY EARLIER epochs
            # only — its own partial output is being rewritten
            if int(os.path.basename(d).split("=", 1)[1]) < epoch_id
        ]
        if prior:
            corpus_sigs = bspark.read.parquet(*prior).drop("epoch")
        else:
            corpus_sigs = minhash_signatures(
                batch_df.limit(0), "doc_id", "text", n, num_hashes
            )
        kept, kept_sigs = incremental_neardup_filter(
            batch_df,
            corpus_sigs,
            "doc_id",
            "text",
            n,
            num_hashes,
            bands,
            threshold,
        )
        # both outputs derive from the checkpointed dup_ids inside
        # incremental_neardup_filter, so the kept text and the signature
        # corpus always reflect the SAME dup set and the dedup joins run
        # once per batch (no second lineage replay for the sig write).
        kept.write.mode("overwrite").parquet(
            os.path.join(kept_dir, f"epoch={int(epoch_id)}")
        )
        kept_sigs.write.mode("overwrite").parquet(
            os.path.join(sig_dir, f"epoch={int(epoch_id)}")
        )

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def quantile_sketch_stream(
    spark: SparkSession,
    events_path: str,
    sketch_dir: str,
    checkpoint_dir: str,
    k: int = 256,
    max_files_per_trigger: int = 1,
):
    """Streaming maintenance of the mergeable bottom-k quantile sketch
    (`operators/quantiles.py`): each micro-batch contributes its
    per-event_type bottom-k rows to a persistent sketch table; any later
    reader answers quantile queries by merging sketches (union + re-cut
    to the k smallest hash ranks) — the stream is never rescanned.

    Because bottom-k by a deterministic uniform hash is a TRUE mergeable
    summary (the k smallest ranks of a union are a subset of each part's
    k smallest), the merged streaming sketch is bit-identical to the
    batch sketch over the same rows regardless of how arrival split the
    batches — asserted in test_streaming.py and by the exact SQL oracle
    of the `stream_quantile_sketch` catalog entry.

    Same epoch-keyed overwrite recipe as :func:`neardup_ingest_stream`
    (crash-replayed batches rewrite their own ``epoch=<id>/`` dir, so
    the sketch table converges); state per (type, batch) is bounded by k
    rows — no executor state store, no watermark needed.
    """
    import os

    from ..operators.quantiles import bottomk_precut, merge_bottomk_hash

    stream = stream_source(spark, events_path, max_files_per_trigger)

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # map-side pre-cut inside the batch's own partitions, then a
        # k-bounded merge: the persisted sketch is exactly k rows per
        # type and the batch's corpus never crosses an exchange
        sketch = merge_bottomk_hash(
            bottomk_precut(
                batch_df, ["event_type"], "value", k=k, id_col="event_id"
            ),
            ["event_type"],
            k=k,
        ).select("event_type", "value", "rank_hash")
        sketch.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"epoch={int(epoch_id)}")
        )

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def incremental_rollup_stream(
    spark: SparkSession,
    events_path: str,
    rollup_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Streaming incremental view maintenance of the daily orders rollup:
    each micro-batch writes its own per-day PARTIAL aggregate (count +
    exact integer cents) into ``rollup_dir/epoch=<id>/``; readers merge
    all partials with one groupBy-sum — `operators/merge.merge_additive`
    algebra, maintained under streaming. History is never rescanned;
    per-epoch state is the batch's day-cardinality, not its row count.

    Epoch-keyed overwrite (the neardup_ingest_stream recipe) makes
    crash replays idempotent, and the commutative-monoid property —
    hypothesis-tested for merge_additive — guarantees the merged result
    is bit-identical to the one-pass batch rollup regardless of how
    arrival split the batches, so the catalog entry carries an EXACT
    full-recompute oracle.
    """
    import os

    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_path)
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = batch_df.groupBy(
            F.to_date(F.col("o_orderdate").cast("timestamp")).alias("day")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents"),
        )
        partial.write.mode("overwrite").parquet(
            os.path.join(rollup_dir, f"epoch={int(epoch_id)}")
        )

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def epoch_batch_ts(epoch_id: int) -> str:
    """Deterministic SCD2 version timestamp for a micro-batch: epoch 0
    -> '2024-01-01 00:00:00', one day per epoch with REAL date
    arithmetic (epoch 31 rolls into '2024-02-01', never '2024-01-32').
    Day-granular and epoch-derived so a crash-recovered stream replays
    identical version timestamps."""
    day = datetime.date(2024, 1, 1) + datetime.timedelta(days=int(epoch_id))
    return f"{day.isoformat()} 00:00:00"


def scd2_dim_stream(
    spark: SparkSession,
    batches_path: str,
    dim_dir: str,
    checkpoint_dir: str,
    key: str,
    tracked: list[str],
    schema: str,
    max_files_per_trigger: int = 1,
):
    """Streaming SCD Type 2 dimension maintenance: each micro-batch of
    attribute updates is applied to the persisted versioned dimension
    with `operators/scd2.scd2_apply` (close changed versions, open new
    ones, leave history immutable), and the new dimension lands as the
    next epoch directory with a `_CURRENT` pointer — the versioned-
    parquet atomic-swap recipe `lake.merge_trusted` uses.

    Idempotence under replay comes from SCD2 itself: re-applying an
    already-applied batch finds every fingerprint unchanged and
    re-versions nothing; the epoch-keyed output directory additionally
    makes the physical write replay-safe. batch_ts derives from the
    epoch id, so a recovered stream assigns identical version
    timestamps. Parity with sequential batch application is asserted in
    test_streaming.py.
    """
    import os

    from ..operators.scd2 import scd2_apply, scd2_init

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(batches_path)
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bspark = batch_df.sparkSession
        batch_ts = epoch_batch_ts(epoch_id)
        pointer = os.path.join(dim_dir, "_CURRENT")
        if os.path.exists(pointer):
            with open(pointer) as fh:
                cur = fh.read().strip()
            dim = bspark.read.parquet(os.path.join(dim_dir, cur))
            new_dim = scd2_apply(dim, batch_df, key, tracked, batch_ts)
        else:
            new_dim = scd2_init(batch_df, batch_ts)
        target = f"epoch={int(epoch_id)}"
        new_dim.write.mode("overwrite").parquet(os.path.join(dim_dir, target))
        tmp = pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(target)
        os.replace(tmp, pointer)  # atomic pointer swap

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
