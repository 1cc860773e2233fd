"""Interleaved ABAB for pack_training_shards (round-9 order 2).

Settles the one open r8 gate flag: the driver's r8 artifact read
pack_training_shards at 1.85 CPU s/run vs a 0.93 baseline (+98.9%),
adjudicated "box noise" on a single confirm re-time. Git shows the
operator the query consumes (pack_chunks_into_shards) was NOT touched by
the r8 global_row_ranks rewrite — the plan is byte-identical across
rounds — so the experiment here is (a) repeated interleaved re-times of
the query itself to characterize its same-plan spread, and (b) an
honest A/B of the retired checkpoint+collect doc-offset shape (A,
inlined below verbatim from the pre-r9 operator) against the round-9
one-job reused-exchange shape (B, the committed code), canary co-timed
so box drift between segments is visible.

Method matches bench.py's CPU confirm pass: one unmeasured JVM+Python
warmup, executorCpuTime deltas over quiesced UI totals, 2 runs per
sample, A/B alternated so slow-box minutes hit both arms equally.

Usage::

    python scripts/ab_pack_shards.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

import bench
from etl_complete_with_spark_spark.operators.chunking import chunk_documents
from etl_complete_with_spark_spark.operators.packing import (
    _offset_lookup,
    pack_chunks_into_shards,
)
from etl_complete_with_spark_spark.queries import QUERIES, load
from etl_complete_with_spark_spark.session import get_spark


def _pack_old(chunks, shard_tokens, doc_col="doc_id", idx_col="chunk_idx",
              token_col="n_tokens", num_range_partitions=32):
    """The pre-round-9 shape, verbatim: range-partitioned doc totals
    pinned with localCheckpoint, per-partition totals collected to the
    driver (one long per partition), literal-array offsets."""
    doc_tot = chunks.groupBy(doc_col).agg(
        F.sum(token_col).cast("long").alias("doc_tokens")
    )
    ranged = doc_tot.repartitionByRange(
        num_range_partitions, F.col(doc_col)
    ).withColumn("__pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=False)
    part_totals = (
        ranged.groupBy("__pid").agg(F.sum("doc_tokens").alias("t")).collect()
    )
    offsets, acc = {}, 0
    for row in sorted(part_totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["t"]
    off_arr = _offset_lookup(offsets, ranged.rdd.getNumPartitions())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(doc_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    doc_off = (
        ranged.withColumn(
            "doc_offset",
            (
                F.element_at(off_arr, F.col("__pid") + 1)
                + F.coalesce(F.sum("doc_tokens").over(w_local), F.lit(0))
            ).cast("long"),
        )
        .select(doc_col, "doc_offset")
    )
    w_doc = (
        Window.partitionBy(doc_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        chunks.join(doc_off, doc_col)
        .withColumn(
            "chunk_offset",
            (
                F.col("doc_offset")
                + F.coalesce(F.sum(token_col).over(w_doc), F.lit(0))
            ).cast("long"),
        )
        .withColumn("shard_id", F.expr(f"chunk_offset DIV {int(shard_tokens)}"))
        .select(doc_col, idx_col, F.col(token_col), "chunk_offset", "shard_id")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="ab-pack-shards", extra_conf=bench._UI_CONF)

    def chunks():
        return chunk_documents(
            load(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
        ).select(
            "doc_id", "chunk_idx", F.col("n_tokens").cast("long").alias("n_tokens")
        )

    arms = {
        "A_pinned_collect": lambda: _pack_old(chunks(), 512),
        "B_reused_exchange": lambda: pack_chunks_into_shards(chunks(), 512),
    }

    def measure(build) -> float | None:
        before = bench._quiesced_totals(spark)
        for _ in range(2):
            build().write.format("noop").mode("overwrite").save()
        after = bench._quiesced_totals(spark)
        if before is None or after is None:
            return None
        return round((after[4] - before[4]) / 2 / 1e9, 3)

    try:
        canary_start = bench._box_canary_mem(spark)
        # unmeasured warmup: JVM core paths + the catalog query itself
        # once (page cache for documents.parquet, codegen both shapes)
        QUERIES["agg_pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for build in arms.values():
            build().write.format("noop").mode("overwrite").save()

        samples: dict[str, list[float]] = {k: [] for k in arms}
        samples["catalog_query"] = []
        for _ in range(reps):
            for name, build in arms.items():
                v = measure(build)
                if v is not None:
                    samples[name].append(v)
            # the registered catalog query, exactly as the driver times it
            v = measure(lambda: QUERIES["pack_training_shards"](spark, sf_dir))
            if v is not None:
                samples["catalog_query"].append(v)
        canary_end = bench._box_canary_mem(spark)
    finally:
        spark.stop()

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "metric": "executor_cpu_sec_per_run",
        "canary_mem_start_cpu_s": canary_start,
        "canary_mem_end_cpu_s": canary_end,
        "samples": samples,
        "min": {k: (min(v) if v else None) for k, v in samples.items()},
        "median": {
            k: (sorted(v)[len(v) // 2] if v else None) for k, v in samples.items()
        },
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
