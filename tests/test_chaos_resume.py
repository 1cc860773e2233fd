"""Chaos test (round-9 order 8): SIGKILL the driver mid-ResyncPipeline.

The existing crash-resume coverage raises an exception INSIDE the
process — it cannot produce the torn states an actual dead driver can:
a slice whose parquet write committed but whose manifest append never
ran (resume re-extracts it -> duplicate rows in WORK), or in-flight
task files under ``_temporary``. This test produces those states for
real: a child process runs the sequential pipeline at sf0.1 (the larger
local SF), the parent watches the slice manifest and SIGKILLs the whole
process group mid-window, then a fresh run resumes from the manifest.

The asserted invariant is the one the engine actually promises:
**TRUSTED after crash+resume+merge is row-identical to TRUSTED from an
uninterrupted run** — WORK is at-least-once by design (slice re-runs
can duplicate), and the sk-keyed deterministic merge is what makes the
end state exactly-once. The resume itself must also skip at least the
manifest-recorded slices instead of re-extracting the window.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import signal
import subprocess
import sys
import textwrap
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_complete_with_spark_spark.lake import Lake
from etl_complete_with_spark_spark.pipeline import ResyncConfig, ResyncPipeline
from etl_complete_with_spark_spark.sources import ParquetSource

SF_DIR = "/root/testdata/sf0.1"  # order 8 asks for the larger SF
BATCH_TS = dt.datetime(2026, 1, 1, 0, 0, 0)

CHILD = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from etl_complete_with_spark_spark.lake import Lake
    from etl_complete_with_spark_spark.pipeline import ResyncConfig, ResyncPipeline
    from etl_complete_with_spark_spark.session import get_spark
    from etl_complete_with_spark_spark.sources import ParquetSource

    cfg = ResyncConfig(namespace="chaos", dataset="events",
                       partition_column="event_id", mode="int", start=0,
                       end={end}, amount={amount}, max_retries=2)
    spark = get_spark(app_name="chaos-child", master="local[4]",
                      shuffle_partitions=4)
    src = ParquetSource({events!r}, "event_id")
    pipe = ResyncPipeline(src, Lake({lake!r}), cfg)
    pipe.run(spark, parallel=False)
    spark.stop()
    """
)


def _cfg(end: int, amount: int) -> ResyncConfig:
    return ResyncConfig(
        namespace="chaos",
        dataset="events",
        partition_column="event_id",
        mode="int",
        start=0,
        end=end,
        amount=amount,
        max_retries=2,
    )


def _manifest_entries(lake_dir: str) -> int:
    path = os.path.join(
        lake_dir, "production", "work", "chaos", "events", "_SLICES.json"
    )
    try:
        with open(path, "rb") as fh:
            content = fh.read()
        # the manifest rides Lake._write_pointer's self-verifying frame
        value = Lake._unframe(content)
        return len(json.loads(value if value is not None else content.decode()))
    except Exception:
        return 0


def _trusted_rows(spark, lake_dir: str, pipe: ResyncPipeline):
    out = pipe.transform_and_merge(spark, ["event_id"], batch_ts=BATCH_TS)
    return sorted(tuple(r) for r in out.collect())


def test_sigkill_mid_run_then_resume_matches_uninterrupted(spark, tmp_path):
    events = os.path.join(SF_DIR, "events.parquet")
    n_events = spark.read.parquet(events).count()  # 100k, event_id 0..n-1
    # amount is the ESTIMATED ROWCOUNT feeding the int chunk tier
    # (slicing.chunk_ids_for_rowcount): 10_000 lands in the 5_000-wide
    # tier -> ~20 slice jobs, a multi-second kill window
    amount = 10_000
    end = n_events

    # ---- reference: uninterrupted run in this session -----------------
    ref_lake = str(tmp_path / "lake_ref")
    ref_pipe = ResyncPipeline(
        ParquetSource(events, "event_id"), Lake(ref_lake), _cfg(end, amount)
    )
    ref_pipe.run(spark, parallel=False)
    ref_rows = _trusted_rows(spark, ref_lake, ref_pipe)
    assert ref_rows

    # ---- chaos: child process killed mid-window -----------------------
    chaos_lake = str(tmp_path / "lake_chaos")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "chaos_child.py"
    script.write_text(
        CHILD.format(repo=repo, events=events, lake=chaos_lake, end=end,
                     amount=amount)
    )
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    child = subprocess.Popen(
        [sys.executable, str(script)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # kill the JVM with the driver
        env=env,
    )
    try:
        deadline = time.time() + 180
        killed = False
        while time.time() < deadline:
            done = _manifest_entries(chaos_lake)
            if done >= 3:
                # mid-window: >=3 slices committed, >=1 still to go
                os.killpg(child.pid, signal.SIGKILL)
                killed = True
                break
            if child.poll() is not None:
                break
            time.sleep(0.05)
        assert killed, "child finished before the kill window (raise slice count)"
    finally:
        if child.poll() is None:
            os.killpg(child.pid, signal.SIGKILL)
        child.wait(timeout=60)

    committed = _manifest_entries(chaos_lake)
    assert committed >= 3

    # ---- resume in a fresh driver (this session) ----------------------
    chaos_pipe = ResyncPipeline(
        ParquetSource(events, "event_id"), Lake(chaos_lake), _cfg(end, amount)
    )
    res = chaos_pipe.run(spark, parallel=False)
    assert res.status == "success"
    assert len(res.skipped) >= committed  # manifest slices not re-extracted

    # ---- the promise: TRUSTED is exactly-once despite the torn WORK ---
    chaos_rows = _trusted_rows(spark, chaos_lake, chaos_pipe)
    assert chaos_rows == ref_rows


MERGE_CHILD = textwrap.dedent(
    """
    import datetime as dt
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import Row
    from etl_complete_with_spark_spark.lake import Lake
    from etl_complete_with_spark_spark.session import get_spark

    spark = get_spark(app_name="chaos-merge-child", master="local[4]",
                      shuffle_partitions=4)
    lake = Lake({lake!r})
    for i in range(200):
        df = spark.createDataFrame([
            Row(sk="a", v=i,
                timestamp_kafka=dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i)),
        ])
        lake.merge_trusted(spark, df, "chaos", "kv")
    spark.stop()
    """
)


def test_sigkill_mid_merge_leaves_consistent_trusted(spark, tmp_path):
    """Kill the driver while it is mid-`merge_trusted` (new version dir
    being written / pointer being swapped). The versioned-parquet merge
    promises: TRUSTED always reads as SOME complete committed snapshot.
    The merge batches make torn states self-evident — batch i sets the
    single key's value to i and lands as version v{{i}} — so after the
    kill, the value read MUST equal the version the pointer names."""
    lake_dir = str(tmp_path / "lake_merge")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "merge_child.py"
    script.write_text(MERGE_CHILD.format(repo=repo, lake=lake_dir))
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    child = subprocess.Popen(
        [sys.executable, str(script)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
        env=env,
    )
    base = os.path.join(lake_dir, "production", "trusted", "chaos", "kv")

    def versions_on_disk() -> int:
        try:
            return sum(
                1 for d in os.listdir(base)
                if d.startswith("v") and d[1:].isdigit()
            )
        except FileNotFoundError:
            return 0

    try:
        deadline = time.time() + 180
        killed = False
        while time.time() < deadline:
            if versions_on_disk() >= 4:
                # several merges committed; the next one is in flight —
                # the kill lands mid-write or mid-swap
                os.killpg(child.pid, signal.SIGKILL)
                killed = True
                break
            if child.poll() is not None:
                break
            time.sleep(0.02)
        assert killed, "merge child finished before the kill window"
    finally:
        if child.poll() is None:
            os.killpg(child.pid, signal.SIGKILL)
        child.wait(timeout=60)

    from etl_complete_with_spark_spark.lake import Lake

    lake = Lake(lake_dir)
    # the pointer (or its .tmp sibling) must resolve and the snapshot it
    # names must be complete: the value equals the version number
    current = lake._trusted_current(spark, "chaos", "kv")
    assert current is not None
    version = int(os.path.basename(current)[1:])
    rows = lake.read_trusted(spark, "chaos", "kv").collect()
    assert len(rows) == 1
    assert rows[0]["v"] == version
    # and the lake remains writable: the next merge lands as usual
    import datetime as dt_

    from pyspark.sql import Row

    lake.merge_trusted(
        spark,
        spark.createDataFrame(
            [Row(sk="a", v=999, timestamp_kafka=dt_.datetime(2026, 2, 1))]
        ),
        "chaos",
        "kv",
    )
    after = lake.read_trusted(spark, "chaos", "kv").collect()
    assert len(after) == 1 and after[0]["v"] == 999


STREAM_CHILD = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from etl_complete_with_spark_spark.lake import Lake
    from etl_complete_with_spark_spark.session import get_spark
    from etl_complete_with_spark_spark.streaming.ingest import (
        stream_source, stream_upsert_to_trusted,
    )

    spark = get_spark(app_name="chaos-stream-child", master="local[4]",
                      shuffle_partitions=4)
    stream = stream_source(spark, {src!r}, max_files_per_trigger=1)
    q = stream_upsert_to_trusted(
        stream, Lake({lake!r}), "chaos", "events", ["event_id"], {ckpt!r}
    ).start()
    q.awaitTermination()
    """
)


def test_sigkill_mid_stream_then_restart_is_exactly_once(spark, tmp_path):
    """The streaming leg of the chaos trilogy: SIGKILL the streaming
    driver mid-micro-batch (merge committed but checkpoint offset not,
    or vice versa), restart from the SAME checkpoint, drain. Spark
    replays the in-flight batch; the sk-merge absorbs the replay —
    TRUSTED must equal the batch pipeline's answer over the same files,
    with no duplicates and no gaps."""
    import shutil

    # 12 single-file micro-batches over sf0.1 events
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    events.repartition(12).write.mode("overwrite").parquet(
        str(tmp_path / "slices")
    )
    n = 0
    for f in sorted((tmp_path / "slices").glob("part-*.parquet")):
        shutil.copy(f, src_dir / f.name)
        n += 1
    assert n == 12

    lake_dir = str(tmp_path / "lake_stream")
    ckpt = str(tmp_path / "ckpt")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "stream_child.py"
    script.write_text(
        STREAM_CHILD.format(repo=repo, src=str(src_dir), lake=lake_dir, ckpt=ckpt)
    )
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    child = subprocess.Popen(
        [sys.executable, str(script)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
        env=env,
    )
    base = os.path.join(lake_dir, "production", "trusted", "chaos", "events")

    def versions() -> int:
        try:
            return sum(
                1 for d in os.listdir(base)
                if d.startswith("v") and d[1:].isdigit()
            )
        except FileNotFoundError:
            return 0

    try:
        deadline = time.time() + 240
        killed = False
        while time.time() < deadline:
            if versions() >= 4:
                os.killpg(child.pid, signal.SIGKILL)
                killed = True
                break
            if child.poll() is not None:
                break
            time.sleep(0.02)
        assert killed, "stream child drained before the kill window"
    finally:
        if child.poll() is None:
            os.killpg(child.pid, signal.SIGKILL)
        child.wait(timeout=60)

    # restart from the SAME checkpoint in this session; drain and stop
    from etl_complete_with_spark_spark.lake import Lake as _Lake
    from etl_complete_with_spark_spark.streaming.ingest import (
        stream_source,
        stream_upsert_to_trusted,
    )

    stream = stream_source(spark, str(src_dir), max_files_per_trigger=1)
    q = stream_upsert_to_trusted(
        stream, _Lake(lake_dir), "chaos", "events", ["event_id"], ckpt
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    trusted = _Lake(lake_dir).read_trusted(spark, "chaos", "events")
    # exactly-once per event: batch_ts differs between driver sessions,
    # so compare on everything EXCEPT the batch timestamp
    cols = [c for c in trusted.columns if c != "timestamp_kafka"]
    got = sorted(tuple(r) for r in trusted.select(*cols).collect())
    from etl_complete_with_spark_spark.operators.transforms import (
        work_to_trusted_transform,
    )

    ref = work_to_trusted_transform(
        spark.read.parquet(str(src_dir)), ["event_id"],
        deterministic_dedup=True,
    )
    want = sorted(tuple(r) for r in ref.select(*cols).collect())
    assert len(got) == events.count()
    assert got == want
