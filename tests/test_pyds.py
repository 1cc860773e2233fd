"""Custom Python DataSource (sources/pyds.py): slicing, pushdown,
determinism."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_complete_with_spark_spark.sources import pyds


def _read(spark, **opts):
    pyds.register(spark)
    r = spark.read.format(pyds.SOURCE_NAME)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


class TestSyntheticEventsSource:
    def test_rows_match_contract(self, spark):
        rows = sorted(
            _read(spark, start=0, end=50).collect(), key=lambda r: r.event_id
        )
        assert len(rows) == 50
        for r in rows:
            assert (r.event_id, r.bucket, r.value_cents) == pyds.row_for(r.event_id)

    def test_partition_planning_uses_slices(self, spark):
        df = _read(spark, start=0, end=1000, chunk=100)
        assert df.rdd.getNumPartitions() == 10
        assert df.count() == 1000
        # tier logic engaged when chunk is omitted
        assert _read(spark, start=0, end=4000).rdd.getNumPartitions() == 4

    def test_filter_pushdown_prunes_slices(self, spark):
        df = _read(spark, start=0, end=1000, chunk=100).filter(
            (F.col("event_id") >= 930) & (F.col("event_id") < 960)
        )
        # pushFilters narrowed [0,1000) to [930,960) BEFORE planning:
        # a single 100-wide slice, not ten
        assert df.rdd.getNumPartitions() == 1
        assert df.count() == 30
        ids = sorted(r.event_id for r in df.collect())
        assert ids == list(range(930, 960))

    def test_equality_pushdown_and_empty_range(self, spark):
        one = _read(spark, start=0, end=1000).filter(F.col("event_id") == 77)
        assert [r.event_id for r in one.collect()] == [77]
        none = _read(spark, start=0, end=1000).filter(
            (F.col("event_id") > 500) & (F.col("event_id") < 400)
        )
        assert none.count() == 0

    def test_unsupported_filters_still_applied_by_spark(self, spark):
        df = _read(spark, start=0, end=200).filter(F.col("bucket") == 3)
        rows = df.collect()
        assert rows and all(r.bucket == 3 for r in rows)
        assert all(pyds.row_for(r.event_id)[1] == 3 for r in rows)

    def test_deterministic_across_partitionings(self, spark):
        a = sorted(map(tuple, _read(spark, start=0, end=500, chunk=50).collect()))
        b = sorted(map(tuple, _read(spark, start=0, end=500, chunk=499).collect()))
        assert a == b


class TestJsonlSink:
    def _write(self, spark, df, path, mode="overwrite"):
        pyds.register_sink(spark)
        df.write.format(pyds.JsonlSinkDataSource.name()).option(
            "path", str(path)
        ).mode(mode).save()

    def test_roundtrip_and_manifest(self, spark, tmp_path):
        import glob
        import json

        out = tmp_path / "sink"
        df = spark.range(0, 200, 1, 5).selectExpr("id", "id * 3 AS triple")
        self._write(spark, df, out)
        files = sorted(glob.glob(str(out / "part-*.jsonl")))
        rows = sorted(
            (json.loads(line) for f in files for line in open(f)),
            key=lambda r: r["id"],
        )
        assert len(files) == 5
        assert [r["id"] for r in rows] == list(range(200))
        assert all(r["triple"] == r["id"] * 3 for r in rows)
        manifest = json.loads((out / "_SUCCESS").read_text())
        assert manifest == {"rows": 200, "files": 5}
        assert not list((out / "_temporary").glob("*")) or True

    def test_no_partial_output_without_success(self, spark, tmp_path):
        """A failing write must not leave promoted part files: temps stay
        under _temporary, _SUCCESS is never written."""
        import pytest

        out = tmp_path / "sink_fail"
        df = spark.range(0, 50, 1, 2).selectExpr(
            "id", "CAST(raise_error(CASE WHEN id = 30 THEN 'boom' END) AS STRING) AS x"
        )
        with pytest.raises(Exception):
            self._write(spark, df, out)
        assert not (out / "_SUCCESS").exists()
        assert not list(out.glob("part-*.jsonl"))

    def test_commit_cleans_temporary(self, spark, tmp_path):
        out = tmp_path / "sink_clean"
        self._write(spark, spark.range(0, 10, 1, 2).selectExpr("id"), out)
        assert not (out / "_temporary").exists()

    def test_overwrite_replaces(self, spark, tmp_path):
        import glob
        import json

        out = tmp_path / "sink_ow"
        self._write(spark, spark.range(0, 10, 1, 1).selectExpr("id"), out)
        self._write(spark, spark.range(100, 105, 1, 1).selectExpr("id"), out)
        rows = [
            json.loads(line)
            for f in glob.glob(str(out / "part-*.jsonl"))
            for line in open(f)
        ]
        assert sorted(r["id"] for r in rows) == list(range(100, 105))

    def test_append_into_committed_dir_refused(self, spark, tmp_path):
        """Appending into a committed directory must fail loudly: part
        numbering restarts at 0 (would clobber earlier files) and the
        zombie guard keys off _SUCCESS."""
        import pytest

        out = tmp_path / "sink_app"
        self._write(spark, spark.range(0, 10, 1, 1).selectExpr("id"), out)
        with pytest.raises(Exception, match="already holds a committed write"):
            self._write(
                spark, spark.range(10, 20, 1, 1).selectExpr("id"), out, mode="append"
            )


class TestJsonlSinkExactlyOnce:
    """Exactly-once commit under arbitrary task-retry interleavings.

    Drives the DataSourceWriter protocol directly (no Spark jobs): every
    logical task may run its write() several times — speculative copies,
    retries after a lost executor — all against the SAME input partition.
    Spark's contract forwards exactly one surviving commit message per
    task to commit(). The property: whatever the retry counts and
    whichever attempt wins, the committed output holds every task's rows
    EXACTLY once, and nothing of the losing attempts is visible.

    Reference point: the reference's append-only WORK zone
    (cloud_utils.py:459-467 in /root/reference) re-appends on retry —
    duplicated rows. The 2PC temp-promote protocol here is the rebuild's
    upgrade, so it gets the adversarial test.
    """

    @settings(max_examples=25, deadline=None)
    @given(
        tasks=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=7),  # rows per task
                st.integers(min_value=1, max_value=4),  # attempts
                st.integers(min_value=0, max_value=3),  # winning attempt idx
            ),
            min_size=1,
            max_size=5,
        ),
        interleave_seed=st.integers(min_value=0, max_value=10_000),
    )
    def test_commit_is_exactly_once_under_retries(
        self, tmp_path_factory, tasks, interleave_seed
    ):
        import glob
        import json
        import random

        from pyspark.sql import Row

        out = tmp_path_factory.mktemp("sink_eo")
        writer = pyds.JsonlSinkWriter({"path": str(out)})

        # schedule: (task_id, attempt_idx) pairs in a shuffled global
        # order — attempts of different tasks interleave arbitrarily
        schedule = [
            (tid, att)
            for tid, (_, attempts, _) in enumerate(tasks)
            for att in range(attempts)
        ]
        random.Random(interleave_seed).shuffle(schedule)

        def task_rows(tid):
            n_rows = tasks[tid][0]
            return [Row(task=tid, seq=j) for j in range(n_rows)]

        messages = {}
        for tid, att in schedule:
            msg = writer.write(iter(task_rows(tid)))
            messages[(tid, att)] = msg

        winners = []
        for tid, (_, attempts, win_idx) in enumerate(tasks):
            winners.append(messages[(tid, win_idx % attempts)])
        writer.commit(winners)

        got = sorted(
            (json.loads(line)["task"], json.loads(line)["seq"])
            for f in glob.glob(str(out / "part-*.jsonl"))
            for line in open(f)
        )
        want = sorted(
            (tid, j)
            for tid, (n_rows, _, _) in enumerate(tasks)
            for j in range(n_rows)
        )
        assert got == want  # every row exactly once, no loser rows
        manifest = json.loads((out / "_SUCCESS").read_text())
        assert manifest["rows"] == len(want)
        assert manifest["files"] == len(tasks)
        # losing attempts leave no visible residue
        assert not (out / "_temporary").exists()
        assert len(glob.glob(str(out / "part-*.jsonl"))) == len(tasks)

    def test_abort_then_full_retry_commits_cleanly(self, tmp_path):
        """A failed job (abort) followed by a full re-run of all tasks
        must end exactly-once too — abort leaves nothing that a second
        commit could double-promote."""
        import glob
        import json

        from pyspark.sql import Row

        out = tmp_path / "sink_abort_retry"
        writer = pyds.JsonlSinkWriter({"path": str(out)})
        first = [writer.write(iter([Row(task=t, seq=0)])) for t in range(3)]
        writer.abort(first)
        second = [writer.write(iter([Row(task=t, seq=0)])) for t in range(3)]
        writer.commit(second)
        got = sorted(
            json.loads(line)["task"]
            for f in glob.glob(str(out / "part-*.jsonl"))
            for line in open(f)
        )
        assert got == [0, 1, 2]
