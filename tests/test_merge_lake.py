"""Merge-upsert + lake zone tests (SURVEY §2.2 K1/K2, §2.4)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from etl_complete_with_spark_spark.lake import Lake
from etl_complete_with_spark_spark.operators.merge import merge_upsert


def _rows(batch_ts, *pairs):
    return [Row(sk=k, v=v, timestamp_kafka=batch_ts) for k, v in pairs]


class TestMergeUpsert:
    def test_matched_update_not_matched_insert(self, spark):
        t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
        target = spark.createDataFrame(_rows(t0, ("a", 1), ("b", 2)))
        source = spark.createDataFrame(_rows(t1, ("b", 20), ("c", 30)))
        out = {r.sk: r.v for r in merge_upsert(target, source).collect()}
        assert out == {"a": 1, "b": 20, "c": 30}

    def test_source_internal_dedup_latest_wins(self, spark):
        target = spark.createDataFrame(_rows(dt.datetime(2024, 1, 1), ("a", 1)))
        source = spark.createDataFrame(
            _rows(dt.datetime(2024, 1, 2), ("a", 10))
            + _rows(dt.datetime(2024, 1, 3), ("a", 99))
        )
        out = merge_upsert(target, source).collect()
        assert len(out) == 1 and out[0].v == 99

    def test_idempotent_reapply(self, spark):
        t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
        target = spark.createDataFrame(_rows(t0, ("a", 1), ("b", 2)))
        source = spark.createDataFrame(_rows(t1, ("b", 20), ("c", 30)))
        once = merge_upsert(target, source)
        twice = merge_upsert(once, source)
        assert sorted((r.sk, r.v) for r in twice.collect()) == sorted(
            (r.sk, r.v) for r in once.collect()
        )

    def test_column_mismatch_rejected(self, spark):
        target = spark.createDataFrame([Row(sk="a", v=1)])
        source = spark.createDataFrame([Row(sk="a", other=1)])
        with pytest.raises(ValueError):
            merge_upsert(target, source, order_by=None)


class TestLake:
    def test_work_append_and_readback(self, spark, tmp_path):
        lake = Lake(str(tmp_path))
        df = spark.createDataFrame([Row(a=1), Row(a=2)])
        lake.write_work(df, "ns", "ds")
        lake.write_work(df, "ns", "ds")  # append mode
        assert lake.read_work(spark, "ns", "ds").count() == 4
        lake.clear_work(spark, "ns", "ds")

    def test_trusted_merge_versions_and_idempotency(self, spark, tmp_path):
        lake = Lake(str(tmp_path))
        t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
        lake.merge_trusted(spark, spark.createDataFrame(_rows(t0, ("a", 1), ("b", 2))), "ns", "ds")
        lake.merge_trusted(spark, spark.createDataFrame(_rows(t1, ("b", 20), ("c", 30))), "ns", "ds")
        out = {r.sk: r.v for r in lake.read_trusted(spark, "ns", "ds").collect()}
        assert out == {"a": 1, "b": 20, "c": 30}
        # re-running the same slice must not duplicate (sk-merge absorbs it)
        lake.merge_trusted(spark, spark.createDataFrame(_rows(t1, ("b", 20), ("c", 30))), "ns", "ds")
        assert lake.read_trusted(spark, "ns", "ds").count() == 3

    def test_trusted_schema_reflection(self, spark, tmp_path):
        lake = Lake(str(tmp_path))
        lake.merge_trusted(spark, spark.createDataFrame(_rows(dt.datetime(2024, 1, 1), ("a", 1))), "ns", "ds")
        assert set(lake.trusted_schema(spark, "ns", "ds").fieldNames()) == {
            "sk", "v", "timestamp_kafka",
        }


class TestTimeTravel:
    def test_version_reads_and_vacuum(self, spark, tmp_path):
        import datetime as dt

        lake = Lake(str(tmp_path))
        for day, rows in [(1, [("a", 1)]), (2, [("a", 10), ("b", 2)]), (3, [("c", 3)])]:
            lake.merge_trusted(
                spark,
                spark.createDataFrame(_rows(dt.datetime(2024, 1, day), *rows)),
                "ns", "ds",
            )
        assert lake.trusted_versions(spark, "ns", "ds") == [0, 1, 2]
        v0 = {r.sk: r.v for r in lake.read_trusted(spark, "ns", "ds", version=0).collect()}
        v1 = {r.sk: r.v for r in lake.read_trusted(spark, "ns", "ds", version=1).collect()}
        latest = {r.sk: r.v for r in lake.read_trusted(spark, "ns", "ds").collect()}
        assert v0 == {"a": 1}
        assert v1 == {"a": 10, "b": 2}
        assert latest == {"a": 10, "b": 2, "c": 3}
        removed = lake.vacuum_trusted(spark, "ns", "ds", keep=2)
        assert removed == [0]
        assert lake.trusted_versions(spark, "ns", "ds") == [1, 2]
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError):
            lake.read_trusted(spark, "ns", "ds", version=0)


class TestPartitionedWorkAndCompaction:
    def test_partitioned_write_prunes_scan(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from etl_complete_with_spark_spark import plans as P

        lake = Lake(str(tmp_path))
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "bucket", (F.col("event_id") % 4).cast("int")
        )
        lake.write_work(ev, "ns", "ev", partition_by=["bucket"])
        scan = lake.read_work(spark, "ns", "ev").filter(F.col("bucket") == 2)
        plan = P.formatted_plan(scan)
        assert "PartitionFilters" in plan and "bucket" in plan
        assert scan.count() == ev.filter("event_id % 4 = 2").count()

    def test_compaction_preserves_data(self, spark, sf_dir, tmp_path):
        import glob
        import os

        lake = Lake(str(tmp_path))
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        for lo, hi in [(0, 300), (300, 600), (600, 10_000)]:
            lake.write_work(ev.filter(f"event_id >= {lo} and event_id < {hi}"), "ns", "ev")
        work_dir = lake.path("work", "ns", "ev")
        # the sequential-resume manifest must survive compaction
        manifest = os.path.join(work_dir, "_SLICES.json")
        with open(manifest, "w") as f:
            f.write('{"done": [1, 2, 3]}')
        n_data_files = len(
            [p for p in glob.glob(f"{work_dir}/**/*.parquet", recursive=True)]
        )
        before_rows = lake.read_work(spark, "ns", "ev").count()
        before = lake.compact_work(spark, "ns", "ev", target_files=2)
        assert before == n_data_files  # documented: file count, not partitions
        after = lake.read_work(spark, "ns", "ev")
        assert after.count() == before_rows
        assert after.rdd.getNumPartitions() <= 2
        with open(manifest) as f:
            assert f.read() == '{"done": [1, 2, 3]}'
        # no leftover temp/parked dirs from the swap
        assert glob.glob(f"{work_dir}__*") == []


class TestSchemaEvolution:
    def test_mergeschema_surfaces_added_column(self, spark, sf_dir, tmp_path):
        """A source that grows a column mid-resync: slice 2 carries
        `channel`, slice 1 doesn't. merge_schema=True unions the footers
        (old rows NULL); default read keeps the fast single-footer path."""
        from pyspark.sql import functions as F

        lake = Lake(str(tmp_path))
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        lake.write_work(ev.filter("event_id < 300"), "ns", "ev_evolve")
        lake.write_work(
            ev.filter("event_id >= 300 and event_id < 600").withColumn(
                "channel", F.lit("web")
            ),
            "ns",
            "ev_evolve",
        )
        merged = lake.read_work(spark, "ns", "ev_evolve", merge_schema=True)
        assert "channel" in merged.columns
        assert merged.count() == 600
        assert merged.filter("channel IS NULL").count() == 300
        assert merged.filter("channel = 'web'").count() == 300


class FakeDeltaTable:
    """DeltaTable stand-in: a 'Delta table' is parquet files plus a
    ``_delta_log/`` marker dir (underscore-prefixed paths are invisible to
    Spark's parquet FileIndex, same trick real Delta relies on). The
    fluent merge chain applies merge_upsert over the parquet — the
    whenMatchedUpdateAll + whenNotMatchedInsertAll semantics — so the
    orchestration in Lake.merge_trusted runs for real end-to-end."""

    def __init__(self, spark, path):
        self._spark, self._path = spark, path
        self._source = self._cond = None
        self.calls: list[str] = []

    # -- classmethods the lake code calls ---------------------------------
    @classmethod
    def isDeltaTable(cls, spark, path):
        import os

        return os.path.isdir(os.path.join(path, "_delta_log"))

    @classmethod
    def forPath(cls, spark, path):
        return cls(spark, path)

    # -- fluent chain ------------------------------------------------------
    def alias(self, name):
        self.calls.append(f"alias:{name}")
        return self

    def merge(self, source, cond):
        self.calls.append(f"merge:{cond}")
        self._source, self._cond = source, cond
        return self

    def whenMatchedUpdateAll(self):
        self.calls.append("whenMatchedUpdateAll")
        return self

    def whenNotMatchedInsertAll(self):
        self.calls.append("whenNotMatchedInsertAll")
        return self

    def execute(self):
        import re
        import shutil
        import tempfile

        self.calls.append("execute")
        key = re.fullmatch(r"lake\.(\w+) = df\.\1", self._cond).group(1)
        target = self._spark.read.parquet(self._path)
        merged = merge_upsert(target, self._source, key=key, order_by=None)
        # materialize before overwriting what we read from
        tmp = tempfile.mkdtemp(prefix="fake_delta_")
        merged.write.mode("overwrite").parquet(tmp)
        self._spark.read.parquet(tmp).write.mode("overwrite").parquet(self._path)
        FakeDeltaTable._mark(self._path)
        shutil.rmtree(tmp, ignore_errors=True)

    @staticmethod
    def _mark(path):
        import os

        os.makedirs(os.path.join(path, "_delta_log"), exist_ok=True)


def _fake_write_delta(self, df, path):
    """Stub for the one real format("delta") write: like Delta, it must be
    ADDITIVE at `path` — a physical parquet overwrite would delete the old
    versioned layout (v0/...) before the lazy merge plan reads it. So:
    materialize to a tmp dir first, then swap the data files in."""
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="fake_delta_write_")
    df.write.mode("overwrite").parquet(tmp)
    os.makedirs(path, exist_ok=True)
    for old in glob.glob(os.path.join(path, "*.parquet")):
        os.remove(old)
    for f in glob.glob(os.path.join(tmp, "*.parquet")):
        shutil.move(f, os.path.join(path, os.path.basename(f)))
    FakeDeltaTable._mark(path)
    shutil.rmtree(tmp, ignore_errors=True)


class TestDeltaBranch:
    """Runs the Delta orchestration of Lake.merge_trusted (gated off in
    this image: delta-spark absent) behind FakeDeltaTable. Only the
    physical `format("delta")` write is stubbed (to parquet + marker);
    every branch decision, merge call, and the versioned-parquet->Delta
    migration runs for real."""

    @pytest.fixture()
    def delta_lake(self, monkeypatch, tmp_path):
        import etl_complete_with_spark_spark.lake as lake_mod

        monkeypatch.setattr(lake_mod, "_HAS_DELTA", True)
        monkeypatch.setattr(lake_mod, "DeltaTable", FakeDeltaTable)

        monkeypatch.setattr(lake_mod.Lake, "_write_delta", _fake_write_delta)
        return Lake(str(tmp_path))

    def test_first_write_lands_as_delta(self, spark, delta_lake):
        t0 = dt.datetime(2024, 1, 1)
        delta_lake.merge_trusted(
            spark, spark.createDataFrame(_rows(t0, ("a", 1), ("b", 2))), "ns", "ds"
        )
        base = delta_lake.path("trusted", "ns", "ds")
        assert FakeDeltaTable.isDeltaTable(spark, base)
        out = {r.sk: r.v for r in spark.read.parquet(base).collect()}
        assert out == {"a": 1, "b": 2}

    def test_existing_delta_table_gets_fluent_merge(self, spark, delta_lake):
        t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
        delta_lake.merge_trusted(
            spark, spark.createDataFrame(_rows(t0, ("a", 1), ("b", 2))), "ns", "ds"
        )
        delta_lake.merge_trusted(
            spark, spark.createDataFrame(_rows(t1, ("b", 20), ("c", 30))), "ns", "ds"
        )
        base = delta_lake.path("trusted", "ns", "ds")
        out = {r.sk: r.v for r in spark.read.parquet(base).collect()}
        assert out == {"a": 1, "b": 20, "c": 30}

    def test_versioned_parquet_migrates_to_delta_once(
        self, spark, monkeypatch, tmp_path
    ):
        import os

        import etl_complete_with_spark_spark.lake as lake_mod

        # 1. seed a versioned-parquet table with Delta OFF (the fallback)
        lake = Lake(str(tmp_path))
        t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
        lake.merge_trusted(
            spark, spark.createDataFrame(_rows(t0, ("a", 1), ("b", 2))), "ns", "ds"
        )
        base = lake.path("trusted", "ns", "ds")
        assert os.path.exists(os.path.join(base, "_CURRENT"))

        # 2. delta "appears on the classpath"; next merge must MIGRATE
        monkeypatch.setattr(lake_mod, "_HAS_DELTA", True)
        monkeypatch.setattr(lake_mod, "DeltaTable", FakeDeltaTable)
        monkeypatch.setattr(lake_mod.Lake, "_write_delta", _fake_write_delta)
        lake.merge_trusted(
            spark, spark.createDataFrame(_rows(t1, ("b", 20), ("c", 30))), "ns", "ds"
        )

        # merged content, Delta layout, and the OLD layout fully dropped
        assert FakeDeltaTable.isDeltaTable(spark, base)
        out = {r.sk: r.v for r in spark.read.parquet(base).collect()}
        assert out == {"a": 1, "b": 20, "c": 30}
        assert not os.path.exists(os.path.join(base, "_CURRENT"))
        assert not any(d.startswith("v0") for d in os.listdir(base))

        # 3. and the merge AFTER migration takes the fluent-merge path
        t2 = dt.datetime(2024, 1, 3)
        lake.merge_trusted(
            spark, spark.createDataFrame(_rows(t2, ("c", 99), ("d", 4))), "ns", "ds"
        )
        out = {r.sk: r.v for r in spark.read.parquet(base).collect()}
        assert out == {"a": 1, "b": 20, "c": 99, "d": 4}


class TestCdcApply:
    def _feed(self, spark):
        return spark.createDataFrame(
            [
                # key 1: insert then update -> survives with v=11
                (1, 10, 0, "I"), (1, 11, 1, "U"),
                # key 2: insert then delete -> gone
                (2, 20, 0, "I"), (2, 20, 1, "D"),
                # key 3: insert, delete, re-insert -> survives with v=31
                (3, 30, 0, "I"), (3, 30, 1, "D"), (3, 31, 2, "I"),
                # key 4: bare delete (tombstone for unseen key) -> gone
                (4, 40, 0, "D"),
            ],
            "k long, v long, seq long, op string",
        )

    def test_latest_op_wins_and_deletes_drop(self, spark):
        from etl_complete_with_spark_spark.operators.merge import cdc_apply

        out = cdc_apply(self._feed(spark), ["k"]).collect()
        assert {(r.k, r.v) for r in out} == {(1, 11), (3, 31)}

    def test_seq_and_op_cols_dropped(self, spark):
        from etl_complete_with_spark_spark.operators.merge import cdc_apply

        out = cdc_apply(self._feed(spark), ["k"])
        assert out.columns == ["k", "v"]

    def test_no_global_window(self, spark):
        from etl_complete_with_spark_spark import plans as P
        from etl_complete_with_spark_spark.operators.merge import cdc_apply

        plan = P.physical_plan(cdc_apply(self._feed(spark), ["k"]))
        assert "partitionBy=[]" not in plan.replace(" ", "")


class TestCrashAtomicPointer:
    """Round-9 chaos follow-up: the TRUSTED version pointer and the slice
    manifest ride Lake._write_pointer, whose previous in-place
    create(overwrite=True) TRUNCATED the destination before writing — a
    driver killed in that window left an empty _CURRENT (TRUSTED
    unreadable) or a torn _SLICES.json (every later resume crashed in
    json.loads). The write-tmp-then-rename protocol + tmp-fallback
    reader must leave a complete old-or-new value at EVERY crash point;
    these tests lay each crash point's file state down directly."""

    def _ptr(self, tmp_path):
        return str(tmp_path / "_CURRENT")

    def test_normal_write_leaves_no_tmp_and_reads_back(self, spark, tmp_path):
        import os

        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        lake._write_pointer(spark, ptr, "v0")
        lake._write_pointer(spark, ptr, "v1")  # overwrite path
        assert lake._read_pointer(spark, ptr) == "v1"
        assert not os.path.exists(ptr + ".tmp")

    def test_die_mid_tmp_write_keeps_old_value(self, spark, tmp_path):
        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        lake._write_pointer(spark, ptr, "v0")
        # crash point: tmp torn, destination untouched (the protocol only
        # touches the destination after tmp closes)
        (tmp_path / "_CURRENT.tmp").write_text('{"torn', encoding="utf-8")
        assert lake._read_pointer(spark, ptr) == "v0"

    def test_die_between_delete_and_rename_yields_new_value(self, spark, tmp_path):
        import os

        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        lake._write_pointer(spark, ptr, "v0")
        # crash point on an HDFS-like FS: destination deleted, complete
        # (frame-valid) tmp not yet renamed — reader must serve the NEW
        # value
        (tmp_path / "_CURRENT.tmp").write_text(Lake._frame("v1"), encoding="utf-8")
        os.remove(ptr)
        assert lake._read_pointer(spark, ptr) == "v1"

    def test_torn_tmp_on_first_ever_write_reads_as_absent(self, spark, tmp_path):
        """r9 ADVICE (medium): on the FIRST-EVER write there is no old
        destination to fall back on — a driver killed mid-tmp-write used
        to leave torn bytes the reader returned as authoritative (a torn
        first _SLICES.json bricked every resume in json.loads). The
        frame check must reject the torn tmp -> None (fresh-table
        semantics)."""
        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        # every truncation prefix of a framed payload must read as absent
        full = Lake._frame('[["0", "1000"]]')
        for cut in range(len(full)):
            (tmp_path / "_CURRENT.tmp").write_text(full[:cut], encoding="utf-8")
            assert lake._read_pointer(spark, ptr) is None, f"cut={cut}"

    def test_legacy_unframed_destination_still_reads(self, spark, tmp_path):
        """Pre-frame writers left raw payloads in the destination; the
        reader keeps returning those verbatim (the destination is only
        ever installed complete, so no validation is needed there)."""
        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        (tmp_path / "_CURRENT").write_text("v7", encoding="utf-8")
        assert lake._read_pointer(spark, ptr) == "v7"

    def test_legacy_unframed_complete_tmp_serves_committed_value(
        self, spark, tmp_path
    ):
        """r10 ADVICE: a PRE-FRAME writer crashing between the
        destination delete and the rename left a complete but unframed
        tmp holding the committed new value — the frame-only fallback
        read it as absent where the old reader served it. Unframed tmp
        content is now accepted when it parses cleanly as one of the
        two payload shapes ever written (version string / JSON);
        anything else still reads as absent. Version strings must also
        name an existing v*/ dir (r11 VERDICT #4)."""
        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        (tmp_path / "v12").mkdir()  # merge writes the dir before the flip
        (tmp_path / "_CURRENT.tmp").write_text("v12", encoding="utf-8")
        assert lake._read_pointer(spark, ptr) == "v12"
        manifest = '[["0", "1000"]]'
        (tmp_path / "_CURRENT.tmp").write_text(manifest, encoding="utf-8")
        assert lake._read_pointer(spark, ptr) == manifest
        # torn JSON parses as neither shape -> absent, never torn bytes
        (tmp_path / "_CURRENT.tmp").write_text('{"torn', encoding="utf-8")
        assert lake._read_pointer(spark, ptr) is None
        (tmp_path / "_CURRENT.tmp").write_bytes(b"\xff\xfe\x00bin")
        assert lake._read_pointer(spark, ptr) is None

    def test_legacy_tmp_version_must_name_an_existing_dir(self, spark, tmp_path):
        """r11 VERDICT #4: a parseable version string in an unframed tmp
        is only trusted when a matching v*/ directory exists — the merge
        protocol writes the dir before the pointer flip, so a committed
        value always has one; a parse-clean artifact that names nothing
        reads as absent."""
        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        (tmp_path / "_CURRENT.tmp").write_text("v3", encoding="utf-8")
        assert lake._read_pointer(spark, ptr) is None  # no dirs at all
        (tmp_path / "v0").mkdir()
        (tmp_path / "v1").mkdir()
        assert lake._read_pointer(spark, ptr) is None  # v3 dir absent
        (tmp_path / "v3").mkdir()
        assert lake._read_pointer(spark, ptr) == "v3"
        # a FILE named like a version dir is not a snapshot
        (tmp_path / "_CURRENT.tmp").write_text("v4", encoding="utf-8")
        (tmp_path / "v4").write_text("not a dir", encoding="utf-8")
        assert lake._read_pointer(spark, ptr) is None

    def test_legacy_tmp_truncation_never_serves_stale_version(self, spark, tmp_path):
        """r11 VERDICT #4, the residual the parse-only check left open:
        a pre-frame tmp holding ``v12`` torn to ``v1`` still parses and
        used to be served as v1 — a stale snapshot presented as current.
        Property over EVERY truncation prefix of the legacy payload
        (dirs v0/v1/v12 on disk, committed value v12): each cut reads as
        either absent or the committed ``v12`` — never ``v1``/``v0``.
        The dir cross-check repairs the prefix to the latest-modified
        matching dir (v12, written last in a monotonic history), so the
        complete payload and the ``v1`` cut BOTH serve v12."""
        import os as _os

        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        for i, v in enumerate(("v0", "v1", "v12")):
            (tmp_path / v).mkdir()
            _os.utime(tmp_path / v, (1_000_000 + i, 1_000_000 + i))
        payload = "v12"
        for cut in range(len(payload) + 1):
            (tmp_path / "_CURRENT.tmp").write_text(payload[:cut], encoding="utf-8")
            got = lake._read_pointer(spark, ptr)
            assert got in (None, "v12"), f"cut={cut} served stale {got!r}"
        # and the complete payload does serve (not everything absent)
        (tmp_path / "_CURRENT.tmp").write_text(payload, encoding="utf-8")
        assert lake._read_pointer(spark, ptr) == "v12"

    def test_legacy_tmp_after_version_counter_reset_serves_new_epoch(
        self, spark, tmp_path
    ):
        """r12 review: an unreadable pointer makes merge_trusted restart
        at v0 BESIDE surviving old-epoch dirs, so a complete legacy tmp
        ``v1`` can coexist with old v10/v12 dirs that prefix-match it. A
        numerically-largest rule would serve the stale old-epoch v12;
        the latest-mtime rule serves the new-epoch v1 — the committed
        value the old parse-only reader also served. The monotonic
        truncation repair (test above) must keep working alongside."""
        import os as _os

        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        # old epoch: v0..v12 written long ago; new epoch overwrote v0
        # then wrote v1, so the new-epoch dirs carry the newest mtimes
        for v, t in (("v10", 100), ("v12", 200), ("v0", 900), ("v1", 1000)):
            (tmp_path / v).mkdir()
            _os.utime(tmp_path / v, (1_000_000 + t, 1_000_000 + t))
        (tmp_path / "_CURRENT.tmp").write_text("v1", encoding="utf-8")
        assert lake._read_pointer(spark, ptr) == "v1"
        # same fixture, tmp naming the old epoch's exact dir: only v12
        # prefix-matches "v12", so the cross-check serves it verbatim
        (tmp_path / "_CURRENT.tmp").write_text("v12", encoding="utf-8")
        assert lake._read_pointer(spark, ptr) == "v12"

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        versions=st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=8),
        committed_idx=st.integers(min_value=0, max_value=7),
        cut_frac=st.floats(min_value=0.0, max_value=1.0),
    )
    def test_legacy_tmp_property_any_history(
        self, spark, tmp_path, versions, committed_idx, cut_frac
    ):
        """Generalizes the monotonic-truncation and counter-reset
        scenarios: for ANY set of version dirs with ANY write order (the
        committed one is the last-written, i.e. newest mtime — the
        protocol invariant), every truncation prefix of the committed
        value's legacy tmp reads as either absent or the committed value
        itself — never another version's dir."""
        import os as _os
        import shutil as _shutil

        base = tmp_path / "t"
        base.mkdir()
        try:
            vs = sorted(versions)
            committed = vs[committed_idx % len(vs)]
            # arbitrary epoch structure: all non-committed dirs get older
            # mtimes (any order); the committed dir is written last
            for i, v in enumerate(x for x in vs if x != committed):
                (base / f"v{v}").mkdir()
                _os.utime(base / f"v{v}", (2_000_000 + i, 2_000_000 + i))
            (base / f"v{committed}").mkdir()
            _os.utime(base / f"v{committed}", (2_000_500, 2_000_500))
            payload = f"v{committed}"
            cut = int(len(payload) * cut_frac)
            (base / "_CURRENT.tmp").write_text(payload[:cut], encoding="utf-8")
            lake = Lake(str(base))
            got = lake._read_pointer(spark, str(base / "_CURRENT"))
            assert got in (None, payload), (
                f"history {vs}, committed {payload}, cut {cut} -> {got!r}"
            )
            # the complete payload always serves
            (base / "_CURRENT.tmp").write_text(payload, encoding="utf-8")
            assert lake._read_pointer(spark, str(base / "_CURRENT")) == payload
        finally:
            _shutil.rmtree(base, ignore_errors=True)

    def test_corrupt_framed_destination_raises(self, spark, tmp_path):
        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        (tmp_path / "_CURRENT").write_text(
            Lake._frame("v1")[:-1], encoding="utf-8"
        )
        with pytest.raises(IOError):
            lake._read_pointer(spark, ptr)

    def test_rm_pointer_removes_tmp_sibling(self, spark, tmp_path):
        """r9 ADVICE (low): the Delta migration removes v*/ dirs and the
        pointer but used to leave a crash-leftover .tmp behind — which
        the tmp-fallback reader would then resurrect as a path to the
        just-deleted version data."""
        import os

        lake = Lake(str(tmp_path))
        ptr = self._ptr(tmp_path)
        lake._write_pointer(spark, ptr, "v0")
        (tmp_path / "_CURRENT.tmp").write_text(Lake._frame("v0"), encoding="utf-8")
        lake._rm_pointer(spark, ptr)
        assert not os.path.exists(ptr) and not os.path.exists(ptr + ".tmp")
        assert lake._read_pointer(spark, ptr) is None

    def test_trusted_survives_pointer_crash_window(self, spark, tmp_path):
        import os

        lake = Lake(str(tmp_path))
        t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
        lake.merge_trusted(
            spark, spark.createDataFrame(_rows(t0, ("a", 1))), "ns", "ds"
        )
        lake.merge_trusted(
            spark, spark.createDataFrame(_rows(t1, ("a", 10), ("b", 2))), "ns", "ds"
        )
        base = lake.path("trusted", "ns", "ds")
        ptr = os.path.join(base, "_CURRENT")
        # delete->rename crash window: only the tmp sibling survives
        os.rename(ptr, ptr + ".tmp")
        out = {r.sk: r.v for r in lake.read_trusted(spark, "ns", "ds").collect()}
        assert out == {"a": 10, "b": 2}

    def test_manifest_resume_survives_torn_tmp(self, spark, tmp_path, sf_dir):
        """A killed _append_manifest can leave a torn .tmp next to an
        intact manifest; the next resume must read the intact one
        instead of crashing (the pre-fix in-place write put the torn
        bytes in the manifest ITSELF — an unrecoverable resume)."""
        import json
        import os

        from etl_complete_with_spark_spark.pipeline import ResyncConfig, ResyncPipeline
        from etl_complete_with_spark_spark.sources import ParquetSource

        src = ParquetSource(f"{sf_dir}/events.parquet", "event_id")
        lake = Lake(str(tmp_path / "lake"))
        cfg = ResyncConfig(
            namespace="ns", dataset="events", partition_column="event_id",
            mode="int", start=0, end=3000, amount=1000,
        )
        pipe = ResyncPipeline(src, lake, cfg)
        pipe.run(spark, parallel=False)
        manifest = pipe._manifest_path()
        assert len(json.loads(Lake._unframe(open(manifest, "rb").read()))) == 3
        open(manifest + ".tmp", "w").write('[["0", "10')  # torn append
        res = pipe.run(spark, parallel=False)  # resume: all slices skipped
        assert res.status == "success" and len(res.skipped) == 3
