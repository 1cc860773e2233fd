"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
the reference's numeric-range extraction lifecycle as a FIRST-CLASS
pluggable source.

The reference (carga_int.py / utils.py:227-330) implements range-sliced
parallel extraction by hand: probe bounds, compute chunk tiers, build
one predicate per slice, feed them to ``spark.read.jdbc``. Spark 4's
DataSource API lets that whole lifecycle live INSIDE a source:

- ``partitions()`` plans one ``InputPartition`` per half-open slice —
  the same ``slicing.int_intervals`` / ``chunk_ids_for_rowcount`` tier
  logic the JDBC/Mongo paths use, so a partition here is exactly a
  reference extraction slice;
- ``pushFilters()`` accepts range predicates on the partition column
  and NARROWS THE PLANNED SLICES (true source-side pushdown — pruned
  slices are never generated, the Python worker never yields their
  rows); unsupported filters are returned for Spark to evaluate;
- ``read(partition)`` yields deterministic rows: every attribute is an
  md5-derived function of ``event_id`` (the `dedup.md5_hash60` 60-bit
  construction), so any engine — the DuckDB oracle included — can
  replay the source bit-for-bit from ``generate_series``.

This is the extensibility proof for §2.1: a user-defined system (REST
API, internal store, message log) plugs into the engine as
``spark.read.format("synthetic_events")`` with slicing and pushdown
semantics identical to the built-in extraction paths.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from ..slicing import chunk_ids_for_rowcount, int_intervals

SOURCE_NAME = "synthetic_events"


def hash60(value: str, seed: int) -> int:
    """Python twin of dedup.md5_hash60 / the oracle's _hash60_sql:
    ``CAST('0x' || substr(md5(v || '#seed'), 1, 15) AS BIGINT)``."""
    return int(hashlib.md5(f"{value}#{seed}".encode()).hexdigest()[:15], 16)


def row_for(event_id: int) -> tuple[int, int, int]:
    """The deterministic record function — shared, documented contract
    between the source and every replaying oracle."""
    return (
        event_id,
        hash60(str(event_id), 5) % 10,
        hash60(str(event_id), 6) % 100_000,
    )


class _SlicePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.start = int(options.get("start", 0))
        self.end = int(options.get("end", 10_000))  # half-open
        chunk = options.get("chunk")
        self.chunk = (
            int(chunk)
            if chunk is not None
            else chunk_ids_for_rowcount(self.end - self.start)
        )

    def pushFilters(self, filters):  # noqa: ANN001 - Spark Filter types
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        remaining = []
        for f in filters:
            col = getattr(f, "attribute", ("",))
            if tuple(col) == ("event_id",):
                if isinstance(f, GreaterThanOrEqual):
                    self.start = max(self.start, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.start = max(self.start, int(f.value) + 1)
                    continue
                if isinstance(f, LessThan):
                    self.end = min(self.end, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.end = min(self.end, int(f.value) + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.start = max(self.start, int(f.value))
                    self.end = min(self.end, int(f.value) + 1)
                    continue
            remaining.append(f)
        return remaining

    def partitions(self) -> Iterable[InputPartition]:
        if self.end <= self.start:
            # fully pruned: one empty slice — Spark treats an empty
            # partition list as "unpartitioned" and calls read(None)
            return [_SlicePartition(self.start, self.start)]
        return [
            _SlicePartition(iv.start, iv.end)
            for iv in int_intervals(self.start, self.end, self.chunk)
        ]

    def read(self, partition: _SlicePartition) -> Iterator[tuple]:
        for event_id in range(partition.start, partition.end):
            yield row_for(event_id)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return "event_id bigint, bucket int, value_cents bigint"

    def reader(self, schema) -> SyntheticEventsReader:  # noqa: ANN001
        return SyntheticEventsReader(self.options)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration of the source on a session. Also enables
    Python-data-source filter pushdown (runtime-settable; off by default
    in Spark 4.1) — without it a reader implementing ``pushFilters`` is
    rejected outright."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# Write path: JSONL sink with a task-temp + driver-commit protocol
# ---------------------------------------------------------------------------


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, temp_path: str, rows: int) -> None:
        self.temp_path = temp_path
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    """Per-task writer for the ``jsonl_sink`` format.

    The two-phase commit recipe every non-transactional sink needs:
    each task writes to a UNIQUE temp file (task-retry safe — a retried
    task writes a fresh temp, the loser is never promoted), returns a
    commit message; ``commit()`` on the DRIVER atomically promotes the
    temp files into the destination and writes a ``_SUCCESS`` manifest;
    ``abort()`` removes temps. Readers who require atomic visibility
    key off ``_SUCCESS`` — the same contract Hadoop output committers
    give parquet.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator):  # noqa: ANN001
        import json
        import os
        import uuid

        # zombie / speculative attempts: a task still running after the
        # driver's commit() must not recreate _temporary (commit already
        # rmtree'd it; its message was discarded, so its file would be
        # unreferenced residue). _SUCCESS is written last by commit(),
        # so its existence means this attempt already lost — drain the
        # iterator without touching the filesystem. This NARROWS the
        # zombie window rather than closing it (a commit() racing between
        # the checks can still leave residue under _temporary for an
        # instant); that residue is harmless — readers key off part files
        # and _SUCCESS, never _temporary — and the post-write re-check
        # below self-cleans the common case.
        success = os.path.join(self.path, "_SUCCESS")
        if os.path.exists(success):
            for _ in iterator:
                pass
            return JsonlCommitMessage("", 0)
        os.makedirs(os.path.join(self.path, "_temporary"), exist_ok=True)
        temp = os.path.join(self.path, "_temporary", f"task-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(temp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        if os.path.exists(success):
            # commit() finished while this attempt was writing: its
            # message set no longer includes ours, so the temp file would
            # be unreferenced residue — remove it and report losing.
            try:
                os.remove(temp)
            except OSError:
                pass
            return JsonlCommitMessage("", 0)
        return JsonlCommitMessage(temp, n)

    def commit(self, messages):  # noqa: ANN001
        import json
        import os
        import shutil

        total = 0
        n_files = 0
        for i, m in enumerate(messages):
            if not m.temp_path:  # drained post-commit zombie attempt
                continue
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.temp_path, final)
            total += m.rows
            n_files += 1
        # losing task attempts (retries whose message Spark discarded)
        # left temps behind — promote-then-clean makes commit exactly-once:
        # only the winners' files are visible, everything else is gone
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(json.dumps({"rows": total, "files": n_files}))

    def abort(self, messages):  # noqa: ANN001
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)
        for m in messages or []:
            if m is not None and m.temp_path and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):  # noqa: ANN001
        import os
        import shutil

        path = self.options["path"]
        if overwrite and os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(os.path.join(path, "_SUCCESS")):
            # append into a committed directory is not supported: part
            # numbering restarts at 0 (os.replace would clobber earlier
            # files) and the zombie guard would drain the new tasks.
            # Refuse loudly instead of either silent corruption.
            raise ValueError(
                f"jsonl_sink: {path!r} already holds a committed write "
                "(_SUCCESS present); use mode('overwrite') or a new path"
            )
        return JsonlSinkWriter(self.options)


def register_sink(spark) -> None:  # noqa: ANN001
    spark.dataSource.register(JsonlSinkDataSource)
