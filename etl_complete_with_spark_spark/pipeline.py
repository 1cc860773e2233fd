"""Resync pipeline: sliced extraction with retry + resume, then trusted merge.

Rebuilds the reference's four CLI lifecycles (SURVEY §3; reference:
resync_date/etls/carga_date.py:151-228 and siblings) as one
source-agnostic library:

- **Fast path** (``run(parallel=True)``): the whole window is ONE Spark
  read — for JDBC every slice is a ``predicates`` entry fetched by its own
  task concurrently. This is what a healthy 1000-executor run should do;
  the reference's sequential per-chunk jobs existed only for resumability.
- **Resumable path** (``run(parallel=False)``): per-slice jobs with the
  reference's retry policy (4 attempts, configurable sleep,
  carga_date.py:153/:215) and *exact* resume from a slice manifest — a
  JSON file in the WORK zone recording completed slices. The reference
  instead re-derived the watermark with ``max(pc)`` over WORK
  (carga_date.py:188-216), which we also expose (``watermark``) for
  parity; the manifest is strictly better (no scan, no reliance on pc
  monotonicity across slices).
- **Phase 2** (``transform_and_merge``): WORK scan -> §2.11 transform
  chain -> TRUSTED merge (idempotent on sk, absorbing slice re-runs).

Failure semantics: fail fast with the real exception (the reference
swallowed reads into unbound-variable NameErrors, load_utils.py:142-166 —
deliberately not reproduced; SURVEY §2.11)."""

from __future__ import annotations

import datetime as _dt
import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lake import Lake
from .observability import StatusCallback, get_run_logger, null_status
from .operators.transforms import work_to_trusted_transform
from .slicing import (
    DEFAULT_MAX_RETRIES,
    Interval,
    chunk_days_for_rowcount,
    chunk_ids_for_rowcount,
    date_intervals,
    int_intervals,
    resolve_bounds,
)


@dataclass
class ResyncConfig:
    namespace: str
    dataset: str
    partition_column: str
    mode: str  # "date" | "int"
    start: object | None = None  # CLI-arg bound (else source probe)
    end: object | None = None
    amount: int = 0  # estimated row count -> chunk-width tier
    max_retries: int = DEFAULT_MAX_RETRIES
    retry_sleep_s: float = 0.0  # reference: 60 (carga_date.py:215)
    id_request: str = ""
    reference_compat_chunks: bool = False
    # The JDBC carga_date lifecycle resumes from the slice manifest /
    # watermark (S9); the mongodb_carga_* programs retry each slice but
    # never recover a crashed run (mongodb_carga_date.py:160-195 — a
    # re-invocation reprocesses the full window). recovery=False models
    # that lifecycle: the sequential runner ignores the manifest's
    # already-done set (it still RECORDS slices, so flipping back to
    # recovery=True resumes correctly).
    recovery: bool = True


@dataclass
class RunResult:
    intervals: list[Interval] = field(default_factory=list)
    completed: list[Interval] = field(default_factory=list)
    skipped: list[Interval] = field(default_factory=list)  # already in manifest
    attempts: int = 0
    status: str = "success"


class ResyncPipeline:
    def __init__(
        self,
        source,
        lake: Lake,
        config: ResyncConfig,
        status_callback: StatusCallback = null_status,
    ):
        self.source = source
        self.lake = lake
        self.cfg = config
        self.status = status_callback
        self.log = get_run_logger(config.namespace, config.dataset)

    # -- planning -----------------------------------------------------------

    def plan(self, spark: SparkSession) -> list[Interval]:
        """Resolve bounds (CLI args win, else source probes — D8/D9) and cut
        the window into half-open slices by the volume heuristic (D2-D4)."""
        cfg = self.cfg
        start, end = resolve_bounds(
            cfg.start,
            cfg.end,
            lambda: self.source.probe_min(spark),
            lambda: self.source.probe_max(spark),
            cfg.mode,
        )
        if cfg.mode == "date":
            if isinstance(start, _dt.datetime):
                start = start.date()
            if isinstance(end, _dt.datetime):
                end = end.date()
            span = max((end - start).days, 0)
            width = chunk_days_for_rowcount(cfg.amount, span_days=span)
            return date_intervals(start, end, width)
        width = chunk_ids_for_rowcount(cfg.amount, cfg.reference_compat_chunks)
        return int_intervals(start, end, width)

    # -- slice manifest (exact resume) --------------------------------------

    def _manifest_path(self) -> str:
        import os

        return os.path.join(
            self.lake.path("work", self.cfg.namespace, self.cfg.dataset), "_SLICES.json"
        )

    def _read_manifest(self, spark: SparkSession) -> list[list[str]]:
        # Lake._read_pointer pairs with the crash-atomic _write_pointer:
        # a driver killed mid-append can never leave a truncated JSON
        # here (the old torn-manifest state made json.loads fail on
        # EVERY subsequent resume — a permanent brick)
        value = self.lake._read_pointer(spark, self._manifest_path())
        if value is None:
            return []
        return json.loads(value)

    def _append_manifest(self, spark: SparkSession, done: list[Interval]) -> None:
        entries = self._read_manifest(spark)
        entries.extend([[str(iv.start), str(iv.end)] for iv in done])
        self.lake._write_pointer(spark, self._manifest_path(), json.dumps(entries))

    # -- extraction ---------------------------------------------------------

    def run(self, spark: SparkSession, parallel: bool = True) -> RunResult:
        intervals = self.plan(spark)
        result = RunResult(intervals=intervals)
        if not intervals:
            self.status(self.cfg.id_request, "resync", "success")
            return result
        try:
            if parallel:
                self._run_parallel(spark, intervals, result)
            else:
                self._run_sequential(spark, intervals, result)
        except Exception:
            self.status(self.cfg.id_request, "resync", "failed")
            raise
        self.status(self.cfg.id_request, "resync", "success")
        return result

    def _run_parallel(self, spark, intervals, result) -> None:
        """One job for the whole window; slice-level parallelism comes from
        the source (JDBC predicates / parquet split planning)."""
        df = self.source.read_range(spark, intervals)
        self.lake.write_work(df, self.cfg.namespace, self.cfg.dataset)
        self._append_manifest(spark, intervals)
        result.completed = list(intervals)
        result.attempts = 1

    def _run_sequential(self, spark, intervals, result) -> None:
        """Per-slice jobs with retry (carga_date.py:151-228) and exact
        manifest-based resume: already-completed slices are skipped, so a
        crashed run re-invoked with the same window continues where it
        stopped without duplicating WORK data."""
        done = (
            {tuple(e) for e in self._read_manifest(spark)}
            if self.cfg.recovery
            else set()
        )
        for iv in intervals:
            if (str(iv.start), str(iv.end)) in done:
                result.skipped.append(iv)
                continue
            attempt = 0
            while True:
                attempt += 1
                result.attempts += 1
                try:
                    df = self.source.read_slice(spark, iv)
                    self.lake.write_work(df, self.cfg.namespace, self.cfg.dataset)
                    self._append_manifest(spark, [iv])
                    result.completed.append(iv)
                    break
                except Exception as exc:
                    self.log.warning(
                        "slice %s attempt %d/%d failed: %s",
                        iv, attempt, self.cfg.max_retries, exc,
                    )
                    if attempt >= self.cfg.max_retries:
                        raise
                    if self.cfg.retry_sleep_s:
                        time.sleep(self.cfg.retry_sleep_s)

    # -- reference-parity watermark (S9; carga_date.py:188-199) -------------

    def watermark(self, spark: SparkSession):
        """``max(pc)`` over WORK — the reference's resume point. Kept for
        parity/ops; manifest resume is the primary mechanism."""
        try:
            df = self.lake.read_work(spark, self.cfg.namespace, self.cfg.dataset)
        except Exception:
            return None
        return df.agg(F.max(self.cfg.partition_column)).first()[0]

    # -- phase 2 (SURVEY §3.4) ----------------------------------------------

    def transform_and_merge(
        self,
        spark: SparkSession,
        id_columns: list[str],
        hyphen_separator: bool = True,
        batch_ts=None,
    ) -> DataFrame:
        """WORK -> §2.11 transform chain -> TRUSTED merge (idempotent)."""
        raw = self.lake.read_work(spark, self.cfg.namespace, self.cfg.dataset)
        transformed = work_to_trusted_transform(
            raw, id_columns, hyphen_separator, batch_ts, deterministic_dedup=True
        )
        self.lake.merge_trusted(
            spark, transformed, self.cfg.namespace, self.cfg.dataset
        )
        return self.lake.read_trusted(spark, self.cfg.namespace, self.cfg.dataset)
