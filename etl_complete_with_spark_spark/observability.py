"""Operational logging + run-status callbacks (SURVEY §2.2-K3/K4, §2.10-D12).

The reference redirected stdout/stderr through a file logger and re-uploaded
the *whole* log file to object storage on every message
(cloud_utils.py:20-93 — a real throughput hazard at scale); status went to
a REST endpoint per run (utils.py:14-27). The rebuild keeps the observable
surface (named run logger, ``update_status``-shaped callback) but batches:
the log flushes on close/rotation, not per line, and sinks are pluggable.
"""

from __future__ import annotations

import logging
from contextlib import contextmanager
from typing import Callable, Protocol

StatusValue = str  # "success" | "failed" (reference utils.py:14-27)


class StatusCallback(Protocol):
    def __call__(self, id_request: str, process: str, value: StatusValue) -> None: ...


def null_status(id_request: str, process: str, value: StatusValue) -> None:
    """Default no-op callback."""


def http_status_callback(endpoint: str) -> StatusCallback:
    """REST status sink with the reference's payload shape
    (``{id_request, process, value}``, utils.py:27). Import-gated; failures
    are logged, never fatal (a dead status API must not kill a load)."""

    def post(id_request: str, process: str, value: StatusValue) -> None:
        try:
            import requests  # type: ignore

            requests.post(
                endpoint,
                json={"id_request": id_request, "process": process, "value": value},
                timeout=10,
            )
        except Exception as exc:  # pragma: no cover
            logging.getLogger("etl.status").warning("status post failed: %s", exc)

    return post


def get_run_logger(namespace: str, dataset: str, log_file: str | None = None) -> logging.Logger:
    """Named per-run logger (reference name shape ``tycoon-{ns}-{ds}-{ts}``,
    cloud_utils.py:36-65). File handler is buffered — no per-line uploads."""
    logger = logging.getLogger(f"etl.{namespace}.{dataset}")
    if not logger.handlers:
        handler = logging.FileHandler(log_file) if log_file else logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


class JobMetrics:
    """Filled in by :func:`measure_jobs` on context exit."""

    def __init__(self) -> None:
        self.stages: int = 0
        self.input_bytes: int = 0
        self.output_bytes: int = 0
        self.shuffle_read_bytes: int = 0
        self.shuffle_write_bytes: int = 0

    def as_dict(self) -> dict:
        return dict(vars(self))


def _stage_totals(spark):
    """Completed-stage counters from the UI REST API (None if UI off)."""
    import json as _json
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=5
        ) as r:
            stages = _json.load(r)
        t = JobMetrics()
        t.stages = len(stages)
        for s in stages:
            t.input_bytes += s.get("inputBytes", 0)
            t.output_bytes += s.get("outputBytes", 0)
            t.shuffle_read_bytes += s.get("shuffleReadBytes", 0)
            t.shuffle_write_bytes += s.get("shuffleWriteBytes", 0)
        return t
    except Exception:  # pragma: no cover - UI disabled / port race
        return None


@contextmanager
def measure_jobs(spark):
    """Measure the Spark work executed inside the block.

    The ops-visibility primitive the reference lacked entirely (its only
    signals were log lines): deltas of the completed-stage counters —
    stages run, input/output bytes, shuffle read/write — via the UI REST
    API (requires ``spark.ui.enabled=true``; bench.py uses the same
    channel). Yields a :class:`JobMetrics` populated on exit; all zeros
    when the UI is off — measurement must never fail the pipeline.

        with measure_jobs(spark) as m:
            df.write.parquet(path)
        log.info("landed %s bytes, %s shuffle", m.output_bytes,
                 m.shuffle_read_bytes)

    Deltas assume the session runs ONLY this block's work meanwhile —
    concurrent queries on the same session pollute the shared stage
    counters (single-threaded-session assumption; same caveat as any
    whole-application metric source). Exceptions propagate, but the
    finally-block still attributes whatever completed before the raise —
    a failed pipeline block reports its partial work instead of zeros.
    """
    before = _stage_totals(spark)
    metrics = JobMetrics()
    try:
        yield metrics
    finally:
        after = _stage_totals(spark)
        if before is not None and after is not None:
            metrics.stages = after.stages - before.stages
            metrics.input_bytes = after.input_bytes - before.input_bytes
            metrics.output_bytes = after.output_bytes - before.output_bytes
            metrics.shuffle_read_bytes = (
                after.shuffle_read_bytes - before.shuffle_read_bytes
            )
            metrics.shuffle_write_bytes = (
                after.shuffle_write_bytes - before.shuffle_write_bytes
            )
