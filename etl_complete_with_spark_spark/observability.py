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
