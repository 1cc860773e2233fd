"""Extraction slicing: bounds, chunk heuristics, interval math, pushdown predicates.

Rebuilds the driver-side control plane of SURVEY §2.10 (reference:
shared_etls/etls/utils.py:186-330, 484-626) as pure, unit-testable
functions. In the reference this logic drives a *sequential* per-chunk
job loop; in the rebuild the same intervals become either

- the ``predicates`` list of a single *parallel* Spark JDBC read
  (every slice fetched concurrently by its own task), or
- checkpointing units for resumable ingestion (pipeline.py), which is
  the only reason to keep sequential slices at all.

Date intervals are half-open ``[start, end)`` end to end. The reference
produced *closed* intervals and re-widened the end at every call site
(+1 day at carga_date.py:159, +1 at carga_int.py:149) before feeding the
half-open P1 predicate — net effect identical, so we build half-open
directly and document the equivalence.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Iterable

DateLike = _dt.date | _dt.datetime

# Reference constants (load_utils.py:490,517 headroom; carga_date.py:153 retries)
MAX_BOUND_HEADROOM = 300_000
DEFAULT_MAX_RETRIES = 4
DEFAULT_RETRY_SLEEP_S = 60


# ---------------------------------------------------------------------------
# Chunk-width heuristics (D3/D4; reference utils.py:186-250)
# ---------------------------------------------------------------------------

def chunk_days_for_rowcount(rowcount: int, span_days: int | None = None) -> int:
    """Date-mode chunk width in days from an estimated row count.

    Reference tiers (utils.py:204-216): <1e5 -> 15d, <5e5 -> 10d,
    <1e6 -> 5d, <1e7 -> 3d, else 2d. Span overrides (utils.py:218-222):
    span==1 -> 1 day, span<15 -> 2 days. The reference applies the
    span==1 override *before* the span<15 one, so a 1-day span ends at
    2 — we implement the evident intent (1-day span -> 1-day chunks) and
    note the reference-effective behavior here for the record.
    """
    if rowcount < 100_000:
        width = 15
    elif rowcount < 500_000:
        width = 10
    elif rowcount < 1_000_000:
        width = 5
    elif rowcount < 10_000_000:
        width = 3
    else:
        width = 2
    if span_days is not None:
        if span_days <= 1:
            return 1
        if span_days < 15:
            return min(width, 2)
    return width


def chunk_ids_for_rowcount(rowcount: int, reference_compat: bool = False) -> int:
    """Int-mode chunk width (number of ids per slice).

    The reference's if-chain (utils.py:239-248) has a dangling ``else``
    that collapses the intended 50000/25000/5000 tiers: effective behavior
    is 1000 if q<5000 else 100000 (SURVEY §2.10-D4, BASELINE.md).

    Default implements the evident *intent* (tiered widths); pass
    ``reference_compat=True`` for the reference-effective behavior.
    """
    if reference_compat:
        return 1_000 if rowcount < 5_000 else 100_000
    if rowcount < 5_000:
        return 1_000
    if rowcount < 25_000:
        return 5_000
    if rowcount < 50_000:
        return 25_000
    if rowcount < 100_000:
        return 50_000
    return 100_000


# ---------------------------------------------------------------------------
# Interval math (D2; reference utils.py:290-330)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Interval:
    """Half-open extraction slice [start, end)."""

    start: object
    end: object


def date_intervals(start: DateLike, end: DateLike, chunk_days: int) -> list[Interval]:
    """Split [start, end) into contiguous half-open date slices.

    Equivalent to the reference's closed-interval stepping
    (utils.py:308-319) after its call-site +1-day end widening
    (carga_date.py:159): contiguous, non-overlapping, exactly covering
    [start, end).
    """
    if chunk_days < 1:
        raise ValueError("chunk_days must be >= 1")
    if start >= end:
        return []
    step = _dt.timedelta(days=chunk_days)
    out: list[Interval] = []
    cur = start
    while cur < end:
        nxt = min(cur + step, end)
        out.append(Interval(cur, nxt))
        cur = nxt
    return out


def int_intervals(start: int, end: int, chunk_ids: int) -> list[Interval]:
    """Split [start, end) into contiguous half-open integer slices.

    Equivalent to the reference's closed stepping (utils.py:321-330) after
    the +1 end widening (carga_int.py:149).
    """
    if chunk_ids < 1:
        raise ValueError("chunk_ids must be >= 1")
    if start >= end:
        return []
    out: list[Interval] = []
    cur = start
    while cur < end:
        nxt = min(cur + chunk_ids, end)
        out.append(Interval(cur, nxt))
        cur = nxt
    return out


# ---------------------------------------------------------------------------
# Pushdown predicate compilation (D1/P1/P2; reference utils.py:270-287)
# ---------------------------------------------------------------------------

def _sql_literal(v: object) -> str:
    if isinstance(v, _dt.datetime):
        return f"'{v}'"
    if isinstance(v, _dt.date):
        # Full-timestamp form, not bare 'YYYY-MM-DD': strict engines
        # (Derby ERROR 22007) refuse to compare a TIMESTAMP column with a
        # date-only string, while MySQL & friends accept either — and the
        # common partition column type is DATETIME/TIMESTAMP. Midnight
        # keeps half-open [start, end) semantics identical. (A true DATE
        # column on a strict engine would need the bare form back —
        # reference pcs are datetimes, utils.py:270-287.)
        return f"'{v} 00:00:00'"
    if isinstance(v, str):
        escaped = v.replace("'", "''")
        return f"'{escaped}'"
    return str(v)


def slice_predicate(partition_column: str, interval: Interval) -> str:
    """The half-open P1 predicate as a SQL string (utils.py:282-285).

    Used both as a JDBC ``predicates`` entry (one per slice -> one Spark
    task each, fetched in parallel) and inside ``query_definition``.
    The reference's string had a missing space (``'{start}'and``) that
    only parsed thanks to the quote boundary — not reproduced.
    """
    lo = _sql_literal(interval.start)
    hi = _sql_literal(interval.end)
    return f"{partition_column} >= {lo} AND {partition_column} < {hi}"


def query_definition(dataset: str, partition_column: str, interval: Interval) -> str:
    """Per-slice pushdown subquery (D1; utils.py:270-287):
    ``(select * from T where pc >= 'a' and pc < 'b') subs``."""
    return f"(select * from {dataset} where {slice_predicate(partition_column, interval)}) subs"


def jdbc_predicates(partition_column: str, intervals: Iterable[Interval]) -> list[str]:
    """All slice predicates, for ``spark.read.jdbc(..., predicates=...)`` —
    the parallel replacement for the reference's sequential chunk loop."""
    return [slice_predicate(partition_column, iv) for iv in intervals]


# ---------------------------------------------------------------------------
# Bounds resolution (D8/D9; reference utils.py:484-626)
# ---------------------------------------------------------------------------

def resolve_bounds(
    cli_start,
    cli_end,
    probe_min,
    probe_max,
    mode: str,
    headroom: int = MAX_BOUND_HEADROOM,
    today: _dt.date | None = None,
):
    """Resolve the extraction window: CLI args win, else source probes.

    Reference behavior (utils.py:484-626): start = arg or MIN-probe; end =
    arg, else *today* for date mode (utils.py:604-605), else MAX-probe +
    ``headroom`` for int mode (load_utils.py:490,517). Probes are
    callables so resolution stays lazy (no probe when the arg is given).
    """
    if mode not in ("date", "int"):
        raise ValueError(f"mode must be 'date' or 'int', got {mode!r}")
    start = cli_start if cli_start is not None else probe_min()
    if cli_end is not None:
        end = cli_end
    elif mode == "date":
        end = today or _dt.date.today()
    else:
        end = int(probe_max()) + headroom
    if mode == "int":
        start, end = int(start), int(end)
    return start, end


# ---------------------------------------------------------------------------
# URL / driver munging (D5-D7; reference utils.py:30-47, 253-267, 629-656)
# ---------------------------------------------------------------------------

def driver_from_url(url: str) -> str:
    """Driver name from a connection URL (D5; utils.py:253-267):
    ``jdbc:mysql://…`` -> ``mysql``; any mongodb scheme -> ``mongodb``."""
    if "mongodb" in url:
        return "mongodb"
    return url.split("/")[0].split(":")[1]


def disable_ssl_for_mysql(url: str) -> str:
    """Append ``useSSL=false`` iff the driver is mysql (D6; utils.py:629-656),
    with ``?``/``&`` handling; idempotent."""
    if driver_from_url(url) != "mysql" or "useSSL=false" in url:
        return url
    sep = "&" if "?" in url else "?"
    return f"{url}{sep}useSSL=false"


def database_from_url(url: str, fallback: str) -> str:
    """Extract ``database=<name>`` from a URI, else fallback to the
    namespace (D7; utils.py:30-47)."""
    import re

    m = re.search(r"database=(\w+)", url)
    return m.group(1) if m else fallback
