"""Physical-plan inspection helpers.

The 100 TB contract of this engine is not just "right answers" but "right
plans": filters reach the parquet scan, small dims broadcast, aggregates
partial-combine before the shuffle, narrow chains stay in one codegen
stage. These helpers make those properties *assertable in tests* instead
of eyeballed, and give operators a quick `explain_summary` for tuning.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` output (scan details incl. PushedFilters)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, *fragments: str) -> bool:
    """True if the scan's PushedFilters contains every fragment."""
    plan = formatted_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = " ".join(m)
    return all(f in pushed for f in fragments)


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the (first) file scan — column-pruning
    check: a 2-column projection must not scan 16 columns."""
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return set()
    return {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present (HashAggregate partial before the
    exchange) — the difference between shuffling |rows| and |groups|."""
    plan = physical_plan(df)
    return bool(re.search(r"partial_", plan)) or "partial" in plan.lower()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower = better; reused
    exchanges counted once)."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans — narrow chains should fuse
    into few, wide ones break at exchanges. Spark's plan text marks
    codegen'd operators with a ``*(N)`` prefix (N = codegen stage id)."""
    plan = physical_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)


def explain_summary(df: DataFrame) -> dict:
    """One-call plan health snapshot for tuning/debugging."""
    return {
        "exchanges": count_exchanges(df),
        "codegen_stages": codegen_stage_count(df),
        "broadcast_join": has_broadcast_join(df),
        "read_columns": sorted(read_schema_columns(df)),
    }
