"""Driver-local rows -> DataFrame without Python-worker evaluation.

``spark.createDataFrame(list_of_tuples, schema)`` builds a PYTHON-backed
RDD: every evaluation of the resulting plan — including each AQE
broadcast materialization, which re-evaluates the subtree — pays one
Python-worker round-trip per partition (and the local-list path splits
even a 32-row table into ``defaultParallelism`` partitions). Measured on
local[32]: ~200 ms of blocked executor time per task, ~7 s of executor
runtime to broadcast a 32-row table (task threads parked in
``PythonRunner`` reads with near-zero CPU — found via jstack).

The pandas + Arrow path serializes the data to Arrow batches ON THE
DRIVER and hands the JVM a byte-array RDD; task-time evaluation is pure
JVM (ArrowConverters), ~30x cheaper for the same broadcast. This helper
is the package-wide front door for turning small driver-side results
(probe tables, sketch estimates, union-find labels) into DataFrames —
never call ``createDataFrame`` on a row list in an operator data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Rows (iterable of tuples, matched to ``schema`` positionally) ->
    DataFrame backed by driver-serialized Arrow batches (JVM-only at
    task time). Falls back to the plain path when pandas/Arrow cannot
    represent the rows (e.g. exotic types) — correctness first."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd

        pdf = pd.DataFrame(rows)
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema)
