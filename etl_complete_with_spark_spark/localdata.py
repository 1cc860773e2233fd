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

Fast-path safety (round-8, per r7 ADVICE): the pandas frame is built
with EXPLICIT per-column dtypes derived from the Spark schema, after
verifying every value's Python type the way the plain path's per-row
type verification would. Bare ``pd.DataFrame(rows)`` inference would
coerce first (ints with a None become float64/NaN; ``Decimal`` becomes
object then whatever Arrow guesses) and Spark's internal Arrow fallback
can succeed on the coerced frame WITHOUT raising — silently diverging
from plain-path values. Here any mismatch (None in a numeric column,
mixed types, unsupported Spark type) raises inside ``_typed_columns``
and the call drops to the plain, value-exact ``createDataFrame`` path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType)


def _resolve_schema(schema) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return T.StructType.fromDDL(schema)


def _is_int(v) -> bool:
    import numpy as np

    return isinstance(v, (int, np.integer)) and not isinstance(v, (bool, np.bool_))


def _is_float(v) -> bool:
    import numpy as np

    return (
        isinstance(v, (int, float, np.integer, np.floating))
        and not isinstance(v, (bool, np.bool_))
    )


def _typed_columns(rows, struct: T.StructType):
    """Schema-typed column arrays for the Arrow fast path. Raises on ANY
    value whose Python type doesn't match its Spark column type (the
    same contract the plain path verifies per row) — no silent pandas
    inference, no NaN-for-None coercion."""
    import numpy as np
    import pandas as pd

    n_cols = len(struct.fields)
    if any(len(r) != n_cols for r in rows):
        raise TypeError("row width != schema width")
    data = {}
    for i, f in enumerate(struct.fields):
        vals = [r[i] for r in rows]
        dt = f.dataType
        if isinstance(dt, _INT_TYPES):
            if not all(_is_int(v) for v in vals):
                raise TypeError(f"non-int value in integral column {f.name}")
            data[f.name] = pd.Series(np.asarray(vals, dtype="int64"))
        elif isinstance(dt, _FLOAT_TYPES):
            if not all(_is_float(v) for v in vals):
                raise TypeError(f"non-numeric value in float column {f.name}")
            data[f.name] = pd.Series(np.asarray(vals, dtype="float64"))
        elif isinstance(dt, T.StringType):
            if not all(isinstance(v, str) for v in vals):
                raise TypeError(f"non-str value in string column {f.name}")
            data[f.name] = pd.Series(vals, dtype=object)
        elif isinstance(dt, T.BooleanType):
            if not all(isinstance(v, bool) for v in vals):
                raise TypeError(f"non-bool value in boolean column {f.name}")
            data[f.name] = pd.Series(np.asarray(vals, dtype=bool))
        elif isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, _INT_TYPES + _FLOAT_TYPES + (T.StringType,)
        ):
            elem_ok = (
                _is_int
                if isinstance(dt.elementType, _INT_TYPES)
                else _is_float
                if isinstance(dt.elementType, _FLOAT_TYPES)
                else lambda v: isinstance(v, str)
            )
            if not all(
                isinstance(v, (list, tuple)) and all(elem_ok(e) for e in v)
                for v in vals
            ):
                raise TypeError(f"bad array value in column {f.name}")
            data[f.name] = pd.Series([list(v) for v in vals], dtype=object)
        else:
            # Decimal, timestamp, nested struct/map, None-bearing rows:
            # the plain path's per-row verification is the safe route.
            raise TypeError(f"no Arrow fast path for {dt.simpleString()}")
    return pd.DataFrame(data, columns=[f.name for f in struct.fields])


def local_rows_df(spark: SparkSession, rows, schema: str | T.StructType) -> DataFrame:
    """Rows (iterable of tuples, matched to ``schema`` positionally) ->
    DataFrame backed by driver-serialized Arrow batches (JVM-only at
    task time). Falls back to the plain, per-row-type-verified path
    whenever the fast path cannot represent the rows EXACTLY (None in a
    numeric column, exotic types) — correctness first."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        struct = _resolve_schema(schema)
        pdf = _typed_columns(rows, struct)
        return spark.createDataFrame(pdf, schema=struct)
    except Exception:
        return spark.createDataFrame(rows, schema)
