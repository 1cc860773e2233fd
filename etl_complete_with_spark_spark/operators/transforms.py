"""Reference-parity row transforms (the "T" of the ETL).

Rebuilds the transform chain surveyed in SURVEY.md §2.7/§2.11
(reference: shared_etls/etls/utils.py:659-819) as pure, composable
DataFrame -> DataFrame functions. Every expression is a built-in
``pyspark.sql.functions`` column expression, so the whole chain stays
inside whole-stage codegen — no Python in the hot path.

Scale notes (100 TB): all transforms here are *narrow* (per-row
projections) except :func:`dedup_by_key`, which shuffles on the key.
The narrow chain fuses into a single codegen stage over the scan.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Surrogate key (reference: utils.py:659-701)
# ---------------------------------------------------------------------------

def surrogate_key_expr(id_columns: list[str], hyphen_separator: bool = True) -> Column:
    """MD5 surrogate-key expression over the business-key columns.

    Two compatibility modes, matching the reference exactly:

    - ``hyphen_separator=True`` (utils.py:688-695): ``md5(concat_ws('-', cols...))``.
      NULL components are *skipped* by concat_ws, and the separator prevents
      the ("ab","c") vs ("a","bc") boundary collision.
    - ``hyphen_separator=False`` (utils.py:698-700): ``md5(concat(cols...))``.
      Any NULL component makes the whole key NULL (concat is null-strict),
      and boundary collisions are possible. Kept only for compatibility;
      default is the separator mode.
    """
    cols = [F.col(c).cast("string") for c in id_columns]
    if hyphen_separator:
        return F.md5(F.concat_ws("-", *cols))
    return F.md5(F.concat(*cols).cast("string"))


def with_surrogate_key(
    df: DataFrame,
    id_columns: list[str],
    hyphen_separator: bool = True,
    output_col: str = "sk",
) -> DataFrame:
    """Add the MD5 surrogate key column (reference: utils.py:659-701).

    The reference builds an intermediate ``concatenatedString`` column and
    drops it (utils.py:690-694); a single composed expression produces the
    identical value without the extra projection.
    """
    return df.withColumn(output_col, surrogate_key_expr(id_columns, hyphen_separator))


# ---------------------------------------------------------------------------
# Batch audit timestamp (reference: utils.py:704-719)
# ---------------------------------------------------------------------------

def with_batch_timestamp(
    df: DataFrame,
    batch_ts: _dt.datetime | str | None = None,
    output_col: str = "timestamp_kafka",
) -> DataFrame:
    """Stamp a *per-batch constant* load timestamp (reference: utils.py:714-717).

    The reference stamps driver wall-clock via ``lit(datetime.now())`` — one
    constant per batch, i.e. a batch-load id rather than a row event time.
    We preserve that semantics; pass ``batch_ts`` explicitly for
    deterministic tests, omit it for wall-clock.
    """
    if batch_ts is None:
        batch_ts = _dt.datetime.now()
    if isinstance(batch_ts, _dt.datetime):
        batch_ts = batch_ts.strftime("%Y-%m-%d %H:%M:%S")
    return df.withColumn(output_col, F.lit(batch_ts).cast("timestamp"))


# ---------------------------------------------------------------------------
# Date-quality null-out (reference: utils.py:722-751)
# ---------------------------------------------------------------------------

def quality_check_dateformat(df: DataFrame, min_year: int = 10) -> DataFrame:
    """Null out corrupt pre-year-``min_year`` date/timestamp values.

    Reference semantics (utils.py:732-742): columns are discovered *by
    dtype* (``timestamp`` / ``date``), never by name; each such column
    becomes ``when(year(c) >= 10, c).otherwise(NULL)``. Note the boundary:
    year 0010 survives, years 0001-0009 are nulled.

    A single ``select`` applies all replacements in one projection (the
    reference loops ``withColumn`` per column, which stacks projection
    nodes — same result, noisier plan).
    """
    date_cols = {
        name
        for name, dtype in df.dtypes
        if dtype in ("timestamp", "date", "timestamp_ntz")
    }
    if not date_cols:
        return df
    exprs = [
        F.when(F.year(F.col(c)) >= min_year, F.col(c)).otherwise(F.lit(None)).alias(c)
        if c in date_cols
        else F.col(c)
        for c in df.columns
    ]
    return df.select(*exprs)


# ---------------------------------------------------------------------------
# Dedup by key (reference: utils.py:817)
# ---------------------------------------------------------------------------

def dedup_by_key(
    df: DataFrame,
    keys: list[str] | None = None,
    order_by: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Keep one row per key group.

    - ``order_by=None`` reproduces the reference's
      ``dropDuplicates(["sk"])`` (utils.py:817): an *arbitrary* row
      survives. Physically a partial+final hash aggregate — map-side
      combine makes this the cheapest dedup at scale.
    - ``order_by="timestamp_kafka"`` (or any column) gives the
      deterministic variant: latest-wins via a row_number window. This is
      what the TRUSTED merge wants so re-runs are reproducible.

    Both shuffle once on ``keys``.
    """
    keys = keys or ["sk"]
    if order_by is None:
        return df.dropDuplicates(keys)
    order = F.col(order_by).desc() if descending else F.col(order_by).asc()
    w = Window.partitionBy(*keys).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Composite: WORK -> TRUSTED-ready (reference: utils.py:754-819, SURVEY §2.11)
# ---------------------------------------------------------------------------

def work_to_trusted_transform(
    df: DataFrame,
    id_columns: list[str],
    hyphen_separator: bool = True,
    batch_ts: _dt.datetime | str | None = None,
    deterministic_dedup: bool = False,
) -> DataFrame:
    """The end-to-end transform chain feeding the TRUSTED merge.

    Reference pipeline (utils.py:754-819): WORK scan -> surrogate key ->
    batch timestamp -> date-quality null-out -> ``dropDuplicates(["sk"])``.
    Everything before the dedup is narrow and fuses into one codegen stage
    over the scan; the dedup is the single shuffle.
    """
    out = with_surrogate_key(df, id_columns, hyphen_separator)
    out = with_batch_timestamp(out, batch_ts)
    out = quality_check_dateformat(out)
    return dedup_by_key(
        out, ["sk"], order_by="timestamp_kafka" if deterministic_dedup else None
    )
