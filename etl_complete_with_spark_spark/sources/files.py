"""Text-format file sources (JSONL / CSV) with bad-record quarantine.

The reference reads JDBC/Mongo/parquet only; real landing zones also
receive newline-delimited JSON and CSV drops, and at scale the question
is never "can Spark parse it" but "what happens to the rows that don't
parse". These readers pin the production posture:

- ALWAYS an explicit schema. Schema inference is a second full scan of
  the data and a correctness hazard (a day of all-null columns silently
  changes the inferred type); at 100 TB it is simply off the table.
- Bad rows land in a quarantine DataFrame (raw line preserved for
  replay) instead of killing the job (FAILFAST) or vanishing
  (DROPMALFORMED).

Implementation note: the frame is read as TEXT and parsed with
``from_json`` / ``from_csv`` carrying a ``_corrupt_record`` field in the
parse schema. This deliberately avoids the native
``spark.read.json(...)`` + filter-on-corrupt pattern, which hits
SPARK-21610 (queries referencing only the internal corrupt column from a
file scan are disallowed; the documented workaround is ``.cache()``,
which leaks in a long-lived session — same reason dedup.py uses
localCheckpoint). One scan, two lazy projections, no caching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _split(parsed: DataFrame, schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    good = parsed.filter(F.col(f"s.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"s.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(F.col(f"s.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias("raw_record")
    )
    return good, quarantine


def _parse_schema(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"{CORRUPT_COL} is reserved")
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON -> (good_rows, quarantine).

    ``good_rows`` has exactly ``schema``'s columns; ``quarantine`` is
    (raw_record) for every line that failed to parse against it —
    including type mismatches, not just broken syntax.
    """
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    parsed = spark.read.text(path).withColumn(
        "s", F.from_json("value", _parse_schema(schema), opts)
    )
    return _split(parsed, schema)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV -> (good_rows, quarantine); same contract as read_jsonl.

    With ``header=True`` the header line is dropped by exact match
    (column names joined with ``sep``) — explicit-schema readers never
    take column names from the file anyway.
    """
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL, "sep": sep}
    lines = spark.read.text(path)
    if header:
        lines = lines.filter(
            F.col("value") != F.lit(sep.join(f.name for f in schema.fields))
        )
    # from_csv takes a DDL string, not a StructType (unlike from_json)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in _parse_schema(schema).fields
    )
    parsed = lines.withColumn("s", F.from_csv("value", ddl, opts))
    return _split(parsed, schema)
