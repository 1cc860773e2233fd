"""Parquet/lake source (S7/S8/S9 of SURVEY §2.1) — also the local test stand-in
for the JDBC/Mongo sources (same slice semantics, minus the wire protocol)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..slicing import Interval


class ParquetSource:
    """A parquet dataset sliceable on a partition column.

    The half-open slice filter is declared with DataFrame expressions, so
    Catalyst pushes it into the parquet scan (min/max row-group pruning).
    ``probe_min/max`` compile to stats-only scans — no data read.
    """

    def __init__(self, path: str, partition_column: str):
        self.path = path
        self.partition_column = partition_column

    def _read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def read_slice(self, spark: SparkSession, interval: Interval) -> DataFrame:
        pc = F.col(self.partition_column)
        return self._read(spark).filter(
            (pc >= F.lit(interval.start)) & (pc < F.lit(interval.end))
        )

    def read_range(self, spark: SparkSession, intervals: list[Interval]) -> DataFrame:
        if not intervals:
            raise ValueError("read_range needs at least one interval")
        lo = min(iv.start for iv in intervals)
        hi = max(iv.end for iv in intervals)
        return self.read_slice(spark, Interval(lo, hi))

    def probe_min(self, spark: SparkSession):
        return self._read(spark).agg(F.min(self.partition_column)).first()[0]

    def probe_max(self, spark: SparkSession):
        return self._read(spark).agg(F.max(self.partition_column)).first()[0]
