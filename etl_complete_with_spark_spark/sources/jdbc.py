"""JDBC source (S1-S3 of SURVEY §2.1).

Rebuilds the reference's JDBC extraction (shared_etls/etls/load_utils.py:11-46
range scan; :306-362 MIN probe; :460-526 MAX probe) Spark-first:

- The reference read each slice *sequentially*, one Spark job per chunk,
  by baking the range into a ``dbTable`` subquery. Here the whole window
  is ONE parallel read: each half-open slice becomes an entry of
  ``predicates=`` (one task per slice, fetched concurrently), which is
  Spark's native range partitioning for JDBC. Sequential slices survive
  only as resumability units in pipeline.py.
- MIN/MAX probes push the aggregate to the source DB via a one-row
  subquery — the DB scans its index instead of shipping the table.

No JDBC driver jars exist in the test image, so tests cover the
reader-option construction (``describe_*``) and the probe SQL; the
``.load()`` calls are exercised only against a real database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..slicing import Interval, jdbc_predicates, query_definition


class JdbcSource:
    def __init__(
        self,
        url: str,
        table: str,
        partition_column: str,
        user: str | None = None,
        password: str | None = None,
        fetchsize: int = 10_000,
        options: dict[str, str] | None = None,
    ):
        self.url = url
        self.table = table
        self.partition_column = partition_column
        self.user = user
        self.password = password
        self.fetchsize = fetchsize
        self.options = options or {}

    # -- option/SQL construction (unit-testable without a DB) ---------------

    def _base_options(self) -> dict[str, str]:
        opts = {"url": self.url, "fetchsize": str(self.fetchsize), **self.options}
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        return opts

    def describe_slice(self, interval: Interval) -> dict[str, str]:
        """Reader options for one slice: the reference's pushdown subquery
        (load_utils.py:37-44) — kept for exact-parity single-slice reads."""
        return {
            **self._base_options(),
            "dbtable": query_definition(self.table, self.partition_column, interval),
        }

    def describe_range(self, intervals: list[Interval]) -> tuple[dict[str, str], list[str]]:
        """Reader options + per-slice predicates for the parallel window read."""
        return (
            {**self._base_options(), "dbtable": self.table},
            jdbc_predicates(self.partition_column, intervals),
        )

    def probe_sql(self, agg: str) -> str:
        """`(select min(pc) from T) subs` — aggregate pushed to the source DB
        (load_utils.py:343, :497)."""
        return f"(select {agg}({self.partition_column}) from {self.table}) subs"

    # -- Spark reads (need a driver jar + live DB) --------------------------

    def read_slice(self, spark: SparkSession, interval: Interval) -> DataFrame:
        reader = spark.read.format("jdbc")
        for k, v in self.describe_slice(interval).items():
            reader = reader.option(k, v)
        return reader.load()

    def read_range(self, spark: SparkSession, intervals: list[Interval]) -> DataFrame:
        opts, predicates = self.describe_range(intervals)
        props = {k: v for k, v in opts.items() if k not in ("url", "dbtable")}
        return spark.read.jdbc(
            url=opts["url"], table=opts["dbtable"], predicates=predicates, properties=props
        )

    def _probe(self, spark: SparkSession, agg: str):
        reader = (
            spark.read.format("jdbc")
            .option("dbtable", self.probe_sql(agg))
        )
        for k, v in self._base_options().items():
            reader = reader.option(k, v)
        return reader.load().first()[0]

    def probe_min(self, spark: SparkSession):
        return self._probe(spark, "min")

    def probe_max(self, spark: SparkSession):
        return self._probe(spark, "max")
